"""Host-side datasets, samples, and the padded-batch loader.

Replaces the reference's torch ``Dataset``/``DataLoader``/collater stack
(reference ``enflow/data/base.py:146-296``) with a NumPy pipeline that emits
fixed-shape padded ``System`` batches for the device:

- ``Sample``: one molecule/frame as host arrays (+ atom symbols and label,
  which never go to device — the reference carries them in ``Data.z/label``).
- ``BaseDataset`` / ``InMemoryDataset``: transform plumbing, one-hot features,
  ``g ~ N(0,1)`` initialization, processed-file caching (reference
  ``base.py:176-283``; the cache is a pickle like ``torch.save``'s).
- ``ComposeDatasets``: concatenation with node_nf check (reference
  ``base.py:285-296``; also fixes the driver's broken ``ComposeDatasets``
  import, reference main.py:133).
- ``DataLoader``: shuffling batcher that pads atoms to the dataset-wide max
  and (optionally) pads the final batch with all-masked dummy molecules so
  every batch has identical shape — one XLA compilation for the whole run.

Dataset types are looked up by name through ``DATASET_REGISTRY`` mirroring the
reference's reflection scheme (``enflow.data.{type}.{TYPE}Dataset``,
reference main.py:68).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from abc import ABC, abstractmethod

import numpy as np
import jax.numpy as jnp

from .system import System
from .transforms import NoneTransform
from ..utils.helpers import get_box_len_np
from ..utils.constants import atom_types as DEFAULT_ATOM_TYPES


@dataclasses.dataclass
class Sample:
    """One molecular configuration on the host (float64 NumPy)."""

    z: list            # atom symbols (host-only metadata)
    h: np.ndarray      # [N, node_nf] one-hot (or latent features)
    g: np.ndarray      # [N, node_nf]
    pos: np.ndarray    # [N, 3]
    vel: np.ndarray    # [N, 3]
    box: np.ndarray    # [3]
    r_cut: float
    label: str = ""

    @property
    def num_atoms(self) -> int:
        return self.pos.shape[0]

    @property
    def node_nf(self) -> int:
        return self.h.shape[1]


class BaseDataset(ABC):
    """Reference ``BaseDataset`` semantics (base.py:176-247)."""

    def __init__(self, **params):
        self.transform = params.pop("transform", None) or NoneTransform()
        self.atom_types = params.pop("atom_types", None) or DEFAULT_ATOM_TYPES
        if isinstance(self.atom_types, (list, tuple)):
            self.atom_types = {z: i for i, z in enumerate(self.atom_types)}
        box = params.pop("box", None)
        self.box = None if box is None else np.asarray(box, np.float64)
        r_cut = params.pop("r_cut", None)
        self.r_cut = None if r_cut is None else float(r_cut)
        self.rng = np.random.default_rng(params.pop("seed", None))
        self.input_params = params

    @abstractmethod
    def __len__(self):
        ...

    @abstractmethod
    def __getitem__(self, idx) -> Sample:
        ...

    @property
    def node_nf(self) -> int:
        return len(self.atom_types)

    def _get_sample(self, z, pos, vel=None, label="", box=None, g=None,
                    h=None) -> Sample:
        """Build one transformed Sample (reference ``_get_data``,
        base.py:211-239: one-hot h, g ~ N(0,1), tiled box, transform).

        ``h`` may be given explicitly (latent features, e.g. the LJ sampler's
        Gaussian h — the reference's SDF reader also tries to pass h but its
        ``append`` signature drops it, a latent TypeError at sdf.py:28-35)."""
        pos = np.asarray(pos, np.float64)
        if box is None:
            box = self.box if self.box is not None else get_box_len_np(pos)
        box = np.asarray(box, np.float64)
        if self.r_cut is None:
            raise ValueError(
                "r_cut must be set on the dataset (reference prints 'error "
                "rcut' and limps on, base.py:216; we fail fast)")
        if h is None:
            try:
                type_idx = [self.atom_types[s] for s in z]
            except KeyError as e:
                raise ValueError(
                    f"atom symbol {e.args[0]!r} not in the dataset vocabulary "
                    f"{sorted(self.atom_types)}; pass atom_types to the "
                    f"dataset or provide h explicitly") from None
            h = np.eye(len(self.atom_types), dtype=np.float64)[type_idx]
        else:
            h = np.asarray(h, np.float64)
        if vel is None:
            vel = np.zeros_like(pos)
        if g is None:
            g = self.rng.normal(0.0, 1.0, size=h.shape)
        sample = Sample(z=list(z), h=h, g=np.asarray(g, np.float64),
                        pos=pos, vel=np.asarray(vel, np.float64),
                        box=box, r_cut=float(self.r_cut), label=label)
        return self.transform(sample)

    @property
    def max_atoms(self) -> int:
        return max(self[i].num_atoms for i in range(len(self)))


class InMemoryDataset(BaseDataset, ABC):
    """Eagerly processed dataset with a pickle cache
    (reference ``InMemoryBaseDataset``, base.py:249-283)."""

    def __init__(self, **params):
        super().__init__(**params)
        self.samples: list[Sample] = []
        processed_file = self.input_params.pop("processed_file", None)
        if processed_file and os.path.exists(processed_file):
            with open(processed_file, "rb") as f:
                self.samples = pickle.load(f)
        else:
            self.process(**self.input_params)
            if processed_file:
                os.makedirs(os.path.dirname(processed_file) or ".", exist_ok=True)
                with open(processed_file, "wb") as f:
                    pickle.dump(self.samples, f)

    @abstractmethod
    def process(self, **params):
        ...

    def append(self, z, pos, vel=None, label="", box=None, g=None, h=None):
        self.samples.append(self._get_sample(z, pos, vel, label, box, g, h))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx) -> Sample:
        return self.samples[idx]

    @property
    def node_nf(self) -> int:
        return self.samples[0].node_nf if self.samples else len(self.atom_types)

    @property
    def max_atoms(self) -> int:
        return max(s.num_atoms for s in self.samples)


class ComposeDatasets(InMemoryDataset):
    """Concatenate in-memory datasets (reference ``ComposeInMemoryDatasets``,
    base.py:285-296 — and the class the reference driver actually tries to
    import, main.py:133)."""

    def __init__(self, datasets):
        self.samples = []
        self.transform = NoneTransform()
        for d in datasets:
            if self.samples and d.node_nf != self.node_nf:
                raise ValueError(
                    f"node_nf mismatch composing datasets: {d.node_nf} != "
                    f"{self.node_nf}")
            self.samples += list(d.samples)
        self.atom_types = datasets[0].atom_types if datasets else DEFAULT_ATOM_TYPES

    def process(self, **params):
        raise NotImplementedError


def pad_samples(samples, n_max, node_nf, dtype=jnp.float32, n_mols=None) -> System:
    """Pad a list of Samples into one fixed-shape device ``System``.

    ``n_mols`` > len(samples) adds all-masked dummy molecules (static batch
    shape for the final partial batch). Replaces the reference's ragged
    concatenation collater (base.py:162-174).
    """
    B = n_mols or len(samples)
    h = np.zeros((B, n_max, node_nf))
    g = np.zeros((B, n_max, node_nf))
    pos = np.zeros((B, n_max, 3))
    vel = np.zeros((B, n_max, 3))
    mask = np.zeros((B, n_max), dtype=bool)
    box = np.ones((B, 3))
    r_cut = np.ones((B,))
    for i, s in enumerate(samples):
        n = s.num_atoms
        h[i, :n] = s.h
        g[i, :n] = s.g
        pos[i, :n] = s.pos
        vel[i, :n] = s.vel
        mask[i, :n] = True
        box[i] = s.box
        r_cut[i] = s.r_cut
    return System(
        h=jnp.asarray(h, dtype), g=jnp.asarray(g, dtype),
        pos=jnp.asarray(pos, dtype), vel=jnp.asarray(vel, dtype),
        mask=jnp.asarray(mask), box=jnp.asarray(box, dtype),
        r_cut=jnp.asarray(r_cut, dtype),
    )


class DataLoader:
    """Shuffling, padding batcher. Every batch has shape ``[batch_size,
    n_max]`` (final partial batch padded with dummy molecules), so the jitted
    train step compiles exactly once.

    ``shard`` = (num_shards, shard_index) slices the *sample* axis for
    data-parallel multi-host loading (the ``DistributedSampler`` equivalent,
    reference main.py:142-143).
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, seed=0,
                 dtype=jnp.float32, drop_last=False, shard=None,
                 prefetch=0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.dtype = dtype
        self.drop_last = drop_last
        self.num_shards, self.shard_index = shard or (1, 0)
        self.n_max = dataset.max_atoms
        self.node_nf = dataset.node_nf
        # prefetch > 0: assemble up to that many padded batches ahead on a
        # background thread, overlapping host-side sample access (lazy
        # readers, page faults) with device compute. Order is unchanged.
        self.prefetch = int(prefetch)

    def set_epoch(self, epoch: int):
        """Reseed shuffling per epoch (reference ``sampler.set_epoch``,
        main.py:204)."""
        self.epoch = int(epoch)

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1 and n % self.num_shards:
            # pad by modular wrap-around so every shard sees the same number
            # of samples — and therefore the same number of batches. Unequal
            # shard lengths would desync lockstep multi-process training
            # (every process must enter the same jitted collectives the
            # same number of times). Same semantics as the reference's
            # DistributedSampler (torch pads with repeated samples).
            # Modular indexing (not idx[:pad]) also covers n < num_shards,
            # where a single wrap cannot supply enough padding.
            total = -(-n // self.num_shards) * self.num_shards
            idx = idx[np.arange(total) % n]
        return idx[self.shard_index::self.num_shards]

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        idx = self._indices()
        nb = len(self)
        for b in range(nb):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            samples = [self.dataset[i] for i in chunk]
            yield pad_samples(samples, self.n_max, self.node_nf, self.dtype,
                              n_mols=self.batch_size)

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        import queue
        import threading

        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _END, _ERR = object(), object()

        def put(item):
            # bounded-blocking put that aborts when the consumer goes away —
            # otherwise an abandoned iterator (break / exception mid-epoch)
            # would leave the worker blocked on a full queue forever,
            # pinning its batches for the life of the process
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self._batches():
                    if not put(batch):
                        return
                put(_END)
            except BaseException as e:   # surface errors in the consumer
                put((_ERR, e))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if (isinstance(item, tuple) and len(item) == 2
                        and item[0] is _ERR):
                    raise item[1]
                yield item
        finally:
            stop.set()


# --- registry (the reference's reflection scheme, main.py:68) --------------

DATASET_REGISTRY = {}


def register_dataset(name):
    def deco(cls):
        DATASET_REGISTRY[name] = cls
        return cls
    return deco


def get_dataset_class(name):
    # populate registry lazily to avoid import cycles
    from . import readers, lj, lig  # noqa: F401
    try:
        return DATASET_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown dataset type '{name}'; available: "
            f"{sorted(DATASET_REGISTRY)}") from None
