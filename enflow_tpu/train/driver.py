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
from .checkpoint import load_checkpoint, load_hparams, save_checkpoint


def eprint(*args, **kwargs):
    print(*args, file=sys.stderr, **kwargs)


def write_xyz(path, pos_reduced, symbol="Ar"):
    """Write reduced-unit positions as an Angstrom XYZ (reference
    main.py:27-32: ``x*sigma*1e10``)."""
    pos_ang = np.asarray(pos_reduced) * sigma * 1e10
    formats.write_xyz(path, [symbol] * pos_ang.shape[0], pos_ang)


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

        T = [transforms.ConvertPositionsFrom(args["units"]["dist"]),
             transforms.Center()]
        if section.pop("randomize_vel", False):
            T.append(transforms.RandomizeVelocity(
                cv.kelvin_to_lj(float(section.pop("temp")))))
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
        elif mode == "train":
            self.mode = "train"
        else:
            raise ValueError(f"unknown mode {mode!r}")

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
            self.lj_kBT = cv.kelvin_to_lj(float(args["training"]["loss"]["temp"]))
            self.softening = float(args["training"]["loss"]["softening"])
            self.dequantizer = str(dyn.get("dequantizer", "argmax")).lower()

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
                "batch_size", args["dataset"].get("batch_size", 1)))

        # dataset construction (+ compose, reference main.py:128-136)
        if args["dataset"]["type"] == "compose":
            n = int(args["dataset"]["number"])
            self.dataset = ComposeDatasets(
                [self._setup_dataset(f"dataset{i+1}", args) for i in range(n)])
        else:
            self.dataset = self._setup_dataset("dataset", args)

        if self.mode == "data":
            return

        if node_nf is None:
            node_nf = self.dataset.node_nf
        self.node_nf = node_nf

        # mesh + loader: batch sharded over the data axis, per-process shard.
        # If batch_size does not divide across every device, fall back to the
        # largest device count that does (single-host only).
        n_dev = len(jax.devices())
        if batch_size % n_dev != 0:
            usable = max(d for d in range(1, n_dev + 1)
                         if batch_size % d == 0)
            if self.num_processes > 1:
                raise ValueError(
                    f"batch_size={batch_size} must be divisible by the "
                    f"device count ({n_dev}) in multi-host runs")
            if self.is_main and self.mode == "train":
                eprint(f"batch_size={batch_size} not divisible by {n_dev} "
                       f"devices; using {usable}", flush=True)
            self.mesh = get_mesh(devices=jax.devices()[:usable])
        else:
            self.mesh = get_mesh()
        self.train_loader = DataLoader(
            self.dataset, batch_size=batch_size,
            shuffle=(self.mode == "train"), seed=self.seed, dtype=self.dtype,
            shard=(self.num_processes, self.process_index))

        # flow model
        self.flow_cfg = FlowConfig(
            n_iter=self.n_iter, dt=float(dt),
            egcl=EGCLConfig(node_nf=node_nf, hidden_nf=self.hidden_nf),
            integrator=self.integrator,
            dequantizer=self.dequantizer,
            nbr_capacity=dyn.get("nbr_capacity"),
            exact_ldj=bool(dyn.get("exact_ldj", False)),
        )
        self.params = init_flow(jax.random.PRNGKey(self.seed), self.flow_cfg,
                                self.dtype)

        # optimizer (train mode)
        if self.mode == "train":
            tr = args["training"]
            lr = float(tr["lr"])
            if tr.get("scheduler"):
                schedule = optax.exponential_decay(
                    init_value=lr,
                    transition_steps=int(float(tr["scheduler_step"])),
                    decay_rate=float(tr["gamma"]),
                    staircase=True)
            else:
                schedule = lr
            self._schedule = schedule
            self.optimizer = optax.adam(schedule)
            self.opt_state = self.optimizer.init(self.params)
            self.log_interval = int(tr["log_interval"])
            self.num_epochs = int(tr["num_epochs"])
            if self.is_main:
                eprint(f"Loss function parameters: softening={self.softening},"
                       f" kBT={self.lj_kBT}", flush=True)

        # restore state
        if checkpoint_hparams is not None:
            if self.mode == "train":
                template = {"params": self.params, "opt_state": self.opt_state}
                tree, _ = load_checkpoint(self.checkpoint_path, template)
                self.params = tree["params"]
                self.opt_state = tree["opt_state"]
            else:
                tree, _ = load_checkpoint(self.checkpoint_path,
                                          {"params": self.params})
                self.params = tree["params"]
            self.start_epoch = int(checkpoint_hparams["epoch"]) + 1

        if self.is_main:
            eprint("In generate mode" if self.mode == "gen"
                   else "In training mode", flush=True)

    # ------------------------------------------------------------------
    # train
    # ------------------------------------------------------------------

    def _make_train_step(self):
        cfg = self.flow_cfg
        kBT, soft = self.lj_kBT, self.softening
        optimizer = self.optimizer
        n_lg = 3 if cfg.dequantizer == "argmax" else 2

        @jax.jit
        def train_step(params, opt_state, batch, key):
            def loss_fn(p):
                out, ldj = forward(p, cfg, batch, key)
                return alchemical_nll(out, ldj, kBT, soft,
                                      num_log_gaussian_calls=n_lg)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = optimizer.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, loss

        return train_step

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
            "n_iter": int(self.n_iter),
            "dt": float(self.flow_cfg.dt),
        }
        save_checkpoint(self.checkpoint_path,
                        {"params": self.params, "opt_state": self.opt_state},
                        hparams)

    def train(self):
        if self.is_main:
            print('Epoch \tTraining Loss \t   Time (s)', flush=True)
        train_step = self._make_train_step()
        params = replicate(self.params, self.mesh)
        opt_state = replicate(self.opt_state, self.mesh)
        key = jax.random.PRNGKey(self.seed + 17)

        for epoch in range(self.start_epoch, self.start_epoch + self.num_epochs):
            self.train_loader.set_epoch(epoch)
            if self.is_main:
                eprint(f"###### Starting epoch {epoch} ######", flush=True)
            start_time = time.time()

            losses = []
            for i, batch in enumerate(self.train_loader):
                batch = shard_batch(batch, self.mesh)
                key, sub = jax.random.split(key)
                params, opt_state, loss = train_step(params, opt_state,
                                                     batch, sub)
                losses.append(loss)
            losses = jax.device_get(jnp.stack(losses))
            epoch_loss = float(losses.mean())
            # (single explicit value; with sharded batches the loss is already
            # the global mean — no all_reduce needed, cf. main.py:232-233)

            self.params, self.opt_state = params, opt_state
            if self.is_main and self.checkpoint_path:
                jax.block_until_ready(params)
                self._save(epoch)
                eprint("State saved", flush=True)

            end_time = time.time()
            if self.is_main and epoch % self.log_interval == 0:
                print('%.5i \t    %.2f \t    %.2f \t    %.2e'
                      % (epoch, epoch_loss, end_time - start_time,
                         self._current_lr()), flush=True)
            if self.is_main:
                eprint(f"###### Ending epoch {epoch} ###### ", flush=True)

    # ------------------------------------------------------------------
    # generate
    # ------------------------------------------------------------------

    def generate(self, out_dir="."):
        """Reverse the flow on latent samples (reference main.py:263-278):
        write ``h.out`` + ``test_out.xyz`` and print the roundtrip check."""
        batch = next(iter(self.train_loader))
        rev = jax.jit(partial(reverse, cfg=self.flow_cfg))
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
        fwd = jax.jit(partial(forward, cfg=self.flow_cfg))
        data_, _ = fwd(self.params, sys=out, key=jax.random.PRNGKey(99))
        back = rev(self.params, sys=data_)
        atol = 1e-8 if self.dtype == jnp.float64 else 1e-4
        print(bool(jnp.allclose(back.pos, out.pos, atol=atol)))
        print(bool(jnp.allclose(back.h, out.h, atol=atol)))
        return out

    # ------------------------------------------------------------------

    def __call__(self, input_path):
        self.setup(input_path)
        if self.mode == "train":
            self.train()
        elif self.mode == "gen":
            self.generate()
