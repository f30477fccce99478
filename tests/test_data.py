import os

import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.data import formats
from enflow_tpu.data.datasets import (
    ComposeDatasets,
    DataLoader,
    InMemoryDataset,
    pad_samples,
)
from enflow_tpu.data.readers import (
    SDFDataset,
    TRRDataset,
    XYZDataset,
    HDF5Dataset,
)
from enflow_tpu.data import transforms as T
from enflow_tpu.flow.loss import alchemical_nll
from enflow_tpu.utils.conversion import dist_to_lj


class ToyDataset(InMemoryDataset):
    def process(self, n_mols=4, n_atoms=5, **_):
        rng = np.random.default_rng(0)
        for i in range(n_mols):
            n = n_atoms + (i % 2)  # varying sizes
            self.append(z=["C"] * n, pos=rng.normal(size=(n, 3)),
                        label=f"mol{i}")


def toy(**kw):
    kw.setdefault("r_cut", 3.0)
    kw.setdefault("box", [10.0, 10.0, 10.0])
    return ToyDataset(**kw)


def test_get_sample_one_hot_and_g():
    d = toy()
    s = d[0]
    assert s.h.shape == (5, 5)
    assert (s.h.sum(axis=1) == 1).all()
    assert s.h[:, 1].sum() == 5  # all carbon
    assert s.g.shape == s.h.shape
    assert s.r_cut == 3.0


def test_r_cut_required():
    with pytest.raises(ValueError, match="r_cut"):
        ToyDataset(box=[10, 10, 10])


def test_transform_pipeline_units():
    tf = T.Compose([T.ConvertPositionsFrom("ang"), T.Center()])
    d = toy(transform=tf)
    s = d[0]
    # positions centered and reduced (3.4 A = 1 sigma)
    np.testing.assert_allclose(s.pos.mean(axis=0), 0, atol=1e-12)
    np.testing.assert_allclose(s.box, dist_to_lj(10.0, "ang"))
    assert s.r_cut == pytest.approx(dist_to_lj(3.0, "ang"))


def test_randomize_velocity_stats():
    kBT = 0.8
    tf = T.RandomizeVelocity(kBT, seed=0)
    d = ToyDataset(r_cut=3.0, box=[10] * 3, transform=tf, n_mols=40,
                   n_atoms=30)
    v = np.concatenate([s.vel for s in d.samples])
    assert v.var() == pytest.approx(kBT, rel=0.1)


def test_processed_file_cache(tmp_path):
    cache = str(tmp_path / "processed.pt")
    d1 = toy(processed_file=cache)
    assert os.path.exists(cache)
    d2 = toy(processed_file=cache)
    np.testing.assert_array_equal(d1[0].pos, d2[0].pos)
    assert len(d2) == len(d1)


def test_compose_datasets():
    c = ComposeDatasets([toy(), toy(n_mols=2)])
    assert len(c) == 6
    assert c.node_nf == 5


def test_dataloader_padding_and_shuffle():
    d = toy(n_mols=5)
    dl = DataLoader(d, batch_size=2, shuffle=True, seed=1, dtype=jnp.float64)
    batches = list(dl)
    assert len(batches) == 3
    for b in batches:
        assert b.pos.shape == (2, d.max_atoms, 3)
    # final batch has one dummy molecule
    last = batches[-1]
    mol_real = np.asarray(last.mask).any(axis=1)
    assert mol_real.sum() == 1
    # epochs reshuffle
    dl.set_epoch(0)
    a = np.asarray(next(iter(dl)).pos)
    dl.set_epoch(1)
    b = np.asarray(next(iter(dl)).pos)
    assert not np.allclose(a, b)


def test_dataloader_sharding_disjoint():
    d = toy(n_mols=8, n_atoms=4)
    seen = []
    for r in range(2):
        dl = DataLoader(d, batch_size=2, shard=(2, r), dtype=jnp.float64)
        for batch in dl:
            seen.append(np.asarray(batch.pos))
    # 2 shards x 2 batches of 2 = all 8 molecules exactly once
    allpos = np.concatenate([p.reshape(-1) for p in seen])
    assert len(seen) == 4


def test_dataloader_sharding_uneven_lockstep():
    """Shards must yield the SAME number of batches even when the dataset
    size doesn't divide by num_shards (wrap-around padding, like the
    reference's DistributedSampler) — unequal counts would desync lockstep
    multi-process training."""
    d = toy(n_mols=7, n_atoms=4)
    loaders = [DataLoader(d, batch_size=2, shard=(3, r), dtype=jnp.float64)
               for r in range(3)]
    lens = [len(dl) for dl in loaders]
    assert lens == [2, 2, 2]
    counts = [sum(1 for _ in dl) for dl in loaders]
    assert counts == lens
    # every molecule still appears at least once across the shards
    seen = set()
    for dl in loaders:
        for batch in dl:
            for b in range(batch.pos.shape[0]):
                if bool(np.asarray(batch.mask)[b].any()):
                    seen.add(round(float(np.asarray(batch.pos)[b].sum()), 6))
    all_ids = {round(float(np.asarray(d[i].pos).sum()), 6) for i in range(7)}
    assert seen == all_ids


def test_dataloader_sharding_fewer_samples_than_shards():
    """Modular wrap-around padding must cover n < num_shards too: every
    shard gets exactly one (repeated) sample instead of some shards
    getting zero and desyncing lockstep training."""
    d = toy(n_mols=2, n_atoms=4)
    loaders = [DataLoader(d, batch_size=1, shard=(5, r), dtype=jnp.float64)
               for r in range(5)]
    assert [len(dl) for dl in loaders] == [1] * 5
    assert [sum(1 for _ in dl) for dl in loaders] == [1] * 5


def test_prefetch_worker_exits_on_abandoned_iteration():
    """Breaking out of a prefetching loader must stop the worker thread —
    otherwise it blocks forever on the full queue, pinning its batches."""
    import threading
    import time

    d = toy(n_mols=8)
    dl = DataLoader(d, batch_size=1, dtype=jnp.float64, prefetch=1)
    n0 = threading.active_count()
    it = iter(dl)
    next(it)
    it.close()   # generator finally -> stop event
    deadline = time.time() + 5.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == n0


def test_largemd_indexes_trajectory_once(tmp_path, monkeypatch):
    """LargeMDDataset builds the streaming frame index exactly once:
    __len__ + every __getitem__ + max_atoms must not re-scan the file
    (startup was quadratic otherwise; .xyz streams via index_xyz now)."""
    from enflow_tpu.data import formats as fm
    from enflow_tpu.data import readers

    xyz = tmp_path / "traj.xyz"
    rng = np.random.default_rng(0)
    with open(xyz, "w") as f:
        for _ in range(6):
            f.write("3\nc\n")
            for sym in ("C", "O", "H"):
                x, y, z = rng.uniform(-2, 2, 3)
                f.write(f"{sym} {x:.4f} {y:.4f} {z:.4f}\n")

    calls = {"n": 0}
    real = fm.index_xyz

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(fm, "index_xyz", counting)
    d = readers.LargeMDDataset(traj_file=str(xyz), r_cut=3.0,
                               box=[8.0, 8.0, 8.0])
    assert len(d) == 6
    for i in range(len(d)):
        assert d[i].num_atoms == 3
    assert d.max_atoms == 3
    assert calls["n"] == 1


def test_loss_ignores_dummy_molecules():
    d = toy(n_mols=3)
    samples = [d[i] for i in range(3)]
    full = pad_samples(samples, d.max_atoms, d.node_nf, jnp.float64)
    padded = pad_samples(samples, d.max_atoms, d.node_nf, jnp.float64,
                         n_mols=5)
    l1 = float(alchemical_nll(full, 0.0, 0.8, 0.1))
    l2 = float(alchemical_nll(padded, 0.0, 0.8, 0.1))
    assert l1 == pytest.approx(l2, rel=1e-12)


# --- formats ---------------------------------------------------------------

def test_xyz_roundtrip(tmp_path):
    path = str(tmp_path / "a.xyz")
    pos = np.asarray([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]])
    formats.write_xyz(path, ["C", "O"], pos)
    frames = formats.parse_xyz(path)
    assert len(frames) == 1
    z, p = frames[0]
    assert z == ["C", "O"]
    np.testing.assert_allclose(p, pos)


def test_pdb_roundtrip(tmp_path):
    path = str(tmp_path / "a.pdb")
    pos = np.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    with open(path, "w") as f:
        formats.write_pdb_model(f, ["Ar", "Ar"], pos, box=[10, 10, 10], model=1)
        formats.write_pdb_model(f, ["Ar", "Ar"], pos + 1, box=[10, 10, 10], model=2)
    frames = formats.parse_pdb(path)
    assert len(frames) == 2
    z, p, box = frames[0]
    assert z == ["Ar", "Ar"]
    np.testing.assert_allclose(p, pos, atol=1e-3)
    np.testing.assert_allclose(box, [10, 10, 10])


def test_sdf_parse(tmp_path):
    sdf = (
        "mol1\n  prog\n comment\n"
        "  3  2  0  0  0  0  0  0  0  0999 V2000\n"
        "    0.0000    0.0000    0.0000 O   0  0\n"
        "    0.9600    0.0000    0.0000 H   0  0\n"
        "   -0.2400    0.9300    0.0000 H   0  0\n"
        "  1  2  1  0\n  1  3  1  0\nM  END\n$$$$\n"
    )
    path = str(tmp_path / "a.sdf")
    with open(path, "w") as f:
        f.write(sdf)
    mols = formats.parse_sdf(path)
    assert len(mols) == 1
    name, z, pos = mols[0]
    assert name == "mol1" and z == ["O", "H", "H"]
    assert pos[1, 0] == pytest.approx(0.96)


def test_trr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "a.trr")
    frames_in = []
    for step in (0, 10):
        frames_in.append({
            "step": step, "time": step * 0.002,
            "box": np.diag([2.5, 2.5, 2.5]),
            "pos": rng.normal(size=(7, 3)),
            "vel": rng.normal(size=(7, 3)),
        })
    formats.write_trr(path, frames_in, double=True)
    out = formats.read_trr(path)
    assert len(out) == 2
    for fin, fout in zip(frames_in, out):
        assert fout["step"] == fin["step"]
        np.testing.assert_allclose(fout["pos"], fin["pos"], atol=1e-12)
        np.testing.assert_allclose(fout["vel"], fin["vel"], atol=1e-12)
        np.testing.assert_allclose(np.diag(fout["box"]), 2.5)
    # single precision path
    formats.write_trr(path, frames_in, double=False)
    out32 = formats.read_trr(path)
    np.testing.assert_allclose(out32[0]["pos"], frames_in[0]["pos"], atol=1e-5)


# --- readers ---------------------------------------------------------------

def test_xyz_dataset(tmp_path):
    path = str(tmp_path / "traj.xyz")
    rng = np.random.default_rng(1)
    with open(path, "w") as f:
        for _ in range(3):
            f.write("2\nc\nC 0.0 0.0 0.0\nO 1.2 0.0 0.0\n")
    d = XYZDataset(raw_file=path, r_cut=3.0, box=[10, 10, 10])
    assert len(d) == 3
    assert d[0].z == ["C", "O"]
    del rng


def test_sdf_dataset(tmp_path):
    path = str(tmp_path / "a.sdf")
    sdf = (
        "water\n  x\n x\n"
        "  3  0  0  0  0  0  0  0  0  0999 V2000\n"
        "    0.0000    0.0000    0.0000 O   0  0\n"
        "    0.9600    0.0000    0.0000 H   0  0\n"
        "   -0.2400    0.9300    0.0000 H   0  0\n"
        "M  END\n$$$$\n"
    )
    with open(path, "w") as f:
        f.write(sdf)
    d = SDFDataset(raw_file=path, r_cut=3.0, box=[10, 10, 10])
    assert len(d) == 1
    s = d[0]
    assert s.label == "water"
    assert s.h.shape == (3, 5)  # default HCNOF vocabulary
    assert s.h[0, 3] == 1  # O is index 3


def test_trr_dataset(tmp_path):
    rng = np.random.default_rng(2)
    traj = str(tmp_path / "t.trr")
    frames = [{"step": i, "time": 0.0, "box": np.diag([3.0, 3.0, 3.0]),
               "pos": rng.normal(size=(4, 3)),
               "vel": rng.normal(size=(4, 3))} for i in range(2)]
    formats.write_trr(traj, frames, double=True)
    d = TRRDataset(traj_file=traj, r_cut=3.0, dist_unit="nm",
                   atom_types=["Ar"])
    assert len(d) == 2
    s = d[0]
    assert s.num_atoms == 4
    np.testing.assert_allclose(s.pos, frames[0]["pos"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.box), 3.0)


def test_largemd_mixed_format_list_per_frame_units(tmp_path):
    """LargeMDDataset over a LIST of mixed .trr/.xyz trajectories: each
    frame's unit scale comes from ITS source file (ADVICE r3 item 3 — a
    list used to raise AttributeError in _traj_units, and mixed formats
    would have applied one format's units to every frame)."""
    from enflow_tpu.data.readers import LargeMDDataset

    rng = np.random.default_rng(7)
    coords = rng.normal(size=(4, 3))
    traj = str(tmp_path / "a.trr")                       # nm-native
    formats.write_trr(traj, [{"step": 0, "time": 0.0,
                              "box": np.diag([3.0, 3.0, 3.0]),
                              "pos": coords, "vel": None}], double=True)
    xyz = str(tmp_path / "b.xyz")                        # ang-native
    formats.write_xyz(xyz, ["C"] * 4, coords, comment="c")

    d = LargeMDDataset(traj_file=[traj, xyz], r_cut=3.0, dist_unit="ang",
                       atom_types=["C"], box=[40.0, 40.0, 40.0])
    assert len(d) == 2
    # trr frame: nm -> ang (x10); xyz frame: already ang (x1)
    np.testing.assert_allclose(np.asarray(d[0].pos), coords * 10.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[1].pos), coords, atol=1e-5)


def test_hdf5_dataset(tmp_path):
    import h5py
    path = str(tmp_path / "a.h5")
    rng = np.random.default_rng(3)
    with h5py.File(path, "w") as f:
        grp = f.create_group("g1").create_group("mol1")
        grp["species"] = np.array([b"C", b"O"])
        grp["coordinates"] = rng.normal(size=(1, 2, 3))
        grp["cell"] = np.tile(np.eye(3) * 9.0, (1, 1, 1))
    d = HDF5Dataset(raw_file=path, r_cut=3.0)
    assert len(d) == 1
    np.testing.assert_allclose(np.asarray(d[0].box), 9.0)


def test_mddataset_native_fallback(tmp_path):
    """MDDataset without MDAnalysis: native xyz-topology + trr-trajectory
    path (readers._process_native)."""
    from enflow_tpu.data.readers import MDDataset

    rng = np.random.default_rng(5)
    traj = str(tmp_path / "t.trr")
    frames = [{"step": i, "time": 0.0, "box": np.diag([3.0, 3.0, 3.0]),
               "pos": rng.normal(size=(4, 3)),
               "vel": rng.normal(size=(4, 3))} for i in range(3)]
    formats.write_trr(traj, frames, double=True)
    top = str(tmp_path / "top.xyz")
    with open(top, "w") as f:
        f.write("4\nc\nC 0 0 0\nO 1 0 0\nC 0 1 0\nO 0 0 1\n")
    d = MDDataset(top_file=top, traj_file=traj, r_cut=3.0,
                  box=[30.0, 30.0, 30.0], dist_unit="ang")
    assert len(d) == 3
    s = d[0]
    assert s.z == ["C", "O", "C", "O"]
    # trr is nm; declared unit ang -> x10
    np.testing.assert_allclose(s.pos, frames[0]["pos"] * 10, atol=1e-6)


def test_dataloader_prefetch_matches_sync():
    """prefetch=N yields bitwise the same batch stream as the synchronous
    path (order, padding, shuffling), and surfaces worker errors."""
    d = toy(n_mols=10)
    sync = DataLoader(d, batch_size=3, shuffle=True, seed=5)
    pre = DataLoader(d, batch_size=3, shuffle=True, seed=5, prefetch=2)
    sync.set_epoch(2)
    pre.set_epoch(2)
    a = list(sync)
    b = list(pre)
    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x.pos), np.asarray(y.pos))
        np.testing.assert_array_equal(np.asarray(x.mask), np.asarray(y.mask))

    class Boom(ToyDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    bad = Boom.__new__(Boom)
    bad.__dict__.update(d.__dict__)
    loader = DataLoader(bad, batch_size=3, prefetch=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_xyz_index_matches_parse(tmp_path):
    """index_xyz/read_xyz_frame_at reproduce parse_xyz frame-for-frame
    (varying atom counts, blank separator lines)."""
    path = str(tmp_path / "multi.xyz")
    rng = np.random.default_rng(3)
    with open(path, "w") as f:
        for k, n in enumerate([4, 7, 4, 2]):
            f.write(f"{n}\nframe {k}\n")
            for a in range(n):
                x, y, z = rng.normal(size=3)
                f.write(f"C {x:.10g} {y:.10g} {z:.10g}\n")
            if k == 1:
                f.write("\n")               # stray blank line between frames
    ref = formats.parse_xyz(path)
    idx = formats.index_xyz(path)
    assert len(idx) == len(ref) == 4
    assert [n for _, n in idx] == [4, 7, 4, 2]
    for (off, n), (sym_ref, pos_ref) in zip(idx, ref):
        sym, pos = formats.read_xyz_frame_at(path, off)
        assert sym == sym_ref
        np.testing.assert_array_equal(pos, pos_ref)


def test_pdb_index_matches_parse(tmp_path):
    """index_pdb/read_pdb_frame_at reproduce parse_pdb's frame delimiting
    (MODEL/ENDMDL blocks + a trailing frame without ENDMDL)."""
    path = str(tmp_path / "multi.pdb")
    rng = np.random.default_rng(4)
    with open(path, "w") as f:
        f.write("CRYST1   20.000   20.000   20.000  90.00  90.00  90.00 "
                "P 1           1\n")
        for k in range(3):
            f.write(f"MODEL     {k + 1:4d}\n")
            for i in range(5):
                x, y, z = rng.uniform(0, 20, 3)
                f.write("ATOM  %5d  C   UNK A   1    %8.3f%8.3f%8.3f"
                        "  1.00  0.00           C\n" % (i + 1, x, y, z))
            f.write("ENDMDL\n")
        # trailing atoms with no ENDMDL form a final frame (parse_pdb rule)
        for i in range(2):
            f.write("ATOM  %5d  O   UNK A   1    %8.3f%8.3f%8.3f"
                    "  1.00  0.00           O\n" % (i + 1, 1.0 * i, 2.0, 3.0))
    ref = formats.parse_pdb(path)
    idx = formats.index_pdb(path)
    assert len(idx) == len(ref) == 4
    assert [n for _, n in idx] == [5, 5, 5, 2]
    for (off, n), (sym_ref, pos_ref, _box) in zip(idx, ref):
        sym, pos = formats.read_pdb_frame_at(path, off)
        assert sym == sym_ref
        np.testing.assert_array_equal(pos, pos_ref)


def test_largemd_streams_text_formats(tmp_path):
    """LargeMDDataset streams .xyz at O(frame) RSS (VERDICT r2 item 6):
    a multi-hundred-MB synthetic trajectory indexes + strided-reads inside
    a small fixed memory budget, with per-frame values matching the
    whole-file parser."""
    import resource

    from enflow_tpu.data.readers import LargeMDDataset

    natoms, n_frames = 6000, 800
    one = str(tmp_path / "one.xyz")
    rng = np.random.default_rng(1)
    pos0 = rng.normal(size=(natoms, 3))
    formats.write_xyz(one, ["C"] * natoms, pos0, comment="c")
    blob = open(one, "rb").read()
    big = str(tmp_path / "big.xyz")
    with open(big, "wb") as f:
        for _ in range(n_frames):
            f.write(blob)
    size_mb = len(blob) * n_frames / 1e6
    assert size_mb > 200, f"synthetic file only {size_mb:.0f} MB"

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB (linux)
    ds = LargeMDDataset(traj_file=big, r_cut=2.0, atom_types=["C"],
                        box=[50.0, 50.0, 50.0])
    assert len(ds) == n_frames
    assert ds.max_atoms == natoms          # O(1), from the index
    for i in range(0, n_frames, 80):       # stride the whole file
        s = ds[i]
        assert s.pos.shape == (natoms, 3)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    growth_mb = (rss1 - rss0) / 1024.0
    # whole-file caching would add >= file size in float lists (~600 MB)
    assert growth_mb < 100, f"RSS grew {growth_mb:.0f} MB while streaming"
