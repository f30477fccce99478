"""Native C++ host runtime vs the pure-Python implementations."""

import numpy as np
import pytest

from enflow_tpu import native
from enflow_tpu.data import formats


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


def make_trr(tmp_path, double, n_frames=3, n_atoms=17, vel=True):
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n_frames):
        frames.append({
            "step": i * 100, "time": i * 0.002,
            "box": np.diag([4.0, 5.0, 6.0]),
            "pos": rng.normal(size=(n_atoms, 3)),
            "vel": rng.normal(size=(n_atoms, 3)) if vel else None,
        })
    path = str(tmp_path / f"t_{double}.trr")
    formats.write_trr(path, frames, double=double)
    return path, frames


@pytest.mark.parametrize("double", [True, False])
def test_native_trr_matches_python(tmp_path, lib_ok, double):
    path, frames = make_trr(tmp_path, double)
    got_native = native.read_trr(path)
    got_py = formats.read_trr(path)
    assert len(got_native) == len(got_py) == 3
    for n, p, orig in zip(got_native, got_py, frames):
        assert n["step"] == p["step"] == orig["step"]
        np.testing.assert_allclose(n["pos"], p["pos"], atol=0)
        np.testing.assert_allclose(n["vel"], p["vel"], atol=0)
        np.testing.assert_allclose(np.diag(n["box"]), [4.0, 5.0, 6.0],
                                   atol=1e-5)
        tol = 1e-12 if double else 1e-5
        np.testing.assert_allclose(n["pos"], orig["pos"], atol=tol)


def test_native_trr_no_velocities(tmp_path, lib_ok):
    path, _ = make_trr(tmp_path, True, vel=False)
    frames = native.read_trr(path)
    assert all(f["vel"] is None for f in frames)


def test_cell_list_counts_match_bruteforce(lib_ok):
    rng = np.random.default_rng(1)
    n = 200
    box = np.asarray([8.0, 9.0, 10.0])
    pos = rng.uniform(0, 1, (n, 3)) * box
    r_cut = 2.3

    counts, mx = native.neighbor_counts(pos, box, r_cut)

    diff = pos[:, None, :] - pos[None, :, :]
    diff -= np.round(diff / box) * box
    d2 = (diff**2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = (d2 < r_cut**2).sum(1)

    np.testing.assert_array_equal(counts, expect)
    assert mx == expect.max()


def test_cell_list_small_box_aliasing(lib_ok):
    """Boxes under 3 cells per axis exercise the aliasing dedup branches."""
    rng = np.random.default_rng(2)
    box = np.asarray([3.0, 3.0, 3.0])
    pos = rng.uniform(0, 3, (40, 3))
    r_cut = 1.4  # 2 cells/axis
    counts, _ = native.neighbor_counts(pos, box, r_cut)
    diff = pos[:, None, :] - pos[None, :, :]
    diff -= np.round(diff / box) * box
    d2 = (diff**2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = (d2 < r_cut**2).sum(1)
    np.testing.assert_array_equal(counts, expect)


def test_suggest_capacity(lib_ok):
    rng = np.random.default_rng(3)
    box = np.asarray([6.0, 6.0, 6.0])
    pos = rng.uniform(0, 6, (64, 3))
    cap = native.suggest_capacity(pos, box, 2.0)
    _, mx = native.neighbor_counts(pos, box, 2.0)
    assert cap >= mx
    assert cap % 8 == 0
