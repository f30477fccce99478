import math

import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.utils import conversion as cv
from enflow_tpu.utils import helpers as H
from enflow_tpu.utils.constants import sigma, eps, kB, M


def test_dist_roundtrip():
    for unit in ("ang", "nm"):
        x = 3.7
        assert cv.lj_to_dist(cv.dist_to_lj(x, unit), unit) == pytest.approx(x)


def test_dist_values():
    # 3.4 Angstrom == sigma == 1 reduced unit
    assert cv.dist_to_lj(3.4, "ang") == pytest.approx(1.0)
    assert cv.dist_to_lj(0.34, "nm") == pytest.approx(1.0)


def test_time_roundtrip():
    for unit in ("pico", "femto"):
        t = 2.5
        assert cv.lj_to_time(cv.time_to_lj(t, unit), unit) == pytest.approx(t)
    # femto is 1000x smaller than pico
    assert cv.time_to_lj(1.0, "femto") == pytest.approx(cv.time_to_lj(1e-3, "pico"))


def test_vel_femto_fixed():
    # The reference has b=1e-12 for femto in vel conversions (conversion.py:35,61
    # copy-paste bug). Here femto must really be 1e-15.
    v = 1.0
    assert cv.vel_to_lj(v, "ang", "femto") == pytest.approx(
        cv.meter_per_sec_to_lj(v * 1e-10 / 1e-15)
    )
    assert cv.lj_to_vel(cv.vel_to_lj(v, "nm", "femto"), "nm", "femto") == pytest.approx(v)


def test_kelvin_roundtrip():
    assert cv.lj_to_kelvin(cv.kelvin_to_lj(300.0)) == pytest.approx(300.0)
    assert cv.kelvin_to_lj(300.0) == pytest.approx(300.0 * kB / eps)


def test_log_gaussian_reference_convention():
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)))
    expect = -0.5 * (float((np.asarray(z) ** 2).sum()) + math.log(2 * math.pi))
    assert float(H.log_gaussian(z)) == pytest.approx(expect)


def test_log_gaussian_masked():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(2, 5, 3))
    mask = np.zeros((2, 5), dtype=bool)
    mask[0, :3] = True
    mask[1, :2] = True
    got = float(H.log_gaussian(jnp.asarray(z), jnp.asarray(mask)[..., None]))
    expect = -0.5 * ((z[0, :3] ** 2).sum() + (z[1, :2] ** 2).sum() + math.log(2 * math.pi))
    assert got == pytest.approx(expect)


def test_apply_pbc_wraps_into_primary_cell():
    box = jnp.array([2.0, 2.0, 2.0])
    pos = jnp.array([[1.2, -1.2, 0.3], [3.1, -2.9, 0.0]])
    wrapped = np.asarray(H.apply_pbc(pos, box))
    assert (wrapped <= 1.0 + 1e-12).all() and (wrapped >= -1.0 - 1e-12).all()
    # displacement to original is an integer multiple of the box
    k = (np.asarray(pos) - wrapped) / np.asarray(box)
    assert np.allclose(k, np.round(k))


def test_min_image():
    box = jnp.array([10.0, 10.0, 10.0])
    diff = jnp.array([[6.0, -6.0, 4.9]])
    out = np.asarray(H.min_image(diff, box))
    assert np.allclose(out, [[-4.0, 4.0, 4.9]])


def test_one_hot():
    out = np.asarray(H.one_hot(jnp.array([0, 2]), 3))
    assert np.allclose(out, [[1, 0, 0], [0, 0, 1]])


def test_segment_ops_match_dense():
    rng = np.random.default_rng(2)
    data = rng.normal(size=(6, 4))
    seg = np.array([0, 0, 1, 2, 2, 2])
    s = np.asarray(H.unsorted_segment_sum(jnp.asarray(data), jnp.asarray(seg), 4))
    m = np.asarray(H.unsorted_segment_mean(jnp.asarray(data), jnp.asarray(seg), 4))
    for i in range(4):
        rows = data[seg == i]
        expect_s = rows.sum(0) if len(rows) else np.zeros(4)
        assert np.allclose(s[i], expect_s)
        expect_m = rows.mean(0) if len(rows) else np.zeros(4)
        assert np.allclose(m[i], expect_m)


def test_get_element():
    assert H.get_element("C", 999.0) == "C"
    assert H.get_element("", 1.008) == "H"
    assert H.get_element("", 12.011) == "C"
    assert H.get_element("", 15.999) == "O"
    with pytest.raises(ValueError):
        H.get_element("", 200.0)


def test_get_box_len():
    pos = jnp.array([[0.0, 0.0, 0.0], [3.2, 1.9, 4.1]])
    assert np.allclose(np.asarray(H.get_box_len(pos)), [3.0, 2.0, 4.0])
