"""ctypes bindings to the native host runtime (``native/enflow_native.cpp``).

Fast host-side trajectory ingestion (binary TRR) and cell-list neighbor
analysis for sizing the device-side fixed-capacity neighbor lists. The
library is auto-built with ``make`` on first use; every entry point has a
pure-Python fallback (``data/formats.py`` / dense NumPy), so nothing breaks
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libenflow_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.enflow_trr_count_frames.restype = ctypes.c_long
    lib.enflow_trr_count_frames.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long)]
    lib.enflow_trr_read.restype = ctypes.c_long
    lib.enflow_trr_read.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int)]
    lib.enflow_trr_index.restype = ctypes.c_long
    lib.enflow_trr_index.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long)]
    lib.enflow_trr_read_frame.restype = ctypes.c_long
    lib.enflow_trr_read_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int)]
    lib.enflow_cell_list_neighbor_counts.restype = ctypes.c_int
    lib.enflow_cell_list_neighbor_counts.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def read_trr(path):
    """Native TRR reader with the same frame-dict interface as
    ``formats.read_trr``. Returns None if the native library is unavailable
    (callers fall back to the pure-Python parser)."""
    lib = _load()
    if lib is None:
        return None
    natoms = ctypes.c_long(0)
    n_frames = lib.enflow_trr_count_frames(path.encode(),
                                           ctypes.byref(natoms))
    if n_frames < 0:
        raise IOError(f"cannot read TRR file {path}")
    n_at = natoms.value
    pos = np.zeros((n_frames, n_at, 3), np.float64)
    vel = np.zeros((n_frames, n_at, 3), np.float64)
    box = np.zeros((n_frames, 3), np.float64)
    steps = np.zeros((n_frames,), np.int64)
    has_vel = np.zeros((n_frames,), np.int32)
    got = lib.enflow_trr_read(
        path.encode(), n_frames, n_at, _dptr(pos), _dptr(vel), _dptr(box),
        steps.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        has_vel.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if got < 0:
        raise IOError(f"native TRR parse failed for {path}")
    frames = []
    for i in range(got):
        frames.append({
            "step": int(steps[i]),
            "time": 0.0,
            "box": np.diag(box[i]) if box[i].any() else None,
            "pos": pos[i],
            "vel": vel[i] if has_vel[i] else None,
            "force": None,
        })
    return frames


def trr_index(path):
    """Frame-start byte offsets + atom count of a .trr, in O(1) memory
    (headers read, bodies seeked). Returns ``(offsets [F] int64, natoms)``
    or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    natoms = ctypes.c_long(0)
    total = lib.enflow_trr_index(path.encode(), 0, None,
                                 ctypes.byref(natoms))
    if total < 0:
        raise IOError(f"cannot read TRR file {path}")
    offsets = np.zeros((total,), np.int64)
    got = lib.enflow_trr_index(
        path.encode(), total,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ctypes.byref(natoms))
    if got != total:
        raise IOError(f"TRR file changed while indexing: {path}")
    return offsets, natoms.value


def read_trr_frame(path, offset, natoms):
    """Read one frame at a byte offset from :func:`trr_index`.

    Returns a frame dict with the same interface as one entry of
    :func:`read_trr`, or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pos = np.zeros((natoms, 3), np.float64)
    vel = np.zeros((natoms, 3), np.float64)
    box = np.zeros((3,), np.float64)
    step = ctypes.c_long(0)
    has_vel = ctypes.c_int(0)
    got = lib.enflow_trr_read_frame(
        path.encode(), int(offset), natoms, _dptr(pos), _dptr(vel),
        _dptr(box), ctypes.byref(step), ctypes.byref(has_vel))
    if got < 0:
        raise IOError(f"native TRR frame read failed at offset {offset} "
                      f"in {path}")
    return {"step": int(step.value), "time": 0.0,
            "box": np.diag(box) if box.any() else None,
            "pos": pos[:got], "vel": vel[:got] if has_vel.value else None,
            "force": None}


def neighbor_counts(pos, box, r_cut):
    """Per-atom within-cutoff neighbor counts (min-image) via the native
    cell list; NumPy O(N^2) fallback. Returns ``(counts [N], max_count)``."""
    pos = np.ascontiguousarray(pos, np.float64)
    box = np.ascontiguousarray(box, np.float64)
    n = pos.shape[0]
    lib = _load()
    if lib is not None:
        counts = np.zeros((n,), np.int32)
        mx = lib.enflow_cell_list_neighbor_counts(
            _dptr(pos), n, _dptr(box), float(r_cut),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if mx >= 0:
            return counts, int(mx)
    diff = pos[:, None, :] - pos[None, :, :]
    diff -= np.round(diff / box) * box
    d2 = (diff**2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    counts = (d2 < r_cut * r_cut).sum(1).astype(np.int32)
    return counts, int(counts.max()) if n else 0


def suggest_capacity(pos, box, r_cut, margin: float = 1.25) -> int:
    """Suggest a device neighbor-list capacity: max observed count times a
    safety margin, rounded up to a multiple of 8 (TPU sublane)."""
    _, mx = neighbor_counts(pos, box, r_cut)
    cap = int(np.ceil(mx * margin))
    return max(8, ((cap + 7) // 8) * 8)
