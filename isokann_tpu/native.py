"""ctypes bindings to the native host-ops library (native/host_ops.cpp).

Builds the shared library on first import if the toolchain is available;
callers fall back to the pure-numpy implementations otherwise (see
``isokann_tpu.sample`` / ``isokann_tpu.analysis.reactivepath``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
# wheel installs carry the prebuilt library inside the package
# (setup.py BuildWithNative); the repo layout builds it in native/
_SO_PKG = os.path.join(os.path.dirname(__file__), "libisokann_host.so")
_SO = os.path.join(_DIR, "libisokann_host.so")


def _build():
    subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                   capture_output=True)


def _load():
    if os.path.exists(_SO_PKG):
        lib = ctypes.CDLL(_SO_PKG)
    else:
        if not os.path.exists(_SO):
            _build()
        lib = ctypes.CDLL(_SO)

    i64 = ctypes.c_int64
    pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.pickclosest_sorted.restype = i64
    lib.pickclosest_sorted.argtypes = [pd, i64, pd, i64, pi]

    lib.ash_greedy.restype = None
    lib.ash_greedy.argtypes = [pd, pd, i64, pd, i64, ctypes.c_double,
                               ctypes.c_double, i64, ctypes.c_double, i64, pi]

    lib.bellman_ford_csr.restype = None
    lib.bellman_ford_csr.argtypes = [pi, pi, pd, i64, pi, i64, pd, pi]

    lib.picking_maxmin.restype = None
    lib.picking_maxmin.argtypes = [pd, i64, i64, i64, pi, pd]

    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    cs = ctypes.c_char_p
    lib.dcd_write.restype = i64
    lib.dcd_write.argtypes = [cs, pf, i64, i64,
                              ctypes.POINTER(ctypes.c_double),
                              ctypes.c_double]
    lib.dcd_info.restype = i64
    lib.dcd_info.argtypes = [cs, ctypes.POINTER(i64), ctypes.POINTER(i64),
                             ctypes.POINTER(i64)]
    lib.dcd_read.restype = i64
    lib.dcd_read.argtypes = [cs, pf, pd, i64]
    return lib


_lib = _load()


def pickclosest_native(hs_sorted: np.ndarray, ns_sorted: np.ndarray):
    """Sorted-sweep closest matching (native)."""
    hs = np.ascontiguousarray(hs_sorted, np.float64)
    ns = np.ascontiguousarray(ns_sorted, np.float64)
    out = np.empty(len(ns), np.int64)
    k = _lib.pickclosest_sorted(hs, len(hs), ns, len(ns), out)
    return out[:k]


def ash_resample_native(ys, p, counts, lo, step, window, n0, npick):
    """Greedy ASH gap-filling (native).  Mutates p and counts."""
    ys = np.ascontiguousarray(ys, np.float64)
    p = np.ascontiguousarray(p, np.float64)
    counts = np.ascontiguousarray(counts, np.float64)
    out = np.empty(npick, np.int64)
    _lib.ash_greedy(ys, p, len(ys), counts, len(counts), float(lo),
                    float(step), int(window), float(n0), int(npick), out)
    return out


def bellman_ford_csr_native(indptr, indices, weights, n, sources):
    """Sparse Bellman-Ford (native).  Returns (dist, parent)."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    weights = np.ascontiguousarray(weights, np.float64)
    sources = np.ascontiguousarray(sources, np.int64)
    dist = np.empty(n, np.float64)
    parent = np.empty(n, np.int64)
    _lib.bellman_ford_csr(indptr, indices, weights, n, sources, len(sources),
                          dist, parent)
    return dist, parent


def picking_native(X, npick):
    """Greedy farthest-point picking (native).  Returns (indices, min_d2)."""
    X = np.ascontiguousarray(X, np.float64)
    npts, d = X.shape
    out = np.empty(npick, np.int64)
    mins = np.empty(npts, np.float64)
    _lib.picking_maxmin(X, npts, d, npick, out, mins)
    return out, mins


def dcd_write_native(path, xyz, box=None, dt_ps=0.002):
    """Write a CHARMM/NAMD DCD trajectory.  ``xyz``: (nframes, natoms, 3)
    [nm]; ``box``: optional (3,) [nm] orthorhombic cell."""
    import ctypes as ct
    xyz = np.ascontiguousarray(xyz, np.float32)
    nframes, natoms = xyz.shape[0], xyz.shape[1]
    bptr = None
    if box is not None:
        b = np.ascontiguousarray(np.asarray(box, np.float64).ravel()[:3])
        bptr = b.ctypes.data_as(ct.POINTER(ct.c_double))
    rc = _lib.dcd_write(path.encode(), xyz, nframes, natoms, bptr,
                        float(dt_ps))
    if rc != 0:
        raise IOError(f"dcd_write failed (code {rc}) for {path}")
    return path


def dcd_read_native(path):
    """Read a DCD trajectory -> (xyz (nframes, natoms, 3) [nm],
    boxes (nframes, 3) [nm] or None)."""
    import ctypes as ct
    na, nf, hc = ct.c_int64(), ct.c_int64(), ct.c_int64()
    rc = _lib.dcd_info(path.encode(), ct.byref(na), ct.byref(nf),
                       ct.byref(hc))
    if rc != 0:
        raise IOError(f"not a readable DCD file: {path} (code {rc})")
    xyz = np.empty((nf.value, na.value, 3), np.float32)
    boxes = np.zeros((nf.value, 3), np.float64)
    rc = _lib.dcd_read(path.encode(), xyz, boxes, nf.value)
    if rc != 0:
        raise IOError(f"dcd_read failed (code {rc}) for {path}")
    return xyz, (boxes if hc.value else None)
