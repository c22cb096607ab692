"""ctypes loader for the native host kernels (native/host_kernels.cpp).

Compiled on demand with g++ into a per-user cache; every entry point has a
NumPy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "host_kernels.cpp",
)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha1(f.read()).hexdigest()[:16]
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "nanokappa_native"
        )
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"libnk_host_{tag}.so")
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", so],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        c_dp = ctypes.POINTER(ctypes.c_double)
        c_u8 = ctypes.POINTER(ctypes.c_uint8)
        c_i64 = ctypes.POINTER(ctypes.c_int64)
        c_i32 = ctypes.POINTER(ctypes.c_int32)
        lib.crystal_energy_table.argtypes = [
            c_dp, c_u8, ctypes.c_int64, c_dp, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, c_dp,
        ]
        lib.build_alias.argtypes = [c_dp, ctypes.c_int64, c_dp, c_i64, c_i64]
        lib.count_crossings.argtypes = [
            c_dp, c_dp, ctypes.c_int64, c_dp, c_dp, c_dp, ctypes.c_int64, c_i32,
        ]
        lib.format_particle_rows.argtypes = [
            c_i64, c_i64, c_dp, c_dp, c_dp, c_dp, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.format_particle_rows.restype = ctypes.c_int64
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def crystal_energy_sums(
    omega: np.ndarray, active: np.ndarray, T: np.ndarray, hbar: float, kb: float
) -> np.ndarray | None:
    """sum_m hbar*omega_m*n0(T, omega_m) for each T; None if no native lib."""
    lib = _load()
    if lib is None:
        return None
    omega = np.ascontiguousarray(omega.reshape(-1), dtype=np.float64)
    act = np.ascontiguousarray(active.reshape(-1), dtype=np.uint8)
    T = np.ascontiguousarray(T, dtype=np.float64)
    out = np.empty(len(T), dtype=np.float64)
    lib.crystal_energy_table(
        _ptr(omega, ctypes.c_double), _ptr(act, ctypes.c_uint8), len(omega),
        _ptr(T, ctypes.c_double), len(T),
        ctypes.c_double(hbar), ctypes.c_double(kb), _ptr(out, ctypes.c_double),
    )
    return out


def build_alias(weights: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(weights, dtype=np.float64)
    n = len(w)
    prob = np.empty(n, dtype=np.float64)
    alias = np.empty(n, dtype=np.int64)
    work = np.empty(2 * n, dtype=np.int64)
    lib.build_alias(
        _ptr(w, ctypes.c_double), n, _ptr(prob, ctypes.c_double),
        _ptr(alias, ctypes.c_int64), _ptr(work, ctypes.c_int64),
    )
    return prob, alias


def format_particle_rows(
    q: np.ndarray, j: np.ndarray, pos: np.ndarray, occ: np.ndarray
) -> bytes | None:
    """particle_data.txt rows, formatted natively (np.savetxt's per-row
    Python formatting costs ~4 s at 1e6 rows on the driver's 100-step
    checkpoint path). Byte-identical to np.savetxt with
    fmt='%d, %d, %.3f, %.3f, %.3f, %.6e'. None if no native lib."""
    lib = _load()
    if lib is None:
        return None
    n = len(q)
    qq = np.ascontiguousarray(q, dtype=np.int64)
    jj = np.ascontiguousarray(j, dtype=np.int64)
    x = np.ascontiguousarray(pos[:, 0], dtype=np.float64)
    y = np.ascontiguousarray(pos[:, 1], dtype=np.float64)
    z = np.ascontiguousarray(pos[:, 2], dtype=np.float64)
    oc = np.ascontiguousarray(occ, dtype=np.float64)
    cap = 96 * max(n, 1) + 256
    buf = np.empty(cap, dtype=np.uint8)  # ctypes' string buffer zero-fills
    #   and .raw copies the whole cap — ~1.7 s of pure overhead at 1e6 rows
    w = lib.format_particle_rows(
        _ptr(qq, ctypes.c_int64), _ptr(jj, ctypes.c_int64),
        _ptr(x, ctypes.c_double), _ptr(y, ctypes.c_double),
        _ptr(z, ctypes.c_double), _ptr(oc, ctypes.c_double),
        n, ctypes.cast(buf.ctypes.data, ctypes.c_char_p), cap,
    )
    if w < 0:
        return None
    return memoryview(buf)[: int(w)]


def count_crossings(
    origins: np.ndarray, direction: np.ndarray,
    tri_a: np.ndarray, tri_e1: np.ndarray, tri_e2: np.ndarray,
) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    o = np.ascontiguousarray(origins, dtype=np.float64)
    d = np.ascontiguousarray(direction, dtype=np.float64)
    a = np.ascontiguousarray(tri_a, dtype=np.float64)
    e1 = np.ascontiguousarray(tri_e1, dtype=np.float64)
    e2 = np.ascontiguousarray(tri_e2, dtype=np.float64)
    out = np.empty(len(o), dtype=np.int32)
    lib.count_crossings(
        _ptr(o, ctypes.c_double), _ptr(d, ctypes.c_double), len(o),
        _ptr(a, ctypes.c_double), _ptr(e1, ctypes.c_double),
        _ptr(e2, ctypes.c_double), len(a), _ptr(out, ctypes.c_int32),
    )
    return out
