"""Native (C++) host kernels, loaded via ctypes.

Built on demand with g++ (no pybind11 dependency); every consumer has a
pure-Python fallback, so the framework works without a toolchain — the
native path just makes setup (I/O parsing, ILU factorization, SpGEMM)
C++-fast, matching the reference's all-C++ host runtime.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "tt_native.cpp")
_SO = os.path.join(_HERE, "build", "libtt_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            l = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        l.tt_read_mm_header.restype = ctypes.c_int
        l.tt_read_mm_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(i64), ctypes.POINTER(i64),
            ctypes.POINTER(i64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(i64)]
        l.tt_read_mm.restype = i64
        l.tt_read_mm.argtypes = [
            ctypes.c_char_p, i64, i64, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.float64)]
        l.tt_ilu0.restype = i64
        l.tt_ilu0.argtypes = [
            i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64)]
        l.tt_spgemm_count.restype = None
        l.tt_spgemm_count.argtypes = [
            i64, i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int64)]
        l.tt_spgemm_fill.restype = None
        l.tt_spgemm_fill.argtypes = [
            i64, i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64)]
        l.tt_splu.restype = i64
        l.tt_splu.argtypes = [
            i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64), i64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int64)]
        l.tt_ilut.restype = i64
        l.tt_ilut.argtypes = [
            i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            ctypes.c_double, ctypes.c_double, i64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64)]
        l.tt_iluk.restype = i64
        l.tt_iluk.argtypes = [
            i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32), i64, i64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32)]
        l.tt_ghost_slots.restype = i64
        l.tt_ghost_slots.argtypes = [
            i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int64)]
        l.tt_spchol.restype = i64
        l.tt_spchol.argtypes = [
            i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64), i64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64)]
        l.tt_spchol_solve.restype = None
        l.tt_spchol_solve.argtypes = [
            i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64)]
        l.tt_splu_solve.restype = None
        l.tt_splu_solve.argtypes = [
            i64, np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64)]
        _lib = l
        return _lib


# ---------------------------------------------------------------------------
# python-facing wrappers (None / raise → caller falls back to pure Python)
# ---------------------------------------------------------------------------


def read_mm_native(path: str):
    """Parse a MatrixMarket coordinate file. Returns (rows, cols, vals,
    shape, symm) or None when the native lib is unavailable / format
    unsupported (array format). ``.gz`` files are decompressed (streamed
    through zlib) to a temp file first, then parsed natively."""
    l = lib()
    if l is None:
        return None
    if str(path).endswith(".gz"):
        import gzip
        import shutil
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".mtx", delete=False) as tmp:
            try:
                with gzip.open(path, "rb") as src:
                    shutil.copyfileobj(src, tmp, length=1 << 20)
                tmp.flush()
                return read_mm_native(tmp.name)
            except OSError:
                return None
            finally:
                os.unlink(tmp.name)
    i64 = ctypes.c_int64
    m = i64()
    n = i64()
    nnz = i64()
    symm = ctypes.c_int()
    pattern = ctypes.c_int()
    pos = i64()
    rc = l.tt_read_mm_header(str(path).encode(), m, n, nnz, symm, pattern,
                             pos)
    if rc != 0:
        return None
    rows = np.empty(nnz.value, np.int64)
    cols = np.empty(nnz.value, np.int64)
    vals = np.empty(nnz.value, np.float64)
    got = l.tt_read_mm(str(path).encode(), pos.value, nnz.value,
                       pattern.value, rows, cols, vals)
    if got != nnz.value:
        return None
    return rows, cols, vals, (m.value, n.value), symm.value


def ilu0_native(n: int, row_ptr: np.ndarray, cols: np.ndarray,
                vals: np.ndarray):
    """In-place ILU(0) on sorted CSR arrays; returns factored vals or None."""
    l = lib()
    if l is None:
        return None
    v = np.ascontiguousarray(vals, dtype=np.float64).copy()
    l.tt_ilu0(n, np.ascontiguousarray(row_ptr, np.int64),
              np.ascontiguousarray(cols, np.int32), v)
    return v


def ilut_native(n: int, row_ptr: np.ndarray, cols: np.ndarray,
                vals: np.ndarray, fill: float, droptol: float):
    """ILUT(p, τ) on sorted CSR arrays. Returns
    (l_ptr, l_cols, l_vals, u_ptr, u_cols, u_vals) — L strict lower, U
    rows diagonal-first — or None when the native lib is unavailable."""
    l = lib()
    if l is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float64)
    nnz = int(row_ptr[-1])
    cap = max(int(nnz * (fill + 1.0)) + 2 * n, 1024)
    for _ in range(8):
        l_ptr = np.zeros(n + 1, np.int64)
        l_cols = np.zeros(cap, np.int32)
        l_vals = np.zeros(cap, np.float64)
        u_ptr = np.zeros(n + 1, np.int64)
        u_cols = np.zeros(cap, np.int32)
        u_vals = np.zeros(cap, np.float64)
        r = l.tt_ilut(n, row_ptr, cols, vals, float(fill), float(droptol),
                      cap, l_ptr, l_cols, l_vals, u_ptr, u_cols, u_vals)
        if r >= 0:
            return (l_ptr, l_cols[: l_ptr[n]], l_vals[: l_ptr[n]],
                    u_ptr, u_cols[: u_ptr[n]], u_vals[: u_ptr[n]])
        cap = max(int(-r) * 2, cap * 2)
    raise RuntimeError("tt_ilut: fill capacity retry limit exceeded")


def iluk_native(n: int, row_ptr: np.ndarray, cols: np.ndarray,
                kfill: int):
    """ILU(k) symbolic level-of-fill pattern (Ifpack2::IlukGraph role).
    Returns (row_ptr, cols) of the augmented pattern, or None if the
    native library is unavailable."""
    l = lib()
    if l is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    cols = np.ascontiguousarray(cols, np.int32)
    cap = max(int(row_ptr[-1]) * (kfill + 2), 16)
    for _ in range(3):
        out_ptr = np.empty(n + 1, np.int64)
        out_cols = np.empty(cap, np.int32)
        need = l.tt_iluk(n, row_ptr, cols, kfill, cap, out_ptr, out_cols)
        if need <= cap:
            return out_ptr, out_cols[:need]
        cap = int(need)
    return None  # pragma: no cover


def ghost_slots_native(bc_cols: np.ndarray):
    """Sorted-unique ghost gids + per-entry slots for one shard's boundary
    columns (contiguous maps: owner-major order == gid order). Returns
    (ghost_gids, slots) or None."""
    l = lib()
    if l is None:
        return None
    bc = np.ascontiguousarray(bc_cols, np.int64)
    nb = len(bc)
    if nb == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    gids = np.empty(nb, np.int64)
    slots = np.empty(nb, np.int64)
    ng = l.tt_ghost_slots(nb, bc, gids, slots)
    return gids[:ng], slots


def spgemm_native(a, b):
    """C = A @ B on CsrHost operands via the native kernel, or None."""
    l = lib()
    if l is None:
        return None
    from ..ops.formats import CsrHost

    m, k = a.shape
    k2, n = b.shape
    a_ptr = np.ascontiguousarray(a.row_ptr, np.int64)
    a_cols = np.ascontiguousarray(a.cols, np.int32)
    a_vals = np.ascontiguousarray(a.vals, np.float64)
    b_ptr = np.ascontiguousarray(b.row_ptr, np.int64)
    b_cols = np.ascontiguousarray(b.cols, np.int32)
    b_vals = np.ascontiguousarray(b.vals, np.float64)
    counts = np.zeros(m, np.int64)
    l.tt_spgemm_count(m, n, a_ptr, a_cols, b_ptr, b_cols, counts)
    c_ptr = np.zeros(m + 1, np.int64)
    np.cumsum(counts, out=c_ptr[1:])
    c_cols = np.empty(int(c_ptr[-1]), np.int32)
    c_vals = np.empty(int(c_ptr[-1]), np.float64)
    l.tt_spgemm_fill(m, n, a_ptr, a_cols, a_vals, b_ptr, b_cols, b_vals,
                     c_ptr, c_cols, c_vals)
    return CsrHost(c_ptr, c_cols, c_vals, (m, n))


def splu_native(n, row_ptr, cols, vals):
    """Sparse LU (Gilbert-Peierls, partial pivoting) via the native lib.

    Returns (l_ptr, l_cols, l_vals, u_ptr, u_cols, u_vals, perm) or None
    when the native library is unavailable. L/U are column-major: L column
    j holds original-row multipliers (unit diagonal implicit); U column j
    holds pivot-position rows with the diagonal last.
    """
    l = lib()
    if l is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    cap = max(int(row_ptr[-1]) * 8, 16 * n, 1024)
    for _ in range(8):
        l_ptr = np.zeros(n + 1, np.int64)
        l_cols = np.zeros(cap, np.int32)
        l_vals = np.zeros(cap, np.float64)
        u_ptr = np.zeros(n + 1, np.int64)
        u_cols = np.zeros(cap, np.int32)
        u_vals = np.zeros(cap, np.float64)
        perm = np.zeros(n, np.int64)
        r = l.tt_splu(n, row_ptr, cols, vals, cap, l_ptr, l_cols, l_vals,
                      u_ptr, u_cols, u_vals, perm)
        if r >= 0:
            return (l_ptr, l_cols[: l_ptr[n]], l_vals[: l_ptr[n]],
                    u_ptr, u_cols[: u_ptr[n]], u_vals[: u_ptr[n]], perm)
        cap = max(int(-r) * 2, cap * 2)
    raise RuntimeError("tt_splu: fill capacity retry limit exceeded")


class NotSpdError(ValueError):
    """tt_spchol found a non-positive reduced diagonal."""


def spchol_native(n, row_ptr, cols, vals):
    """Sparse Cholesky LL^T (up-looking, elimination tree) via the
    native lib. Returns (l_ptr, l_cols, l_vals) — CSC, diagonal first
    per column — or None when the library is unavailable; raises
    NotSpdError when the matrix is not positive definite."""
    l = lib()
    if l is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    cap = max(int(row_ptr[-1]) * 4, 8 * n, 1024)
    for _ in range(8):
        l_ptr = np.zeros(n + 1, np.int64)
        l_cols = np.zeros(cap, np.int32)
        l_vals = np.zeros(cap, np.float64)
        r = l.tt_spchol(n, row_ptr, cols, vals, cap, l_ptr, l_cols,
                        l_vals)
        if r >= 0:
            return l_ptr, l_cols[:r], l_vals[:r]
        if -r >= 10 ** 15:
            raise NotSpdError(
                f"tt_spchol: non-positive pivot at column {-r - 10**15} "
                "(matrix not symmetric positive definite)")
        cap = max(int(-r) * 2, cap * 2)
    raise RuntimeError("tt_spchol: fill capacity retry limit exceeded")


def spchol_solve_native(factors, b):
    l = lib()
    if l is None:
        return None
    l_ptr, l_cols, l_vals = factors
    n = len(l_ptr) - 1
    b = np.ascontiguousarray(b, dtype=np.float64)
    out = np.zeros(n, np.float64)
    l.tt_spchol_solve(n, l_ptr, l_cols, l_vals, b, out)
    return out


def splu_solve_native(factors, b):
    l = lib()
    if l is None:
        return None
    l_ptr, l_cols, l_vals, u_ptr, u_cols, u_vals, perm = factors
    n = len(perm)
    b = np.ascontiguousarray(b, dtype=np.float64)
    out = np.zeros(n, np.float64)
    l.tt_splu_solve(n, l_ptr, l_cols, l_vals, u_ptr, u_cols, u_vals,
                    perm, b, out)
    return out
