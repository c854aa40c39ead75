"""Native (C++) host-side data loader, loaded via ctypes.

Builds `libdg_data.so` from `sgf_extract.cc` on first use (g++ -O3); falls
back cleanly when no compiler is available — callers check
:func:`available` and use the Python path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdg_data.so")
_lock = threading.Lock()
_lib = None
_MAX_MOVES = 1024


class _Example(ctypes.Structure):
    _fields_ = [
        ("num_moves", ctypes.c_int32),
        ("target", ctypes.c_int32),
        ("color", ctypes.c_int32),
        ("komi", ctypes.c_float),
        ("value", ctypes.c_float),
        ("has_ownership", ctypes.c_float),
        ("moves", ctypes.c_int32 * _MAX_MOVES),
        ("policy", ctypes.c_float * 362),
        ("ownership", ctypes.c_float * 361),
    ]


def _build() -> bool:
    src = os.path.join(_DIR, "sgf_extract.cc")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(
                    os.path.join(_DIR, "sgf_extract.cc")):
            if not _build():
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(_SO)
            lib.extract_single_example.restype = ctypes.c_int
            lib.extract_single_example.argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.POINTER(_Example)]
            lib.extract_batch.restype = ctypes.c_int
            lib.extract_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_uint64, ctypes.POINTER(_Example)]
            assert lib.dg_native_abi_version() == 1
            _lib = lib
        except Exception:
            _lib = False
        return _lib


def available() -> bool:
    return _load() is not False


def extract_batch(lines: list[str], seed: int):
    """Extract one example per line; returns a dict of numpy arrays plus a
    validity mask (False rows failed to parse / were too short)."""
    lib = _load()
    if lib is False:
        raise RuntimeError("native loader unavailable")
    n = len(lines)
    out = (_Example * n)()
    arr = (ctypes.c_char_p * n)(*[l.encode() for l in lines])
    lib.extract_batch(arr, n, ctypes.c_uint64(seed or 1), out)

    valid = np.zeros(n, bool)
    moves = np.full((n, _MAX_MOVES), 361, np.int32)
    targets = np.zeros(n, np.int32)
    komi = np.zeros(n, np.float32)
    policy = np.zeros((n, 362), np.float32)
    value = np.zeros(n, np.float32)
    ownership = np.zeros((n, 361), np.float32)
    has_ownership = np.zeros(n, np.float32)
    for i in range(n):
        e = out[i]
        if e.num_moves < 30 or e.num_moves > _MAX_MOVES:
            continue
        valid[i] = True
        moves[i] = np.ctypeslib.as_array(e.moves)
        targets[i] = e.target
        komi[i] = e.komi
        policy[i] = np.ctypeslib.as_array(e.policy)
        value[i] = e.value
        ownership[i] = np.ctypeslib.as_array(e.ownership)
        has_ownership[i] = e.has_ownership
    return dict(valid=valid, moves=moves, targets=targets, komi=komi,
                policy=policy, value=value, ownership=ownership,
                has_ownership=has_ownership,
                num_moves=np.asarray([out[i].num_moves for i in range(n)],
                                     np.int32))
