"""ctypes bindings for the C++ host accelerators (csrc/cbt_native.cpp).

Falls back to the pure-Python implementations when the shared library has
not been built (``make -C csrc``); the APIs are drop-in equivalents used by
the dataset preprocessing and symmetry-RMSD hot paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc", "libcbt_native.so")


def get_lib(build: bool = True):
    """Load (building if necessary) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and build:
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)], check=True, capture_output=True, timeout=120)
        except Exception as e:
            print(f"cbt_native build failed ({type(e).__name__}); using Python fallbacks")
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.knn_graph.argtypes = [f32, ctypes.c_int, ctypes.c_int, i32, f32]
    lib.knn_graph.restype = ctypes.c_int
    lib.min_perm_rmsd.argtypes = [f32, f32, ctypes.c_int, ctypes.c_int, i32, ctypes.c_int, f32]
    lib.min_perm_rmsd.restype = None
    lib.parse_pdb_ca.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        f32, ctypes.c_char_p, ctypes.c_char_p,
        f32, i32, i32, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.parse_pdb_ca.restype = ctypes.c_int
    _LIB = lib
    return lib


def knn_graph(pos: np.ndarray, k: int):
    """Exact kNN lists: -> (idx [n, k], dist [n, k]); native or scipy."""
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    n = len(pos)
    k = min(k, n - 1)
    lib = get_lib()
    if lib is not None and n > 2:
        idx = np.zeros((n, k), dtype=np.int32)
        dist = np.zeros((n, k), dtype=np.float32)
        lib.knn_graph(pos, n, k, idx, dist)
        return idx, dist
    from scipy.spatial import cKDTree

    d, i = cKDTree(pos).query(pos, k=k + 1)
    return i[:, 1:].astype(np.int32), d[:, 1:].astype(np.float32)


def min_perm_rmsd(ref: np.ndarray, poses: np.ndarray, perms: np.ndarray) -> np.ndarray:
    """Min RMSD over permutations per pose; native or numpy."""
    ref = np.ascontiguousarray(ref, dtype=np.float32)
    poses = np.ascontiguousarray(poses, dtype=np.float32)
    perms = np.ascontiguousarray(perms, dtype=np.int32)
    m, n, _ = poses.shape
    lib = get_lib()
    if lib is not None and len(perms):
        out = np.zeros(m, dtype=np.float32)
        lib.min_perm_rmsd(ref, poses, m, n, perms, len(perms), out)
        return out
    best = np.sqrt(((poses - ref[None]) ** 2).sum(-1).mean(-1))
    for perm in perms:
        r = np.sqrt(((poses - ref[perm][None]) ** 2).sum(-1).mean(-1))
        best = np.minimum(best, r)
    return best.astype(np.float32)


def parse_pdb_ca_fast(path: str, max_res: int = 4096, max_atoms: int = 65536):
    """Native one-pass PDB scan -> (ca_pos, resnames, chains, atom table)
    or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ca = np.zeros((max_res, 3), dtype=np.float32)
    resname = ctypes.create_string_buffer(max_res * 4)
    chain = ctypes.create_string_buffer(max_res)
    apos = np.zeros((max_atoms, 3), dtype=np.float32)
    aelem = np.zeros(max_atoms, dtype=np.int32)
    ares = np.zeros(max_atoms, dtype=np.int32)
    aname = ctypes.create_string_buffer(max_atoms * 5)
    natoms = ctypes.c_int32(0)
    nres = lib.parse_pdb_ca(path.encode(), max_res, max_atoms, ca, resname, chain, apos, aelem, ares, aname, ctypes.byref(natoms))
    if nres <= 0:
        return None
    na = natoms.value
    names = [resname.raw[i * 4 : i * 4 + 3].decode().strip() for i in range(nres)]
    chains = chain.raw[:nres].decode("latin1")
    anames = [aname.raw[i * 5 : i * 5 + 4].split(b"\x00")[0].decode() for i in range(na)]
    return dict(
        ca_pos=ca[:nres].copy(),
        resnames=names,
        chains=chains,
        atom_pos=apos[:na].copy(),
        atom_elem=aelem[:na].copy(),
        atom_res=ares[:na].copy(),
        atom_names=anames,
    )
