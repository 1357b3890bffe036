"""Symmetry-corrected RMSD (host-side).

Own implementation of the capability the reference gets from its vendored
``spyrmsd/`` + ``utils/molecules_utils.py:get_symmetry_rmsd``: the RMSD
between a predicted and reference pose minimized over the automorphisms of
the molecular graph (no superposition — docking RMSD is absolute), with a
Hungarian per-element assignment fallback and a wall-clock timeout like the
reference's 10 s SIGALRM guard.

Automorphisms are enumerated with networkx VF2++ on the element-colored
bond graph.
"""

from __future__ import annotations

import itertools
import time
from typing import List, Optional, Sequence, Tuple

import networkx as nx
import numpy as np
from scipy.optimize import linear_sum_assignment


def plain_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1))))


def _mol_graph(atomic_nums: Sequence[int], bonds: Sequence[Tuple[int, int, int]]) -> nx.Graph:
    G = nx.Graph()
    for i, z in enumerate(atomic_nums):
        G.add_node(i, z=int(z))
    for i, j, _ in bonds:
        G.add_edge(int(i), int(j))
    return G


def graph_automorphisms(atomic_nums, bonds, max_count: int = 10000, timeout_s: float = 10.0):
    """Yield automorphism index arrays perm with perm[i] = image of node i."""
    G = _mol_graph(atomic_nums, bonds)
    n = G.number_of_nodes()
    t0 = time.monotonic()
    count = 0
    try:
        it = nx.vf2pp_all_isomorphisms(G, G, node_label="z")
    except AttributeError:  # very old networkx
        from networkx.algorithms.isomorphism import GraphMatcher, categorical_node_match

        it = GraphMatcher(G, G, node_match=categorical_node_match("z", 0)).isomorphisms_iter()
    for mapping in it:
        perm = np.empty(n, dtype=int)
        for k, v in mapping.items():
            perm[k] = v
        yield perm
        count += 1
        if count >= max_count or time.monotonic() - t0 > timeout_s:
            return


def hungarian_rmsd(ref: np.ndarray, pos: np.ndarray, atomic_nums) -> float:
    """Per-element optimal assignment RMSD (ignores bonding; lower bound-ish
    fallback, mirrors spyrmsd's hungarian module's role)."""
    nums = np.asarray(atomic_nums)
    total, count = 0.0, 0
    for z in np.unique(nums):
        idx = np.nonzero(nums == z)[0]
        d2 = np.sum((ref[idx][:, None, :] - pos[idx][None, :, :]) ** 2, axis=-1)
        r, c = linear_sum_assignment(d2)
        total += d2[r, c].sum()
        count += len(idx)
    return float(np.sqrt(total / count))


def symmetry_rmsd(
    ref: np.ndarray,
    poses: np.ndarray,
    atomic_nums,
    bonds,
    max_automorphisms: int = 10000,
    timeout_s: float = 10.0,
) -> np.ndarray:
    """Minimum RMSD over molecular-graph automorphisms, no superposition.

    ref: [n, 3] — or [P, n, 3] for multi-binding-pose ground truth (the
    reference's orig_pos LIST, datasets/moad.py:506-518): the minimum over
    poses AND automorphisms is returned, so a prediction matching ANY valid
    binding pose scores well.
    poses: [m, n, 3] (or [n, 3]). Returns [m] (or scalar).
    Falls back to Hungarian assignment if automorphism enumeration fails.
    """
    ref = np.asarray(ref)
    if ref.ndim == 3:
        alts = [
            symmetry_rmsd(r, poses, atomic_nums, bonds, max_automorphisms, timeout_s)
            for r in ref
        ]
        return np.min(np.stack([np.atleast_1d(np.asarray(a, dtype=np.float64)) for a in alts]), axis=0) \
            if poses.ndim == 3 else float(min(alts))
    single = poses.ndim == 2
    P = poses[None] if single else poses
    try:
        perms = [
            p
            for p in graph_automorphisms(atomic_nums, bonds, max_automorphisms, timeout_s)
            if not (p == np.arange(len(p))).all()
        ]
        from ..native import min_perm_rmsd

        best = min_perm_rmsd(
            np.asarray(ref, dtype=np.float32),
            np.asarray(P, dtype=np.float32),
            np.asarray(perms, dtype=np.int32).reshape(len(perms), -1),
        ).astype(np.float64)
    except Exception:
        best = np.array([plain_rmsd(ref, p) for p in P])
        for k in range(len(P)):
            best[k] = min(best[k], hungarian_rmsd(ref, P[k], atomic_nums))
    return best[0] if single else best


def ground_truth_poses(hc) -> np.ndarray:
    """Ground-truth pose stack of a HostComplex: [P, l, 3] when alternative
    binding poses are recorded (multi-pose MOAD ground truth), else the
    primary [l, 3]. Feed to symmetry_rmsd for min-over-poses metrics."""
    alt = getattr(hc, "alt_orig_lig_pos", None)
    if alt is not None and len(alt):
        return np.concatenate([np.asarray(hc.orig_lig_pos)[None], np.asarray(alt)], axis=0)
    return np.asarray(hc.orig_lig_pos)


def get_symmetry_rmsd(mol, ref_pos, pos_list, mol2=None) -> List[float]:
    """Reference-API-compatible wrapper (utils/molecules_utils.py:3-39):
    mol carries topology; pos_list is a list of predicted coordinates."""
    poses = np.stack([np.asarray(p) for p in pos_list])
    out = symmetry_rmsd(np.asarray(ref_pos), poses, mol.atomic_nums, mol.bonds)
    return [float(x) for x in np.atleast_1d(out)]
