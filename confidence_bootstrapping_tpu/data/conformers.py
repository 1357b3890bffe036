"""Conformer generation and conformer matching (host-side).

The reference relies on RDKit ETKDG for seed conformers and on
torsional-diffusion conformer matching (``datasets/conformer_matching.py``):
``optimize_rotatable_bonds`` runs scipy differential evolution over torsion
angles to minimize RMSD to the crystal pose (:30-61).

Without RDKit in the image, seed conformers fall back to the input geometry
with randomized torsions (the diffusion prior randomizes them anyway,
``sampler.randomize_position``); with RDKit importable, ETKDG is used.
The matching optimizer itself is pure scipy/numpy over our torsion apply.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.optimize import differential_evolution

from .featurize import get_transformation_mask
from .mol_io import Molecule

try:  # pragma: no cover
    from rdkit import Chem
    from rdkit.Chem import AllChem

    HAVE_RDKIT = True
except Exception:  # pragma: no cover
    HAVE_RDKIT = False


def _apply_torsions_np(pos, tor_src, tor_dst, mask_rotate, updates):
    pos = pos.copy()
    for k in range(len(tor_src)):
        u, v = tor_src[k], tor_dst[k]
        axis = pos[u] - pos[v]
        n = np.linalg.norm(axis)
        if n < 1e-9:
            continue
        axis = axis / n * updates[k]
        from scipy.spatial.transform import Rotation as R

        rot = R.from_rotvec(axis).as_matrix()
        sel = mask_rotate[k]
        pos[sel] = (pos[sel] - pos[v]) @ rot.T + pos[v]
    return pos


def _aligned_rmsd(a, b):
    """RMSD after optimal rigid superposition (Kabsch)."""
    ca, cb = a.mean(0), b.mean(0)
    A, B = a - ca, b - cb
    H = A.T @ B
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        R = Vt.T @ np.diag([1.0, 1.0, -1.0]) @ U.T
    return float(np.sqrt(np.mean(np.sum((A @ R.T - B) ** 2, axis=1))))


def optimize_rotatable_bonds(
    mol: Molecule,
    true_pos: np.ndarray,
    seed_pos: Optional[np.ndarray] = None,
    popsize: int = 15,
    maxiter: int = 20,
    seed: int = 0,
) -> Tuple[np.ndarray, float]:
    """Match a seed conformer's torsions to the crystal pose.

    Returns (matched positions, aligned RMSD). Differential evolution over
    the rotatable-bond angles, objective = superimposed RMSD (the reference
    uses RDKit's GetBestRMS; ours is plain Kabsch RMSD).
    """
    tor_src, tor_dst, mask_rotate = get_transformation_mask(mol.num_atoms, mol.bonds)
    pos0 = seed_pos if seed_pos is not None else mol.pos
    if len(tor_src) == 0:
        return pos0.copy(), _aligned_rmsd(pos0, true_pos)

    def objective(x):
        return _aligned_rmsd(_apply_torsions_np(pos0, tor_src, tor_dst, mask_rotate, x), true_pos)

    bounds = [(-np.pi, np.pi)] * len(tor_src)
    res = differential_evolution(
        objective, bounds, popsize=popsize, maxiter=maxiter, seed=seed, polish=False, tol=0.01
    )
    matched = _apply_torsions_np(pos0, tor_src, tor_dst, mask_rotate, res.x)
    return matched, float(res.fun)


def generate_conformer(mol: Molecule, seed: int = 0, randomize_torsions: bool = True) -> np.ndarray:
    """Seed conformer generation.

    RDKit present: ETKDG embedding (the reference path). Otherwise: the
    input geometry with uniformly randomized torsion angles — valid because
    bond lengths/angles are preserved and the diffusion process only ever
    modifies the (tr, rot, torsion) degrees of freedom.
    """
    if HAVE_RDKIT:  # pragma: no cover - no rdkit in this image
        rd = Chem.RWMol()
        for z in mol.atomic_nums:
            rd.AddAtom(Chem.Atom(int(z)))
        bt = {1: Chem.BondType.SINGLE, 2: Chem.BondType.DOUBLE, 3: Chem.BondType.TRIPLE, 4: Chem.BondType.AROMATIC}
        for i, j, o in mol.bonds:
            rd.AddBond(int(i), int(j), bt.get(o, Chem.BondType.SINGLE))
        m = rd.GetMol()
        try:
            Chem.SanitizeMol(m)
            ps = AllChem.ETKDGv2()
            ps.randomSeed = seed
            if AllChem.EmbedMolecule(m, ps) == 0:
                conf = m.GetConformer()
                return np.asarray([[conf.GetAtomPosition(i).x, conf.GetAtomPosition(i).y, conf.GetAtomPosition(i).z] for i in range(m.GetNumAtoms())])
        except Exception:
            pass
    pos = mol.pos.copy()
    if randomize_torsions:
        tor_src, tor_dst, mask_rotate = get_transformation_mask(mol.num_atoms, mol.bonds)
        if len(tor_src):
            rng = np.random.RandomState(seed)
            pos = _apply_torsions_np(pos, tor_src, tor_dst, mask_rotate, rng.uniform(-np.pi, np.pi, len(tor_src)))
    return pos


def get_dihedral_tuples(n_atoms: int, bonds) -> np.ndarray:
    """(c, a, b, d) tuples for each rotatable bond (reference
    utils/torsion.py:121-138): a neighbor of each endpoint that is not the
    other endpoint."""
    tor_src, tor_dst, _ = get_transformation_mask(n_atoms, bonds)
    adj = {i: [] for i in range(n_atoms)}
    for i, j, _ in bonds:
        adj[i].append(j)
        adj[j].append(i)
    out = []
    for a, b in zip(tor_src, tor_dst):
        c = next(x for x in adj[a] if x != b)
        d = next(x for x in adj[b] if x != a)
        out.append((c, a, b, d))
    return np.asarray(out, dtype=np.int32).reshape(-1, 4)
