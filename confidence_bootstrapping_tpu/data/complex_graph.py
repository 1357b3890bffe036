"""Padded, fixed-shape ligand/receptor complex batches.

This replaces the reference's PyG ``HeteroData``/``Batch``/``DataListLoader``
container stack (``datasets/dataloader.py``, ``torch_geometric``) with a
flat pytree of padded arrays:

  * every complex is padded to a size ``Bucket`` (ligand atoms, bond edges,
    torsion slots, receptor residues) so XLA compiles once per bucket;
  * batching is a leading axis (stack), not graph concatenation;
  * neighbor relations are fixed-capacity padded lists / dense masks, not
    dynamic edge index tensors (see BASELINE.json north star).

Receptor kNN edges are stored as [N, KR] neighbor lists (host-precomputed,
the protein is rigid); ligand radius and cross edges are recomputed on device
each forward (see ``ops/graph_builders.py``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


class Bucket(NamedTuple):
    """Static pad sizes; one XLA compilation per distinct bucket."""

    L: int  # ligand atoms
    E: int  # directed ligand bond edges
    R: int  # rotatable bonds (torsion slots)
    N: int  # receptor residues
    KR: int = 24  # receptor kNN neighbors (c_alpha_max_neighbors)
    KC: int = 48  # cross-edge capacity per ligand atom (receptor neighbors)
    A: int = 0  # receptor all-atoms (0 = coarse-grained graph only)
    KA: int = 8  # atom kNN neighbors (atom_max_neighbors)
    KCA: int = 24  # ligand-to-atom cross capacity per ligand atom


# standard ligand-size ladder; receptors bucketed by residue count
LIG_SIZES = (16, 24, 32, 48, 64, 96, 128)
REC_SIZES = (64, 128, 256, 384, 512, 768, 1024, 1536, 2048, 3072)


def _round_up(x: int, sizes: Sequence[int]) -> int:
    for s in sizes:
        if x <= s:
            return s
    raise ValueError(f"size {x} exceeds largest bucket {sizes[-1]}")


def pick_bucket(n_lig: int, n_bond_edges: int, n_tor: int, n_rec: int, n_atoms: int = 0, all_atoms: bool = False) -> Bucket:
    L = _round_up(max(n_lig, 1), LIG_SIZES)
    E = 2 * L  # bonds <= atoms + rings; 2L directed slots is generous
    R = max(8, int(np.ceil(n_tor / 8)) * 8) if n_tor > 0 else 8
    N = _round_up(max(n_rec, 1), REC_SIZES)
    KC = min(N, 48)
    A = 0
    if all_atoms:
        A = _round_up(max(n_atoms, 1), tuple(8 * s for s in REC_SIZES))
    return Bucket(L=L, E=E, R=R, N=N, KC=KC, A=A)


@struct.dataclass
class ComplexBatch:
    """A batch of B padded complexes (poses). All arrays have leading dim B.

    Mirrors the information content of the reference HeteroData graphs
    (datasets/process_mols.py featurization) in fixed shapes.
    """

    # ligand
    lig_f: jnp.ndarray  # int32 [B, L, 16] categorical features
    lig_pos: jnp.ndarray  # f32 [B, L, 3]
    lig_mask: jnp.ndarray  # bool [B, L]
    lig_edge_src: jnp.ndarray  # int32 [B, E] directed bond edges (receiver)
    lig_edge_dst: jnp.ndarray  # int32 [B, E] (sender)
    lig_edge_attr: jnp.ndarray  # f32 [B, E, 4] bond-type one-hot
    lig_edge_mask: jnp.ndarray  # bool [B, E]

    # torsions (rotatable bonds; directed so dst side rotates)
    tor_src: jnp.ndarray  # int32 [B, R]
    tor_dst: jnp.ndarray  # int32 [B, R]
    tor_mask: jnp.ndarray  # bool [B, R]
    mask_rotate: jnp.ndarray  # bool [B, R, L]

    # receptor (coarse-grained: one node per residue at C-alpha)
    rec_f: jnp.ndarray  # int32 [B, N] amino-acid index
    rec_lm: jnp.ndarray  # f32 [B, N, lm_dim] ESM embeddings (or [B, N, 0])
    rec_pos: jnp.ndarray  # f32 [B, N, 3]
    rec_mask: jnp.ndarray  # bool [B, N]
    rec_nbr: jnp.ndarray  # int32 [B, N, KR] kNN neighbor indices
    rec_nbr_mask: jnp.ndarray  # bool [B, N, KR]

    # diffusion times (per complex)
    t_tr: jnp.ndarray  # f32 [B]
    t_rot: jnp.ndarray  # f32 [B]
    t_tor: jnp.ndarray  # f32 [B]

    # bookkeeping
    orig_center: jnp.ndarray  # f32 [B, 3] original complex center (host frame)

    # dihedral tuples (c, a, b, d) per torsion slot, for SVGD / analysis
    tor_dihedral: Optional[jnp.ndarray] = None  # int32 [B, R, 4]

    # side-chain regression targets: chi1-4 (normalized, NaN if undefined)
    # + flattened CA->N / CA->C unit vectors (reference side_chain_vecs)
    rec_sidechain: Optional[jnp.ndarray] = None  # f32 [B, N, 10]

    # receptor all-atom fields (confidence model); zero-size when unused
    atom_f: Optional[jnp.ndarray] = None  # int32 [B, A, 4]
    atom_pos: Optional[jnp.ndarray] = None  # f32 [B, A, 3]
    atom_mask: Optional[jnp.ndarray] = None  # bool [B, A]
    atom_nbr: Optional[jnp.ndarray] = None  # int32 [B, A, KA]
    atom_nbr_mask: Optional[jnp.ndarray] = None  # bool [B, A, KA]
    atom_res: Optional[jnp.ndarray] = None  # int32 [B, A] residue index of atom

    @property
    def batch_size(self):
        return self.lig_pos.shape[0]

    def set_time(self, t_tr, t_rot, t_tor):
        """Stamp per-complex diffusion times (reference set_time equivalent)."""
        B = self.batch_size
        f = lambda t: jnp.broadcast_to(jnp.asarray(t, dtype=jnp.float32), (B,))
        return self.replace(t_tr=f(t_tr), t_rot=f(t_rot), t_tor=f(t_tor))


class HostComplex(NamedTuple):
    """Host-side (numpy) single complex, unpadded. Produced by featurization."""

    name: str
    lig_f: np.ndarray  # [l, 16]
    lig_pos: np.ndarray  # [l, 3]
    lig_edge_src: np.ndarray  # [e]
    lig_edge_dst: np.ndarray  # [e]
    lig_edge_attr: np.ndarray  # [e, 4]
    tor_src: np.ndarray  # [r]
    tor_dst: np.ndarray  # [r]
    mask_rotate: np.ndarray  # [r, l]
    rec_f: np.ndarray  # [n]
    rec_lm: np.ndarray  # [n, lm_dim]
    rec_pos: np.ndarray  # [n, 3]
    rec_nbr: np.ndarray  # [n, KR]
    rec_nbr_mask: np.ndarray  # [n, KR]
    orig_center: np.ndarray  # [3]
    orig_lig_pos: np.ndarray  # [l, 3] ground-truth pose(s), centered frame
    rec_sidechain: Optional[np.ndarray] = None  # [n, 10] chi + backbone vecs
    atom_f: Optional[np.ndarray] = None  # [a, 4]
    atom_pos: Optional[np.ndarray] = None  # [a, 3]
    atom_nbr: Optional[np.ndarray] = None
    atom_nbr_mask: Optional[np.ndarray] = None
    atom_res: Optional[np.ndarray] = None
    # conformer-matching RMSD to the crystal pose (reference rmsd_matching,
    # process_mols.py:648); 0.0 when the input geometry was used directly.
    # Appended last so pre-existing pickled caches still unpickle.
    matching_rmsd: float = 0.0
    # alternative valid binding poses [P, l, 3] in the centered frame
    # (reference multi-pose orig_pos list, datasets/moad.py:506-518);
    # evaluation RMSD is the min over {orig_lig_pos} + these
    alt_orig_lig_pos: Optional[np.ndarray] = None


def pad_complex(hc: HostComplex, bucket: Bucket, lm_dim: int = 1280) -> dict:
    """Pad a HostComplex to bucket sizes -> dict of numpy arrays (no batch)."""
    l, e, r, n = len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f)
    if l > bucket.L or e > bucket.E or r > bucket.R or n > bucket.N:
        raise ValueError(f"complex {hc.name} ({l},{e},{r},{n}) exceeds bucket {bucket}")
    L, E, R, N, KR = bucket.L, bucket.E, bucket.R, bucket.N, bucket.KR

    def pad(a, shape, dtype=None):
        out = np.zeros(shape, dtype=dtype or a.dtype)
        sl = tuple(slice(0, s) for s in a.shape)
        out[sl] = a
        return out

    rec_lm = hc.rec_lm
    if rec_lm.shape[-1] != lm_dim:
        rec_lm = np.zeros((n, lm_dim), dtype=np.float32)

    kr = min(hc.rec_nbr.shape[1], KR) if hc.rec_nbr.size else 0
    out = dict(
        lig_f=pad(hc.lig_f.astype(np.int32), (L, hc.lig_f.shape[1])),
        lig_pos=pad(hc.lig_pos.astype(np.float32), (L, 3)),
        lig_mask=pad(np.ones(l, dtype=bool), (L,)),
        lig_edge_src=pad(hc.lig_edge_src.astype(np.int32), (E,)),
        lig_edge_dst=pad(hc.lig_edge_dst.astype(np.int32), (E,)),
        lig_edge_attr=pad(hc.lig_edge_attr.astype(np.float32), (E, 4)),
        lig_edge_mask=pad(np.ones(e, dtype=bool), (E,)),
        tor_src=pad(hc.tor_src.astype(np.int32), (R,)),
        tor_dst=pad(hc.tor_dst.astype(np.int32), (R,)),
        tor_mask=pad(np.ones(r, dtype=bool), (R,)),
        mask_rotate=pad(hc.mask_rotate.astype(bool), (R, L)),
        rec_f=pad(hc.rec_f.astype(np.int32), (N,)),
        rec_lm=pad(rec_lm.astype(np.float32), (N, lm_dim)),
        rec_pos=pad(hc.rec_pos.astype(np.float32), (N, 3)),
        rec_mask=pad(np.ones(n, dtype=bool), (N,)),
        rec_nbr=pad(hc.rec_nbr[:, :kr].astype(np.int32), (N, KR)),
        rec_nbr_mask=pad(hc.rec_nbr_mask[:, :kr].astype(bool), (N, KR)),
        t_tr=np.zeros(()),
        t_rot=np.zeros(()),
        t_tor=np.zeros(()),
        orig_center=hc.orig_center.astype(np.float32),
    )
    if hc.rec_sidechain is not None:
        out["rec_sidechain"] = pad(hc.rec_sidechain.astype(np.float32), (N, 10))
    # dihedral tuples (c, a, b, d) for each rotatable edge, from bond adjacency
    dih = np.zeros((R, 4), dtype=np.int32)
    if r > 0:
        adj: dict = {}
        for s_, d_ in zip(hc.lig_edge_src, hc.lig_edge_dst):
            adj.setdefault(int(s_), []).append(int(d_))
        for k in range(r):
            a, b = int(hc.tor_src[k]), int(hc.tor_dst[k])
            c = next((x for x in adj.get(a, []) if x != b), a)
            d = next((x for x in adj.get(b, []) if x != a), b)
            dih[k] = [c, a, b, d]
    out["tor_dihedral"] = dih
    if bucket.A and hc.atom_f is not None:
        a = len(hc.atom_f)
        A, KA = bucket.A, bucket.KA
        ka = min(hc.atom_nbr.shape[1], KA) if hc.atom_nbr is not None and hc.atom_nbr.size else 0
        out.update(
            atom_f=pad(hc.atom_f.astype(np.int32), (A, hc.atom_f.shape[1])),
            atom_pos=pad(hc.atom_pos.astype(np.float32), (A, 3)),
            atom_mask=pad(np.ones(a, dtype=bool), (A,)),
            atom_nbr=pad(hc.atom_nbr[:, :ka].astype(np.int32), (A, KA)) if ka else np.zeros((A, KA), np.int32),
            atom_nbr_mask=pad(hc.atom_nbr_mask[:, :ka].astype(bool), (A, KA)) if ka else np.zeros((A, KA), bool),
            atom_res=pad(hc.atom_res.astype(np.int32), (A,)),
        )
    return out


def batch_complexes(padded: Sequence[dict]) -> ComplexBatch:
    """Stack padded complex dicts (same bucket) into a device ComplexBatch."""
    keys = padded[0].keys()
    stacked = {k: jnp.asarray(np.stack([p[k] for p in padded])) for k in keys}
    # times are [B] scalars
    for k in ("t_tr", "t_rot", "t_tor"):
        stacked[k] = stacked[k].reshape(-1).astype(jnp.float32)
    return ComplexBatch(**stacked)


def replicate_complex(p: dict, n: int) -> ComplexBatch:
    """Batch n copies of one padded complex (n poses of the same complex)."""
    return batch_complexes([p] * n)
