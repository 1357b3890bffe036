"""Torsional-diffusion (QM9) pretraining mode (reference ``datasets/torsional.py``).

``--dataset torsional`` trains only the torsion head on small-molecule
conformers: the TorsionalNoiseTransform perturbs torsion angles only
(reference :27-70) and the loss is the torsion component alone
(``torsional_loss_function``, utils/training.py:129-149). Conformers are
loaded from a directory of SDF files (QM9-style) — the reference reads
torsional-diffusion's pickled RDKit mols; SDFs carry the same information.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..ops import torus
from ..ops.schedules import SigmaParams, t_to_sigma
from ..ops.torsion import apply_torsion_updates
from ..train.diffusion import ScoreTargets, sample_train_times
from . import vocab
from .complex_graph import HostComplex, batch_complexes, pad_complex, pick_bucket
from .featurize import featurize_ligand, get_transformation_mask
from .mol_io import parse_sdf


def torsional_apply_noise(batch, key, sigma: SigmaParams, cfg: TrainConfig, tables=None):
    """Perturb only torsion angles; targets from the torus score tables.

    ``tables``: optional train.diffusion.DiffusionTables threaded through the
    enclosing jit (keeps the 100 MB torus score grid out of the HLO)."""
    B = batch.batch_size
    R = batch.tor_src.shape[1]
    k_t, k_tor = jax.random.split(key)
    t = sample_train_times(k_t, B, cfg)
    batch = batch.set_time(t, t, t)
    tor_sigma = t_to_sigma(t, t, t, sigma)[2]
    updates = jax.random.normal(k_tor, (B, R)) * tor_sigma[:, None]
    updates = jnp.where(batch.tor_mask, updates, 0.0)
    new_pos = apply_torsion_updates(
        batch.lig_pos, batch.tor_src, batch.tor_dst, batch.mask_rotate, updates, batch.tor_mask
    )
    tor_table = tables.torus_score if tables is not None else None
    tor_score = jnp.where(batch.tor_mask, torus.score(updates, tor_sigma[:, None], table=tor_table), 0.0)
    zeros = jnp.zeros((B, 3))
    return batch.replace(lig_pos=new_pos), ScoreTargets(zeros, zeros, tor_score, tor_sigma)


def torsional_loss(tor_pred, targets: ScoreTargets, batch):
    """Torsion-only score-matching loss (reference training.py:129-149)."""
    norm2 = torus.score_norm(targets.tor_sigma)[:, None]
    m = batch.tor_mask.astype(tor_pred.dtype)
    per_edge = (tor_pred - targets.tor_score) ** 2 / norm2 * m
    base = targets.tor_score**2 / norm2 * m
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(per_edge) / cnt, jnp.sum(base) / cnt


class TorsionalDataset:
    """Small molecules (no receptor) as padded complexes with a dummy
    single-residue receptor so the shared container/model code applies."""

    def __init__(self, data_dir: str, limit: int = 0, split_idx: Optional[np.ndarray] = None):
        self.complexes: List[HostComplex] = []
        files = sorted(f for f in os.listdir(data_dir) if f.endswith((".sdf", ".mol")))
        if split_idx is not None:
            files = [files[i] for i in split_idx if i < len(files)]
        if limit:
            files = files[:limit]
        for f in files:
            try:
                mol = parse_sdf(os.path.join(data_dir, f))
                feats, heavy, src, dst, attr = featurize_ligand(mol)
                tor_src, tor_dst, mask_rotate = get_transformation_mask(heavy.num_atoms, heavy.bonds)
                if len(tor_src) == 0 or heavy.num_atoms < 4:
                    continue
                center = heavy.pos.mean(0)
                self.complexes.append(
                    HostComplex(
                        name=f[:-4],
                        lig_f=feats,
                        lig_pos=(heavy.pos - center).astype(np.float32),
                        lig_edge_src=src,
                        lig_edge_dst=dst,
                        lig_edge_attr=attr,
                        tor_src=tor_src,
                        tor_dst=tor_dst,
                        mask_rotate=mask_rotate,
                        rec_f=np.zeros(1, dtype=np.int32),
                        rec_lm=np.zeros((1, 0), dtype=np.float32),
                        rec_pos=np.zeros((1, 3), dtype=np.float32),
                        rec_nbr=np.zeros((1, 1), dtype=np.int32),
                        rec_nbr_mask=np.zeros((1, 1), dtype=bool),
                        orig_center=center.astype(np.float32),
                        orig_lig_pos=(heavy.pos - center).astype(np.float32),
                    )
                )
            except Exception as e:
                print(f"torsional: skipping {f}: {type(e).__name__}: {e}")

    def __len__(self):
        return len(self.complexes)

    def epoch_batches(self, batch_size: int, rng: np.random.RandomState, lm_dim: int = 0):
        groups = {}
        for hc in self.complexes:
            b = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), 1)
            groups.setdefault(tuple(b), []).append(pad_complex(hc, b._replace(N=1, KR=1), lm_dim=lm_dim))
        batches = []
        for items in groups.values():
            idx = rng.permutation(len(items))
            for s in range(0, len(items), batch_size):
                sel = [items[i] for i in idx[s : s + batch_size]]
                while len(sel) < batch_size:
                    sel.append(sel[len(sel) % max(1, len(idx[s : s + batch_size]))])
                batches.append(batch_complexes(sel))
        rng.shuffle(batches)
        return batches
