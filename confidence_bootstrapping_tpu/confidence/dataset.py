"""Confidence-model datasets: score-model rollouts with RMSD labels.

Re-implements the reference's ``confidence/dataset.py``:

  * ``generate_filtering_cache`` = FilteringDataset.preprocessing
    (reference :380-512): roll out the frozen score model for
    ``samples_per_complex`` poses per training complex, record (positions,
    rmsds) keyed by complex, pickle-cache them (idempotent, combinable
    caches via ids like the reference's cache_ids_to_combine);
  * ``FilteringDataset``: serves (complex graph @ sampled pose, label
    y = rmsd < cutoff) with balanced sampling and the
    ``rmsd_classification_upper`` band exclusion (2-4 A poses dropped);
  * ``PerturbationFilteringDataset`` = FilteringMOAD (reference :515-564):
    labels from forward-diffusion perturbations instead of rollouts.

RMSD here is the plain heavy-atom RMSD (the reference's preprocessing does
not symmetry-correct, confidence/dataset.py:476-481).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import SamplerConfig, ScoreModelConfig, TrainConfig
from ..data.complex_graph import batch_complexes, replicate_complex
from ..sampler import sampling
from ..train.diffusion import apply_noise


def generate_filtering_cache(
    model,
    variables,
    targets: Sequence,  # CBTarget-like: .padded, .hc, .name
    key,
    model_cfg: ScoreModelConfig,
    samples_per_complex: int = 4,
    inference_steps: int = 20,
    cache_path: Optional[str] = None,
    cache_id: str = "1",
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """-> {name: (positions [s, L, 3], rmsds [s])}, cached to pickle."""
    if cache_path:
        fname = os.path.join(cache_path, f"confidence_cache_id{cache_id}.pkl")
        if os.path.exists(fname):
            with open(fname, "rb") as f:
                return pickle.load(f)

    sampler_cfg = SamplerConfig(inference_steps=inference_steps)
    out = {}
    for target in targets:
        key, k1, k2 = jax.random.split(key, 3)
        batch = replicate_complex(target.padded, samples_per_complex)
        batch = sampling.randomize_position(batch, k1, model_cfg.sigma.tr_sigma_max)
        final, _ = sampling.sample_jit(model, variables, batch, k2, model_cfg, sampler_cfg)
        L = len(target.hc.lig_f)
        poses = np.asarray(final.lig_pos)[:, :L]
        rmsds = np.sqrt(((poses - target.hc.orig_lig_pos[None]) ** 2).sum(-1).mean(-1))
        out[target.name] = (poses, rmsds)

    if cache_path:
        os.makedirs(cache_path, exist_ok=True)
        with open(fname, "wb") as f:
            pickle.dump(out, f)
    return out


def combine_caches(caches: Sequence[Dict]) -> Dict:
    """Merge generation caches (reference cache_ids_to_combine, :213-245)."""
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for c in caches:
        for name, (pos, rmsds) in c.items():
            if name in out:
                out[name] = (np.concatenate([out[name][0], pos]), np.concatenate([out[name][1], rmsds]))
            else:
                out[name] = (pos, rmsds)
    return out


class FilteringDataset:
    """Pose-classification dataset over a generation cache."""

    def __init__(
        self,
        targets: Sequence,
        cache: Dict[str, Tuple[np.ndarray, np.ndarray]],
        rmsd_classification_cutoff: float = 2.0,
        rmsd_classification_upper: Optional[float] = 4.0,
        balance: bool = True,
        rmsd_prediction: bool = False,
        seed: int = 0,
    ):
        self.targets = {t.name: t for t in targets}
        self.rng = np.random.RandomState(seed)
        self.cutoff = rmsd_classification_cutoff
        self.upper = rmsd_classification_upper
        self.balance = balance
        self.rmsd_prediction = rmsd_prediction

        self.entries: List[Tuple[str, int, float]] = []  # (name, pose idx, rmsd)
        for name, (pos, rmsds) in cache.items():
            if name not in self.targets:
                continue
            for i, r in enumerate(rmsds):
                if self.upper is not None and self.cutoff < r < self.upper and not rmsd_prediction:
                    continue  # ambiguous band excluded from training
                self.entries.append((name, i, float(r)))
        self.positives = [e for e in self.entries if e[2] < self.cutoff]
        self.negatives = [e for e in self.entries if e[2] >= self.cutoff]

    def __len__(self):
        return len(self.entries)

    def sample_entry(self):
        if self.balance and self.positives and self.negatives:
            pool = self.positives if self.rng.rand() < 0.5 else self.negatives
        else:
            pool = self.entries
        return pool[self.rng.randint(len(pool))]

    def sample_batch(self, cache, batch_size: int):
        """-> (ComplexBatch at sampled poses with t=0, labels [b])."""
        items, labels = [], []
        for _ in range(batch_size):
            name, i, r = self.sample_entry()
            target = self.targets[name]
            pos, _ = cache[name]
            item = dict(target.padded)
            L = pos.shape[1]
            lig_pos = item["lig_pos"].copy()
            lig_pos[:L] = pos[i]
            item["lig_pos"] = lig_pos
            items.append(item)
            labels.append(r if self.rmsd_prediction else float(r < self.cutoff))
        batch = batch_complexes(items).set_time(0.0, 0.0, 0.0)
        return batch, np.asarray(labels, dtype=np.float32)

    def statistics(self):
        rmsds = np.asarray([e[2] for e in self.entries])
        return dict(
            n=len(self.entries),
            positives=len(self.positives),
            negatives=len(self.negatives),
            mean_rmsd=float(rmsds.mean()) if len(rmsds) else 0.0,
        )


class PerturbationFilteringDataset:
    """FilteringMOAD equivalent: labels from forward-diffusion perturbations
    at random times (reference confidence/dataset.py:515-564)."""

    def __init__(self, targets: Sequence, model_cfg: ScoreModelConfig, rmsd_cutoff: float = 2.0, alpha=1.0, beta=1.0):
        self.targets = list(targets)
        self.model_cfg = model_cfg
        self.rmsd_cutoff = rmsd_cutoff
        self.tcfg = TrainConfig(sampling_alpha=alpha, sampling_beta=beta)

    def sample_batch(self, key, batch_size: int, rng: np.random.RandomState):
        idx = rng.randint(len(self.targets), size=batch_size)
        items = [dict(self.targets[i].padded) for i in idx]
        batch = batch_complexes(items)
        noised, _ = apply_noise(batch, key, self.model_cfg.sigma, self.tcfg)
        # label: rmsd of the perturbed pose vs the original
        d = np.asarray(noised.lig_pos) - np.asarray(batch.lig_pos)
        mask = np.asarray(batch.lig_mask)
        rmsds = np.sqrt((d**2).sum(-1).sum(-1) / np.maximum(mask.sum(-1), 1))
        labels = (rmsds < self.rmsd_cutoff).astype(np.float32)
        return noised.set_time(0.0, 0.0, 0.0), labels
