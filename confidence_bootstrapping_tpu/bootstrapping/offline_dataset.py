"""Offline bootstrapping dataset (reference ``bootstrapping/bootstrapping.py``).

The cache-or-generate pipeline used by ``train --add_bootstrapping_dataset``:
roll out a frozen score model on protein structures (PDB side-chain pseudo-
complexes or arbitrary targets), confidence-filter the poses, pickle them as
``complexes_id{N}.pkl``, then serve confidence-temperature-weighted samples
as extra training complexes.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import SamplerConfig, ScoreModelConfig
from ..data.complex_graph import replicate_complex
from ..sampler import sampling


def generate_bootstrapping_complexes(
    model,
    variables,
    targets: Sequence,  # CBTarget-like
    key,
    model_cfg: ScoreModelConfig,
    samples_per_target: int = 4,
    inference_steps: int = 20,
    confidence_fn: Optional[Callable] = None,
    confidence_cutoff: float = 0.0,
    cache_path: Optional[str] = None,
    cache_id: str = "1",
) -> List[Tuple[dict, str, float]]:
    """Rollout + filter -> [(padded complex @ pose, name, confidence)]."""
    if cache_path:
        fname = os.path.join(cache_path, f"complexes_id{cache_id}.pkl")
        if os.path.exists(fname):
            with open(fname, "rb") as f:
                return pickle.load(f)

    sampler_cfg = SamplerConfig(inference_steps=inference_steps)
    kept = []
    for target in targets:
        key, k1, k2 = jax.random.split(key, 3)
        batch = replicate_complex(target.padded, samples_per_target)
        batch = sampling.randomize_position(batch, k1, model_cfg.sigma.tr_sigma_max)
        final, _ = sampling.sample_jit(model, variables, batch, k2, model_cfg, sampler_cfg)
        L = len(target.hc.lig_f)
        poses = np.asarray(final.lig_pos)[:, :L]
        if confidence_fn is not None:
            conf = np.asarray(confidence_fn(target, poses))
        else:
            conf = np.zeros(len(poses))
        for i in range(len(poses)):
            if conf[i] > confidence_cutoff:
                item = dict(target.padded)
                lig_pos = item["lig_pos"].copy()
                lig_pos[:L] = poses[i]
                item["lig_pos"] = lig_pos
                kept.append((item, target.name, float(conf[i])))

    if cache_path:
        os.makedirs(cache_path, exist_ok=True)
        with open(fname, "wb") as f:
            pickle.dump(kept, f)
    return kept


class BootstrappingDataset:
    """Serves confidence-temperature-weighted samples from a generated cache
    (reference bootstrapping.py:74-97). Mixable into training via
    CombinedDataset."""

    def __init__(self, complexes: Sequence[Tuple[dict, str, float]], temperature: float = 1.0, multiplicity: int = 1, seed: int = 0):
        self.items = list(complexes)
        self.temperature = temperature
        self.multiplicity = multiplicity
        self.rng = np.random.RandomState(seed)
        conf = np.asarray([c for _, _, c in self.items], dtype=np.float64)
        w = np.exp(conf * temperature)
        self.weights = w / w.sum() if len(w) else w

    def __len__(self):
        return len(self.items) * self.multiplicity

    def get(self, idx: int) -> dict:
        i = self.rng.choice(len(self.items), p=self.weights)
        return dict(self.items[i][0])
