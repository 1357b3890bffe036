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
import jax.numpy as jnp
import numpy as np

from ..config import SamplerConfig, ScoreModelConfig, TrainConfig
from ..data.complex_graph import batch_complexes, replicate_complex
from ..sampler import sampling
from ..train.diffusion import apply_noise


def filtering_cache_name(cache_id: str, samples_per_complex: int, inference_steps: int, trajectory: bool) -> str:
    """Parameter-keyed idempotent cache file name (reference keys its cache
    dirs by the generation parameters, confidence/dataset.py:126-138) —
    changing any generation parameter can never silently reuse a stale
    cache."""
    return (
        f"confidence_cache_id{cache_id}_s{samples_per_complex}_T{inference_steps}"
        + ("_traj" if trajectory else "")
        + ".pkl"
    )


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
    trajectory: bool = False,
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """-> {name: (positions, rmsds [s])}, cached to pickle.

    positions is [s, L, 3] (final poses), or with trajectory=True the full
    reverse-diffusion path [steps+1, s, L, 3] ordered start..final
    (reference stores trajectories.pkl next to ligand_positions.pkl,
    confidence/dataset.py:458-463). rmsds are ALWAYS of the final pose —
    intermediate frames inherit the final label ("will this trajectory
    succeed"), matching the reference's trajectory training."""
    if cache_path:
        fname = os.path.join(cache_path, filtering_cache_name(cache_id, samples_per_complex, inference_steps, trajectory))
        if os.path.exists(fname):
            with open(fname, "rb") as f:
                return pickle.load(f)

    sampler_cfg = SamplerConfig(inference_steps=inference_steps)
    out = {}
    for target in targets:
        key, k1, k2 = jax.random.split(key, 3)
        batch = replicate_complex(target.padded, samples_per_complex)
        batch = sampling.randomize_position(batch, k1, model_cfg.sigma.tr_sigma_max)
        final, traj = sampling.sample_jit(model, variables, batch, k2, model_cfg, sampler_cfg, trajectory)
        L = len(target.hc.lig_f)
        poses = np.asarray(final.lig_pos)[:, :L]
        rmsds = np.sqrt(((poses - target.hc.orig_lig_pos[None]) ** 2).sum(-1).mean(-1))
        if trajectory:
            frames = np.concatenate([np.asarray(batch.lig_pos)[None, :, :L], np.asarray(traj)[:, :, :L]], axis=0)
            out[target.name] = (frames, rmsds)
        else:
            out[target.name] = (poses, rmsds)

    if cache_path:
        os.makedirs(cache_path, exist_ok=True)
        with open(fname, "wb") as f:
            pickle.dump(out, f)
    return out


def binned_labels(rmsds: np.ndarray, cutoffs: Sequence[float]) -> np.ndarray:
    """One-hot RMSD bin labels [n, len(cutoffs)+1] (reference y_binned,
    confidence/dataset.py:346): bin k is cutoffs[k-1] <= r < cutoffs[k],
    first bin r < cutoffs[0], last bin r >= cutoffs[-1]."""
    edges = np.concatenate([[0.0], np.asarray(cutoffs, dtype=np.float64), [np.inf]])
    r = np.asarray(rmsds, dtype=np.float64)[..., None]
    return np.logical_and(r < edges[1:], r >= edges[:-1]).astype(np.float32)


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
    """Pose-classification dataset over a generation cache.

    rmsd_classification_cutoff may be a LIST of cutoffs — labels become
    one-hot RMSD bins and the pose loss a cross-entropy (reference
    list-cutoff mode, confidence_train.py:242-245). atom_label_cutoff
    enables per-atom labels: per-atom distance of the sampled pose to the
    crystal pose thresholded (float -> binary, list -> bins; reference
    dataset.py:365-374). trajectory_sampling draws a random reverse-
    diffusion frame per item and stamps its diffusion time on the batch
    (reference :307-310); the label stays the FINAL pose's — the model
    learns "will this trajectory succeed" at time t."""

    def __init__(
        self,
        targets: Sequence,
        cache: Dict[str, Tuple[np.ndarray, np.ndarray]],
        rmsd_classification_cutoff=2.0,
        rmsd_classification_upper: Optional[float] = 4.0,
        balance: bool = True,
        rmsd_prediction: bool = False,
        seed: int = 0,
        atom_label_cutoff=None,
        trajectory_sampling: bool = False,
        affinities: Optional[Dict[str, float]] = None,
        parallel: int = 1,
    ):
        self.targets = {t.name: t for t in targets}
        self.rng = np.random.RandomState(seed)
        self.binned = isinstance(rmsd_classification_cutoff, (list, tuple))
        if self.binned and balance:
            raise ValueError("a cutoff list cannot be combined with balance (reference confidence_train.py:313)")
        self.cutoffs = list(rmsd_classification_cutoff) if self.binned else None
        self.cutoff = self.cutoffs[0] if self.binned else float(rmsd_classification_cutoff)
        self.upper = rmsd_classification_upper
        self.balance = balance
        self.rmsd_prediction = rmsd_prediction
        self.atom_label_cutoff = atom_label_cutoff
        self.atom_binned = isinstance(atom_label_cutoff, (list, tuple))
        self.trajectory_sampling = trajectory_sampling
        # per-complex binding-affinity labels (reference graph.affinity,
        # confidence_train.py:228; the label source dataset is not shipped
        # upstream — callers supply {name: affinity})
        self.affinities = affinities
        # parallel > 1: each group of `parallel` consecutive batch elements
        # is `parallel` distinct poses of ONE complex, drawn without
        # replacement (reference confidence/dataset.py:290-302 packs them
        # into one graph; our batch axis is the pose axis)
        self.parallel = int(parallel)

        self.entries: List[Tuple[str, int, float]] = []  # (name, pose idx, final rmsd)
        for name, (pos, rmsds) in cache.items():
            if name not in self.targets:
                continue
            for i, r in enumerate(rmsds):
                if self.upper is not None and self.cutoff < r < self.upper and not (rmsd_prediction or self.binned):
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

    def _pose_and_time(self, cache_positions: np.ndarray, i: int):
        """-> (pose [L, 3], diffusion time t). Trajectory caches are
        [frames, s, L, 3] ordered start..final; frame index f maps to
        t = 1 - f/(frames-1) (t=1 is the noised start, t=0 the final)."""
        if self.trajectory_sampling:
            if cache_positions.ndim != 4:
                raise ValueError("trajectory_sampling requires a trajectory cache (generate with trajectory=True)")
            frames = cache_positions.shape[0]
            f = self.rng.randint(frames)
            return cache_positions[f, i], 1.0 - f / max(frames - 1, 1)
        return cache_positions[i], 0.0

    def sample_batch(self, cache, batch_size: int):
        """-> (ComplexBatch at sampled poses with per-item times, labels).

        labels is a dict of numpy arrays: always "y" ([b] float, or one-hot
        [b, nbins] in binned mode) and "rmsd" [b]; plus "atom_y" ([b, L_pad]
        binary or [b, L_pad, nbins] one-hot) when atom_label_cutoff is set;
        plus "affinity" [b] and its below-cutoff validity mask
        "affinity_valid" [b] when affinities were supplied (reference
        confidence_train.py:228-237: only sub-cutoff poses carry an
        affinity-loss signal in the combined-head mode).
        """
        picks: List[Tuple[str, int, float]] = []
        if self.parallel > 1:
            if batch_size % self.parallel:
                raise ValueError(f"batch_size {batch_size} not divisible by parallel {self.parallel}")
            for _ in range(batch_size // self.parallel):
                name, _, _ = self.sample_entry()
                rs = cache[name][1]
                if self.parallel > len(rs):
                    raise ValueError("parallel size larger than sample size")  # reference :296
                idxs = (np.arange(self.parallel) if self.parallel == len(rs)
                        else self.rng.choice(len(rs), size=self.parallel, replace=False))
                picks.extend((name, int(i), float(rs[i])) for i in idxs)
        else:
            picks = [self.sample_entry() for _ in range(batch_size)]

        items, ys, rmsds, atom_ys, times, affs = [], [], [], [], [], []
        for name, i, r in picks:
            target = self.targets[name]
            pos, _ = cache[name]
            item = dict(target.padded)
            pose, t = self._pose_and_time(pos, i)
            L = pose.shape[0]
            lig_pos = item["lig_pos"].copy()
            lig_pos[:L] = pose
            item["lig_pos"] = lig_pos
            items.append(item)
            times.append(t)
            rmsds.append(r)
            if self.rmsd_prediction:
                ys.append(r)
            elif self.binned:
                ys.append(binned_labels(np.asarray([r]), self.cutoffs)[0])
            else:
                ys.append(float(r < self.cutoff))
            if self.atom_label_cutoff is not None:
                # per-atom distance to the crystal pose (reference old_pos,
                # confidence/dataset.py:365-374), padded atoms get label 0
                d = np.zeros(item["lig_pos"].shape[0], dtype=np.float32)
                d[:L] = np.linalg.norm(pose - target.hc.orig_lig_pos, axis=-1)
                if self.atom_binned:
                    atom_ys.append(binned_labels(d, list(self.atom_label_cutoff)))
                else:
                    atom_ys.append((d < float(self.atom_label_cutoff)).astype(np.float32))
            if self.affinities is not None:
                affs.append(float(self.affinities.get(name, 0.0)))
        batch = batch_complexes(items)
        tvec = jnp.asarray(times, dtype=jnp.float32)
        batch = batch.replace(t_tr=tvec, t_rot=tvec, t_tor=tvec)
        labels = dict(y=np.asarray(ys, dtype=np.float32), rmsd=np.asarray(rmsds, dtype=np.float32))
        if self.atom_label_cutoff is not None:
            labels["atom_y"] = np.stack(atom_ys)
        if self.affinities is not None:
            labels["affinity"] = np.asarray(affs, dtype=np.float32)
            labels["affinity_valid"] = (labels["rmsd"] < self.cutoff).astype(np.float32)
        return batch, labels

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
