"""Typed configuration dataclasses (replaces the reference's four argparse
sites + model_parameters.yml overlay, SURVEY.md Lcfg layer).

One schema is shared by train / inference / finetune; every trained model
directory persists its ``model_config.yml`` which consumers reload
(reference pattern: ``utils/parsing.py``, ``train.py:158-167``,
``workdir/*/model_parameters.yml``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import yaml

from .ops.schedules import SigmaParams


@dataclass(frozen=True)
class ScoreModelConfig:
    """Architecture knobs of the tensor-product score/confidence model.

    Defaults reproduce the pretrained score model's manifest
    (reference ``workdir/pretrained_score/model_parameters.yml``).
    """

    ns: int = 32
    nv: int = 6
    sh_lmax: int = 1
    num_conv_layers: int = 5
    num_prot_emb_layers: int = 3
    embed_also_ligand: bool = True
    use_second_order_repr: bool = False
    reduce_pseudoscalars: bool = True
    batch_norm: bool = True
    dropout: float = 0.1
    in_lig_edge_features: int = 4
    sigma_embed_dim: int = 32
    distance_embed_dim: int = 32
    cross_distance_embed_dim: int = 32
    lig_max_radius: float = 5.0
    rec_max_radius: float = 15.0
    cross_max_distance: float = 80.0
    center_max_distance: float = 30.0
    dynamic_max_cross: bool = True
    # fixed-capacity cap on receptor neighbors per ligand atom in the cross
    # group (the reference's radius edges are unbounded,
    # models/score_model.py:564-587; ours are top-K within the radius for
    # static shapes). Overflow telemetry: sampler.cross_overflow_stats /
    # the infer CLI's cross_cap_dropped_edge_frac metric.
    cross_cap: int = 48
    # bucket-scaled capacity: the EFFECTIVE cap is
    #   min(N, max(cross_cap, round(N * cross_cap_frac)))
    # so cross_cap acts as a floor and big receptor buckets get
    # proportionally more cross-edge slots. Measured motivation
    # (docs/artifacts/crosscap_ab_tpu.json): at DockGen sizes a FIXED cap of
    # 48 truncates most in-radius cross edges and moves trained-model
    # translation scores at the final denoising step (rel L2 ~0.9-1.4, cos
    # down to 0.28 vs the reference's uncapped aggregation), while cap
    # ~N/5 tracks the uncapped forward closely. 0 disables scaling
    # (fixed-cap behavior of rounds 1-4).
    cross_cap_frac: float = 0.2
    # same cap for the ligand <- receptor-atom group of the all-atom model
    # (atom buckets are 8x the residue bucket; the confidence model also
    # crops to the pocket via crop_beyond, so its in-radius counts stay
    # bounded — the frac policy applies to the residue-graph cross group)
    atom_cross_cap: int = 32
    lm_embedding_dim: int = 1280  # 0 disables ESM features
    embedding_type: str = "sinusoidal"
    embedding_scale: int = 1000
    scale_by_sigma: bool = True
    no_torsion: bool = False
    smooth_edges: bool = False
    odd_parity: bool = False
    differentiate_convolutions: bool = True
    tp_weights_layers: int = 2
    fixed_center_conv: bool = True
    depthwise_convolution: bool = False
    sidechain_pred: bool = False

    # legacy (pre-protein-embedding) architecture selector and its knobs
    # (reference models/old_score_model.py / old_all_atom_score_model.py,
    # chosen by inference.py --old_score_model)
    old_score_model: bool = False
    separate_noise_schedule: bool = False  # sigma emb = concat over tr/rot/tor
    use_old_atom_encoder: bool = False  # additive-scalar OldAtomEncoder
    no_aminoacid_identities: bool = False  # zero receptor categorical feats
    # affinity models score `parallel` poses of one complex per graph: the
    # confidence head emits [filtering | ns] per pose and the affinity MLP
    # aggregates pose features over the parallel axis (reference
    # old_all_atom_score_model.py:118-150, 282-292). Our batch axis IS the
    # pose axis, so `parallel` consecutive batch elements form one graph.
    parallel: int = 1
    parallel_aggregators: str = "mean max min std"

    # confidence-mode heads (reference score_model.py:206-233)
    confidence_mode: bool = False
    num_confidence_outputs: int = 1
    affinity_prediction: bool = False
    atom_confidence: bool = False
    atom_num_confidence_outputs: int = 1
    confidence_dropout: float = 0.0
    confidence_no_batchnorm: bool = False

    # all-atom variant (reference models/all_atom_score_model.py)
    all_atoms: bool = False
    atom_radius: float = 5.0
    atom_max_neighbors: int = 8

    # receptor graph hygiene
    c_alpha_max_neighbors: int = 24
    crop_beyond: Optional[float] = None
    # crop-compaction capacities for confidence scoring: when crop_beyond is
    # set, score_confidence packs the kept residues/atoms into these fixed
    # buckets and runs the trunk on the small view (reference subgraphs the
    # complex before the forward, utils/utils.py:395-420). 0 disables.
    # Overflow keeps the nearest and is reported in compact_crop stats.
    crop_res_cap: int = 256
    crop_atom_cap: int = 2048

    sigma: SigmaParams = field(default_factory=SigmaParams)

    def effective_cross_cap(self, n_rec: int) -> int:
        """Bucket-scaled cross-edge capacity for an N-residue receptor view:
        min(N, max(cross_cap, ceil32(N * cross_cap_frac))). The scaled cap
        rounds UP to a multiple of 32 — extra slots only keep MORE true
        in-radius neighbors (strictly closer to the reference's uncapped
        aggregation) and lane-aligned K is what the fused Mosaic cross
        kernel requires. See cross_cap_frac above;
        docs/artifacts/crosscap_ab_tpu.json is the measurement."""
        if self.cross_cap_frac and self.cross_cap_frac > 0:
            scaled = -(-int(n_rec * self.cross_cap_frac) // 32) * 32
            return min(n_rec, max(self.cross_cap, scaled))
        return min(n_rec, self.cross_cap)


@dataclass(frozen=True)
class SamplerConfig:
    """Reverse-diffusion sampling knobs (reference utils/sampling.py:59)."""

    inference_steps: int = 20
    # run only the first actual_steps entries of the inference_steps-length
    # schedule (reference inference.py:460: denser grid, early stop)
    actual_steps: Optional[int] = None
    # embed the receptor once at B=1 and broadcast over the pose axis when
    # the batch is replicas of ONE complex (the common case); a batch of
    # distinct receptors is detected on device and falls back to full
    # per-element embedding, so True is always safe
    shared_receptor: bool = True
    sigma_schedule: str = "expbeta"
    inf_sched_alpha: float = 1.0
    inf_sched_beta: float = 1.0
    # per-manifold time schedules (reference inference.py:375-392). The
    # asyncronous_noise_schedule variant is intentionally unsupported: both
    # pretrained manifests ship it false and the model-side embedding change
    # it needs never activates.
    different_schedules: bool = False
    rot_sigma_schedule: str = "expbeta"
    rot_inf_sched_alpha: float = 1.0
    rot_inf_sched_beta: float = 1.0
    tor_sigma_schedule: str = "expbeta"
    tor_inf_sched_alpha: float = 1.0
    tor_inf_sched_beta: float = 1.0
    # upper limit of the tr time grid; the infer CLI sets it below 1 for
    # pocket-aware runs (reference inference.py:364-368)
    t_max: float = 1.0
    no_random: bool = False
    no_final_step_noise: bool = False
    ode: bool = False
    # low-temperature sampling (reference sampling.py:154-167)
    temp_sampling: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    temp_psi: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    temp_sigma_data: float = 0.5
    # initialization (reference sampling.py:15-48). Pocket-aware init is
    # host-side: CLIs compute featurize.pocket_center and pass it to
    # randomize_position(pocket_center=...) directly; these knobs are not
    # part of SamplerConfig to keep the jitted sampler free of host state.
    initial_noise_std_proportion: float = 1.0
    # phased receptor compaction (TPU perf): at each step in rec_phase_steps
    # shrink the receptor bucket to the matching rec_phase_caps entry,
    # keeping for every pose the nearest residues within
    # 3*sigma_tr(step) + 20 + rec_phase_margin of the current ligand. The
    # reference's per-step crop_beyond rebatching (utils/sampling.py:100-106)
    # as a fixed-shape mid-scan gather; a boundary at step 0 is an exact
    # padding trim. Residue-level score models only (ignored otherwise).
    rec_phase_steps: Tuple[int, ...] = ()
    rec_phase_caps: Tuple[int, ...] = ()
    rec_phase_margin: float = 5.0
    # default-on HOST-side auto derivation of the plan above when it is
    # empty (sampler.derive_phase_plan; VERDICT r3 item 2 — the reference
    # crops per step by DEFAULT, utils/sampling.py:100-106). Applied by the
    # CLIs / CB rollouts per complex, not inside the jitted sampler.
    rec_phase_auto: bool = True
    # SVGD particle coupling (reference sampling.py:169-218); enabled when
    # svgd_weight_log_0/1 are set
    svgd_weight_log_0: Optional[float] = None
    svgd_weight_log_1: Optional[float] = None
    svgd_repulsive_weight_log_0: Optional[float] = None
    svgd_repulsive_weight_log_1: Optional[float] = None
    svgd_kernel_size_log_0: Optional[float] = None
    svgd_kernel_size_log_1: Optional[float] = None
    svgd_langevin_weight_log_0: Optional[float] = None
    svgd_langevin_weight_log_1: Optional[float] = None
    svgd_rot_log_rel_weight: float = 0.0
    svgd_tor_log_rel_weight: float = 0.0
    svgd_use_x0: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop knobs (reference utils/parsing.py, train.py)."""

    lr: float = 1e-3
    w_decay: float = 0.0
    batch_size: int = 16
    n_epochs: int = 1000
    scheduler: str = "plateau"
    scheduler_patience: int = 30
    ema_rate: float = 0.999
    use_ema: bool = True
    tr_weight: float = 0.33
    rot_weight: float = 0.33
    tor_weight: float = 0.33
    confidence_weight: float = 0.33
    # forward-diffusion time sampling t ~ Beta(alpha, beta)
    sampling_alpha: float = 2.0
    sampling_beta: float = 1.0
    grad_clip: Optional[float] = None
    # CB-specific time floor / mixing (reference pdbbind.py:69-78)
    minimum_t: float = 0.0
    sampling_mixing_coeff: float = 0.0
    val_inference_freq: int = 5
    num_inference_complexes: int = 500
    inference_earlystop_metric: str = "valinf_rmsds_lt2"
    inference_earlystop_goal: str = "max"


@dataclass(frozen=True)
class CBConfig:
    """Confidence-Bootstrapping loop knobs (reference bootstrapping/parsing.py
    parse_cb_args + README.md:47-49 recipe)."""

    cb_cluster: str = ""
    n_epochs: int = 10
    cb_inference_freq: int = 5
    inference_samples: int = 8
    inference_steps: int = 20
    inference_batch_size: int = 8
    num_inference_complexes: Optional[int] = 100
    confidence_cutoff: float = -4.0
    oracle_confidence: bool = False  # use -RMSD instead of the model's score
    initial_iterations: int = 5
    inference_iterations: int = 4
    limit_failures: int = 5
    # buffer
    max_complexes_per_couple: Optional[int] = 5
    fixed_length: Optional[int] = 100
    temperature: float = 1.0
    buffer_decay: float = 0.0
    reset_buffer: bool = False
    # finetune time sampling
    minimum_t: float = 0.0
    sampling_mixing_coeff: float = 0.0
    sampling_alpha: float = 2.0
    sampling_beta: float = 1.0
    keep_original_train: bool = False
    total_trainset_size: int = 100
    batch_size: int = 16
    lr: float = 1e-3
    use_ema_for_rollouts: bool = True


def to_dict(cfg) -> dict:
    d = dataclasses.asdict(cfg)

    def clean(v):
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items()}
        if hasattr(v, "_asdict"):  # NamedTuple (e.g. SigmaParams)
            return {k: clean(x) for k, x in v._asdict().items()}
        if isinstance(v, tuple):
            return list(v)
        return v

    return clean(d)


def from_dict(cls, d: dict):
    """Rebuild a config dataclass from a (possibly overlaid) dict."""
    return _from_dict(cls, d)


def save_yaml(cfg, path: str):
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=True)


def _from_dict(cls, d: dict):
    names = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in names:
            continue  # forward/backward compatibility: ignore unknown keys
        if k == "sigma" and isinstance(v, dict):
            v = SigmaParams(**v)
        elif k == "sigma" and isinstance(v, (list, tuple)):
            v = SigmaParams(*v)
        f = names[k]
        if f.type == "Tuple[float, float, float]" and isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)


def load_yaml(cls, path: str):
    with open(path) as f:
        return _from_dict(cls, yaml.safe_load(f))


def load_score_config(path: str) -> ScoreModelConfig:
    return load_yaml(ScoreModelConfig, path)
