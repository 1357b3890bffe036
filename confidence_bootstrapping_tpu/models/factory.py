"""Model factory (the reference's utils/utils.py:get_model, lines 175-288):
config -> coarse-grained or all-atom tensor-product model. Also the
reference-manifest translation layer: a reference ``model_parameters.yml``
(argparse dump, ~120 flags) maps onto our typed ScoreModelConfig with the
same back-compat defaulting the reference applies via ``hasattr`` patch
blocks (finetune_train.py:401-445, inference.py:248-267) — missing/legacy
flags silently take the modern defaults, so old manifests (incl. the
``--old_score_model`` era) resolve to a loadable architecture.
"""

from __future__ import annotations

from typing import Any, Dict

from ..config import ScoreModelConfig, SigmaParams
from .all_atom_model import AllAtomScoreModel
from .score_model import TensorProductScoreModel


def get_model(cfg: ScoreModelConfig):
    if cfg.old_score_model:
        # legacy pre-protein-embedding architectures (reference
        # utils/utils.py:182-186 dispatches to models/old_score_model.py or
        # old_all_atom_score_model.py when inference.py --old_score_model /
        # old=True is set; the all-atom one is also the affinity model)
        from .legacy import OldAllAtomScoreModel, OldTensorProductScoreModel

        if cfg.all_atoms:
            return OldAllAtomScoreModel(cfg)
        return OldTensorProductScoreModel(cfg)
    if cfg.all_atoms:
        return AllAtomScoreModel(cfg)
    return TensorProductScoreModel(cfg)


# reference flag -> (our field, transform). Inverted "no_*"/"not_*" flags are
# handled below; flags absent from a manifest keep our defaults (the
# reference's back-compat behavior for old checkpoints).
_DIRECT = {
    "ns": "ns",
    "nv": "nv",
    "sh_lmax": "sh_lmax",
    "num_conv_layers": "num_conv_layers",
    "num_prot_emb_layers": "num_prot_emb_layers",
    "embed_also_ligand": "embed_also_ligand",
    "use_second_order_repr": "use_second_order_repr",
    "reduce_pseudoscalars": "reduce_pseudoscalars",
    "dropout": "dropout",
    "sigma_embed_dim": "sigma_embed_dim",
    "distance_embed_dim": "distance_embed_dim",
    "cross_distance_embed_dim": "cross_distance_embed_dim",
    "max_radius": "lig_max_radius",
    "receptor_radius": "rec_max_radius",
    "cross_max_distance": "cross_max_distance",
    "dynamic_max_cross": "dynamic_max_cross",
    "embedding_type": "embedding_type",
    "embedding_scale": "embedding_scale",
    "scale_by_sigma": "scale_by_sigma",
    "no_torsion": "no_torsion",
    "smooth_edges": "smooth_edges",
    "odd_parity": "odd_parity",
    "tp_weights_layers": "tp_weights_layers",
    "depthwise_convolution": "depthwise_convolution",
    "all_atoms": "all_atoms",
    "atom_radius": "atom_radius",
    "atom_max_neighbors": "atom_max_neighbors",
    "c_alpha_max_neighbors": "c_alpha_max_neighbors",
    "crop_beyond": "crop_beyond",
    "confidence_dropout": "confidence_dropout",
    "confidence_no_batchnorm": "confidence_no_batchnorm",
    "affinity_prediction": "affinity_prediction",
    "separate_noise_schedule": "separate_noise_schedule",
    "use_old_atom_encoder": "use_old_atom_encoder",
    "no_aminoacid_identities": "no_aminoacid_identities",
    "parallel": "parallel",
    "parallel_aggregators": "parallel_aggregators",
}

_INVERTED = {
    "no_batch_norm": "batch_norm",
    "no_differentiate_convolutions": "differentiate_convolutions",
    "not_fixed_center_conv": "fixed_center_conv",
}


def config_from_reference_manifest(manifest: Dict[str, Any]) -> ScoreModelConfig:
    """Translate a reference ``model_parameters.yml`` dict to ScoreModelConfig.

    Covers the two shipped manifests (workdir/pretrained_score,
    workdir/pretrained_confidence) and degrades gracefully on older ones:
    unknown flags are ignored, missing flags keep our defaults.
    """
    kwargs: Dict[str, Any] = {}
    for src, dst in _DIRECT.items():
        if src in manifest and manifest[src] is not None:
            kwargs[dst] = manifest[src]
    for src, dst in _INVERTED.items():
        if src in manifest and manifest[src] is not None:
            kwargs[dst] = not manifest[src]

    sig = {}
    for p in ("tr_sigma_min", "tr_sigma_max", "rot_sigma_min", "rot_sigma_max",
              "tor_sigma_min", "tor_sigma_max"):
        if manifest.get(p) is not None:
            sig[p] = float(manifest[p])
    if sig:
        kwargs["sigma"] = SigmaParams(**sig)

    # ESM features: the reference keys them off an embeddings path / model
    # flag, not a dim (utils/utils.py:231-236 checks the per-dataset paths).
    # 1280 = esm2_t33_650M per-residue dim.
    esm_keys = ("esm_embeddings_path", "moad_esm_embeddings_path",
                "pdbbind_esm_embeddings_path", "pdbsidechain_esm_embeddings_path",
                "esm_embeddings_model")
    if any(manifest.get(k) for k in esm_keys):
        kwargs["lm_embedding_dim"] = 1280
    else:
        kwargs["lm_embedding_dim"] = 0

    # confidence ("filtering") model manifests carry classification flags
    if manifest.get("rmsd_classification_cutoff") is not None or manifest.get("confidence_mode"):
        kwargs["confidence_mode"] = True
        cut = manifest.get("rmsd_classification_cutoff")
        if isinstance(cut, (list, tuple)):
            kwargs["num_confidence_outputs"] = len(cut) + 1
        if manifest.get("atom_confidence_loss_weight"):
            kwargs["atom_confidence"] = True
    return ScoreModelConfig(**kwargs)


def confidence_model_config(
    ns: int = 24,
    nv: int = 6,
    sh_lmax: int = 2,
    **overrides,
) -> ScoreModelConfig:
    """The pretrained confidence architecture's manifest defaults
    (reference workdir/pretrained_confidence/model_parameters.yml)."""
    kwargs = dict(
        ns=ns,
        nv=nv,
        sh_lmax=sh_lmax,
        num_conv_layers=5,
        num_prot_emb_layers=0,
        embed_also_ligand=False,
        reduce_pseudoscalars=False,
        all_atoms=True,
        confidence_mode=True,
        crop_beyond=20.0,
        dynamic_max_cross=True,
        embedding_scale=10000,
        dropout=0.1,
    )
    kwargs.update(overrides)
    return ScoreModelConfig(**kwargs)
