"""Model factory (the reference's utils/utils.py:get_model, lines 175-288):
config -> coarse-grained or all-atom tensor-product model."""

from __future__ import annotations

from ..config import ScoreModelConfig
from .all_atom_model import AllAtomScoreModel
from .score_model import TensorProductScoreModel


def get_model(cfg: ScoreModelConfig):
    if cfg.all_atoms:
        return AllAtomScoreModel(cfg)
    return TensorProductScoreModel(cfg)


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
