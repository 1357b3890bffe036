"""PyTorch reference checkpoint -> flax parameter conversion.

The reference distributes ``*.pt`` state dicts for two architectures
(coarse-grained score model + all-atom confidence model); the weight blobs
are not present in this environment (``workdir/*/.MISSING_LARGE_BLOBS``), so
this module implements and documents the mapping for when they are:

  * e3nn ``FasterTensorProduct`` weight layout (grouped by output irrep,
    inputs concatenated per group) is IDENTICAL to our
    WeightedTensorProduct's grouped layout for lmax=1 ladders
    (ops/irreps.py; verified in tests/test_irreps.py against a direct
    transcription) — the FCBlock producing them maps Dense-for-Dense;
  * l=1 features use e3nn's (y, z, x) basis; ours is (x, y, z). Every
    weight touching an l=1 block needs the P = [[0,0,1],[1,0,0],[0,1,0]]
    basis permutation: spherical-harmonics inputs are handled by permuting
    nothing (sh are recomputed, not loaded), but e3nn BatchNorm running
    norms and Linear blocks acting on 1x/1o blocks must be permuted
    per-multiplicity; scalar blocks map unchanged;
  * torch ``nn.Linear`` stores [out, in] — transpose to flax [in, out];
  * torch Embedding tables map directly (vocabulary order matches
    data/vocab.py = reference allowable_features).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def torch_linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> flax Dense params."""
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def torch_fcblock(sd: Dict[str, Any], prefix: str, depth: int = 2) -> Dict[str, Any]:
    """Reference FCBlock / Sequential(Linear, ReLU, Dropout, Linear) -> our
    FCBlock {Dense_0, Dense_1, ...}. The reference indexes layers inside a
    Sequential: Linear modules sit at indices 0, 3, 6, ...."""
    out = {}
    for i in range(depth):
        out[f"Dense_{i}"] = torch_linear(sd, f"{prefix}.{3 * i}")
    return out


def torch_atom_encoder(sd: Dict[str, Any], prefix: str, n_features: int) -> Dict[str, Any]:
    out = {}
    for i in range(n_features):
        out[f"Embed_{i}"] = {"embedding": np.asarray(sd[f"{prefix}.atom_embedding_list.{i}.weight"])}
    if f"{prefix}.additional_features_embedder.weight" in sd:
        out["Dense_0"] = torch_linear(sd, f"{prefix}.additional_features_embedder")
    return out


L1_PERM = np.array([2, 0, 1])  # e3nn (y, z, x) -> ours (x, y, z)


def convert_state_dict(torch_state_dict: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Best-effort conversion of a reference score-model state dict.

    Raises NotImplementedError for architecture pieces we have not mapped;
    intended to be completed against real checkpoints (absent from this
    environment). The tested guarantees so far: the TP weight layout and
    all MLP/embedding mappings above.
    """
    raise NotImplementedError(
        "reference checkpoint blobs are not available in this environment; "
        "the layout mapping is documented in this module and the TP weight "
        "layout compatibility is covered by tests/test_irreps.py::"
        "test_weighted_tp_matches_reference_faster_tp_constants"
    )
