"""Microbench: all-atom confidence forward (score_confidence) at B poses.

VERDICT r2 item 6: at the compacted crop buckets (crop_res_cap=256,
crop_atom_cap=2048) the in-kernel-gather kernels (CBT_FUSED_REC_G=1) may
beat the one-hot-gather XLA glue they were neutral against at the full
N=512/A=4096 buckets. This script times the jitted score_confidence call
on the 1a0q example (reference data/1a0q, the de-facto smoke complex)
under the CURRENT process env — run it twice:

    CBT_FUSED_REC_G=0 python scripts/microbench_conf.py
    CBT_FUSED_REC_G=1 python scripts/microbench_conf.py

Prints one JSON line {"b", "ms", "fused_rec_g", "backend", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from confidence_bootstrapping_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", "jax_compilation"))

    from confidence_bootstrapping_tpu.config import ScoreModelConfig
    from confidence_bootstrapping_tpu.data import featurize, mol_io
    from confidence_bootstrapping_tpu.data.complex_graph import (
        pad_complex, pick_bucket, replicate_complex)
    from confidence_bootstrapping_tpu.models.all_atom_model import AllAtomScoreModel
    from confidence_bootstrapping_tpu.sampler import sampling

    B = int(os.environ.get("MB_POSES", 8))
    ref = "/root/reference/data/1a0q"
    mol = mol_io.read_molecule(f"{ref}/1a0q_ligand.sdf")
    st = mol_io.parse_pdb(f"{ref}/1a0q_protein_processed.pdb")
    hc = featurize.build_host_complex("1a0q", mol, st, all_atoms=True)
    bucket = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src),
                         len(hc.rec_f), len(hc.atom_f), all_atoms=True)
    padded = pad_complex(hc, bucket, lm_dim=0)
    batch = replicate_complex(padded, B)

    # pretrained-confidence architecture (SURVEY 2.2) minus the LM features
    cfg = ScoreModelConfig(ns=24, nv=6, sh_lmax=2, lm_embedding_dim=0, dropout=0.0,
                           all_atoms=True, confidence_mode=True, crop_beyond=20.0)
    model = AllAtomScoreModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    import numpy as np

    score = jax.jit(lambda v, b: sampling.score_confidence(model, v, b))
    # axon gotcha (docs/PERF_NOTES.md): block_until_ready returns early
    # through the tunnel — sync with a device-to-host transfer instead
    np.asarray(score(variables, batch))

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(score(variables, batch))
        times.append(time.perf_counter() - t0)

    print(json.dumps({
        "what": "score_confidence fwd (compact crop), 1a0q all-atom",
        "b": B,
        "ms": round(min(times) * 1000, 2),
        "fused_rec_g": os.environ.get("CBT_FUSED_REC_G", "0"),
        "backend": jax.devices()[0].platform,
        "buckets": {"N": int(batch.rec_pos.shape[1]),
                    "A": int(batch.atom_pos.shape[1]),
                    "crop": [cfg.crop_res_cap, cfg.crop_atom_cap]},
    }))


if __name__ == "__main__":
    main()
