"""ESM-sized (1280-d) sampling at the largest receptor bucket (VERDICT r3
item 7 / weak-8): both pretrained manifests require 1280-d ESM receptor
embeddings (reference models/score_model.py:98-99), but bench/stress ran
with lm_embedding_dim=0. This script samples a synthetic N=3072-bucket
complex with random 1280-d embeddings at the production batch size and
records poses/s + the [B,3072,1280] memory head-room outcome.

The embedding phase is t-independent and amortized (shared_receptor), so
poses/s should match the lm=0 stress numbers; this run verifies that.

Writes docs/artifacts/esm_scale_tpu.json.

Usage: python scripts/esm_scale_check.py [--n_res 2800] [--poses 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "artifacts", "esm_scale_tpu.json")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_res", type=int, default=2800)
    ap.add_argument("--poses", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lm", type=int, default=1280)
    ap.add_argument("--out", default=ART)
    args = ap.parse_args(argv)

    from confidence_bootstrapping_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax_compilation"))

    import jax

    from confidence_bootstrapping_tpu.config import SamplerConfig, ScoreModelConfig
    from confidence_bootstrapping_tpu.data import featurize, mol_io
    from confidence_bootstrapping_tpu.data.complex_graph import (
        pad_complex, pick_bucket, replicate_complex)
    from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
    from confidence_bootstrapping_tpu.sampler import sampling
    from stress_eval import write_complex

    d = "/tmp/esm_scale"
    write_complex(d, "esmchk", args.n_res, n_lig=22, seed=0)
    mol = mol_io.read_molecule(os.path.join(d, "esmchk", "esmchk_ligand.sdf"))
    st = mol_io.parse_pdb(os.path.join(d, "esmchk", "esmchk_protein_processed.pdb"))
    hc = featurize.build_host_complex("esmchk", mol, st)
    if args.lm:
        hc = hc._replace(rec_lm=np.random.RandomState(0).randn(
            len(hc.rec_f), args.lm).astype(np.float32))
    bucket = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f))
    padded = pad_complex(hc, bucket, lm_dim=args.lm)
    batch = replicate_complex(padded, args.poses)
    N = batch.rec_pos.shape[1]
    print(f"bucket N={N}, rec_lm {tuple(batch.rec_lm.shape) if batch.rec_lm is not None else None}",
          flush=True)

    cfg = ScoreModelConfig(lm_embedding_dim=args.lm)
    model = TensorProductScoreModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    scfg = SamplerConfig(inference_steps=args.steps)
    psteps, pcaps = sampling.derive_phase_plan(
        cfg, scfg, np.asarray(batch.rec_pos)[:1], np.asarray(batch.rec_mask)[:1])
    if psteps:
        scfg = SamplerConfig(inference_steps=args.steps,
                             rec_phase_steps=psteps, rec_phase_caps=pcaps)
    print(f"phase plan: {list(zip(psteps, pcaps))}", flush=True)

    b0 = sampling.randomize_position(batch, jax.random.PRNGKey(1), cfg.sigma.tr_sigma_max)
    final, _ = sampling.sample_jit(model, variables, b0, jax.random.PRNGKey(2), cfg, scfg)
    jax.block_until_ready(final.lig_pos)  # warm/compile

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        final, _ = sampling.sample_jit(model, variables, b0, jax.random.PRNGKey(3 + i), cfg, scfg)
        jax.block_until_ready(final.lig_pos)
        times.append(time.perf_counter() - t0)

    dt = min(times)
    out = {
        "what": "ESM-sized (1280-d) sampling at the largest receptor bucket: "
                "memory + poses/s check (manifests require 1280-d, "
                "reference models/score_model.py:98-99)",
        "backend": jax.devices()[0].platform,
        "n_res": args.n_res,
        "bucket_N": int(N),
        "lm_dim": args.lm,
        "poses": args.poses,
        "steps": args.steps,
        "phase_plan": [list(p) for p in zip(psteps, pcaps)],
        "sample_wall_s": round(dt, 2),
        "poses_per_s": round(args.poses / dt, 2),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
