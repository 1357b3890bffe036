"""Full-sigma learns-to-dock on the REAL featurized complex, on TPU.

VERDICT r3 weak-7: the CPU learns-to-dock test pins the mechanism at a
reduced noise range (tr_sigma_max 3 A, toy complex); this script is the
TPU-scale analogue of the reference's in-training inference benchmark
(utils/training.py:292-373 inference_epoch_fix): train the FULL
pretrained-manifest architecture on the real featurized 1a0q complex at
the production noise range (tr_sigma_max 19 A), through the fused
training kernels, then sample through the production phased sampler and
record RMSD-to-crystal for the untrained / trained / EMA parameters.

Writes docs/artifacts/overfit_dock_tpu.json. Exit 1 unless training
moved sampled poses from tens of A to < 5 A min RMSD.

Usage: python scripts/overfit_dock_tpu.py [--steps 1500] [--batch 32]
       [--poses 32] [--smoke]   (--smoke: tiny model/steps, CPU plumbing check)
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
                   "docs", "artifacts", "overfit_dock_tpu.json")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--poses", type=int, default=32)
    ap.add_argument("--inference_steps", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=ART)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args(argv)

    from confidence_bootstrapping_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax_compilation"))

    import jax
    import jax.numpy as jnp

    from confidence_bootstrapping_tpu.config import SamplerConfig, ScoreModelConfig, TrainConfig
    from confidence_bootstrapping_tpu.data import featurize, mol_io
    from confidence_bootstrapping_tpu.data.complex_graph import (
        pad_complex, pick_bucket, replicate_complex)
    from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
    from confidence_bootstrapping_tpu.sampler import sampling
    from confidence_bootstrapping_tpu.train import train_loop

    ref = "/root/reference/data/1a0q"
    mol = mol_io.read_molecule(f"{ref}/1a0q_ligand.sdf")
    st = mol_io.parse_pdb(f"{ref}/1a0q_protein_processed.pdb")
    hc = featurize.build_host_complex("1a0q", mol, st)
    bucket = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f))
    padded = pad_complex(hc, bucket)

    # production architecture + production (full) noise range; dropout off so
    # the single-complex overfit is not regularized away
    if args.smoke:
        cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1,
                               lm_embedding_dim=0, dropout=0.0)
        args.steps, args.batch, args.poses = 3, 4, 4
    else:
        cfg = ScoreModelConfig(lm_embedding_dim=0, dropout=0.0)
    model = TensorProductScoreModel(cfg)

    train_batch = replicate_complex(padded, args.batch)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), train_batch)

    tcfg = TrainConfig(lr=args.lr, batch_size=args.batch)
    state = train_loop.init_train_state(variables, tcfg)
    step_fn = train_loop.make_train_step(model, cfg, tcfg)

    losses = []
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, train_batch, k)
        if i % 100 == 0 or i == args.steps - 1:
            row = {"step": i, "loss": round(float(metrics["loss"]), 4),
                   "tr": round(float(metrics["tr_loss"]), 4),
                   "rot": round(float(metrics["rot_loss"]), 4),
                   "tor": round(float(metrics["tor_loss"]), 4)}
            losses.append(row)
            print(f"{row} ({time.time() - t0:.1f}s)", flush=True)
    wall_train = time.time() - t0

    # sample through the PRODUCTION path: auto-derived phase plan (the same
    # default-on compaction cli/infer.py and the CB rollout use)
    scfg = SamplerConfig(inference_steps=args.inference_steps)
    rec_pos = np.asarray(train_batch.rec_pos)[:1]
    rec_mask = np.asarray(train_batch.rec_mask)[:1]
    psteps, pcaps = sampling.derive_phase_plan(cfg, scfg, rec_pos, rec_mask)
    if psteps:
        scfg = SamplerConfig(inference_steps=args.inference_steps,
                             rec_phase_steps=psteps, rec_phase_caps=pcaps)
    print(f"phase plan: {list(zip(psteps, pcaps))}", flush=True)

    L = len(hc.lig_f)
    truth = np.asarray(hc.orig_lig_pos)

    def sample_rmsds(params, batch_stats, seed):
        bundle = {"params": params, "batch_stats": batch_stats}
        b = replicate_complex(padded, args.poses)
        b0 = sampling.randomize_position(b, jax.random.PRNGKey(seed), cfg.sigma.tr_sigma_max)
        final, _ = sampling.sample_jit(model, bundle, b0, jax.random.PRNGKey(seed + 1), cfg, scfg)
        poses = np.asarray(final.lig_pos)[:, :L]
        return np.sqrt(((poses - truth[None]) ** 2).sum(-1).mean(-1))

    t0 = time.time()
    rows = {}
    for tag, params, bs in (
        ("untrained", variables["params"], variables.get("batch_stats", {})),
        ("trained", state.params, state.batch_stats),
        ("ema", state.ema_params, state.batch_stats),
    ):
        r = sample_rmsds(params, bs, 100)
        rows[tag] = {"min": round(float(r.min()), 3), "median": round(float(np.median(r)), 3),
                     "max": round(float(r.max()), 3), "lt2": round(float((r < 2).mean()), 3),
                     "lt5": round(float((r < 5).mean()), 3)}
        print(tag, rows[tag], flush=True)
    wall_sample = time.time() - t0

    out = {
        "what": "full-sigma learns-to-dock on the real featurized 1a0q "
                "(production architecture, tr_sigma_max 19 A, fused training "
                "kernels, production auto phase plan in the sampler)",
        "backend": jax.devices()[0].platform,
        "train_steps": args.steps,
        "train_batch": args.batch,
        "lr": args.lr,
        "poses": args.poses,
        "inference_steps": args.inference_steps,
        "phase_plan": [list(p) for p in zip(psteps, pcaps)],
        "wall_train_s": round(wall_train, 1),
        "train_step_ms": round(1000 * wall_train / max(args.steps, 1), 1),
        "wall_sample_s": round(wall_sample, 1),
        "loss_trajectory": losses,
        "rmsd": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))

    if not args.smoke:
        assert rows["untrained"]["min"] > 10.0, rows  # full-sigma random init: nowhere near
        ok = min(rows["trained"]["min"], rows["ema"]["min"]) < 5.0
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
