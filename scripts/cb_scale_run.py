"""Production-scale CB finetune run on TPU (VERDICT r3 item 4).

The reference's flagship feature is the CB loop — rollouts interleaved with
finetune epochs (reference finetune_train.py:252-349); this script records
its first end-to-end TPU measurement at real bucket sizes: multi-epoch
``inference_finetune`` over complexes spanning the N=512 (real 1a0q) and
N=1024 (synthetic, protein-like extent) receptor buckets, with the
all-atom confidence model as the filter (random init — the artifact
measures the production choreography and per-phase wall budget, not
docking quality), ESM-sized (1280-d) receptor embeddings stubbed with
random values, and the fused training kernels + auto phase plans on.

Writes docs/artifacts/cb_scale_tpu.json: per-epoch wall_rollout /
wall_rmsd / wall_confidence / wall_train plus rollout poses/s.

Usage: python scripts/cb_scale_run.py [--epochs 3] [--samples 8] [--lm 1280]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "artifacts", "cb_scale_tpu.json")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lm", type=int, default=1280)
    ap.add_argument("--n_synth", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/cb_scale")
    ap.add_argument("--out", default=ART)
    args = ap.parse_args(argv)

    from confidence_bootstrapping_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax_compilation"))

    import jax

    from confidence_bootstrapping_tpu.bootstrapping import finetune as ft
    from confidence_bootstrapping_tpu.config import CBConfig, ScoreModelConfig
    from confidence_bootstrapping_tpu.data import featurize, mol_io
    from confidence_bootstrapping_tpu.data.complex_graph import replicate_complex
    from confidence_bootstrapping_tpu.models.all_atom_model import AllAtomScoreModel
    from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
    from confidence_bootstrapping_tpu.sampler import sampling
    from stress_eval import write_complex

    data_dir = os.path.join(args.workdir, "data")
    os.makedirs(data_dir, exist_ok=True)

    # targets: real 1a0q (N=512 bucket) + synthetic complexes in the N=1024
    # bucket (protein-like extent random walks, see stress_eval.py)
    rng = np.random.RandomState(0)
    entries = [("1a0q", "/root/reference/data/1a0q/1a0q_protein_processed.pdb",
                "/root/reference/data/1a0q/1a0q_ligand.sdf")]
    for i in range(args.n_synth):
        name = f"cbsyn{i:02d}"
        write_complex(data_dir, name, int(rng.randint(600, 1000)), int(rng.randint(20, 25)), seed=i)
        entries.append((name, os.path.join(data_dir, name, f"{name}_protein_processed.pdb"),
                        os.path.join(data_dir, name, f"{name}_ligand.sdf")))

    targets = []
    for name, ppath, lpath in entries:
        mol = mol_io.read_molecule(lpath)
        st = mol_io.parse_pdb(ppath)
        hc = featurize.build_host_complex(name, mol, st, all_atoms=True)
        if args.lm:
            # ESM-sized embeddings stubbed with random values (the pretrained
            # score manifest requires 1280-d, reference score_model.py:98-99)
            hc = hc._replace(rec_lm=np.random.RandomState(1).randn(
                len(hc.rec_f), args.lm).astype(np.float32))
        targets.append(ft.CBTarget(hc, mol.remove_hs(), lm_dim=args.lm))
    print("targets:", [(t.name, t.bucket.N) for t in targets], flush=True)

    model_cfg = ScoreModelConfig(lm_embedding_dim=args.lm)
    model = TensorProductScoreModel(model_cfg)
    example = replicate_complex(targets[0].padded, 1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)

    conf_cfg = ScoreModelConfig(ns=24, nv=6, sh_lmax=2, lm_embedding_dim=args.lm,
                                all_atoms=True, confidence_mode=True, crop_beyond=20.0)
    cmodel = AllAtomScoreModel(conf_cfg)
    cvars = jax.jit(cmodel.init)(jax.random.PRNGKey(1), example.set_time(0.0, 0.0, 0.0))

    def confidence_fn(target, poses):
        n = len(poses)
        batch = replicate_complex(target.padded, n)
        lp = batch.lig_pos.at[:, : poses.shape[1]].set(poses)
        return np.asarray(sampling.score_confidence(cmodel, cvars, batch, lig_pos=lp))

    cb = CBConfig(
        n_epochs=args.epochs,
        cb_inference_freq=1,
        initial_iterations=1,
        inference_iterations=1,
        inference_samples=args.samples,
        inference_steps=args.steps,
        confidence_cutoff=-1e8,  # random-init confidence: keep all poses so
        batch_size=16,           # the train phase sees real work
        fixed_length=32,
        lr=1e-4,
    )
    t0 = time.time()
    state, history = ft.inference_finetune(
        model, variables, targets, model_cfg, cb, jax.random.PRNGKey(7),
        confidence_fn=confidence_fn, workdir=os.path.join(args.workdir, "wd"),
    )
    total = time.time() - t0

    epochs = []
    for h in history:
        e = {"epoch": h.get("epoch"), "wall_train": h.get("wall_train"),
             "train_loss": (h.get("train") or {}).get("loss")}
        if "inference" in h:
            m = h["inference"]
            e.update(wall_rollout=m.get("wall_rollout"), wall_rmsd=m.get("wall_rmsd"),
                     wall_confidence=m.get("wall_confidence"),
                     n_sampled=m.get("n_sampled"), n_kept=m.get("n_kept"))
            if m.get("wall_rollout"):
                e["rollout_poses_per_s"] = round(m["n_sampled"] / m["wall_rollout"], 2)
        epochs.append(e)
    out = {
        "targets": [(t.name, int(t.bucket.N)) for t in targets],
        "lm_dim": args.lm,
        "samples_per_rollout": args.samples,
        "inference_steps": args.steps,
        "total_wall_s": round(total, 1),
        "epochs": epochs,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
