"""TPU pose-parity check for a phased-compaction plan (VERDICT r3 item 8).

Samples the 1a0q pose batch twice with IDENTICAL noise keys — once
unphased, once with the given plan — and reports the max/mean final-pose
deviation plus the RMSD-to-crystal distribution of both. Used to validate
deeper plans (e.g. '8:256,14:128') before promoting them to defaults: a
cap that drops in-cutoff residues shows up here as pose deviation beyond
bf16 noise.

Usage: python scripts/phase_parity.py --plan 8:256,14:128 [--poses 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--plan", default="8:256,14:128")
    ap.add_argument("--poses", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
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

    ref = "/root/reference/data/1a0q"
    mol = mol_io.read_molecule(f"{ref}/1a0q_ligand.sdf")
    st = mol_io.parse_pdb(f"{ref}/1a0q_protein_processed.pdb")
    hc = featurize.build_host_complex("1a0q", mol, st)
    bucket = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f))
    padded = pad_complex(hc, bucket, lm_dim=0)
    batch = replicate_complex(padded, args.poses)

    cfg = ScoreModelConfig(lm_embedding_dim=0)
    model = TensorProductScoreModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    b0 = sampling.randomize_position(batch, jax.random.PRNGKey(3), cfg.sigma.tr_sigma_max)

    base_cfg = SamplerConfig(inference_steps=args.steps)
    plan = [(int(x.split(":")[0]), int(x.split(":")[1])) for x in args.plan.split(",") if x]
    phased_cfg = dataclasses.replace(
        base_cfg, rec_phase_steps=tuple(s for s, _ in plan), rec_phase_caps=tuple(c for _, c in plan))

    k = jax.random.PRNGKey(4)
    base, _ = sampling.sample_jit(model, variables, b0, k, cfg, base_cfg)
    two, _ = sampling.sample_jit(model, variables, b0, k, cfg, phased_cfg)

    L = len(hc.lig_f)
    p0 = np.asarray(base.lig_pos)[:, :L]
    p1 = np.asarray(two.lig_pos)[:, :L]
    ref_pos = np.asarray(hc.orig_lig_pos)
    r0 = np.sqrt(((p0 - ref_pos[None]) ** 2).sum(-1).mean(-1))
    r1 = np.sqrt(((p1 - ref_pos[None]) ** 2).sum(-1).mean(-1))
    d = np.abs(p1 - p0)
    out = dict(
        plan=args.plan, poses=args.poses,
        max_atom_dev=float(d.max()), mean_atom_dev=float(d.mean()),
        rmsd_unphased=dict(mean=float(r0.mean()), min=float(r0.min()), lt2=float((r0 < 2).mean())),
        rmsd_phased=dict(mean=float(r1.mean()), min=float(r1.min()), lt2=float((r1 < 2).mean())),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
