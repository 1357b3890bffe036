"""User-facing docking CLI (the reference's ``dock.py`` capability).

Featurize (protein.pdb, ligand.sdf/.mol2/SMILES) -> N randomized poses ->
reverse diffusion on device -> optional confidence rerank -> ranked SDF
outputs ``rank{k}_confidence{c}.sdf`` + optional reverse-process PDB
animation (reference dock.py:113-193).

Example (BASELINE.json config 1):
  python -m confidence_bootstrapping_tpu.cli.dock \
      --protein_path data/1a0q/1a0q_protein_processed.pdb \
      --ligand data/1a0q/1a0q_ligand.sdf --samples 8 --inference_steps 20
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ..config import SamplerConfig, ScoreModelConfig, load_score_config, save_yaml
from ..data import featurize, mol_io
from ..data.complex_graph import pick_bucket, pad_complex, replicate_complex
from ..models.score_model import TensorProductScoreModel
from ..sampler import sampling
from ..train import checkpoints


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--protein_path", default=None)
    p.add_argument("--protein_sequence", default=None,
                   help="sequence-only input: the structure is predicted with ESMFold "
                        "(reference dock.py + utils/inference_utils.py:201-212; needs the "
                        "`esm` package)")
    p.add_argument("--ligand", default=None, help="ligand .sdf/.mol2 path (SMILES needs rdkit)")
    p.add_argument("--protein_ligand_csv", default=None,
                   help="CSV with complex_name,protein_path,ligand_path columns (reference dock.py batch mode)")
    p.add_argument("--complex_name", default=None)
    p.add_argument("--out_dir", default="results/user_predictions")
    p.add_argument("--model_dir", default=None, help="dir with model_config.yml + weights")
    p.add_argument("--ckpt", default="last_model")
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--confidence_ckpt", default="last_model")
    p.add_argument("--samples_per_complex", "--samples", dest="samples", type=int, default=10)
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--keep_input_conformer", action="store_true",
                   help="start from the input file's exact geometry instead of a "
                        "regenerated conformer (the reference regenerates, "
                        "utils/inference_utils.py:227-243)")
    p.add_argument("--no_final_step_noise", action="store_true")
    p.add_argument("--ode", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_visualisation", action="store_true")
    p.add_argument("--pocket_knowledge", action="store_true",
                   help="initialize poses at the known pocket (reference --inf_pocket_knowledge)")
    p.add_argument("--pocket_cutoff", type=float, default=7.0)
    p.add_argument("--esm_embeddings_path", default=None, help=".pt dict of per-chain ESM2 embeddings")
    return p


def peek_model_config(model_dir, default_cfg=None):
    """Read a model dir's config WITHOUT initializing the model — used to
    decide featurization (e.g. all_atoms graphs for an all-atom confidence
    model) before any batch exists."""
    if model_dir and os.path.exists(os.path.join(model_dir, checkpoints.CONFIG_NAME)):
        from ..config import load_score_config

        return load_score_config(os.path.join(model_dir, checkpoints.CONFIG_NAME))
    if model_dir and os.path.exists(os.path.join(model_dir, "model_parameters.yml")):
        import yaml

        from ..models.factory import config_from_reference_manifest

        with open(os.path.join(model_dir, "model_parameters.yml")) as f:
            return config_from_reference_manifest(yaml.safe_load(f) or {})
    return default_cfg


def load_or_init_model(model_dir, ckpt, example_batch, default_cfg=None):
    """Load a trained model dir, or initialize fresh weights from a config."""
    if model_dir and os.path.exists(os.path.join(model_dir, checkpoints.CONFIG_NAME)):
        cfg = load_score_config(os.path.join(model_dir, checkpoints.CONFIG_NAME))
    elif model_dir and os.path.exists(os.path.join(model_dir, "model_parameters.yml")):
        # reference model-dir layout: translate the argparse manifest
        import yaml

        from ..models.factory import config_from_reference_manifest

        with open(os.path.join(model_dir, "model_parameters.yml")) as f:
            cfg = config_from_reference_manifest(yaml.safe_load(f) or {})
        print(f"translated reference manifest {model_dir}/model_parameters.yml")
    else:
        cfg = default_cfg or ScoreModelConfig()
    from ..models.factory import get_model

    model = get_model(cfg)  # all_atoms configs need AllAtomScoreModel
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example_batch)
    if model_dir and checkpoints.has_checkpoint(model_dir, ckpt):
        variables = checkpoints.load_params(os.path.join(model_dir, f"{ckpt}.msgpack"), variables)
        print(f"loaded weights from {model_dir}/{ckpt}.msgpack")
    else:
        print("WARNING: no checkpoint found - using randomly initialized weights")
    return model, cfg, variables


def load_esm_for_structure(path, structure):
    """Load per-chain ESM embeddings (.pt dict) and concatenate in chain order."""
    if path is None:
        return None
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    chains = structure.chains()
    embs = []
    for cname, residues in chains.items():
        seq = structure.sequence(cname)
        for key in (cname, seq):
            if key in d:
                embs.append(np.asarray(d[key]))
                break
        else:
            return None
    return np.concatenate(embs, axis=0)


def main(argv=None):
    from ..runtime import enable_compilation_cache

    enable_compilation_cache()
    args = get_parser().parse_args(argv)
    if args.protein_ligand_csv:
        import csv

        results = {}
        with open(args.protein_ligand_csv) as f:
            for row in csv.DictReader(f):
                sub = argparse.Namespace(**vars(args))
                sub.protein_path = row.get("protein_path") or None
                sub.protein_sequence = row.get("protein_sequence") or None
                sub.ligand = row.get("ligand_path") or row.get("ligand_description")
                sub.complex_name = row.get("complex_name") or None
                sub.protein_ligand_csv = None
                _resolve_protein(sub)
                results[sub.complex_name or sub.ligand] = dock_one(sub)
        return results
    if not ((args.protein_path or args.protein_sequence) and args.ligand):
        raise SystemExit("provide --protein_path/--protein_sequence + --ligand, or --protein_ligand_csv")
    _resolve_protein(args)
    return dock_one(args)


def _resolve_protein(args):
    """Sequence-only input: predict the structure with ESMFold and dock
    against the prediction (reference utils/inference_utils.py:201-212)."""
    if args.protein_path or not args.protein_sequence:
        return
    from ..data.esm_prep import predict_structure

    name = args.complex_name or "complex"
    os.makedirs(os.path.join(args.out_dir, name), exist_ok=True)
    args.protein_path = predict_structure(
        args.protein_sequence, os.path.join(args.out_dir, name, f"{name}_esmfold.pdb")
    )
    print(f"ESMFold prediction written to {args.protein_path}")


def dock_one(args):
    if args.complex_name:
        name = args.complex_name
    elif os.path.exists(args.ligand):
        name = os.path.splitext(os.path.basename(args.ligand))[0]
    else:  # SMILES string: make it filesystem-safe
        name = "".join(c if c.isalnum() else "_" for c in args.ligand)[:60] or "ligand"
    os.makedirs(os.path.join(args.out_dir, name), exist_ok=True)

    t0 = time.time()
    if os.path.exists(args.ligand):
        mol = mol_io.read_molecule(args.ligand)
        ligand_is_smiles = False
    else:
        # not a file -> SMILES (reference dock.py tries MolFromSmiles first,
        # utils/inference_utils.py:227-233); embedded conformer, no crystal
        from ..data.conformers import mol_from_smiles

        mol = mol_from_smiles(args.ligand, seed=args.seed)
        ligand_is_smiles = True
    structure = mol_io.parse_pdb(args.protein_path)
    lm = load_esm_for_structure(args.esm_embeddings_path, structure)
    # inference protocol: dock from a freshly generated conformer, never the
    # input file's exact geometry (reference utils/inference_utils.py:227-243)
    # SMILES ligands already carry a fresh embedded conformer
    conformer_mode = "input" if (args.keep_input_conformer or ligand_is_smiles) else "generate"
    # an all-atom confidence model needs receptor-atom graphs in the batch
    conf_cfg = peek_model_config(args.confidence_model_dir) if args.confidence_model_dir else None
    need_atoms = bool(conf_cfg is not None and conf_cfg.all_atoms)
    hc = featurize.build_host_complex(
        name, mol, structure, lm_embeddings=lm,
        conformer_mode=conformer_mode, conformer_seed=args.seed,
        all_atoms=need_atoms,
    )
    heavy = mol.remove_hs()

    n_lm = 1280 if lm is not None else 0
    default_cfg = ScoreModelConfig(lm_embedding_dim=n_lm)
    bucket = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f),
                         n_atoms=0 if hc.atom_f is None else len(hc.atom_f), all_atoms=need_atoms)
    padded = pad_complex(hc, bucket, lm_dim=n_lm)
    batch1 = replicate_complex(padded, 1)
    model, cfg, variables = load_or_init_model(args.model_dir, args.ckpt, batch1, default_cfg)
    print(f"featurized {name}: {len(hc.lig_f)} atoms, {len(hc.tor_src)} torsions, "
          f"{len(hc.rec_f)} residues; bucket {bucket}; setup {time.time()-t0:.1f}s")

    sampler_cfg = SamplerConfig(
        inference_steps=args.inference_steps,
        no_final_step_noise=args.no_final_step_noise,
        ode=args.ode,
    )
    # default-on phased receptor compaction (VERDICT r3 item 2): derive the
    # (step, cap) plan for this receptor from the sigma schedule
    if sampler_cfg.rec_phase_auto:
        import dataclasses

        steps_a, caps_a = sampling.derive_phase_plan(
            cfg, sampler_cfg, padded["rec_pos"], padded["rec_mask"])
        if steps_a:
            sampler_cfg = dataclasses.replace(
                sampler_cfg, rec_phase_steps=steps_a, rec_phase_caps=caps_a)

    key = jax.random.PRNGKey(args.seed)
    all_pos, all_conf = [], []
    t1 = time.time()
    for start in range(0, args.samples, args.batch_size):
        n = min(args.batch_size, args.samples - start)
        batch = replicate_complex(padded, n)
        key, k1, k2 = jax.random.split(key, 3)
        pk = None
        if args.pocket_knowledge:
            c = featurize.pocket_center(hc, args.pocket_cutoff)
            pk = np.broadcast_to(c, (n, 3)).copy()
        batch = sampling.randomize_position(batch, k1, cfg.sigma.tr_sigma_max,
                                            pocket_center=None if pk is None else jax.numpy.asarray(pk))
        final, traj = sampling.sample_jit(
            model, variables, batch, k2, cfg, sampler_cfg, args.save_visualisation
        )
        all_pos.append(np.asarray(final.lig_pos))
        if args.save_visualisation:
            tr = np.concatenate([np.asarray(batch.lig_pos)[None], np.asarray(traj)], axis=0)
            L = len(hc.lig_f)
            for i in range(n):
                mol_io.write_pdb_trajectory(
                    heavy, tr[:, i, :L] + hc.orig_center, os.path.join(args.out_dir, name, f"traj_{start+i}.pdb")
                )
    dt = time.time() - t1
    pos = np.concatenate(all_pos, axis=0)[:, : len(hc.lig_f)]
    print(f"sampled {args.samples} poses x {args.inference_steps} steps in {dt:.2f}s "
          f"({args.samples / dt:.2f} poses/s)")

    # confidence rerank
    if args.confidence_model_dir:
        cmodel, ccfg, cvars = load_or_init_model(args.confidence_model_dir, args.confidence_ckpt, batch1)
        confs = []
        for start in range(0, args.samples, args.batch_size):
            n = min(args.batch_size, args.samples - start)
            batch = replicate_complex(padded, n)
            lp = batch.lig_pos.at[:, : len(hc.lig_f)].set(pos[start : start + n])
            conf = sampling.score_confidence(cmodel, cvars, batch, lig_pos=lp)
            confs.append(np.asarray(conf))
        conf = np.concatenate(confs, axis=0)
    else:
        conf = np.full((args.samples,), np.nan)

    order = np.argsort(-np.nan_to_num(conf, nan=-1e9))
    for rank, i in enumerate(order):
        c = conf[i]
        suffix = f"_confidence{c:.2f}" if np.isfinite(c) else ""
        out = os.path.join(args.out_dir, name, f"rank{rank+1}{suffix}.sdf")
        mol_io.write_sdf(heavy, pos[i] + hc.orig_center, out, name=name)
    print(f"wrote {args.samples} ranked poses to {os.path.join(args.out_dir, name)}")
    return pos, conf


if __name__ == "__main__":
    main()
