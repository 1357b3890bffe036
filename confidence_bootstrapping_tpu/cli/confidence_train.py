"""Confidence-model training CLI (reference ``confidence/confidence_train.py``).

Generates (or loads) score-model rollout caches over the training complexes,
then trains the all-atom pose classifier with BCE (or RMSD regression),
balanced sampling, the 2-4 A ambiguous-band exclusion, and ROC-AUC/accuracy
validation with best-checkpoint selection.
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import numpy as np

from ..config import TrainConfig, save_yaml
from ..confidence import dataset as cdataset
from ..confidence import train as ctrain
from ..bootstrapping.finetune import CBTarget
from ..data.complex_graph import replicate_complex
from ..data.dataset import ComplexDataset, discover_dir
from ..models.factory import confidence_model_config, get_model
from ..train import checkpoints
from .dock import load_or_init_model


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--split_train", default=None)
    p.add_argument("--split_val", default=None)
    p.add_argument("--cache_path", default="cache")
    p.add_argument("--workdir", default="workdir/confidence")
    p.add_argument("--original_model_dir", required=True, help="frozen score model for pose generation")
    p.add_argument("--original_ckpt", default="last_model")
    p.add_argument("--samples_per_complex", type=int, default=4)
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--cache_ids", default="1", help="comma-separated generation cache ids to combine")
    p.add_argument("--cache_creation_id", default=None, help="generate this cache id then exit")
    p.add_argument("--rmsd_classification_cutoff", type=float, nargs="+", default=[2.0],
                   help="one cutoff = binary BCE; several = multi-bin cross-entropy "
                        "(reference confidence_train.py:73)")
    p.add_argument("--rmsd_classification_upper", type=float, default=4.0)
    p.add_argument("--rmsd_prediction", action="store_true")
    p.add_argument("--no_balance", action="store_true")
    p.add_argument("--atom_confidence_loss_weight", type=float, default=0.0,
                   help="per-atom confidence loss weight (the pretrained recipe uses 0.5, "
                        "workdir/pretrained_confidence/model_parameters.yml)")
    p.add_argument("--atom_rmsd_classification_cutoff", type=float, nargs="+", default=[2.0])
    p.add_argument("--confidence_loss_weight", type=float, default=1.0)
    p.add_argument("--affinity_prediction", action="store_true",
                   help="train a binding-affinity head jointly (reference "
                        "confidence_train.py:224-237); needs --affinity_csv labels")
    p.add_argument("--affinity_loss_weight", type=float, default=1.0)
    p.add_argument("--parallel", type=int, default=1,
                   help=">1 selects the legacy grouped-pose affinity head "
                        "(reference old_all_atom_score_model.py:282-292)")
    p.add_argument("--affinity_csv", default=None,
                   help="CSV of 'complex_name,affinity' per line (the reference's "
                        "affinity label dataset is not shipped upstream)")
    p.add_argument("--transfer_weights", action="store_true",
                   help="build the confidence model with the SCORE model's architecture and "
                        "initialize every matching tensor from its checkpoint "
                        "(reference confidence_train.py:566-575); heads stay fresh")
    p.add_argument("--trajectory_sampling", action="store_true",
                   help="train on random reverse-diffusion frames with their diffusion "
                        "time stamped (reference confidence/dataset.py:307-310)")
    p.add_argument("--all_atoms", action="store_true", default=True)
    p.add_argument("--ns", type=int, default=24)
    p.add_argument("--nv", type=int, default=6)
    p.add_argument("--n_epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--batches_per_epoch", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--test", action="store_true",
                   help="evaluation-only: sweep confidence accuracy over reverse-diffusion "
                        "steps 0..T on the val targets (reference confidence_train.py "
                        "--no_train/test(), :451-486) and write trajectory_sweep.json")
    p.add_argument("--ckpt", default="last_model",
                   help="checkpoint (in --workdir) evaluated by --test")
    p.add_argument("--seed", type=int, default=0)
    return p


def build_targets(args, names_file, all_atoms):
    names = open(names_file).read().split() if names_file else None
    entries = discover_dir(args.data_dir, names)
    if args.limit_complexes:
        entries = entries[: args.limit_complexes]
    ds = ComplexDataset(entries, cache_dir=args.cache_path, all_atoms=all_atoms)
    lm = ds.lm_dim()
    return [CBTarget(ds.complexes[i], ds.mols[ds.complexes[i].name], lm_dim=lm) for i in range(len(ds.complexes))]


def transfer_matching_variables(dst_vars, src_vars):
    """Copy every leaf whose path + shape + dtype match from src into dst
    (the reference's state_dict.update over intersecting keys,
    confidence_train.py:569-575). Returns (new variables, copied count)."""
    import flax

    out = flax.core.unfreeze(dict(dst_vars))
    n = 0
    for col in ("params", "batch_stats"):
        if col not in out or col not in src_vars:
            continue
        d = flax.traverse_util.flatten_dict(flax.core.unfreeze(out[col]))
        s = flax.traverse_util.flatten_dict(flax.core.unfreeze(src_vars[col]))
        for k, v in s.items():
            if k in d and d[k].shape == v.shape and d[k].dtype == v.dtype:
                d[k] = v
                n += 1
        out[col] = flax.traverse_util.unflatten_dict(d)
    return out, n


def main(argv=None):
    from ..runtime import enable_compilation_cache

    enable_compilation_cache()
    args = get_parser().parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    # frozen score model (coarse-grained view for generation)
    gen_targets = build_targets(args, args.split_train, all_atoms=False)
    example = replicate_complex(gen_targets[0].padded, 1)
    score_model, score_cfg, score_vars = load_or_init_model(args.original_model_dir, args.original_ckpt, example)

    # targets with the confidence model's graph view: all-atom unless the
    # weights are transferred from the (coarse-grained) score architecture
    conf_all_atoms = score_cfg.all_atoms if args.transfer_weights else args.all_atoms
    targets = build_targets(args, args.split_train, all_atoms=conf_all_atoms)
    val_targets = build_targets(args, args.split_val, all_atoms=conf_all_atoms) if args.split_val else targets[: max(1, len(targets) // 10)]
    print(f"confidence training: {len(targets)} train / {len(val_targets)} val complexes")

    gen_dir = os.path.join(args.cache_path, "confidence_generation")
    if args.cache_creation_id is not None:
        key, k = jax.random.split(key)
        cdataset.generate_filtering_cache(
            score_model, score_vars, gen_targets, k, score_cfg,
            args.samples_per_complex, args.inference_steps, gen_dir, args.cache_creation_id,
            trajectory=args.trajectory_sampling,
        )
        print(f"generated cache id {args.cache_creation_id}")
        return

    caches = []
    for cid in args.cache_ids.split(","):
        key, k = jax.random.split(key)
        caches.append(
            cdataset.generate_filtering_cache(
                score_model, score_vars, gen_targets, k, score_cfg,
                args.samples_per_complex, args.inference_steps, gen_dir, cid.strip(),
                trajectory=args.trajectory_sampling,
            )
        )
    cache = cdataset.combine_caches(caches)

    cutoff = args.rmsd_classification_cutoff
    if len(cutoff) == 1:
        cutoff = cutoff[0]  # reference collapses single-element lists (:190-193)
    atom_cutoff = None
    if args.atom_confidence_loss_weight > 0:
        atom_cutoff = args.atom_rmsd_classification_cutoff
        if len(atom_cutoff) == 1:
            atom_cutoff = atom_cutoff[0]

    affinities = None
    if args.affinity_prediction:
        if not args.affinity_csv:
            raise SystemExit("--affinity_prediction requires --affinity_csv labels")
        affinities = {}
        for line in open(args.affinity_csv):
            line = line.strip()
            if line and not line.startswith("#"):
                name_, val = line.rsplit(",", 1)
                affinities[name_.strip()] = float(val)

    if args.transfer_weights:
        # confidence model takes the SCORE model's architecture and inherits
        # its matching weights (reference confidence_train.py:566-575)
        import dataclasses

        cfg = dataclasses.replace(
            score_cfg, confidence_mode=True,
            num_confidence_outputs=len(cutoff) + 1 if isinstance(cutoff, list) else 1,
            atom_confidence=args.atom_confidence_loss_weight > 0,
            atom_num_confidence_outputs=len(atom_cutoff) + 1 if isinstance(atom_cutoff, list) else 1,
            affinity_prediction=args.affinity_prediction,
            parallel=args.parallel,
        )
    else:
        cfg = confidence_model_config(
            ns=args.ns, nv=args.nv, all_atoms=args.all_atoms,
            num_confidence_outputs=len(cutoff) + 1 if isinstance(cutoff, list) else 1,
            atom_confidence=args.atom_confidence_loss_weight > 0,
            atom_num_confidence_outputs=len(atom_cutoff) + 1 if isinstance(atom_cutoff, list) else 1,
            affinity_prediction=args.affinity_prediction,
            parallel=args.parallel,
            old_score_model=args.parallel > 1,  # grouped-pose affinity is a legacy-model feature
        )
    model = get_model(cfg)
    example_c = replicate_complex(targets[0].padded, args.batch_size).set_time(0.0, 0.0, 0.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example_c)
    if args.transfer_weights:
        variables, n_copied = transfer_matching_variables(variables, score_vars)
        print(f"transferred {n_copied} matching parameter tensors from the score model")

    ds = cdataset.FilteringDataset(
        targets, cache, cutoff,
        None if args.rmsd_prediction else args.rmsd_classification_upper,
        balance=not args.no_balance and not isinstance(cutoff, list),
        rmsd_prediction=args.rmsd_prediction,
        atom_label_cutoff=atom_cutoff, trajectory_sampling=args.trajectory_sampling,
        affinities=affinities, parallel=args.parallel,
    )
    val_ds = cdataset.FilteringDataset(
        val_targets, cache, cutoff, None, balance=False,
        rmsd_prediction=args.rmsd_prediction,
        atom_label_cutoff=atom_cutoff, trajectory_sampling=args.trajectory_sampling,
        affinities=affinities, parallel=args.parallel,
    )
    print("train set:", ds.statistics())

    if args.test:
        # evaluation-only: confidence accuracy along the reverse-diffusion
        # trajectory, step 0..T (reference confidence_train.py:451-486)
        import json

        example_c = replicate_complex(val_targets[0].padded, 1).set_time(0.0, 0.0, 0.0)
        cmodel, _, cvars = load_or_init_model(args.workdir, args.ckpt, example_c, cfg)
        key, k = jax.random.split(key)
        sweep = ctrain.trajectory_sweep(
            cmodel, cvars, score_model, score_vars, val_targets, score_cfg, k,
            inference_steps=args.inference_steps, samples=args.samples_per_complex,
        )
        out = os.path.join(args.workdir, "trajectory_sweep.json")
        with open(out, "w") as f:
            json.dump(sweep, f, indent=1)
        for row in sweep:
            print(f"step {row['step']:3d}: acc {row['accuracy']:.3f}  "
                  f"mean_rmsd {row['mean_rmsd']:.2f}  mean_score {row['mean_score']:.3f}")
        print("wrote", out)
        return sweep

    tcfg = TrainConfig(lr=args.lr, batch_size=args.batch_size)
    state, history = ctrain.train_confidence(
        model, variables, ds, cache, tcfg, args.n_epochs, args.batches_per_epoch,
        key, val_dataset=val_ds, val_cache=cache, rmsd_prediction=args.rmsd_prediction,
        confidence_loss_weight=args.confidence_loss_weight,
        atom_confidence_loss_weight=args.atom_confidence_loss_weight,
        affinity_prediction=args.affinity_prediction,
        affinity_loss_weight=args.affinity_loss_weight,
        parallel=args.parallel,
    )

    save_yaml(cfg, os.path.join(args.workdir, checkpoints.CONFIG_NAME))
    v = dict(variables)
    v["params"] = state.params
    v["batch_stats"] = state.batch_stats
    checkpoints.save_params(os.path.join(args.workdir, "last_model.msgpack"), v)
    v["params"] = state.ema_params
    checkpoints.save_params(os.path.join(args.workdir, "ema_model.msgpack"), v)
    with open(os.path.join(args.workdir, "history.pkl"), "wb") as f:
        pickle.dump(history, f)
    print("saved confidence model to", args.workdir)
    return state, history


if __name__ == "__main__":
    main()
