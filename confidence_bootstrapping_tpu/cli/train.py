"""Score-model training CLI (the reference's ``train.py`` capability).

Epoch loop with: jitted DP train steps, masked-stat batch norm, EMA,
validation losses, periodic in-training inference benchmarks (RMSD<2A rates
— the reference's real regression check, utils/training.py:292-373), early
stopping on the inference metric, the best/EMA checkpoint zoo
(train.py:109-150), plateau scheduler, and a persisted model_config.yml.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import jax
import numpy as np
import yaml

from ..config import SamplerConfig, ScoreModelConfig, TrainConfig, from_dict, save_yaml, to_dict
from ..data.complex_graph import replicate_complex
from ..data.dataset import ComplexDataset, discover_dir
from ..eval import rmsd as rmsd_mod
from ..models.factory import get_model
from ..parallel import mesh as meshlib
from ..sampler import sampling
from ..train import checkpoints, train_loop


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", default=None,
                   help="directory of complexes; used for validation (required except --dataset torsional)")
    p.add_argument("--split_train", default=None, help="file with train complex names")
    p.add_argument("--split_val", default=None)
    p.add_argument("--cache_path", default="cache")
    # dataset selection (reference datasets/loader.py:34-129): 'dir' trains on
    # --data_dir; the named modes build PDBBind/MOAD/combined/generalisation
    # (= triple_training: + PDBSidechain) mixtures via construct_loader_entries.
    p.add_argument("--dataset", default="dir",
                   choices=["dir", "pdbbind", "moad", "combined", "generalisation", "torsional"])
    p.add_argument("--torsional_data_dir", default=None,
                   help="dir of small-molecule SDFs for --dataset torsional (QM9-style pretraining)")
    p.add_argument("--pdbbind_dir", default=None)
    p.add_argument("--moad_dir", default=None)
    p.add_argument("--moad_splits_pkl", default=None)
    p.add_argument("--cluster_to_ligands_pkl", default=None)
    p.add_argument("--pdbsidechain_dir", default=None)
    p.add_argument("--add_bootstrapping_dataset", default=None,
                   help="pickle of generated complexes (offline_dataset) mixed into training "
                        "(reference train.py --add_bootstrapping_dataset)")
    p.add_argument("--bootstrapping_temperature", type=float, default=1.0)
    p.add_argument("--workdir", default="workdir/run")
    p.add_argument("--config", default=None, help="yaml overlay for the model config")
    p.add_argument("--n_epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--val_inference_freq", type=int, default=5)
    p.add_argument("--test_sigma_intervals", type=int, default=1,
                   help="bucket validation metrics by N diffusion-time intervals "
                        "(reference --test_sigma_intervals, utils/training.py:242-265)")
    p.add_argument("--inference_secondary_metric", default=None,
                   help="extra inference metric tracked with its own best-EMA checkpoint "
                        "(reference --inference_secondary_metric), e.g. valinf_rmsds_lt5")
    p.add_argument("--save_model_freq", type=int, default=0,
                   help="save an epoch{N}_model snapshot every N epochs (reference --save_model_freq)")
    p.add_argument("--train_inference_freq", type=int, default=0,
                   help="also run the inference benchmark on train complexes every N "
                        "epochs (overfit check; reference --train_inference_freq)")
    p.add_argument("--num_inference_complexes", type=int, default=10)
    p.add_argument("--inference_samples", type=int, default=4)
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--inference_earlystop_patience", type=int, default=30)
    p.add_argument("--restart_dir", default=None, help="resume params+EMA from last_model in this dir")
    p.add_argument("--restart_lr", type=float, default=None,
                   help="override the learning rate after a restart (reference train.py:197)")
    p.add_argument("--pretrain_dir", default=None,
                   help="initialize weights only (fresh optimizer/EMA; reference train.py:208-211)")
    p.add_argument("--warmup_dur", type=int, default=0, help="linear LR warmup epochs (reference lr_start_factor)")
    p.add_argument("--lr_start_factor", type=float, default=1e-3)
    p.add_argument("--layer_warmup", type=int, default=0,
                   help="unfreeze one extra conv layer every N epochs (reference layer_linear_warmup)")
    p.add_argument("--no_matching", action="store_true",
                   help="train on the input SDF geometry instead of conformer-matched "
                        "poses (reference trains with matching on: loader.py:136)")
    p.add_argument("--matching_popsize", type=int, default=20)
    p.add_argument("--matching_maxiter", type=int, default=20)
    p.add_argument("--matching_tries", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--data_parallel", action="store_true", help="shard batches over all local devices")
    p.add_argument("--wandb", action="store_true", help="log to wandb when the package is available")
    p.add_argument("--project", default="cbt_train")
    return p


def _matching_kwargs(args):
    """Conformer-matching dataset kwargs (reference loader.py:136:
    matching = not no_torsion, on by default for training)."""
    return dict(
        matching=not args.no_matching,
        matching_tries=args.matching_tries,
        matching_popsize=args.matching_popsize,
        matching_maxiter=args.matching_maxiter,
    )


def _names(path):
    return open(path).read().split() if path else None


def inference_benchmark(model, variables, dataset, model_cfg, n_complexes, n_samples, steps, key):
    """Mini in-training benchmark: RMSD<2A / <5A rates (inference_epoch_fix).

    RMSD is symmetry-corrected and min-over-ground-truth-poses (the
    reference benchmarks with get_symmetry_rmsd, utils/training.py:292-373)
    — plain RMSD over-penalizes symmetric ligands and multi-pose targets,
    which would bias early stopping."""
    from ..data.complex_graph import pad_complex, pick_bucket

    sampler_cfg = SamplerConfig(inference_steps=steps)
    lm = dataset.lm_dim()
    rmsds = []
    for hc in dataset.complexes[:n_complexes]:
        key, k1, k2 = jax.random.split(key, 3)
        bucket = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f),
                             n_atoms=0 if hc.atom_f is None else len(hc.atom_f),
                             all_atoms=hc.atom_f is not None)
        padded = pad_complex(hc, bucket, lm_dim=lm)
        batch = replicate_complex(padded, n_samples)
        batch = sampling.randomize_position(batch, k1, model_cfg.sigma.tr_sigma_max)
        final, _ = sampling.sample_jit(model, variables, batch, k2, model_cfg, sampler_cfg)
        L = len(hc.lig_f)
        poses = np.asarray(final.lig_pos)[:, :L]
        mol = dataset.mols.get(hc.name)
        ref = rmsd_mod.ground_truth_poses(hc)
        if mol is not None:
            r = rmsd_mod.symmetry_rmsd(ref, poses, mol.atomic_nums, mol.bonds)
        else:  # topology unavailable (synthetic datasets): min-over-poses plain RMSD
            refs = ref[None] if ref.ndim == 2 else ref
            r = np.sqrt(((poses[None] - refs[:, None]) ** 2).sum(-1).mean(-1)).min(0)
        rmsds.append(np.asarray(r).min())  # best-of-N per complex
    rmsds = np.asarray(rmsds)
    return dict(
        valinf_rmsds_lt2=float(np.mean(rmsds < 2)),
        valinf_rmsds_lt5=float(np.mean(rmsds < 5)),
        valinf_mean_rmsd=float(rmsds.mean()),
    )


def main(argv=None):
    from ..runtime import enable_compilation_cache

    enable_compilation_cache()
    args = get_parser().parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    model_cfg = ScoreModelConfig(lm_embedding_dim=0)
    if args.config:
        with open(args.config) as f:
            overlay = yaml.safe_load(f) or {}
        model_cfg = from_dict(ScoreModelConfig, {**to_dict(model_cfg), **overlay})
    tcfg = TrainConfig(lr=args.lr, batch_size=args.batch_size, n_epochs=args.n_epochs)

    torsional_mode = args.dataset == "torsional"
    if not torsional_mode and not args.data_dir:
        raise SystemExit("--data_dir is required (except with --dataset torsional)")
    entries = discover_dir(args.data_dir, _names(args.split_train)) if args.data_dir else []
    if args.limit_complexes:
        entries = entries[: args.limit_complexes]
    if torsional_mode:
        import copy

        from ..data.torsional import TorsionalDataset

        if not args.torsional_data_dir:
            raise SystemExit("--dataset torsional requires --torsional_data_dir")
        train_ds = TorsionalDataset(args.torsional_data_dir, limit=args.limit_complexes)
        model_cfg = from_dict(ScoreModelConfig, {**to_dict(model_cfg), "no_torsion": False, "lm_embedding_dim": 0})
        # hold out 10% of conformers for validation
        k = max(1, len(train_ds) // 10)
        val_ds = copy.copy(train_ds)
        val_ds.complexes = train_ds.complexes[-k:]
        if len(train_ds) > 1:
            train_ds.complexes = train_ds.complexes[:-k]
    elif args.dataset == "dir":
        train_ds = ComplexDataset(entries, cache_dir=args.cache_path, all_atoms=model_cfg.all_atoms,
                                  **_matching_kwargs(args))
        train_ds.print_statistics()
    else:
        from ..data.pdbbind import construct_loader_entries

        train_ds = construct_loader_entries(args, all_atoms=model_cfg.all_atoms, **_matching_kwargs(args))
        for d in train_ds.datasets:
            if hasattr(d, "print_statistics"):
                d.print_statistics()
    if args.add_bootstrapping_dataset:
        from ..bootstrapping.offline_dataset import BootstrappingDataset
        from ..data.pdbbind import CombinedDataset

        with open(args.add_bootstrapping_dataset, "rb") as f:
            kept = pickle.load(f)
        boot = BootstrappingDataset(kept, temperature=args.bootstrapping_temperature, seed=args.seed)
        train_ds = CombinedDataset(train_ds, boot)
        print(f"mixed in {len(boot)} bootstrapped complexes")
    if not torsional_mode:
        val_entries = discover_dir(args.data_dir, _names(args.split_val)) if args.split_val else entries[: max(1, len(entries) // 10)]
        val_ds = ComplexDataset(val_entries, cache_dir=args.cache_path, all_atoms=model_cfg.all_atoms,
                                **_matching_kwargs(args))
    print(f"train {len(train_ds)} complexes, val {len(val_ds)}")

    model = get_model(model_cfg)
    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    example = train_ds.epoch_batches(args.batch_size, np.random.RandomState(0))[0]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)

    if args.pretrain_dir and checkpoints.has_checkpoint(args.pretrain_dir):
        variables = checkpoints.load_params(os.path.join(args.pretrain_dir, "last_model.msgpack"), dict(variables))
        print(f"initialized weights from {args.pretrain_dir}")
    state = train_loop.init_train_state(variables, tcfg)
    start_epoch = 0
    if args.restart_dir:
        restored, ep = checkpoints.load_train_state(args.restart_dir, state)
        if restored is not None:
            state, start_epoch = restored, ep + 1
            print(f"restored full train state (params+opt+EMA) from {args.restart_dir}, resuming at epoch {start_epoch}")
        elif checkpoints.has_checkpoint(args.restart_dir):
            v = dict(variables)
            v = checkpoints.load_params(os.path.join(args.restart_dir, "last_model.msgpack"), v)
            state = state._replace(params=v["params"], batch_stats=v.get("batch_stats", state.batch_stats), ema_params=v["params"])
            print(f"restarted (weights only) from {args.restart_dir}")
        if args.restart_lr is not None:
            # the optimizer's base LR is tcfg.lr; lr_scale multiplies updates
            state = state._replace(lr_scale=jax.numpy.asarray(args.restart_lr / tcfg.lr))
            print(f"restart_lr: effective LR set to {args.restart_lr}")

    if args.data_parallel:
        meshlib.maybe_init_distributed()
    dp_mesh = meshlib.make_mesh() if args.data_parallel else None
    if torsional_mode:
        train_step = train_loop.make_torsional_train_step(model, model_cfg, tcfg)
        eval_step = train_loop.make_torsional_eval_step(model, model_cfg, tcfg)
        args.val_inference_freq = 0  # no pose sampling in torsional pretraining
    else:
        train_step = train_loop.make_train_step(model, model_cfg, tcfg)
        eval_step = train_loop.make_eval_step(model, model_cfg, tcfg)
    scheduler = train_loop.PlateauScheduler(patience=30, factor=0.7)
    save_yaml(model_cfg, os.path.join(args.workdir, checkpoints.CONFIG_NAME))

    def save(name, params):
        v = dict(variables)
        v["params"] = params
        v["batch_stats"] = state.batch_stats
        checkpoints.save_params(os.path.join(args.workdir, f"{name}.msgpack"), v)

    wandb_run = None
    if args.wandb:
        try:
            import wandb

            wandb_run = wandb.init(project=args.project, config=vars(args))
        except Exception as e:
            print(f"wandb unavailable ({type(e).__name__}); continuing without it")

    best_val, best_inf, bad_epochs = np.inf, -np.inf, 0
    best_secondary = -np.inf
    history = []
    for epoch in range(start_epoch, args.n_epochs):
        t0 = time.time()
        batches = train_ds.epoch_batches(args.batch_size, rng)
        if dp_mesh is not None:
            batches = [meshlib.shard_batch(dp_mesh, b) for b in batches]
        if args.warmup_dur and epoch < args.warmup_dur:
            frac = args.lr_start_factor + (1 - args.lr_start_factor) * epoch / args.warmup_dur
            state = state._replace(lr_scale=jax.numpy.asarray(frac))
        elif args.warmup_dur and epoch == args.warmup_dur:
            state = state._replace(lr_scale=jax.numpy.ones(()))
        grad_mask = None
        if args.layer_warmup:
            grad_mask = train_loop.layer_freeze_mask(state.params, epoch // args.layer_warmup)
        key, k = jax.random.split(key)
        state, train_metrics = train_loop.train_epoch(train_step, state, batches, k, grad_mask=grad_mask)

        key, k = jax.random.split(key)
        val_metrics = train_loop.test_epoch(eval_step, state, val_ds.epoch_batches(args.batch_size, rng), k,
                                            intervals=args.test_sigma_intervals)
        entry = dict(epoch=epoch, train=train_metrics, val=val_metrics, wall=time.time() - t0)

        if args.val_inference_freq and (epoch + 1) % args.val_inference_freq == 0:
            v = dict(variables)
            v["params"] = state.ema_params
            v["batch_stats"] = state.batch_stats
            key, k = jax.random.split(key)
            inf = inference_benchmark(
                model, v, val_ds, model_cfg, args.num_inference_complexes,
                args.inference_samples, args.inference_steps, k,
            )
            entry["inference"] = inf
            if (args.train_inference_freq and (epoch + 1) % args.train_inference_freq == 0
                    and hasattr(train_ds, "complexes") and hasattr(train_ds, "mols")):
                # overfit check: the same benchmark on TRAIN complexes
                # (reference utils/parsing.py --train_inference_freq)
                key, k = jax.random.split(key)
                tinf = inference_benchmark(
                    model, v, train_ds, model_cfg, args.num_inference_complexes,
                    args.inference_samples, args.inference_steps, k,
                )
                entry["train_inference"] = {k_.replace("valinf", "traininf"): v_ for k_, v_ in tinf.items()}
            if inf["valinf_rmsds_lt2"] > best_inf:
                best_inf = inf["valinf_rmsds_lt2"]
                save("best_inference_epoch_model", state.params)
                save("best_ema_inference_epoch_model", state.ema_params)
                bad_epochs = 0
            else:
                bad_epochs += 1
            if args.inference_secondary_metric and args.inference_secondary_metric in inf:
                # secondary-metric EMA checkpoint (reference train.py:119-123)
                sv = inf[args.inference_secondary_metric]
                if sv > best_secondary:
                    best_secondary = sv
                    save("best_ema_secondary_epoch_model", state.ema_params)

        if val_metrics["loss"] < best_val:
            best_val = val_metrics["loss"]
            save("best_model", state.params)
            save("best_ema_model", state.ema_params)
        if args.save_model_freq and (epoch + 1) % args.save_model_freq == 0:
            # periodic epoch snapshots (reference --save_model_freq)
            save(f"epoch{epoch}_model", state.params)
        state = scheduler.step(state, val_metrics["loss"])
        save("last_model", state.params)
        checkpoints.save_train_state(args.workdir, state, epoch)
        save("last_ema_model", state.ema_params)
        history.append(entry)
        if wandb_run is not None:
            flat = {f"train_{k}": v for k, v in train_metrics.items()}
            flat.update({f"val_{k}": v for k, v in val_metrics.items()})
            flat.update(entry.get("inference", {}))
            wandb_run.log(flat, step=epoch)
        with open(os.path.join(args.workdir, "history.pkl"), "wb") as f:
            pickle.dump(history, f)
        print(f"epoch {epoch}: train loss {train_metrics['loss']:.4f} val {val_metrics['loss']:.4f} "
              f"({entry['wall']:.1f}s)" + (f" inf<2A {entry['inference']['valinf_rmsds_lt2']:.3f}" if "inference" in entry else ""))

        if bad_epochs * args.val_inference_freq > args.inference_earlystop_patience:
            print("early stopping on inference metric")
            break
    return state, history


if __name__ == "__main__":
    main()
