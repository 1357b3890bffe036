"""Reference-checkpoint conversion CLI.

Takes a reference ``.pt`` checkpoint (raw ``state_dict``, a
``{epoch, model, optimizer, ema_weights}`` bundle, or a DataParallel
``module.``-prefixed dict — the three layouts the reference writes,
train.py:145-150 / finetune_train.py:318-323) plus its
``model_parameters.yml`` argparse manifest, and emits one of OUR model
directories: ``model_config.yml`` + ``<name>.msgpack`` that every CLI
(``dock``, ``infer``, ``finetune``, ...) loads via ``load_or_init_model``.

    python -m confidence_bootstrapping_tpu.cli.convert \
        --checkpoint workdir/pretrained_score/best_ema_inference_epoch_model.pt \
        --model_parameters workdir/pretrained_score/model_parameters.yml \
        --out_dir workdir/converted_score

The weight-layout mapping (e3nn TP weight grouping, BatchNorm stat
splitting, Linear transposes) lives in ``models/convert.py`` and is
round-trip tested in tests/test_convert.py.
"""

from __future__ import annotations

import argparse
import os
import pickle


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help="reference .pt (or pickled numpy state dict)")
    p.add_argument("--model_parameters", default=None,
                   help="model_parameters.yml; defaults to the one next to the checkpoint")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--out_name", default="last_model", help="output checkpoint name (<name>.msgpack)")
    p.add_argument("--use_ema", action="store_true",
                   help="convert the bundle's ema_weights instead of the live model weights")
    return p


def load_reference_checkpoint(path: str):
    """Load a .pt via torch when available, falling back to plain pickle
    (works for checkpoints re-saved as pickled numpy dicts)."""
    try:
        import torch

        return torch.load(path, map_location="cpu", weights_only=False)
    except ImportError:
        with open(path, "rb") as f:
            return pickle.load(f)


def main(argv=None):
    import jax
    import yaml

    from ..models import convert as convert_mod
    from ..models.factory import config_from_reference_manifest
    from ..train import checkpoints

    args = get_parser().parse_args(argv)
    manifest_path = args.model_parameters or os.path.join(os.path.dirname(args.checkpoint), "model_parameters.yml")
    with open(manifest_path) as f:
        manifest = yaml.safe_load(f) or {}
    cfg = config_from_reference_manifest(manifest)

    obj = load_reference_checkpoint(args.checkpoint)
    if args.use_ema:
        if not (isinstance(obj, dict) and "ema_weights" in obj):
            raise SystemExit("--use_ema requires a {model, ema_weights, ...} bundle checkpoint")
        # reference ExponentialMovingAverage stores shadow_params as a flat
        # list in parameters() order (utils/utils.py:310-392); rebuild the
        # state dict by zipping with the model keys
        sd = convert_mod.normalize_state_dict(obj)
        ema = obj["ema_weights"]
        shadow = ema["shadow_params"] if isinstance(ema, dict) else ema
        keys = list(sd)
        if len(shadow) != len(keys):
            # buffers (BN running stats) are not in parameters(); replace
            # only the leading len(shadow) non-buffer entries
            param_keys = [k for k in keys if not k.endswith(("running_mean", "running_var", "num_batches_tracked"))]
            if len(shadow) != len(param_keys):
                raise SystemExit(
                    f"ema_weights has {len(shadow)} tensors but the model has "
                    f"{len(param_keys)} parameters - cannot align"
                )
            keys = param_keys
        import numpy as np

        for k, v in zip(keys, shadow):
            sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        variables = convert_mod.convert_state_dict(sd, cfg)
    else:
        variables = convert_mod.convert_state_dict(obj, cfg)

    os.makedirs(args.out_dir, exist_ok=True)
    from ..config import save_yaml

    save_yaml(cfg, os.path.join(args.out_dir, checkpoints.CONFIG_NAME))
    checkpoints.save_params(os.path.join(args.out_dir, f"{args.out_name}.msgpack"), variables)
    n = len(jax.tree.leaves(variables))
    print(f"converted {args.checkpoint} -> {args.out_dir}/{args.out_name}.msgpack ({n} tensors)")
    return variables


if __name__ == "__main__":
    main()
