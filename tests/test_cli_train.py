"""Train CLI smoke: end-to-end epochs, checkpointing, restart with LR override."""

import json
import os

import numpy as np
import yaml

from test_datasets import _write_toy_complex_dir


def test_train_cli_and_restart_lr(tmp_path):
    from confidence_bootstrapping_tpu.cli import train as cli
    from confidence_bootstrapping_tpu.train import checkpoints as ckpt_mod

    data = tmp_path / "data"
    _write_toy_complex_dir(str(data), "aaaa", seed=0, n_res=10)
    cfgfile = tmp_path / "tiny.yml"
    cfgfile.write_text(yaml.dump(dict(ns=8, nv=2, num_conv_layers=1,
                                      num_prot_emb_layers=1, lm_embedding_dim=0, dropout=0.0)))
    wd = str(tmp_path / "wd")
    base = [
        "--data_dir", str(data), "--cache_path", str(tmp_path / "cache"),
        "--workdir", wd, "--config", str(cfgfile),
        "--batch_size", "2", "--val_inference_freq", "0",
    ]
    cli.main(base + ["--n_epochs", "1"])
    assert os.path.exists(os.path.join(wd, "last_model.msgpack"))

    # restart from the checkpoint with an LR override (reference train.py:197)
    wd2 = str(tmp_path / "wd2")
    cli.main([
        "--data_dir", str(data), "--cache_path", str(tmp_path / "cache"),
        "--workdir", wd2, "--config", str(cfgfile),
        "--batch_size", "2", "--val_inference_freq", "0",
        "--n_epochs", "2", "--restart_dir", wd, "--restart_lr", "1e-5",
    ])
    assert os.path.exists(os.path.join(wd2, "last_model.msgpack"))
