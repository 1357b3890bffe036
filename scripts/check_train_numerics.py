"""TPU bf16 numerics smoke for the fused TRAINING path.

The grad-parity tests pin the custom_vjp ops against jax.grad of the XLA
path at f32/interpret; this script checks the REAL-TPU bf16 pipeline:
full score-model loss gradients with CBT_FUSED_TRAIN=auto vs =0 on the
same batch/keys, reporting per-tensor cosine similarity and relative-norm
ratios (bf16 forwards differ in rounding, so exact equality is not the
bar — directional agreement is).

Writes docs/artifacts/train_numerics_tpu.json. Exit code 1 if any
parameter gradient's cosine similarity drops below 0.97.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "artifacts", "train_numerics_tpu.json")


def _child():
    import jax

    from confidence_bootstrapping_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax_compilation"))

    from confidence_bootstrapping_tpu.config import ScoreModelConfig, TrainConfig
    from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
    from confidence_bootstrapping_tpu.train import train_loop
    from confidence_bootstrapping_tpu.train.diffusion import apply_noise
    from confidence_bootstrapping_tpu.train.losses import score_matching_loss
    from bench_train import _load_1a0q  # noqa: E402

    cfg = ScoreModelConfig(lm_embedding_dim=0, dropout=0.0)  # dropout off: same rng-free fwd
    batch = _load_1a0q(False, 4, 0)
    model = TensorProductScoreModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tcfg = TrainConfig()
    noised, targets = apply_noise(batch, jax.random.PRNGKey(1), cfg.sigma, tcfg, cfg.no_torsion)

    @jax.jit
    def grads(params):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                noised, deterministic=False, use_running_average=False,
                rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
            )
            lb = score_matching_loss(out.tr_pred, out.rot_pred, out.tor_pred, targets, noised,
                                     cfg.sigma, tcfg.tr_weight, tcfg.rot_weight, tcfg.tor_weight,
                                     cfg.no_torsion)
            return lb.loss
        return jax.value_and_grad(loss_fn)(variables["params"])

    loss, g = grads(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(g)
    # dump raw grads to npz for the parent to compare
    np.savez(os.environ["CBT_NUM_OUT"],
             **{jax.tree_util.keystr(p): np.asarray(l) for p, l in flat}, __loss=float(loss))
    print(json.dumps({"loss": float(loss), "n_tensors": len(flat)}))


def main():
    if os.environ.get("CBT_NUM_CHILD"):
        _child()
        return
    res = {}
    files = {}
    for fused in ("0", "auto"):
        f = f"/tmp/train_grads_{fused}.npz"
        env = dict(os.environ, CBT_NUM_CHILD="1", CBT_FUSED_TRAIN=fused, CBT_NUM_OUT=f)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                           capture_output=True, text=True, timeout=3000)
        if r.returncode != 0:
            print(r.stderr[-3000:], file=sys.stderr)
            sys.exit(1)
        files[fused] = f
    a = np.load(files["0"])
    b = np.load(files["auto"])
    worst = 1.0
    rows = {}
    for k in a.files:
        if k == "__loss":
            continue
        ga, gb = a[k].ravel().astype(np.float64), b[k].ravel().astype(np.float64)
        na, nb = np.linalg.norm(ga), np.linalg.norm(gb)
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(ga @ gb / max(na * nb, 1e-30))
        rows[k] = {"cos": round(cos, 4), "norm_ratio": round(float(nb / max(na, 1e-30)), 3)}
        worst = min(worst, cos)
    art = {"loss_xla": float(a["__loss"]), "loss_fused": float(b["__loss"]),
           "worst_cos": round(worst, 4),
           "n_tensors": len(rows),
           "worst_10": dict(sorted(rows.items(), key=lambda kv: kv[1]["cos"])[:10])}
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump(art, f, indent=2)
    print(json.dumps({k: art[k] for k in ("loss_xla", "loss_fused", "worst_cos")}))
    sys.exit(0 if worst >= 0.97 else 1)


if __name__ == "__main__":
    main()
