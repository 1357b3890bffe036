"""TPU numerics for the fused TRAINING path — two well-conditioned checks.

Round-4 finding (docs/PERF_NOTES.md "Training numerics: what is checkable"):
the first version of this script compared full-model gradient DIRECTIONS
between the fused (CBT_FUSED_TRAIN=auto) and XLA (=0) paths at random init
and reported worst cos -0.37 — but the criterion, not the kernels, was at
fault. Measured on the same 1a0q batch: the pure-XLA TPU gradient has
cos 0.04 against the CPU f32 gradient (bf16 forward rounding alone
decorrelates small early-layer gradients through six conv layers at random
init), two independent TPU paths agree with each other at 0.997, the noised
input batch is bit-identical across backends, and the Pallas backward
matches the chunked-XLA backward per-output. Gradient direction of a deep
equivariant net at random init is chaotically sensitive to sub-percent
forward perturbations; it cannot distinguish a broken backward from benign
rounding. What CAN be asserted tightly, and what this script now checks on
the real TPU:

  A. **Per-op backward parity**: jax.vjp of the SAME fused training op
     (``ops/pallas/tpconv_train.py``) with the Pallas backward kernel
     (CBT_PALLAS_BWD=auto) vs the chunked-XLA scan backward (=0), identical
     inputs, production irreps specs (CG trunk lmax=1, torsion head,
     all-atom trunk lmax=2). Gate: cos >= 0.995 and grad norms within 3%
     for every input/parameter cotangent.

  B. **Training-trajectory equivalence**: N Adam steps of the full CG score
     model on the 1a0q batch with identical init/keys/data under
     CBT_FUSED_TRAIN=0 vs auto. The round-4 version gated descent on the
     LAST per-step training loss vs the first — ill-conditioned, because
     each step draws fresh diffusion times/noise so single-step losses have
     ~15% spread (the committed r4 artifact failed that gate on the fused
     path by exactly such a draw while the trajectories visibly agreed).
     A single FIXED noised eval batch is ill-conditioned too: as the model
     converges toward the EXPECTED score field, the loss on one specific
     draw is non-monotonic (measured: both paths' single-draw eval rose
     over the last ~15 of 30 steps while training losses descended).
     Descent is therefore measured on the eval loss AVERAGED over 8 fixed
     noise draws (a low-variance estimate of E[loss]) over a 150-step
     horizon. Gate: the mean-draw eval loss drops >=10% for BOTH paths,
     and the two paths' converged eval losses agree within 10%. This is
     the product claim — training through the fused kernels converges like
     the XLA path (reference models/tensor_layers.py:120-217 uses one code
     path for train and eval).

Writes docs/artifacts/train_numerics_tpu.json; exit 1 on any gate failure.
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

TRAJ_STEPS = int(os.environ.get("CBT_NUM_TRAJ_STEPS", 150))
TRAJ_B = int(os.environ.get("CBT_NUM_TRAJ_B", 16))
TRAJ_EVAL_DRAWS = int(os.environ.get("CBT_NUM_EVAL_DRAWS", 8))
TRAJ_EVAL_EVERY = int(os.environ.get("CBT_NUM_EVAL_EVERY", 5))


def _specs():
    """Production irreps specs: (name, irin, irsh, irout, with_dmask)."""
    from confidence_bootstrapping_tpu.config import ScoreModelConfig
    from confidence_bootstrapping_tpu.models.score_model import get_irrep_seq
    from confidence_bootstrapping_tpu.ops.irreps import FullTensorProduct

    c = ScoreModelConfig(lm_embedding_dim=0)
    trunk = get_irrep_seq(c.ns, c.nv, c.use_second_order_repr, c.reduce_pseudoscalars)[3]
    tor_sh = str(FullTensorProduct("1x0e + 1x1o", "1x2e").irreps_out)
    cc = ScoreModelConfig(ns=24, nv=6, sh_lmax=2, all_atoms=True, confidence_mode=True)
    aa_trunk = get_irrep_seq(cc.ns, cc.nv, cc.use_second_order_repr, cc.reduce_pseudoscalars)[3]
    return [
        ("cg_trunk_l1", trunk, "1x0e + 1x1o", trunk, True),
        ("torsion_head", trunk, tor_sh, f"{c.ns}x0o + {c.ns}x0e", False),
        ("aa_trunk_l2", aa_trunk, "1x0e + 1x1o + 1x2e", aa_trunk, False),
    ]


def _child_op():
    """VJP of each production op under the current CBT_PALLAS_BWD; dump npz."""
    import jax
    import jax.numpy as jnp

    from confidence_bootstrapping_tpu.ops.irreps import Irreps, WeightedTensorProduct
    from confidence_bootstrapping_tpu.ops.pallas import tpconv_train

    M, K, H = 1024, 16, 128
    out = {}
    for name, irin, irsh, irout, with_dmask in _specs():
        tp = WeightedTensorProduct(irin, irsh, irout)
        Din, Dsh, Dout = tp.irreps_in.dim, tp.irreps_sh.dim, tp.irreps_out.dim
        Fe = 96
        rng = np.random.RandomState(7)
        edge_attr = jnp.asarray(rng.randn(M, K, Fe).astype(np.float32))
        sender = jnp.asarray(rng.randn(M, K, Din).astype(np.float32))
        sh = jnp.asarray(rng.randn(M, K, Dsh).astype(np.float32))
        mask = jnp.asarray((rng.rand(M, K) > 0.15).astype(np.float32))
        dmask = (jnp.asarray((rng.rand(M, K, 1) > 0.1).astype(np.float32)) / 0.9
                 if with_dmask else None)
        w1 = jnp.asarray((rng.randn(Fe, H) / np.sqrt(Fe)).astype(np.float32))
        b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
        nw = tp.weight_numel
        w2 = jnp.asarray((rng.randn(H, nw) / np.sqrt(H)).astype(np.float32))
        b2 = jnp.asarray(rng.randn(nw).astype(np.float32) * 0.1)
        cot = jnp.asarray(rng.randn(M, Dout).astype(np.float32))

        def f(ea, x, s, W1, B1, W2, B2):
            return tpconv_train.fused_tpconv_train(
                ea, x, s, mask, W1, B1, W2, B2, irin, irsh, irout,
                dmask=dmask, sum_k=True)

        y, vjp = jax.vjp(f, edge_attr, sender, sh, w1, b1, w2, b2)
        grads = vjp(cot)
        out[f"{name}/out"] = np.asarray(y)
        for i, g in enumerate(grads):
            out[f"{name}/g{i}"] = np.asarray(g)
    np.savez(os.environ["CBT_NUM_OUT"], **out)
    print(json.dumps({"mode": "op", "pallas_bwd": os.environ.get("CBT_PALLAS_BWD"),
                      "n": len(out)}))


def _child_traj():
    """N train steps of the CG score model under the current CBT_FUSED_TRAIN."""
    import jax

    from confidence_bootstrapping_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax_compilation"))

    from bench_train import _load_1a0q  # noqa: E402
    from confidence_bootstrapping_tpu.config import ScoreModelConfig, TrainConfig
    from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
    from confidence_bootstrapping_tpu.train import train_loop

    cfg = ScoreModelConfig(lm_embedding_dim=0)
    batch = _load_1a0q(False, TRAJ_B, 0)
    model = TensorProductScoreModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tcfg = TrainConfig(lr=1e-3)
    state = train_loop.init_train_state(variables, tcfg)
    step = train_loop.make_train_step(model, cfg, tcfg)
    # fixed-noise eval batch: one PRNG key -> one deterministic noised batch,
    # scored with the deterministic eval path after every step. This is the
    # descent signal; per-step TRAINING losses (fresh noise each step) are
    # recorded for the agreement diagnostics only.
    # batch-stats eval: B identical poses of one complex degenerate the BN
    # running-variance EMA (near-zero batch variance in some channels), and
    # running-stats eval then spikes to ~1e16 loss on a HEALTHY model — see
    # make_eval_step's docstring. Batch-stats mode matches what the training
    # loss itself sees and is well-conditioned here.
    eval_step = train_loop.make_eval_step(model, cfg, tcfg, use_running_average=False)
    # Round-5 correction: a SINGLE fixed noise draw is itself ill-conditioned
    # — as the model converges toward the EXPECTED score field, the loss on
    # one specific draw is non-monotonic (the r5 first run showed both paths'
    # single-draw eval rising over the last ~15 steps while training losses
    # kept descending). The descent signal is therefore the eval loss
    # AVERAGED over TRAJ_EVAL_DRAWS fixed keys (a low-variance estimate of
    # E[loss]), sampled every TRAJ_EVAL_EVERY steps.
    eks = [jax.random.PRNGKey(42 + 7 * j) for j in range(TRAJ_EVAL_DRAWS)]

    def mean_eval(st):
        return float(np.mean([float(eval_step(st, batch, k)["loss"]) for k in eks]))

    losses, evals = [], [mean_eval(state)]
    for i in range(TRAJ_STEPS):
        state, metrics = step(state, batch, jax.random.PRNGKey(1000 + i))
        losses.append(float(metrics["loss"]))
        if (i + 1) % TRAJ_EVAL_EVERY == 0 or i == TRAJ_STEPS - 1:
            evals.append(mean_eval(state))
    print(json.dumps({"mode": "traj", "fused": os.environ.get("CBT_FUSED_TRAIN"),
                      "losses": losses, "evals": evals}))


def _run_child(env_extra, timeout=3600):
    env = dict(os.environ, **env_extra)
    r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                       capture_output=True, text=True, timeout=timeout)
    line = next((ln for ln in reversed(r.stdout.splitlines()) if ln.startswith("{")), None)
    if r.returncode != 0 or line is None:
        print(r.stderr[-4000:], file=sys.stderr)
        sys.exit(1)
    return json.loads(line)


def main():
    mode = os.environ.get("CBT_NUM_MODE")
    if mode == "op":
        _child_op()
        return
    if mode == "traj":
        _child_traj()
        return

    ok = True
    art = {"criterion_note": (
        "full-model grad-direction cosine across paths/backends at random init "
        "is ill-conditioned (pure-XLA TPU vs CPU f32: cos 0.04 on the same "
        "bit-identical batch) and is NOT a gate; see docs/PERF_NOTES.md")}

    # ---- A. per-op backward parity (Pallas kernel vs chunked-XLA scan) ----
    files = {}
    for setting in ("0", "auto"):
        f = f"/tmp/opgrads_{setting}.npz"
        _run_child({"CBT_NUM_MODE": "op", "CBT_PALLAS_BWD": setting, "CBT_NUM_OUT": f})
        files[setting] = f
    a, b = np.load(files["0"]), np.load(files["auto"])
    parity = {}
    for k in a.files:
        ga, gb = a[k].ravel().astype(np.float64), b[k].ravel().astype(np.float64)
        na, nb = np.linalg.norm(ga), np.linalg.norm(gb)
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(ga @ gb / max(na * nb, 1e-30))
        ratio = float(nb / max(na, 1e-30))
        spec = k.split("/")[0]
        row = parity.setdefault(spec, {"min_cos": 1.0, "worst_norm_ratio": 1.0, "n": 0})
        row["min_cos"] = round(min(row["min_cos"], cos), 5)
        if abs(np.log(max(ratio, 1e-30))) > abs(np.log(max(row["worst_norm_ratio"], 1e-30))):
            row["worst_norm_ratio"] = round(ratio, 4)
        row["n"] += 1
    for spec, row in parity.items():
        if row["min_cos"] < 0.995 or not (0.97 <= row["worst_norm_ratio"] <= 1.03):
            ok = False
            row["FAIL"] = True
    art["op_backward_parity"] = parity
    print(json.dumps({"op_backward_parity": parity}), flush=True)

    # ---- B. training-trajectory equivalence (fused vs XLA full path) ----
    traj = {}
    for setting in ("0", "auto"):
        traj[setting] = _run_child({"CBT_NUM_MODE": "traj", "CBT_FUSED_TRAIN": setting})
    lx, lf = traj["0"]["losses"], traj["auto"]["losses"]
    ex, ef = traj["0"]["evals"], traj["auto"]["evals"]
    rel = [abs(x - f) / max(abs(x), 1e-9) for x, f in zip(lx, lf)]
    ex_tail = float(np.mean(ex[-2:]))
    ef_tail = float(np.mean(ef[-2:]))
    eval_rel_final = abs(ex_tail - ef_tail) / max(abs(ex_tail), 1e-9)
    tj = {
        "steps": TRAJ_STEPS, "b": TRAJ_B,
        "eval_draws": TRAJ_EVAL_DRAWS, "eval_every": TRAJ_EVAL_EVERY,
        "eval_first_xla": round(ex[0], 4), "eval_first_fused": round(ef[0], 4),
        "eval_tail_xla": round(ex_tail, 4), "eval_tail_fused": round(ef_tail, 4),
        "eval_rel_diff_tail": round(eval_rel_final, 4),
        "mean_train_rel_diff": round(float(np.mean(rel)), 4),
        "evals_xla": [round(v, 4) for v in ex], "evals_fused": [round(v, 4) for v in ef],
        "losses_xla": [round(v, 4) for v in lx], "losses_fused": [round(v, 4) for v in lf],
    }
    # Gates. (1) descent floor: the mean-over-draws eval loss must drop at
    # least 10% over TRAJ_STEPS Adam steps for BOTH paths (a broken backward
    # plateaus or climbs); (2) equivalence: the fused path's converged eval
    # loss must be within 10% of the XLA path's — "training through the
    # fused kernels converges like the XLA path" is the product claim
    # (reference models/tensor_layers.py:120-217: one code path for both).
    descends = ex_tail < 0.90 * ex[0] and ef_tail < 0.90 * ef[0]
    agrees = eval_rel_final < 0.10
    if not (descends and agrees):
        ok = False
        tj["FAIL"] = {"descends": descends, "agrees": agrees}
    art["trajectory"] = tj

    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as fh:
        json.dump(art, fh, indent=2)
    print(json.dumps({"ok": ok,
                      "worst_op_cos": min(r["min_cos"] for r in parity.values()),
                      "eval_rel_diff_tail": tj["eval_rel_diff_tail"]}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
