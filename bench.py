"""Benchmark: poses/sec/chip at 20 denoising steps (BASELINE.json metric).

Replicates the reference's measurement hook (per-complex sampling wall time,
inference.py:450,495) on the 1a0q example complex: batch of poses, 20-step
reverse diffusion with the full pretrained-score architecture, warm-compiled,
best of 3 timed runs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu", ...}.

vs_baseline anchor: the PyTorch reference on an A100 samples roughly 2
poses/s at 20 steps with batched inference (DiffDock-L-class models report
~10-20 s per complex for tens of poses; BASELINE.json publishes no number,
so this documented estimate is the denominator and the driver-stated target
is >= 5x it).

Sensitivity of the conclusion to that estimate: at ~40 measured poses/s the
>= 5x target still holds even if the true A100 figure were 4x the estimate
(8 poses/s -> 5.0x); the reference would have to sustain > 8 poses/s at 20
steps to invalidate the claim, which is outside every published
DiffDock-L-class timing we are aware of. The harness has no CUDA device, so
the reference cannot be measured in this environment; the JSON's
"baseline_estimated": true flags the denominator as an estimate.

MFU: a conservative LOWER bound — only the analytically-counted MXU FLOPs of
the dominant trunk kernel (4x conv_rec per denoising step; the per-program
MAC budget is derived in docs/PERF_NOTES.md "v4 FLOP floor": 1.16 G-MAC x
(B x N/tile_n) programs = 4.76 bf16 TFLOP/step at B=32) divided by
wall-time x chip peak. Everything else the step executes (ligand-side
kernels, MLPs, SVD, copies) is excluded from the numerator, so true MFU is
strictly higher.

Operational design (round-2 postmortem): the axon TPU tunnel can be down at
driver time, and a hung in-process `jax.devices()` is unrecoverable — so the
probe loop has a STRICT <=50 s budget, the measurement itself runs in a
subprocess with its own timeout, and if no TPU appears the measurement falls
back to the CPU backend (clearly labelled `"backend": "cpu"`) so the driver
always records a parseable result instead of rc=124/null.
"""

import json
import os
import subprocess
import sys
import time

A100_REFERENCE_POSES_PER_SEC = 2.0

# docs/PERF_NOTES.md "v4 FLOP floor": per denoising step at batch B the four
# trunk conv_rec layers execute 4 x 1.16 G-MAC x (B x 512/32) programs.
CONV_REC_TFLOP_PER_STEP_AT_B32 = 4.76

# bf16 peak TFLOP/s per chip by device_kind substring (first match wins).
PEAK_TFLOPS = [
    ("v6", 918.0),
    ("v5p", 459.0),
    ("v5", 197.0),  # v5e / "TPU v5 lite"
    ("v4", 275.0),
]


def _probe_backend(attempts: int = 2, probe_timeout: int = 20, delay_s: int = 10) -> bool:
    """Strict-budget TPU probe: <= attempts*probe_timeout + (attempts-1)*delay_s
    (50 s at defaults). Each probe is a SUBPROCESS because a failed/hung
    in-process jax backend init is sticky."""
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d=jax.devices(); assert d[0].platform != 'cpu'"],
                capture_output=True, timeout=probe_timeout,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass  # device discovery hung — the tunnel is down
        if i + 1 < attempts:
            print(f"bench: TPU probe {i + 1}/{attempts} failed; retrying in {delay_s}s",
                  file=sys.stderr)
            time.sleep(delay_s)
    return False


def _measure():
    """Child process: run the measurement on whatever backend JAX_PLATFORMS
    selects and print the result JSON line."""
    import jax

    if os.environ.get("CBT_BENCH_FORCE_CPU"):
        # the axon sitecustomize force-sets JAX_PLATFORMS=axon; override it
        # before any backend init or the child hangs on tunnel discovery
        jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F401

    from confidence_bootstrapping_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax_compilation"))

    from confidence_bootstrapping_tpu.config import SamplerConfig, ScoreModelConfig
    from confidence_bootstrapping_tpu.data import featurize, mol_io
    from confidence_bootstrapping_tpu.data.complex_graph import (
        pad_complex, pick_bucket, replicate_complex)
    from confidence_bootstrapping_tpu.models.score_model import TensorProductScoreModel
    from confidence_bootstrapping_tpu.sampler import sampling

    dev = jax.devices()[0]
    backend = dev.platform
    n_poses = int(os.environ.get("BENCH_POSES", 32 if backend != "cpu" else 8))
    steps = int(os.environ.get("BENCH_STEPS", 20))

    # The ESM-sized architecture is the DEFAULT headline on TPU (both
    # pretrained manifests require 1280-d receptor embeddings, reference
    # models/score_model.py:98-99): random embeddings stand in for real ESM
    # features (identical compute/memory shape). BENCH_LM_DIM=0 measures the
    # no-ESM variant (the r1-r4 headline); the parent reports both.
    lm_dim = int(os.environ.get("BENCH_LM_DIM", 1280 if backend != "cpu" else 0))
    ref = "/root/reference/data/1a0q"
    if os.path.isdir(ref):
        import numpy as np

        mol = mol_io.read_molecule(f"{ref}/1a0q_ligand.sdf")
        st = mol_io.parse_pdb(f"{ref}/1a0q_protein_processed.pdb")
        hc = featurize.build_host_complex("1a0q", mol, st)
        if lm_dim:
            hc = hc._replace(rec_lm=np.random.RandomState(0).randn(len(hc.rec_f), lm_dim).astype(np.float32))
        bucket = pick_bucket(len(hc.lig_f), len(hc.lig_edge_src), len(hc.tor_src), len(hc.rec_f))
        padded = pad_complex(hc, bucket, lm_dim=lm_dim)
        batch = replicate_complex(padded, n_poses)
    else:  # fallback: synthetic complex of the same scale
        from __graft_entry__ import _synthetic_batch

        batch = _synthetic_batch(B=n_poses, L=24, E=48, R=16, N=512, lm_dim=lm_dim)

    cfg = ScoreModelConfig(lm_embedding_dim=lm_dim)
    model = TensorProductScoreModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    # phased receptor compaction (sampler/sampling.py): from step 8
    # (sigma_tr ~ 2.3, cross cutoff ~ 32 A incl. margin) the receptor
    # bucket shrinks to the 256 residues nearest any pose's ligand.
    # HLO-profiled on v5e: conv_rec is 2.11 ms/step/layer at N=256 vs
    # 6.27 at N=512, while an N=416 "trim" phase showed NO gain (the v4
    # kernel's per-program cost is flat below powers of two) — so no
    # step-0 trim. BENCH_PHASES=0 restores the single-phase path.
    phases = {}
    N = batch.rec_pos.shape[1]
    if os.environ.get("BENCH_PHASES", "1") == "1" and backend != "cpu":
        # BENCH_PLAN="8:256,14:128" overrides for phase-plan experiments.
        # Default = the round-4 sweep's best (59.4 poses/s vs 50.3 at 8:256;
        # docs/PERF_NOTES.md round-4 sweep + scripts/phase_parity.py
        # distribution checks)
        plan_s = os.environ.get("BENCH_PLAN", "6:256,12:128")
        plan = [(int(p.split(":")[0]), int(p.split(":")[1])) for p in plan_s.split(",")]
        plan = [(s, c) for s, c in plan if c < N]
        if plan:
            phases = dict(rec_phase_steps=tuple(s for s, _ in plan),
                          rec_phase_caps=tuple(c for _, c in plan))
    sampler_cfg = SamplerConfig(inference_steps=steps, **phases)

    key = jax.random.PRNGKey(0)
    b0 = sampling.randomize_position(batch, key, cfg.sigma.tr_sigma_max)

    # warmup/compile
    final, _ = sampling.sample_jit(model, variables, b0, key, cfg, sampler_cfg)
    jax.block_until_ready(final.lig_pos)

    if os.environ.get("BENCH_PROFILE"):
        with jax.profiler.trace(os.environ.get("BENCH_PROFILE_DIR", "/tmp/cbt_trace")):
            final, _ = sampling.sample_jit(model, variables, b0, jax.random.PRNGKey(9), cfg, sampler_cfg)
            jax.block_until_ready(final.lig_pos)

    times = []
    n_runs = 3 if backend != "cpu" else 1  # CPU fallback: one timed run fits the window
    for i in range(n_runs):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        final, _ = sampling.sample_jit(model, variables, b0, k, cfg, sampler_cfg)
        jax.block_until_ready(final.lig_pos)
        times.append(time.perf_counter() - t0)

    dt = min(times)
    poses_per_sec = n_poses / dt

    mfu = None
    if backend != "cpu":
        kind = getattr(dev, "device_kind", "") or ""
        peak = next((p for sub, p in PEAK_TFLOPS if sub in kind.lower().replace(" ", "")), None)
        if peak is None:
            peak = next((p for sub, p in PEAK_TFLOPS if sub in kind.lower()), 197.0)
        # per-step conv_rec FLOPs scale with the phase's receptor bucket
        # (1.16 G-MAC per 32-node program, docs/PERF_NOTES.md); count the
        # actually-executed work so compaction cannot inflate MFU
        bounds = list(phases.get("rec_phase_steps", ())) + [steps]
        caps = list(phases.get("rec_phase_caps", ()))
        node_steps, n_cur, prev = 0, N, 0
        for i, cap in enumerate(caps):
            node_steps += (bounds[i] - prev) * n_cur
            n_cur, prev = cap, bounds[i]
        node_steps += (steps - prev) * n_cur
        run_tflop = CONV_REC_TFLOP_PER_STEP_AT_B32 * (n_poses / 32.0) * (node_steps / (steps * 512.0)) * steps
        mfu = round(run_tflop / dt / peak, 4)

    out = {
        "metric": f"poses/sec/chip at {steps} denoising steps (1a0q, batch {n_poses}, lm_dim {lm_dim})",
        "value": round(poses_per_sec, 3),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / A100_REFERENCE_POSES_PER_SEC, 3),
        "baseline_estimated": True,
        "backend": backend,
        "lm_dim": lm_dim,
        "mfu": mfu,
        "mfu_note": "lower bound: trunk conv_rec MXU FLOPs only (docs/PERF_NOTES.md)",
    }
    print(json.dumps(out))


def main():
    if os.environ.get("CBT_BENCH_CHILD"):
        _measure()
        return

    force_cpu = os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
    tpu_up = (not force_cpu) and _probe_backend()
    env = dict(os.environ, CBT_BENCH_CHILD="1")
    plans = []
    if tpu_up:
        # budget covers a COLD compile of the 20-step scan (~6-8 min when
        # sampler code changed since the cached entry); warm runs take <60 s
        plans.append(("tpu", env, 900))
    cpu_env = dict(env, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="", CBT_BENCH_FORCE_CPU="1")
    plans.append(("cpu", cpu_env, 480))

    for name, child_env, tmo in plans:
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=child_env, capture_output=True, timeout=tmo, text=True)
        except subprocess.TimeoutExpired:
            print(f"bench: {name} measurement timed out after {tmo}s", file=sys.stderr)
            continue
        line = next((ln for ln in reversed(r.stdout.splitlines()) if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            result = json.loads(line)
            if name == "tpu" and "BENCH_LM_DIM" not in os.environ:
                # secondary no-ESM measurement (the r1-r4 headline variant)
                try:
                    r2 = subprocess.run(
                        [sys.executable, os.path.abspath(__file__)],
                        env=dict(child_env, BENCH_LM_DIM="0"),
                        capture_output=True, timeout=tmo, text=True)
                    l2 = next((ln for ln in reversed(r2.stdout.splitlines())
                               if ln.startswith("{")), None)
                    if r2.returncode == 0 and l2:
                        d2 = json.loads(l2)
                        result["value_no_esm"] = d2["value"]
                        result["mfu_no_esm"] = d2["mfu"]
                except subprocess.TimeoutExpired:
                    print("bench: no-ESM secondary measurement timed out", file=sys.stderr)
            print(json.dumps(result))
            return
        print(f"bench: {name} measurement failed rc={r.returncode}\n{r.stderr[-2000:]}",
              file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
