"""Golden tests for the manifold-math core.

Goldens are computed here with independent numpy/scipy implementations of the
same closed forms the reference uses (IGSO(3) character expansion, wrapped
normal series, Kabsch via scipy, torsion rotations via scipy Rotation) —
not by importing reference code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R
from scipy.stats import beta as scipy_beta

from confidence_bootstrapping_tpu.ops import so3, torus, geometry, torsion, schedules, poses


# ---------------------------------------------------------------- SO(3)


def _igso3_expansion_np(omega, eps, L=2000):
    p = 0.0
    for l in range(L):
        p += (2 * l + 1) * np.exp(-l * (l + 1) * eps**2 / 2) * np.sin(omega * (l + 0.5)) / np.sin(omega / 2)
    return p


def _igso3_score_np(omega, eps, L=2000):
    exp = _igso3_expansion_np(omega, eps, L)
    dSigma = 0.0
    for l in range(L):
        hi = np.sin(omega * (l + 0.5))
        dhi = (l + 0.5) * np.cos(omega * (l + 0.5))
        lo = np.sin(omega / 2)
        dlo = 0.5 * np.cos(omega / 2)
        dSigma += (2 * l + 1) * np.exp(-l * (l + 1) * eps**2 / 2) * (lo * dhi - hi * dlo) / lo**2
    return dSigma / exp


def test_so3_score_table_matches_series():
    # spot-check (eps, omega) grid points against the raw series, at eps
    # where 2000 terms suffice for convergence (eps > ~4.2e-3)
    eps_grid = 10 ** np.linspace(np.log10(so3.MIN_EPS), np.log10(so3.MAX_EPS), so3.N_EPS)
    omega_grid = np.linspace(0, np.pi, so3.X_N + 1)[1:]
    # (only probe where the series is well-conditioned: regions of
    # non-negligible density, omega <~ 6 * eps; elsewhere the 2000-term
    # float64 sum is cancellation noise for the golden too)
    probes = [(1999, 0), (1999, 700), (1999, 1999), (1400, 0), (1400, 700), (1000, 0), (600, 0)]
    for ei, oi in probes:
        want = _igso3_score_np(omega_grid[oi], eps_grid[ei])
        got = float(so3.SCORE[ei, oi])
        assert np.isclose(got, want, rtol=2e-4), (ei, oi, got, want)


def test_so3_score_small_eps_gaussian_limit():
    # below the reference's truncation-convergence range the table must follow
    # the Gaussian limit score ~= -omega / eps^2
    eps_grid = 10 ** np.linspace(np.log10(so3.MIN_EPS), np.log10(so3.MAX_EPS), so3.N_EPS)
    omega_grid = np.linspace(0, np.pi, so3.X_N + 1)[1:]
    for ei in [0, 50]:
        for oi in [0, 5, 20]:
            got = float(so3.SCORE[ei, oi])
            want = -omega_grid[oi] / eps_grid[ei] ** 2
            assert np.isclose(got, want, rtol=0.05), (ei, oi, got, want)


def test_so3_score_vec_direction_and_magnitude():
    eps = jnp.asarray([0.5])
    vec = jnp.asarray([[0.3, -0.4, 0.5]])
    out = so3.score_vec(eps, vec)
    om = float(jnp.linalg.norm(vec))
    eps_grid = 10 ** np.linspace(np.log10(so3.MIN_EPS), np.log10(so3.MAX_EPS), so3.N_EPS)
    ei = int(np.clip(np.round((np.log10(0.5) - np.log10(so3.MIN_EPS)) / (np.log10(so3.MAX_EPS) - np.log10(so3.MIN_EPS)) * so3.N_EPS), 0, so3.N_EPS - 1))
    omega_grid = np.linspace(0, np.pi, so3.X_N + 1)[1:]
    want_mag = np.interp(om, omega_grid, np.asarray(so3.SCORE)[ei])
    np.testing.assert_allclose(np.asarray(out)[0], want_mag * np.asarray(vec)[0] / om, rtol=1e-4)


def test_so3_sampling_distribution():
    # sampled angles should follow the table cdf
    key = jax.random.PRNGKey(0)
    eps = jnp.full((4000,), 1.0)
    om = np.asarray(so3.sample(key, eps))
    assert om.min() >= 0 and om.max() <= np.pi
    # empirical mean vs expected mean from pdf at eps=1.0
    ei = so3._eps_index(jnp.asarray(1.0))
    cdf = np.asarray(so3.CDF)[int(ei)]
    pdf = np.diff(cdf, prepend=0)
    omega_grid = np.asarray(so3.OMEGAS)
    want_mean = (omega_grid * pdf).sum() / pdf.sum()
    assert abs(om.mean() - want_mean) < 0.05


def test_so3_score_norm_positive_and_monotone_shape():
    big = float(so3.score_norm(jnp.asarray(0.01)))
    small = float(so3.score_norm(jnp.asarray(2.0)))
    assert big > small > 0  # low noise => sharper density => larger score


# ---------------------------------------------------------------- torus


def _torus_score_np(x, sigma, N=100):
    p, g = 0.0, 0.0
    for i in range(-N, N + 1):
        xi = x + 2 * np.pi * i
        e = np.exp(-(xi**2) / (2 * sigma**2))
        p += e
        g += xi / sigma**2 * e
    return g / p


def test_torus_score_matches_series():
    xs = np.array([0.1, -0.5, 2.0, 3.0, -3.0])
    sigmas = np.array([0.05, 0.3, 1.0, 2.0, 5.0])
    got = np.asarray(torus.score(jnp.asarray(xs), jnp.asarray(sigmas)))
    # table uses nearest-index lookup, so compare against the series at the
    # *snapped* grid point
    x_grid = 10 ** np.linspace(np.log10(torus.X_MIN), 0, torus.X_N + 1) * np.pi
    s_grid = 10 ** np.linspace(np.log10(torus.SIGMA_MIN), np.log10(torus.SIGMA_MAX), torus.SIGMA_N + 1) * np.pi
    for k in range(len(xs)):
        x = (xs[k] + np.pi) % (2 * np.pi) - np.pi
        sign = np.sign(x)
        xi = int(np.clip(np.round((np.log(abs(x) / np.pi) - np.log(torus.X_MIN)) / (0 - np.log(torus.X_MIN)) * torus.X_N), 0, torus.X_N))
        si = int(np.clip(np.round((np.log(sigmas[k] / np.pi) - np.log(torus.SIGMA_MIN)) / (np.log(torus.SIGMA_MAX) - np.log(torus.SIGMA_MIN)) * torus.SIGMA_N), 0, torus.SIGMA_N))
        # the table stores score at +x; lookup semantics return -sign * table
        want = -sign * _torus_score_np(x_grid[xi], s_grid[si])
        assert np.isclose(got[k], want, rtol=1e-3, atol=1e-5), (k, got[k], want)


def test_torus_score_norm_limits():
    # low sigma: score_norm ~ 1/sigma^2 (unwrapped gaussian); high sigma -> small
    s = 0.1
    got = float(torus.score_norm(jnp.asarray(s)))
    assert np.isclose(got, 1 / s**2, rtol=0.05)
    assert float(torus.score_norm(jnp.asarray(6.0))) < 2.0


def test_torus_sample_wraps():
    out = np.asarray(torus.sample(jax.random.PRNGKey(1), jnp.full((1000,), 2.0)))
    assert out.min() >= -np.pi and out.max() < np.pi


# ------------------------------------------------------------- geometry


def test_axis_angle_roundtrip_vs_scipy():
    rng = np.random.RandomState(0)
    v = rng.randn(20, 3)
    got = np.asarray(geometry.axis_angle_to_matrix(jnp.asarray(v, dtype=jnp.float32)))
    want = R.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)
    back = np.asarray(geometry.matrix_to_axis_angle(jnp.asarray(want, dtype=jnp.float32)))
    # rotation vectors are equivalent mod 2pi sphere; compare matrices
    np.testing.assert_allclose(R.from_rotvec(back).as_matrix(), want, atol=1e-5)


def test_kabsch_recovers_transform():
    rng = np.random.RandomState(1)
    A = rng.randn(4, 10, 3).astype(np.float32)
    rot = R.random(4, random_state=2).as_matrix().astype(np.float32)
    t = rng.randn(4, 1, 3).astype(np.float32)
    B = np.einsum("bni,bji->bnj", A, rot) + t
    R_est, t_est = geometry.rigid_transform_kabsch(jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(R_est), rot, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-4)
    det = np.linalg.det(np.asarray(R_est))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)


def test_kabsch_masked_ignores_padding():
    rng = np.random.RandomState(3)
    A = rng.randn(1, 8, 3).astype(np.float32)
    rot = R.random(1, random_state=4).as_matrix().astype(np.float32)
    B = np.einsum("bni,bji->bnj", A, rot)
    # corrupt padded tail
    A_pad = np.concatenate([A, rng.randn(1, 4, 3).astype(np.float32) * 100], axis=1)
    B_pad = np.concatenate([B, rng.randn(1, 4, 3).astype(np.float32) * 100], axis=1)
    mask = np.asarray([[True] * 8 + [False] * 4])
    R_est, _ = geometry.rigid_transform_kabsch(jnp.asarray(A_pad), jnp.asarray(B_pad), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(R_est)[0], rot[0], atol=1e-4)


# -------------------------------------------------------------- torsion


def _apply_torsion_np(pos, edges, mask_rotate, updates):
    """Reference semantics in numpy/scipy (sequential rotations)."""
    pos = pos.copy()
    for k, (u, v) in enumerate(edges):
        if updates[k] == 0:
            continue
        axis = pos[u] - pos[v]
        axis = axis * updates[k] / np.linalg.norm(axis)
        rot = R.from_rotvec(axis).as_matrix()
        sel = mask_rotate[k]
        pos[sel] = (pos[sel] - pos[v]) @ rot.T + pos[v]
    return pos


def test_apply_torsion_matches_numpy_sequential():
    # butane-like chain 0-1-2-3-4-5 with two rotatable bonds (1,2) and (2,3)
    rng = np.random.RandomState(5)
    L = 6
    pos = rng.randn(L, 3).astype(np.float32) * 2
    edges = [(1, 2), (2, 3)]
    mask_rotate = np.zeros((2, L), dtype=bool)
    mask_rotate[0, [2, 3, 4, 5]] = True  # v=2 side rotates
    mask_rotate[1, [3, 4, 5]] = True
    updates = np.array([0.7, -1.2], dtype=np.float32)

    want = _apply_torsion_np(pos, edges, mask_rotate, updates)

    got = torsion.apply_torsion_updates(
        jnp.asarray(pos)[None],
        jnp.asarray([[1, 2]]),
        jnp.asarray([[2, 3]]),
        jnp.asarray(mask_rotate)[None],
        jnp.asarray(updates)[None],
        jnp.ones((1, 2), dtype=bool),
    )
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=1e-4)


def test_torsion_angle_measurement_roundtrip():
    rng = np.random.RandomState(6)
    pos = rng.randn(1, 6, 3).astype(np.float32) * 2
    dihedral = jnp.asarray([[0, 1, 2, 3]])
    a0 = np.asarray(torsion.get_torsion_angles(dihedral, jnp.asarray(pos)))
    # rotating the (1,2) bond by delta should change the measured angle by delta
    delta = 0.6
    mask_rotate = np.zeros((1, 6), dtype=bool)
    mask_rotate[0, [2, 3, 4, 5]] = True
    new_pos = torsion.apply_torsion_updates(
        jnp.asarray(pos), jnp.asarray([[1]]), jnp.asarray([[2]]), jnp.asarray(mask_rotate)[None],
        jnp.asarray([[delta]]), jnp.ones((1, 1), dtype=bool),
    )
    a1 = np.asarray(torsion.get_torsion_angles(dihedral, new_pos))
    diff = (a1 - a0 + np.pi) % (2 * np.pi) - np.pi
    assert np.isclose(abs(diff[0, 0]), delta, atol=1e-3)


# ------------------------------------------------------------ schedules


def test_t_to_sigma_endpoints():
    p = schedules.SigmaParams()
    tr, rot, tor = schedules.t_to_sigma(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0), p)
    np.testing.assert_allclose([tr, rot, tor], [p.tr_sigma_min, p.rot_sigma_min, p.tor_sigma_min], rtol=1e-6)
    tr, rot, tor = schedules.t_to_sigma(jnp.asarray(1.0), jnp.asarray(1.0), jnp.asarray(1.0), p)
    np.testing.assert_allclose([tr, rot, tor], [p.tr_sigma_max, p.rot_sigma_max, p.tor_sigma_max], rtol=1e-6)


def test_t_schedule_matches_scipy():
    got = schedules.get_t_schedule(20, inf_sched_alpha=1.0, inf_sched_beta=1.0)
    want = scipy_beta.ppf(np.linspace(1, 0, 21)[:-1], a=1, b=1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got[0] == pytest.approx(1.0)


def test_sinusoidal_embedding_shape_and_range():
    emb = schedules.sinusoidal_embedding(jnp.asarray([0.0, 0.5, 1.0]) * 1000, 32)
    assert emb.shape == (3, 32)
    assert float(jnp.max(jnp.abs(emb))) <= 1.0 + 1e-6


# ----------------------------------------------------------------- poses


def test_modify_conformer_rigid_only():
    rng = np.random.RandomState(7)
    pos = rng.randn(2, 5, 3).astype(np.float32)
    mask = np.ones((2, 5), dtype=bool)
    tr = np.asarray([[1.0, 0, 0], [0, 2.0, 0]], dtype=np.float32)
    rotvec = np.zeros((2, 3), dtype=np.float32)
    out = poses.modify_conformer(
        jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(tr), jnp.asarray(rotvec),
        None, None, None, None, None,
    )
    np.testing.assert_allclose(np.asarray(out), pos + tr[:, None, :], atol=1e-5)


def test_modify_conformer_full_matches_reference_semantics():
    """rigid + torsion + Kabsch realignment vs a numpy re-derivation."""
    rng = np.random.RandomState(8)
    L = 6
    pos = rng.randn(L, 3).astype(np.float32) * 2
    tr = rng.randn(3).astype(np.float32)
    rotvec = rng.randn(3).astype(np.float32) * 0.5
    updates = np.array([0.9], dtype=np.float32)
    edges = [(1, 2)]
    mask_rotate = np.zeros((1, L), dtype=bool)
    mask_rotate[0, [2, 3, 4, 5]] = True

    # numpy reference semantics
    center = pos.mean(0, keepdims=True)
    rigid = (pos - center) @ R.from_rotvec(rotvec).as_matrix().T + tr + center
    flex = _apply_torsion_np(rigid, edges, mask_rotate, updates)
    # Kabsch align flex onto rigid
    cF, cR_ = flex.mean(0), rigid.mean(0)
    H = (flex - cF).T @ (rigid - cR_)
    U, S, Vt = np.linalg.svd(H)
    rot = Vt.T @ U.T
    if np.linalg.det(rot) < 0:
        rot = Vt.T @ np.diag([1, 1, -1]) @ U.T
    want = (flex - cF) @ rot.T + cR_

    got = poses.modify_conformer(
        jnp.asarray(pos)[None], jnp.ones((1, L), dtype=bool), jnp.asarray(tr)[None], jnp.asarray(rotvec)[None],
        jnp.asarray(updates)[None], jnp.asarray([[1]]), jnp.asarray([[2]]),
        jnp.asarray(mask_rotate)[None], jnp.ones((1, 1), dtype=bool),
    )
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-4)
