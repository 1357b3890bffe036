"""Wrapped-normal (torus) diffusion tables and jittable lookups.

Re-implements the capabilities of the reference's ``utils/torus.py``
(lines 11-82) with device-resident tables:

  * p(x|sigma) and d/dx log p on a 5001 x 5001 log-log grid, precomputed in
    numpy on host and cached;
  * ``score`` / ``p`` / ``score_norm`` become jittable nearest-index gathers
    (the reference's exact lookup semantics);
  * ``score_norm`` (E[score^2] under the wrapped normal) is computed by
    deterministic quadrature on the grid rather than the reference's unseeded
    10000-sample Monte-Carlo (same quantity, reproducible).

Grids match the reference: x in [1e-5, 1]*pi (log), sigma in [3e-3, 2]*pi
(log), series truncated at |i| <= 100 winding numbers.
"""

import os

import jax.numpy as jnp
import numpy as np

X_MIN, X_N = 1e-5, 5000  # relative to pi
SIGMA_MIN, SIGMA_MAX, SIGMA_N = 3e-3, 2.0, 5000  # relative to pi
_N_WIND = 100

_CACHE_ENV = "CBT_CACHE_DIR"


def _cache_dir() -> str:
    d = os.environ.get(_CACHE_ENV)
    if d is None:
        d = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache")
    os.makedirs(d, exist_ok=True)
    return d


def _compute_tables():
    x = 10 ** np.linspace(np.log10(X_MIN), 0, X_N + 1) * np.pi  # [X]
    sigma = 10 ** np.linspace(np.log10(SIGMA_MIN), np.log10(SIGMA_MAX), SIGMA_N + 1) * np.pi  # [S]

    p = np.zeros((SIGMA_N + 1, X_N + 1))
    grad = np.zeros((SIGMA_N + 1, X_N + 1))
    s2 = sigma[:, None] ** 2
    for i in range(-_N_WIND, _N_WIND + 1):
        xi = x[None, :] + 2 * np.pi * i
        e = np.exp(-(xi**2) / (2 * s2))
        p += e
        grad += xi / s2 * e
    # Where the wrapped density underflows float64 (tiny sigma, |x| >> sigma)
    # substitute the exact unwrapped-Gaussian limit x / sigma^2.
    bad = p <= 0
    score = np.where(bad, x[None, :] / s2, grad / np.where(bad, 1.0, p))

    # E[score(x, sigma)^2] under the wrapped normal, by quadrature over a
    # uniform grid on [-pi, pi) (the density is symmetric, integrate half).
    xs = np.linspace(1e-7, np.pi, 4096)
    pj = np.zeros((SIGMA_N + 1, xs.shape[0]))
    gj = np.zeros_like(pj)
    for i in range(-_N_WIND, _N_WIND + 1):
        xi = xs[None, :] + 2 * np.pi * i
        e = np.exp(-(xi**2) / (2 * s2))
        pj += e
        gj += xi / s2 * e
    badj = pj <= 0
    sj = np.where(badj, 0.0, gj / np.where(badj, 1.0, pj))
    e_sq = np.sum(sj**2 * pj, axis=1) / np.sum(pj, axis=1)
    return p, score, e_sq


def _load_tables():
    path = os.path.join(_cache_dir(), "torus_tables_v2.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["p"], z["score"], z["score_norm"]
    p, score, e_sq = _compute_tables()
    np.savez(path, p=p, score=score, score_norm=e_sq)
    return p, score, e_sq


_p_np, _score_np, _score_norm_np = _load_tables()

P_TABLE = jnp.asarray(_p_np, dtype=jnp.float32)
SCORE_TABLE = jnp.asarray(_score_np, dtype=jnp.float32)
SCORE_NORM_TABLE = jnp.asarray(_score_norm_np, dtype=jnp.float32)

_LOG_X_MIN = float(np.log(X_MIN))
_LOG_S_MIN = float(np.log(SIGMA_MIN))
_LOG_S_MAX = float(np.log(SIGMA_MAX))


def _x_index(x):
    """Nearest index of |wrapped x| on the log x-grid; also returns sign."""
    x = (x + jnp.pi) % (2 * jnp.pi) - jnp.pi
    sign = jnp.sign(x)
    lx = jnp.log(jnp.abs(x) / jnp.pi + 1e-30)
    idx = (lx - _LOG_X_MIN) / (0 - _LOG_X_MIN) * X_N
    return sign, jnp.clip(jnp.round(idx), 0, X_N).astype(jnp.int32)


def _sigma_index(sigma):
    ls = jnp.log(sigma / jnp.pi)
    idx = (ls - _LOG_S_MIN) / (_LOG_S_MAX - _LOG_S_MIN) * SIGMA_N
    return jnp.clip(jnp.round(idx), 0, SIGMA_N).astype(jnp.int32)


def score(x, sigma, table=None):
    """d/dx log p_wrapped(x | sigma); x, sigma broadcastable arrays.

    ``table``: optional explicit SCORE_TABLE. Thread it as a jit ARGUMENT
    from compiled callers (train_loop does): the 5001x5001 table closed over
    inside a jitted function lowers as a ~100 MB HLO constant, bloating
    every train-step executable and the persistent compile cache."""
    x = jnp.asarray(x)
    if table is None:
        table = SCORE_TABLE
    sigma = jnp.broadcast_to(jnp.asarray(sigma), x.shape)
    sign, xi = _x_index(x)
    si = _sigma_index(sigma)
    return -sign * table[si, xi]


def p(x, sigma, table=None):
    """Unnormalized wrapped-normal density p(x | sigma)."""
    x = jnp.asarray(x)
    if table is None:
        table = P_TABLE
    sigma = jnp.broadcast_to(jnp.asarray(sigma), x.shape)
    _, xi = _x_index(x)
    si = _sigma_index(sigma)
    return table[si, xi]


def sample(key, sigma):
    """Sample wrapped normal: N(0, sigma) wrapped to [-pi, pi)."""
    import jax

    sigma = jnp.asarray(sigma)
    out = sigma * jax.random.normal(key, sigma.shape)
    return (out + jnp.pi) % (2 * jnp.pi) - jnp.pi


def score_norm(sigma):
    """E[score^2] under the wrapped normal at noise level sigma (gather)."""
    return SCORE_NORM_TABLE[_sigma_index(jnp.asarray(sigma))]
