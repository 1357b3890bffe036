"""Diffusion time/noise schedules and timestep embeddings.

Capabilities of the reference's ``utils/diffusion_utils.py``: exponential
sigma interpolation (lines 21-32), the inverse-Beta-CDF inference time grid
(lines 138-147), and sinusoidal / Gaussian-Fourier time embeddings (lines
99-135). Schedules are precomputed on host (scipy) and shipped to device as
arrays; ``t_to_sigma`` and the embeddings are jittable.
"""

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from scipy.stats import beta as _beta


class SigmaParams(NamedTuple):
    """Per-manifold sigma ranges (exponential schedule)."""

    tr_sigma_min: float = 0.1
    tr_sigma_max: float = 19.0
    rot_sigma_min: float = 0.06
    rot_sigma_max: float = 3.1
    tor_sigma_min: float = 0.0314
    tor_sigma_max: float = 3.14


def sigmoid_np(t):
    return 1 / (1 + np.e ** (-t))


def t_to_sigma_individual(t, sigma_min, sigma_max, schedule_type="exponential", schedule_k=10, schedule_m=0.4):
    """sigma(t) = sigma_min^(1-t) * sigma_max^t (exponential interpolation)."""
    if schedule_type == "exponential":
        return sigma_min ** (1 - t) * sigma_max**t
    if schedule_type == "sigmoid":
        s = lambda u: 1 / (1 + jnp.exp(-schedule_k * (u - schedule_m)))
        frac = (s(t) - s(0.0)) / (s(1.0) - s(0.0))
        return frac * (sigma_max - sigma_min) + sigma_min
    raise ValueError(schedule_type)


def t_to_sigma(t_tr, t_rot, t_tor, params: SigmaParams):
    """Map per-manifold diffusion times to noise levels (jittable)."""
    tr_sigma = t_to_sigma_individual(t_tr, params.tr_sigma_min, params.tr_sigma_max)
    rot_sigma = t_to_sigma_individual(t_rot, params.rot_sigma_min, params.rot_sigma_max)
    tor_sigma = t_to_sigma_individual(t_tor, params.tor_sigma_min, params.tor_sigma_max)
    return tr_sigma, rot_sigma, tor_sigma


def get_t_schedule(inference_steps, sigma_schedule="expbeta", inf_sched_alpha=1.0, inf_sched_beta=1.0, t_max=1.0):
    """Inference time grid: inverse-Beta-CDF spacing (host-side, numpy)."""
    if sigma_schedule != "expbeta":
        raise ValueError(sigma_schedule)
    lin_max = _beta.cdf(t_max, a=inf_sched_alpha, b=inf_sched_beta)
    c = np.linspace(lin_max, 0, inference_steps + 1)[:-1]
    return _beta.ppf(c, a=inf_sched_alpha, b=inf_sched_beta).astype(np.float32)


def get_inverse_schedule(t, sched_alpha=1.0, sched_beta=1.0):
    return _beta.ppf(t, a=sched_alpha, b=sched_beta)


def sinusoidal_embedding(timesteps, embedding_dim, max_positions=10000):
    """Sinusoidal timestep embedding; timesteps [N] -> [N, embedding_dim]."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def get_timestep_embedding(embedding_type, embedding_dim, embedding_scale=10000):
    """Returns a jittable t -> embedding function.

    'fourier' uses fixed (non-trained) random projections like the
    reference's GaussianFourierProjection; we derive them from a fixed seed
    so checkpoints are reproducible.
    """
    if embedding_type == "sinusoidal":
        return lambda x: sinusoidal_embedding(embedding_scale * x, embedding_dim)
    if embedding_type == "fourier":
        rng = np.random.RandomState(0)
        W = jnp.asarray(rng.randn(embedding_dim // 2) * embedding_scale, dtype=jnp.float32)

        def emb(x):
            proj = x[:, None] * W[None, :] * 2 * jnp.pi
            return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

        return emb
    raise ValueError(embedding_type)
