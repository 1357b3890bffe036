"""Fused Pallas TP-conv kernel vs the XLA reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from confidence_bootstrapping_tpu.ops.irreps import WeightedTensorProduct
from confidence_bootstrapping_tpu.ops.pallas import tpconv


def _xla_reference(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_out):
    tp = WeightedTensorProduct(irreps_in, "1x0e + 1x1o", irreps_out)
    h = jax.nn.relu(edge_attr @ w1 + b1)
    w = h @ w2 + b2
    msg = tp(sender, sh, w)
    msg = jnp.where(mask[..., None], msg, 0.0)
    return jnp.sum(msg, axis=1)


def test_fused_tpconv_matches_xla():
    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    assert spec is not None
    M, K, Fe, H = 24, 6, 24, 24
    rng = np.random.RandomState(0)
    edge_attr = jnp.asarray(rng.randn(M, K, Fe).astype(np.float32))
    sender = jnp.asarray(rng.randn(M, K, spec.in_dim).astype(np.float32))
    shv = rng.randn(M, K, 3).astype(np.float32)
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    sh = spherical_harmonics(1, jnp.asarray(shv))
    mask = jnp.asarray(rng.rand(M, K) > 0.3)
    w1 = jnp.asarray(rng.randn(Fe, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, spec.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(spec.weight_numel).astype(np.float32) * 0.1)

    want = _xla_reference(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, irreps)
    got = tpconv.fused_tpconv_nbr(
        edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, irreps,
        tile_m=8, interpret=True, use_bf16=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_tpconv_flagship_shapes():
    """The pretrained score architecture's irreps (ns=32, nv=6)."""
    irreps = "32x0e + 6x1o + 6x1e + 6x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    assert spec.weight_numel == 38 * 32 + 44 * 6 + 18 * 6 + 12 * 6
    M, K = 16, 4
    rng = np.random.RandomState(1)
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    edge_attr = jnp.asarray(rng.randn(M, K, 96).astype(np.float32))
    sender = jnp.asarray(rng.randn(M, K, spec.in_dim).astype(np.float32))
    sh = spherical_harmonics(1, jnp.asarray(rng.randn(M, K, 3).astype(np.float32)))
    mask = jnp.asarray(np.ones((M, K), bool))
    w1 = jnp.asarray(rng.randn(96, 96).astype(np.float32) * 0.1)
    b1 = jnp.zeros(96)
    w2 = jnp.asarray(rng.randn(96, spec.weight_numel).astype(np.float32) * 0.1)
    b2 = jnp.zeros(spec.weight_numel)
    want = _xla_reference(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, irreps)
    got = tpconv.fused_tpconv_nbr(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, irreps, tile_m=8, interpret=True, use_bf16=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=3e-4)


def test_ladder_spec_rejects_non_ladder():
    assert tpconv.ladder_spec("4x2e + 3x1o", "4x0e") is None
    assert tpconv.ladder_spec("4x0e + 3x1o", "4x0e + 3x1o + 3x1e") is not None


def test_fused_tpconv_k_tiling():
    """K=48 exercises the K-tiled accumulation path (tile_k=24, 2 grid steps)."""
    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    M, K, Fe, H = 16, 48, 24, 24
    rng = np.random.RandomState(2)
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    edge_attr = jnp.asarray(rng.randn(M, K, Fe).astype(np.float32))
    sender = jnp.asarray(rng.randn(M, K, spec.in_dim).astype(np.float32))
    sh = spherical_harmonics(1, jnp.asarray(rng.randn(M, K, 3).astype(np.float32)))
    mask = jnp.asarray(rng.rand(M, K) > 0.3)
    w1 = jnp.asarray(rng.randn(Fe, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, spec.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(spec.weight_numel).astype(np.float32) * 0.1)
    want = _xla_reference(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, irreps)
    got = tpconv.fused_tpconv_nbr(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, irreps, interpret=True, use_bf16=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=3e-4)


def test_fused_tpconv_msgs_matches_xla():
    """Messages-only variant (no K reduction): per-edge outputs match the
    XLA path; masked edges and fully-masked tiles come back exactly zero."""
    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    M, K, Fe, H = 24, 6, 24, 24
    rng = np.random.RandomState(3)
    edge_attr = jnp.asarray(rng.randn(M, K, Fe).astype(np.float32))
    sender = jnp.asarray(rng.randn(M, K, spec.in_dim).astype(np.float32))
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    sh = spherical_harmonics(1, jnp.asarray(rng.randn(M, K, 3).astype(np.float32)))
    mask_np = rng.rand(M, K) > 0.3
    mask_np[8:16] = False  # a fully-masked tile (tile_m=8)
    mask = jnp.asarray(mask_np)
    w1 = jnp.asarray(rng.randn(Fe, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, spec.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(spec.weight_numel).astype(np.float32) * 0.1)

    tp = WeightedTensorProduct(irreps, "1x0e + 1x1o", irreps)
    h = jax.nn.relu(edge_attr @ w1 + b1)
    w = h @ w2 + b2
    want = jnp.where(mask[..., None], tp(sender, sh, w), 0.0)

    got = tpconv.fused_tpconv_msgs(
        edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, irreps,
        tile_m=8, interpret=True, use_bf16=False,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    assert float(np.abs(np.asarray(got)[8:16]).max()) == 0.0


# ---------------------------------------------------------------------- #
# v3 kernel (all-MXU restructure) — same contracts as v1
# ---------------------------------------------------------------------- #

from confidence_bootstrapping_tpu.ops.pallas import tpconv_v3


def _rand_case(irreps, M, K, Fe, H, seed):
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    spec = tpconv.ladder_spec(irreps, irreps)
    rng = np.random.RandomState(seed)
    edge_attr = jnp.asarray(rng.randn(M, K, Fe).astype(np.float32))
    sender = jnp.asarray(rng.randn(M, K, spec.in_dim).astype(np.float32))
    sh = spherical_harmonics(1, jnp.asarray(rng.randn(M, K, 3).astype(np.float32)))
    mask = jnp.asarray(rng.rand(M, K) > 0.3)
    w1 = jnp.asarray(rng.randn(Fe, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, spec.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(spec.weight_numel).astype(np.float32) * 0.1)
    return edge_attr, sender, sh, mask, w1, b1, w2, b2


def test_v3_contribution_matrix_matches_v1_contributions():
    """The static CG matrix reproduces v1's per-edge contribution stacks."""
    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    G, stripe_of = tpconv_v3.contribution_matrix(spec)
    rng = np.random.RandomState(7)
    T = 5
    x_cm = rng.randn(T, spec.in_dim).astype(np.float32)
    shv = rng.randn(T, 3).astype(np.float32)
    sh = np.concatenate([np.ones((T, 1), np.float32), shv], axis=1)
    xa = np.concatenate([x_cm, x_cm * shv[:, :1], x_cm * shv[:, 1:2], x_cm * shv[:, 2:3]], axis=1)
    cfull = xa @ G

    i0e, i1o, i1e, i0o = spec.in_muls
    x0e = jnp.asarray(x_cm[:, :i0e])
    x1o = [jnp.asarray(x_cm[:, i0e + c * i1o : i0e + (c + 1) * i1o]) for c in range(3)]
    x1e = [jnp.asarray(x_cm[:, i0e + 3 * i1o + c * i1e : i0e + 3 * i1o + (c + 1) * i1e]) for c in range(3)]
    x0o = jnp.asarray(x_cm[:, i0e + 3 * i1o + 3 * i1e :])
    sh1 = [jnp.asarray(sh[:, 1 + b : 2 + b]) for b in range(3)]
    parts = tpconv._tp_contributions(x0e, x1o, x1e, x0o, sh1, spec)

    def stack(lst):
        return np.concatenate([np.asarray(a) for a in lst], axis=1)

    for g, key, ncomp in ((0, "c0e", 1), (1, "c1o", 3), (2, "c1e", 3), (3, "c0o", 1)):
        for c in range(ncomp):
            want = stack(parts[key][c] if ncomp == 3 else parts[key])
            s = int(stripe_of[g, c])
            got = cfull[:, s * 128 : s * 128 + want.shape[1]]
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_v3_fused_tpconv_matches_xla():
    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    case = _rand_case(irreps, 24, 6, 24, 24, 0)
    want = _xla_reference(*case, irreps, irreps)
    got = tpconv_v3.fused_tpconv_nbr(*case, irreps, irreps, tile_m=8, interpret=True, use_bf16=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_v3_flagship_shapes_and_k_tiling():
    """Pretrained-score irreps; K=48 exercises K-tiled accumulation."""
    irreps = "32x0e + 6x1o + 6x1e + 6x0o"
    case = _rand_case(irreps, 16, 48, 96, 96, 1)
    want = _xla_reference(*case, irreps, irreps)
    got = tpconv_v3.fused_tpconv_nbr(*case, irreps, irreps, tile_m=8, interpret=True, use_bf16=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=3e-4)


def test_v3_msgs_matches_xla_and_masked_zero():
    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    spec = tpconv.ladder_spec(irreps, irreps)
    M, K, Fe, H = 24, 6, 24, 24
    rng = np.random.RandomState(3)
    edge_attr = jnp.asarray(rng.randn(M, K, Fe).astype(np.float32))
    sender = jnp.asarray(rng.randn(M, K, spec.in_dim).astype(np.float32))
    sh = spherical_harmonics(1, jnp.asarray(rng.randn(M, K, 3).astype(np.float32)))
    mask_np = rng.rand(M, K) > 0.3
    mask_np[8:16] = False
    mask = jnp.asarray(mask_np)
    w1 = jnp.asarray(rng.randn(Fe, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, spec.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(spec.weight_numel).astype(np.float32) * 0.1)

    tp = WeightedTensorProduct(irreps, "1x0e + 1x1o", irreps)
    h = jax.nn.relu(edge_attr @ w1 + b1)
    w = h @ w2 + b2
    want = jnp.where(mask[..., None], tp(sender, sh, w), 0.0)
    got = tpconv_v3.fused_tpconv_msgs(
        edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps, irreps,
        tile_m=8, interpret=True, use_bf16=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    assert float(np.abs(np.asarray(got)[8:16]).max()) == 0.0


# ---------------------------------------------------------------------- #
# v4 kernel: in-kernel neighbor gather (receptor kNN groups)
# ---------------------------------------------------------------------- #

from confidence_bootstrapping_tpu.ops.pallas import tpconv_rec


def test_v4_rec_gather_matches_reference():
    """v4 (in-kernel one-hot gather + in-kernel sh + split-w1 MLP) matches
    the explicit gather + XLA TP reference; masked edges (including
    self-edges with zero vectors) contribute exactly zero; a fully-masked
    receiver tile is skipped and comes back zero."""
    from confidence_bootstrapping_tpu.ops.graph_builders import gather_nodes
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    ns = 8
    B, N, K, Fe, H = 2, 16, 4, 12, 28
    rng = np.random.RandomState(11)
    node = jnp.asarray(rng.randn(B, N, spec.in_dim).astype(np.float32))
    pos = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 5)
    nbr_np = rng.randint(0, N, (B, N, K))
    nbr_np[0, 3, 1] = 3  # a self-edge (zero vector), masked below
    mask_np = rng.rand(B, N, K) > 0.3
    mask_np[0, 3, 1] = False
    mask_np[1, 8:16] = False  # a fully-masked receiver tile (tile_n=8)
    nbr = jnp.asarray(nbr_np.astype(np.int32))
    mask = jnp.asarray(mask_np)
    emb = jnp.asarray(rng.randn(B, N, K, Fe).astype(np.float32))
    sig = jnp.asarray(rng.randn(B, Fe).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.randn(Fe + 2 * ns, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, spec.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(spec.weight_numel).astype(np.float32) * 0.1)

    sender = gather_nodes(node, nbr)
    spos = gather_nodes(pos, nbr)
    sh = spherical_harmonics(1, spos - pos[:, :, None, :])
    eattr = jnp.concatenate(
        [emb + sig[:, None, None, :], jnp.broadcast_to(node[:, :, None, :ns], sender[..., :ns].shape), sender[..., :ns]],
        axis=-1,
    )
    want = _xla_reference(
        eattr.reshape(B * N, K, -1), sender.reshape(B * N, K, -1), sh.reshape(B * N, K, 4),
        mask.reshape(B * N, K), w1, b1, w2, b2, irreps, irreps,
    ).reshape(B, N, -1)

    got = tpconv_rec.fused_tpconv_rec(
        node, pos, nbr, emb, sig, mask, w1, b1, w2, b2, irreps, irreps, ns,
        tile_n=8, interpret=True, use_bf16=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)
    assert float(np.abs(np.asarray(got)[1, 8:16]).max()) == 0.0


# ---------------------------------------------------------------------- #
# generalized kernel (any sh_lmax) — the confidence model's lmax=2 path
# ---------------------------------------------------------------------- #

from confidence_bootstrapping_tpu.ops.pallas import tpconv_g


def _xla_reference_g(edge_attr, sender, sh, mask, w1, b1, w2, b2, irreps_in, irreps_sh, irreps_out):
    tp = WeightedTensorProduct(irreps_in, irreps_sh, irreps_out)
    h = jax.nn.relu(edge_attr @ w1 + b1)
    w = h @ w2 + b2
    msg = jnp.where(mask[..., None], tp(sender, sh, w), 0.0)
    return jnp.sum(msg, axis=1), msg


def _case_g(irreps_in, irreps_sh, irreps_out, M, K, Fe, H, seed):
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    tp = WeightedTensorProduct(irreps_in, irreps_sh, irreps_out)
    rng = np.random.RandomState(seed)
    edge_attr = jnp.asarray(rng.randn(M, K, Fe).astype(np.float32))
    sender = jnp.asarray(rng.randn(M, K, Irreps(irreps_in).dim).astype(np.float32))
    sh = spherical_harmonics(irreps_sh, jnp.asarray(rng.randn(M, K, 3).astype(np.float32)))
    mask_np = rng.rand(M, K) > 0.3
    mask_np[8:16] = False
    mask = jnp.asarray(mask_np)
    w1 = jnp.asarray(rng.randn(Fe, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, tp.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(tp.weight_numel).astype(np.float32) * 0.1)
    return edge_attr, sender, sh, mask, w1, b1, w2, b2


from confidence_bootstrapping_tpu.ops.irreps import Irreps


def test_general_kernel_lmax2_matches_xla():
    """sh = 0e+1o+2e (the all-atom confidence architecture's path)."""
    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    sh_irr = "1x0e + 1x1o + 1x2e"
    case = _case_g(irreps, sh_irr, irreps, 24, 6, 24, 24, 5)
    want, want_msg = _xla_reference_g(*case, irreps, sh_irr, irreps)
    got = tpconv_g.fused_tpconv_nbr_g(*case, irreps, sh_irr, irreps, tile_m=8, interpret=True, use_bf16=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)
    gotm = tpconv_g.fused_tpconv_msgs_g(*case, irreps, sh_irr, irreps, tile_m=8, interpret=True, use_bf16=False)
    np.testing.assert_allclose(np.asarray(gotm), np.asarray(want_msg), rtol=3e-4, atol=3e-4)
    assert float(np.abs(np.asarray(gotm)[8:16]).max()) == 0.0


def test_general_kernel_lmax1_matches_v3():
    """The generalized layout reproduces the specialized lmax=1 kernel."""
    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    sh_irr = "1x0e + 1x1o"
    case = _case_g(irreps, sh_irr, irreps, 24, 6, 24, 24, 6)
    want, _ = _xla_reference_g(*case, irreps, sh_irr, irreps)
    got = tpconv_g.fused_tpconv_nbr_g(*case, irreps, sh_irr, irreps, tile_m=8, interpret=True, use_bf16=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_general_kernel_asymmetric_irreps():
    """in != out irreps, including an output irrep with no admissible path
    (0o from a scalar-only input stays zero)."""
    irreps_in = "6x0e + 2x1o"
    irreps_out = "4x0e + 3x1o + 2x1e + 1x0o"
    sh_irr = "1x0e + 1x1o + 1x2e"
    case = _case_g(irreps_in, sh_irr, irreps_out, 16, 4, 12, 12, 7)
    want, _ = _xla_reference_g(*case, irreps_in, sh_irr, irreps_out)
    got = tpconv_g.fused_tpconv_nbr_g(*case, irreps_in, sh_irr, irreps_out, tile_m=8, interpret=True, use_bf16=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_cross_gather_matches_reference():
    """Hetero-receiver variant: ligand receivers gather receptor senders
    in-kernel (the lig <- rec cross group)."""
    from confidence_bootstrapping_tpu.ops.graph_builders import gather_nodes
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    ns = 8
    B, L, N, K, Fe, H = 2, 8, 32, 4, 12, 28
    rng = np.random.RandomState(13)
    recv = jnp.asarray(rng.randn(B, L, spec.in_dim).astype(np.float32))
    rpos = jnp.asarray(rng.randn(B, L, 3).astype(np.float32) * 5)
    src = jnp.asarray(rng.randn(B, N, spec.in_dim).astype(np.float32))
    spos_t = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 5)
    idx = jnp.asarray(rng.randint(0, N, (B, L, K)).astype(np.int32))
    emb = jnp.asarray(rng.randn(B, L, K, Fe).astype(np.float32))
    mask_np = rng.rand(B, L, K) > 0.3
    mask = jnp.asarray(mask_np)
    w1 = jnp.asarray(rng.randn(Fe + 2 * ns, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, spec.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(spec.weight_numel).astype(np.float32) * 0.1)

    sender = gather_nodes(src, idx)
    sp = gather_nodes(spos_t, idx)
    sh = spherical_harmonics(1, sp - rpos[:, :, None, :])
    eattr = jnp.concatenate(
        [emb, jnp.broadcast_to(recv[:, :, None, :ns], sender[..., :ns].shape), sender[..., :ns]], axis=-1
    )
    want = _xla_reference(
        eattr.reshape(B * L, K, -1), sender.reshape(B * L, K, -1), sh.reshape(B * L, K, 4),
        mask.reshape(B * L, K), w1, b1, w2, b2, irreps, irreps,
    ).reshape(B, L, -1)
    got = tpconv_rec.fused_tpconv_cross(
        recv, rpos, src, spos_t, idx, emb, mask, w1, b1, w2, b2, irreps, irreps, ns,
        interpret=True, use_bf16=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------- #
# merged ligand-side kernels (round-2 roadmap item 1)
# ---------------------------------------------------------------------- #

from confidence_bootstrapping_tpu.ops.pallas import tpconv_lig


import pytest


@pytest.mark.parametrize("L,E", [(32, 8), (48, 96)])
def test_pb_pairs_bonds_matches_reference(L, E):
    """Merged dense-pairs + bond-edges kernel vs the explicit XLA path
    (pair conv + bond messages + scatter-add to src). L=32 forces the
    receiver tiling (tile_l=16, 2 programs); bonds crossing tiles land in
    the right receiver tile. L=48/E=96 is the big-ligand evaluator bucket
    whose tile used to come out 12 — Mosaic-illegal (not %8, != L) — and
    now tiles at 8."""
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    ns, H = 8, 24
    B = 2
    rng = np.random.RandomState(17)
    lig = jnp.asarray(rng.randn(B, L, spec.in_dim).astype(np.float32))
    pos = jnp.asarray(rng.randn(B, L, 3).astype(np.float32) * 4)
    pair_emb = jnp.asarray(rng.randn(B, L, L, ns).astype(np.float32))
    pmask_np = rng.rand(B, L, L) > 0.4
    pmask_np[:, np.arange(L), np.arange(L)] = False
    pmask = jnp.asarray(pmask_np)
    src = jnp.asarray(rng.randint(0, L, (B, E)).astype(np.int32))
    dst = jnp.asarray(rng.randint(0, L, (B, E)).astype(np.int32))
    bond_emb = jnp.asarray(rng.randn(B, E, ns).astype(np.float32))
    bmask = jnp.asarray(rng.rand(B, E) > 0.25)
    w1 = jnp.asarray(rng.randn(3 * ns, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, spec.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(spec.weight_numel).astype(np.float32) * 0.1)

    # XLA reference: dense pairs
    scal = lig[..., :ns]
    vec_p = pos[:, None, :, :] - pos[:, :, None, :]
    sh_p = spherical_harmonics(1, vec_p)
    eattr_p = jnp.concatenate(
        [pair_emb,
         jnp.broadcast_to(scal[:, :, None, :], (B, L, L, ns)),
         jnp.broadcast_to(scal[:, None, :, :], (B, L, L, ns))], axis=-1)
    sender_p = jnp.broadcast_to(lig[:, None, :, :], (B, L, L, spec.in_dim))
    want = _xla_reference(
        eattr_p.reshape(B * L, L, -1), sender_p.reshape(B * L, L, -1),
        sh_p.reshape(B * L, L, 4), pmask.reshape(B * L, L), w1, b1, w2, b2, irreps, irreps,
    ).reshape(B, L, -1)
    # XLA reference: bonds (receiver = src, sender = dst)
    p_src = jnp.take_along_axis(pos, src[..., None], axis=1)
    p_dst = jnp.take_along_axis(pos, dst[..., None], axis=1)
    sh_b = spherical_harmonics(1, p_dst - p_src)
    sc_src = jnp.take_along_axis(scal, src[..., None], axis=1)
    sender_b = jnp.take_along_axis(lig, dst[..., None], axis=1)
    eattr_b = jnp.concatenate([bond_emb, sc_src, sender_b[..., :ns]], axis=-1)
    tp = WeightedTensorProduct(irreps, "1x0e + 1x1o", irreps)
    h = jax.nn.relu(eattr_b @ w1 + b1)
    msg_b = jnp.where(bmask[..., None], tp(sender_b, sh_b, h @ w2 + b2), 0.0)
    scat = jnp.zeros_like(want)
    for b in range(B):
        scat = scat.at[b].set(jax.ops.segment_sum(msg_b[b], src[b], num_segments=L))
    want = want + scat

    got = tpconv_lig.fused_tpconv_pb(
        lig, pos, pair_emb, pmask, src, dst, bond_emb, bmask,
        w1, b1, w2, b2, irreps, irreps, ns, interpret=True, use_bf16=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_cross_rev_matches_reference():
    """Merged cross + reversed-cross kernel: the lig<-rec sums match
    fused_tpconv_cross's contract and the rec<-lig messages are scattered
    onto receptor nodes exactly like msgs_nbr + segment-sum."""
    from confidence_bootstrapping_tpu.ops.graph_builders import gather_nodes
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    ns, H = 8, 28
    B, L, N, K = 2, 8, 32, 4
    rng = np.random.RandomState(19)
    recv = jnp.asarray(rng.randn(B, L, spec.in_dim).astype(np.float32))
    rpos = jnp.asarray(rng.randn(B, L, 3).astype(np.float32) * 5)
    srcn = jnp.asarray(rng.randn(B, N, spec.in_dim).astype(np.float32))
    spos_t = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 5)
    idx = jnp.asarray(rng.randint(0, N, (B, L, K)).astype(np.int32))
    emb = jnp.asarray(rng.randn(B, L, K, ns).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, L, K) > 0.3)

    def mlp_weights(seed):
        r = np.random.RandomState(seed)
        return (jnp.asarray(r.randn(3 * ns, H).astype(np.float32) * 0.2),
                jnp.asarray(r.randn(H).astype(np.float32) * 0.1),
                jnp.asarray(r.randn(H, spec.weight_numel).astype(np.float32) * 0.2),
                jnp.asarray(r.randn(spec.weight_numel).astype(np.float32) * 0.1))

    w1f, b1f, w2f, b2f = mlp_weights(23)
    w1r, b1r, w2r, b2r = mlp_weights(29)

    sender = gather_nodes(srcn, idx)
    sp = gather_nodes(spos_t, idx)
    vec = sp - rpos[:, :, None, :]
    sh = spherical_harmonics(1, vec)
    eattr = jnp.concatenate(
        [emb, jnp.broadcast_to(recv[:, :, None, :ns], sender[..., :ns].shape), sender[..., :ns]], axis=-1)
    want_lig = _xla_reference(
        eattr.reshape(B * L, K, -1), sender.reshape(B * L, K, -1), sh.reshape(B * L, K, 4),
        mask.reshape(B * L, K), w1f, b1f, w2f, b2f, irreps, irreps,
    ).reshape(B, L, -1)

    # reversed: receiver = gathered rec node, sender = lig atom, sh(-vec)
    sh_rev = spherical_harmonics(1, -vec)
    eattr_r = jnp.concatenate(
        [emb, sender[..., :ns], jnp.broadcast_to(recv[:, :, None, :ns], sender[..., :ns].shape)], axis=-1)
    lig_sender = jnp.broadcast_to(recv[:, :, None, :], (B, L, K, spec.in_dim))
    tp = WeightedTensorProduct(irreps, "1x0e + 1x1o", irreps)
    h = jax.nn.relu(eattr_r @ w1r + b1r)
    msg_r = jnp.where(mask[..., None], tp(lig_sender, sh_rev, h @ w2r + b2r), 0.0)
    want_rec = jnp.stack([
        jax.ops.segment_sum(msg_r[b].reshape(L * K, -1), idx[b].reshape(L * K), num_segments=N)
        for b in range(B)
    ])

    got_lig, got_rec = tpconv_lig.fused_tpconv_cross_rev(
        recv, rpos, srcn, spos_t, idx, emb, mask,
        w1f, b1f, w2f, b2f, w1r, b1r, w2r, b2r,
        irreps, irreps, ns, interpret=True, use_bf16=False,
    )
    np.testing.assert_allclose(np.asarray(got_lig), np.asarray(want_lig), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_rec), np.asarray(want_rec), rtol=3e-4, atol=3e-4)


def test_cross_rev_without_rev_matches_cross():
    """with_rev=None path returns the same lig sums as fused_tpconv_cross."""
    from confidence_bootstrapping_tpu.ops.graph_builders import gather_nodes

    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    spec = tpconv.ladder_spec(irreps, irreps)
    ns, H = 8, 28
    B, L, N, K = 1, 8, 16, 4
    rng = np.random.RandomState(31)
    recv = jnp.asarray(rng.randn(B, L, spec.in_dim).astype(np.float32))
    rpos = jnp.asarray(rng.randn(B, L, 3).astype(np.float32) * 5)
    srcn = jnp.asarray(rng.randn(B, N, spec.in_dim).astype(np.float32))
    spos_t = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 5)
    idx = jnp.asarray(rng.randint(0, N, (B, L, K)).astype(np.int32))
    emb = jnp.asarray(rng.randn(B, L, K, ns).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, L, K) > 0.3)
    w1 = jnp.asarray(rng.randn(3 * ns, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, spec.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(spec.weight_numel).astype(np.float32) * 0.1)

    want = tpconv_rec.fused_tpconv_cross(
        recv, rpos, srcn, spos_t, idx, emb, mask, w1, b1, w2, b2, irreps, irreps, ns,
        interpret=True, use_bf16=False,
    )
    got, got_rec = tpconv_lig.fused_tpconv_cross_rev(
        recv, rpos, srcn, spos_t, idx, emb, mask,
        w1, b1, w2, b2, None, None, None, None,
        irreps, irreps, ns, interpret=True, use_bf16=False,
    )
    assert got_rec is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------- #
# generalized in-kernel-gather variants (lmax=2, round-2 roadmap item 4)
# ---------------------------------------------------------------------- #


def test_rec_g_gather_matches_reference():
    """fused_tpconv_rec_g (in-kernel gather + lmax=2 sh + sigma add) matches
    the explicit gather + general XLA path; masked self-edges contribute
    zero; a fully-masked receiver tile comes back zero."""
    from confidence_bootstrapping_tpu.ops.graph_builders import gather_nodes
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    sh_irr = "1x0e + 1x1o + 1x2e"
    ns = 8
    Din = Irreps(irreps).dim
    B, N, K, H = 2, 16, 4, 28
    rng = np.random.RandomState(41)
    node = jnp.asarray(rng.randn(B, N, Din).astype(np.float32))
    pos = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 5)
    nbr_np = rng.randint(0, N, (B, N, K))
    nbr_np[0, 3, 1] = 3
    mask_np = rng.rand(B, N, K) > 0.3
    mask_np[0, 3, 1] = False
    mask_np[1, 8:16] = False  # fully-masked receiver tile (tile_n=8)
    nbr = jnp.asarray(nbr_np.astype(np.int32))
    mask = jnp.asarray(mask_np)
    emb = jnp.asarray(rng.randn(B, N, K, ns).astype(np.float32))
    sig = jnp.asarray(rng.randn(B, ns).astype(np.float32) * 0.3)
    tp = WeightedTensorProduct(irreps, sh_irr, irreps)
    w1 = jnp.asarray(rng.randn(3 * ns, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, tp.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(tp.weight_numel).astype(np.float32) * 0.1)

    sender = gather_nodes(node, nbr)
    spos = gather_nodes(pos, nbr)
    sh = spherical_harmonics(sh_irr, spos - pos[:, :, None, :])
    eattr = jnp.concatenate(
        [emb + sig[:, None, None, :], jnp.broadcast_to(node[:, :, None, :ns], sender[..., :ns].shape), sender[..., :ns]],
        axis=-1,
    )
    want, _ = _xla_reference_g(
        eattr.reshape(B * N, K, -1), sender.reshape(B * N, K, -1), sh.reshape(B * N, K, -1),
        mask.reshape(B * N, K), w1, b1, w2, b2, irreps, sh_irr, irreps,
    )
    want = want.reshape(B, N, -1)

    got = tpconv_g.fused_tpconv_rec_g(
        node, pos, nbr, emb, sig, mask, w1, b1, w2, b2, irreps, sh_irr, irreps, ns,
        tile_n=8, interpret=True, use_bf16=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)
    assert float(np.abs(np.asarray(got)[1, 8:16]).max()) == 0.0


def test_cross_g_gather_matches_reference():
    """fused_tpconv_cross_g: hetero receivers (lig <- atom) at lmax=2."""
    from confidence_bootstrapping_tpu.ops.graph_builders import gather_nodes
    from confidence_bootstrapping_tpu.ops.irreps import spherical_harmonics

    irreps = "8x0e + 3x1o + 3x1e + 2x0o"
    sh_irr = "1x0e + 1x1o + 1x2e"
    ns = 8
    Din = Irreps(irreps).dim
    B, L, N, K, H = 2, 8, 32, 4, 28
    rng = np.random.RandomState(43)
    recv = jnp.asarray(rng.randn(B, L, Din).astype(np.float32))
    rpos = jnp.asarray(rng.randn(B, L, 3).astype(np.float32) * 5)
    srcn = jnp.asarray(rng.randn(B, N, Din).astype(np.float32))
    spos_t = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 5)
    idx = jnp.asarray(rng.randint(0, N, (B, L, K)).astype(np.int32))
    emb = jnp.asarray(rng.randn(B, L, K, ns).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, L, K) > 0.3)
    tp = WeightedTensorProduct(irreps, sh_irr, irreps)
    w1 = jnp.asarray(rng.randn(3 * ns, H).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, tp.weight_numel).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(tp.weight_numel).astype(np.float32) * 0.1)

    sender = gather_nodes(srcn, idx)
    sp = gather_nodes(spos_t, idx)
    sh = spherical_harmonics(sh_irr, sp - rpos[:, :, None, :])
    eattr = jnp.concatenate(
        [emb, jnp.broadcast_to(recv[:, :, None, :ns], sender[..., :ns].shape), sender[..., :ns]], axis=-1
    )
    want, _ = _xla_reference_g(
        eattr.reshape(B * L, K, -1), sender.reshape(B * L, K, -1), sh.reshape(B * L, K, -1),
        mask.reshape(B * L, K), w1, b1, w2, b2, irreps, sh_irr, irreps,
    )
    want = want.reshape(B, L, -1)
    got = tpconv_g.fused_tpconv_cross_g(
        recv, rpos, srcn, spos_t, idx, emb, mask, w1, b1, w2, b2, irreps, sh_irr, irreps, ns,
        interpret=True, use_bf16=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)
