import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vist3a_tpu.kernels.flash_attention import flash_attention
from vist3a_tpu.ops.attention import _xla_attention, dot_product_attention
from vist3a_tpu.ops.rope import apply_rope2d, grid_positions, rope2d_cos_sin


def _ref_attention(q, k, v, scale=None):
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    logits = np.einsum("bnhd,bmhd->bhnm", q, k).astype(np.float64) * scale
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("bhnm,bmhd->bnhd", probs, v)


@pytest.mark.parametrize("n,d", [(256, 64), (200, 64), (384, 128)])
def test_flash_matches_reference(rng, n, d):
    q = rng.standard_normal((2, n, 3, d)).astype(np.float32)
    k = rng.standard_normal((2, n, 3, d)).astype(np.float32)
    v = rng.standard_normal((2, n, 3, d)).astype(np.float32)
    ref = _ref_attention(q, k, v)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)
    out_xla = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out_xla), ref, rtol=2e-2, atol=2e-2)


def test_flash_grad_matches_xla(rng):
    n, d = 192, 64
    q = jnp.asarray(rng.standard_normal((1, n, 2, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, n, 2, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, n, 2, d)), dtype=jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v)))

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-2)


def test_dispatcher_xla_path(rng):
    q = jnp.asarray(rng.standard_normal((1, 64, 2, 32)), dtype=jnp.float32)
    out = dot_product_attention(q, q, q, impl="xla")
    assert out.shape == q.shape


@pytest.mark.parametrize("layout,d", [("transposed", 64), ("natural", 128)])
def test_flash_ragged_and_extreme_scales(rng, layout, d):
    """Bound-max softmax (transposed) / mask-elided base-2 (natural) under
    the conditions that would break a wrong max bound or a wrong mask:
    ragged key counts, tiny and huge q/k magnitudes, and a zero q row."""
    n_q, n_k = 160, 303                       # ragged: key padding required
    for mag in (1e-3, 1.0, 30.0):
        q = (rng.standard_normal((1, n_q, 2, d)) * mag).astype(np.float32)
        k = (rng.standard_normal((1, n_k, 2, d)) * mag).astype(np.float32)
        v = rng.standard_normal((1, n_k, 2, d)).astype(np.float32)
        q[0, 0] = 0.0                         # zero row → uniform attention
        ref = _ref_attention(q, k, v)
        out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              block_q=128, block_k=128, interpret=True,
                              layout=layout)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("layout,d", [("transposed", 64), ("natural", 128)])
def test_flash_grad_ragged_all_inputs(rng, layout, d):
    """dQ/dK/dV parity for both layouts at a ragged shape (key padding in
    the backward kernels) against the XLA closed form."""
    n_q, n_k = 160, 303
    q = jnp.asarray(rng.standard_normal((1, n_q, 2, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, n_k, 2, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, n_k, 2, d)), dtype=jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True, layout=layout)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v)))

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_flash_bf16_bound_margin(rng):
    """bf16 inputs at hot magnitudes (logit std ≈ 64 → near-one-hot rows):
    the folded-bound margin must keep everything finite, and the kernel must
    match a reference fed the SAME bf16-rounded pre-scaled q (the one extra
    rounding the folding applies — near-tie argmax flips from that rounding
    are input noise, not kernel error)."""
    q = jnp.asarray(rng.standard_normal((1, 256, 2, 64)) * 8.0, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 256, 2, 64)) * 8.0, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 256, 2, 64)), jnp.bfloat16)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True,
                          layout="transposed").astype(jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
    scale = 64 ** -0.5
    log2e = 1.4426950408889634
    q_rounded = (np.asarray(q, np.float32) * (scale * log2e)).astype(
        jnp.bfloat16).astype(np.float32) / (scale * log2e)
    ref = _ref_attention(q_rounded, np.asarray(k, np.float32),
                         np.asarray(v, np.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=6e-2, atol=6e-2)
    # and the true-input reference is still matched in aggregate (no
    # catastrophic underflow / zeroed rows)
    ref_true = _ref_attention(np.asarray(q, np.float32),
                              np.asarray(k, np.float32),
                              np.asarray(v, np.float32))
    assert np.abs(np.asarray(out) - ref_true).mean() < 1e-2


def test_rope2d_matches_reference_formula():
    """Cross-check against a direct port of the reference math
    (`vggt/layers/rope.py:86-188`) computed in numpy."""
    D = 64
    pos = grid_positions(4, 5, special=2)
    cos, sin = rope2d_cos_sin(pos, D, base=100.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, pos.shape[0], D)).astype(np.float32)

    # reference math
    half = D // 2
    exponents = np.arange(0, half, 2, dtype=np.float64) / half
    inv_freq = 1.0 / (100.0 ** exponents)
    max_pos = pos.max() + 1
    angles = np.arange(max_pos)[:, None] * inv_freq[None, :]
    angles = np.concatenate([angles, angles], -1)
    cos_t, sin_t = np.cos(angles), np.sin(angles)

    def rot(h):
        h1, h2 = h[..., : half // 2], h[..., half // 2:]
        return np.concatenate([-h2, h1], -1)

    vert, horiz = x[..., :half], x[..., half:]
    cy, sy = cos_t[pos[:, 0]], sin_t[pos[:, 0]]
    cx, sx = cos_t[pos[:, 1]], sin_t[pos[:, 1]]
    ref = np.concatenate(
        [vert * cy + rot(vert) * sy, horiz * cx + rot(horiz) * sx], -1
    )

    out = apply_rope2d(jnp.asarray(x), cos, sin)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # special tokens (pos 0,0) are unrotated
    np.testing.assert_allclose(np.asarray(out)[:, :, :2], x[:, :, :2], rtol=1e-6)
