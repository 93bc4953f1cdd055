"""Wan DiT structural/numeric invariants + tensor-parallel equivalence.

No in-env diffusers to oracle against (the reference consumes it as an
external dep), so these tests pin the documented semantics: sinusoidal
timestep embedding formula, 3D RoPE structure (norm preservation, axis
split, position distinctness), adaLN modulation wiring, unpatchify
round-trip, and exact equality of the TP-sharded forward vs replicated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vist3a_tpu.nn import wan_dit

TINY = wan_dit.WanDiTConfig(dim=48, ffn_dim=96, num_layers=2, num_heads=4,
                            freq_dim=32, text_dim=64)


@pytest.fixture(scope="module")
def tiny_dit():
    return wan_dit.init(jax.random.key(0), TINY)


def test_timestep_embedding_formula():
    """[cos | sin] of t·exp(−ln 1e4 · i/half) — diffusers Timesteps with
    flip_sin_to_cos=True, downscale_freq_shift=0."""
    t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    half = 16
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = t[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], -1)
    got = np.asarray(wan_dit.timestep_embedding(jnp.asarray(t), 32))
    # fp32 sin/cos of args up to ~1000 rounds at ~1e-5
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_rope_structure():
    cos, sin = wan_dit.rope_tables(TINY, 3, 4, 5)
    d = TINY.head_dim
    assert cos.shape == (3 * 4 * 5, d // 2)
    # rotation preserves norms
    x = jax.random.normal(jax.random.key(1), (1, 60, 4, d))
    y = wan_dit.apply_rope(x, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)
    # position 0 is identity (angle 0)
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]),
                               rtol=1e-5, atol=1e-6)
    # all positions distinct
    ang = np.asarray(cos)
    assert len({tuple(np.round(r, 6)) for r in ang}) == ang.shape[0]
    # axis split: t pairs = d/2 − 2·(d//6)
    h_pairs = d // 6
    t_pairs = d // 2 - 2 * h_pairs
    # same (h,w), different t → only first t_pairs angles differ
    a0 = np.arccos(np.clip(ang[0], -1, 1))      # t=0,h=0,w=0
    a1 = np.arccos(np.clip(ang[20], -1, 1))     # t=1,h=0,w=0 (4*5=20)
    diff = np.abs(a0 - a1) > 1e-9
    assert diff[:t_pairs].any() and not diff[t_pairs:].any()


def test_forward_shapes_and_time_sensitivity(tiny_dit):
    b, c, t, h, w = 2, 16, 3, 8, 8
    latent = jax.random.normal(jax.random.key(2), (b, c, t, h, w))
    text = jax.random.normal(jax.random.key(3), (b, 7, TINY.text_dim))
    ts0 = jnp.zeros((b,))
    ts1 = jnp.full((b,), 999.0)

    fn = jax.jit(lambda p, l, ts, tx: wan_dit.forward(p, l, ts, tx, TINY))
    out0 = fn(tiny_dit, latent, ts0, text)
    out1 = fn(tiny_dit, latent, ts1, text)
    assert out0.shape == (b, 16, t, h, w)
    assert np.isfinite(np.asarray(out0)).all()
    # adaLN conditions on the timestep
    assert float(jnp.mean(jnp.abs(out0 - out1))) > 1e-4
    # ...and on the text
    out2 = fn(tiny_dit, latent, ts0,
              jax.random.normal(jax.random.key(9), text.shape))
    assert float(jnp.mean(jnp.abs(out0 - out2))) > 1e-4


def test_unpatchify_inverts_patchify(tiny_dit):
    """proj_out = identity on a per-patch basis ⇒ output reproduces the
    patch content ordering (checks the transpose/reshape wiring)."""
    cfg = TINY
    b, t, h, w = 1, 2, 4, 4
    gt, gh, gw = t, h // 2, w // 2
    n = gt * gh * gw
    x = jax.random.normal(jax.random.key(4), (b, n, 16 * 1 * 2 * 2))
    # inline the unpatchify tail from wan_dit.forward
    y = x.reshape(b, gt, gh, gw, 1, 2, 2, 16)
    y = y.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(b, 16, t, h, w)
    # invert: patch (1,2,2) extraction must recover x
    z = y.reshape(b, 16, gt, 1, gh, 2, gw, 2)
    z = z.transpose(0, 2, 4, 6, 3, 5, 7, 1).reshape(b, n, 1 * 2 * 2 * 16)
    # channel-last vs channel-first element order inside a patch differs;
    # compare as sets per patch position via sorting
    np.testing.assert_allclose(np.sort(np.asarray(z), -1),
                               np.sort(np.asarray(x), -1), rtol=1e-6)


def test_tensor_parallel_matches_replicated(tiny_dit, mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, c, t, h, w = 4, 16, 3, 8, 8   # divisible by the data axis (4)
    latent = jax.random.normal(jax.random.key(5), (b, c, t, h, w))
    text = jax.random.normal(jax.random.key(6), (b, 7, TINY.text_dim))
    ts = jnp.full((b,), 500.0)

    want = wan_dit.forward(tiny_dit, latent, ts, text, TINY)

    specs = wan_dit.param_shardings(TINY)
    sharded = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh8, s)),
        tiny_dit, specs,
        is_leaf=lambda x: isinstance(x, P))
    data_sh = NamedSharding(mesh8, P("data"))
    fn = jax.jit(lambda p, l, ts, tx: wan_dit.forward(p, l, ts, tx, TINY),
                 out_shardings=data_sh)
    got = fn(sharded, jax.device_put(latent, data_sh), ts, text)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_grad_flows(tiny_dit):
    latent = jax.random.normal(jax.random.key(7), (1, 16, 3, 8, 8))
    text = jax.random.normal(jax.random.key(8), (1, 5, TINY.text_dim))

    def loss(p):
        out = wan_dit.forward(p, latent, jnp.array([300.0]), text, TINY)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(tiny_dit)
    gn = float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0
