import jax
import jax.numpy as jnp
import numpy as np

from vist3a_tpu.nn import aggregator as agg
from vist3a_tpu.nn import vit as vit_mod
from vist3a_tpu.nn.layers import block_apply, take_layer


def _small_cfg():
    return agg.AggregatorConfig(
        embed_dim=32, depth=4, num_heads=4, num_register_tokens=4,
        taps=(1, 3), attn_impl="xla",
    )


def test_expand_special_tokens_matches_reference_semantics():
    # (1,2,X,C): slot0 first frame, slot1 rest (`aggregator.py:376-399`)
    tok = jnp.asarray(np.arange(2 * 3 * 2).reshape(1, 2, 3, 2), jnp.float32)
    out = np.asarray(agg.expand_special_tokens(tok, b=2, s=4))
    assert out.shape == (8, 3, 2)
    np.testing.assert_array_equal(out[0], np.asarray(tok[0, 0]))  # frame 0
    np.testing.assert_array_equal(out[1], np.asarray(tok[0, 1]))  # frames 1..3
    np.testing.assert_array_equal(out[3], np.asarray(tok[0, 1]))
    np.testing.assert_array_equal(out[4], np.asarray(tok[0, 0]))  # next batch

def test_trunk_taps_match_explicit_loop():
    cfg = _small_cfg()
    params = agg.init(jax.random.key(0), cfg)
    b, s, gh, gw = 2, 3, 2, 2
    p = cfg.patch_start_idx + gh * gw
    tokens = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, s, p, cfg.embed_dim)),
        jnp.float32,
    )

    final, taps = agg.run_trunk(params, tokens, cfg, (gh, gw), remat=False)

    # explicit loop with the same primitives
    blk = cfg.block_config()
    rope_f, rope_g = agg.rope_tables(cfg, gh, gw, n_frames=s)
    x = tokens
    want_taps = []
    for i in range(cfg.depth):
        fp = take_layer(params["frame_blocks"], i)
        gp = take_layer(params["global_blocks"], i)
        xf = block_apply(fp, x.reshape(b * s, p, cfg.embed_dim), blk, *rope_f)
        frame_out = xf.reshape(b, s, p, cfg.embed_dim)
        xg = block_apply(gp, frame_out.reshape(b, s * p, cfg.embed_dim), blk, *rope_g)
        x = xg.reshape(b, s, p, cfg.embed_dim)
        if i in cfg.taps:
            want_taps.append(jnp.concatenate([frame_out, x], axis=-1))

    np.testing.assert_allclose(np.asarray(final), np.asarray(x), rtol=2e-5, atol=2e-5)
    assert len(taps) == 2
    for a, w in zip(taps, want_taps):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), rtol=2e-5, atol=2e-5)


def test_full_forward_shapes():
    cfg = _small_cfg()
    vit_cfg = vit_mod.ViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=4,
        attn_impl="xla",
    )
    aparams = agg.init(jax.random.key(0), cfg)
    vparams = vit_mod.init(jax.random.key(1), vit_cfg)
    images = jnp.asarray(
        np.random.default_rng(0).random((1, 3, 3, 28, 28)), jnp.float32
    )
    taps, psi = agg.forward(aparams, vparams, images, cfg, vit_cfg, remat=False)
    assert psi == 5
    p = 5 + 4  # special + 2x2 grid
    assert len(taps) == 2
    assert taps[0].shape == (1, 3, p, 64)
    assert np.isfinite(np.asarray(taps[-1])).all()


def test_vit_pos_embed_interpolation_identity_and_resize():
    cfg = vit_mod.ViTConfig(img_size=28, patch_size=14, embed_dim=16, depth=1,
                            num_heads=2, attn_impl="xla")
    params = vit_mod.init(jax.random.key(0), cfg)
    pe = params["pos_embed"]
    same = vit_mod.interpolate_pos_embed(pe, 2, 2)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pe))
    up = vit_mod.interpolate_pos_embed(pe, 3, 5)
    assert up.shape == (1, 16, 16)


def test_vit_block_taps_offsets():
    cfg = vit_mod.ViTConfig(img_size=28, patch_size=14, embed_dim=16, depth=3,
                            num_heads=2, attn_impl="xla")
    params = vit_mod.init(jax.random.key(0), cfg)
    images = jnp.asarray(np.random.default_rng(0).random((2, 3, 28, 28)), jnp.float32)
    feats, taps = vit_mod.forward_with_block_taps(params, images, [0, 2], cfg,
                                                  remat=False)
    assert set(taps) == {"enc_blocks_1", "enc_blocks_3"}
    # 1 cls + 4 reg + 4 patches
    assert taps["enc_blocks_1"].shape == (2, 9, 16)
    assert feats["patch"].shape == (2, 4, 16)


def test_run_trunk_tap_modes_agree():
    """ys-mode and carry-mode (one unbroken scan — the inference decode
    forms) must equal split-mode (scan segments — the training form), and
    `auto` must pick correctly (remat→split, no-remat→carry)."""
    cfg = agg.AggregatorConfig(embed_dim=32, depth=5, num_heads=2,
                               taps=(1, 3, 4), attn_impl="xla")
    params = agg.init(jax.random.key(0), cfg)
    tokens = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 2, 4 + 5, 32)), jnp.float32)
    out_s, taps_s = agg.run_trunk(params, tokens, cfg, (2, 2), remat=False,
                                  tap_mode="split")
    out_y, taps_y = agg.run_trunk(params, tokens, cfg, (2, 2), remat=False,
                                  tap_mode="ys")
    out_c, taps_c = agg.run_trunk(params, tokens, cfg, (2, 2), remat=False,
                                  tap_mode="carry")
    out_a, taps_a = agg.run_trunk(params, tokens, cfg, (2, 2), remat=True)
    for o in (out_y, out_c, out_a):
        np.testing.assert_allclose(np.asarray(o), np.asarray(out_s),
                                   atol=1e-6)
    assert len(taps_y) == len(taps_c) == len(taps_a) == len(taps_s) == 3
    for ty, tc, ts, ta in zip(taps_y, taps_c, taps_s, taps_a):
        for t in (ty, tc, ta):
            np.testing.assert_allclose(np.asarray(t), np.asarray(ts),
                                       atol=1e-6)
