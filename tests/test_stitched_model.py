"""Assembly tests: full encoder forward + chopped stitched forward.

Heads/aggregator/adapter numerics are parity-tested per-component elsewhere;
here we check the composition invariants from the reference forwards
(`models/anysplat_stitched.py:167-525`, `src/model/encoder/anysplat.py`):
shapes, confidence→opacity masking, chop consistency, and torch parity of the
align-corners trilinear pre-upsample.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.nn.aggregator import AggregatorConfig
from vist3a_tpu.nn.heads import CameraHeadConfig, DPTConfig, GSHeadConfig
from vist3a_tpu.nn.vit import ViTConfig
from vist3a_tpu.stitch import chopped_anysplat as ca


def tiny_encoder_cfg(**over):
    d, taps = 32, (0, 1, 2, 3)
    cfg = enc_mod.EncoderConfig(
        vit=ViTConfig(img_size=56, embed_dim=d, depth=4, num_heads=2),
        agg=AggregatorConfig(embed_dim=d, depth=4, num_heads=2, taps=taps),
        camera=CameraHeadConfig(dim_in=2 * d, trunk_depth=1, num_heads=2),
        depth=DPTConfig(dim_in=2 * d, features=16, out_channels=(8, 16, 16, 16),
                        head2_features=8),
        gs=GSHeadConfig(dim_in=2 * d, features=16, out_channels=(8, 16, 16, 16),
                        output_dim=84, head2_features=16, pos_embed=False),
        **over,
    )
    return cfg


@pytest.fixture(scope="module")
def tiny_full():
    cfg = tiny_encoder_cfg()
    params = enc_mod.init(jax.random.key(0), cfg)
    return cfg, params


def test_full_encoder_forward_shapes(tiny_full):
    cfg, params = tiny_full
    b, s, h = 1, 3, 56
    images = jax.random.uniform(jax.random.key(1), (b, s, 3, h, h))
    out = jax.jit(lambda p, x: enc_mod.forward(p, x, cfg))(params, images)

    g = s * h * h
    assert out.gaussians.means.shape == (b, g, 3)
    assert out.gaussians.harmonics.shape == (b, g, 3, 25)
    assert out.gaussians.opacities.shape == (b, g)
    assert len(out.pred_pose_enc_list) == 4
    assert out.pred_pose_enc_list[-1].shape == (b, s, 9)
    assert out.extrinsic_c2w.shape == (b, s, 4, 4)
    assert out.depth.shape == (b, s, h, h, 1)
    assert out.anchor_feats.shape == (b, s, 83, h, h)
    for leaf in jax.tree.leaves(out._asdict()):
        assert np.isfinite(np.asarray(leaf)).all()

    # c2w really is the inverse of the predicted w2c
    from vist3a_tpu.nn.geometry import pose_encoding_to_extri_intri
    ex, _ = pose_encoding_to_extri_intri(out.pred_pose_enc_list[-1], (h, h))
    prod = jnp.einsum("bsij,bsjk->bsik", out.extrinsic_c2w[..., :3, :3],
                      ex[..., :3, :3])
    np.testing.assert_allclose(np.asarray(prod),
                               np.broadcast_to(np.eye(3), (b, s, 3, 3)),
                               atol=1e-4)

    # conf quantile masking zeroes opacity of ~the bottom 10%
    mask = np.asarray(out.conf_valid_mask).reshape(b, -1)
    frac = mask.mean()
    assert 0.85 <= frac <= 0.95
    op = np.asarray(out.gaussians.opacities)
    assert (op[~mask.astype(bool).reshape(op.shape)] == 0).all()
    assert (op[mask.astype(bool).reshape(op.shape)] > 0).all()


def test_stitched_forward(tiny_full):
    cfg, enc_params = tiny_full
    scfg = ca.StitchedConfig(
        encoder=cfg, stitch_layer_index=2,
        conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1")
    params = {
        "encoder": enc_params,
        "stitch_conv": ca.init_stitch_conv(jax.random.key(2), scfg),
    }
    b, t_vae, hl = 1, 2, 8
    s = (t_vae - 1) * 4 + 1
    latent = jax.random.normal(jax.random.key(3), (b, 16, t_vae, hl, hl))
    images = jax.random.uniform(jax.random.key(4), (b, 3, s, 56, 56),
                                minval=-1, maxval=1)
    out = jax.jit(
        lambda p, z, im: ca.forward_with_latent(p, z, im, scfg)
    )(params, latent, images)
    g = s * 56 * 56
    assert out.gaussians.means.shape == (b, g, 3)
    assert np.isfinite(np.asarray(out.gaussians.means)).all()

    # gradient flows to the stitching conv (the trainable piece)
    def loss(conv_p):
        o = ca.forward_with_latent({**params, "stitch_conv": conv_p},
                                   latent, images, scfg)
        return jnp.sum(o.gaussians.opacities) + jnp.sum(o.depth)

    grads = jax.grad(loss)(params["stitch_conv"])
    assert float(jnp.abs(grads["kernel"]).max()) > 0


def test_chop_zero_equals_full_vit(tiny_full):
    """k=0 chop fed with patch-embed output == full ViT patch features."""
    from vist3a_tpu.nn import vit as vit_mod

    cfg, enc_params = tiny_full
    scfg = ca.StitchedConfig(encoder=cfg, stitch_layer_index=0)
    vit_params = enc_params["vit"]
    images = jax.random.uniform(jax.random.key(5), (2, 3, 56, 56))
    full = vit_mod.forward_features(vit_params, images, cfg.vit)["patch"]
    tokens = vit_mod.patch_embed(vit_params, images, cfg.vit)
    chopped = ca.chopped_vit_forward(vit_params, tokens, (4, 4), scfg)
    np.testing.assert_allclose(np.asarray(chopped), np.asarray(full),
                               atol=1e-5)


def test_pre_upsample_matches_torch(rng):
    import torch

    x = rng.normal(0, 1, (2, 16, 4, 8, 8)).astype(np.float32)
    got = ca.pre_upsample(jnp.asarray(x),
                          ca.StitchedConfig(encoder=tiny_encoder_cfg()))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=[13, 8, 8], mode="trilinear",
        align_corners=True).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # spatial upsample too
    got2 = ca.resize_align_corners_nd(jnp.asarray(x), {2: 13, 3: 16, 4: 16})
    want2 = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=[13, 16, 16], mode="trilinear",
        align_corners=True).numpy()
    np.testing.assert_allclose(np.asarray(got2), want2, atol=1e-5)


def test_point_head_branch():
    """pred_head_type="point" (`anysplat.py:108,428-433`): DPT xyz head
    replaces depth+unprojection; depth output is the points' z."""
    d = 32
    cfg = tiny_encoder_cfg(
        pred_head_type="point",
        point=DPTConfig(dim_in=2 * d, features=16,
                        out_channels=(8, 16, 16, 16), head2_features=8,
                        activation="inv_log", conf_activation="expp1",
                        output_dim=4),
    )
    params = enc_mod.init(jax.random.key(0), cfg)
    assert "point_head" in params
    b, s, h = 1, 3, 56
    images = jax.random.uniform(jax.random.key(1), (b, s, 3, h, h))
    out = jax.jit(lambda p, x: enc_mod.forward(p, x, cfg))(params, images)
    assert out.depth.shape == (b, s, h, h, 1)
    assert out.depth_conf.shape == (b, s, h, h)
    means = np.asarray(out.gaussians.means).reshape(b, s, h, h, 3)
    np.testing.assert_allclose(np.asarray(out.depth[..., 0]),
                               means[..., 2], rtol=2e-5, atol=1e-6)
    # inv_log activation: conf = 1 + exp(raw) > 1 everywhere
    assert float(out.depth_conf.min()) > 1.0
