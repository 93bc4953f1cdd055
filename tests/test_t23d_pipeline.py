"""End-to-end text→3DGS pipeline at tiny scale: UMT5 → UniPC/CFG denoise →
VAE decode → stitched decoder → orbit video + PLY.  Random weights — checks
plumbing, shapes, finiteness, and artifact round-trips, not quality."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_stitched_model import tiny_encoder_cfg
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.nn import umt5 as umt5_mod
from vist3a_tpu.nn import wan_dit, wan_vae
from vist3a_tpu.pipelines import t23d
from vist3a_tpu.stitch import chopped_anysplat as ca


@pytest.fixture(scope="module")
def tiny_cfg():
    vae = wan_vae.WanVAEConfig(base_dim=8, z_dim=16, num_res_blocks=1)
    scfg = ca.StitchedConfig(encoder=tiny_encoder_cfg(),
                             stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1",
                             vae=vae)
    return t23d.T23DConfig(
        width=64, height=64, num_frames=13, num_inference_steps=4,
        guidance_scale=3.0,
        dit=wan_dit.WanDiTConfig(dim=48, ffn_dim=96, num_layers=2,
                                 num_heads=4, freq_dim=32, text_dim=40),
        umt5=umt5_mod.UMT5Config(vocab_size=64, d_model=40, d_kv=10,
                                 num_heads=4, d_ff=64, num_layers=2,
                                 max_sequence_length=32),
        vae=vae, stitched=scfg, feedforward_size=56)


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    cfg = tiny_cfg
    return {
        "umt5": umt5_mod.init(jax.random.key(0), cfg.umt5),
        "dit": wan_dit.init(jax.random.key(1), cfg.dit),
        "vae": wan_vae.init(jax.random.key(2), cfg.vae),
        "encoder": enc_mod.init(jax.random.key(3), cfg.stitched.encoder),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(4), cfg.stitched),
    }


def fake_tokenize(cfg):
    def tok(text):
        rng = np.random.default_rng(abs(hash(text)) % 2 ** 31)
        n = cfg.umt5.max_sequence_length
        ids = rng.integers(0, cfg.umt5.vocab_size, (1, n))
        mask = np.zeros((1, n), np.int64)
        mask[0, : min(len(text.split()), n)] = 1
        return ids, mask
    return tok


def test_latent_shape(tiny_cfg):
    assert tiny_cfg.latent_shape == (1, 16, 4, 8, 8)


def test_full_pipeline(tiny_cfg, tiny_params, tmp_path):
    cfg, params = tiny_cfg, tiny_params
    (gaussians, extr, intr), paths = t23d.text_to_3dgs(
        params, fake_tokenize(cfg), "a red chair in a garden",
        str(tmp_path / "scene"), cfg, orbit_t=1)   # small orbit: CI speed

    s, hw = cfg.num_frames, cfg.feedforward_size
    assert gaussians.means.shape == (1, s * hw * hw, 3)
    assert extr.shape == (1, s, 4, 4) and intr.shape == (1, s, 3, 3)
    for leaf in jax.tree.leaves((gaussians, extr, intr)):
        assert np.isfinite(np.asarray(leaf)).all()

    gs_mp4, depth_mp4, ply = paths
    assert os.path.getsize(gs_mp4) > 0 and os.path.getsize(depth_mp4) > 0

    from vist3a_tpu.io.ply_export import load_ply
    data = load_ply(ply)
    assert len(data["x"]) == s * hw * hw
    np.testing.assert_allclose(data["x"],
                               np.asarray(gaussians.means[0, :, 0]),
                               rtol=1e-5, atol=1e-6)
    # wxyz quats, normalized
    q = np.stack([data[f"rot_{i}"] for i in range(4)], -1)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-4)
    # log scales round-trip
    np.testing.assert_allclose(np.exp(data["scale_0"]),
                               np.asarray(gaussians.scales[0, :, 0]),
                               rtol=1e-4, atol=1e-7)


def test_full_pipeline_orbit_small(tiny_cfg, tiny_params, tmp_path,
                                   monkeypatch):
    """Orbit with t=1 interpolation (fast) — frame count (V−1)·2+1."""
    cfg, params = tiny_cfg, tiny_params
    cond, uncond = t23d.embed_prompts(params["umt5"], fake_tokenize(cfg),
                                      "a blue car", cfg)
    latents = t23d.denoise(params["dit"], cond, uncond, cfg,
                           jax.random.key(7))
    assert latents.shape == cfg.latent_shape
    assert np.isfinite(np.asarray(latents)).all()
    out, video = t23d.decode_and_reconstruct(params, latents, cfg)
    assert video.shape == (1, 3, 13, 64, 64)
    assert float(jnp.max(jnp.abs(video))) <= 1.0

    from vist3a_tpu.io.video_export import interpolate_cameras
    ex, kk = interpolate_cameras(np.asarray(out.extrinsic_c2w),
                                 np.asarray(out.intrinsic_norm), t=1)
    assert ex.shape[1] == (13 - 1) * 2 + 1
    # interpolated rotations are orthogonal
    rot = ex[0, :, :3, :3]
    eye = np.einsum("vij,vkj->vik", rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
