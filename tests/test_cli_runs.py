"""CLI run() cores at tiny scale: stitching training loop with checkpoint
round-trip, layer search over synthetic data, torch-checkpoint LoRA
rehydration."""

import argparse
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_stitched_model import tiny_encoder_cfg
from vist3a_tpu.cli import find_layer, train_stitching
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.nn import wan_vae
from vist3a_tpu.stitch import chopped_anysplat as ca
from vist3a_tpu.stitch import lora as lora_mod
from vist3a_tpu.stitch.conv_spec import parse_conv_spec
from vist3a_tpu.train import stitching as st

VAE = wan_vae.WanVAEConfig(base_dim=8, z_dim=16, num_res_blocks=1)


class FakeClipLoader:
    """Yields synthetic (vae, feedforward) clips like the stitching loader."""

    def __init__(self, n_batches, n_views=9, vae_hw=64, ff_hw=56, bs=1):
        self.n = n_batches
        self.shape = (bs, 3, n_views, vae_hw, vae_hw)
        self.ff = (bs, 3, n_views, ff_hw, ff_hw)

    def __len__(self):
        return self.n

    def __iter__(self):
        rng = np.random.default_rng(0)
        for _ in range(self.n):
            yield {
                "vae_image_tensor":
                    (rng.random(self.shape, np.float32) * 2 - 1),
                "feedforward_image_tensor":
                    (rng.random(self.ff, np.float32) * 2 - 1),
            }


class FakeSampler:
    def set_epoch(self, e):
        pass


def test_train_stitching_run_and_resume(tmp_path, monkeypatch):
    # view counts must satisfy S ≡ 1 (mod 4); tiny: always 9
    monkeypatch.setattr(st, "VIEW_COUNTS", (9,))
    scfg = ca.StitchedConfig(encoder=tiny_encoder_cfg(),
                             stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1",
                             vae=VAE)
    params = {
        "encoder": enc_mod.init(jax.random.key(0), scfg.encoder),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(1), scfg),
        "vae": wan_vae.init(jax.random.key(2), VAE),
    }
    tcfg = st.StitchTrainConfig(lora_spec="r2,a4,d0.0,f0", warmup_steps=1,
                                total_steps=8)
    state, hist = train_stitching.run(
        params, scfg, FakeClipLoader(2), FakeSampler(), train_cfg=tcfg,
        num_epochs=1, save_path=tmp_path, key=jax.random.key(3),
        log_every=1)
    assert int(state.step) == 2
    assert len(hist) == 2
    assert all(np.isfinite(h["total_loss"]) for h in hist)

    # resume from the saved epoch
    state2, _ = train_stitching.run(
        params, scfg, FakeClipLoader(2), FakeSampler(), train_cfg=tcfg,
        num_epochs=1, resume_path=tmp_path, key=jax.random.key(3))
    assert int(state2.step) == 2        # epoch_start=1 ≥ num_epochs → no-op


def test_find_layer_run(tmp_path):
    from vist3a_tpu.nn import vit as vit_mod

    ecfg = tiny_encoder_cfg()
    vit_params = vit_mod.init(jax.random.key(0), ecfg.vit)
    vae_params = wan_vae.init(jax.random.key(1), VAE)
    spec = parse_conv_spec("conv3d_k5x3x3_o32_s1x2x2_p2x1x1")

    loader = FakeClipLoader(2, n_views=5, vae_hw=64, ff_hw=56)
    best, mses = find_layer.run(
        vit_params, vae_params, ecfg.vit, VAE, spec, loader,
        feature_save_path=tmp_path, iterations=2)
    assert best in mses and len(mses) == ecfg.vit.depth
    assert all(np.isfinite(v) for v in mses.values())
    assert (tmp_path / "features.npz").exists()
    assert (tmp_path / f"state_dict_{best}.npz").exists()

    # idempotent: second run loads the cache, same result
    best2, mses2 = find_layer.run(
        vit_params, vae_params, ecfg.vit, VAE, spec, loader,
        feature_save_path=tmp_path, iterations=2)
    assert best2 == best and mses2 == pytest.approx(mses)


def test_lora_from_flat_stacked_rehydration():
    """Torch checkpoint names → stacked lora tree; merge equals per-site
    manual delta."""
    ecfg = tiny_encoder_cfg()
    params = {"encoder": enc_mod.init(jax.random.key(0), ecfg)}
    d = ecfg.vit.embed_dim
    rng = np.random.default_rng(0)
    a3 = rng.standard_normal((2, d), np.float32)     # torch lora_A (r, in)
    b3 = rng.standard_normal((3 * d, 2), np.float32)  # torch lora_B (out, r)
    flat = {"encoder/vit/blocks/3/attn/qkv": {
        "a": jnp.asarray(a3.T), "b": jnp.asarray(b3.T)}}
    lora, biases = lora_mod.lora_from_flat(flat, params)
    fa = lora["encoder"]["vit"]["blocks"]["attn"]["qkv"]["a"]
    fb = lora["encoder"]["vit"]["blocks"]["attn"]["qkv"]["b"]
    assert fa.shape == (ecfg.vit.depth, d, 2)
    np.testing.assert_array_equal(np.asarray(fa[3]), a3.T)
    np.testing.assert_array_equal(np.asarray(fa[0]), 0)

    cfg = lora_mod.LoraConfig(r=2, alpha=4)
    merged = lora_mod.merge_lora(params["encoder"],
                                 lora["encoder"], cfg)
    w_old = np.asarray(params["encoder"]["vit"]["blocks"]["attn"]["qkv"]["w"])
    w_new = np.asarray(merged["vit"]["blocks"]["attn"]["qkv"]["w"])
    delta3 = (b3 @ a3).T * (4 / 2)
    np.testing.assert_allclose(w_new[3] - w_old[3], delta3, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(w_new[0], w_old[0], rtol=1e-6)
