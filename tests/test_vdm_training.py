"""VDM reward-training step at tiny scale: LoRA targeting, truncated
rollout gradients, non-finite step skip, EMA, full step end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_stitched_model import tiny_encoder_cfg
from vist3a_tpu.nn import clip as clip_mod
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.nn import wan_dit, wan_vae
from vist3a_tpu.stitch import chopped_anysplat as ca
from vist3a_tpu.stitch import lora as lora_mod
from vist3a_tpu.train import reward as reward_mod
from vist3a_tpu.train import vdm

DIT = wan_dit.WanDiTConfig(dim=48, ffn_dim=96, num_layers=2, num_heads=4,
                           freq_dim=32, text_dim=24)
VAE = wan_vae.WanVAEConfig(base_dim=8, z_dim=16, num_res_blocks=1)
CLIP_TINY = clip_mod.CLIPVisionConfig(hidden_size=32, num_layers=2,
                                      num_heads=4, mlp_dim=64, patch_size=8,
                                      image_size=32, projection_dim=16)


def test_lora_targets_only_attention():
    dit = wan_dit.init(jax.random.key(0), DIT)
    cfg = vdm.VDMTrainConfig()
    sites = lora_mod.lora_sites(dit["blocks"], cfg.lora)
    names = {"/".join(map(str, p)) for p, _, _ in sites}
    assert names == {"attn1/q", "attn1/k", "attn1/v", "attn1/o",
                     "attn2/q", "attn2/k", "attn2/v", "attn2/o"}
    assert cfg.lora.r == 8 and cfg.lora.alpha == 16


def test_synced_randomness_deterministic():
    key = jax.random.key(0)
    a = vdm.choose_and_sync_steps(key, 7, 10, 50)
    b = vdm.choose_and_sync_steps(key, 7, 10, 50)
    assert a == b and 10 <= a <= 50
    assert vdm.choose_and_sync_steps(key, 20) == 50      # every 10th step
    i1 = vdm.choose_and_sync_two_indices(key, 7, 12)
    assert len(i1) == 2 and i1[0] != i1[1]
    g = vdm.choose_guidance_scale(key, 7)
    assert 4.0 <= g <= 6.0


def test_rollout_grad_only_through_chosen_steps():
    dit = wan_dit.init(jax.random.key(0), DIT)
    cfg = vdm.VDMTrainConfig(enable_rl=True)
    state = vdm.init_train_state(jax.random.key(1), dit, cfg)
    cond = jax.random.normal(jax.random.key(2), (1, 5, DIT.text_dim))
    uncond = jnp.zeros_like(cond)
    lat0 = jax.random.normal(jax.random.key(3), (1, 16, 2, 8, 8))

    def out_sum(lora, backprop):
        merged = vdm.merged_dit(dit, lora, cfg)
        lat = vdm.rollout(merged, lat0, cond, uncond, DIT, num_steps=4,
                          guidance_scale=5.0, backprop_steps=backprop)
        return jnp.sum(lat ** 2)

    g_some = jax.grad(lambda l: out_sum(l, [0, 2]))(state.lora)
    gn_some = float(jnp.sqrt(sum(jnp.sum(x ** 2)
                                 for x in jax.tree.leaves(g_some))))
    assert np.isfinite(gn_some) and gn_some > 0


def test_bucket_rollout_steps():
    assert vdm.bucket_rollout_steps(13, 10, 50) == 20
    assert vdm.bucket_rollout_steps(10, 10, 50) == 10
    assert vdm.bucket_rollout_steps(41, 10, 50) == 50
    assert vdm.bucket_rollout_steps(50, 10, 50) == 50
    assert vdm.bucket_rollout_steps(7, 0, 50) == 7          # disabled
    # the deployed draw range collapses to exactly 5 compiled variants
    lens = {vdm.bucket_rollout_steps(n, 10, 50) for n in range(10, 51)}
    assert lens == {10, 20, 30, 40, 50}


def test_rollout_mask_matches_index_form():
    """The affine-replay index form (training path: record + K-step batched
    re-eval + `unipc.replay_affine`) must reproduce the masked-scan oracle
    (the literal reference semantics) exactly — same value AND gradient."""
    dit = wan_dit.init(jax.random.key(0), DIT)
    cfg = vdm.VDMTrainConfig(enable_rl=True)
    state = vdm.init_train_state(jax.random.key(1), dit, cfg)
    cond = jax.random.normal(jax.random.key(2), (1, 5, DIT.text_dim))
    uncond = jnp.zeros_like(cond)
    lat0 = jax.random.normal(jax.random.key(3), (1, 16, 2, 8, 8))
    merged = vdm.merged_dit(dit, state.lora, cfg)

    def out_idx(lora):
        m = vdm.merged_dit(dit, lora, cfg)
        return jnp.sum(vdm.rollout(m, lat0, cond, uncond, DIT, num_steps=4,
                                   guidance_scale=5.0,
                                   backprop_steps=[0, 2]) ** 2)

    mask = jnp.asarray([1.0, 0.0, 1.0, 1.0])   # {0,2} + forced last

    def out_mask(lora):
        m = vdm.merged_dit(dit, lora, cfg)
        return jnp.sum(vdm.rollout(m, lat0, cond, uncond, DIT, num_steps=4,
                                   guidance_scale=5.0,
                                   backprop_mask=mask) ** 2)

    va, ga = jax.value_and_grad(out_idx)(state.lora)
    vb, gb = jax.value_and_grad(out_mask)(state.lora)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        # the index form re-evaluates the chosen steps in ONE B=2K batched
        # call — same math, different fp32 reduction order than the per-step
        # masked backward (measured ≤5e-6 abs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)

    # traced (3,) idx (the jitted-step form) must match the static list
    def out_traced(lora, idx):
        m = vdm.merged_dit(dit, lora, cfg)
        return jnp.sum(vdm.rollout(m, lat0, cond, uncond, DIT, num_steps=4,
                                   guidance_scale=5.0,
                                   backprop_idx=idx) ** 2)

    vc, gc = jax.value_and_grad(out_traced)(
        state.lora, jnp.asarray([0, 2, 3], jnp.int32))
    np.testing.assert_allclose(float(vc), float(va), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(ga)):
        # the index form re-evaluates the chosen steps in ONE B=2K batched
        # call — same math, different fp32 reduction order than the per-step
        # masked backward (measured ≤5e-6 abs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)

    # a drawn step colliding with the forced last step must contribute ONE
    # gradient term (the reference chooses a SET of steps)
    def out_mask13(lora):
        m = vdm.merged_dit(dit, lora, cfg)
        return jnp.sum(vdm.rollout(m, lat0, cond, uncond, DIT, num_steps=4,
                                   guidance_scale=5.0,
                                   backprop_mask=jnp.asarray(
                                       [0.0, 1.0, 0.0, 1.0])) ** 2)

    vd, gd = jax.value_and_grad(out_traced)(
        state.lora, jnp.asarray([1, 3, 3], jnp.int32))
    ve, ge = jax.value_and_grad(out_mask13)(state.lora)
    np.testing.assert_allclose(float(vd), float(ve), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(ge)):
        # the index form re-evaluates the chosen steps in ONE B=2K batched
        # call — same math, different fp32 reduction order than the per-step
        # masked backward (measured ≤5e-6 abs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)


def test_augment_camera_prompt():
    rng = np.random.default_rng(0)
    outs = {vdm.augment_camera_prompt(np.random.default_rng(i), "a cat")
            for i in range(60)}
    assert len(outs) > 20                      # diverse templates
    assert all("a cat" in o for o in outs)
    assert len(vdm.camera_prompt_templates("x")) == 83


@pytest.mark.slow
def test_full_vdm_step(tmp_path):
    ecfg = tiny_encoder_cfg()
    scfg = ca.StitchedConfig(encoder=ecfg, stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1",
                             vae=VAE)
    dit = wan_dit.init(jax.random.key(0), DIT)
    vae = wan_vae.init(jax.random.key(1), VAE)
    stitched = {
        "encoder": enc_mod.init(jax.random.key(2), ecfg),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(3), scfg),
    }
    pick = clip_mod.init(jax.random.key(4), CLIP_TINY)
    pe = clip_mod.init(jax.random.key(5), CLIP_TINY)
    text_feat = jax.random.normal(jax.random.key(6), (1, 16))
    text_feat = text_feat / jnp.linalg.norm(text_feat)
    rcfg = reward_mod.RewardConfig(pick_cfg=CLIP_TINY, pe_cfg=CLIP_TINY)
    # no bound text: per-prompt features ride as runtime args (the CLI path)
    loss_fn = reward_mod.make_loss_fn(pick, pe, logit_scale=100.0,
                                      cfg=rcfg)

    cfg = vdm.VDMTrainConfig(enable_rl=True, rollout_steps_low=3,
                             rollout_steps_high=3)
    state = vdm.init_train_state(jax.random.key(7), dit, cfg)

    # 64² video, 5 frames → latent (1,16,2,8,8); stitched images 56²
    video = jax.random.uniform(jax.random.key(8), (1, 3, 5, 64, 64),
                               minval=-1, maxval=1)
    sft_text = jax.random.normal(jax.random.key(9), (1, 5, DIT.text_dim))

    lora_before = jax.tree.map(lambda x: np.asarray(x), state.lora)
    misses0 = vdm._vdm_step_jit.cache_info().misses
    state2, metrics = vdm.vdm_train_step(
        state, dit, vae, stitched,
        video=video, sft_text=sft_text, rl_cond=sft_text[:, :5],
        rl_uncond=jnp.zeros_like(sft_text[:, :5]),
        reward_loss_fn=loss_fn, key=jax.random.key(10), dit_cfg=DIT,
        vae_cfg=VAE, scfg=scfg, cfg=cfg, latent_shape=(1, 16, 2, 8, 8),
        render_size=56, reward_text=(text_feat, text_feat))

    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["reward_loss"]) != 0.0
    assert not bool(metrics["skipped"])
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(lora_before),
                        jax.tree.leaves(state2.lora)))
    assert moved
    # EMA moved toward the new lora
    assert any(float(jnp.sum(jnp.abs(e))) > 0
               for e in jax.tree.leaves(state2.ema))

    # step 2: different prompt features + different backprop draw must hit
    # the SAME compiled variant (mask + text are runtime args)
    text2 = jax.random.normal(jax.random.key(11), (1, 16))
    text2 = text2 / jnp.linalg.norm(text2)
    state3, m3 = vdm.vdm_train_step(
        state2, dit, vae, stitched,
        video=video, sft_text=sft_text, rl_cond=sft_text[:, :5],
        rl_uncond=jnp.zeros_like(sft_text[:, :5]),
        reward_loss_fn=loss_fn, key=jax.random.key(10), dit_cfg=DIT,
        vae_cfg=VAE, scfg=scfg, cfg=cfg, latent_shape=(1, 16, 2, 8, 8),
        render_size=56, reward_text=(text2, text2))
    assert int(state3.step) == 2
    assert np.isfinite(float(m3["total_loss"]))
    assert vdm._vdm_step_jit.cache_info().misses == misses0 + 1
