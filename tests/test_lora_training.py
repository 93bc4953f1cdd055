"""LoRA functional parity + stitching train-step tests.

LoRA numerics are checked against the reference Microsoft-LoRA fork
(`utils/lora_util/layers.py`) loaded via ref_loader; the train step is
smoke-tested end-to-end on the 8-device CPU mesh with a data-sharded batch.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_stitched_model import tiny_encoder_cfg
from vist3a_tpu.core.partition import combine, param_count, partition, prune
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.stitch import chopped_anysplat as ca
from vist3a_tpu.stitch import lora as lora_mod
from vist3a_tpu.train import stitching as st
from vist3a_tpu.train.losses import gradient_loss_multi_scale, task_loss


# --------------------------------------------------------------------------- #
# DSL                                                                         #
# --------------------------------------------------------------------------- #
def test_parse_lora_mode_matches_reference():
    import ref_loader
    ref = ref_loader.load("utils.lora_util.utils")

    for spec in ["r64,a32,d0.0,f0", "r8,a16,d0.1,bnone,f1",
                 "r4,a8,tqkv|proj,enc,fix_head"]:
        ours, theirs = lora_mod.parse_lora_mode(spec), ref.parse_lora_mode(spec)
        assert ours.r == theirs.r and ours.alpha == theirs.alpha
        assert ours.dropout == theirs.dropout and ours.bias == theirs.bias
        assert ours.target_modules == theirs.target_modules
        assert ours.fan_in_fan_out == theirs.fan_in_fan_out
        assert ours.finetune_encoder == theirs.finetune_encoder
        assert ours.freeze_head == theirs.freeze_head


# --------------------------------------------------------------------------- #
# merge parity vs reference torch LoRA layers                                 #
# --------------------------------------------------------------------------- #
def test_linear_lora_merge_matches_torch(rng):
    import torch
    import ref_loader
    ref_layers = ref_loader.load("utils.lora_util.layers")

    d_in, d_out, r, alpha = 12, 20, 4, 32
    tl = ref_layers.Linear(d_in, d_out, r=r, lora_alpha=alpha)
    with torch.no_grad():
        tl.lora_A.copy_(torch.from_numpy(
            rng.standard_normal((r, d_in), dtype=np.float32)))
        tl.lora_B.copy_(torch.from_numpy(
            rng.standard_normal((d_out, r), dtype=np.float32)))
    x = rng.standard_normal((3, d_in), dtype=np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()

    node = {"w": jnp.asarray(tl.weight.detach().numpy().T),
            "b": jnp.asarray(tl.bias.detach().numpy())}
    factors = {"a": jnp.asarray(tl.lora_A.detach().numpy().T),
               "b": jnp.asarray(tl.lora_B.detach().numpy().T)}
    cfg = lora_mod.LoraConfig(r=r, alpha=alpha)
    merged = lora_mod.merge_lora({"q": node}, {"q": factors}, cfg)
    got = np.asarray(jnp.dot(jnp.asarray(x), merged["q"]["w"]) +
                     merged["q"]["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv2d_lora_merge_matches_torch(rng):
    import torch
    import ref_loader
    ref_layers = ref_loader.load("utils.lora_util.layers")

    ci, co, k, r, alpha = 5, 7, 3, 2, 8
    tc = ref_layers.Conv2d(ci, co, kernel_size=k, r=r, lora_alpha=alpha,
                           padding=1)
    with torch.no_grad():
        tc.lora_A.copy_(torch.from_numpy(
            rng.standard_normal(tuple(tc.lora_A.shape), dtype=np.float32)))
        tc.lora_B.copy_(torch.from_numpy(
            rng.standard_normal(tuple(tc.lora_B.shape), dtype=np.float32)))
    tc.eval()  # merges weights in-place
    merged_w_torch = tc.conv.weight.detach().numpy()

    node = {"kernel": jnp.asarray(tc.conv.weight.detach().numpy()
                                  - (tc.lora_B @ tc.lora_A).view(
                                      tc.conv.weight.shape).detach().numpy()
                                  * tc.scaling)}
    factors = {"a": jnp.asarray(tc.lora_A.detach().numpy().T),
               "b": jnp.asarray(tc.lora_B.detach().numpy().T)}
    cfg = lora_mod.LoraConfig(r=r, alpha=alpha)
    merged = lora_mod.merge_lora({"c": node}, {"c": factors}, cfg)
    np.testing.assert_allclose(np.asarray(merged["c"]["kernel"]),
                               merged_w_torch, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------- #
# site discovery / trainable partition                                        #
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def tiny_stitched():
    cfg = tiny_encoder_cfg()
    scfg = ca.StitchedConfig(
        encoder=cfg, stitch_layer_index=2,
        conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1")
    params = {
        "encoder": enc_mod.init(jax.random.key(0), cfg),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(2), scfg),
    }
    return scfg, params


def test_lora_sites_exclude_conv_transpose(tiny_stitched):
    _, params = tiny_stitched
    cfg = lora_mod.LoraConfig(r=4)
    sites = lora_mod.lora_sites(params["encoder"], cfg)
    names = {"/".join(map(str, p)) for p, _, _ in sites}
    assert not any("resize0" in n or "resize1" in n for n in names)
    assert any("qkv" in n for n in names)
    assert any("input_merger" in n for n in names)   # gs head conv7x7
    assert any("camera_head" in n for n in names)
    # merge with zero-init B is an exact no-op
    lora = lora_mod.init_lora(jax.random.key(1), params["encoder"], cfg)
    merged = lora_mod.merge_lora(params["encoder"], lora, cfg)
    for a, b in zip(jax.tree.leaves(params["encoder"]),
                    jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partition_roundtrip(tiny_stitched):
    _, params = tiny_stitched
    tcfg = st.StitchTrainConfig(lora_spec="r4,a8,d0.0,f0")
    pred = st.trainable_predicate(params, tcfg.lora)
    taken, rest = partition(params, pred)
    back = combine(taken, rest)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    taken_p = prune(taken)
    assert "stitch_conv" in taken_p
    assert "cls_token" in taken_p["encoder"]["vit"]
    assert param_count(taken) + param_count(rest) == param_count(params)
    # frozen side holds the heavy weights
    assert param_count(rest) > 10 * param_count(taken)


# --------------------------------------------------------------------------- #
# loss parity vs reference TaskLossAnySplat                                   #
# --------------------------------------------------------------------------- #
def test_gradient_loss_matches_torch(rng):
    # torch oracle transcribing `models/anysplat_stitched.py:20-57` verbatim
    # (the module itself drags in the full AnySplat import chain).
    import torch

    def ref_gradient_loss(prediction, target):
        diff = prediction - target
        grad_x = torch.abs(diff[:, :, 1:] - diff[:, :, :-1]).clamp(max=100)
        grad_y = torch.abs(diff[:, 1:, :] - diff[:, :-1, :]).clamp(max=100)
        image_loss = torch.sum(grad_x, (1, 2, 3)) + torch.sum(grad_y, (1, 2, 3))
        divisor = prediction.shape[0] * prediction.shape[1] * prediction.shape[2]
        return torch.sum(image_loss) / divisor

    def ref_multi_scale(prediction, target, scales=4):
        total = 0
        for scale in range(scales):
            step = pow(2, scale)
            total += ref_gradient_loss(prediction[:, ::step, ::step],
                                       target[:, ::step, ::step])
        return total / scales

    pred = rng.standard_normal((2, 3, 16, 16, 1), dtype=np.float32) * 3
    tgt = rng.standard_normal((2, 3, 16, 16, 1), dtype=np.float32)
    want = ref_multi_scale(torch.from_numpy(pred),
                           torch.from_numpy(tgt)).item()
    got = float(gradient_loss_multi_scale(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_task_loss_zero_for_identical():
    cfg = tiny_encoder_cfg()
    params = enc_mod.init(jax.random.key(0), cfg)
    images = jax.random.uniform(jax.random.key(1), (1, 3, 3, 56, 56))
    out = enc_mod.forward(params, images, cfg)
    losses = task_loss(out, out)
    assert float(losses["total_loss"]) == 0.0
    assert len(losses) == 15  # 14 terms + total


# --------------------------------------------------------------------------- #
# train step on the 8-device mesh                                             #
# --------------------------------------------------------------------------- #
def test_stitch_train_step_runs_and_descends(tiny_stitched, mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    scfg, params = tiny_stitched
    tcfg_train = st.StitchTrainConfig(lora_spec="r2,a4,d0.0,f0",
                                      warmup_steps=2, total_steps=10)
    state, frozen = st.init_train_state(jax.random.key(3), params, tcfg_train)

    # S views ⇔ T_vae latent frames via (T_vae−1)·4+1 = S (Wan temporal rate)
    b, t_vae, h = 4, 2, 56
    s = (t_vae - 1) * 4 + 1
    latent = jax.random.normal(jax.random.key(4),
                               (b, 16, t_vae, h // 8, h // 8))
    images = jax.random.uniform(jax.random.key(5), (b, 3, s, h, h),
                                minval=-1, maxval=1)
    teacher01 = jax.random.uniform(jax.random.key(6), (b, s, 3, h, h))

    data_sh = NamedSharding(mesh8, P("data"))
    latent, images, teacher01 = (jax.device_put(x, data_sh)
                                 for x in (latent, images, teacher01))

    k_chop = scfg.stitch_layer_index
    init_vit_lora = jax.tree.map(np.asarray,
                                 state.trainable["lora"]["vit"]["blocks"])
    init_mask_tok = np.asarray(
        state.trainable["model"]["encoder"]["vit"]["mask_token"])

    metrics_hist = []
    for _ in range(2):
        state, metrics = st.stitch_train_step(
            state, params["encoder"], latent, images, teacher01,
            scfg, scfg.encoder, lora_spec=tcfg_train.lora_spec,
            train_cfg=tcfg_train)
        metrics_hist.append(jax.tree.map(float, metrics))

    for m in metrics_hist:
        assert np.isfinite(m["total_loss"])
        assert np.isfinite(m["grad_norm"]) and m["grad_norm"] > 0
    assert int(state.step) == 2
    # optimizer actually moved the trainables
    assert any(
        not np.array_equal(np.zeros_like(x), np.asarray(x))
        for x in jax.tree.leaves(state.trainable["lora"]))

    # structurally-unused trainables stay bit-identical to init (torch skips
    # grad=None params — AdamW weight decay must not drift them):
    # chopped ViT-block LoRA rows [0, k) and the mask token
    final_vit_lora = state.trainable["lora"]["vit"]["blocks"]
    moved_live = False
    for init_leaf, leaf in zip(jax.tree.leaves(init_vit_lora),
                               jax.tree.leaves(final_vit_lora)):
        np.testing.assert_array_equal(init_leaf[:k_chop],
                                      np.asarray(leaf)[:k_chop])
        moved_live |= not np.array_equal(init_leaf[k_chop:],
                                         np.asarray(leaf)[k_chop:])
    assert moved_live, "live ViT-block LoRA rows never updated"
    np.testing.assert_array_equal(
        init_mask_tok,
        np.asarray(state.trainable["model"]["encoder"]["vit"]["mask_token"]))


def test_conv_hwio_lora_merge_matches_oihw():
    """HWIO conv-site merge (heads storage) == legacy OIHW merge."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    o, i, k, r = 6, 4, 3, 2
    kern = rng.standard_normal((o, i, k, k)).astype(np.float32)
    cfg = lora_mod.LoraConfig(r=r, alpha=4)
    a = rng.standard_normal((i * k, r * k)).astype(np.float32)
    b = rng.standard_normal((r * k, o * k)).astype(np.float32)
    fac = {"a": jnp.asarray(a), "b": jnp.asarray(b)}
    merged_oihw = lora_mod._merge_site({"kernel": jnp.asarray(kern)},
                                       fac, "conv", cfg.scaling)["kernel"]
    merged_hwio = lora_mod._merge_site(
        {"kernel_hwio": jnp.asarray(kern.transpose(2, 3, 1, 0))},
        fac, "conv_hwio", cfg.scaling)["kernel_hwio"]
    np.testing.assert_allclose(np.asarray(merged_hwio),
                               np.asarray(merged_oihw).transpose(2, 3, 1, 0),
                               rtol=1e-6, atol=1e-6)
    merged_mat = lora_mod._merge_site(
        {"kernel_mat3": jnp.asarray(
            kern.transpose(2, 3, 1, 0).reshape(k * k * i, o))},
        fac, "conv_mat3", cfg.scaling)["kernel_mat3"]
    np.testing.assert_allclose(
        np.asarray(merged_mat),
        np.asarray(merged_oihw).transpose(2, 3, 1, 0).reshape(k * k * i, o),
        rtol=1e-6, atol=1e-6)
