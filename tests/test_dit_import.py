"""Wan DiT importer: diffusers-style state dict round-trip + PEFT merge."""

import numpy as np

import jax
import jax.numpy as jnp

from vist3a_tpu.io import weight_import as wi
from vist3a_tpu.nn import wan_dit

TINY = wan_dit.WanDiTConfig(dim=48, ffn_dim=96, num_layers=2, num_heads=4,
                            freq_dim=32, text_dim=24)


def _to_diffusers_sd(params, cfg):
    """Inverse-map our tree to diffusers WanTransformer3DModel names."""
    sd = {}
    pk = np.asarray(params["patch_embedding"]["kernel"])   # (pt,ph,pw,C,D)
    sd["patch_embedding.weight"] = pk.transpose(4, 3, 0, 1, 2)
    sd["patch_embedding.bias"] = np.asarray(params["patch_embedding"]["bias"])

    def lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    lin("condition_embedder.time_embedder.linear_1",
        params["time_embedder"]["fc1"])
    lin("condition_embedder.time_embedder.linear_2",
        params["time_embedder"]["fc2"])
    lin("condition_embedder.time_proj", params["time_proj"])
    lin("condition_embedder.text_embedder.linear_1",
        params["text_embedder"]["fc1"])
    lin("condition_embedder.text_embedder.linear_2",
        params["text_embedder"]["fc2"])
    sd["scale_shift_table"] = np.asarray(
        params["scale_shift_table"])[None]
    lin("proj_out", params["proj_out"])

    for i in range(cfg.num_layers):
        blk = jax.tree.map(lambda x: np.asarray(x[i]), params["blocks"])
        p = f"blocks.{i}"
        sd[f"{p}.scale_shift_table"] = blk["scale_shift_table"][None]
        for attn in ("attn1", "attn2"):
            for src, dst in (("q", "to_q"), ("k", "to_k"), ("v", "to_v")):
                sd[f"{p}.{attn}.{dst}.weight"] = blk[attn][src]["w"].T
                sd[f"{p}.{attn}.{dst}.bias"] = blk[attn][src]["b"]
            sd[f"{p}.{attn}.to_out.0.weight"] = blk[attn]["o"]["w"].T
            sd[f"{p}.{attn}.to_out.0.bias"] = blk[attn]["o"]["b"]
            sd[f"{p}.{attn}.norm_q.weight"] = blk[attn]["norm_q"]
            sd[f"{p}.{attn}.norm_k.weight"] = blk[attn]["norm_k"]
        sd[f"{p}.norm2.weight"] = blk["norm2"]["scale"]
        sd[f"{p}.norm2.bias"] = blk["norm2"]["bias"]
        sd[f"{p}.ffn.net.0.proj.weight"] = blk["ffn"]["fc1"]["w"].T
        sd[f"{p}.ffn.net.0.proj.bias"] = blk["ffn"]["fc1"]["b"]
        sd[f"{p}.ffn.net.2.weight"] = blk["ffn"]["fc2"]["w"].T
        sd[f"{p}.ffn.net.2.bias"] = blk["ffn"]["fc2"]["b"]
    return sd


def test_wan_dit_import_roundtrip():
    params = wan_dit.init(jax.random.key(0), TINY)
    sd = _to_diffusers_sd(params, TINY)
    back = wi.import_wan_dit(sd)

    latent = jax.random.normal(jax.random.key(1), (1, 16, 2, 8, 8))
    text = jax.random.normal(jax.random.key(2), (1, 5, TINY.text_dim))
    ts = jnp.asarray([400.0])
    a = wan_dit.forward(params, latent, ts, text, TINY)
    b = wan_dit.forward(back, latent, ts, text, TINY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_apply_peft_lora():
    params = wan_dit.init(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    r, alpha = 2, 16
    a1 = rng.standard_normal((r, TINY.dim), np.float32)
    b1 = rng.standard_normal((TINY.dim, r), np.float32)
    lora_sd = {
        "base_model.model.blocks.1.attn1.to_q.lora_A.weight": a1,
        "base_model.model.blocks.1.attn1.to_q.lora_B.weight": b1,
    }
    merged = wi.apply_peft_lora(params, lora_sd, r=r, alpha=alpha)
    w_old = np.asarray(params["blocks"]["attn1"]["q"]["w"])
    w_new = np.asarray(merged["blocks"]["attn1"]["q"]["w"])
    np.testing.assert_allclose(w_new[1] - w_old[1], (b1 @ a1).T * (alpha / r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(w_new[0], w_old[0])
    # untouched sites identical
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"]["attn2"]["q"]["w"]),
        np.asarray(params["blocks"]["attn2"]["q"]["w"]))
