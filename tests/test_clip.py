"""CLIP vision tower parity vs HF transformers CLIPVisionModelWithProjection
(tiny random config) — the reward scorers' differentiable branch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vist3a_tpu.nn import clip as clip_mod

TINY_HF = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
               num_attention_heads=4, patch_size=8, image_size=32,
               projection_dim=16, hidden_act="gelu")
TINY = clip_mod.CLIPVisionConfig(hidden_size=32, num_layers=3, num_heads=4,
                                 mlp_dim=64, patch_size=8, image_size=32,
                                 projection_dim=16, act="gelu")


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import (CLIPVisionConfig as HFCfg,
                              CLIPVisionModelWithProjection)
    torch.manual_seed(0)
    m = CLIPVisionModelWithProjection(HFCfg(**TINY_HF))
    m.eval()
    return m


def test_image_features_match_hf(hf_model, rng):
    import torch
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = clip_mod.import_hf_clip_vision(sd, TINY.num_layers)

    px = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        want = hf_model(pixel_values=torch.from_numpy(px)).image_embeds
        want = (want / want.norm(dim=-1, keepdim=True)).numpy()
    got = np.asarray(clip_mod.image_features(params, jnp.asarray(px), TINY))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_grad_flows_to_pixels(hf_model, rng):
    """The reward path needs d(score)/d(pixels) (`train_vdm.py:637`)."""
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = clip_mod.import_hf_clip_vision(sd, TINY.num_layers)
    text = jnp.asarray(rng.standard_normal((1, 16), np.float32))
    text = text / jnp.linalg.norm(text)

    def score(px):
        img = clip_mod.image_features(params, px, TINY)
        return jnp.sum(img @ text.T)

    px = jnp.asarray(rng.standard_normal((1, 3, 32, 32), np.float32))
    g = jax.grad(score)(px)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.linalg.norm(g)) > 0


def test_open_clip_importer_layout_roundtrip(rng):
    """Build an open_clip-style flat state dict from our params and
    re-import — checks the packed qkv split and transposes."""
    params = clip_mod.init(jax.random.key(0), TINY)
    d = TINY.hidden_size
    sd = {
        "visual.conv1.weight":
            np.asarray(params["patch"]).transpose(3, 2, 0, 1),
        "visual.class_embedding": np.asarray(params["class_embedding"]),
        "visual.positional_embedding": np.asarray(params["pos_embed"]),
        "visual.ln_pre.weight": np.asarray(params["ln_pre"]["scale"]),
        "visual.ln_pre.bias": np.asarray(params["ln_pre"]["bias"]),
        "visual.ln_post.weight": np.asarray(params["ln_post"]["scale"]),
        "visual.ln_post.bias": np.asarray(params["ln_post"]["bias"]),
        "visual.proj": np.asarray(params["proj"]),
    }
    for i in range(TINY.num_layers):
        lp = jax.tree.map(lambda x: np.asarray(x[i]), params["layers"])
        p = f"visual.transformer.resblocks.{i}"
        sd[f"{p}.attn.in_proj_weight"] = np.concatenate(
            [lp["q"]["w"].T, lp["k"]["w"].T, lp["v"]["w"].T], 0)
        sd[f"{p}.attn.in_proj_bias"] = np.concatenate(
            [lp["q"]["b"], lp["k"]["b"], lp["v"]["b"]], 0)
        sd[f"{p}.attn.out_proj.weight"] = lp["o"]["w"].T
        sd[f"{p}.attn.out_proj.bias"] = lp["o"]["b"]
        sd[f"{p}.ln_1.weight"] = lp["ln1"]["scale"]
        sd[f"{p}.ln_1.bias"] = lp["ln1"]["bias"]
        sd[f"{p}.ln_2.weight"] = lp["ln2"]["scale"]
        sd[f"{p}.ln_2.bias"] = lp["ln2"]["bias"]
        sd[f"{p}.mlp.c_fc.weight"] = lp["fc1"]["w"].T
        sd[f"{p}.mlp.c_fc.bias"] = lp["fc1"]["b"]
        sd[f"{p}.mlp.c_proj.weight"] = lp["fc2"]["w"].T
        sd[f"{p}.mlp.c_proj.bias"] = lp["fc2"]["b"]

    back = clip_mod.import_open_clip_vision(sd, TINY.num_layers)
    px = jax.random.normal(jax.random.key(1), (1, 3, 32, 32))
    a = clip_mod.image_features(params, px, TINY)
    b = clip_mod.image_features(back, px, TINY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


# --------------------------------------------------------------------------- #
# text tower                                                                  #
# --------------------------------------------------------------------------- #
TINY_TEXT_HF = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                    num_attention_heads=4, vocab_size=99,
                    max_position_embeddings=16, projection_dim=16,
                    hidden_act="gelu", eos_token_id=98)
TINY_TEXT = clip_mod.CLIPTextConfig(hidden_size=32, num_layers=3, num_heads=4,
                                    mlp_dim=64, vocab_size=99,
                                    context_length=16, projection_dim=16,
                                    act="gelu")


@pytest.fixture(scope="module")
def hf_text_model():
    import torch
    from transformers import (CLIPTextConfig as HFTextCfg,
                              CLIPTextModelWithProjection)
    torch.manual_seed(1)
    m = CLIPTextModelWithProjection(HFTextCfg(**TINY_TEXT_HF))
    m.eval()
    return m


def test_text_features_match_hf(hf_text_model, rng):
    """Causal mask + argmax-EOS pooling + projection vs HF
    (`utils/reward.py:152-158` uses `get_text_features`)."""
    import torch
    sd = {k: v.detach().numpy() for k, v in hf_text_model.state_dict().items()}
    params = clip_mod.import_hf_clip_text(sd, TINY_TEXT.num_layers)

    ids = rng.integers(1, 90, (3, 16)).astype(np.int32)
    ids[:, 0] = 0
    ids[0, 7] = 98   # eos mid-sequence: pooling must pick position 7
    ids[1, 15] = 98
    ids[2, 3] = 98
    with torch.no_grad():
        want = hf_text_model(input_ids=torch.from_numpy(ids.astype(np.int64))
                             ).text_embeds
        want = (want / want.norm(dim=-1, keepdim=True)).numpy()
    got = np.asarray(clip_mod.text_features(params, jnp.asarray(ids),
                                            TINY_TEXT))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_text_open_clip_import_round_trip(rng):
    """open_clip naming (packed in_proj) → same features as the HF naming
    for identical underlying weights."""
    torch = pytest.importorskip("torch")
    from transformers import (CLIPTextConfig as HFTextCfg,
                              CLIPTextModelWithProjection)
    torch.manual_seed(2)
    m = CLIPTextModelWithProjection(HFTextCfg(**TINY_TEXT_HF)).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params_hf = clip_mod.import_hf_clip_text(sd, TINY_TEXT.num_layers)

    # rebuild the same weights under open_clip names
    oc = {
        "token_embedding.weight":
            sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding":
            sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
        "text_projection": sd["text_projection.weight"].T,
    }
    for i in range(TINY_TEXT.num_layers):
        p = f"text_model.encoder.layers.{i}"
        o = f"transformer.resblocks.{i}"
        oc[f"{o}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{p}.self_attn.q_proj.weight"],
             sd[f"{p}.self_attn.k_proj.weight"],
             sd[f"{p}.self_attn.v_proj.weight"]], axis=0)
        oc[f"{o}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{p}.self_attn.q_proj.bias"],
             sd[f"{p}.self_attn.k_proj.bias"],
             sd[f"{p}.self_attn.v_proj.bias"]], axis=0)
        oc[f"{o}.attn.out_proj.weight"] = sd[f"{p}.self_attn.out_proj.weight"]
        oc[f"{o}.attn.out_proj.bias"] = sd[f"{p}.self_attn.out_proj.bias"]
        oc[f"{o}.ln_1.weight"] = sd[f"{p}.layer_norm1.weight"]
        oc[f"{o}.ln_1.bias"] = sd[f"{p}.layer_norm1.bias"]
        oc[f"{o}.ln_2.weight"] = sd[f"{p}.layer_norm2.weight"]
        oc[f"{o}.ln_2.bias"] = sd[f"{p}.layer_norm2.bias"]
        oc[f"{o}.mlp.c_fc.weight"] = sd[f"{p}.mlp.fc1.weight"]
        oc[f"{o}.mlp.c_fc.bias"] = sd[f"{p}.mlp.fc1.bias"]
        oc[f"{o}.mlp.c_proj.weight"] = sd[f"{p}.mlp.fc2.weight"]
        oc[f"{o}.mlp.c_proj.bias"] = sd[f"{p}.mlp.fc2.bias"]
    params_oc = clip_mod.import_open_clip_text(oc, TINY_TEXT.num_layers)

    ids = jnp.asarray(rng.integers(1, 98, (2, 16)).astype(np.int32))
    ids = ids.at[:, -1].set(98)
    a = clip_mod.text_features(params_hf, ids, TINY_TEXT)
    b = clip_mod.text_features(params_oc, ids, TINY_TEXT)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
