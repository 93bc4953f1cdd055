"""CLIP vision tower + projection (reward scorers), TPU-native.

Parity target: the two frozen scorers of `utils/reward.py` —
PickScore_v1 (HF CLIP-H, `AutoModel.get_image_features`, :42-57) and
DFN5B-CLIP-ViT-H-14-378 (open_clip `encode_image`, :93-111).  Both are
standard CLIP ViTs: patch conv (no bias) + class embedding + learned
position embeddings → pre-LN → N×(LN, MHA, LN, MLP) → post-LN on the class
token → linear projection.  The reward needs GRADIENTS through the image
tower (`train_vdm.py:566-637` backprops the render into the DiT); text
features are no-grad (`utils/reward.py:152-158,171-174`) and are computed
off-path (host torch or precomputed) and passed in.

One generic implementation + per-source weight importers (HF naming and
open_clip naming) covers both scorers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vist3a_tpu.ops.attention import dot_product_attention

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    mlp_dim: int = 5120
    patch_size: int = 14
    image_size: int = 224
    projection_dim: int = 1024
    act: str = "gelu"            # laion-H / DFN5B use plain gelu
    ln_eps: float = 1e-5

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


CLIP_H_224 = CLIPVisionConfig()
DFN5B_H_378 = CLIPVisionConfig(image_size=378)


def _linear_init(key, d_in, d_out, dtype):
    return {"w": jax.random.normal(key, (d_in, d_out), dtype) * d_in ** -0.5,
            "b": jnp.zeros((d_out,), dtype)}


def _layer_init(key, cfg: CLIPVisionConfig, dtype):
    keys = jax.random.split(key, 6)
    d = cfg.hidden_size
    return {
        "ln1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "q": _linear_init(keys[0], d, d, dtype),
        "k": _linear_init(keys[1], d, d, dtype),
        "v": _linear_init(keys[2], d, d, dtype),
        "o": _linear_init(keys[3], d, d, dtype),
        "ln2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "fc1": _linear_init(keys[4], d, cfg.mlp_dim, dtype),
        "fc2": _linear_init(keys[5], cfg.mlp_dim, d, dtype),
    }


def init(key, cfg: CLIPVisionConfig = CLIP_H_224, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 5)
    d = cfg.hidden_size
    n = cfg.grid ** 2 + 1
    layers = [_layer_init(k, cfg, dtype)
              for k in jax.random.split(keys[0], cfg.num_layers)]
    return {
        "patch": jax.random.normal(
            keys[1], (cfg.patch_size, cfg.patch_size, 3, d), dtype) * 0.02,
        "class_embedding": jax.random.normal(keys[2], (d,), dtype) * 0.02,
        "pos_embed": jax.random.normal(keys[3], (n, d), dtype) * 0.02,
        "ln_pre": {"scale": jnp.ones((d,), dtype),
                   "bias": jnp.zeros((d,), dtype)},
        "layers": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *layers),
        "ln_post": {"scale": jnp.ones((d,), dtype),
                    "bias": jnp.zeros((d,), dtype)},
        "proj": jax.random.normal(keys[4], (d, cfg.projection_dim),
                                  dtype) * d ** -0.5,
    }


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _lin(p, x):
    return jnp.dot(x, p["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype) \
        + p["b"].astype(x.dtype)


def _act(x, kind):
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(kind)


def _layer(p, x, cfg: CLIPVisionConfig):
    b, n, d = x.shape
    h = cfg.num_heads
    y = _ln(p["ln1"], x, cfg.ln_eps)
    q = _lin(p["q"], y).reshape(b, n, h, d // h)
    k = _lin(p["k"], y).reshape(b, n, h, d // h)
    v = _lin(p["v"], y).reshape(b, n, h, d // h)
    attn = dot_product_attention(q, k, v, impl="xla").reshape(b, n, d)
    x = x + _lin(p["o"], attn)
    y = _ln(p["ln2"], x, cfg.ln_eps)
    return x + _lin(p["fc2"], _act(_lin(p["fc1"], y), cfg.act))


def image_features(params, pixels: jnp.ndarray,
                   cfg: CLIPVisionConfig = CLIP_H_224, *,
                   normalize: bool = True, remat: bool = True) -> jnp.ndarray:
    """pixels: (B, 3, H, W) CLIP-normalized → (B, projection_dim)."""
    b = pixels.shape[0]
    kern = params["patch"].astype(pixels.dtype)
    x = jax.lax.conv_general_dilated(
        jnp.moveaxis(pixels, 1, -1), kern,
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(pixels.dtype)
    x = x.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]
    x = _ln(params["ln_pre"], x, cfg.ln_eps)

    def body(carry, lp):
        fn = jax.checkpoint(_layer, static_argnums=(2,)) if remat else _layer
        return fn(lp, carry, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = _ln(params["ln_post"], x[:, 0], cfg.ln_eps)
    feats = jnp.dot(pooled, params["proj"].astype(pooled.dtype),
                    preferred_element_type=jnp.float32).astype(pooled.dtype)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


# --------------------------------------------------------------------------- #
# importers                                                                   #
# --------------------------------------------------------------------------- #
def import_hf_clip_vision(sd, num_layers: int) -> dict:
    """HF CLIPModel / CLIPVisionModelWithProjection state_dict (prefix
    'vision_model.' + 'visual_projection.')."""
    def tr(k):
        return jnp.asarray(np.asarray(sd[k]).T)

    def ln(prefix):
        return {"scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}

    def lin(prefix):
        return {"w": tr(f"{prefix}.weight"),
                "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}

    layers = []
    for i in range(num_layers):
        p = f"vision_model.encoder.layers.{i}"
        layers.append({
            "ln1": ln(f"{p}.layer_norm1"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj"),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.out_proj"),
            "ln2": ln(f"{p}.layer_norm2"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        })
    patch = np.asarray(
        sd["vision_model.embeddings.patch_embedding.weight"])  # (D,3,p,p)
    return {
        "patch": jnp.asarray(patch.transpose(2, 3, 1, 0)),
        "class_embedding":
            jnp.asarray(np.asarray(
                sd["vision_model.embeddings.class_embedding"]).reshape(-1)),
        "pos_embed": jnp.asarray(np.asarray(
            sd["vision_model.embeddings.position_embedding.weight"])),
        "ln_pre": ln("vision_model.pre_layrnorm")
        if "vision_model.pre_layrnorm.weight" in sd
        else ln("vision_model.pre_layernorm"),
        "layers": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *layers),
        "ln_post": ln("vision_model.post_layernorm"),
        "proj": tr("visual_projection.weight"),
    }


def import_open_clip_vision(sd, num_layers: int) -> dict:
    """open_clip VisionTransformer state_dict (prefix 'visual.')."""
    def t(k):
        return jnp.asarray(np.asarray(sd[k]))

    def tr(k):
        return jnp.asarray(np.asarray(sd[k]).T)

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    layers = []
    for i in range(num_layers):
        p = f"visual.transformer.resblocks.{i}"
        w = np.asarray(sd[f"{p}.attn.in_proj_weight"])     # (3D, D)
        b = np.asarray(sd[f"{p}.attn.in_proj_bias"])
        d = w.shape[1]
        layers.append({
            "ln1": ln(f"{p}.ln_1"),
            "q": {"w": jnp.asarray(w[:d].T), "b": jnp.asarray(b[:d])},
            "k": {"w": jnp.asarray(w[d:2 * d].T),
                  "b": jnp.asarray(b[d:2 * d])},
            "v": {"w": jnp.asarray(w[2 * d:].T), "b": jnp.asarray(b[2 * d:])},
            "o": {"w": tr(f"{p}.attn.out_proj.weight"),
                  "b": t(f"{p}.attn.out_proj.bias")},
            "ln2": ln(f"{p}.ln_2"),
            "fc1": {"w": tr(f"{p}.mlp.c_fc.weight"),
                    "b": t(f"{p}.mlp.c_fc.bias")},
            "fc2": {"w": tr(f"{p}.mlp.c_proj.weight"),
                    "b": t(f"{p}.mlp.c_proj.bias")},
        })
    patch = np.asarray(sd["visual.conv1.weight"])          # (D,3,p,p)
    return {
        "patch": jnp.asarray(patch.transpose(2, 3, 1, 0)),
        "class_embedding": t("visual.class_embedding"),
        "pos_embed": t("visual.positional_embedding"),
        "ln_pre": ln("visual.ln_pre"),
        "layers": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *layers),
        "ln_post": ln("visual.ln_post"),
        "proj": t("visual.proj"),
    }


# --------------------------------------------------------------------------- #
# text tower                                                                   #
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP-H text tower (both reward scorers use the same H-14 text arch:
    width 1024 / 24 layers / heads 16 / ctx 77).  Reference computes text
    features frozen via HF `get_text_features` (`utils/reward.py:152-158`)
    and open_clip `encode_text` (:171-174); this makes them in-framework."""
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    vocab_size: int = 49408
    context_length: int = 77
    projection_dim: int = 1024
    act: str = "gelu"
    ln_eps: float = 1e-5


CLIP_H_TEXT = CLIPTextConfig()
# ViT-L/14 text tower (openai lineage → quick_gelu): CLIPScore
# ("openai/clip-vit-large-patch14") and the LongCLIP-L variant
# ("zer0int/LongCLIP-L-Diffusers", 248 positions — a standard HF CLIPModel,
# importable via `import_hf_clip_text`); used by
# `evaluation/gen_eval/t3_scene_evaluation.py:96-101`.
CLIP_L_TEXT = CLIPTextConfig(hidden_size=768, num_layers=12, num_heads=12,
                             mlp_dim=3072, projection_dim=768,
                             act="quick_gelu")
LONGCLIP_L_TEXT = dataclasses.replace(CLIP_L_TEXT, context_length=248)


def text_init(key, cfg: CLIPTextConfig = CLIP_H_TEXT,
              dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    d = cfg.hidden_size
    vcfg = CLIPVisionConfig(hidden_size=d, num_heads=cfg.num_heads,
                            mlp_dim=cfg.mlp_dim, act=cfg.act,
                            ln_eps=cfg.ln_eps)
    layers = [_layer_init(k, vcfg, dtype)
              for k in jax.random.split(keys[0], cfg.num_layers)]
    return {
        "token_embed": jax.random.normal(
            keys[1], (cfg.vocab_size, d), dtype) * 0.02,
        "pos_embed": jax.random.normal(
            keys[2], (cfg.context_length, d), dtype) * 0.01,
        "layers": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *layers),
        "ln_final": {"scale": jnp.ones((d,), dtype),
                     "bias": jnp.zeros((d,), dtype)},
        "proj": jax.random.normal(keys[3], (d, cfg.projection_dim),
                                  dtype) * d ** -0.5,
    }


def _text_layer(p, x, cfg: CLIPTextConfig, mask):
    b, n, d = x.shape
    h = cfg.num_heads
    y = _ln(p["ln1"], x, cfg.ln_eps)
    q = _lin(p["q"], y).reshape(b, n, h, d // h)
    k = _lin(p["k"], y).reshape(b, n, h, d // h)
    v = _lin(p["v"], y).reshape(b, n, h, d // h)
    # 77 tokens: plain masked attention (no flash kernel needed)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (d // h) ** -0.5
    logits = logits + mask
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, d)
    x = x + _lin(p["o"], out)
    y = _ln(p["ln2"], x, cfg.ln_eps)
    return x + _lin(p["fc2"], _act(_lin(p["fc1"], y), cfg.act))


def text_features(params, ids: jnp.ndarray,
                  cfg: CLIPTextConfig = CLIP_H_TEXT, *,
                  normalize: bool = True) -> jnp.ndarray:
    """ids: (B, 77) int32 CLIP-BPE token ids (with 49406/49407 start/end)
    → (B, projection_dim).  Causal mask; pooled at argmax(ids) — the
    end-of-text token has the highest id in the CLIP vocabulary, matching
    both HF and open_clip pooling."""
    b, n = ids.shape
    x = params["token_embed"][ids] + params["pos_embed"][None, :n]
    causal = jnp.where(
        jnp.arange(n)[None, :] <= jnp.arange(n)[:, None], 0.0, -jnp.inf)
    mask = causal[None, None].astype(jnp.float32)

    def body(carry, lp):
        return _text_layer(lp, carry, cfg, mask), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = _ln(params["ln_final"], x, cfg.ln_eps)
    pooled = jnp.take_along_axis(
        x, jnp.argmax(ids, axis=-1)[:, None, None].astype(jnp.int32),
        axis=1)[:, 0]
    feats = jnp.dot(pooled, params["proj"].astype(pooled.dtype),
                    preferred_element_type=jnp.float32).astype(pooled.dtype)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


def import_hf_clip_text(sd, num_layers: int) -> dict:
    """HF CLIPModel / CLIPTextModelWithProjection state_dict (prefix
    'text_model.' + 'text_projection.')."""
    def tr(k):
        return jnp.asarray(np.asarray(sd[k]).T)

    def t(k):
        return jnp.asarray(np.asarray(sd[k]))

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    def lin(prefix):
        return {"w": tr(f"{prefix}.weight"), "b": t(f"{prefix}.bias")}

    layers = []
    for i in range(num_layers):
        p = f"text_model.encoder.layers.{i}"
        layers.append({
            "ln1": ln(f"{p}.layer_norm1"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj"),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.out_proj"),
            "ln2": ln(f"{p}.layer_norm2"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        })
    return {
        "token_embed": t("text_model.embeddings.token_embedding.weight"),
        "pos_embed": t("text_model.embeddings.position_embedding.weight"),
        "layers": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *layers),
        "ln_final": ln("text_model.final_layer_norm"),
        "proj": tr("text_projection.weight"),
    }


def import_open_clip_text(sd, num_layers: int) -> dict:
    """open_clip text tower (unprefixed 'transformer.resblocks.*',
    'token_embedding', 'positional_embedding', 'ln_final',
    'text_projection')."""
    def t(k):
        return jnp.asarray(np.asarray(sd[k]))

    def tr(k):
        return jnp.asarray(np.asarray(sd[k]).T)

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    layers = []
    for i in range(num_layers):
        p = f"transformer.resblocks.{i}"
        w = np.asarray(sd[f"{p}.attn.in_proj_weight"])
        b = np.asarray(sd[f"{p}.attn.in_proj_bias"])
        d = w.shape[1]
        layers.append({
            "ln1": ln(f"{p}.ln_1"),
            "q": {"w": jnp.asarray(w[:d].T), "b": jnp.asarray(b[:d])},
            "k": {"w": jnp.asarray(w[d:2 * d].T),
                  "b": jnp.asarray(b[d:2 * d])},
            "v": {"w": jnp.asarray(w[2 * d:].T), "b": jnp.asarray(b[2 * d:])},
            "o": {"w": tr(f"{p}.attn.out_proj.weight"),
                  "b": t(f"{p}.attn.out_proj.bias")},
            "ln2": ln(f"{p}.ln_2"),
            "fc1": {"w": tr(f"{p}.mlp.c_fc.weight"),
                    "b": t(f"{p}.mlp.c_fc.bias")},
            "fc2": {"w": tr(f"{p}.mlp.c_proj.weight"),
                    "b": t(f"{p}.mlp.c_proj.bias")},
        })
    return {
        "token_embed": t("token_embedding.weight"),
        "pos_embed": t("positional_embedding"),
        "layers": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *layers),
        "ln_final": ln("ln_final"),
        "proj": t("text_projection"),
    }
