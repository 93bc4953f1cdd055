"""UMT5 text encoder (Wan 2.1's prompt tower), TPU-native.

Parity target: HF `transformers.UMT5EncoderModel` — the encoder used by
`WanPipeline` (umt5-xxl: d_model 4096, 24 layers, 64 heads, d_kv 64,
d_ff 10240, gated-GELU) — plus the reference's embedding post-processing
`compute_wan_text_embeddings` (`utils/wan_utils.py:26-60`): pad/truncate to
226 tokens, zero embeddings past each sequence's true length.

UMT5 specifics honored here (vs classic T5):
  * EVERY layer owns its relative-attention-bias table (T5 shares layer 0's);
  * no 1/√d attention scaling (folded into init, HF convention);
  * pre-norm RMSNorm (scale-only, eps 1e-6), gated-GELU MLP (wi_0 ⊙ wi_1);
  * final RMSNorm.

Layers are stacked (leading layer axis) and run with `lax.scan` — one
compiled block body; the per-layer bias tables stack right along.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vist3a_tpu.ops.attention import dot_product_attention  # noqa: F401 (docs)


@dataclasses.dataclass(frozen=True)
class UMT5Config:
    vocab_size: int = 256384
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    max_sequence_length: int = 226      # Wan padding (`wan_utils.py:39-43`)


UMT5_XXL = UMT5Config()


def _dense_init(key, d_in, d_out, dtype):
    # HF T5 uses factor-scaled normal init; exact init is irrelevant for
    # imported weights — keep a sane default for tests.
    return jax.random.normal(key, (d_in, d_out), dtype) * (d_in ** -0.5)


def rms_norm(scale, x, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def layer_init(key, cfg: UMT5Config, dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    inner = cfg.num_heads * cfg.d_kv
    return {
        "ln1": jnp.ones((cfg.d_model,), dtype),
        "q": _dense_init(keys[0], cfg.d_model, inner, dtype),
        "k": _dense_init(keys[1], cfg.d_model, inner, dtype),
        "v": _dense_init(keys[2], cfg.d_model, inner, dtype),
        "o": _dense_init(keys[3], inner, cfg.d_model, dtype),
        "rel_bias": jax.random.normal(
            keys[4], (cfg.relative_attention_num_buckets, cfg.num_heads),
            dtype) * 0.1,
        "ln2": jnp.ones((cfg.d_model,), dtype),
        "wi_0": _dense_init(keys[5], cfg.d_model, cfg.d_ff, dtype),
        "wi_1": _dense_init(keys[6], cfg.d_model, cfg.d_ff, dtype),
        "wo": _dense_init(keys[7], cfg.d_ff, cfg.d_model, dtype),
    }


def init(key, cfg: UMT5Config = UMT5_XXL, dtype=jnp.float32) -> dict:
    k_emb, k_layers = jax.random.split(key)
    layers = [layer_init(k, cfg, dtype)
              for k in jax.random.split(k_layers, cfg.num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embed": jax.random.normal(k_emb, (cfg.vocab_size, cfg.d_model),
                                   dtype),
        "layers": stacked,
        "final_ln": jnp.ones((cfg.d_model,), dtype),
    }


def relative_position_bucket(relative_position, num_buckets=32,
                             max_distance=128):
    """HF `_relative_position_bucket`, bidirectional — static table."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int32) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


def _bucket_table(seq_len: int, cfg: UMT5Config) -> np.ndarray:
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    return relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)          # (Q, K) int32


def _layer_apply(p, x, bias_mask, buckets, cfg: UMT5Config):
    """x: (B,N,D).  bias_mask: (B,1,N,N) additive.  buckets: (N,N) int."""
    h, dk = cfg.num_heads, cfg.d_kv
    b, n, d = x.shape

    y = rms_norm(p["ln1"], x, cfg.layer_norm_eps)
    q = jnp.dot(y, p["q"].astype(y.dtype)).reshape(b, n, h, dk)
    k = jnp.dot(y, p["k"].astype(y.dtype)).reshape(b, n, h, dk)
    v = jnp.dot(y, p["v"].astype(y.dtype)).reshape(b, n, h, dk)
    # per-layer relative position bias (UMT5: every layer has its own table)
    pos_bias = p["rel_bias"].astype(jnp.float32)[buckets]   # (N,N,H)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32)                      # NO 1/√d scale
    logits = logits + pos_bias.transpose(2, 0, 1)[None] + bias_mask
    probs = jax.nn.softmax(logits, axis=-1).astype(y.dtype)
    attn = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                      preferred_element_type=jnp.float32).astype(y.dtype)
    x = x + jnp.dot(attn.reshape(b, n, h * dk), p["o"].astype(y.dtype))

    y = rms_norm(p["ln2"], x, cfg.layer_norm_eps)
    gelu = jax.nn.gelu(jnp.dot(y, p["wi_0"].astype(y.dtype)),
                       approximate=True)
    ff = gelu * jnp.dot(y, p["wi_1"].astype(y.dtype))
    x = x + jnp.dot(ff, p["wo"].astype(y.dtype))
    return x


def encode(params, input_ids, attention_mask,
           cfg: UMT5Config = UMT5_XXL, *, remat: bool = True):
    """input_ids, attention_mask: (B, N) int → last hidden state (B, N, D).

    Positions past each sequence's length are zeroed, matching
    `compute_wan_text_embeddings` (`utils/wan_utils.py:53-59`)."""
    n = input_ids.shape[1]
    x = params["embed"][input_ids]
    bias_mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                          jnp.float32(-1e9))
    buckets = jnp.asarray(_bucket_table(n, cfg))

    def body(x, layer_params):
        fn = _layer_apply
        if remat:
            fn = jax.checkpoint(_layer_apply, static_argnums=(4,))
        return fn(layer_params, x, bias_mask, buckets, cfg), None

    x, _ = jax.lax.scan(lambda c, p: body(c, p), x, params["layers"])
    x = rms_norm(params["final_ln"], x, cfg.layer_norm_eps)
    return x * (attention_mask > 0)[..., None].astype(x.dtype)
