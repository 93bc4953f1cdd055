"""Qwen2.5-VL (UnifiedReward judge) — TPU-native JAX implementation.

The reference loads `CodeGoat24/UnifiedReward-qwen-7b` (a Qwen2.5-VL-7B
fine-tune) through HF for two eval paths: DPG-Bench yes/no VQA
(`evaluation/gen_eval/dpg_evaluation.py:79-124`) and the UnifiedReward
alignment/coherence/style judge
(`evaluation/gen_eval/gen_metrics/unified_reward.py:57-133`).  This module
implements the full model in JAX so the judge runs in-framework:

  * vision tower: conv3d patch embed (2x14x14), RMSNorm+SwiGLU blocks,
    2D rotary embedding, window attention (112px windows) with four
    full-attention layers, 2x2 patch merger MLP;
  * text decoder: Qwen2 GQA attention (q/k/v bias, o no-bias), SwiGLU MLP,
    RMSNorm, multimodal 3D RoPE (mrope sections over t/h/w);
  * greedy KV-cache generation.

TPU-first deviations from the HF graph (behavior-preserving):
  * ragged window attention (cu_seqlens) becomes one segment-masked
    attention over the static sequence — same result, no ragged splits;
  * the window permutation, rope tables, and 3D position ids are
    precomputed host-side per grid (static per compiled shape);
  * blocks run under `lax.scan` over stacked params, selecting the
    full-vs-window mask by a per-layer flag.

Weight import: `import_hf_qwen_vl` maps the HF checkpoint names.  Numeric
parity vs `transformers.Qwen2_5_VLForConditionalGeneration` is pinned by
`tests/test_qwen_vl.py` on tiny random configs (vision tower, mrope
decoder, get_rope_index, greedy generation).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# configs                                                                     #
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    tokens_per_second: int = 2
    window_size: int = 112
    out_hidden_size: int = 3584
    fullatt_block_indexes: tuple = (7, 15, 23, 31)
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class QwenVLTextConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    rope_theta: float = 1000000.0
    mrope_section: tuple = (16, 24, 24)
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    eos_token_ids: tuple = (151645, 151643)   # <|im_end|>, <|endoftext|>

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


QWEN25_VL_7B_VISION = QwenVLVisionConfig()
QWEN25_VL_7B_TEXT = QwenVLTextConfig()


# --------------------------------------------------------------------------- #
# shared numerics                                                             #
# --------------------------------------------------------------------------- #
def _rms_norm(w, x, eps):
    """fp32 variance, cast back BEFORE the weight multiply (Qwen2RMSNorm)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * w.astype(x.dtype)


def _lin(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    return y + p["b"].astype(x.dtype) if "b" in p else y


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _swiglu(p, x):
    return _lin(p["down"], jax.nn.silu(_lin(p["gate"], x)) * _lin(p["up"], x))


def _masked_attention(q, k, v, bias, scale):
    """(…, N, H, D) attention with an additive fp32 bias (broadcastable to
    (…, H, N, M)); fp32 softmax."""
    logits = jnp.einsum("...nhd,...mhd->...hnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32) + bias, axis=-1)
    return jnp.einsum("...hnm,...mhd->...nhd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


# --------------------------------------------------------------------------- #
# host-side static helpers (numpy; exact HF semantics)                        #
# --------------------------------------------------------------------------- #
def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280):
    """Qwen2VLImageProcessor.smart_resize: round to multiples of `factor`
    within the pixel budget, preserving aspect ratio."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio must be < 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def patchify(frames: np.ndarray, cfg: QwenVLVisionConfig):
    """(T, C, H, W) float frames (already resized+normalized) → flat patches
    (grid_t·grid_h·grid_w, C·tp·ps·ps) in the HF processor's merge-group
    order, plus the (t, h, w) grid."""
    ps, tp, m = cfg.patch_size, cfg.temporal_patch_size, cfg.spatial_merge_size
    t, c, h, w = frames.shape
    if t % tp:
        frames = np.concatenate(
            [frames, np.repeat(frames[-1:], tp - t % tp, axis=0)], axis=0)
    gt, gh, gw = frames.shape[0] // tp, h // ps, w // ps
    p = frames.reshape(gt, tp, c, gh // m, m, ps, gw // m, m, ps)
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (p.reshape(gt * gh * gw, c * tp * ps * ps).astype(np.float32),
            (gt, gh, gw))


def vision_rope_freqs(grid, cfg: QwenVLVisionConfig) -> np.ndarray:
    """(S, head_dim//2) rotary angles in merge-group token order."""
    gt, gh, gw = grid
    m = cfg.spatial_merge_size
    hpos = np.arange(gh)[:, None] * np.ones((1, gw), np.int64)
    wpos = np.ones((gh, 1), np.int64) * np.arange(gw)[None, :]

    def grouped(a):
        return a.reshape(gh // m, m, gw // m, m).transpose(0, 2, 1, 3).ravel()

    pos = np.stack([grouped(hpos), grouped(wpos)], axis=-1)   # (gh·gw, 2)
    pos = np.tile(pos, (gt, 1))
    dim = cfg.head_dim // 4
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, dtype=np.float64) / dim))
    return (pos[:, :, None] * inv[None, None]).reshape(pos.shape[0], -1) \
        .astype(np.float32)


def window_partition(grid, cfg: QwenVLVisionConfig):
    """HF `get_window_index` for one grid: returns (window_index — the
    merge-group permutation, window segment id per *patch* token, image
    segment id per patch token)."""
    gt, gh, gw = grid
    m = cfg.spatial_merge_size
    lh, lw = gh // m, gw // m
    win = cfg.window_size // m // cfg.patch_size
    pad_h, pad_w = (-lh) % win or win, (-lw) % win or win
    # HF pads by `win - l % win` even when l % win == 0 (a full extra pad
    # block of -100s that is then dropped) — result is the same permutation
    nh, nw = (lh + pad_h) // win, (lw + pad_w) // win
    idx = np.full((gt, lh + pad_h, lw + pad_w), -100, np.int64)
    idx[:, :lh, :lw] = np.arange(gt * lh * lw).reshape(gt, lh, lw)
    idx = idx.reshape(gt, nh, win, nw, win).transpose(0, 1, 3, 2, 4)
    idx = idx.reshape(-1, win, win)
    seqlens = (idx != -100).sum((1, 2))
    flat = idx.reshape(-1)
    window_index = flat[flat != -100]
    # segment id per merge group, then expand to the 4 patches of the group
    group_seg = np.repeat(np.arange(len(seqlens)), seqlens)
    unit = m * m
    win_seg = np.repeat(group_seg, unit)
    img_seg = np.zeros(gt * lh * lw * unit, np.int64)
    return window_index, win_seg, img_seg


def segment_bias(seg: np.ndarray) -> np.ndarray:
    """(S,) segment ids → (1, S, S) additive fp32 mask (0 inside a segment,
    −inf across)."""
    same = seg[:, None] == seg[None, :]
    return np.where(same, 0.0, -np.inf).astype(np.float32)[None]


def get_rope_index(input_ids: np.ndarray, image_grid_thw,
                   cfg: QwenVLTextConfig,
                   vision_cfg: QwenVLVisionConfig,
                   second_per_grid_ts=None, video_grid_thw=None):
    """3D mrope position ids for ONE sequence (judge runs batch 1).
    input_ids: (L,) int; grids: list of (t, h, w) per <image>/<video>
    placeholder run.  Returns ((3, L) int32, delta:int)."""
    m = vision_cfg.spatial_merge_size
    toks = list(map(int, input_ids))
    image_grid_thw = list(image_grid_thw or [])
    video_grid_thw = list(video_grid_thw or [])
    pos_list = []
    st, img_i, vid_i = 0, 0, 0
    n_vision = sum(1 for i, t in enumerate(toks)
                   if t == cfg.vision_start_token_id and i + 1 < len(toks)
                   and toks[i + 1] in (cfg.image_token_id, cfg.video_token_id))
    for _ in range(n_vision):
        ed_img = toks.index(cfg.image_token_id, st) \
            if cfg.image_token_id in toks[st:] else len(toks) + 1
        ed_vid = toks.index(cfg.video_token_id, st) \
            if cfg.video_token_id in toks[st:] else len(toks) + 1
        if ed_img < ed_vid:
            t, h, w = image_grid_thw[img_i]
            img_i += 1
            spg = 0.0
            ed = ed_img
        else:
            t, h, w = video_grid_thw[vid_i]
            spg = (second_per_grid_ts[vid_i]
                   if second_per_grid_ts is not None else 1.0)
            vid_i += 1
            ed = ed_vid
        lt, lh, lw = int(t), int(h) // m, int(w) // m
        text_len = ed - st
        st_idx = pos_list[-1].max() + 1 if pos_list else 0
        pos_list.append(np.tile(np.arange(text_len), (3, 1)) + st_idx)
        t_idx = np.repeat(
            (np.arange(lt) * spg * vision_cfg.tokens_per_second).astype(
                np.int64), lh * lw)
        h_idx = np.tile(np.repeat(np.arange(lh), lw), lt)
        w_idx = np.tile(np.arange(lw), lt * lh)
        pos_list.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
        st = ed + lt * lh * lw
    if st < len(toks):
        st_idx = pos_list[-1].max() + 1 if pos_list else 0
        pos_list.append(np.tile(np.arange(len(toks) - st), (3, 1)) + st_idx)
    pos = np.concatenate(pos_list, axis=1).astype(np.int32)
    return pos, int(pos.max()) + 1 - len(toks)


# --------------------------------------------------------------------------- #
# init                                                                        #
# --------------------------------------------------------------------------- #
def _lin_init(key, d_in, d_out, dtype, bias=True):
    p = {"w": jax.random.normal(key, (d_in, d_out), dtype) * 0.02}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def vision_init(key, cfg: QwenVLVisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    d, i = cfg.hidden_size, cfg.intermediate_size
    patch_dim = (cfg.in_channels * cfg.temporal_patch_size
                 * cfg.patch_size ** 2)

    def block(k):
        ks = jax.random.split(k, 6)
        return {
            "norm1": jnp.ones((d,), dtype),
            "norm2": jnp.ones((d,), dtype),
            "qkv": _lin_init(ks[0], d, 3 * d, dtype),
            "proj": _lin_init(ks[1], d, d, dtype),
            "mlp": {"gate": _lin_init(ks[2], d, i, dtype),
                    "up": _lin_init(ks[3], d, i, dtype),
                    "down": _lin_init(ks[4], i, d, dtype)},
        }

    blocks = [block(k) for k in jax.random.split(keys[0], cfg.depth)]
    mh = d * cfg.spatial_merge_size ** 2
    return {
        "patch_embed": jax.random.normal(
            keys[1], (patch_dim, d), dtype) * 0.02,
        "blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *blocks),
        "merger": {
            "ln_q": jnp.ones((d,), dtype),
            "fc1": _lin_init(keys[2], mh, mh, dtype),
            "fc2": _lin_init(keys[3], mh, cfg.out_hidden_size, dtype),
        },
    }


def text_init(key, cfg: QwenVLTextConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    d, i, dh = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    kv = cfg.num_kv_heads * dh

    def layer(k):
        ks = jax.random.split(k, 7)
        return {
            "ln1": jnp.ones((d,), dtype),
            "ln2": jnp.ones((d,), dtype),
            "q": _lin_init(ks[0], d, cfg.num_heads * dh, dtype),
            "k": _lin_init(ks[1], d, kv, dtype),
            "v": _lin_init(ks[2], d, kv, dtype),
            "o": _lin_init(ks[3], cfg.num_heads * dh, d, dtype, bias=False),
            "mlp": {"gate": _lin_init(ks[4], d, i, dtype, bias=False),
                    "up": _lin_init(ks[5], d, i, dtype, bias=False),
                    "down": _lin_init(ks[6], i, d, dtype, bias=False)},
        }

    layers = [layer(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    p = {
        "embed": jax.random.normal(keys[1], (cfg.vocab_size, d), dtype) * .02,
        "layers": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *layers),
        "ln_f": jnp.ones((d,), dtype),
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = jax.random.normal(
            keys[2], (d, cfg.vocab_size), dtype) * 0.02
    return p


# --------------------------------------------------------------------------- #
# vision forward                                                              #
# --------------------------------------------------------------------------- #
def vision_features(params, patches, grid, cfg: QwenVLVisionConfig):
    """patches: (S, C·tp·ps·ps) flat patch pixels for ONE image/video in HF
    processor order; grid: (t, h, w).  → (S // merge², out_hidden)."""
    unit = cfg.spatial_merge_size ** 2
    widx, win_seg, img_seg = window_partition(grid, cfg)
    freqs = vision_rope_freqs(grid, cfg)               # (S, dh/2)
    s = patches.shape[0]
    x = jnp.dot(patches, params["patch_embed"].astype(patches.dtype),
                preferred_element_type=jnp.float32).astype(patches.dtype)
    # permute merge groups into window order (static per grid)
    x = x.reshape(s // unit, unit, -1)[widx].reshape(s, -1)
    freqs = freqs.reshape(s // unit, unit, -1)[widx].reshape(s, -1)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos = jnp.asarray(np.cos(emb))[:, None, :]          # (S, 1, dh)
    sin = jnp.asarray(np.sin(emb))[:, None, :]
    # win_seg is already in window order (built from per-window seqlens);
    # img_seg is all zeros for a single image
    win_bias = jnp.asarray(segment_bias(win_seg))
    full_bias = jnp.asarray(segment_bias(img_seg))
    is_full = jnp.asarray(
        np.isin(np.arange(cfg.depth), cfg.fullatt_block_indexes))
    scale = cfg.head_dim ** -0.5
    h, dh = cfg.num_heads, cfg.head_dim

    def rope(t):
        tf = t.astype(jnp.float32)
        return (tf * cos + _rotate_half(tf) * sin).astype(t.dtype)

    def body(carry, inputs):
        p, full_flag = inputs
        x = carry
        y = _rms_norm(p["norm1"], x, cfg.eps)
        qkv = _lin(p["qkv"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rope(q.reshape(s, h, dh))
        k = rope(k.reshape(s, h, dh))
        v = v.reshape(s, h, dh)
        bias = jnp.where(full_flag, full_bias, win_bias)
        o = _masked_attention(q, k, v, bias, scale).reshape(s, -1)
        x = x + _lin(p["proj"], o)
        y = _rms_norm(p["norm2"], x, cfg.eps)
        return x + _swiglu(p["mlp"], y), None

    x, _ = jax.lax.scan(body, x, (params["blocks"], is_full))
    # merger: RMSNorm then 2x2-group MLP
    m = params["merger"]
    y = _rms_norm(m["ln_q"], x, cfg.eps).reshape(s // unit, -1)
    y = _lin(m["fc2"], jax.nn.gelu(_lin(m["fc1"], y), approximate=False))
    # undo the window permutation
    rev = np.argsort(widx)
    return y[rev]


# --------------------------------------------------------------------------- #
# text forward                                                                #
# --------------------------------------------------------------------------- #
def _mrope_tables(pos_ids, cfg: QwenVLTextConfig, dtype):
    """pos_ids (3, L) → cos/sin (L, head_dim) with mrope section mixing."""
    dh = cfg.head_dim
    half = dh // 2
    inv = 1.0 / (cfg.rope_theta
                 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    freqs = pos_ids[:, :, None].astype(jnp.float32) * inv[None, None]  # 3,L,h
    emb = jnp.concatenate([freqs, freqs], axis=-1)                     # 3,L,dh
    sections = list(cfg.mrope_section) * 2
    idx = np.repeat(np.arange(len(sections)) % 3, sections)            # (dh,)
    sel = jnp.asarray(idx)
    mixed = jnp.take_along_axis(
        emb, sel[None, None, :].repeat(emb.shape[1], 1), axis=0)[0]
    return (jnp.cos(mixed).astype(dtype)[:, None, :],
            jnp.sin(mixed).astype(dtype)[:, None, :])


def _text_layer(p, x, cos, sin, kcache, vcache, cache_pos, bias,
                cfg: QwenVLTextConfig):
    """One decoder layer over (L, D) tokens; returns output + updated cache
    slices.  kcache/vcache: (Lmax, kvh, dh)."""
    l = x.shape[0]
    h, kvh, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    y = _rms_norm(p["ln1"], x, cfg.rms_eps)
    q = _lin(p["q"], y).reshape(l, h, dh)
    k = _lin(p["k"], y).reshape(l, kvh, dh)
    v = _lin(p["v"], y).reshape(l, kvh, dh)

    def rope(t):
        tf = t.astype(jnp.float32)
        return (tf * cos.astype(jnp.float32)
                + _rotate_half(tf) * sin.astype(jnp.float32)).astype(t.dtype)

    q, k = rope(q), rope(k)
    kcache = jax.lax.dynamic_update_slice(kcache, k, (cache_pos, 0, 0))
    vcache = jax.lax.dynamic_update_slice(vcache, v, (cache_pos, 0, 0))
    reps = h // kvh
    kk = jnp.repeat(kcache, reps, axis=1)
    vv = jnp.repeat(vcache, reps, axis=1)
    o = _masked_attention(q, kk, vv, bias, dh ** -0.5).reshape(l, -1)
    x = x + _lin(p["o"], o)
    y = _rms_norm(p["ln2"], x, cfg.rms_eps)
    return x + _swiglu(p["mlp"], y), kcache, vcache


def text_forward(params, embeds, pos_ids, cfg: QwenVLTextConfig, *,
                 kcache=None, vcache=None, cache_pos=0, valid_len=None,
                 last_only: bool = False):
    """embeds: (L, D); pos_ids: (3, L).  Returns (logits (L, V), kcache,
    vcache).  With a cache, computes the incremental step at `cache_pos`;
    without, allocates a cache of exactly L.

    last_only=True computes logits for the FINAL position only (returns
    (1, V)): greedy prefill at 7B otherwise burns L·V·D flops
    (~1.6 TFLOP at L=1.5k) and an (L, 152k) fp32 buffer on logits that are
    immediately discarded."""
    l = embeds.shape[0]
    if kcache is None:
        lmax = l
        kcache = jnp.zeros((cfg.num_layers, lmax, cfg.num_kv_heads,
                            cfg.head_dim), embeds.dtype)
        vcache = jnp.zeros_like(kcache)
        cache_pos = 0
    lmax = kcache.shape[1]
    cos, sin = _mrope_tables(pos_ids, cfg, embeds.dtype)
    # causal-by-absolute-position mask over the cache
    key_pos = jnp.arange(lmax)
    q_pos = cache_pos + jnp.arange(l)
    bias = jnp.where(key_pos[None, :] <= q_pos[:, None], 0.0, -jnp.inf)
    if valid_len is not None:
        bias = jnp.where(key_pos[None, :] < valid_len, bias, -jnp.inf)
    bias = bias[None].astype(jnp.float32)   # (1, L, Lmax) → broadcast heads

    def body(x, inputs):
        p, kc, vc = inputs
        x, kc, vc = _text_layer(p, x, cos, sin, kc, vc, cache_pos, bias, cfg)
        return x, (kc, vc)

    x, (kcache, vcache) = jax.lax.scan(
        body, embeds, (params["layers"], kcache, vcache))
    if last_only:
        x = x[-1:]
    x = _rms_norm(params["ln_f"], x, cfg.rms_eps)
    head = params.get("lm_head", None)
    w = params["embed"].T if head is None else head
    logits = jnp.dot(x, w.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return logits, kcache, vcache


def embed_tokens(params, input_ids, image_embeds, cfg: QwenVLTextConfig):
    """Token embeddings with image features scattered onto <|image_pad|>
    positions (order-preserving, static shapes: the number of pad tokens
    must equal image_embeds rows)."""
    x = params["embed"][input_ids]
    if image_embeds is not None:
        is_img = input_ids == cfg.image_token_id
        # index of each image slot among image tokens
        slot = jnp.cumsum(is_img) - 1
        gathered = image_embeds[jnp.clip(slot, 0, image_embeds.shape[0] - 1)]
        x = jnp.where(is_img[:, None], gathered.astype(x.dtype), x)
    return x


# --------------------------------------------------------------------------- #
# greedy generation                                                           #
# --------------------------------------------------------------------------- #
def greedy_generate(params, input_ids: np.ndarray, image_embeds,
                    pos_ids: np.ndarray, delta: int,
                    cfg: QwenVLTextConfig, max_new_tokens: int = 512):
    """Greedy decode (batch 1).  input_ids: (L,) host ints; image_embeds:
    (S, D) or None; pos_ids/delta from `get_rope_index`.  Returns the list
    of generated token ids (stops at an EOS)."""
    l = len(input_ids)
    lmax = l + max_new_tokens
    ids = jnp.asarray(np.asarray(input_ids, np.int32))

    @jax.jit
    def prefill(params, ids, image_embeds, pos_ids):
        x = embed_tokens(params, ids, image_embeds, cfg)
        kc = jnp.zeros((cfg.num_layers, lmax, cfg.num_kv_heads,
                        cfg.head_dim), x.dtype)
        vc = jnp.zeros_like(kc)
        logits, kc, vc = text_forward(params, x, pos_ids, cfg,
                                      kcache=kc, vcache=vc, cache_pos=0,
                                      last_only=True)
        return jnp.argmax(logits[-1]).astype(jnp.int32), kc, vc

    @jax.jit
    def step(params, tok, pos, cache_pos, kc, vc):
        x = params["embed"][tok][None]
        logits, kc, vc = text_forward(
            params, x, jnp.full((3, 1), pos, jnp.int32), cfg,
            kcache=kc, vcache=vc, cache_pos=cache_pos)
        return jnp.argmax(logits[-1]).astype(jnp.int32), kc, vc

    tok, kc, vc = prefill(params, ids, image_embeds, jnp.asarray(pos_ids))
    out = []
    for i in range(max_new_tokens):
        t = int(tok)
        if t in cfg.eos_token_ids:
            break
        out.append(t)
        tok, kc, vc = step(params, tok, jnp.int32(l + i + delta),
                           jnp.int32(l + i), kc, vc)
    return out


# --------------------------------------------------------------------------- #
# HF weight import                                                            #
# --------------------------------------------------------------------------- #
def import_hf_qwen_vl(sd, vision_cfg: QwenVLVisionConfig,
                      text_cfg: QwenVLTextConfig):
    """HF `Qwen2_5_VLForConditionalGeneration` state_dict → (vision_params,
    text_params).  Accepts both the `model.language_model.` /
    `model.visual.` (≥4.52) and legacy `model.` / `visual.` prefixes."""
    keys = list(sd.keys())

    def find_prefix(cands):
        for c in cands:
            if any(k.startswith(c) for k in keys):
                return c
        raise KeyError(f"none of {cands} in state dict")

    vp = find_prefix(["model.visual.", "visual."])
    tp = find_prefix(["model.language_model.", "model."])

    def t(k):
        return jnp.asarray(np.asarray(sd[k]))

    def tr(k):
        return jnp.asarray(np.asarray(sd[k]).T)

    def lin(prefix, bias=True):
        p = {"w": tr(f"{prefix}.weight")}
        if bias:
            p["b"] = t(f"{prefix}.bias")
        return p

    vblocks = []
    for i in range(vision_cfg.depth):
        b = f"{vp}blocks.{i}"
        vblocks.append({
            "norm1": t(f"{b}.norm1.weight"),
            "norm2": t(f"{b}.norm2.weight"),
            "qkv": lin(f"{b}.attn.qkv"),
            "proj": lin(f"{b}.attn.proj"),
            "mlp": {"gate": lin(f"{b}.mlp.gate_proj"),
                    "up": lin(f"{b}.mlp.up_proj"),
                    "down": lin(f"{b}.mlp.down_proj")},
        })
    pe = np.asarray(sd[f"{vp}patch_embed.proj.weight"])   # (D, C, tp, ps, ps)
    vision = {
        "patch_embed": jnp.asarray(pe.reshape(pe.shape[0], -1).T),
        "blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *vblocks),
        "merger": {
            "ln_q": t(f"{vp}merger.ln_q.weight"),
            "fc1": lin(f"{vp}merger.mlp.0"),
            "fc2": lin(f"{vp}merger.mlp.2"),
        },
    }

    layers = []
    for i in range(text_cfg.num_layers):
        b = f"{tp}layers.{i}"
        layers.append({
            "ln1": t(f"{b}.input_layernorm.weight"),
            "ln2": t(f"{b}.post_attention_layernorm.weight"),
            "q": lin(f"{b}.self_attn.q_proj"),
            "k": lin(f"{b}.self_attn.k_proj"),
            "v": lin(f"{b}.self_attn.v_proj"),
            "o": lin(f"{b}.self_attn.o_proj", bias=False),
            "mlp": {"gate": lin(f"{b}.mlp.gate_proj", bias=False),
                    "up": lin(f"{b}.mlp.up_proj", bias=False),
                    "down": lin(f"{b}.mlp.down_proj", bias=False)},
        })
    text = {
        "embed": t(f"{tp}embed_tokens.weight"),
        "layers": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *layers),
        "ln_f": t(f"{tp}norm.weight"),
    }
    if not text_cfg.tie_embeddings:
        text["lm_head"] = tr("lm_head.weight")
    return vision, text


# --------------------------------------------------------------------------- #
# tensor-parallel placement (judge at 7B on a v5e slice)                       #
# --------------------------------------------------------------------------- #
def text_param_shardings(params, cfg: QwenVLTextConfig, *,
                         axis: str = "model"):
    """Megatron-style PartitionSpecs for the text decoder.

    7B bf16 weights are ~15.2 GB — over one v5e chip's 15.75 GB with a KV
    cache on top, so the deployed judge (`dpg_evaluation.py:79-124` runs it
    on one GH200) runs TP here.  Column-parallel q/k/v/gate/up, row-parallel
    o/down; embeddings, final norm, and the (untied) lm_head replicate
    (~2.2 GB at 7B — affordable at N ≥ 2, and keeps the greedy-decode argmax
    local).  The GQA repeat maps kv head i to q heads [i·reps, (i+1)·reps):
    both shard evenly iff `axis` size divides num_kv_heads (4 at 7B) —
    use model ∈ {2, 4}.
    """
    from jax.sharding import PartitionSpec as P

    col = {"w": P(None, None, axis), "b": P(None, axis)}
    row_nb = {"w": P(None, axis, None)}
    specs = {
        "embed": P(),
        "ln_f": P(),
        "layers": {
            "ln1": P(None), "ln2": P(None),
            "q": col, "k": col, "v": col,
            "o": row_nb,
            "mlp": {"gate": {"w": P(None, None, axis)},
                    "up": {"w": P(None, None, axis)},
                    "down": {"w": P(None, axis, None)}},
        },
    }
    if "lm_head" in params:
        specs["lm_head"] = P()
    return specs


def place_text(params, cfg: QwenVLTextConfig, mesh, *, axis: str = "model"):
    """device_put the text params onto `mesh` with `text_param_shardings`."""
    from jax.sharding import NamedSharding

    specs = text_param_shardings(params, cfg, axis=axis)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
        params, specs,
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
