"""First-party scorer adapters for the gen-eval harness.

Parity targets: `evaluation/gen_eval/gen_metrics/` —
  * `clip_score.py:17-27` — CLIPScore averaged over sampled frames (the
    torchmetrics convention: 100·max(cos(img, text), 0));
  * `aesthetic_quality.py:55-114` — LAION aesthetic probe: CLIP ViT-L/14
    image features, L2-normalized, through a 768→1 linear head; score/10
    averaged over frames (reported ×100 in the README tables);
  * LongCLIP (248-token text) shares the image tower — same adapter with a
    different text-feature source.

These run on `vist3a_tpu.nn.clip` image towers.  Text features are fully
in-framework: `make_clip_text_features` composes the BPE tokenizer
(`data/clip_tokenizer.py`) with the `nn.clip` text tower — covering
CLIPScore (ViT-L/14, `CLIP_L_TEXT`) and LongCLIP-L (248-position
`LONGCLIP_L_TEXT`, a standard HF CLIPModel checkpoint).  MUSIQ and the
Qwen judge remain external scorers behind the `gen_eval` callable
interface (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vist3a_tpu.nn import clip as clip_mod

CLIP_L_224 = clip_mod.CLIPVisionConfig(
    hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
    patch_size=14, image_size=224, projection_dim=768, act="quick_gelu")


def _frames_to_clip_input(frames, size: int) -> jnp.ndarray:
    """list of (H,W,3) uint8 → CLIP-normalized (N,3,size,size): bicubic
    shorter-side resize + center crop (openai clip_transform)."""
    out = []
    mean = np.asarray(clip_mod.CLIP_MEAN).reshape(3, 1, 1)
    std = np.asarray(clip_mod.CLIP_STD).reshape(3, 1, 1)
    for f in frames:
        img = jnp.asarray(f, jnp.float32).transpose(2, 0, 1)[None] / 255.0
        _, c, h, w = img.shape
        if h < w:
            nh, nw = size, max(round(w * size / h), size)
        else:
            nw, nh = size, max(round(h * size / w), size)
        img = jax.image.resize(img, (1, c, nh, nw), "bicubic",
                               antialias=True)
        y0, x0 = (nh - size) // 2, (nw - size) // 2
        img = img[:, :, y0:y0 + size, x0:x0 + size]
        out.append((np.asarray(img[0]) - mean) / std)
    return jnp.asarray(np.stack(out), jnp.float32)


def make_clip_text_features(text_params, text_cfg, tokenizer, *,
                            pad: str = "eos"):
    """prompt → normalized (D,) text features, fully in-framework.

    tokenizer: `data.clip_tokenizer.CLIPTokenizer` (pad='eos' matches the
    HF processors used by torchmetrics CLIPScore / PickScore; 'zero'
    matches open_clip).  Use `text_cfg=nn.clip.LONGCLIP_L_TEXT` for the
    248-position LongCLIP-L tower."""

    def text_features_fn(prompt: str):
        ids = tokenizer([prompt], text_cfg.context_length, pad=pad)
        return np.asarray(
            clip_mod.text_features(text_params, jnp.asarray(ids),
                                   text_cfg))[0]

    return text_features_fn


def make_clip_scorer(params, text_features_fn,
                     cfg: clip_mod.CLIPVisionConfig = clip_mod.CLIP_H_224):
    """CLIPScore(frames, prompt) = mean over frames of
    100·max(cos(img, text), 0).  text_features_fn(prompt) → (D,) normalized
    text embedding (host/off-path)."""

    def score(frames, prompt) -> float:
        px = _frames_to_clip_input(frames, cfg.image_size)
        img = clip_mod.image_features(params, px, cfg)
        txt = jnp.asarray(text_features_fn(prompt)).reshape(-1)
        txt = txt / jnp.linalg.norm(txt)
        cos = img @ txt
        return float(jnp.mean(100.0 * jnp.maximum(cos, 0.0)))

    return score


def make_aesthetic_scorer(clip_params, linear_w, linear_b,
                          cfg: clip_mod.CLIPVisionConfig = CLIP_L_224):
    """LAION aesthetic probe: normalized ViT-L/14 features → 768→1 linear;
    mean(score)/10 over frames (`aesthetic_quality.py:86-114`)."""
    w = jnp.asarray(np.asarray(linear_w).reshape(-1))
    b = jnp.float32(np.asarray(linear_b).reshape(()))

    def score(frames) -> float:
        px = _frames_to_clip_input(frames, cfg.image_size)
        feats = clip_mod.image_features(clip_params, px, cfg,
                                        normalize=True)
        s = feats @ w + b
        return float(jnp.mean(s) / 10.0)

    return score
