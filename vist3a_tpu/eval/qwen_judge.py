"""In-framework Qwen2.5-VL judge callables for the gen-eval harness.

Parity targets:
  * `dpg_evaluation.py:91-124` (`MPLUG.vqa`): chat-template VQA with the
    exact "one word 'Yes' or 'No'" wrapper, greedy decode;
  * `gen_metrics/unified_reward.py:67-133`: the UnifiedReward
    alignment/coherence/style prompt (verbatim) + greedy decode; the output
    string is parsed by `gen_eval.parse_unified_scores`.

The neural model is `nn.qwen_vl` (JAX, parity-tested).  Host-side pieces:
PIL bicubic resize to the smart-resize grid (the HF processor's default
resample), CLIP mean/std normalization, and a text tokenizer loaded from
checkpoint-local files (e.g. `transformers.AutoTokenizer.from_pretrained(
local_dir)`), injected as `tokenizer`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vist3a_tpu.nn import qwen_vl
from vist3a_tpu.nn.clip import CLIP_MEAN, CLIP_STD

IM_START, IM_END = "<|im_start|>", "<|im_end|>"
VISION_START, VISION_END = "<|vision_start|>", "<|vision_end|>"
IMAGE_PAD = "<|image_pad|>"

VQA_WRAPPER = ("Please answer the following question with only one word "
               "'Yes' or 'No': {question}\nASSISTANT:\n")

# single source of truth for the judging prompt (verbatim from
# `gen_metrics/unified_reward.py:67-133`) lives in eval/gen_eval.py
from vist3a_tpu.eval.gen_eval import UNIFIED_REWARD_PROMPT  # noqa: E402


def preprocess_image(img: np.ndarray, cfg: qwen_vl.QwenVLVisionConfig, *,
                     min_pixels: int = 56 * 56,
                     max_pixels: int = 14 * 14 * 4 * 1280):
    """(H, W, 3) uint8 → (flat patches, grid): smart-resize to the patch
    grid (PIL bicubic, the HF processor default), CLIP-normalize, patchify
    in HF merge-group order."""
    from PIL import Image

    factor = cfg.patch_size * cfg.spatial_merge_size
    h, w = img.shape[:2]
    rh, rw = qwen_vl.smart_resize(h, w, factor, min_pixels, max_pixels)
    pil = Image.fromarray(img).resize((rw, rh), Image.BICUBIC)
    arr = np.asarray(pil, np.float32) / 255.0
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    arr = (arr - mean) / std
    frames = arr.transpose(2, 0, 1)[None]          # (1, C, H, W)
    return qwen_vl.patchify(frames, cfg)


def build_chat_ids(tokenizer, question: str, n_image_tokens: int,
                   system: str = "You are a helpful assistant.") -> np.ndarray:
    """Qwen2.5-VL chat template with generation prompt; the single image
    placeholder is expanded to `n_image_tokens` pads (what
    `AutoProcessor.apply_chat_template` + processor expansion produce)."""
    text = (f"{IM_START}system\n{system}{IM_END}\n"
            f"{IM_START}user\n{VISION_START}{IMAGE_PAD * n_image_tokens}"
            f"{VISION_END}{question}{IM_END}\n"
            f"{IM_START}assistant\n")
    ids = tokenizer(text, add_special_tokens=False)["input_ids"]
    return np.asarray(ids, np.int32)


def _run(vision_params, text_params, tokenizer, img, question,
         vcfg: qwen_vl.QwenVLVisionConfig, tcfg: qwen_vl.QwenVLTextConfig,
         max_new_tokens: int, min_pixels: int, max_pixels: int) -> str:
    patches, grid = preprocess_image(np.asarray(img), vcfg,
                                     min_pixels=min_pixels,
                                     max_pixels=max_pixels)
    n_img = patches.shape[0] // vcfg.spatial_merge_size ** 2
    ids = build_chat_ids(tokenizer, question, n_img)
    feats = qwen_vl.vision_features(vision_params, jnp.asarray(patches),
                                    grid, vcfg)
    pos, delta = qwen_vl.get_rope_index(ids, [grid], tcfg, vcfg)
    out = qwen_vl.greedy_generate(text_params, ids, feats, pos, delta, tcfg,
                                  max_new_tokens=max_new_tokens)
    return tokenizer.decode(out, skip_special_tokens=True).strip()


def load_judge(checkpoint_dir: str, *, tokenizer=None, dtype=None):
    """Load a local HF-layout Qwen2.5-VL checkpoint directory (config.json +
    *.safetensors [+ tokenizer files]) → (vision_params, text_params,
    tokenizer, vcfg, tcfg).  The reference does the equivalent via
    `Qwen2_5_VLForConditionalGeneration.from_pretrained`
    (`dpg_evaluation.py:82-86`, `gen_metrics/unified_reward.py:57-63`)."""
    import glob
    import json
    import os

    import safetensors.numpy

    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf = json.load(f)
    v = hf.get("vision_config", {})
    t = hf.get("text_config", hf)
    vcfg = qwen_vl.QwenVLVisionConfig(
        depth=v.get("depth", 32),
        hidden_size=v.get("hidden_size", 1280),
        intermediate_size=v.get("intermediate_size", 3420),
        num_heads=v.get("num_heads", 16),
        in_channels=v.get("in_channels", 3),
        patch_size=v.get("patch_size", 14),
        spatial_merge_size=v.get("spatial_merge_size", 2),
        temporal_patch_size=v.get("temporal_patch_size", 2),
        tokens_per_second=v.get("tokens_per_second", 2),
        window_size=v.get("window_size", 112),
        out_hidden_size=v.get("out_hidden_size", 3584),
        fullatt_block_indexes=tuple(v.get("fullatt_block_indexes",
                                          (7, 15, 23, 31))))
    eos = t.get("eos_token_id", hf.get("eos_token_id", 151645))
    eos = tuple(eos) if isinstance(eos, (list, tuple)) else (eos, 151643)
    tcfg = qwen_vl.QwenVLTextConfig(
        vocab_size=t.get("vocab_size", 152064),
        hidden_size=t.get("hidden_size", 3584),
        intermediate_size=t.get("intermediate_size", 18944),
        num_layers=t.get("num_hidden_layers", 28),
        num_heads=t.get("num_attention_heads", 28),
        num_kv_heads=t.get("num_key_value_heads", 4),
        rope_theta=t.get("rope_theta", 1e6),
        mrope_section=tuple(t.get("rope_scaling", {}).get("mrope_section",
                                                          (16, 24, 24))),
        rms_eps=t.get("rms_norm_eps", 1e-6),
        tie_embeddings=t.get("tie_word_embeddings",
                             hf.get("tie_word_embeddings", False)),
        image_token_id=hf.get("image_token_id", 151655),
        video_token_id=hf.get("video_token_id", 151656),
        vision_start_token_id=hf.get("vision_start_token_id", 151652),
        eos_token_ids=eos)
    sd = {}
    for shard in sorted(glob.glob(os.path.join(checkpoint_dir,
                                               "*.safetensors"))):
        sd.update(safetensors.numpy.load_file(shard))
    vision, text = qwen_vl.import_hf_qwen_vl(sd, vcfg, tcfg)
    if dtype is not None:
        cast = lambda x: x.astype(dtype)  # noqa: E731
        vision = jax.tree_util.tree_map(cast, vision)
        text = jax.tree_util.tree_map(cast, text)
    if tokenizer is None:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(checkpoint_dir)
    return vision, text, tokenizer, vcfg, tcfg


def make_vqa_judge(vision_params, text_params, tokenizer, *,
                   vcfg=qwen_vl.QWEN25_VL_7B_VISION,
                   tcfg=qwen_vl.QWEN25_VL_7B_TEXT,
                   max_new_tokens: int = 16,
                   min_pixels: int = 56 * 56,
                   max_pixels: int = 14 * 14 * 4 * 1280):
    """vqa(image, question) → decoded answer string ('Yes'/'No' for DPG)."""

    def vqa(image, question: str) -> str:
        return _run(vision_params, text_params, tokenizer, image,
                    VQA_WRAPPER.format(question=question), vcfg, tcfg,
                    max_new_tokens, min_pixels, max_pixels)

    return vqa


def make_unified_reward_judge(vision_params, text_params, tokenizer, *,
                              vcfg=qwen_vl.QWEN25_VL_7B_VISION,
                              tcfg=qwen_vl.QWEN25_VL_7B_TEXT,
                              max_new_tokens: int = 1024,
                              min_pixels: int = 56 * 56,
                              max_pixels: int = 14 * 14 * 4 * 1280):
    """unified_reward(frames, prompt) → raw judge text (one frame per call,
    matching `run_scene_eval`); parse with `gen_eval.parse_unified_scores`."""

    def judge(frames, prompt: str) -> str:
        return _run(vision_params, text_params, tokenizer, frames[0],
                    UNIFIED_REWARD_PROMPT.format(prompt=prompt), vcfg, tcfg,
                    max_new_tokens, min_pixels, max_pixels)

    return judge
