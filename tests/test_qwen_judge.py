"""Qwen judge wrapper: preprocessing parity vs the HF processor (with
resize), chat-id construction, and end-to-end VQA/UnifiedReward callables
on the tiny parity model (`dpg_evaluation.py:91-124`,
`gen_metrics/unified_reward.py:67-133`)."""

import numpy as np
import pytest

from vist3a_tpu.eval import qwen_judge
from vist3a_tpu.nn import qwen_vl

torch = pytest.importorskip("torch")

from tests.test_qwen_vl import TCFG, VCFG, hf_model, params  # noqa: F401,E402


def test_preprocess_matches_hf_processor():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 200, 3)).astype(np.uint8)
    proc = Qwen2VLImageProcessor(patch_size=14, temporal_patch_size=2,
                                 merge_size=2)
    want = proc(images=[img], return_tensors="np")
    got, grid = qwen_judge.preprocess_image(img, qwen_vl.QWEN25_VL_7B_VISION)
    assert grid == tuple(want["image_grid_thw"][0].tolist())
    np.testing.assert_allclose(got, want["pixel_values"], rtol=2e-3,
                               atol=2e-3)


class StubTokenizer:
    """Maps the chat-template specials + lowercase words into the tiny
    vocab (image_pad=120 etc. match TCFG)."""

    SPECIALS = {"<|im_start|>": 100, "<|im_end|>": 101, "<|image_pad|>": 120,
                "<|vision_start|>": 122, "<|vision_end|>": 123}

    def __call__(self, text, add_special_tokens=False):
        import re
        ids = []
        pat = "|".join(map(re.escape, self.SPECIALS)) + r"|\w+|[^\s]"
        for tok in re.findall(pat, text):
            ids.append(self.SPECIALS.get(tok, hash(tok) % 90 + 1))
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids)


def test_build_chat_ids_pad_count():
    tok = StubTokenizer()
    ids = qwen_judge.build_chat_ids(tok, "a cat?", 16)
    assert (ids == 120).sum() == 16
    vs = np.flatnonzero(ids == 122)
    assert len(vs) == 1 and ids[vs[0] + 1] == 120   # pads follow vision_start


def test_vqa_judge_end_to_end(params):                       # noqa: F811
    vis, txt = params
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    vqa = qwen_judge.make_vqa_judge(
        vis, txt, StubTokenizer(), vcfg=VCFG, tcfg=TCFG, max_new_tokens=4,
        min_pixels=16, max_pixels=64)
    out = vqa(img, "is there a cat?")
    assert isinstance(out, str) and len(out) > 0


def test_unified_reward_judge_end_to_end(params):            # noqa: F811
    vis, txt = params
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    judge = qwen_judge.make_unified_reward_judge(
        vis, txt, StubTokenizer(), vcfg=VCFG, tcfg=TCFG, max_new_tokens=4,
        min_pixels=16, max_pixels=64)
    out = judge([img], "a photo of a cat")
    assert isinstance(out, str) and len(out) > 0


def test_load_judge_roundtrip(hf_model, tmp_path):             # noqa: F811
    """save_pretrained dir → load_judge → same logits as the HF model."""
    import jax.numpy as jnp
    import torch

    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    vis, txt, tok, vcfg, tcfg = qwen_judge.load_judge(
        str(tmp_path), tokenizer=StubTokenizer())
    assert vcfg == VCFG
    assert tcfg.num_layers == TCFG.num_layers
    assert tcfg.mrope_section == TCFG.mrope_section
    ids = np.asarray([3, 4, 5, 6, 7], np.int64)
    with torch.no_grad():
        want = hf_model(input_ids=torch.from_numpy(ids)[None]).logits[0]
    pos, _ = qwen_vl.get_rope_index(ids, [], tcfg, vcfg)
    emb = qwen_vl.embed_tokens(txt, jnp.asarray(ids.astype(np.int32)),
                               None, tcfg)
    logits, _, _ = qwen_vl.text_forward(txt, emb, jnp.asarray(pos), tcfg)
    np.testing.assert_allclose(np.asarray(logits), want.numpy(),
                               rtol=3e-4, atol=3e-4)
