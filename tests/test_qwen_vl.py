"""Qwen2.5-VL parity vs transformers on tiny random configs — vision tower
(window attention + merger), mrope decoder, get_rope_index, full VQA logits,
and greedy generation (`dpg_evaluation.py:79-124`,
`gen_metrics/unified_reward.py:57-133`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vist3a_tpu.nn import qwen_vl

torch = pytest.importorskip("torch")
from transformers.models.qwen2_5_vl import (          # noqa: E402
    Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration)
from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (  # noqa
    Qwen2_5_VLTextConfig, Qwen2_5_VLVisionConfig)

VIS = dict(depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
           in_channels=3, patch_size=2, spatial_merge_size=2,
           temporal_patch_size=2, tokens_per_second=2, window_size=8,
           out_hidden_size=48, fullatt_block_indexes=[1, 3])
TXT = dict(vocab_size=128, hidden_size=48, intermediate_size=96,
           num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
           rope_theta=1e6, rms_norm_eps=1e-6, tie_word_embeddings=False,
           max_position_embeddings=512,
           rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]})
SPECIAL = dict(image_token_id=120, video_token_id=121,
               vision_start_token_id=122, vision_end_token_id=123)

VCFG = qwen_vl.QwenVLVisionConfig(
    depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
    patch_size=2, spatial_merge_size=2, temporal_patch_size=2,
    tokens_per_second=2, window_size=8, out_hidden_size=48,
    fullatt_block_indexes=(1, 3))
TCFG = qwen_vl.QwenVLTextConfig(
    vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=3,
    num_heads=4, num_kv_heads=2, rope_theta=1e6, mrope_section=(2, 2, 2),
    rms_eps=1e-6, tie_embeddings=False, image_token_id=120,
    video_token_id=121, vision_start_token_id=122, eos_token_ids=())


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(vision_config=dict(VIS), text_config=dict(TXT),
                           **SPECIAL)
    cfg.vision_config.out_hidden_size = 48   # must match text hidden
    m = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return m


@pytest.fixture(scope="module")
def params(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return qwen_vl.import_hf_qwen_vl(sd, VCFG, TCFG)


def _patches(rng, grid):
    gt, gh, gw = grid
    s = gt * gh * gw
    dim = 3 * VCFG.temporal_patch_size * VCFG.patch_size ** 2
    return rng.standard_normal((s, dim)).astype(np.float32)


def test_vision_tower_matches_hf(hf_model, params):
    """Window permutation, segment-masked window/full attention, 2D rope,
    merger — vs `Qwen2_5_VisionTransformerPretrainedModel.forward`."""
    rng = np.random.default_rng(0)
    grid = (1, 8, 8)                      # llm grid 4x4, window 2 → ragged-free
    flat = _patches(rng, grid)
    with torch.no_grad():
        want = hf_model.model.visual(
            torch.from_numpy(flat),
            grid_thw=torch.tensor([list(grid)])).numpy()
    got = np.asarray(qwen_vl.vision_features(
        params[0], jnp.asarray(flat), grid, VCFG))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_vision_tower_ragged_windows(hf_model, params):
    """Grid not divisible by the window size → ragged windows (HF splits by
    cu_seqlens; we segment-mask)."""
    rng = np.random.default_rng(1)
    grid = (1, 12, 8)                     # llm grid 6x4 → 2-wide + ragged rows
    flat = _patches(rng, grid)
    with torch.no_grad():
        want = hf_model.model.visual(
            torch.from_numpy(flat),
            grid_thw=torch.tensor([list(grid)])).numpy()
    got = np.asarray(qwen_vl.vision_features(
        params[0], jnp.asarray(flat), grid, VCFG))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _prompt_ids(grid):
    gt, gh, gw = grid
    n_img = gt * gh * gw // VCFG.spatial_merge_size ** 2
    ids = ([5, 6, 7, SPECIAL["vision_start_token_id"]]
           + [SPECIAL["image_token_id"]] * n_img
           + [SPECIAL["vision_end_token_id"], 9, 10, 11, 12])
    return np.asarray(ids, np.int64)


def test_get_rope_index_matches_hf(hf_model):
    grid = (1, 8, 8)
    ids = _prompt_ids(grid)
    want_pos, want_delta = hf_model.model.get_rope_index(
        torch.from_numpy(ids)[None],
        image_grid_thw=torch.tensor([list(grid)]))
    got_pos, got_delta = qwen_vl.get_rope_index(ids, [grid], TCFG, VCFG)
    np.testing.assert_array_equal(got_pos, want_pos[:, 0].numpy())
    assert got_delta == int(want_delta[0, 0])


def test_full_vqa_logits_match_hf(hf_model, params):
    """input_ids + pixels → logits through vision scatter + mrope decoder."""
    rng = np.random.default_rng(2)
    grid = (1, 8, 8)
    flat = _patches(rng, grid)
    ids = _prompt_ids(grid)
    with torch.no_grad():
        want = hf_model(
            input_ids=torch.from_numpy(ids)[None],
            pixel_values=torch.from_numpy(flat),
            image_grid_thw=torch.tensor([list(grid)])).logits[0].numpy()
    vis, txt = params
    img = qwen_vl.vision_features(vis, jnp.asarray(flat), grid, VCFG)
    pos, _ = qwen_vl.get_rope_index(ids, [grid], TCFG, VCFG)
    emb = qwen_vl.embed_tokens(txt, jnp.asarray(ids.astype(np.int32)),
                               img, TCFG)
    logits, _, _ = qwen_vl.text_forward(txt, emb, jnp.asarray(pos), TCFG)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=3e-4, atol=3e-4)


def test_greedy_generation_matches_hf(hf_model, params):
    rng = np.random.default_rng(3)
    grid = (1, 4, 4)
    flat = _patches(rng, grid)
    ids = _prompt_ids(grid)
    hf_model.generation_config.eos_token_id = None
    hf_model.generation_config.pad_token_id = 0
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.from_numpy(ids)[None],
            pixel_values=torch.from_numpy(flat),
            image_grid_thw=torch.tensor([list(grid)]),
            do_sample=False, max_new_tokens=8, use_cache=True)
    want = out[0, len(ids):].tolist()
    vis, txt = params
    img = qwen_vl.vision_features(vis, jnp.asarray(flat), grid, VCFG)
    pos, delta = qwen_vl.get_rope_index(ids, [grid], TCFG, VCFG)
    got = qwen_vl.greedy_generate(txt, ids.astype(np.int32), img, pos,
                                  delta, TCFG, max_new_tokens=8)
    assert got == want


def test_text_only_prompt(hf_model, params):
    """No image: position ids degrade to 1D; logits still match."""
    ids = np.asarray([3, 4, 5, 6, 7, 8], np.int64)
    with torch.no_grad():
        want = hf_model(input_ids=torch.from_numpy(ids)[None]).logits[0]
    _, txt = params
    pos, _ = qwen_vl.get_rope_index(ids, [], TCFG, VCFG)
    emb = qwen_vl.embed_tokens(txt, jnp.asarray(ids.astype(np.int32)),
                               None, TCFG)
    logits, _, _ = qwen_vl.text_forward(txt, emb, jnp.asarray(pos), TCFG)
    np.testing.assert_allclose(np.asarray(logits), want.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_patchify_matches_hf_processor():
    """Flat-patch layout vs Qwen2VLImageProcessor._preprocess (no resize)."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (28, 56, 3)).astype(np.uint8)
    proc = Qwen2VLImageProcessor(do_resize=False, do_rescale=True,
                                 do_normalize=True, patch_size=14,
                                 temporal_patch_size=2, merge_size=2)
    out = proc(images=[img], return_tensors="np")
    want = out["pixel_values"]
    grid_hf = tuple(out["image_grid_thw"][0].tolist())
    mean = np.asarray(proc.image_mean).reshape(3, 1, 1)
    std = np.asarray(proc.image_std).reshape(3, 1, 1)
    frames = (img.transpose(2, 0, 1)[None] / 255.0 - mean) / std
    got, grid = qwen_vl.patchify(frames.astype(np.float32),
                                 qwen_vl.QWEN25_VL_7B_VISION)
    assert grid == grid_hf
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_text_tp_matches_replicated(params, mesh8):
    """Megatron TP placement of the text decoder over the mesh "model" axis
    reproduces the single-device forward exactly (GSPMD partitioning of the
    scan body; GQA kv heads stay whole per shard — the 7B judge deployment,
    `dpg_evaluation.py:79-124`)."""
    import jax

    _, text = params
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 100, size=(11,)), jnp.int32)
    pos = jnp.asarray(np.tile(np.arange(11), (3, 1)), jnp.int32)

    def fwd(p):
        x = qwen_vl.embed_tokens(p, ids, None, TCFG)
        logits, _, _ = qwen_vl.text_forward(p, x, pos, TCFG)
        return logits

    want = np.asarray(jax.jit(fwd)(text))

    placed = qwen_vl.place_text(text, TCFG, mesh8, axis="model")
    with mesh8:
        got = np.asarray(jax.jit(fwd)(placed))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # last_only: identical to the full forward's final row (prefill path)
    def fwd_last(p):
        x = qwen_vl.embed_tokens(p, ids, None, TCFG)
        logits, _, _ = qwen_vl.text_forward(p, x, pos, TCFG, last_only=True)
        return logits

    last = np.asarray(jax.jit(fwd_last)(text))
    np.testing.assert_allclose(last[0], want[-1], rtol=1e-6, atol=1e-6)
