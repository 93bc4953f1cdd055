"""MUSIQ (multi-scale IQA transformer, `eval/musiq.py`) invariants.

The pyiqa SPAQ checkpoint and pyiqa itself are absent from this
environment, so numeric parity with the reference scorer
(`gen_metrics/imaging_quality.py:32-62`) cannot be pinned here (documented
deviation).  These tests pin everything else: multi-scale patch geometry,
HSE hashing, attention-mask correctness (padding cannot change the score),
preprocessing behavior, the npz weight round-trip, and a golden transcript
of this implementation under fixed seeds (regression pin for refactors).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vist3a_tpu.eval import musiq

CFG = musiq.MUSIQConfig(hidden=32, num_layers=2, num_heads=2, mlp_dim=64)


def test_multiscale_token_geometry():
    img = np.random.default_rng(0).random((96, 160, 3)).astype(np.float32)
    pk, hid, sid = musiq.multiscale_tokens(img, CFG)
    # native 96×160 → 3×5 grid; longer 224 → 135×224 → 5×7; 384 → 231×384
    # → 8×12 (ceil of /32 after aspect-preserving resize)
    counts = [3 * 5, 5 * 7, 8 * 12]
    assert pk.shape == (sum(counts), CFG.patch_dim)
    assert sid.tolist() == sum([[i] * c for i, c in enumerate(counts)], [])
    assert hid.min() >= 0 and hid.max() < CFG.hse_grid
    # HSE cells are monotone along each axis within a scale
    first = hid[:counts[0]].reshape(3, 5, 2)
    assert (np.diff(first[:, 0, 0]) >= 0).all()
    assert (np.diff(first[0, :, 1]) >= 0).all()


def test_resize_longer_never_upscales_native():
    img = np.zeros((64, 48, 3), np.float32)
    pk, _, sid = musiq.multiscale_tokens(img, CFG)
    # scale 1 (longer 224) upscales 64→224: 224×168 → 7×6 grid
    assert (sid == 1).sum() == 7 * 6


def test_mask_blocks_padded_slots():
    """Padded token slots (mask=False) must not move the score at all."""
    rng = np.random.default_rng(1)
    params = musiq.init(jax.random.key(0), CFG)
    n, npad = 10, 16
    pk = rng.standard_normal((1, npad, CFG.patch_dim)).astype(np.float32)
    hid = rng.integers(0, CFG.hse_grid, (1, npad, 2))
    sid = rng.integers(0, CFG.num_scales, (1, npad))
    mask = np.zeros((1, npad), bool)
    mask[:, :n] = True
    out1 = musiq.forward(params, jnp.asarray(pk), jnp.asarray(hid),
                         jnp.asarray(sid), jnp.asarray(mask), CFG)
    pk2 = pk.copy()
    pk2[:, n:] = 777.0                       # garbage in padded slots
    out2 = musiq.forward(params, jnp.asarray(pk2), jnp.asarray(hid),
                         jnp.asarray(sid), jnp.asarray(mask), CFG)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=0, atol=0)


def test_preprocess_shorter_mode():
    big = np.zeros((1024, 768, 3), np.uint8)
    out = musiq.preprocess_frame(big, musiq.MUSIQConfig())
    assert min(out.shape[:2]) == 512 and out.shape[0] == 682  # 512/768 scale
    small = np.zeros((300, 200, 3), np.uint8)
    out = musiq.preprocess_frame(small, musiq.MUSIQConfig())
    assert out.shape[:2] == (300, 200)       # untouched below the cap


def test_scorer_deterministic_and_scaled():
    params = musiq.init(jax.random.key(3), CFG)
    score = musiq.make_musiq_scorer(params, CFG)
    frames = [np.random.default_rng(7).integers(
        0, 255, (64, 80, 3)).astype(np.uint8)] * 2
    v1, v2 = score(frames), score(frames)
    assert v1 == v2
    assert np.isfinite(v1)


def test_npz_roundtrip(tmp_path):
    params = musiq.init(jax.random.key(4), CFG)
    path = tmp_path / "musiq.npz"
    musiq.save_musiq_npz(path, params)
    loaded = musiq.load_musiq_npz(path, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # shape validation catches a wrong-config load
    with pytest.raises(ValueError):
        musiq.load_musiq_npz(path, musiq.MUSIQConfig(hidden=48, num_layers=2,
                                                     num_heads=2, mlp_dim=64))


def test_golden_transcript():
    """Regression pin: fixed seeds → fixed score.  (NOT reference parity —
    see module docstring; re-record deliberately on architecture changes.)
    Recorded 2026-08-17, float32, identical on CPU and TPU backends."""
    params = musiq.init(jax.random.key(5), CFG)
    frame = (np.random.default_rng(11).random((64, 64, 3)) * 255) \
        .astype(np.uint8)
    score = musiq.make_musiq_scorer(params, CFG)([frame])
    # atol: XLA fusion order shifts the fp32 sum by ~4e-5 across backends /
    # device-count settings; the MOS/100 scale makes 2e-4 abs ≪ 1 MOS point
    np.testing.assert_allclose(score, -0.010135467052459718,
                               rtol=0, atol=2e-4)


@pytest.mark.parametrize("spelling", ["encoder_layers", "encoderblock"])
def test_convert_state_dict_alias_spellings(spelling):
    """`musiq_convert.convert_state_dict` maps a pyiqa-layout torch state
    dict into our tree under either known module spelling, transposing
    torch Linear (out,in) weights; misses raise with the manifest."""
    from vist3a_tpu.eval import musiq_convert

    rng = np.random.default_rng(0)
    d, m = CFG.hidden, CFG.mlp_dim

    def lin(o, i):
        return rng.standard_normal((o, i)).astype(np.float32)

    sd = {}
    if spelling == "encoder_layers":
        blk = "transformer.encoder_layers.{i}"
        attn, ln1, ln2, mlp = ".self_attention", ".layer_norm_input", \
            ".layer_norm_out", ".mlp_block"
        sd["transformer.embedding.weight"] = lin(d, CFG.patch_dim)
        sd["transformer.embedding.bias"] = np.zeros(d, np.float32)
        sd["transformer.cls_token"] = rng.standard_normal(
            (1, 1, d)).astype(np.float32)
        sd["transformer.position_embedding"] = rng.standard_normal(
            (CFG.hse_grid, CFG.hse_grid, d)).astype(np.float32)
        sd["transformer.scale_embedding"] = rng.standard_normal(
            (CFG.num_scales, d)).astype(np.float32)
        sd["transformer.encoder_norm.weight"] = np.ones(d, np.float32)
        sd["transformer.encoder_norm.bias"] = np.zeros(d, np.float32)
    else:
        blk = "transformer_encoder.encoderblock_{i}"
        attn, ln1, ln2, mlp = ".attention", ".ln1", ".ln2", ".mlp"
        sd["transformer_encoder.embedding.weight"] = lin(d, CFG.patch_dim)
        sd["transformer_encoder.embedding.bias"] = np.zeros(d, np.float32)
        sd["transformer_encoder.cls"] = rng.standard_normal(
            (1, 1, d)).astype(np.float32)
        sd["transformer_encoder.posembed_input.position_emb"] = \
            rng.standard_normal((CFG.hse_grid, CFG.hse_grid, d)) \
            .astype(np.float32)
        sd["transformer_encoder.scale_emb.scale_emb"] = rng.standard_normal(
            (CFG.num_scales, d)).astype(np.float32)
        sd["transformer_encoder.encoder_norm.weight"] = np.ones(
            d, np.float32)
        sd["transformer_encoder.encoder_norm.bias"] = np.zeros(
            d, np.float32)
    for i in range(CFG.num_layers):
        p = blk.format(i=i)
        for q in ("query", "key", "value", "out"):
            sd[f"{p}{attn}.{q}.weight"] = lin(d, d)
            sd[f"{p}{attn}.{q}.bias"] = np.zeros(d, np.float32)
        for lnp in (ln1, ln2):
            sd[f"{p}{lnp}.weight"] = np.ones(d, np.float32)
            sd[f"{p}{lnp}.bias"] = np.zeros(d, np.float32)
        sd[f"{p}{mlp}.fc1.weight"] = lin(m, d)
        sd[f"{p}{mlp}.fc1.bias"] = np.zeros(m, np.float32)
        sd[f"{p}{mlp}.fc2.weight"] = lin(d, m)
        sd[f"{p}{mlp}.fc2.bias"] = np.zeros(d, np.float32)
    sd["head.weight"] = lin(1, d)
    sd["head.bias"] = np.zeros(1, np.float32)

    params = musiq_convert.convert_state_dict(sd, CFG)
    assert params["patch_proj"]["w"].shape == (CFG.patch_dim, d)
    # torch (out,in) -> ours (in,out) transpose
    np.testing.assert_array_equal(params["head"]["w"],
                                  sd["head.weight"].T)
    assert params["blocks"][0]["qkv"]["w"].shape == (d, 3 * d)
    assert len(params["blocks"]) == CFG.num_layers
    # converted tree loads through the validated npz round-trip
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as td:
        path = pathlib.Path(td) / "m.npz"
        musiq.save_musiq_npz(path, params)
        loaded = musiq.load_musiq_npz(path, CFG)
        assert loaded["blocks"][0]["qkv"]["w"].shape == (d, 3 * d)

    # a missing key fails loudly with the manifest
    bad = dict(sd)
    bad.pop("head.weight")
    with pytest.raises(KeyError, match="aliases"):
        musiq_convert.convert_state_dict(bad, CFG)
