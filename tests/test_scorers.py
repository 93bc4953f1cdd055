"""Scorer adapters on tiny CLIP towers."""

import numpy as np

import jax
import jax.numpy as jnp

from vist3a_tpu.eval import scorers
from vist3a_tpu.nn import clip as clip_mod

TINY = clip_mod.CLIPVisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                                 mlp_dim=64, patch_size=8, image_size=32,
                                 projection_dim=16)


def test_clip_scorer_bounds(rng):
    params = clip_mod.init(jax.random.key(0), TINY)
    frames = [rng.integers(0, 255, (40, 56, 3), np.uint8) for _ in range(3)]

    txt = rng.standard_normal(16).astype(np.float32)
    score = scorers.make_clip_scorer(params, lambda p: txt, TINY)
    s = score(frames, "a cat")
    assert 0.0 <= s <= 100.0
    # identical text direction as one image's features → near max
    px = scorers._frames_to_clip_input(frames[:1], TINY.image_size)
    img = np.asarray(clip_mod.image_features(params, px, TINY))[0]
    s2 = scorers.make_clip_scorer(params, lambda p: img, TINY)(frames[:1],
                                                               "x")
    np.testing.assert_allclose(s2, 100.0, rtol=1e-4)


def test_aesthetic_scorer(rng):
    params = clip_mod.init(jax.random.key(1), TINY)
    w = rng.standard_normal(16).astype(np.float32)
    frames = [rng.integers(0, 255, (32, 32, 3), np.uint8)]
    score = scorers.make_aesthetic_scorer(params, w, np.float32(2.0), TINY)
    s = score(frames)
    # manual: (normalized feats @ w + 2) / 10
    px = scorers._frames_to_clip_input(frames, TINY.image_size)
    feats = np.asarray(clip_mod.image_features(params, px, TINY))
    want = float((feats @ w + 2.0).mean() / 10.0)
    np.testing.assert_allclose(s, want, rtol=1e-5)
