"""bf16-GELU policy: the tanh approximation used for bf16 trunk activations
(`nn/layers.py:set_bf16_gelu`) must (a) leave fp32 paths bit-identical and
(b) move the end-to-end encoder outputs by (much) less than the bf16
quantization the trunk already injects vs fp32 — the same evidence standard
as the head-conv precision policy (`nn/heads.py:42-52`).

Reference GELU: torch nn.GELU exact erf (`vggt/layers/mlp.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.nn import layers as L
from vist3a_tpu.nn.aggregator import AggregatorConfig
from vist3a_tpu.nn.heads import CameraHeadConfig, DPTConfig, GSHeadConfig
from vist3a_tpu.nn.vit import ViTConfig


def _small_cfg():
    d = 64
    return enc_mod.EncoderConfig(
        vit=ViTConfig(img_size=56, embed_dim=d, depth=4, num_heads=2),
        agg=AggregatorConfig(embed_dim=d, depth=4, num_heads=2,
                             taps=(0, 1, 2, 3)),
        camera=CameraHeadConfig(dim_in=2 * d, trunk_depth=1, num_heads=2),
        depth=DPTConfig(dim_in=2 * d, features=16,
                        out_channels=(8, 16, 16, 16), head2_features=8),
        gs=GSHeadConfig(dim_in=2 * d, features=16,
                        out_channels=(8, 16, 16, 16), output_dim=84,
                        head2_features=16, pos_embed=False),
    )


@pytest.fixture
def setup():
    cfg = _small_cfg()
    params = enc_mod.init(jax.random.key(0), cfg)
    images = jax.random.uniform(jax.random.key(1), (1, 3, 3, 56, 56))
    yield cfg, params, images
    L.set_bf16_gelu("tanh")          # restore the default


def _depth(params, images, cfg):
    return np.asarray(
        enc_mod.forward(params, images, cfg, remat=False).depth,
        np.float32)


def test_fp32_paths_unaffected(setup):
    cfg, params, images = setup
    L.set_bf16_gelu("tanh")
    d_tanh = _depth(params, images, cfg)
    L.set_bf16_gelu("exact")
    d_exact = _depth(params, images, cfg)
    np.testing.assert_array_equal(d_tanh, d_exact)


def test_bf16_tanh_below_quantization_noise(setup):
    cfg, params, images = setup
    d_fp32 = _depth(params, images, cfg)

    bf16_params = enc_mod.cast_trunk_bf16(params)
    bf16_images = images.astype(jnp.bfloat16)
    L.set_bf16_gelu("exact")
    d_exact = _depth(bf16_params, bf16_images, cfg)
    L.set_bf16_gelu("tanh")
    d_tanh = _depth(bf16_params, bf16_images, cfg)

    scale = np.abs(d_fp32).mean()
    quant = np.abs(d_exact - d_fp32).mean() / scale   # bf16 trunk noise
    policy = np.abs(d_tanh - d_exact).mean() / scale  # tanh-vs-erf delta
    assert np.isfinite(quant) and quant > 0
    # measured headroom is ~3.7x (policy 5.2e-6 vs quant 1.9e-5 on the
    # recorded setup); gate only on policy < quant so incidental init/seed
    # changes in the tiny config can't fail the policy for unrelated reasons
    assert policy < quant, (
        f"tanh-GELU delta {policy:.2e} not below bf16 noise {quant:.2e}")
