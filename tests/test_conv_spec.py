import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vist3a_tpu.stitch.conv_spec import (
    CANONICAL_STITCH_SPEC,
    ConvSpec,
    parse_conv_spec,
)


def test_parse_canonical():
    spec = parse_conv_spec(CANONICAL_STITCH_SPEC)
    assert spec.dim == 3
    assert spec.out_channels == 1024
    assert spec.kernel_size == (5, 3, 3)
    assert spec.stride == (1, 2, 2)
    assert spec.padding == (2, 1, 1)
    assert spec.dilation == 1


def test_parse_defaults_and_scalar():
    spec = parse_conv_spec("conv2d_k3_o64")
    assert (spec.dim, spec.kernel_size, spec.stride, spec.padding) == (2, 3, 1, 0)


@pytest.mark.parametrize("bad", ["conv4d_k3_o1", "conv3d_o16", "conv3d_k3", "blah"])
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        parse_conv_spec(bad)


@pytest.mark.parametrize(
    "spec_str,in_ch,shape",
    [
        ("conv3d_k5x3x3_o32_s1x2x2_p2x1x1", 16, (2, 16, 13, 16, 16)),
        ("conv2d_k3_o8_s2_p1", 4, (2, 4, 9, 9)),
        ("conv1d_k3_o8_p1", 4, (2, 4, 17)),
    ],
)
def test_matches_torch_replicate_conv(spec_str, in_ch, shape):
    """Numerics vs torch ConvNd(padding_mode='replicate') — the reference
    semantics (`models/stitching_layer_builder.py:20-42`)."""
    spec = parse_conv_spec(spec_str)
    params = spec.init(jax.random.key(0), in_ch)
    x = np.random.default_rng(1).standard_normal(shape).astype(np.float32)

    out = spec.apply(params, jnp.asarray(x))

    conv_cls = {1: torch.nn.Conv1d, 2: torch.nn.Conv2d, 3: torch.nn.Conv3d}[spec.dim]
    tconv = conv_cls(
        in_ch,
        spec.out_channels,
        spec.kernel_size,
        stride=spec.stride,
        padding=spec.padding,
        dilation=spec.dilation,
        padding_mode="replicate",
    )
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(np.asarray(params["kernel"])))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        ref = tconv(torch.from_numpy(x)).numpy()

    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_canonical_output_shape():
    # Wan latent (B,16,13,64,64) -> tokens (B,1024,13,32,32)
    spec = parse_conv_spec(CANONICAL_STITCH_SPEC)
    params = spec.init(jax.random.key(0), 16)
    x = jnp.zeros((1, 16, 13, 64, 64))
    assert spec.apply(params, x).shape == (1, 1024, 13, 32, 32)


def test_grad_flows():
    spec = parse_conv_spec("conv3d_k3x3x3_o4_p1")
    params = spec.init(jax.random.key(0), 2)
    x = jnp.ones((1, 2, 3, 4, 4))
    g = jax.grad(lambda p: spec.apply(p, x).sum())(params)
    assert jnp.all(jnp.isfinite(g["kernel"]))
