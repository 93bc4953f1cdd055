"""Wan causal-3D VAE parity vs the reference torch implementation.

The critical claim under test: our FULL-SEQUENCE formulation (one jit, no
chunk loop) is numerically identical to the reference's chunked execution
with causal-conv caches (`utils/wan_utils.py:1021-1047` encode,
`:1078-1117` decode) — including the downsample3d / upsample3d frame-0
passthrough semantics.
"""

import numpy as np
import pytest
import ref_loader

import jax
import jax.numpy as jnp

from vist3a_tpu.io.weight_import import import_wan_vae
from vist3a_tpu.nn import wan_vae

if not ref_loader.available():
    pytest.skip("reference not mounted", allow_module_level=True)

TINY = dict(base_dim=8, z_dim=4, dim_mult=[1, 2, 4, 4], num_res_blocks=1,
            attn_scales=[], temperal_downsample=[False, True, True])
TINY_CFG = wan_vae.WanVAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2, 4, 4),
                                num_res_blocks=1, attn_scales=(),
                                temperal_downsample=(False, True, True))


@pytest.fixture(scope="module")
def ref_vae():
    import torch
    wu = ref_loader.load("utils.wan_utils")
    torch.manual_seed(0)
    vae = wu.AutoencoderKLWan(**TINY)
    vae.eval()
    return vae


@pytest.fixture(scope="module")
def jax_params(ref_vae):
    sd = {k: v.detach().numpy() for k, v in ref_vae.state_dict().items()}
    return import_wan_vae(sd, TINY_CFG)


def test_encode_matches_chunked_reference(ref_vae, jax_params, rng):
    import torch
    t, h = 9, 32
    video = rng.standard_normal((1, 3, t, h, h), dtype=np.float32) * 0.5
    with torch.no_grad():
        enc = ref_vae._encode(torch.from_numpy(video))
    want_mu, want_logvar = np.split(enc.numpy(), 2, axis=1)

    mu, logvar = jax.jit(
        lambda p, v: wan_vae.encode(p, v, TINY_CFG))(jax_params,
                                                     jnp.asarray(video))
    assert mu.shape == (1, 4, 1 + (t - 1) // 4, h // 8, h // 8)
    np.testing.assert_allclose(np.asarray(mu), want_mu, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), want_logvar,
                               rtol=2e-4, atol=2e-4)


def test_decode_matches_chunked_reference(ref_vae, jax_params, rng):
    import torch
    tl, hl = 3, 4
    z = rng.standard_normal((1, 4, tl, hl, hl), dtype=np.float32)
    with torch.no_grad():
        want = ref_vae._decode(torch.from_numpy(z)).sample.numpy()

    got = jax.jit(
        lambda p, z: wan_vae.decode(p, z, TINY_CFG))(jax_params,
                                                     jnp.asarray(z))
    assert got.shape == (1, 3, 1 + (tl - 1) * 4, hl * 8, hl * 8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_roundtrip_grad_flows(jax_params, rng):
    """decode∘encode is differentiable end to end (VDM reward path needs
    grads through the decoder; `train_vdm.py:624-637`)."""
    video = jnp.asarray(rng.standard_normal((1, 3, 5, 16, 16),
                                            dtype=np.float32))

    def loss(p):
        mu, _ = wan_vae.encode(p, video, TINY_CFG, remat=True)
        out = wan_vae.decode(p, mu, TINY_CFG, remat=True)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(jax_params)
    gn = float(jnp.sqrt(sum(jnp.sum(x ** 2)
                            for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_latents_normalization_roundtrip(rng):
    z = jnp.asarray(rng.standard_normal((2, 16, 4, 8, 8), dtype=np.float32))
    zn = wan_vae.normalize_latents(z)
    back = wan_vae.unnormalize_latents(zn)
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), rtol=1e-5,
                               atol=1e-5)
    # constants match the reference table (`utils/wan_utils.py:925-960`)
    assert len(wan_vae.LATENTS_MEAN) == 16 and len(wan_vae.LATENTS_STD) == 16
    assert abs(wan_vae.LATENTS_MEAN[7] - 1.5508) < 1e-9
    assert abs(wan_vae.LATENTS_STD[8] - 3.2687) < 1e-9
