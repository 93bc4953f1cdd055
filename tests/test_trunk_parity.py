"""End-to-end numeric parity of the DINOv2 ViT and the VGGT aggregator
trunk vs the ACTUAL reference torch modules
(`vggt/layers/vision_transformer.py`, `vggt/models/aggregator.py`),
loaded read-only via tests/ref_loader.py, with weights transferred through
the production importer (`io/weight_import.py`).

Pins the remaining wrong-constant risks: pos-embed interpolation
(bicubic antialias 37→32 on the stitched path), dual camera/register token
slicing, 2-D RoPE conventions inside the alternating blocks, and the
frame‖global tap concat order.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader

from vist3a_tpu.io import weight_import as wi
from vist3a_tpu.nn import aggregator as agg_mod
from vist3a_tpu.nn import vit as vit_mod

if not ref_loader.available():
    pytest.skip("reference not mounted", allow_module_level=True)

ref_loader.setup()

_VGGT = "third_party_model.anysplat.src.model.encoder.vggt"


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# --------------------------------------------------------------------------- #
# DINOv2 vision transformer                                                   #
# --------------------------------------------------------------------------- #
def _ref_vit(depth=2, dim=64, heads=2, img_size=70):
    vt = ref_loader.load(f"{_VGGT}.layers.vision_transformer")
    m = vt.DinoVisionTransformer(
        img_size=img_size, patch_size=14, embed_dim=dim, depth=depth,
        num_heads=heads, num_register_tokens=4, init_values=1.0,
        block_chunks=0, interpolate_antialias=True, interpolate_offset=0.0)
    m.use_checkpoint = False
    return _randomize(m).eval()


@pytest.mark.parametrize("hw", [70, 56])
def test_dino_vit_forward_features_matches_reference(hw):
    """hw=70: identity pos-embed path; hw=56: bicubic-antialias 5×5→4×4
    interpolation (`vision_transformer.py` interpolate_pos_encoding) —
    the same downsampling the stitched forward uses at 37→32."""
    ref = _ref_vit()
    params = wi.import_vit(_sd(ref), prefix="")
    cfg = vit_mod.ViTConfig(img_size=70, patch_size=14, embed_dim=64,
                            depth=2, num_heads=2, layerscale=1.0,
                            attn_impl="xla")

    x = np.random.default_rng(1).uniform(-1, 1, (2, 3, hw, hw)) \
        .astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward_features(torch.from_numpy(x))
    out = vit_mod.forward_features(params, jnp.asarray(x), cfg, remat=False)

    np.testing.assert_allclose(
        np.asarray(out["patch"]), ref_out["x_norm_patchtokens"].numpy(),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["cls"]), ref_out["x_norm_clstoken"].numpy(),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["registers"]), ref_out["x_norm_regtokens"].numpy(),
        rtol=2e-4, atol=2e-4)


def test_interpolate_pos_embed_matches_reference_37_to_32():
    """The deployed stitched grid: 518/14=37 → 32 (`anysplat_stitched.py`
    pos-enc interpolation of the injected tokens)."""
    ref = _ref_vit(img_size=518, dim=16, depth=1, heads=2)
    pe = ref.pos_embed.detach()
    x_dummy = torch.zeros(1, 32 * 32 + 1, 16)
    with torch.no_grad():
        ref_pe = ref.interpolate_pos_encoding(x_dummy, 448, 448).numpy()
    out = vit_mod.interpolate_pos_embed(jnp.asarray(pe.numpy()), 32, 32)
    np.testing.assert_allclose(np.asarray(out), ref_pe, rtol=1e-5,
                               atol=1e-5)


# --------------------------------------------------------------------------- #
# VGGT aggregator trunk (alternating attention + RoPE + taps)                 #
# --------------------------------------------------------------------------- #
def test_aggregator_trunk_matches_reference():
    am = ref_loader.load(f"{_VGGT}.models.aggregator")
    ref = am.Aggregator(img_size=28, patch_size=14, embed_dim=64, depth=4,
                        num_heads=2, num_register_tokens=4,
                        patch_embed="conv", rope_freq=100,
                        init_values=0.01)
    ref.use_checkpoint = False
    _randomize(ref).eval()

    b, s, hw = 1, 3, 28
    imgs01 = np.random.default_rng(2).uniform(0, 1, (b, s, 3, hw, hw)) \
        .astype(np.float32)
    with torch.no_grad():
        out_list, psi = ref.forward(torch.from_numpy(imgs01),
                                    intermediate_layer_idx=[1, 3])
    assert psi == 5 and len(out_list) == 2

    # same patch tokens (the conv patch-embed is test scaffolding; the real
    # model's DINOv2 trunk is covered above) → isolates the TRUNK
    with torch.no_grad():
        mean = ref._resnet_mean
        std = ref._resnet_std
        norm = ((torch.from_numpy(imgs01) - mean) / std) \
            .reshape(b * s, 3, hw, hw)
        patch_tokens = ref.patch_embed(norm).numpy()        # (B·S, P, C)

    params = wi.import_aggregator(_sd(ref), prefix="")
    cfg = agg_mod.AggregatorConfig(embed_dim=64, depth=4, num_heads=2,
                                   taps=(1, 3), patch_size=14,
                                   attn_impl="xla")
    cam = agg_mod.expand_special_tokens(params["camera_token"], b, s)
    reg = agg_mod.expand_special_tokens(params["register_token"], b, s)
    tokens = jnp.concatenate(
        [cam, reg, jnp.asarray(patch_tokens)], axis=1)
    tokens = tokens.reshape(b, s, tokens.shape[1], -1)

    _, taps = agg_mod.run_trunk(params, tokens, cfg,
                                grid_hw=(hw // 14, hw // 14), remat=False)
    assert len(taps) == 2
    for mine, theirs in zip(taps, out_list):
        np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                                   rtol=3e-4, atol=3e-4)


def test_expand_special_tokens_matches_reference():
    am = ref_loader.load(f"{_VGGT}.models.aggregator")
    tok = np.random.default_rng(3).standard_normal((1, 2, 4, 8)) \
        .astype(np.float32)
    ref = am.slice_expand_and_flatten(torch.from_numpy(tok), 2, 5).numpy()
    out = np.asarray(agg_mod.expand_special_tokens(jnp.asarray(tok), 2, 5))
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)
