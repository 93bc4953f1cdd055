"""Expected-key manifest checks (`io/manifests.py`).

Two layers of proof that the committed manifests make a real-checkpoint
import fail loudly instead of silently mis-mapping:

  1. ROUND-TRIP: fabricate a zeros state dict from the manifest generator
     at a tiny config, run the REAL importer on it with a tracking dict,
     and assert (a) validation passes, (b) every fabricated key was
     consumed, (c) the imported tree is structure- and shape-identical to
     `init`'s tree.
  2. GROUNDING: where the image has the reference torch modules
     (`ref_loader`) or transformers, the manifest key set is pinned against
     the ACTUAL `Module.state_dict()` of the tiny-config reference model.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader

from vist3a_tpu.io import manifests as mf
from vist3a_tpu.io import weight_import as wi
from vist3a_tpu.nn import clip as clip_mod
from vist3a_tpu.nn import umt5 as umt5_mod
from vist3a_tpu.nn import wan_dit, wan_vae


class Tracking(dict):
    def __init__(self, base):
        super().__init__(base)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _assert_tree_matches(imported, abstract):
    ti = jax.tree_util.tree_structure(imported)
    ta = jax.tree_util.tree_structure(abstract)
    assert ti == ta, f"tree structure differs:\n{ti}\nvs\n{ta}"
    for a, b in zip(jax.tree_util.tree_leaves(imported),
                    jax.tree_util.tree_leaves(abstract)):
        assert tuple(a.shape) == tuple(b.shape)


def _roundtrip(exp, import_fn, abstract):
    sd = Tracking(mf.fabricate_from(exp))
    imported = import_fn(sd)
    unread = set(sd) - sd.read
    assert not unread, f"fabricated keys never consumed: {sorted(unread)[:10]}"
    _assert_tree_matches(imported, abstract)


# --------------------------------------------------------------------------- #
# round-trips at tiny configs                                                  #
# --------------------------------------------------------------------------- #
WAN_VAE_TINY = wan_vae.WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=1,
    attn_scales=(), temperal_downsample=(False, True, True))
DIT_TINY = wan_dit.WanDiTConfig(dim=48, ffn_dim=96, num_layers=2,
                                num_heads=4, freq_dim=32, text_dim=24)
UMT5_TINY = umt5_mod.UMT5Config(vocab_size=96, d_model=32, d_kv=8,
                                num_heads=4, d_ff=48, num_layers=3)
CLIP_TINY = clip_mod.CLIPVisionConfig(hidden_size=32, num_layers=3,
                                      num_heads=4, mlp_dim=64, patch_size=8,
                                      image_size=32, projection_dim=16,
                                      act="gelu")
CLIP_TEXT_TINY = clip_mod.CLIPTextConfig(hidden_size=32, num_layers=3,
                                         num_heads=4, mlp_dim=64,
                                         vocab_size=96, context_length=16,
                                         projection_dim=16)


def test_roundtrip_wan_vae():
    tree = jax.eval_shape(lambda k: wan_vae.init(k, WAN_VAE_TINY),
                          jax.random.key(0))
    exp = {}
    mf._fab_wan_vae(tree, exp)
    _roundtrip(exp, lambda sd: wi.import_wan_vae(sd, WAN_VAE_TINY), tree)


def test_roundtrip_wan_dit():
    tree = jax.eval_shape(lambda k: wan_dit.init(k, DIT_TINY),
                          jax.random.key(0))
    exp = {}
    mf._fab_wan_dit(tree, exp)
    _roundtrip(exp, lambda sd: wi.import_wan_dit(sd, DIT_TINY.num_layers),
               tree)


def test_roundtrip_umt5():
    tree = jax.eval_shape(lambda k: umt5_mod.init(k, UMT5_TINY),
                          jax.random.key(0))
    exp = {}
    mf._fab_umt5(tree, exp)
    _roundtrip(exp, lambda sd: wi.import_umt5(sd, UMT5_TINY.num_layers),
               tree)


def test_roundtrip_clip_towers():
    vis = jax.eval_shape(lambda k: clip_mod.init(k, CLIP_TINY),
                         jax.random.key(0))
    txt = jax.eval_shape(lambda k: clip_mod.text_init(k, CLIP_TEXT_TINY),
                         jax.random.key(1))
    exp = {}
    mf._fab_hf_clip_vision(vis, exp)
    _roundtrip(exp, lambda sd: clip_mod.import_hf_clip_vision(
        sd, CLIP_TINY.num_layers), vis)
    exp = {}
    mf._fab_hf_clip_text(txt, exp)
    _roundtrip(exp, lambda sd: clip_mod.import_hf_clip_text(
        sd, CLIP_TEXT_TINY.num_layers), txt)
    exp = {}
    mf._fab_open_clip(vis, exp, visual=True)
    _roundtrip(exp, lambda sd: clip_mod.import_open_clip_vision(
        sd, CLIP_TINY.num_layers), vis)
    exp = {}
    mf._fab_open_clip(txt, exp, visual=False)
    _roundtrip(exp, lambda sd: clip_mod.import_open_clip_text(
        sd, CLIP_TEXT_TINY.num_layers), txt)


def test_roundtrip_anysplat_encoder():
    from test_golden_import import _jax_cfg

    from vist3a_tpu.nn import encoder as enc_mod

    cfg = _jax_cfg()
    tree = jax.eval_shape(lambda k: enc_mod.init(k, cfg), jax.random.key(0))
    exp = {}
    mf._fab_anysplat_encoder(tree, exp)
    _roundtrip(exp, wi.import_anysplat_encoder, tree)


# --------------------------------------------------------------------------- #
# validation failure modes + deployed manifests                                #
# --------------------------------------------------------------------------- #
def test_validate_fails_loudly():
    sd = mf.fabricate_state_dict("wan_dit_1_3b")
    assert mf.validate_state_dict(sd, "wan_dit_1_3b")
    missing = dict(sd)
    missing.pop("proj_out.weight")
    with pytest.raises(ValueError, match="missing"):
        mf.validate_state_dict(missing, "wan_dit_1_3b")
    extra = dict(sd)
    extra["blocks.0.attn1.to_q.extra_weight"] = np.zeros((2,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        mf.validate_state_dict(extra, "wan_dit_1_3b")
    bad = dict(sd)
    bad["proj_out.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="shape"):
        mf.validate_state_dict(bad, "wan_dit_1_3b")


def test_committed_manifests_current():
    """The committed txt files must match the generator (re-run
    tools/dump_manifests.py after config/importer changes)."""
    for family in mf.FAMILIES:
        path = mf.MANIFEST_DIR / f"{family}.txt"
        assert path.exists(), f"missing manifest {path}"
        assert path.read_text() == mf.dump_manifest(family), (
            f"{family}.txt is stale — run tools/dump_manifests.py")


# --------------------------------------------------------------------------- #
# grounding vs real reference / transformers modules                           #
# --------------------------------------------------------------------------- #
def _sd_keys(module):
    return {k: tuple(v.shape) for k, v in module.state_dict().items()}


def test_grounding_wan_vae_keys():
    if not ref_loader.available():
        pytest.skip("reference not mounted")
    import torch

    ref_loader.setup()
    wu = ref_loader.load("utils.wan_utils")
    torch.manual_seed(0)
    vae = wu.AutoencoderKLWan(
        base_dim=8, z_dim=4, dim_mult=[1, 2, 4, 4], num_res_blocks=1,
        attn_scales=[], temperal_downsample=[False, True, True])
    got = _sd_keys(vae)
    tree = jax.eval_shape(lambda k: wan_vae.init(k, WAN_VAE_TINY),
                          jax.random.key(0))
    exp = {}
    mf._fab_wan_vae(tree, exp)
    assert set(exp) == set(got), (
        f"manifest-only: {sorted(set(exp) - set(got))[:10]}; "
        f"module-only: {sorted(set(got) - set(exp))[:10]}")
    for k, spec in exp.items():
        if isinstance(spec, tuple) and spec and spec[0] == "size":
            assert int(np.prod(got[k])) == spec[1], k
        else:
            assert got[k] == tuple(spec), (k, got[k], spec)


def test_grounding_umt5_keys():
    import torch
    from transformers import UMT5Config, UMT5EncoderModel

    torch.manual_seed(0)
    m = UMT5EncoderModel(UMT5Config(vocab_size=96, d_model=32, d_kv=8,
                                    num_heads=4, d_ff=48, num_layers=3))
    got = set(_sd_keys(m))
    tree = jax.eval_shape(lambda k: umt5_mod.init(k, UMT5_TINY),
                          jax.random.key(0))
    exp = {}
    mf._fab_umt5(tree, exp)
    import re
    ignore = [re.compile(p) for p in mf.FAMILIES["umt5_xxl"]["ignore"]]
    extra = {k for k in got - set(exp)
             if not any(p.search(k) for p in ignore)}
    assert not extra, sorted(extra)[:10]
    assert not set(exp) - got, sorted(set(exp) - got)[:10]


def test_grounding_hf_clip_keys():
    import torch
    from transformers import CLIPConfig, CLIPModel
    from transformers import CLIPTextConfig as HFText
    from transformers import CLIPVisionConfig as HFVis

    torch.manual_seed(0)
    m = CLIPModel(CLIPConfig(
        text_config=HFText(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           vocab_size=96, max_position_embeddings=16,
                           projection_dim=16).to_dict(),
        vision_config=HFVis(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=3, num_attention_heads=4,
                            image_size=32, patch_size=8,
                            projection_dim=16).to_dict(),
        projection_dim=16))
    got = set(_sd_keys(m))
    vis = jax.eval_shape(lambda k: clip_mod.init(k, CLIP_TINY),
                         jax.random.key(0))
    txt = jax.eval_shape(lambda k: clip_mod.text_init(k, CLIP_TEXT_TINY),
                         jax.random.key(1))
    exp = {}
    mf._fab_hf_clip_vision(vis, exp)
    mf._fab_hf_clip_text(txt, exp)
    exp["logit_scale"] = ("size", 1)
    import re
    ignore = [re.compile(p) for p in mf.FAMILIES["pickscore"]["ignore"]]
    extra = {k for k in got - set(exp)
             if not any(p.search(k) for p in ignore)}
    assert not extra, sorted(extra)[:10]
    assert not set(exp) - got, sorted(set(exp) - got)[:10]


def test_grounding_anysplat_keys():
    if not ref_loader.available():
        pytest.skip("reference not mounted")
    ref_loader.setup()
    from test_golden_import import _build_container, _jax_cfg

    from vist3a_tpu.nn import encoder as enc_mod

    container = _build_container()
    got = _sd_keys(container)
    tree = jax.eval_shape(lambda k: enc_mod.init(k, _jax_cfg()),
                          jax.random.key(0))
    exp = {}
    mf._fab_anysplat_encoder(tree, exp)
    assert set(exp) == set(got), (
        f"manifest-only: {sorted(set(exp) - set(got))[:10]}; "
        f"module-only: {sorted(set(got) - set(exp))[:10]}")
