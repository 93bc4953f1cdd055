"""Mesh-wired training CLIs: `cli/train_stitching.run` and
`cli/train_vdm.run` driven over the 8-device virtual CPU mesh with sharded
inputs, checked to match the single-device run.

Parity: the reference launchers are multi-device by construction (torchrun
DDP `model_stitching_training.py:286-289`, accelerate FSDP2
`train_vdm.py:296-310`); here the same CLIs run one GSPMD program over the
2-D `(data, model)` mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_cli_runs import VAE, FakeClipLoader, FakeSampler
from test_stitched_model import tiny_encoder_cfg
from test_vdm_training import DIT
from vist3a_tpu.cli import train_stitching, train_vdm
from vist3a_tpu.core import mesh as mesh_mod
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.nn import wan_dit, wan_vae
from vist3a_tpu.stitch import chopped_anysplat as ca
from vist3a_tpu.train import stitching as st
from vist3a_tpu.train import vdm


@pytest.fixture(autouse=True)
def _bounded_compiler_working_set():
    """Drop all jit caches before EVERY test in this module.

    The mesh tests are the largest CPU compiles in the suite; with ~100
    tests' executables accumulated, XLA:CPU has segfaulted inside
    backend_compile at these compiles (three sightings, two different
    tests — passes standalone every time).  Emptying the caches before
    each big mesh compile keeps the compiler's working set bounded; this
    is the suite-wide policy for any test whose compile is mesh-sized."""
    jax.clear_caches()
    vdm._vdm_step_jit.cache_clear()
    yield


def _stitch_setup():
    scfg = ca.StitchedConfig(encoder=tiny_encoder_cfg(),
                             stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1",
                             vae=VAE)
    params = {
        "encoder": enc_mod.init(jax.random.key(0), scfg.encoder),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(1), scfg),
        "vae": wan_vae.init(jax.random.key(2), VAE),
    }
    tcfg = st.StitchTrainConfig(lora_spec="r2,a4,d0.0,f0", warmup_steps=1,
                                total_steps=8)
    return params, scfg, tcfg


def test_train_stitching_run_on_mesh_matches_single_device(monkeypatch):
    monkeypatch.setattr(st, "VIEW_COUNTS", (9,))
    params, scfg, tcfg = _stitch_setup()
    # data axis 4, model axis 2 (mesh8 layout); global batch 4 → 1/device
    mesh = mesh_mod.create_mesh(mesh_mod.MeshConfig(data=4, model=2))

    def make_loader():
        return FakeClipLoader(2, bs=4)

    _, hist_mesh = train_stitching.run(
        params, scfg, make_loader(), FakeSampler(), train_cfg=tcfg,
        num_epochs=1, key=jax.random.key(3), log_every=1, mesh=mesh)
    _, hist_single = train_stitching.run(
        params, scfg, make_loader(), FakeSampler(), train_cfg=tcfg,
        num_epochs=1, key=jax.random.key(3), log_every=1, mesh=None)

    assert len(hist_mesh) == len(hist_single) == 2
    for hm, hs in zip(hist_mesh, hist_single):
        assert np.isfinite(hm["total_loss"])
        # identical math, different reduction layout → tiny fp drift only
        assert hm["total_loss"] == pytest.approx(hs["total_loss"],
                                                 rel=1e-4)


class FakeTextLoader:
    def __init__(self, n):
        self.n = n

    def __iter__(self):
        for i in range(self.n):
            yield {"prompt": [f"a scene {i}"]}


class FakeVideoLoader:
    def __init__(self, n, bs=4, t=5, hw=64):
        self.n, self.shape = n, (bs, 3, t, hw, hw)

    def __len__(self):
        return self.n

    def __iter__(self):
        rng = np.random.default_rng(7)
        for i in range(self.n):
            yield {"image_tensor":
                   (rng.random(self.shape, np.float32) * 2 - 1),
                   "caption": [f"clip {i}-{j}"
                               for j in range(self.shape[0])]}


def _embed_text(prompts):
    """Deterministic fake text embeddings keyed by prompt content."""
    out = []
    for p in prompts:
        k = jax.random.key(abs(hash(p)) % (2 ** 31))
        out.append(jax.random.normal(k, (5, DIT.text_dim)))
    return jnp.stack(out)


def _vdm_setup():
    scfg = ca.StitchedConfig(encoder=tiny_encoder_cfg(),
                             stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1",
                             vae=VAE)
    stitched = {
        "encoder": enc_mod.init(jax.random.key(2), scfg.encoder),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(3), scfg),
    }
    vae = wan_vae.init(jax.random.key(1), VAE)
    dit = wan_dit.init(jax.random.key(0), DIT)
    cfg = vdm.VDMTrainConfig(enable_rl=False)
    return scfg, stitched, vae, dit, cfg


def _vdm_one_run(dit_arg, mesh_arg, setup):
    scfg, stitched, vae, dit, cfg = setup
    state = vdm.init_train_state(jax.random.key(4), dit, cfg)
    _, hist = train_vdm.run(
        state, dit_arg, vae, stitched,
        text_loader=FakeTextLoader(2), video_loader=FakeVideoLoader(2),
        embed_text=_embed_text, reward_loss_fn=None,
        dit_cfg=DIT, vae_cfg=VAE, scfg=scfg, cfg=cfg, num_steps=2,
        key=jax.random.key(5), latent_shape=(1, 16, 2, 8, 8),
        render_size=56, mesh=mesh_arg)
    return hist


@pytest.fixture(scope="module")
def vdm_single_baseline():
    """The single-device SFT reference losses, computed ONCE for all four
    placement params (it is the same program every time; it used to run —
    and recompile, behind the autouse cache clear — per param)."""
    setup = _vdm_setup()
    return _vdm_one_run(setup[3], None, setup)


@pytest.mark.parametrize("how", ["fsdp", "tp", "tp_fsdp", "replicated"])
def test_train_vdm_run_on_mesh_matches_single_device(how,
                                                     vdm_single_baseline):
    setup = _vdm_setup()
    dit = setup[3]
    mesh = mesh_mod.create_mesh(mesh_mod.MeshConfig(data=4, model=2))
    dit_placed = train_vdm.place_dit(dit, DIT, mesh, how)

    hist_mesh = _vdm_one_run(dit_placed, mesh, setup)
    hist_single = vdm_single_baseline
    assert len(hist_mesh) == len(hist_single) == 2
    for hm, hs in zip(hist_mesh, hist_single):
        assert np.isfinite(hm["total_loss"])
        assert hm["total_loss"] == pytest.approx(hs["total_loss"],
                                                 rel=1e-4)


@pytest.mark.slow
def test_train_vdm_rl_on_mesh_matches_single_device():
    """`enable_rl=True` ON THE MESH — the reference flagship mode's only
    real deployment shape (FSDP2 on 4×GH200, `train_vdm.py:296-310`; the
    deployed RL step measures 58.7 GB HBM ⇒ ≥4 v5e chips, PARITY.md).
    Composes the truncated-rollout scan + VAE decode + stitched decode +
    Pallas rasterizer + CLIP reward towers with the FSDP-placed DiT,
    driven through `cli.train_vdm.run` so the CLI's explicit placement of
    `loss_fn.reward_params` and the per-prompt text features is what's
    under test.  Must equal the single-device RL step."""
    from vist3a_tpu.nn import clip as clip_mod
    from vist3a_tpu.train import reward as reward_mod

    tiny_vis = clip_mod.CLIPVisionConfig(hidden_size=32, num_layers=2,
                                         num_heads=4, mlp_dim=64,
                                         patch_size=8, image_size=32,
                                         projection_dim=16, act="gelu")
    rcfg = reward_mod.RewardConfig(pick_cfg=tiny_vis, pe_cfg=tiny_vis)
    pick = clip_mod.init(jax.random.key(10), tiny_vis)
    pe = clip_mod.init(jax.random.key(11), tiny_vis)
    loss_fn = reward_mod.make_loss_fn(pick, pe, logit_scale=30.0, cfg=rcfg)
    txt = jax.random.normal(jax.random.key(12), (1, 16))
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)

    def reward_text_fn(prompt):
        return (txt, txt)

    scfg = ca.StitchedConfig(encoder=tiny_encoder_cfg(),
                             stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1",
                             vae=VAE)
    stitched = {
        "encoder": enc_mod.init(jax.random.key(2), scfg.encoder),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(3), scfg),
    }
    vae = wan_vae.init(jax.random.key(1), VAE)
    dit = wan_dit.init(jax.random.key(0), DIT)
    cfg = vdm.VDMTrainConfig(enable_rl=True, rollout_steps_low=3,
                             rollout_steps_high=3)
    mesh = mesh_mod.create_mesh(mesh_mod.MeshConfig(data=4, model=2))

    def one_run(dit_arg, mesh_arg):
        state = vdm.init_train_state(jax.random.key(4), dit, cfg)
        _, hist = train_vdm.run(
            state, dit_arg, vae, stitched,
            text_loader=FakeTextLoader(1), video_loader=FakeVideoLoader(1),
            embed_text=_embed_text, reward_loss_fn=loss_fn,
            reward_text_fn=reward_text_fn,
            dit_cfg=DIT, vae_cfg=VAE, scfg=scfg, cfg=cfg, num_steps=1,
            key=jax.random.key(5), latent_shape=(1, 16, 2, 8, 8),
            render_size=56, mesh=mesh_arg)
        return hist

    hist_single = one_run(dit, None)
    dit_fsdp = train_vdm.place_dit(dit, DIT, mesh, "fsdp")
    hist_mesh = one_run(dit_fsdp, mesh)
    assert len(hist_mesh) == len(hist_single) == 1
    hm, hs = hist_mesh[0], hist_single[0]
    assert np.isfinite(hm["total_loss"])
    assert hm["reward_loss"] != 0.0
    assert hm["total_loss"] == pytest.approx(hs["total_loss"], rel=1e-4)
    assert hm["reward_loss"] == pytest.approx(hs["reward_loss"], rel=1e-4)


def test_cli_mesh_args_present():
    from vist3a_tpu.cli.arguments import (stitching_training_argument,
                                          training_vdm_argument)

    a = stitching_training_argument().parse_args(
        ["--dataset", "dl3dv:/tmp", "--mesh_data", "4", "--mesh_model", "2"])
    assert a.mesh_data == 4 and a.mesh_model == 2
    assert not hasattr(a, "dit_sharding")
    v = training_vdm_argument().parse_args(
        ["--dataset", "dl3dv:/tmp", "--dit_sharding", "tp"])
    assert v.dit_sharding == "tp" and v.mesh_data == -1


def test_model_id_selects_14b():
    """`--model_id` picks the DiT scale in the TRAINING CLI too (reference
    `utils/argument.py:400`; the published VIST3A-14B rows come from
    reward-tuning the 14B)."""
    from vist3a_tpu.cli.arguments import training_vdm_argument
    from vist3a_tpu.nn.wan_dit import (WAN_1_3B, WAN_14B,
                                       config_from_model_id)

    assert config_from_model_id("Wan-AI/Wan2.1-T2V-14B-Diffusers") is WAN_14B
    assert config_from_model_id(
        "Wan-AI/Wan2.1-T2V-1.3B-Diffusers") is WAN_1_3B
    v = training_vdm_argument().parse_args(
        ["--dataset", "dl3dv:/tmp",
         "--model_id", "Wan-AI/Wan2.1-T2V-14B-Diffusers",
         "--dit_sharding", "tp_fsdp"])
    assert config_from_model_id(v.model_id) is WAN_14B
    assert v.dit_sharding == "tp_fsdp"


def test_tp_fsdp_shardings_compose():
    """The 14B training placement: TP over "model" AND FSDP storage over
    "data" on the same leaf (grads/optimizer sharded over "data" fall out
    of GSPMD once params are)."""
    dit = wan_dit.init(jax.random.key(0), DIT)
    mesh = mesh_mod.create_mesh(mesh_mod.MeshConfig(data=4, model=2))
    sh = mesh_mod.tp_fsdp_shardings(DIT, dit, mesh, min_size=16)
    fc1 = sh["blocks"]["ffn"]["fc1"]["w"].spec   # TP shards the output dim
    axes = [a for a in fc1 if a is not None]
    assert "model" in axes and "data" in axes, fc1
    q = sh["blocks"]["attn1"]["q"]["w"].spec
    assert "model" in q and "data" in q, q
    # replicated-by-TP small leaves stay replicated (min_size guard)
    real = mesh_mod.tp_fsdp_shardings(wan_dit.WAN_14B, dit, mesh)
    assert all(a is None
               for a in real["blocks"]["attn1"]["norm_q"].spec)


def test_local_batch_size():
    mesh = mesh_mod.create_mesh(mesh_mod.MeshConfig(data=4, model=2))
    assert mesh_mod.local_batch_size(3, mesh) == 12  # single process


def test_t23d_denoise_tp_matches_single_device():
    """TP-sharded UniPC denoise (the only way 14B inference fits) ==
    single-device denoise, on the virtual mesh.  Covers
    `pipelines/t23d.denoise(mesh=...)` + `core.mesh.place_dit("tp")` as
    wired by `cli/inference_t23d.main`."""
    from vist3a_tpu.pipelines import t23d

    jax.clear_caches()
    cfg = t23d.T23DConfig(width=64, height=64, num_frames=5,
                          num_inference_steps=4, dit=DIT)
    dit = wan_dit.init(jax.random.key(0), DIT)
    cond = jax.random.normal(jax.random.key(1), (1, 14, DIT.text_dim))
    uncond = jax.random.normal(jax.random.key(2), (1, 14, DIT.text_dim))

    lat_single = t23d.denoise(dit, cond, uncond, cfg,
                              key=jax.random.key(3))

    mesh = mesh_mod.create_mesh(mesh_mod.MeshConfig(data=4, model=2))
    dit_tp = mesh_mod.place_dit(dit, DIT, mesh, "tp")
    lat_tp = t23d.denoise(dit_tp, cond, uncond, cfg,
                          key=jax.random.key(3), mesh=mesh)

    np.testing.assert_allclose(np.asarray(lat_tp), np.asarray(lat_single),
                               rtol=2e-4, atol=2e-4)
