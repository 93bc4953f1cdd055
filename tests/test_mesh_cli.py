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


@pytest.mark.parametrize("how", ["fsdp", "tp", "replicated"])
def test_train_vdm_run_on_mesh_matches_single_device(how):
    # The VDM step is the largest CPU compile in the suite; after ~80 prior
    # tests the accumulated executables have twice segfaulted XLA:CPU inside
    # backend_compile (same stack both times, passes standalone).  Dropping
    # the jit caches before the big compile keeps the compiler's working set
    # bounded.
    jax.clear_caches()
    vdm._vdm_step_jit.cache_clear()
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
    mesh = mesh_mod.create_mesh(mesh_mod.MeshConfig(data=4, model=2))
    dit_placed = train_vdm.place_dit(dit, DIT, mesh, how)

    def one_run(dit_arg, mesh_arg):
        state = vdm.init_train_state(jax.random.key(4), dit, cfg)
        _, hist = train_vdm.run(
            state, dit_arg, vae, stitched,
            text_loader=FakeTextLoader(2), video_loader=FakeVideoLoader(2),
            embed_text=_embed_text, reward_loss_fn=None,
            dit_cfg=DIT, vae_cfg=VAE, scfg=scfg, cfg=cfg, num_steps=2,
            key=jax.random.key(5), latent_shape=(1, 16, 2, 8, 8),
            render_size=56, mesh=mesh_arg)
        return hist

    hist_mesh = one_run(dit_placed, mesh)
    hist_single = one_run(dit, None)
    assert len(hist_mesh) == len(hist_single) == 2
    for hm, hs in zip(hist_mesh, hist_single):
        assert np.isfinite(hm["total_loss"])
        assert hm["total_loss"] == pytest.approx(hs["total_loss"],
                                                 rel=1e-4)


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
