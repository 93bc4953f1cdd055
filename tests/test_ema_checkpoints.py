"""EMA math parity vs the reference formula + checkpoint round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_stitched_model import tiny_encoder_cfg
from vist3a_tpu.io import checkpoints as ckpt
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.stitch import chopped_anysplat as ca
from vist3a_tpu.train import ema as ema_mod
from vist3a_tpu.train import stitching as st


def test_ema_warmup_decay_and_update():
    # decay warm-up: min((1+s)/(10+s), .99)  (`utils/ema.py:47-48`)
    for s, want in [(0, 1 / 10), (9, 10 / 19), (1000, 0.99)]:
        np.testing.assert_allclose(float(ema_mod.current_decay(s)), want,
                                   rtol=1e-6)

    params = {"a": jnp.full((3,), 2.0, jnp.bfloat16), "b": jnp.ones((2, 2))}
    ema = ema_mod.init_ema(params)
    assert ema["a"].dtype == jnp.float32          # fp32 shadow

    new_params = {"a": jnp.full((3,), 4.0, jnp.bfloat16),
                  "b": jnp.zeros((2, 2))}
    ema1 = ema_mod.update_ema(ema, new_params, step=0)
    d = 0.1
    np.testing.assert_allclose(np.asarray(ema1["a"]),
                               d * 2.0 + (1 - d) * 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ema1["b"]), d * 1.0, rtol=1e-6)

    back = ema_mod.ema_params_like(ema1, params)
    assert back["a"].dtype == jnp.bfloat16


def test_ema_update_interval():
    params = {"w": jnp.ones(())}
    ema = {"w": jnp.zeros(())}
    cfg = ema_mod.EMAConfig(update_step_interval=2)
    e1 = ema_mod.update_ema(ema, params, step=0, cfg=cfg)   # (0+1)%2 != 0
    np.testing.assert_allclose(float(e1["w"]), 0.0)
    e2 = ema_mod.update_ema(ema, params, step=1, cfg=cfg)   # (1+1)%2 == 0
    assert float(e2["w"]) > 0


@pytest.fixture(scope="module")
def tiny_state():
    cfg = tiny_encoder_cfg()
    scfg = ca.StitchedConfig(encoder=cfg, stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1")
    params = {
        "encoder": enc_mod.init(jax.random.key(0), cfg),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(1), scfg),
    }
    tcfg = st.StitchTrainConfig(lora_spec="r2,a4,d0.0,f0")
    state, frozen = st.init_train_state(jax.random.key(2), params, tcfg)
    return state


def test_stitching_checkpoint_roundtrip(tiny_state, tmp_path):
    state = tiny_state._replace(step=jnp.asarray(7, jnp.int32))
    ckpt.save_stitching_checkpoint(tmp_path, epoch=3, state=state,
                                   args_dict={"lora_spec": "r2,a4"})
    # the export artifact holds exactly the reference's saved set
    art = ckpt.stitched_model_state(state.trainable)
    assert "lora" in art and "stitch_conv" in art["model"]
    assert "cls_token" in art["model"]["encoder"]["vit"]

    fresh = tiny_state
    epoch_start, restored = ckpt.load_stitching_checkpoint(tmp_path, fresh)
    assert epoch_start == 4
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(restored.trainable),
                    jax.tree.leaves(state.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vdm_checkpoint_roundtrip(tmp_path):
    lora = {"q": {"a": jnp.ones((4, 2)), "b": jnp.zeros((2, 4))}}
    opt = {"mu": {"q": {"a": jnp.full((4, 2), 0.5),
                        "b": jnp.zeros((2, 4))}},
           "count": jnp.asarray(11, jnp.int32)}
    shadow = jax.tree.map(lambda x: x + 1.0, lora)
    ckpt.save_vdm_checkpoint(tmp_path, 200, lora=lora, lora_ema=shadow,
                             opt_state=opt, ema_shadow=shadow,
                             meta={"step": 200, "epoch": 1})
    assert ckpt.latest_checkpoint(tmp_path).endswith("checkpoint-200")

    l2, le2, o2, s2, meta = ckpt.load_vdm_checkpoint(
        ckpt.latest_checkpoint(tmp_path), lora=jax.tree.map(jnp.zeros_like,
                                                            lora),
        opt_state=jax.tree.map(jnp.zeros_like, opt), ema_shadow=jax.tree.map(
            jnp.zeros_like, shadow))
    assert meta["step"] == 200
    np.testing.assert_array_equal(np.asarray(l2["q"]["a"]),
                                  np.asarray(lora["q"]["a"]))
    np.testing.assert_array_equal(np.asarray(o2["count"]), 11)
    np.testing.assert_array_equal(np.asarray(s2["q"]["a"]),
                                  np.asarray(shadow["q"]["a"]))


def test_search_artifact_roundtrip(tmp_path):
    tree = {"kernel": np.random.default_rng(0).standard_normal((8, 4, 3)),
            "bias": np.zeros(8)}
    ckpt.save_search_artifact(tmp_path / "state_dict_enc_blocks_2.npz", tree)
    back = ckpt.load_search_artifact(tmp_path / "state_dict_enc_blocks_2.npz")
    np.testing.assert_array_equal(back["kernel"], tree["kernel"])
