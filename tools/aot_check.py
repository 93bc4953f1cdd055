"""AOT multi-chip TPU compile gate + compile-time HBM measurement.

With one physical chip, CPU-mesh tests cannot catch TPU-only lowering
failures: interpret-mode Pallas lowers to plain HLO, so the class of bug
"Mosaic kernels cannot be automatically partitioned" (jax
`tpu_custom_call.py` — any multi-device TPU program containing a raw Mosaic
custom call fails to lower) stays invisible until a real slice.  This tool
AOT-compiles the deployment programs against a VIRTUAL TPU topology
(`jax.experimental.topologies.get_topology_desc`, no devices needed) and
prints each program's per-chip `memory_analysis()` — both the regression
gate for `kernels/partitioning.py` and the source of the deployment HBM
figures in PARITY.md.

Run (any machine with libtpu, no TPU attached):
    python tools/aot_check.py [v5e:2x4] [4x2]

Programs compiled:
  1. 14B VDM SFT step, tp_fsdp placement (the 14B training mode);
  2. 14B TP UniPC denoise CFG step (the 14B inference mode);
  3. 1.3B RL reward step, FSDP placement, reduced shapes (the flagship
     reward-aligned mode; full-scale needs the real ≥4-chip HBM).
"""

from __future__ import annotations

import dataclasses
import os
import sys

# kernels must lower through Mosaic even though this host's trace-time
# backend is cpu (the compile TARGET is the TPU topology) — interpret-mode
# or XLA-attention fallbacks would hide lowering bugs and blow the memory
# figures (an O(N²) probs matrix is 10.7 GiB at the decode shape)
os.environ["VIST3A_FORCE_MOSAIC"] = "1"

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vist3a_tpu.core import mesh as mesh_mod
from vist3a_tpu.diffusion import flow_match
from vist3a_tpu.nn import wan_dit
from vist3a_tpu.train import vdm

GIB = 1024 ** 3


def report(tag, compiled):
    ma = compiled.memory_analysis()
    args = getattr(ma, "argument_size_in_bytes", 0)
    out = getattr(ma, "output_size_in_bytes", 0)
    tmp = getattr(ma, "temp_size_in_bytes", 0)
    alias = getattr(ma, "alias_size_in_bytes", 0)
    peak = (args + out + tmp - alias) / GIB
    print(f"AOT OK [{tag}]: per-chip ~{peak:.2f} GiB "
          f"(args {args / GIB:.2f} + temp {tmp / GIB:.2f} "
          f"+ out {out / GIB:.2f} − alias {alias / GIB:.2f}; "
          f"v5e chip = 15.75)")
    return peak


def shaped(tree, sharding):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding),
        tree)


def check_14b_sft(mesh):
    cfg = dataclasses.replace(wan_dit.WAN_14B, attn_impl="pallas")
    vcfg = vdm.VDMTrainConfig(enable_rl=False)
    dit_abs = jax.eval_shape(lambda k: wan_dit.init(k, cfg, jnp.bfloat16),
                             jax.random.key(0))
    state_abs = jax.eval_shape(
        lambda k: vdm.init_train_state(k, {"blocks": dit_abs["blocks"]},
                                       vcfg), jax.random.key(1))
    specs = mesh_mod.tp_fsdp_shardings(cfg, dit_abs, mesh)
    dit_sh = jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        dit_abs, specs)
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    b = mesh.shape["data"]          # 1 clip per data-rank (reference B)
    zs = jax.ShapeDtypeStruct((b, 16, 4, 64, 64), jnp.float32, sharding=dp)
    ts = jax.ShapeDtypeStruct((b,), jnp.float32, sharding=dp)
    text = jax.ShapeDtypeStruct((b, 226, 4096), jnp.float32, sharding=dp)

    def sft_step(dit, lora, opt_state, z_sigma, tstep, text, target):
        def loss_fn(lora):
            # in-body LoRA merge (what train/vdm does): the eagerly merged
            # stack kept an 8.4 GB q/k/v/o copy live and pushed this program
            # to 16.01 GiB/chip (over v5e HBM) in the r4 gate
            import functools

            from vist3a_tpu.stitch import lora as lora_mod
            merge_fn = functools.partial(lora_mod.merge_lora, cfg=vcfg.lora)
            dt = jax.tree_util.tree_leaves(dit)[0].dtype
            pred = wan_dit.forward(dit, z_sigma.astype(dt), tstep,
                                   text.astype(dt), cfg,
                                   remat=True, lora_blocks=lora,
                                   merge_fn=merge_fn).astype(jnp.float32)
            return flow_match.flow_matching_loss(pred, target)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = vdm.build_optimizer(vcfg).update(
            grads, opt_state, lora)
        return loss, optax.apply_updates(lora, updates), opt_state

    with mesh:   # ambient mesh at trace time → kernels' shard_map active
        compiled = jax.jit(sft_step).lower(
            dit_sh, shaped(state_abs.lora, rep),
            shaped(state_abs.opt_state, rep), zs, ts, text, zs).compile()
    return report("14B SFT tp_fsdp", compiled)


def check_14b_tp_denoise(mesh):
    from vist3a_tpu.pipelines import t23d

    cfg = dataclasses.replace(wan_dit.WAN_14B, attn_impl="pallas")
    dit_abs = jax.eval_shape(lambda k: wan_dit.init(k, cfg, jnp.bfloat16),
                             jax.random.key(0))
    specs = wan_dit.param_shardings(cfg)
    dit_sh = jax.tree_util.tree_map(
        lambda a, sp: jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=NamedSharding(mesh, sp)),
        dit_abs, specs)
    rep = NamedSharding(mesh, P())
    icfg = t23d.T23DConfig(width=512, height=512, num_frames=13,
                           num_inference_steps=50, dit=cfg)
    lat = jax.ShapeDtypeStruct(
        (1, 16, (icfg.num_frames - 1) // 4 + 1, 64, 64), jnp.float32,
        sharding=rep)
    cond = jax.ShapeDtypeStruct((1, 226, 4096), jnp.float32, sharding=rep)

    from vist3a_tpu.diffusion import unipc

    def one_cfg_step(dit, x, cond, uncond, t):
        def model(z, tt):
            z2 = jnp.concatenate([z, z], axis=0).astype(jnp.bfloat16)
            txt = jnp.concatenate([cond, uncond], axis=0).astype(jnp.bfloat16)
            tv = jnp.full((z2.shape[0],), tt, jnp.float32)
            v = wan_dit.forward(dit, z2, tv, txt, cfg).astype(jnp.float32)
            vc, vu = jnp.split(v, 2, axis=0)
            return vu + 5.0 * (vc - vu)

        return unipc.sample_scan(
            model, x, unipc.UniPCConfig(num_steps=2, shift=3.0))

    t = jax.ShapeDtypeStruct((), jnp.float32, sharding=rep)
    with mesh:
        compiled = jax.jit(one_cfg_step).lower(dit_sh, lat, cond, cond,
                                               t).compile()
    return report("14B TP denoise (2-step scan body)", compiled)


def check_rl_step_lowering(mesh):
    """Reduced-shape RL step (rollout + stitched decode + rasterizer + CLIP
    towers) under FSDP — proves every Pallas kernel in the reward path
    lowers multi-device on TPU."""
    from vist3a_tpu.nn import clip as clip_mod
    from vist3a_tpu.nn import encoder as enc_mod
    from vist3a_tpu.nn import wan_vae
    from vist3a_tpu.nn.aggregator import AggregatorConfig
    from vist3a_tpu.nn.heads import CameraHeadConfig, DPTConfig, GSHeadConfig
    from vist3a_tpu.nn.vit import ViTConfig
    from vist3a_tpu.stitch import chopped_anysplat as ca
    from vist3a_tpu.train import reward as reward_mod
    from vist3a_tpu.train.vdm import _vdm_step_jit

    d = 32
    ecfg = enc_mod.EncoderConfig(
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
    scfg = ca.StitchedConfig(encoder=ecfg, stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1")
    dit_cfg = wan_dit.WanDiTConfig(dim=64, ffn_dim=128, num_layers=2,
                                   num_heads=4, freq_dim=32, text_dim=24)
    vae_cfg = wan_vae.WanVAEConfig(base_dim=8, z_dim=16, num_res_blocks=1)
    tiny_vis = clip_mod.CLIPVisionConfig(
        hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64, patch_size=8,
        image_size=32, projection_dim=16, act="gelu")
    rcfg = reward_mod.RewardConfig(pick_cfg=tiny_vis, pe_cfg=tiny_vis)

    # abstract params, placed
    rep = NamedSharding(mesh, P())
    dit_abs = jax.eval_shape(lambda k: wan_dit.init(k, dit_cfg),
                             jax.random.key(0))
    dit_sh = jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        dit_abs, mesh_mod.fsdp_shardings(dit_abs, mesh, min_size=1))
    vcfg = vdm.VDMTrainConfig(enable_rl=True, rollout_steps_low=3,
                              rollout_steps_high=3)
    state_abs = jax.eval_shape(
        lambda k: vdm.init_train_state(k, {"blocks": dit_abs["blocks"]},
                                       vcfg), jax.random.key(1))
    vae_abs = jax.eval_shape(lambda k: wan_vae.init(k, vae_cfg),
                             jax.random.key(2))
    stitched_abs = jax.eval_shape(
        lambda k: {"encoder": enc_mod.init(k, ecfg),
                   "stitch_conv": ca.init_stitch_conv(k, scfg)},
        jax.random.key(3))
    pick_abs = jax.eval_shape(lambda k: clip_mod.init(k, tiny_vis),
                              jax.random.key(4))
    txt = jax.ShapeDtypeStruct((1, 16), jnp.float32, sharding=rep)

    loss_fn = reward_mod.make_loss_fn(None, None, logit_scale=30.0, cfg=rcfg)
    b = mesh.shape["data"]
    fn = _vdm_step_jit(dit_cfg, vae_cfg, scfg, vcfg,
                       vdm._loss_token(loss_fn), 3,
                       (1, 16, 2, 8, 8), 56, None)
    dp = NamedSharding(mesh, P("data"))
    key = jax.ShapeDtypeStruct((), jax.eval_shape(
        lambda: jax.random.key(0)).dtype, sharding=rep)
    with mesh:
        compiled = fn.lower(
        shaped(state_abs, rep), dit_sh, shaped(vae_abs, rep),
        shaped(stitched_abs, rep),
        jax.ShapeDtypeStruct((b, 3, 5, 64, 64), jnp.float32, sharding=dp),
        jax.ShapeDtypeStruct((b, 5, dit_cfg.text_dim), jnp.float32,
                             sharding=dp),
        jax.ShapeDtypeStruct((1, 5, dit_cfg.text_dim), jnp.float32,
                             sharding=rep),
        jax.ShapeDtypeStruct((1, 5, dit_cfg.text_dim), jnp.float32,
                             sharding=rep),
        jax.ShapeDtypeStruct((3,), jnp.int32, sharding=rep),
        (txt, txt),
        shaped({"pick": pick_abs, "pe": pick_abs}, rep),
        jax.ShapeDtypeStruct((), jnp.float32, sharding=rep),
        key, key, key, key).compile()
    return report("RL step FSDP (reduced shapes)", compiled)


def check_rl_step_deployed(mesh):
    """DEPLOYED-scale RL reward step (the flagship reward-aligned mode at the
    shapes the reference actually trains, `train_vdm.py:296-310,566-637`):
    1.3B DiT FSDP-placed over "data", one 13-frame 512p SFT clip per data
    rank, 50-step UniPC rollout with affine-replay gradient truncation
    (`train/vdm.rollout`), full Wan VAE decode, 448p 13-view stitched decode
    + Pallas render (per-view remat), real-size PickScore CLIP-H/14-224 +
    DFN5B ViT-H/14-378 reward towers.  The per-chip memory_analysis() of
    this compile IS the deployment claim for the ≥4-chip FSDP mode."""
    from vist3a_tpu.nn import clip as clip_mod
    from vist3a_tpu.nn import encoder as enc_mod
    from vist3a_tpu.nn import wan_vae
    from vist3a_tpu.stitch import chopped_anysplat as ca
    from vist3a_tpu.train import reward as reward_mod
    from vist3a_tpu.train.vdm import _vdm_step_jit

    dit_cfg = dataclasses.replace(wan_dit.WAN_1_3B, attn_impl="pallas")
    vae_cfg = wan_vae.WanVAEConfig()
    base = ca.StitchedConfig()
    # heads stay fp32: the reference keeps heads out of autocast in
    # training (`anysplat.py:421`); bf16 heads are an inference-decode
    # optimization whose conv VJP would also hit the fp32-cotangent ×
    # bf16-kernel dtype mismatch under grad
    ecfg = dataclasses.replace(
        base.encoder,
        vit=dataclasses.replace(base.encoder.vit, attn_impl="pallas"),
        agg=dataclasses.replace(base.encoder.agg, attn_impl="pallas"))
    scfg = dataclasses.replace(base, encoder=ecfg)
    rcfg = reward_mod.RewardConfig()
    vcfg = vdm.VDMTrainConfig(enable_rl=True)
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    b = mesh.shape["data"]

    dit_abs = jax.eval_shape(lambda k: wan_dit.init(k, dit_cfg, jnp.bfloat16),
                             jax.random.key(0))
    dit_sh = jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        dit_abs, mesh_mod.fsdp_shardings(dit_abs, mesh))
    state_abs = jax.eval_shape(
        lambda k: vdm.init_train_state(k, {"blocks": dit_abs["blocks"]},
                                       vcfg), jax.random.key(1))
    vae_abs = jax.eval_shape(lambda k: wan_vae.init(k, vae_cfg),
                             jax.random.key(2))
    stitched_abs = jax.eval_shape(
        lambda k: {"encoder": enc_mod.cast_trunk_bf16(
                       enc_mod.init(k, scfg.encoder)),
                   "stitch_conv": ca.init_stitch_conv(k, scfg)},
        jax.random.key(3))
    pick_abs = jax.eval_shape(
        lambda k: clip_mod.init(k, rcfg.pick_cfg, jnp.bfloat16),
        jax.random.key(4))
    pe_abs = jax.eval_shape(
        lambda k: clip_mod.init(k, rcfg.pe_cfg, jnp.bfloat16),
        jax.random.key(5))
    txt = jax.ShapeDtypeStruct((1, rcfg.pick_cfg.projection_dim),
                               jnp.float32, sharding=rep)

    loss_fn = reward_mod.make_loss_fn(None, None, logit_scale=100.0,
                                      cfg=rcfg)
    fn = _vdm_step_jit(dit_cfg, vae_cfg, scfg, vcfg,
                       vdm._loss_token(loss_fn),
                       vcfg.rollout_steps_high,       # 50: the largest variant
                       (1, 16, 4, 64, 64), 448, None)
    key = jax.ShapeDtypeStruct((), jax.eval_shape(
        lambda: jax.random.key(0)).dtype, sharding=rep)
    with mesh:
        compiled = fn.lower(
            shaped(state_abs, rep), dit_sh, shaped(vae_abs, rep),
            shaped(stitched_abs, rep),
            jax.ShapeDtypeStruct((b, 3, 13, 512, 512), jnp.float32,
                                 sharding=dp),
            jax.ShapeDtypeStruct((b, 226, dit_cfg.text_dim), jnp.float32,
                                 sharding=dp),
            jax.ShapeDtypeStruct((1, 226, dit_cfg.text_dim), jnp.float32,
                                 sharding=rep),
            jax.ShapeDtypeStruct((1, 226, dit_cfg.text_dim), jnp.float32,
                                 sharding=rep),
            jax.ShapeDtypeStruct((3,), jnp.int32, sharding=rep),
            (txt, txt),
            shaped({"pick": pick_abs, "pe": pe_abs}, rep),
            jax.ShapeDtypeStruct((), jnp.float32, sharding=rep),
            key, key, key, key).compile()
    peak = report("RL step FSDP (deployed scale)", compiled)
    assert peak <= 15.75, (
        f"deployed RL step needs {peak:.2f} GiB/chip > v5e 15.75")
    return peak


def check_qwen_judge_tp(devs):
    """7B Qwen2.5-VL judge: greedy prefill (L=1024, 512 new-token cache) +
    one decode step, Megatron TP over a model=4 mesh (`nn/qwen_vl.py
    text_param_shardings`).  7B bf16 weights are 15.2 GB — over one chip;
    the reference runs the judge on one GH200 (`dpg_evaluation.py:79-86`).
    kv_heads=4 ⇒ model must divide 4."""
    from vist3a_tpu.nn import qwen_vl

    tcfg = qwen_vl.QWEN25_VL_7B_TEXT
    mesh = Mesh(devs.reshape(-1)[:4].reshape(1, 4), ("data", "model"))
    text_abs = jax.eval_shape(
        lambda k: qwen_vl.text_init(k, tcfg, jnp.bfloat16),
        jax.random.key(0))
    specs = qwen_vl.text_param_shardings(text_abs, tcfg)
    text_sh = jax.tree_util.tree_map(
        lambda a, sp: jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=NamedSharding(mesh, sp)),
        text_abs, specs,
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    rep = NamedSharding(mesh, P())
    l, lmax = 1024, 1024 + 512
    ids = jax.ShapeDtypeStruct((l,), jnp.int32, sharding=rep)
    pos = jax.ShapeDtypeStruct((3, l), jnp.int32, sharding=rep)

    def prefill(params, ids, pos_ids):
        x = qwen_vl.embed_tokens(params, ids, None, tcfg)
        kc = jnp.zeros((tcfg.num_layers, lmax, tcfg.num_kv_heads,
                        tcfg.head_dim), x.dtype)
        vc = jnp.zeros_like(kc)
        logits, kc, vc = qwen_vl.text_forward(
            params, x, pos_ids, tcfg, kcache=kc, vcache=vc, cache_pos=0,
            last_only=True)
        return jnp.argmax(logits[-1]).astype(jnp.int32), kc, vc

    with mesh:
        compiled = jax.jit(prefill).lower(text_sh, ids, pos).compile()
    peak = report("Qwen 7B judge prefill TP=4", compiled)

    kc_abs = jax.ShapeDtypeStruct(
        (tcfg.num_layers, lmax, tcfg.num_kv_heads, tcfg.head_dim),
        jnp.bfloat16,
        sharding=NamedSharding(mesh, P(None, None, "model", None)))

    def step(params, tok, kc, vc):
        x = params["embed"][tok][None]
        logits, kc, vc = qwen_vl.text_forward(
            params, x, jnp.full((3, 1), l, jnp.int32), tcfg,
            kcache=kc, vcache=vc, cache_pos=l)
        return jnp.argmax(logits[-1]).astype(jnp.int32), kc, vc

    tok = jax.ShapeDtypeStruct((), jnp.int32, sharding=rep)
    with mesh:
        compiled = jax.jit(step).lower(text_sh, tok, kc_abs,
                                       kc_abs).compile()
    peak2 = report("Qwen 7B judge decode step TP=4", compiled)
    assert max(peak, peak2) < 15.0, "judge TP does not fit a v5e chip"


def main():
    topology = sys.argv[1] if len(sys.argv) > 1 else "v5e:2x4"
    data, model = ((int(x) for x in sys.argv[2].split("x"))
                   if len(sys.argv) > 2 else (4, 2))
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    devs = np.asarray(topo.devices)
    mesh = Mesh(devs.reshape(data, model), ("data", "model"))
    print(f"topology {topology}: {devs.size} devices, "
          f"mesh data={data} model={model}")
    checks = {
        "rl": lambda: check_rl_step_lowering(mesh),
        "denoise14b": lambda: check_14b_tp_denoise(mesh),
        "sft14b": lambda: check_14b_sft(mesh),
        "deployed": lambda: check_rl_step_deployed(mesh),
        "qwen": lambda: check_qwen_judge_tp(devs),
    }
    only = sys.argv[3] if len(sys.argv) > 3 else None
    for name, run in checks.items():
        if only is None or name == only:
            run()
    print("AOT multi-chip gate: ALL OK" if only is None
          else f"AOT gate [{only}]: OK")


if __name__ == "__main__":
    main()
