"""Reward-aligned VDM fine-tuning: LoRA on the Wan DiT, flow-matching SFT
loss + truncated-rollout reward, FSDP/TP-ready sharding.

Parity target: `train_vdm.py` —
  * PEFT LoRA r=8 α=16 on q/k/v/out of attn1+attn2 only (:370-388);
  * AdamW β=(0.9, 0.95) (:392-397), grad-clip 1.0, NON-FINITE GRAD-NORM
    STEP SKIP (:641-644);
  * SFT branch (:541-563): see `vist3a_tpu.diffusion.flow_match`;
  * RL branch (:566-637): synced random step count ∈ [10,50] (50 every 10th
    step), guidance scale ~ U(4,6), 2 random backprop timesteps + the last;
    rollout with the DiT INPUT detached every step (`z_in.detach()`, :598)
    but the scheduler's affine chain differentiable, non-chosen steps fully
    stop-gradiented; final latents → un-normalize → VAE decode → reward;
  * EMA decay .99 over trainable params (:433-437);
  * camera-motion prompt augmentation (:140-245) — 80 templates, verbatim.

TPU notes: rank-0 broadcasts (`choose_and_sync_*`) become shared folded PRNG
keys (every host draws identically, zero comm).  The DiT runs FSDP-style by
sharding its params over the mesh "data" axis at load time (GSPMD
all-gathers per block) or TP over "model" (`wan_dit.param_shardings`); the
step function is sharding-agnostic.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vist3a_tpu.diffusion import flow_match, unipc
from vist3a_tpu.nn import wan_dit, wan_vae
from vist3a_tpu.stitch import lora as lora_mod
from vist3a_tpu.train import ema as ema_mod

# PEFT target set (`train_vdm.py:370-388`): attention q/k/v/out of both
# attention blocks — our DiT tree paths
VDM_LORA_TARGETS = ("attn1/q", "attn1/k", "attn1/v", "attn1/o",
                    "attn2/q", "attn2/k", "attn2/v", "attn2/o")
VDM_LORA_SPEC = "r8,a16,d0.0,f0,t" + "|".join(VDM_LORA_TARGETS)


@dataclasses.dataclass(frozen=True)
class VDMTrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    betas: tuple = (0.9, 0.95)           # `train_vdm.py:392-397`
    grad_clip: float = 1.0
    lora_spec: str = VDM_LORA_SPEC
    ema_decay: float = 0.99
    enable_rl: bool = True
    rollout_steps_low: int = 10
    rollout_steps_high: int = 50
    # bucket the drawn rollout length up to a multiple of this, bounding the
    # jit-variant count at high/bucket (the reference draws uniformly from
    # [10,50] per step, `train_vdm.py:117-137` — through the remote-compile
    # tunnel each fresh length costs 3-10 min, so ~40 variants is hours of
    # warmup; 0 disables bucketing)
    rollout_step_bucket: int = 10
    flow_shift: float = 3.0              # `train_vdm.py:337-343`

    @property
    def lora(self) -> lora_mod.LoraConfig:
        return lora_mod.parse_lora_mode(self.lora_spec)


class VDMTrainState(NamedTuple):
    step: jnp.ndarray
    lora: Any
    opt_state: Any
    ema: Any


def build_optimizer(cfg: VDMTrainConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(cfg.learning_rate, b1=cfg.betas[0], b2=cfg.betas[1],
                    eps=1e-8, weight_decay=cfg.weight_decay))


def init_train_state(key, dit_params, cfg: VDMTrainConfig) -> VDMTrainState:
    lora = lora_mod.init_lora(key, dit_params["blocks"], cfg.lora)
    opt_state = build_optimizer(cfg).init(lora)
    return VDMTrainState(jnp.zeros((), jnp.int32), lora, opt_state,
                         ema_mod.init_ema(lora))


def merged_dit(dit_params, lora, cfg: VDMTrainConfig) -> dict:
    return {**dit_params,
            "blocks": lora_mod.merge_lora(dit_params["blocks"], lora,
                                          cfg.lora)}


# --------------------------------------------------------------------------- #
# synced randomness (shared folded PRNG replaces rank-0 broadcast)            #
# --------------------------------------------------------------------------- #
def choose_and_sync_steps(key, step: int, low=10, high=50) -> int:
    """`train_vdm.py:117-137` + the every-10th-step=50 rule (:567-570)."""
    if step % 10 == 0:
        return high
    k = jax.random.fold_in(jax.random.fold_in(key, step), 1)
    return int(jax.random.randint(k, (), low, high + 1))


def choose_and_sync_two_indices(key, step: int, n: int):
    """`train_vdm.py:100-114`: two distinct timestep indices."""
    k = jax.random.fold_in(jax.random.fold_in(key, step), 2)
    return [int(i) for i in jax.random.permutation(k, n)[:2]]


def bucket_rollout_steps(n: int, bucket: int, high: int) -> int:
    """Round the drawn rollout length UP to a multiple of `bucket` (capped
    at `high`), bounding the set of compiled step variants to high/bucket.
    Rounding up keeps any backprop index drawn against the raw length valid.
    """
    if not bucket:
        return n
    return min(-(-n // bucket) * bucket, high)


def choose_guidance_scale(key, step: int) -> float:
    """U(4, 6) (`train_vdm.py:580`)."""
    k = jax.random.fold_in(jax.random.fold_in(key, step), 3)
    return float(jax.random.uniform(k, (), minval=4.0, maxval=6.0))


# --------------------------------------------------------------------------- #
# truncated-rollout generation                                                #
# --------------------------------------------------------------------------- #
def rollout(dit_params_merged, latents0, cond, uncond, dit_cfg,
            *, num_steps: int, guidance_scale: float, backprop_steps=None,
            backprop_mask=None, backprop_idx=None, flow_shift: float = 3.0,
            lora_blocks=None, merge_fn=None):
    """UniPC CFG rollout with gradient truncation (`train_vdm.py:586-623`):
    the DiT input is stop-gradiented EVERY step; gradient flows only through
    the chosen steps' model outputs (+ the forced last step) and the
    scheduler's affine chain.  Returns normalized (pipeline-space) final
    latents.

    Two forms, identical gradients (tested in `test_vdm_training.py`):
      * `backprop_mask` — (num_steps,) 0/1 floats: the literal reference
        semantics as one masked scan.  MEMORY TRAP under jit: the traced
        mask keeps every step's model residuals live (~37 GB at deployed
        scale) — oracle/testing only.
      * `backprop_idx` (traced (K,) int32) or `backprop_steps` (static
        list; the forced last step is appended) — the training form: a
        no-grad recorded rollout + ONE batched differentiable re-evaluation
        of the K chosen steps + an affine replay (`unipc.replay_affine`).
        Duplicate indices contribute once (reference chooses a SET).
    """
    # compute in the params' dtype (bf16 deployed, matching the reference's
    # FSDP2 bf16 mixed-precision policy, `train_vdm.py:296-304`); the
    # sampler carry stays fp32 — without the boundary cast an fp32 carry
    # silently upcasts every DiT matmul to fp32 (6× MXU passes)
    dt = jax.tree_util.tree_leaves(dit_params_merged)[0].dtype
    ucfg = unipc.UniPCConfig(num_steps=num_steps, shift=flow_shift)

    def model_fn(x, t):
        # input always detached (z_in.detach())
        x2 = jnp.concatenate([x, x], axis=0).astype(dt)
        text = jnp.concatenate([cond, uncond], axis=0).astype(dt)
        ts = jnp.full((x2.shape[0],), t, jnp.float32)
        v = wan_dit.forward(dit_params_merged, x2, ts, text, dit_cfg,
                            remat=True, lora_blocks=lora_blocks,
                            merge_fn=merge_fn).astype(jnp.float32)
        v_c, v_u = jnp.split(v, 2, axis=0)
        return v_u + guidance_scale * (v_c - v_u)

    if backprop_mask is not None:
        return unipc.sample_scan(model_fn, latents0, ucfg,
                                 backprop_mask=jnp.asarray(backprop_mask,
                                                           jnp.float32))

    if backprop_idx is None:
        chosen = sorted(set(int(i) for i in (backprop_steps or ()))
                        | {num_steps - 1})
        backprop_idx = jnp.asarray(chosen, jnp.int32)
    idx = jnp.asarray(backprop_idx, jnp.int32)
    k = idx.shape[0]

    # 1. no-grad rollout, recording per-step model inputs/outputs
    _, x_stack, v_stack = unipc.sample_scan_record(model_fn, latents0, ucfg)

    # 2. differentiable re-evaluation of the K chosen steps in ONE batched
    #    CFG forward (B = 2·K·B0) — the only model residuals kept alive
    _, timesteps = unipc.flow_sigmas(num_steps, flow_shift,
                                     ucfg.num_train_timesteps)
    b0 = latents0.shape[0]
    x_sel = x_stack[idx]                                 # (K, B0, ...)
    t_sel = jnp.asarray(timesteps)[idx]                  # (K,)
    xk = x_sel.reshape((k * b0,) + latents0.shape[1:])
    x2 = jnp.concatenate([xk, xk], axis=0).astype(dt)
    text = jnp.concatenate([jnp.tile(cond, (k, 1, 1)),
                            jnp.tile(uncond, (k, 1, 1))], axis=0).astype(dt)
    ts1 = jnp.repeat(t_sel, b0)
    ts2 = jnp.concatenate([ts1, ts1]).astype(jnp.float32)
    v = wan_dit.forward(dit_params_merged, x2, ts2, text, dit_cfg,
                        remat=True, lora_blocks=lora_blocks,
                        merge_fn=merge_fn).astype(jnp.float32)
    v_c, v_u = jnp.split(v, 2, axis=0)
    v_sel = (v_u + guidance_scale * (v_c - v_u)).reshape(x_sel.shape)

    # duplicate indices (the forced last step can collide with a drawn one)
    # must contribute ONE gradient term — cut the dup rows' grad path
    dup = jnp.any(jnp.triu(idx[None, :] == idx[:, None], k=1), axis=0)
    keep = (~dup).astype(v_sel.dtype).reshape((k,) + (1,) * (v_sel.ndim - 1))
    # zero-VALUED, grad-carrying delta scatter-ADDED onto the detached
    # recorded stack: the replayed value is bitwise the recorded rollout's,
    # grad flows through the K recomputations.  (scatter-add, not -set: the
    # set-transpose routes the cotangent to only one duplicate row — the
    # wrong one once dups are masked)
    delta = keep * (v_sel - jax.lax.stop_gradient(v_sel))
    v_diff = jax.lax.stop_gradient(v_stack).at[idx].add(delta)

    # 3. cheap differentiable affine replay with the K rows spliced in
    return unipc.replay_affine(v_diff, latents0, ucfg)


# --------------------------------------------------------------------------- #
# the train step                                                              #
# --------------------------------------------------------------------------- #
# loss-token registry: `_vdm_step_jit` keys its cache on the loss_fn's
# stable `cache_token` (set by `train.reward.make_loss_fn`), NOT function
# identity — so constructing a fresh loss_fn per prompt (same config) can
# never silently recompile the step.  The live fn is looked up here at
# TRACE time; same-token fns trace identical programs by contract (towers
# and text features ride as traced arguments, never closure constants).
_REWARD_FNS: dict = {}


def _loss_token(reward_loss_fn):
    if reward_loss_fn is None:
        return None
    tok = getattr(reward_loss_fn, "cache_token", None)
    if tok is None:  # foreign callable without a token: fall back to identity
        tok = ("id", id(reward_loss_fn))
    _REWARD_FNS[tok] = reward_loss_fn
    return tok


@functools.lru_cache(maxsize=64)
def _vdm_step_jit(dit_cfg, vae_cfg, scfg, cfg: VDMTrainConfig,
                  loss_token, num_steps: int,
                  latent_shape: tuple, render_size: int, pair_budget,
                  return_images: bool = False):
    """The jitted per-step program, cached by the static rollout config.

    Everything heavy runs in ONE compiled program (eager execution through
    the remote-dispatch tunnel made the step dispatch-bound: the SFT-only
    step measured 13.3 s eager vs the jitted program's device time).
    Only the (bucketed) rollout LENGTH keys a fresh variant: the chosen
    backprop steps ride as a runtime (3,) int32 index array and the
    per-prompt scorer text features as runtime arrays, so an RL run compiles
    at most
    high/bucket (=5 deployed) programs.  The frozen CLIP tower params ride
    as a traced `reward_params` argument (loss_fn.reward_params) — baking
    them into the program as closure constants doubles their HBM and ships
    ~2.5 GB through the remote compile per variant."""
    reward_loss_fn = (None if loss_token is None
                      else _REWARD_FNS[loss_token])

    def run(state, dit_params, vae_params, stitched_params, video, sft_text,
            rl_cond, rl_uncond, bp_idx, reward_text, reward_params,
            guidance, k_vae, k_flow, k_noise, k_reward):
        from vist3a_tpu.train.reward import calculate_reward

        # frozen VAE encode of the SFT clip (posterior sample, normalized).
        # bf16 ACTIVATIONS over fp32 weights: the reference encodes inside
        # the autocast-bf16 training step (`train_vdm.py:541-563`), and the
        # fp32 encode at 13×512p holds 2 GB (13,512,512,96) stage buffers —
        # the deployed AOT gate measured 17.9 GiB/chip with it fp32
        mu, logvar = wan_vae.encode(vae_params,
                                    video.astype(jnp.bfloat16), vae_cfg,
                                    remat=True)
        mu, logvar = mu.astype(jnp.float32), logvar.astype(jnp.float32)
        z0 = wan_vae.sample_posterior(k_vae, mu, logvar)
        z0 = wan_vae.normalize_latents(jax.lax.stop_gradient(z0))
        z_sigma, ts, target = flow_match.make_flow_batch(k_flow, z0)
        latents0 = jax.random.normal(k_noise, latent_shape, jnp.float32)

        def loss_fn(lora):
            # LoRA merge happens INSIDE the per-block remat (wan_dit.forward
            # lora_blocks/merge_fn): an eagerly merged stack keeps a full
            # q/k/v/o copy live through fwd+bwd (8.4 GB global at 14B — it
            # pushed the tp_fsdp SFT program past v5e HBM in the AOT gate)
            merge_fn = functools.partial(lora_mod.merge_lora, cfg=cfg.lora)
            dt = jax.tree_util.tree_leaves(dit_params)[0].dtype
            pred = wan_dit.forward(dit_params, z_sigma.astype(dt), ts,
                                   sft_text.astype(dt), dit_cfg,
                                   remat=True, lora_blocks=lora,
                                   merge_fn=merge_fn).astype(jnp.float32)
            diffusion_loss = flow_match.flow_matching_loss(pred, target)

            reward_loss = jnp.float32(0.0)
            imgs = ()
            if cfg.enable_rl and reward_loss_fn is not None:
                lat = rollout(dit_params, latents0, rl_cond, rl_uncond,
                              dit_cfg,
                              num_steps=num_steps, guidance_scale=guidance,
                              backprop_idx=bp_idx,
                              flow_shift=cfg.flow_shift,
                              lora_blocks=lora, merge_fn=merge_fn)
                lat_un = wan_vae.unnormalize_latents(lat)
                # reward-path decode runs bf16 ACTIVATIONS (weights fp32):
                # the reference's reward branch executes under autocast bf16
                # (`train_vdm.py:566-637`), and the fp32 decode at 13×512p
                # holds several (13,512,512,96) 2 GB buffers live through
                # fwd+bwd — measured 26.5 GiB/chip in the AOT deployment
                # gate vs 15.75 available
                decoded = wan_vae.decode(
                    vae_params, lat_un.astype(jnp.bfloat16), vae_cfg,
                    remat=True).astype(jnp.float32)
                reward_loss, pair = calculate_reward(
                    k_reward, lat_un, decoded, stitched_params, scfg,
                    reward_loss_fn, render_size=render_size,
                    pair_budget=pair_budget,
                    text_feats=reward_text if reward_text else None,
                    reward_params=reward_params if reward_params else None)
                if return_images:
                    # decoded-vs-rendered pair for the every-10-step image
                    # grid (`train_vdm.py:665-688`); only the step%10==0
                    # variant (num_steps == high) ever compiles with this on
                    imgs = jax.lax.stop_gradient(pair)
            total = diffusion_loss + reward_loss
            return total, ({"diffusion_loss": diffusion_loss,
                            "reward_loss": reward_loss, "total_loss": total},
                           imgs)

        grads, (metrics, imgs) = jax.grad(loss_fn, has_aux=True)(state.lora)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        # non-finite grad-norm → skip the update (`train_vdm.py:641-644`)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        opt = build_optimizer(cfg)
        updates, opt_state = opt.update(safe_grads, state.opt_state,
                                        state.lora)
        new_lora = optax.apply_updates(state.lora, updates)
        new_lora = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_lora, state.lora)
        opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o)
            if hasattr(n, "dtype") else n,
            opt_state, state.opt_state)

        new_ema = ema_mod.update_ema(state.ema, new_lora, state.step,
                                     ema_mod.EMAConfig(decay=cfg.ema_decay))
        metrics = {**metrics, "grad_norm": gnorm,
                   "skipped": jnp.logical_not(finite)}
        if return_images:
            metrics = {**metrics, "images": imgs}
        return VDMTrainState(state.step + 1, new_lora, opt_state,
                             new_ema), metrics

    # no donation: the EMA shadow aliases the LoRA buffers at init
    # (same arrays), and the state is small (LoRA factors only)
    return jax.jit(run)


def vdm_train_step(state: VDMTrainState, dit_params, vae_params,
                   stitched_params, *, video, sft_text, rl_cond, rl_uncond,
                   reward_loss_fn: Callable | None, key, dit_cfg,
                   vae_cfg, scfg, cfg: VDMTrainConfig,
                   latent_shape=(1, 16, 4, 64, 64),
                   render_size: int = 448,
                   pair_budget: int | None = None,
                   reward_text=None,
                   return_images: bool = False):
    """One VDM step: host-side synced randomness picks the rollout config,
    then ONE cached jitted program does everything (VAE encode, SFT loss,
    truncated-rollout reward, update, EMA).

    video: (B,3,T,H,W) in [−1,1]; sft_text: (B,L,4096); rl_cond/rl_uncond:
    (1,L,4096) rollout prompts.  reward_loss_fn: from
    `vist3a_tpu.train.reward.make_loss_fn` (None → SFT only).
    reward_text: optional (pick_text, pe_text) per-prompt scorer features —
    runtime arrays, so prompt changes never re-trace.
    Returns (state, metrics)."""
    step = int(state.step)
    k_root = jax.random.fold_in(key, step)
    k_vae, k_flow, k_noise, k_reward = jax.random.split(k_root, 4)

    rl = cfg.enable_rl and reward_loss_fn is not None
    if rl:
        num_steps = choose_and_sync_steps(key, step, cfg.rollout_steps_low,
                                          cfg.rollout_steps_high)
        backprop_steps = choose_and_sync_two_indices(key, step, num_steps)
        num_steps = bucket_rollout_steps(num_steps, cfg.rollout_step_bucket,
                                         cfg.rollout_steps_high)
        # traced (3,) indices — the draw never keys a fresh trace; the forced
        # last step may duplicate a drawn one (rollout dedups the gradient)
        bp_idx = jnp.asarray(list(backprop_steps) + [num_steps - 1],
                             jnp.int32)
    else:
        # rollout statics are unused without RL — pin them so the per-step
        # random draw doesn't key a fresh trace/compile of the program
        num_steps, bp_idx = 0, jnp.zeros((0,), jnp.int32)
    guidance = choose_guidance_scale(key, step)

    fn = _vdm_step_jit(dit_cfg, vae_cfg, scfg, cfg,
                       _loss_token(reward_loss_fn),
                       num_steps, tuple(latent_shape),
                       render_size, pair_budget,
                       return_images=bool(return_images and rl))
    # scorer tower params travel as traced args, not closure constants
    reward_params = (getattr(reward_loss_fn, "reward_params", None)
                     if rl else None) or {}
    return fn(state, dit_params, vae_params, stitched_params, video,
              sft_text, rl_cond, rl_uncond, bp_idx,
              () if reward_text is None else tuple(reward_text),
              reward_params, guidance,
              k_vae, k_flow, k_noise, k_reward)


# --------------------------------------------------------------------------- #
# camera-motion prompt augmentation (`train_vdm.py:140-245`)                  #
# --------------------------------------------------------------------------- #
def camera_prompt_templates(prompt: str) -> list[str]:
    base = f"`{prompt}`"
    return [
        base,  # the reference's first entry is the literal string "base" —
               # almost surely meant the plain prompt; we use the prompt
        # 1. pan
        f"The camera pans smoothly from left to right across the scene: {base}. The horizontal motion reveals new spatial elements with each frame.",
        f"The camera performs a fast horizontal sweep, scanning the environment around the main subject: {base}.",
        f"A gentle left-to-right camera pan introduces the scene: {base}. The motion builds anticipation as more details appear.",
        f"The camera quickly pans from right to left, revealing the opposite side of the scene: {base}.",
        f"Pan the camera horizontally to uncover the subject and background in a fluid movement: {base}.",
        f"The camera moves in a slow panoramic motion across the horizon: {base}. This reveals a wide, cinematic field of view.",
        f"The camera performs a smooth 360° panoramic rotation around the scene: {base}. The motion fully encircles the environment.",
        # 2. orbit
        f"The camera orbits around the main subject: {base}. This motion provides multiple perspectives of the central focus.",
        f"A circular orbit movement reveals all sides of the object in: {base}. The subject remains centered while the environment shifts naturally.",
        f"The camera rotates around the scene, maintaining constant distance: {base}. The orbiting trajectory captures 3D structure and consistency.",
        f"The camera performs a full circular path, orbiting around the main focus: {base}.",
        f"The camera glides around the subject in a semicircular arc, showing it from both front and side views: {base}.",
        # 3. dolly
        f"The camera dollies inward toward the subject: {base}. The forward motion increases immersion and depth.",
        f"A slow dolly-out reveals the full environment behind the subject: {base}.",
        f"The camera pushes forward into the center of the scene: {base}. This close approach emphasizes detail and perspective.",
        f"The camera pulls backward from the subject, gradually exposing the surrounding world: {base}.",
        f"A dolly-in transition draws attention to the main object in: {base}. The camera motion builds intensity and focus.",
        # 4. zoom
        f"The camera zooms in slowly to magnify the central details of: {base}.",
        f"The camera performs a fast zoom-out to show the full 3D layout of: {base}.",
        f"A gentle zoom-in enhances focus on the core region of: {base}.",
        f"Zoom the camera lens steadily to emphasize the subject in: {base}.",
        f"The camera zooms out gradually from a close-up view, unveiling the complete composition: {base}.",
        # 5. tilt
        f"The camera tilts upward from the base to the sky: {base}. The vertical movement highlights height and scale.",
        f"The camera tilts downward toward the ground: {base}. This viewpoint emphasizes spatial grounding.",
        f"A smooth upward tilt reveals tall architectural structures in: {base}.",
        f"The camera performs a vertical sweep from top to bottom: {base}. The tilt motion enriches the perception of depth.",
        f"The camera tilts slightly while maintaining focus on the subject: {base}.",
        # 6. fly-through
        f"The camera flies smoothly through the 3D environment: {base}. The flight motion provides a sense of exploration.",
        f"The camera glides like a drone over the terrain: {base}. The aerial trajectory emphasizes continuity and scale.",
        f"The camera flies low across the scene: {base}. The close pass accentuates ground details and parallax.",
        f"The camera navigates through narrow spaces in: {base}. It moves dynamically, avoiding obstacles.",
        f"A cinematic fly-through motion traverses the environment: {base}. The continuous travel conveys immersion.",
        # 7. arc
        f"The camera moves along a curved arc around the subject: {base}. The motion reveals both profile and depth.",
        f"A smooth arc path captures the subject from multiple diagonal angles: {base}.",
        f"The camera glides through an arc trajectory at mid-height: {base}.",
        f"The arc-shaped movement maintains focus on the central point while changing background parallax: {base}.",
        f"The camera performs a half-orbit arc, revealing the subject's side and back view: {base}.",
        # 8. spiral
        f"The camera spirals upward around the object: {base}. The motion combines rotation and elevation.",
        f"The camera follows a helical path circling the subject: {base}.",
        f"A downward spiral descends smoothly toward the scene center: {base}.",
        f"The camera performs a spiral ascent around the 3D environment: {base}.",
        f"A slow, tightening spiral focuses attention on the subject at the core: {base}.",
        # 9. tracking
        f"The camera tracks a moving subject through the space: {base}. The perspective stays consistent during motion.",
        f"A tracking shot keeps the subject centered as it moves dynamically through: {base}.",
        f"The camera follows the target's trajectory with cinematic smoothness: {base}.",
        f"A continuous tracking motion moves alongside the subject: {base}.",
        f"The camera mirrors the subject's motion path, maintaining constant distance: {base}.",
        # 10. crane
        f"The camera rises vertically like a crane shot: {base}. The elevation change provides an aerial overview.",
        f"A slow crane movement lowers the camera toward the scene: {base}.",
        f"The camera lifts steadily upward from ground level: {base}. The ascending motion reveals overall spatial layout.",
        f"A crane motion elevates the viewpoint to a higher perspective: {base}.",
        f"The camera descends smoothly back down to focus on details: {base}.",
        # 11. rotation-in-place
        f"The camera rotates 360° around its axis at a fixed point: {base}.",
        f"A stationary spin reveals every direction of the surrounding scene: {base}.",
        f"The camera performs a slow turn-in-place while keeping balance: {base}.",
        f"A gentle rotational sweep captures panoramic surroundings of: {base}.",
        f"The camera spins steadily to record all angles of the subject: {base}.",
        # 12. handheld
        f"The camera captures {base} with a subtle handheld feel, adding realism and intimacy.",
        f"A natural, slightly shaky handheld motion records: {base}.",
        f"The handheld camera follows the subject closely, simulating human perspective: {base}.",
        f"The shot feels organic, as if captured by a person exploring: {base}.",
        f"The handheld style gives {base} a dynamic and lifelike tone.",
        # 13. composite
        f"The camera starts with a dolly-in and transitions to a circular orbit: {base}.",
        f"A horizontal pan merges into a tilt-up movement: {base}.",
        f"The motion begins as a zoom-in, then arcs around the object: {base}.",
        f"The camera begins with a fly-through and ends with a spiral ascent: {base}.",
        f"A dolly-out ends with a 360° in-place rotation: {base}.",
        # 14. temporal
        f"The camera slowly accelerates over time while capturing: {base}.",
        f"A rapid start transitions into a steady glide through the scene: {base}.",
        f"The motion starts slowly, then speeds up near the subject: {base}.",
        f"The camera eases in at the start, then gently slows as it completes the movement: {base}.",
        f"The motion evolves gradually during the sequence: {base}.",
        # 15. cinematic tone
        f"The camera glides gracefully with cinematic smoothness across: {base}.",
        f"A dramatic sweeping camera move emphasizes the grandeur of: {base}.",
        f"The slow, contemplative camera motion captures the serene atmosphere of: {base}.",
        f"A dynamic, energetic camera movement enhances the intensity of: {base}.",
        f"A suspenseful tracking motion builds tension throughout: {base}.",
        # 16. experimental
        f"The camera rolls diagonally while approaching the scene: {base}.",
        f"The camera oscillates subtly, mimicking breathing motion: {base}.",
        f"A free-floating camera drifts unpredictably through: {base}.",
        f"The shot involves alternating zoom and pan motions to emphasize rhythm: {base}.",
        f"The camera performs a parallax sweep that dynamically layers depth: {base}.",
    ]


def augment_camera_prompt(rng: np.random.Generator, prompt: str) -> str:
    """Uniform choice over the 81 templates (`train_vdm.py:245`)."""
    templates = camera_prompt_templates(prompt)
    return templates[int(rng.integers(0, len(templates)))]
