"""Stitching fine-tune: LoRA distillation of the chopped AnySplat toward the
frozen full AnySplat (teacher), data-parallel over the mesh.

Parity targets:
  * `model_stitching_training.py:196-366` — AdamW over trainable params
    (LoRA + stitching conv + DINOv2 special tokens + LoRA-site biases),
    cosine schedule with warmup (transformers.get_cosine_schedule_with_warmup),
    grad-clip 1.0, bf16 autocast compute;
  * trainable set: `model_stitching_training.py:218-241` (stitch conv on,
    base frozen, `add_lora` over every Linear/Conv2d,
    `mark_only_lora_as_trainable(bias="lora_only")`, DINOv2
    cls/mask/register tokens on);
  * per-step random view count {9,13,17,21} broadcast from rank 0
    (`model_stitching_training.py:101-109`) — here a shared folded PRNG key
    gives every host the same draw with zero communication.

TPU design: one jitted step; the batch is sharded over the mesh "data" axis
and parameters are replicated, so XLA inserts the DDP-equivalent gradient
all-reduce (psum over "data") automatically.  The view-count randomness
selects one of 4 pre-compiled step shapes (static shapes under jit).

Structurally-unused trainables (LoRA rows and LoRA-site biases of the
chopped ViT blocks [0,k), the mask token) receive zero gradient; torch
skips such params entirely (`grad=None`), so AdamW's decoupled weight decay
must not drift them either — `mask_structurally_unused` zeroes their
updates inside the step, keeping them bit-identical to init.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vist3a_tpu.core.partition import combine, partition
from vist3a_tpu.nn import encoder as encoder_mod
from vist3a_tpu.stitch import lora as lora_mod
from vist3a_tpu.stitch.chopped_anysplat import (StitchedConfig,
                                                forward_with_latent)
from vist3a_tpu.train.losses import task_loss

VIEW_COUNTS = (9, 13, 17, 21)  # `model_stitching_training.py:101`


@dataclasses.dataclass(frozen=True)
class StitchTrainConfig:
    learning_rate: float = 1e-4          # `utils/argument.py:131`
    weight_decay: float = 1e-4           # `utils/argument.py:132`
    warmup_steps: int = 1000             # `utils/argument.py:135`
    total_steps: int = 30_000
    grad_clip: float = 1.0               # `model_stitching_training.py:167`
    lora_spec: str = "r64,a32,d0.0,f0"   # Readme.md stitching recipe
    betas: tuple = (0.9, 0.999)          # torch AdamW defaults

    @property
    def lora(self) -> lora_mod.LoraConfig:
        return lora_mod.parse_lora_mode(self.lora_spec)


class TrainState(NamedTuple):
    step: jnp.ndarray
    trainable: Any       # {"lora": ..., "model": partitioned params subtree}
    opt_state: Any


def lr_schedule(cfg: StitchTrainConfig):
    """transformers.get_cosine_schedule_with_warmup: linear 0→peak over
    warmup, then cosine peak→0 (`model_stitching_training.py:308-312`)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps, decay_steps=cfg.total_steps,
        end_value=0.0)


def build_optimizer(cfg: StitchTrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lr_schedule(cfg), b1=cfg.betas[0], b2=cfg.betas[1],
                    eps=1e-8, weight_decay=cfg.weight_decay),
    )


def trainable_predicate(params: dict, lora_cfg: lora_mod.LoraConfig):
    """Paths of `params` that train besides LoRA factors."""
    bias_pred = lora_mod.lora_bias_predicate(params, lora_cfg)
    special = {("encoder", "vit", "cls_token"),
               ("encoder", "vit", "mask_token"),
               ("encoder", "vit", "register_tokens")}

    def pred(path: tuple) -> bool:
        return (path[:1] == ("stitch_conv",) or path in special
                or bias_pred(path))

    return pred


def init_train_state(key: jax.Array, params: dict, cfg: StitchTrainConfig):
    """params: the full stitched-model tree {"stitch_conv", "encoder"}.
    Returns (state, frozen) — differentiate state.trainable only."""
    lcfg = cfg.lora
    lora = lora_mod.init_lora(key, params["encoder"], lcfg)
    taken, frozen = partition(params, trainable_predicate(params, lcfg))
    # deep-copy the taken leaves: at init they alias the teacher's buffers
    # (the student chops the SAME pretrained tree), and aliasing would
    # forbid donating the state to `stitch_train_step`
    taken = jax.tree_util.tree_map(jnp.array, taken)
    trainable = {"lora": lora, "model": taken}
    opt_state = build_optimizer(cfg).init(trainable)
    return TrainState(jnp.zeros((), jnp.int32), trainable, opt_state), frozen


def assemble_params(trainable: dict, frozen: dict,
                    lora_cfg: lora_mod.LoraConfig) -> dict:
    full = combine(trainable["model"], frozen)
    return {**full,
            "encoder": lora_mod.merge_lora(full["encoder"],
                                           trainable["lora"], lora_cfg)}


def mask_structurally_unused(updates, k_chop: int):
    """Zero the optimizer updates of trainables NO forward path reads: LoRA
    factors + LoRA-site biases of the chopped ViT blocks [0, k)
    (`models/anysplat_stitched.py:158-165` deletes those blocks) and the
    DINOv2 mask token.  Their gradient is structurally zero, so torch's
    AdamW skips them (`grad=None`); without this mask optax's decoupled
    weight decay would silently decay them away from the checkpoint."""
    def walk(node, path):
        if node is None:                 # `partition` placeholder
            return None
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path + (i,)) for i, v in enumerate(node)]
        if path[-1:] == ("mask_token",):
            return jnp.zeros_like(node)
        if k_chop and "vit" in path and "blocks" in path:
            return node.at[:k_chop].set(0)
        return node

    return walk(updates, ())


def loss_fn(trainable, frozen, teacher_out, latent, images, scfg: StitchedConfig,
            lora_cfg: lora_mod.LoraConfig):
    params = assemble_params(trainable, frozen, lora_cfg)
    student = forward_with_latent(params, latent, images, scfg)
    losses = task_loss(student, teacher_out)
    return losses["total_loss"], losses


@partial(jax.jit,
         static_argnames=("scfg", "tcfg", "lora_spec", "train_cfg"),
         donate_argnames=("state",))
def stitch_train_step(state: TrainState, teacher_params,
                      latent, images, images_teacher01,
                      scfg: StitchedConfig, tcfg,
                      lora_spec: str = "r64,a32,d0.0,f0",
                      train_cfg: StitchTrainConfig = StitchTrainConfig()):
    """One distillation step.

    latent:           (B, 16, T_vae, h, w) un-normalized Wan latent of the
                      context clip (VAE encode runs frozen, outside the
                      differentiated graph — `models/stitched_model.py:148`).
    images:           (B, 3, S, H, W) in [−1, 1] — feedforward input.
    images_teacher01: (B, S, 3, H, W) in [0, 1] — teacher input
                      (`model_stitching_training.py:129-137`).

    The student's frozen base is DERIVED from `teacher_params` inside the
    step — the reference chops the very same pretrained module instances,
    so teacher and student share one copy of the trunk; passing a separate
    `frozen` tree doubled ~2.3 GB of arguments on a 16 GB chip.  The state
    is donated (trainable leaves are copies since `init_train_state`).
    """
    lora_cfg = lora_mod.parse_lora_mode(lora_spec)
    teacher_out = encoder_mod.forward(teacher_params, images_teacher01, tcfg)
    teacher_out = jax.tree_util.tree_map(jax.lax.stop_gradient, teacher_out)

    shape_tree = {"stitch_conv": state.trainable["model"]["stitch_conv"],
                  "encoder": teacher_params}
    _, frozen = partition(shape_tree,
                          trainable_predicate(shape_tree, lora_cfg))

    grads, losses = jax.grad(loss_fn, has_aux=True)(
        state.trainable, frozen, teacher_out, latent, images, scfg, lora_cfg)

    opt = build_optimizer(train_cfg)
    updates, opt_state = opt.update(grads, state.opt_state, state.trainable)
    updates = mask_structurally_unused(updates, scfg.stitch_layer_index)
    trainable = optax.apply_updates(state.trainable, updates)
    gnorm = optax.global_norm(grads)
    metrics = {**losses, "grad_norm": gnorm,
               "lr": lr_schedule(train_cfg)(state.step)}
    return TrainState(state.step + 1, trainable, opt_state), metrics


def sample_view_count(key: jax.Array, step: int) -> int:
    """Shared-PRNG replacement for the rank-0 broadcast
    (`model_stitching_training.py:101-109`): every host folds the same key
    with the step and draws identically.  Host-level (python int) because the
    view count selects one of 4 compiled shapes."""
    k = jax.random.fold_in(key, step)
    idx = int(jax.random.randint(k, (), 0, len(VIEW_COUNTS)))
    return VIEW_COUNTS[idx]
