"""Checkpoint / resume — the reference's three schemes on orbax.

Parity targets (SURVEY.md §5):
  1. *Stitching* (`model_stitching_training.py:33-72,243-279`): per-epoch
     `stitched_model_epoch_N` holding ONLY {lora, stitching_layer,
     mask_token, cls_token, register_tokens} + `resume_checkpoint` with
     {epoch, optimizer, scheduler/step, args};
  2. *VDM* (`train_vdm.py:32-97,439-496`): `checkpoint-N/{lora, lora_ema,
     optim, ema_shadow, meta}` — optimizer + EMA shadow saved SHARDED (what
     torch DCP does; orbax writes per-shard natively from sharded arrays);
  3. *Search artifacts* (`find_layer_for_stitching.py:262-325`): idempotent
     per-layer files — handled as .npz by the search CLI (kept simple,
     host-side numpy).

orbax replaces torch.save + torch.distributed.checkpoint: sharded arrays
round-trip with their shardings, saves are atomic, restores accept a target
structure for dtype/sharding placement.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.StandardCheckpointer()


def _save(path: Path, tree) -> None:
    path = Path(path).absolute()
    with _ckptr() as ck:
        ck.save(path, tree, force=True)


def _restore(path: Path, target=None):
    with _ckptr() as ck:
        if target is None:
            return ck.restore(Path(path).absolute())
        return ck.restore(Path(path).absolute(), target)


# --------------------------------------------------------------------------- #
# scheme 1: stitching training                                                #
# --------------------------------------------------------------------------- #
def stitched_model_state(trainable: dict) -> dict:
    """The exact artifact set of `save_checkpoint`
    (`model_stitching_training.py:57-72`): LoRA factors + stitching conv +
    DINOv2 special tokens.  `trainable` is the TrainState.trainable tree of
    `vist3a_tpu.train.stitching` (already exactly this set + biases)."""
    from vist3a_tpu.core.partition import prune

    return prune(trainable)


def save_stitching_checkpoint(save_dir, epoch: int, state,
                              args_dict: dict | None = None) -> None:
    """Per-epoch save (`model_stitching_training.py:33-72`): the pruned
    export artifact (LoRA + stitch conv + special tokens) AND the full
    resume state (trainable incl. None placeholders, optimizer, step)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    _save(save_dir / f"stitched_model_epoch_{epoch}",
          stitched_model_state(state.trainable))
    _save(save_dir / "resume_checkpoint",
          {"epoch": np.asarray(epoch, np.int32),
           "step": np.asarray(state.step),
           "trainable": state.trainable, "opt_state": state.opt_state})
    if args_dict is not None:
        (save_dir / "args.json").write_text(json.dumps(args_dict, default=str))


def load_stitching_checkpoint(save_dir, state):
    """Resume (`model_stitching_training.py:243-279`).  Returns
    (epoch_start, TrainState) — epoch_start is saved_epoch + 1."""
    save_dir = Path(save_dir)
    meta = _restore(save_dir / "resume_checkpoint",
                    {"epoch": np.asarray(0, np.int32),
                     "step": np.asarray(state.step),
                     "trainable": state.trainable,
                     "opt_state": state.opt_state})
    return int(meta["epoch"]) + 1, state._replace(
        step=jax.numpy.asarray(meta["step"]), trainable=meta["trainable"],
        opt_state=meta["opt_state"])


# --------------------------------------------------------------------------- #
# scheme 2: VDM training                                                      #
# --------------------------------------------------------------------------- #
def save_vdm_checkpoint(save_dir, step: int, *, lora, lora_ema, opt_state,
                        ema_shadow, meta: dict) -> None:
    """`checkpoint-{step}/` layout of `train_vdm.py:32-97` — lora + EMA-lora
    (the swap-save-swap of :57-69 reduces to saving the EMA tree), sharded
    optimizer + EMA shadow, and a small meta dict."""
    root = Path(save_dir) / f"checkpoint-{step}"
    root.mkdir(parents=True, exist_ok=True)
    _save(root / "lora", lora)
    _save(root / "lora_ema", lora_ema)
    _save(root / "optim", opt_state)
    _save(root / "ema_shadow", ema_shadow)
    (root / "meta.json").write_text(json.dumps(meta, default=str))


def load_vdm_checkpoint(ckpt_dir, *, lora, opt_state, ema_shadow):
    """Restore with target trees (shardings/dtypes preserved).  Returns
    (lora, lora_ema, opt_state, ema_shadow, meta)."""
    root = Path(ckpt_dir)
    meta = json.loads((root / "meta.json").read_text())
    return (_restore(root / "lora", lora),
            _restore(root / "lora_ema", lora),
            _restore(root / "optim", opt_state),
            _restore(root / "ema_shadow", ema_shadow),
            meta)


def latest_checkpoint(save_dir) -> str | None:
    root = Path(save_dir)
    if not root.exists():
        return None
    cands = [(int(p.name.split("-")[1]), p) for p in root.iterdir()
             if p.is_dir() and p.name.startswith("checkpoint-")]
    return str(max(cands)[1]) if cands else None


# --------------------------------------------------------------------------- #
# scheme 3: search artifacts (host numpy, idempotent)                          #
# --------------------------------------------------------------------------- #
def save_search_artifact(path, tree: dict) -> None:
    flat = {k: np.asarray(v) for k, v in tree.items()}
    np.savez(path, **flat)


def load_search_artifact(path) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
