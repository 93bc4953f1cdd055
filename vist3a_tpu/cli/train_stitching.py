"""Entry point: stitching distillation training.

Parity target: `model_stitching_training.py` — epoch loop with per-step
random view count {9,13,17,21} (:101-109, shared-PRNG here), batch view
slicing (:111-114), student stitched forward + frozen teacher forward,
14-term loss, AdamW + cosine warmup + clip 1.0, per-epoch checkpoints
(:357-365), resume (:243-279).

Usage mirrors the reference:
  python -m vist3a_tpu.cli.train_stitching --dataset dl3dv:/data/dl3dv \
      --lora_config r64,a32,d0.0,f0 --batch_size 3 --num_epochs 30 ...
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

import contextlib

from vist3a_tpu.cli.arguments import stitching_training_argument
from vist3a_tpu.core import mesh as mesh_mod
from vist3a_tpu.data.loader import create_stitching_dataloader
from vist3a_tpu.io import checkpoints as ckpt
from vist3a_tpu.nn import wan_vae
from vist3a_tpu.stitch import chopped_anysplat as ca
from vist3a_tpu.train import stitching as st


def encode_context(vae_params, vae_images_pm1, vae_cfg, key):
    """Frozen VAE encode of the sliced clip (posterior sample,
    `models/stitched_model.py:133`)."""
    mu, logvar = wan_vae.encode(vae_params, vae_images_pm1, vae_cfg)
    return jax.lax.stop_gradient(
        wan_vae.sample_posterior(key, mu, logvar))


def run(params: dict, scfg: ca.StitchedConfig, loader, sampler, *,
        train_cfg: st.StitchTrainConfig, num_epochs: int, save_path=None,
        resume_path=None, key=jax.random.key(23), log_every: int = 10,
        on_metrics=None, mesh=None):
    """The training loop.  params: {"encoder", "stitch_conv", "vae"} (the
    teacher shares the frozen encoder weights at init, like the reference
    chopping the same pretrained AnySplat).

    With `mesh` the loop runs data-parallel (DDP parity,
    `model_stitching_training.py:286-289`): batches sharded over "data",
    params/opt-state replicated, grad all-reduce inserted by GSPMD."""
    state, frozen = st.init_train_state(key, {
        "encoder": params["encoder"], "stitch_conv": params["stitch_conv"]},
        train_cfg)
    epoch_start = 0
    if resume_path is not None:
        epoch_start, state = ckpt.load_stitching_checkpoint(resume_path,
                                                            state)

    teacher = params["encoder"]
    vae = params["vae"]
    if mesh is not None:
        state = mesh_mod.replicate(mesh, state)
        teacher = mesh_mod.replicate(mesh, teacher)
        vae = mesh_mod.replicate(mesh, vae)
    mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()

    history = []
    for epoch in range(epoch_start, num_epochs):
        sampler.set_epoch(epoch)
        for step_in_epoch, batch in enumerate(loader):
            gstep = int(state.step)
            n_views = st.sample_view_count(key, gstep)
            vae_images = jnp.asarray(
                batch["vae_image_tensor"][:, :, :n_views])
            ff_images = jnp.asarray(
                batch["feedforward_image_tensor"][:, :, :n_views])
            if mesh is not None:
                vae_images, ff_images = mesh_mod.shard_batch(
                    mesh, (vae_images, ff_images))
            with mesh_ctx:
                latent = encode_context(
                    vae, vae_images, scfg.vae,
                    jax.random.fold_in(key, 2 * gstep + 1))
                teacher01 = jnp.swapaxes((ff_images + 1.0) * 0.5, 1, 2)

                state, metrics = st.stitch_train_step(
                    state, teacher, latent, ff_images, teacher01,
                    scfg, scfg.encoder, lora_spec=train_cfg.lora_spec,
                    train_cfg=train_cfg)
            if gstep % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                history.append({"epoch": epoch, "step": gstep, **m})
                if on_metrics:
                    on_metrics(history[-1])
        if save_path is not None:
            ckpt.save_stitching_checkpoint(save_path, epoch, state)
    return state, history


def main(args):
    from vist3a_tpu.cli.model_loading import (load_anysplat_encoder,
                                              load_wan_vae_params,
                                              weights_root)
    from vist3a_tpu.io.load_weights import load_torch_state_dict
    from vist3a_tpu.stitch.conv_spec import conv_spec_to_string

    root = weights_root(args)
    encoder = load_anysplat_encoder(root)
    vae = load_wan_vae_params(root)
    if args.initialization_weight_path:
        init_sd = load_torch_state_dict(args.initialization_weight_path)
        stitch_conv = {"kernel": jnp.asarray(init_sd["weight"]),
                       "bias": jnp.asarray(init_sd["bias"])}
    else:
        spec = args.stitching_layer_config
        stitch_conv = spec.init(jax.random.key(args.global_seed), 16)

    scfg = ca.StitchedConfig(
        stitch_layer_index=int(
            args.stitching_layer_location.rsplit("_", 1)[-1]),
        conv_spec=conv_spec_to_string(args.stitching_layer_config))

    # the mesh plays the reference's DDP world: the loader yields this
    # process's share of the GLOBAL batch (per-device `--batch_size`,
    # `model_stitching_training.py:286-289`), sharded over "data" in run()
    mesh = mesh_mod.mesh_from_args(args)
    args.batch_size = mesh_mod.local_batch_size(args.batch_size, mesh)
    loader, sampler = create_stitching_dataloader(
        [(n, str(p)) for n, p in args.dataset], args, augmentation=True,
        num_replicas=jax.process_count(), rank=jax.process_index())
    steps_per_epoch = len(loader)
    train_cfg = st.StitchTrainConfig(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps,
        total_steps=args.num_epochs * steps_per_epoch,
        lora_spec=args.lora_config)
    # rank-0 metric stream (`model_stitching_training.py:173-193`): real
    # wandb when importable, JSONL fallback otherwise
    from vist3a_tpu.core.wandb_log import make_run
    logger = make_run(args.wandb_logging, project=args.wandb_project_name,
                      run_name=args.exp_name, config=vars(args),
                      out_dir=args.save_path)

    def on_metrics(m):
        print(m)
        logger.log(m, step=m.get("step"))

    try:
        run({"encoder": encoder, "stitch_conv": stitch_conv, "vae": vae},
            scfg, loader, sampler, train_cfg=train_cfg,
            num_epochs=args.num_epochs, save_path=args.save_path,
            resume_path=args.resume_checkpoint_path,
            key=jax.random.key(args.global_seed),
            on_metrics=on_metrics, mesh=mesh)
    finally:
        logger.finish()


if __name__ == "__main__":
    main(stitching_training_argument().parse_args())
