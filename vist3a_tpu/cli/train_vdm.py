"""Entry point: reward-aligned VDM fine-tuning.

Parity target: `train_vdm.py:284-691` — the step loop over the prompt
dataset with SFT clips from DL3DV+text, camera-prompt augmentation,
per-`save_freq` VDM checkpoints, the non-finite-grad skip, EMA, and
wandb-style metric emission (here: on_metrics callback + JSONL log).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from vist3a_tpu.cli.arguments import training_vdm_argument, validate_vdm_args
from vist3a_tpu.core import mesh as mesh_mod
from vist3a_tpu.io import checkpoints as ckpt
from vist3a_tpu.train import ema as ema_mod
from vist3a_tpu.train import vdm


def run(state, dit_params, vae_params, stitched_params, *, text_loader,
        video_loader, embed_text, reward_loss_fn, dit_cfg, vae_cfg, scfg,
        cfg: vdm.VDMTrainConfig, num_steps: int, save_path=None,
        save_freq: int = 100, key=jax.random.key(23),
        latent_shape=(1, 16, 4, 64, 64), render_size: int = 448,
        on_metrics=None, uncond_embeds=None, reward_text_fn=None,
        mesh=None, logger=None):
    """The VDM loop.  embed_text(list[str]) → (B, L, text_dim) embeddings;
    text_loader yields {"prompt": [str]}; video_loader yields
    {"image_tensor": (B,3,T,H,W), "caption": [str]}.
    reward_text_fn(prompt) → (pick_text, pe_text) per-prompt scorer text
    features (the reference computes them in-loop via the frozen scorer
    text towers, `utils/reward.py:152-174`); they ride as runtime args so
    the step never re-traces on a prompt change.

    With `mesh` the SFT batch is sharded over "data"; `dit_params` keep
    whatever placement the caller gave them (fsdp/tp/replicated — the
    step is sharding-agnostic, `train/vdm.py`)."""
    import contextlib

    rng = np.random.default_rng(int(jax.random.randint(
        key, (), 0, 2 ** 31 - 1)))
    if mesh is not None:
        state = mesh_mod.replicate(mesh, state)
        vae_params = mesh_mod.replicate(mesh, vae_params)
        stitched_params = mesh_mod.replicate(mesh, stitched_params)
        # the frozen scorer towers ride the RL step as traced args
        # (loss_fn.reward_params, `train/vdm.py`) — place them explicitly
        # like vae/stitched above, instead of leaving their mesh placement
        # to an implicit transfer at dispatch time
        if getattr(reward_loss_fn, "reward_params", None):
            reward_loss_fn.reward_params = mesh_mod.replicate(
                mesh, reward_loss_fn.reward_params)
    mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()
    history = []
    step = int(state.step)
    # data-stream resume (`train_vdm.py:465-496`): on resume at step N both
    # loaders skip N mod len mid-epoch batches and restore the epoch counter
    # that seeds their samplers — state AND stream position resume together
    def _length(loader, name):
        try:                      # sized loaders only; step-count fakes pass
            return max(len(loader), 1)
        except TypeError:
            if step:              # resuming: the stream CANNOT be restored
                import warnings
                warnings.warn(
                    f"resuming at step {step} but the {name} loader has no "
                    f"__len__ — the epoch counter and skip_first_batches "
                    f"cannot be restored, so the run will REPLAY data from "
                    f"the start of the stream (`train_vdm.py:465-496`); "
                    f"give the loader a __len__ to resume the stream",
                    stacklevel=3)
            return 0

    text_len = _length(text_loader, "text")
    video_len = _length(video_loader, "video")
    text_epoch, skip_text = divmod(step, text_len) if text_len else (0, 0)
    video_epoch, skip_video = divmod(step, video_len) if video_len else (0, 0)
    for loader, epoch, skip in ((text_loader, text_epoch, skip_text),
                                (video_loader, video_epoch, skip_video)):
        if hasattr(loader, "sampler"):
            loader.sampler.set_epoch(epoch)
        if skip and hasattr(loader, "skip_first_batches"):
            loader.skip_first_batches(skip)
    video_iter = iter(video_loader)
    while step < num_steps:
        for text_batch in text_loader:
            if step >= num_steps:
                break
            try:
                video_batch = next(video_iter)
            except StopIteration:
                video_epoch += 1
                if hasattr(video_loader, "sampler"):
                    video_loader.sampler.set_epoch(video_epoch)
                video_iter = iter(video_loader)
                video_batch = next(video_iter)

            prompt = text_batch["prompt"][0]
            sft_text = embed_text(list(video_batch["caption"]))
            rl_prompt = vdm.augment_camera_prompt(rng, prompt) \
                if cfg.enable_rl else prompt
            rl_cond = embed_text([rl_prompt])
            rl_uncond = (uncond_embeds if uncond_embeds is not None
                         else jnp.zeros_like(rl_cond))
            reward_text = (reward_text_fn(prompt)
                           if cfg.enable_rl and reward_text_fn else None)

            video = jnp.asarray(video_batch["image_tensor"])
            if mesh is not None:
                video, sft_text = mesh_mod.shard_batch(
                    mesh, (video, sft_text))
                rl_cond, rl_uncond = mesh_mod.replicate(
                    mesh, (rl_cond, rl_uncond))
                if reward_text is not None:
                    reward_text = mesh_mod.replicate(mesh, reward_text)
            # every-10-step decoded-vs-rendered grid (`train_vdm.py:665-688`;
            # step%10==0 also forces the max rollout length, so this never
            # adds a jit variant beyond the one image-emitting program)
            want_images = (cfg.enable_rl and reward_loss_fn is not None
                           and save_path is not None and step % 10 == 0)
            img_step = step        # grid depicts THIS step's rollout
            with mesh_ctx:
                state, metrics = vdm.vdm_train_step(
                    state, dit_params, vae_params, stitched_params,
                    video=video,
                    sft_text=sft_text, rl_cond=rl_cond, rl_uncond=rl_uncond,
                    reward_loss_fn=reward_loss_fn, key=key, dit_cfg=dit_cfg,
                    vae_cfg=vae_cfg, scfg=scfg, cfg=cfg,
                    latent_shape=latent_shape, render_size=render_size,
                    reward_text=reward_text, return_images=want_images)
            step = int(state.step)
            imgs = metrics.pop("images", None)
            m = {k: float(v) for k, v in metrics.items()}
            history.append({"step": step, "prompt": prompt, **m})
            if on_metrics:
                on_metrics(history[-1])
            if logger is not None:
                logger.log({"prompt": prompt, **m}, step=step)
            if imgs:
                _save_image_grid(
                    Path(save_path) / "images" / f"step_{img_step:06d}.png",
                    imgs)
                if logger is not None:
                    # decoded frames then renders, one wandb.Image each
                    # (`train_vdm.py:665-688`)
                    decoded, rendered = imgs
                    logger.log_images(
                        "images",
                        list(np.asarray(decoded)) + list(np.asarray(rendered)),
                        step=img_step)
            if save_path is not None and step % save_freq == 0:
                ckpt.save_vdm_checkpoint(
                    save_path, step, lora=state.lora,
                    lora_ema=ema_mod.ema_params_like(state.ema, state.lora),
                    opt_state=state.opt_state, ema_shadow=state.ema,
                    meta={"step": step})
        text_epoch += 1                       # `train_vdm.py:689-691`
        if hasattr(text_loader, "sampler"):
            text_loader.sampler.set_epoch(text_epoch)
    if save_path is not None:
        Path(save_path).mkdir(parents=True, exist_ok=True)
        (Path(save_path) / "history.jsonl").write_text(
            "\n".join(json.dumps(h) for h in history))
    return state, history


def _save_image_grid(path: Path, imgs, cols: int = 7):
    """(decoded (1,H,W,3), rendered (V,H,W,3)) in [0,1] → one PNG grid —
    the file-based equivalent of the reference's wandb image log
    (`train_vdm.py:665-688`)."""
    import imageio.v2 as imageio

    decoded, rendered = imgs
    tiles = np.concatenate([np.asarray(decoded, np.float32),
                            np.asarray(rendered, np.float32)], axis=0)
    tiles = (np.clip(tiles, 0.0, 1.0) * 255.0).astype(np.uint8)
    n, h, w, c = tiles.shape
    cols = min(cols, n)
    rows = -(-n // cols)
    pad = rows * cols - n
    if pad:
        tiles = np.concatenate(
            [tiles, np.zeros((pad, h, w, c), np.uint8)], axis=0)
    grid = tiles.reshape(rows, cols, h, w, c).transpose(0, 2, 1, 3, 4) \
        .reshape(rows * h, cols * w, c)
    path.parent.mkdir(parents=True, exist_ok=True)
    imageio.imwrite(str(path), grid)


def build_reward_fns(root, *, pick_dir="pickscore", pe_dir="dfn5b",
                     rcfg=None, text_cfg=None):
    """In-framework reward scorers (`utils/reward.py:117-193` +
    `train_vdm.py:566-637`): PickScore (HF CLIP-H) and DFN5B (open_clip
    ViT-H-378) VISION towers carry the reward gradient; their TEXT towers
    produce the per-prompt features, frozen, via one small cached jit.

    Returns (reward_loss_fn, reward_text_fn) where
    reward_text_fn(prompt) → (pick_text, pe_text)."""
    import functools

    from vist3a_tpu.data.clip_tokenizer import CLIPTokenizer
    from vist3a_tpu.io import load_weights
    from vist3a_tpu.nn import clip as clip_mod
    from vist3a_tpu.train import reward as reward_mod

    from vist3a_tpu.io import manifests

    root = Path(root)
    pick_sd = load_weights.load_sharded_safetensors(root / pick_dir)
    pe_sd = load_weights.load_sharded_safetensors(root / pe_dir)
    rcfg = rcfg or reward_mod.RewardConfig()
    if rcfg.pick_cfg == reward_mod.RewardConfig().pick_cfg:
        # manifests describe the deployed towers; tiny test configs skip
        manifests.validate_state_dict(pick_sd, "pickscore")
        manifests.validate_state_dict(pe_sd, "dfn5b")
    pick = clip_mod.import_hf_clip_vision(pick_sd,
                                          rcfg.pick_cfg.num_layers)
    pe = clip_mod.import_open_clip_vision(pe_sd, rcfg.pe_cfg.num_layers)
    tcfg = text_cfg or clip_mod.CLIP_H_TEXT
    pick_text = clip_mod.import_hf_clip_text(pick_sd, tcfg.num_layers)
    pe_text = clip_mod.import_open_clip_text(pe_sd, tcfg.num_layers)
    # `pick_model.logit_scale.exp()` (`utils/reward.py:159-161`)
    logit_scale = float(np.exp(np.asarray(pick_sd["logit_scale"])))
    tokenizer = _clip_tokenizer_from_dir(root / pick_dir, CLIPTokenizer)

    loss_fn = reward_mod.make_loss_fn(pick, pe, logit_scale=logit_scale,
                                      cfg=rcfg)

    @functools.partial(jax.jit, static_argnums=())
    def _text_feats(pick_ids, pe_ids):
        return (clip_mod.text_features(pick_text, pick_ids, tcfg),
                clip_mod.text_features(pe_text, pe_ids, tcfg))

    @functools.lru_cache(maxsize=256)
    def reward_text_fn(prompt: str):
        # HF CLIP pads with EOT ('eos'); open_clip zero-pads — argmax-EOS
        # pooling is correct under both (see data/clip_tokenizer.py)
        pick_ids = jnp.asarray(
            tokenizer([prompt], tcfg.context_length, pad="eos"))
        pe_ids = jnp.asarray(
            tokenizer([prompt], tcfg.context_length, pad="zero"))
        return _text_feats(pick_ids, pe_ids)

    return loss_fn, reward_text_fn


def _clip_tokenizer_from_dir(model_dir, CLIPTokenizer):
    """vocab.json+merges.txt (HF layout) or the openai
    bpe_simple_vocab_16e6.txt(.gz) merges file (open_clip layout)."""
    model_dir = Path(model_dir)
    vocab, merges = model_dir / "vocab.json", model_dir / "merges.txt"
    if vocab.exists() and merges.exists():
        return CLIPTokenizer.from_files(str(vocab), str(merges))
    for name in ("bpe_simple_vocab_16e6.txt.gz", "bpe_simple_vocab_16e6.txt"):
        if (model_dir / name).exists():
            return CLIPTokenizer.from_openai_merges(str(model_dir / name))
    raise FileNotFoundError(
        f"no CLIP tokenizer files (vocab.json+merges.txt or openai bpe "
        f"merges) under {model_dir}")


place_dit = mesh_mod.place_dit   # re-export: pre-move callers/tests use
                                 # train_vdm.place_dit; canonical home is
                                 # core.mesh (inference_t23d calls it there)


def main(args):
    from transformers import AutoTokenizer

    from vist3a_tpu.cli.model_loading import (load_stitched_model,
                                              weights_root)
    from vist3a_tpu.data.loader import create_vdm_tuning_dataloader
    from vist3a_tpu.io import load_weights, weight_import
    from vist3a_tpu.nn import umt5 as umt5_mod
    from vist3a_tpu.nn import wan_dit
    from vist3a_tpu.nn.wan_vae import WanVAEConfig
    from vist3a_tpu.train import reward as reward_mod

    validate_vdm_args(training_vdm_argument(), args)
    root = weights_root(args)

    from vist3a_tpu.io import manifests

    stitched, scfg = load_stitched_model(args)
    dit = weight_import.import_wan_dit(manifests.validate_wan_dit(
        load_weights.load_sharded_safetensors(root / "wan_dit")))
    umt5_sd = load_weights.load_sharded_safetensors(root / "umt5")
    manifests.validate_state_dict(umt5_sd, "umt5_xxl")
    umt5 = weight_import.import_umt5(umt5_sd, umt5_mod.UMT5_XXL.num_layers)
    tokenizer = AutoTokenizer.from_pretrained(str(root / "umt5"))

    def embed_text(prompts):
        enc = tokenizer(prompts, padding="max_length", max_length=226,
                        truncation=True, add_special_tokens=True,
                        return_attention_mask=True, return_tensors="np")
        return umt5_mod.encode(umt5, jnp.asarray(enc["input_ids"]),
                               jnp.asarray(enc["attention_mask"]))

    reward_loss_fn, reward_text_fn = None, None
    if args.enable_rl:
        reward_loss_fn, reward_text_fn = build_reward_fns(root)

    # `--model_id` picks the DiT scale exactly like `cli/inference_t23d.py`
    # (reference: `utils/argument.py:400` → `train_vdm.py:323-343`; the
    # published VIST3A-14B rows come from reward-tuning the 14B)
    dit_cfg = wan_dit.config_from_model_id(args.model_id)

    # mesh: the reference's accelerate FSDP2 world (`train_vdm.py:296-310`)
    mesh = mesh_mod.mesh_from_args(args)
    args.batch_size = mesh_mod.local_batch_size(args.batch_size, mesh)
    dit = place_dit(dit, dit_cfg, mesh, args.dit_sharding)

    datasets = [(n, str(p)) for n, p in args.dataset]
    if args.text_dataset_path:
        datasets.append(("text", args.text_dataset_path))
    text_loader, _, video_loader, _ = create_vdm_tuning_dataloader(
        datasets, args, num_replicas=jax.process_count(),
        rank=jax.process_index())

    cfg = vdm.VDMTrainConfig(learning_rate=args.learning_rate,
                             weight_decay=args.weight_decay,
                             enable_rl=args.enable_rl)
    state = vdm.init_train_state(jax.random.key(args.global_seed), dit, cfg)
    # rank-0 metric/image stream (`train_vdm.py:651-688`): real wandb when
    # importable, JSONL fallback otherwise (PNG grids always written)
    from vist3a_tpu.core.wandb_log import make_run
    logger = make_run(args.wandb_logging, project=args.wandb_project_name,
                      run_name=args.exp_name, config=vars(args),
                      out_dir=args.save_path)
    try:
        run(state, dit, stitched["vae"], stitched, text_loader=text_loader,
            video_loader=video_loader, embed_text=embed_text,
            reward_loss_fn=reward_loss_fn, reward_text_fn=reward_text_fn,
            dit_cfg=dit_cfg,
            vae_cfg=WanVAEConfig(), scfg=scfg, cfg=cfg,
            num_steps=args.num_epochs * len(video_loader),
            save_path=args.save_path, save_freq=args.save_freq,
            key=jax.random.key(args.global_seed), mesh=mesh, logger=logger)
    finally:
        logger.finish()


if __name__ == "__main__":
    main(training_vdm_argument().parse_args())
