"""Entry point: stitching-layer search.

Parity target: `find_layer_for_stitching.py:246-373` — extract per-block
features + VAE latents (idempotently cached), fit a ridge conv3d per
candidate block, write `state_dict_enc_blocks_k.npz` + `mse_enc_blocks_k.txt`
per layer, recommend the argmin-MSE block.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from vist3a_tpu.cli.arguments import find_layer_stitching_argument
from vist3a_tpu.io import checkpoints as ckpt
from vist3a_tpu.nn import wan_vae
from vist3a_tpu.search import ridge


def run(vit_params, vae_params, vit_cfg, vae_cfg, conv_spec, loader, *,
        feature_save_path, iterations: int, key=jax.random.key(0),
        ridge_lambda: float = 1e-4):
    """The search.  Returns (best_layer_name, {layer: mse})."""
    save = Path(feature_save_path)
    save.mkdir(parents=True, exist_ok=True)
    feat_file = save / "features.npz"

    if feat_file.exists():
        cached = np.load(feat_file, allow_pickle=True)
        vae_feats = cached["vae_features"]
        ff_feats = {k: cached[k] for k in cached.files
                    if k.startswith("enc_blocks_")}
    else:
        vae_list, ff_lists = [], {}
        for step, batch in enumerate(loader):
            if step >= iterations:
                break
            vae_pm1 = jnp.asarray(batch["vae_image_tensor"])
            ff_pm1 = jnp.asarray(batch["feedforward_image_tensor"])
            mu, logvar = wan_vae.encode(vae_params, vae_pm1, vae_cfg)
            z = wan_vae.sample_posterior(
                jax.random.fold_in(key, step), mu, logvar)
            vae_list.append(np.asarray(z, np.float16))
            images01 = jnp.swapaxes((ff_pm1 + 1.0) * 0.5, 1, 2)
            feats = ridge.extract_block_features(vit_params, images01,
                                                 vit_cfg)
            for i, f in enumerate(feats):
                ff_lists.setdefault(f"enc_blocks_{i + 1}", []).append(
                    np.asarray(f, np.float16))
        vae_feats = np.concatenate(vae_list, axis=0)
        ff_feats = {k: np.concatenate(v, axis=0) for k, v in ff_lists.items()}
        np.savez(feat_file, vae_features=vae_feats, **ff_feats)

    mses = {}
    for layer_key, feats in sorted(ff_feats.items()):
        sd_file = save / f"state_dict_{layer_key}.npz"
        mse_file = save / f"mse_{layer_key}.txt"
        if mse_file.exists() and sd_file.exists():
            mses[layer_key] = float(mse_file.read_text().strip())
            continue
        # flatten (N,S,P,D) features to per-sample (S, P, D) targets and
        # latents (N,C,T,h,w) to per-sample (C,T,h,w)
        z_batches = [vae_feats[i].astype(np.float64)
                     for i in range(vae_feats.shape[0])]
        y_batches = [feats[i].astype(np.float64)
                     for i in range(feats.shape[0])]
        params, mse = ridge.fit_conv3d_streaming(conv_spec, z_batches,
                                                 y_batches,
                                                 ridge=ridge_lambda)
        ckpt.save_search_artifact(sd_file, params)
        mse_file.write_text(f"{mse}\n")
        mses[layer_key] = mse

    best = ridge.rank_layers(mses)
    print(f"Best stitching layer: {best} with MSE: {mses[best]}")
    return best, mses


def main(args):
    from vist3a_tpu.cli.model_loading import (load_anysplat_encoder,
                                              load_wan_vae_params,
                                              weights_root)
    from vist3a_tpu.data.loader import create_stitching_dataloader
    from vist3a_tpu.nn.vit import VIT_LARGE
    from vist3a_tpu.nn.wan_vae import WanVAEConfig

    root = weights_root(args)
    encoder = load_anysplat_encoder(root)
    vae = load_wan_vae_params(root)
    loader, _ = create_stitching_dataloader(
        [(n, str(p)) for n, p in args.dataset], args, augmentation=False)
    run(encoder["vit"], vae, VIT_LARGE, WanVAEConfig(),
        args.stitching_layer_config, loader,
        feature_save_path=args.feature_save_path,
        iterations=args.iterations_for_feature_extraction)


if __name__ == "__main__":
    main(find_layer_stitching_argument().parse_args())
