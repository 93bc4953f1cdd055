"""RE10K novel-view-synthesis bench: two-pass inference + scale alignment +
target-view rendering + per-sequence metrics.

Parity target: `evaluation/novel_view_synthesis_bench/nvs_eval.py` —
  * targets = last 4 ids reversed (:180);
  * pass 1: context views (last one DUPLICATED, :93-99) through the stitched
    model → Gaussians + context poses;
  * pass 2: context+target views → all poses; translations scale-aligned by
    the ratio of mean translations (:131-140);
  * render target views at 448², near .01 / far 100 (:144-151);
  * gt/pred PNGs per sequence; `calculate_metric.py` aggregates
    PSNR/SSIM/LPIPS into per-sequence and overall CSVs.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from vist3a_tpu.nn.splat_decoder import render
from vist3a_tpu.stitch import chopped_anysplat as ca


def target_view_indices(ids) -> list[int]:
    """last 4 ids, reversed (`nvs_eval.py:180`)."""
    return list(range(len(ids)))[::-1][:4]


def inference_nvs(params: dict, images01: np.ndarray, vae_images01: np.ndarray,
                  target_view_index: list[int], scfg: ca.StitchedConfig, *,
                  render_hw=(448, 448), pair_budget: int | None = None,
                  forward_fn=None):
    """images01: (V,3,h,w) feedforward-size frames in [0,1]; vae_images01:
    (V,3,H,W) VAE-size.  Returns predicted target views (T,3,H',W') in [0,1].

    forward_fn(vae_pm1 (1,3,S,H,W), ff_pm1 (1,3,S,h,w)) → EncoderOutput;
    defaults to the pixel-input stitched forward
    (`ca.forward_from_video`)."""
    if forward_fn is None:
        def forward_fn(vae_pm1, ff_pm1):
            return ca.forward_from_video(params, vae_pm1, ff_pm1, scfg)

    v = images01.shape[0]
    source = [i for i in range(v) if i not in target_view_index]

    def stack(arr, idx, dup_last):
        sel = arr[idx]
        if dup_last:
            sel = np.concatenate([sel, sel[-1:]], axis=0)
        # (S,3,H,W) → (1,3,S,H,W) in [−1,1]
        return jnp.asarray(sel.transpose(1, 0, 2, 3)[None] * 2.0 - 1.0)

    # pass 1: context only (+dup last) → Gaussians + context poses
    ctx_out = forward_fn(stack(vae_images01, source, True),
                         stack(images01, source, True))
    n_ctx = len(source) + 1

    # pass 2: context(+dup) + targets → all poses
    order = source + [source[-1]] + list(target_view_index)
    all_out = forward_fn(stack(vae_images01, order, False),
                         stack(images01, order, False))

    all_ex = np.asarray(all_out.extrinsic_c2w)
    all_k = np.asarray(all_out.intrinsic_norm)
    ctx_ex_pass2 = all_ex[:, :n_ctx]
    tgt_ex = all_ex[:, n_ctx:].copy()
    tgt_k = all_k[:, n_ctx:]

    # translation scale alignment (`nvs_eval.py:131-140`)
    scale = (np.asarray(ctx_out.extrinsic_c2w)[:, :, :3, 3].mean()
             / ctx_ex_pass2[:, :, :3, 3].mean())
    tgt_ex[..., :3, 3] *= scale

    out = render(ctx_out.gaussians, jnp.asarray(tgt_ex), jnp.asarray(tgt_k),
                 render_hw, pair_budget=pair_budget)
    return np.asarray(out.color[0])


def save_image(img01: np.ndarray, path) -> None:
    """(3,H,W) [0,1] → PNG."""
    from PIL import Image

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = (np.clip(img01.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def run_nvs_bench(params, dataset, seq_id_map: dict, scfg, output_dir, *,
                  render_hw=(448, 448), forward_fn=None,
                  pair_budget: int | None = None):
    """Per-sequence gt/pred PNG dump (`nvs_eval.py:156-196`)."""
    for seq_name in dataset.sequence_list:
        if seq_name not in seq_id_map:
            continue
        ids = seq_id_map[seq_name]
        batch = dataset.get_data(sequence_name=seq_name, ids=ids)
        tgt_idx = target_view_indices(ids)
        preds = inference_nvs(params, batch["images"], batch["vae_images"],
                              tgt_idx, scfg, render_hw=render_hw,
                              forward_fn=forward_fn,
                              pair_budget=pair_budget)
        base = Path(output_dir) / "images" / seq_name
        for i, t in enumerate(tgt_idx):
            save_image(batch["images"][t], base / "gt" / f"{i:0>6}.png")
            save_image(preds[i], base / "pred" / f"{i:0>6}.png")


def compute_metrics_for_dir(images_dir, *, lpips_params=None) -> dict:
    """`calculate_metric.py`: per-image PSNR/SSIM(/LPIPS) over saved PNGs →
    per-sequence CSV rows + overall means."""
    from PIL import Image

    from vist3a_tpu.eval.metrics import (compute_lpips, compute_psnr,
                                         compute_ssim)

    rows = []
    images_dir = Path(images_dir)
    for seq_dir in sorted(p for p in images_dir.iterdir() if p.is_dir()):
        gts, preds = [], []
        for gt_path in sorted((seq_dir / "gt").glob("*.png")):
            pred_path = seq_dir / "pred" / gt_path.name
            gts.append(np.asarray(Image.open(gt_path), np.float32)
                       .transpose(2, 0, 1) / 255.0)
            preds.append(np.asarray(Image.open(pred_path), np.float32)
                         .transpose(2, 0, 1) / 255.0)
        gt = jnp.asarray(np.stack(gts))
        pred = jnp.asarray(np.stack(preds))
        row = {"sequence": seq_dir.name,
               "psnr": float(jnp.mean(compute_psnr(gt, pred))),
               "ssim": float(jnp.mean(compute_ssim(gt, pred)))}
        if lpips_params is not None:
            row["lpips"] = float(jnp.mean(
                compute_lpips(lpips_params, gt, pred)))
        rows.append(row)

    overall = {k: float(np.mean([r[k] for r in rows]))
               for k in rows[0] if k != "sequence"}
    return {"per_sequence": rows, "overall": overall}


def write_metric_csvs(result: dict, output_dir) -> None:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows = result["per_sequence"]
    with open(out / "per_sequence.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    with open(out / "overall.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(result["overall"].keys()))
        w.writeheader()
        w.writerow(result["overall"])
