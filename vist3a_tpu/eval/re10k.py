"""RE10K novel-view-synthesis evaluation dataset (host-side, numpy/PIL).

Parity target: `evaluation/datasets/re10k_nvs.py` — per-sequence
`annotations.json` with {idx, filepath, intrinsics, extrinsics}; metadata
cached as .npy (:106-145); `rescale_image_w_crop` (:25-86): Lanczos resize
shorter side → VAE size, center crop square, second resize to feedforward
size, intrinsics rescaled with the pixel-center (+0.5) convention at each
stage; `get_data` (:177-227) returns images (feedforward), vae_images,
intrinsics, extrinsics for the requested frame ids.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Iterable, Optional

import numpy as np


def rescale_image_w_crop(image, intrinsic: np.ndarray, output_width_1: int,
                         output_width_2: int, pixel_center: bool = True):
    """PIL image + 3×3 intrinsic → (feedforward image, intrinsic, vae image),
    exactly `re10k_nvs.py:25-86` (note: the reference reads (H, W) from
    `image.size`, which PIL returns as (W, H) — the scale uses min(), so the
    square output is unaffected)."""
    from PIL import Image

    h, w = map(float, image.size)
    scale = output_width_1 / min(h, w)
    new_h = round(image.size[1] * scale)
    new_w = round(image.size[0] * scale)
    image_first = image.resize((new_w, new_h), resample=Image.LANCZOS)

    intrinsic = np.array(intrinsic, np.float64)
    if pixel_center:
        intrinsic[0, 2] += 0.5
        intrinsic[1, 2] += 0.5
    intrinsic[:2, :] *= scale
    if pixel_center:
        intrinsic[0, 2] -= 0.5
        intrinsic[1, 2] -= 0.5

    x0 = max((new_w - output_width_1) // 2, 0)
    y0 = max((new_h - output_width_1) // 2, 0)
    image_first = image_first.crop((x0, y0, x0 + output_width_1,
                                    y0 + output_width_1))
    intrinsic = intrinsic.copy()
    intrinsic[0, 2] -= x0
    intrinsic[1, 2] -= y0

    h2, w2 = map(float, image_first.size)
    scale2 = output_width_2 / min(h2, w2)
    image_second = image_first.resize(
        (round(image_first.size[0] * scale2),
         round(image_first.size[1] * scale2)), resample=Image.LANCZOS)
    if pixel_center:
        intrinsic[0, 2] += 0.5
        intrinsic[1, 2] += 0.5
    intrinsic[:2, :] *= scale2
    if pixel_center:
        intrinsic[0, 2] -= 0.5
        intrinsic[1, 2] -= 0.5
    return image_second, intrinsic, image_first


class Re10KNVSDataset:
    def __init__(self, re10k_dir, split: str = "test",
                 load_img_size: int = 512, feedforward_img_size: int = 448,
                 sort_by_filename: bool = False,
                 cache_file: str | None = None, seq_file: str | None = None):
        if split != "test":
            raise ValueError("We don't want to train on Re10K")
        self.re10k_dir = re10k_dir
        self.load_img_size = load_img_size
        self.feedforward_img_size = feedforward_img_size
        self.sort_by_filename = sort_by_filename

        if cache_file and osp.exists(cache_file):
            self.metadata = np.load(cache_file, allow_pickle=True).item()
            self.sequence_list = sorted(self.metadata.keys())
            return

        if seq_file is not None:
            with open(seq_file) as f:
                self.sequence_list = [x.strip() for x in f if x.strip()]
        else:
            self.sequence_list = sorted(os.listdir(re10k_dir))

        self.metadata = {}
        for seq in self.sequence_list:
            anno_path = osp.join(re10k_dir, seq, "annotations.json")
            try:
                with open(anno_path) as f:
                    annos = json.load(f)
            except Exception:
                continue
            self.metadata[seq] = [
                {"idx": a["idx"], "filepath": a["filepath"],
                 "intrinsics": np.asarray(a["intrinsics"], np.float64),
                 "extrinsics": np.asarray(a["extrinsics"], np.float64)}
                for a in annos]
        self.sequence_list = sorted(self.metadata.keys())
        if cache_file:
            np.save(cache_file, self.metadata)   # idempotent cache

    def __len__(self):
        return len(self.sequence_list)

    def get_seq_framenum(self, sequence_name: str) -> int:
        return len(self.metadata[sequence_name])

    def get_data(self, sequence_name: Optional[str] = None,
                 index: Optional[int] = None,
                 ids: Optional[Iterable] = None) -> dict:
        from PIL import Image

        if sequence_name is None:
            sequence_name = self.sequence_list[index]
        metadata = self.metadata[sequence_name]
        if ids is None:
            ids = np.arange(len(metadata))
        annos = [metadata[i] for i in ids]
        if self.sort_by_filename:
            annos = sorted(annos, key=lambda x: x["filepath"])

        images, vae_images = [], []
        extr = np.broadcast_to(np.eye(4), (len(annos), 4, 4)).copy()
        intr = np.broadcast_to(np.eye(3), (len(annos), 3, 3)).copy()
        paths = []
        for i, anno in enumerate(annos):
            impath = osp.join(self.re10k_dir, anno["filepath"])
            with Image.open(impath) as img:
                ff, k, vae = rescale_image_w_crop(
                    img.convert("RGB"), anno["intrinsics"],
                    self.load_img_size, self.feedforward_img_size)
            images.append(np.asarray(ff, np.float32).transpose(2, 0, 1)
                          / 255.0)
            vae_images.append(np.asarray(vae, np.float32).transpose(2, 0, 1)
                              / 255.0)
            ex = np.asarray(anno["extrinsics"], np.float64)
            if ex.shape != (4, 4):       # 3×4 annotations → homogeneous
                ex = np.vstack([ex, [0, 0, 0, 1]])
            extr[i] = ex
            intr[i] = k
            paths.append(impath)
        return {
            "seq_id": sequence_name, "n": len(metadata),
            "ind": np.asarray(list(ids)), "image_paths": paths,
            "extrs": extr.astype(np.float32),
            "intrs": intr.astype(np.float32),
            "images": np.stack(images),
            "vae_images": np.stack(vae_images),
        }
