"""Data layer + CLI tests: preprocessing parity vs torch, dataset sampling
invariants on synthetic scene trees, sampler shard disjointness, parser
builders."""

import json
import os

import numpy as np
import pytest

from vist3a_tpu.cli import arguments as cli
from vist3a_tpu.data import datasets as ds
from vist3a_tpu.data import preprocessing as pp
from vist3a_tpu.data.loader import (BatchLoader, ShardedSampler,
                                    create_stitching_dataloader)


# --------------------------------------------------------------------------- #
# preprocessing parity vs torch                                               #
# --------------------------------------------------------------------------- #
def test_resize_shorter_crop_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    imgs = rng.random((3, 3, 100, 140), dtype=np.float32)

    def ref(images, target):
        t, c, h0, w0 = images.shape
        scale = target / min(h0, w0)
        nh, nw = round(h0 * scale), round(w0 * scale)
        x = F.interpolate(torch.from_numpy(images), size=(nh, nw),
                          mode="bilinear", align_corners=False)
        if nh > target:
            y0 = (nh - target) // 2
            x = x[:, :, y0:y0 + target, :]
        if nw > target:
            x0 = (nw - target) // 2
            x = x[:, :, :, x0:x0 + target]
        return x.numpy()

    got = pp.resize_shorter_crop_square_batch(imgs, 64)
    np.testing.assert_allclose(got, ref(imgs, 64), rtol=1e-4, atol=1e-5)
    assert got.shape == (3, 3, 64, 64)


def test_hue_jitter_roundtrip(rng):
    img = rng.random((1, 3, 8, 8), dtype=np.float32)
    back = pp._adjust_hue(pp._adjust_hue(img, 0.3), -0.3)
    np.testing.assert_allclose(back, img, atol=1e-5)
    same = pp._adjust_hue(img, 0.0)
    np.testing.assert_allclose(same, img, atol=1e-6)


def test_color_jitter_bounds(rng):
    img = rng.random((2, 3, 8, 8), dtype=np.float32)
    out = pp.color_jitter(np.random.default_rng(3), img)
    assert out.shape == img.shape
    assert (out >= 0).all() and (out <= 1).all()
    assert not np.allclose(out, img)


# --------------------------------------------------------------------------- #
# synthetic scene tree                                                        #
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def dl3dv_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("dl3dv")
    rng = np.random.default_rng(0)
    for batch, scene in [("1K", "scene_a"), ("1K", "scene_b")]:
        d = root / batch / scene / "images_4"
        d.mkdir(parents=True)
        for i in range(24):
            arr = rng.integers(0, 255, (40, 60, 3), np.uint8)
            Image.fromarray(arr).save(d / f"frame_{i:05d}.png")
    return root


def test_dl3dv_stitching_dataset(dl3dv_root):
    d = ds.DL3DVStitchingDataset(str(dl3dv_root), 5, 9,
                                 image_resolution=32,
                                 feedforward_image_resolution=28,
                                 color_augmentation=True)
    assert len(d) == 2
    rng = np.random.default_rng(1)
    s = d.get(0, rng)
    assert s["vae_image_tensor"].shape == (3, 5, 32, 32)
    assert s["feedforward_image_tensor"].shape == (3, 5, 28, 28)
    v = s["vae_image_tensor"]
    assert v.min() >= -1 - 1e-6 and v.max() <= 1 + 1e-6
    # deterministic per rng seed
    s2 = d.get(0, np.random.default_rng(1))
    np.testing.assert_array_equal(s["vae_image_tensor"],
                                  s2["vae_image_tensor"])


def test_dl3dv_text_paired_dataset(dl3dv_root, tmp_path):
    ann = [{"scene_name": "scene_a",
            "caption": {"cap_0_23": "a synthetic scene"}}]
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    d = ds.DL3DVTextPairedDataset(str(dl3dv_root), 4, 32,
                                  image_resolution=32,
                                  text_annotation_path=str(p))
    assert len(d) == 1          # scene_b filtered out
    s = d.get(0, np.random.default_rng(2))
    assert s["image_tensor"].shape == (3, 4, 32, 32)
    assert s["caption"] == "a synthetic scene"


def test_sharded_sampler_disjoint_and_complete():
    n, world = 103, 4
    shards = []
    for r in range(world):
        smp = ShardedSampler(n, world, r, shuffle=True, seed=22)
        smp.set_epoch(3)
        shards.append(smp.indices())
    per = -(-n // world)
    assert all(len(s) == per for s in shards)
    allidx = np.concatenate(shards)
    # padded total covers every sample at least once
    assert set(allidx.tolist()) == set(range(n))
    # different epochs shuffle differently
    smp = ShardedSampler(n, world, 0, shuffle=True, seed=22)
    smp.set_epoch(4)
    assert not np.array_equal(shards[0], smp.indices())


def test_batch_loader(dl3dv_root):
    import argparse

    args = argparse.Namespace(num_images_from_unit_scene=5,
                              num_frames_per_unit_scene=9, resolution=32,
                              feedforward_resolution=28, batch_size=2)
    loader, sampler = create_stitching_dataloader(
        [("dl3dv", str(dl3dv_root))], args, augmentation=False)
    sampler.set_epoch(0)
    batches = list(loader)
    assert len(batches) == len(loader) == 1    # 2 samples, bs 2, drop_last
    assert batches[0]["vae_image_tensor"].shape == (2, 3, 5, 32, 32)


def test_batch_loader_skip_first_batches():
    """Resume parity (`train_vdm.py:475-487`): the next epoch drops its
    first n batches WITHOUT loading them, then later epochs are whole."""
    class _Range:
        def get(self, idx, rng):
            return {"x": np.asarray([idx], np.int64)}

    smp = ShardedSampler(8, 1, 0, shuffle=False)
    loader = BatchLoader(_Range(), 2, smp, num_workers=1)
    full = [b["x"][:, 0].tolist() for b in loader]
    loader.skip_first_batches(3)
    skipped = [b["x"][:, 0].tolist() for b in loader]
    assert skipped == full[3:]
    assert [b["x"][:, 0].tolist() for b in loader] == full  # one-shot


# --------------------------------------------------------------------------- #
# CLI                                                                         #
# --------------------------------------------------------------------------- #
def test_parser_builders_and_defaults(tmp_path):
    p = cli.stitching_training_argument()
    args = p.parse_args([])
    assert args.learning_rate == 1e-4 and args.warmup_steps == 1000
    assert args.lora_config == "r8,a16,d0.05,f0"
    assert args.stitching_layer_config.out_channels == 1024
    assert args.stitching_layer_config.stride == (1, 2, 2)

    d = tmp_path / "data"
    d.mkdir()
    args = p.parse_args(["--dataset", f"dl3dv:{d}"])
    assert args.dataset == [("dl3dv", d)]

    with pytest.raises(SystemExit):
        p.parse_args(["--dataset", "nopath:/does/not/exist"])

    vdm = cli.training_vdm_argument()
    a = vdm.parse_args([])
    assert a.num_frames_per_unit_scene == 32 and a.model_id.startswith("Wan")
    a2 = vdm.parse_args(["--num_frames_per_unit_scene", "16"])
    with pytest.raises(SystemExit):
        cli.validate_vdm_args(vdm, a2)

    inf = cli.inference_vist3a_argument()
    a3 = inf.parse_args(["--checkpoint_path", "x", "--transformer_lora_path",
                         "y", "--input_texts_path", "z"])
    assert a3.flow_shift == 5 and a3.cfg_scale == "7.5"
    assert a3.num_frames == 13

    # remaining builders construct without error
    cli.find_layer_stitching_argument()
    cli.stitching_nvs_evaluation_argument()
