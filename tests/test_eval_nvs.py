"""Eval suite: metric invariants, RE10K preprocessing math, NVS bench
end-to-end on a synthetic RE10K tree with the tiny stitched model."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_stitched_model import tiny_encoder_cfg
from vist3a_tpu.eval import metrics, nvs, re10k
from vist3a_tpu.nn import encoder as enc_mod
from vist3a_tpu.stitch import chopped_anysplat as ca


# --------------------------------------------------------------------------- #
# metrics                                                                     #
# --------------------------------------------------------------------------- #
def test_psnr(rng):
    x = jnp.asarray(rng.random((2, 3, 16, 16), dtype=np.float32))
    assert np.isposinf(np.asarray(metrics.compute_psnr(x, x))).all()
    y = jnp.clip(x + 0.1, 0, 1)
    p = np.asarray(metrics.compute_psnr(x, y))
    assert (p > 15).all() and (p < 25).all()     # ~20 dB for 0.1 offset


def test_ssim_invariants(rng):
    x = jnp.asarray(rng.random((2, 3, 32, 32), dtype=np.float32))
    one = np.asarray(metrics.compute_ssim(x, x))
    np.testing.assert_allclose(one, 1.0, atol=1e-5)
    noisy = jnp.clip(x + 0.3 * jnp.asarray(
        rng.standard_normal((2, 3, 32, 32), np.float32)), 0, 1)
    s = np.asarray(metrics.compute_ssim(x, noisy))
    assert (s < 0.9).all() and (s > -1).all()
    # symmetry
    np.testing.assert_allclose(np.asarray(metrics.compute_ssim(x, noisy)),
                               np.asarray(metrics.compute_ssim(noisy, x)),
                               atol=1e-5)
    # constant-shift robustness: high SSIM for pure luminance shift
    shifted = jnp.clip(x * 0.9 + 0.05, 0, 1)
    assert (np.asarray(metrics.compute_ssim(x, shifted)) > 0.85).all()


def test_lpips_structure(rng):
    params = metrics.lpips_init(jax.random.key(0))
    x = jnp.asarray(rng.random((1, 3, 32, 32), dtype=np.float32))
    zero = np.asarray(metrics.compute_lpips(params, x, x))
    np.testing.assert_allclose(zero, 0.0, atol=1e-6)
    y = jnp.asarray(rng.random((1, 3, 32, 32), dtype=np.float32))
    assert float(metrics.compute_lpips(params, x, y)[0]) > 0


def test_rescale_image_w_crop_intrinsics():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8))
    k = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
    ff, k2, vae = re10k.rescale_image_w_crop(img, k, 64, 56)
    assert vae.size == (64, 64) and ff.size == (56, 56)
    # principal point stays at the image center through both stages
    np.testing.assert_allclose(k2[0, 2], (56 - 1) / 2 + 0.0, atol=1.0)
    np.testing.assert_allclose(k2[1, 2], (56 - 1) / 2 + 0.0, atol=1.0)
    # focal scaled by 64/120 then 56/64 = 56/120
    np.testing.assert_allclose(k2[0, 0], 200 * 56 / 120, rtol=1e-6)


@pytest.fixture(scope="module")
def re10k_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("re10k")
    rng = np.random.default_rng(1)
    for seq in ["seq_a", "seq_b"]:
        d = root / seq
        (d / "images").mkdir(parents=True)
        annos = []
        for i in range(8):
            name = f"images/frame_{i:04d}.png"
            Image.fromarray(rng.integers(0, 255, (72, 96, 3), np.uint8)
                            ).save(d / name)
            annos.append({
                "idx": i, "filepath": f"{seq}/{name}",
                "intrinsics": [[120.0, 0, 48], [0, 120.0, 36], [0, 0, 1]],
                "extrinsics": np.eye(4)[:3].tolist(),
            })
        (d / "annotations.json").write_text(json.dumps(annos))
    return root


def test_re10k_dataset(re10k_root):
    d = re10k.Re10KNVSDataset(str(re10k_root), load_img_size=64,
                              feedforward_img_size=56)
    assert len(d) == 2
    batch = d.get_data(sequence_name="seq_a", ids=[0, 1, 2, 3, 4, 5, 6, 7])
    assert batch["images"].shape == (8, 3, 56, 56)
    assert batch["vae_images"].shape == (8, 3, 64, 64)
    assert batch["extrs"].shape == (8, 4, 4)
    assert nvs.target_view_indices(list(range(8))) == [7, 6, 5, 4]


def test_nvs_bench_end_to_end(re10k_root, tmp_path):
    """Full bench on the tiny stitched model via the latent-free pixel path
    with a tiny VAE."""
    from vist3a_tpu.nn import wan_vae

    vcfg = wan_vae.WanVAEConfig(base_dim=8, z_dim=16, num_res_blocks=1)
    scfg = ca.StitchedConfig(encoder=tiny_encoder_cfg(),
                             stitch_layer_index=2,
                             conv_spec="conv3d_k5x3x3_o32_s1x2x2_p2x1x1",
                             vae=vcfg)
    params = {
        "encoder": enc_mod.init(jax.random.key(0), scfg.encoder),
        "stitch_conv": ca.init_stitch_conv(jax.random.key(1), scfg),
        "vae": wan_vae.init(jax.random.key(2), vcfg),
    }
    dataset = re10k.Re10KNVSDataset(str(re10k_root), load_img_size=64,
                                    feedforward_img_size=56)
    # 8 ids → 4 context + 1 dup = 5 frames ≡ 1 (mod 4), the Wan temporal rate
    seq_id_map = {"seq_a": [0, 1, 2, 3, 4, 5, 6, 7]}

    nvs.run_nvs_bench(params, dataset, seq_id_map, scfg,
                      tmp_path / "out", render_hw=(56, 56))
    out = tmp_path / "out" / "images" / "seq_a"
    assert len(list((out / "gt").glob("*.png"))) == 4
    assert len(list((out / "pred").glob("*.png"))) == 4

    result = nvs.compute_metrics_for_dir(tmp_path / "out" / "images")
    assert "psnr" in result["overall"] and "ssim" in result["overall"]
    assert np.isfinite(result["overall"]["psnr"])
    nvs.write_metric_csvs(result, tmp_path / "csv")
    assert (tmp_path / "csv" / "overall.csv").exists()
