"""Text → 3D-Gaussian-Splat inference pipeline.

Parity target: `inference_t23d.py:51-166` — per prompt:
  1. orbit prompt template + fixed negative prompt (verbatim strings below);
  2. Wan denoise: 50-step UniPC flow sampler with CFG at 512², 13 frames,
     seed 12413 (`:63`), latent output;
  3. un-normalize latents by mean/std (`:105-113`), Wan-VAE decode to video;
  4. trilinear (align_corners=FALSE, `:119-123`) resize to (T, 448, 448) as
     the feedforward image;
  5. stitched decoder `forward_with_latent` → Gaussians + context poses;
  6. orbit video via camera interpolation + PLY export (DC only).

Text embeddings come from `vist3a_tpu.nn.umt5`; tokenization is injected as
a callable (ids, mask) so the HF tokenizer is only needed when real weights
are in play.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from vist3a_tpu.diffusion import unipc
from vist3a_tpu.nn import umt5 as umt5_mod
from vist3a_tpu.nn import wan_dit, wan_vae
from vist3a_tpu.nn.encoder import EncoderConfig
from vist3a_tpu.stitch import chopped_anysplat as ca

# `inference_t23d.py:88`
ORBIT_PROMPT_TEMPLATE = (
    "The camera rotates around the scene, maintaining constant distance: "
    "`{prompt}`. The orbiting trajectory captures 3D structure and "
    "consistency."
)
# `inference_t23d.py:90-92`
NEGATIVE_PROMPT = (
    "Background blur, Blurred background, Blurred scene, Artifacts, not "
    "aesthetic, not realistic, rendered noise, low quality movement, low "
    "quality video, low quality image, deformed, disfigured, distorted, "
    "extra limbs, cloned face, skinny, glitchy, double torso, extra arms, "
    "extra hands, mangled fingers, missing lips, ugly face, distorted legs, "
    "fused fingers, too many fingers, long neck"
)


@dataclasses.dataclass(frozen=True)
class T23DConfig:
    width: int = 512
    height: int = 512
    num_frames: int = 13
    num_inference_steps: int = 50
    guidance_scale: float = 5.0
    flow_shift: float = 3.0
    seed: int = 12413                       # `inference_t23d.py:63`
    dit: wan_dit.WanDiTConfig = wan_dit.WAN_1_3B
    umt5: umt5_mod.UMT5Config = umt5_mod.UMT5_XXL
    vae: wan_vae.WanVAEConfig = wan_vae.WanVAEConfig()
    # bf16 DPT-head activations on the inference decode (the trunk is bf16
    # already; the heads' MXU products are single-pass bf16 in either mode —
    # bf16 storage only halves the 448²-temp HBM traffic; measured deviation
    # documented at `EncoderConfig.head_dtype` / PARITY.md)
    stitched: ca.StitchedConfig = ca.StitchedConfig(
        encoder=EncoderConfig(head_dtype="bfloat16"))
    feedforward_size: int = 448

    @property
    def latent_shape(self) -> tuple:
        t_lat = (self.num_frames - 1) // 4 + 1
        return (1, 16, t_lat, self.height // 8, self.width // 8)


def embed_prompts(umt5_params, tokenize: Callable, prompt: str,
                  cfg: T23DConfig):
    """tokenize(text) → (ids (1,226), mask (1,226)).  Returns (cond, uncond)
    embeddings, orbit template + negative prompt applied."""
    ids_c, mask_c = tokenize(ORBIT_PROMPT_TEMPLATE.format(prompt=prompt))
    ids_u, mask_u = tokenize(NEGATIVE_PROMPT)
    cond = umt5_mod.encode(umt5_params, jnp.asarray(ids_c),
                           jnp.asarray(mask_c), cfg.umt5)
    uncond = umt5_mod.encode(umt5_params, jnp.asarray(ids_u),
                             jnp.asarray(mask_u), cfg.umt5)
    return cond, uncond


@functools.lru_cache(maxsize=8)
def _denoise_jit(cfg: T23DConfig):
    """The jitted 50-step program, cached per config — rebuilding the jit
    closure per call re-traces the whole scan (~6 s at the 1.3B shape) even
    when the compiled executable is cache-hit."""
    ucfg = unipc.UniPCConfig(num_steps=cfg.num_inference_steps,
                             shift=cfg.flow_shift)

    @jax.jit
    def run(dit_params, latents0, cond, uncond):
        # DiT computes in the params' dtype (bf16 deployed — the reference
        # runs WanPipeline bf16, `train_vdm.py:332`); sampler state stays
        # fp32. Without this boundary cast the fp32 scan carry upcasts
        # every DiT matmul to fp32.
        dt = jax.tree_util.tree_leaves(dit_params)[0].dtype

        def dit_apply(x, ts, text):
            v = wan_dit.forward(dit_params, x.astype(dt), ts,
                                text.astype(dt), cfg.dit, remat=False)
            return v.astype(jnp.float32)

        model_fn = unipc.cfg_model(dit_apply, cond, uncond,
                                   cfg.guidance_scale)
        return unipc.sample_scan(model_fn, latents0, ucfg)

    return run


def denoise(dit_params, cond, uncond, cfg: T23DConfig,
            key: jax.Array | None = None, *, latents0=None, mesh=None):
    """UniPC CFG denoise → pipeline-space (normalized) latents.

    The WHOLE 50-step loop is one `lax.scan` jit (`unipc.sample_scan`) —
    a single compiled program instead of 50 host dispatches; 187 ms/step
    measured at the 1.3B CFG-pair shape (identical to the bare forward —
    the scan adds nothing).

    mesh: when given, activations are replicated over it and the DiT runs
    with whatever placement `dit_params` carries (TP via
    `core.mesh.place_dit` — the only way 14B fits: GSPMD inserts one
    all-reduce per attn/MLP pair on the "model" axis)."""
    if latents0 is None:
        key = jax.random.key(cfg.seed) if key is None else key
        latents0 = jax.random.normal(key, cfg.latent_shape, jnp.float32)
    if mesh is not None:
        from vist3a_tpu.core import mesh as mesh_mod

        latents0, cond, uncond = mesh_mod.replicate(
            mesh, (latents0, cond, uncond))
        # trace under the mesh context: the Pallas kernels' shard_map
        # wrappers pick the ambient mesh up at trace time
        # (`kernels/partitioning.py`) — without it a multi-chip TPU
        # lowering of the flash-attention custom call fails
        with mesh:
            return _denoise_jit(cfg)(dit_params, latents0, cond, uncond)
    return _denoise_jit(cfg)(dit_params, latents0, cond, uncond)


def resize_trilinear_half_pixel(video, size_hw: tuple[int, int]):
    """F.interpolate(..., mode='trilinear', align_corners=False) for a
    (B,3,T,H,W) video with T unchanged (`inference_t23d.py:118-123`):
    half-pixel linear resize == jax.image.resize 'linear'."""
    b, c, t, _, _ = video.shape
    return jax.image.resize(video, (b, c, t, *size_hw), method="linear")


@functools.lru_cache(maxsize=8)
def _decode_jit(cfg: T23DConfig, return_video: bool):
    """Jitted decode+reconstruct, cached per config — the eager form
    materializes every intermediate (no fusion), which both OOMs a 16 GB
    chip next to the resident DiT and runs dispatch-bound."""
    return jax.jit(functools.partial(decode_and_reconstruct, cfg=cfg,
                                     return_video=return_video))


def decode_and_reconstruct(params, latents_norm, cfg: T23DConfig, *,
                           return_video: bool = True):
    """params: {"vae", "stitch_conv", "encoder"}.  latents_norm: pipeline
    output.  Returns (EncoderOutput, decoded video in [−1,1] or None).

    The VAE decode runs bf16 — the reference's inference VAE is bf16 too
    (`WanPipeline.from_pretrained(torch_dtype=bf16)`, `inference_t23d.py:
    73`); the stitched decoder consumes the un-normalized latents directly,
    so only the exported video and the RGB-skip input see VAE precision."""
    latents = wan_vae.unnormalize_latents(latents_norm)
    video = wan_vae.decode(params["vae"], latents.astype(jnp.bfloat16),
                           cfg.vae).astype(jnp.float32)
    feedforward = resize_trilinear_half_pixel(
        video, (cfg.feedforward_size, cfg.feedforward_size))
    out = ca.forward_with_latent(params, latents, feedforward, cfg.stitched,
                                 remat=False)
    return out, (video if return_video else None)


@functools.lru_cache(maxsize=8)
def _decode_export_jit(cfg: T23DConfig):
    """Decode to exactly what export needs: (gaussians, extrinsic_c2w,
    intrinsic_norm).  The full EncoderOutput adds ~1 GB of outputs the
    export never reads (the anchor_feats relayout above all), which is the
    margin between fitting and OOM next to the resident 1.3B DiT on a
    16 GB chip — unused outputs and their producing ops are DCE'd here."""

    @jax.jit
    def run(params, latents_norm):
        out, _ = decode_and_reconstruct(params, latents_norm, cfg,
                                        return_video=False)
        return out.gaussians, out.extrinsic_c2w, out.intrinsic_norm

    return run


def export_artifacts(gaussians, extrinsic_c2w, intrinsic_norm,
                     save_path: str, image_shape=(448, 448),
                     *, orbit_t: int = 10, pair_budget: int | None = None):
    """Orbit video (gs.mp4 + depth.mp4) and gaussians.ply, like
    `inference_t23d.py:140-166`."""
    import os

    import numpy as np

    from vist3a_tpu.io.ply_export import export_ply
    from vist3a_tpu.io.video_export import save_interpolated_video

    g = gaussians
    paths = save_interpolated_video(
        np.asarray(extrinsic_c2w), np.asarray(intrinsic_norm), g,
        image_shape, save_path, t=orbit_t, pair_budget=pair_budget)
    ply_path = export_ply(
        g.means[0], g.scales[0], g.rotations[0], g.harmonics[0],
        g.opacities[0], os.path.join(save_path, "gaussians.ply"),
        save_sh_dc_only=True)
    return paths + (str(ply_path),)


def text_to_3dgs(params: dict, tokenize: Callable, prompt: str,
                 save_path: str, cfg: T23DConfig = T23DConfig(),
                 key: jax.Array | None = None, *, orbit_t: int = 10,
                 mesh=None):
    """Full pipeline.  params: {"umt5", "dit", "vae", "stitch_conv",
    "encoder"}.  Returns ((gaussians, extrinsic_c2w, intrinsic_norm),
    artifact paths) — the slim export bundle; use
    `decode_and_reconstruct` for the full EncoderOutput (its extra ~1 GB
    of outputs does not fit next to the resident DiT on a 16 GB chip).

    mesh: run the denoise stage sharded (TP 14B — see `denoise`); the
    decode stage stays wherever its params live (the 4 MB latent hops
    devices through the host, which is noise next to the decode itself)."""
    cond, uncond = embed_prompts(params["umt5"], tokenize, prompt, cfg)
    latents_norm = denoise(params["dit"], cond, uncond, cfg, key, mesh=mesh)
    if mesh is not None:
        latents_norm = jnp.asarray(np.asarray(latents_norm))
    dec_params = {k: params[k] for k in ("vae", "stitch_conv", "encoder")}
    gaussians, extr, intr = _decode_export_jit(cfg)(dec_params, latents_norm)
    paths = export_artifacts(gaussians, extr, intr, save_path,
                             (cfg.feedforward_size, cfg.feedforward_size),
                             orbit_t=orbit_t)
    return (gaussians, extr, intr), paths
