"""Entry point: text → 3DGS inference.

Parity target: `inference_t23d.py:51-166` — prompt list sharded over
processes (`prompt_list[rank::world]`, :62), fixed seed 12413, 50-step UniPC
with `--flow_shift` and `--cfg_scale`, per-prompt output folder with
prompt.txt, orbit gs.mp4 + depth.mp4, gaussians.ply (DC only).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

from vist3a_tpu.cli.arguments import inference_vist3a_argument
from vist3a_tpu.pipelines import t23d


def run(params: dict, tokenize, prompts: list[str], output_dir: str,
        cfg: t23d.T23DConfig, *, process_index: int = 0,
        process_count: int = 1, orbit_t: int = 10, mesh=None):
    """Shard prompts over processes and run the pipeline per prompt.
    `mesh`: denoise runs sharded (TP DiT — mandatory at 14B)."""
    results = []
    for prompt in prompts[process_index::process_count]:
        save = Path(output_dir) / prompt[:100].replace("/", "")
        save.mkdir(parents=True, exist_ok=True)
        (save / "prompt.txt").write_text(prompt)
        out, paths = t23d.text_to_3dgs(params, tokenize, prompt, str(save),
                                       cfg, key=jax.random.key(cfg.seed),
                                       orbit_t=orbit_t, mesh=mesh)
        results.append((prompt, paths))
    return results


def main(args):
    from transformers import AutoTokenizer

    from vist3a_tpu.cli.model_loading import (load_stitched_model,
                                              weights_root)
    from vist3a_tpu.io import load_weights, weight_import
    from vist3a_tpu.nn.umt5 import UMT5_XXL

    from vist3a_tpu.io import manifests

    root = weights_root(args)
    params, scfg = load_stitched_model(args)
    umt5_sd = load_weights.load_sharded_safetensors(root / "umt5")
    manifests.validate_state_dict(umt5_sd, "umt5_xxl")
    params["umt5"] = weight_import.import_umt5(umt5_sd,
                                               UMT5_XXL.num_layers)
    params["dit"] = weight_import.import_wan_dit(manifests.validate_wan_dit(
        load_weights.load_sharded_safetensors(root / "wan_dit")))
    if getattr(args, "transformer_lora_path", None):
        params["dit"] = weight_import.apply_peft_lora(
            params["dit"],
            load_weights.load_sharded_safetensors(args.transformer_lora_path))

    tokenizer = AutoTokenizer.from_pretrained(str(root / "umt5"))

    def tokenize(text):
        enc = tokenizer([text], padding="max_length", max_length=226,
                        truncation=True, add_special_tokens=True,
                        return_attention_mask=True, return_tensors="np")
        return enc["input_ids"], enc["attention_mask"]

    with open(args.input_texts_path) as f:
        prompts = [line.strip() for line in f if line.strip()]

    from vist3a_tpu.nn.wan_dit import config_from_model_id

    # `--model_id` picks the DiT scale (`inference_t23d.py:55` loads the
    # named Diffusers pipeline); 14B only runs TP-sharded (28 GB bf16)
    dit_cfg = config_from_model_id(args.model_id)
    # inference decode runs the DPT cascades in bf16 (the t23d default;
    # `load_stitched_model`'s scfg keeps the fp32 training/eval setting) —
    # measured deviation documented at `EncoderConfig.head_dtype`
    import dataclasses

    scfg = dataclasses.replace(
        scfg, encoder=dataclasses.replace(scfg.encoder,
                                          head_dtype="bfloat16"))
    cfg = t23d.T23DConfig(
        num_frames=args.num_frames, flow_shift=args.flow_shift,
        guidance_scale=float(str(args.cfg_scale).split(",")[0]),
        dit=dit_cfg, stitched=scfg)

    # multi-chip: place the DiT over the mesh (TP for 14B) and shard the
    # prompt list over processes, as the reference does over ranks (:62)
    mesh = None
    if getattr(args, "mesh_model", 1) > 1:
        from vist3a_tpu.core import mesh as mesh_mod

        mesh = mesh_mod.mesh_from_args(args)
        params["dit"] = mesh_mod.place_dit(
            params["dit"], cfg.dit, mesh,
            getattr(args, "dit_sharding", "tp"))
    run(params, tokenize, prompts, args.output_dir, cfg,
        process_index=jax.process_index(), process_count=jax.process_count(),
        mesh=mesh)


if __name__ == "__main__":
    main(inference_vist3a_argument().parse_args())
