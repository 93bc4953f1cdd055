"""Entry point: generation-quality evaluation (SceneBench/T3 + DPG-Bench).

Parity targets: `evaluation/gen_eval/t3_scene_evaluation.py:163-185` and
`evaluation/gen_eval/dpg_evaluation.py:20-77` — flag names match the
reference scripts (`--folder_path`, `--eval_save_path`, `--csv`,
`--res_path`, `--model-path`).  The judge/scorer models load from LOCAL
checkpoint directories (this framework never fetches weights):

  * `--model-path` → Qwen2.5-VL judge dir (UnifiedReward + DPG VQA),
    loaded via `eval.qwen_judge.load_judge`;
  * `--clip_path` / `--longclip_path` → HF CLIPModel dirs for
    CLIPScore / LongCLIP (vision+text towers + tokenizer files);
  * `--aesthetic_probe` → .npy/.safetensors with the LAION linear head
    (the CLIP-L vision tower comes from `--clip_path`).

Scorers whose checkpoint flag is omitted are skipped (the harness accepts
any subset).  MUSIQ runs in-framework (`eval/musiq.py`, multi-scale IQA
transformer) from `--musiq_weights` (.npz in our layout — the published
pyiqa SPAQ .pth is converted offline, see eval/musiq.py docstring); an
injected callable still overrides it.
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import json


def t3_argument() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Generation quality evaluation.")
    p.add_argument("--folder_path", type=str, required=True)
    p.add_argument("--eval_save_path", type=str, default="eval_results.json")
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--model-path", dest="model_path", type=str, default=None,
                   help="local Qwen2.5-VL judge checkpoint dir")
    p.add_argument("--clip_path", type=str, default=None)
    p.add_argument("--longclip_path", type=str, default=None)
    p.add_argument("--aesthetic_probe", type=str, default=None)
    p.add_argument("--musiq_weights", type=str, default=None,
                   help="MUSIQ-SPAQ weights (.npz, eval.musiq layout)")
    return p


def dpg_argument() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DPG-Bench evaluation.")
    p.add_argument("--folder_path", type=str, required=True)
    p.add_argument("--csv", type=str, required=True)
    p.add_argument("--res_path", type=str, default="dpg_bench_results.json")
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--model-path", dest="model_path", type=str, required=True)
    return p


def _load_judge_callables(model_path: str):
    from vist3a_tpu.eval import qwen_judge

    vis, txt, tok, vcfg, tcfg = qwen_judge.load_judge(model_path)
    return (qwen_judge.make_vqa_judge(vis, txt, tok, vcfg=vcfg, tcfg=tcfg),
            qwen_judge.make_unified_reward_judge(vis, txt, tok, vcfg=vcfg,
                                                 tcfg=tcfg))


def _load_clip_scorer(path: str, long_context: bool):
    import numpy as np
    import safetensors.numpy

    from vist3a_tpu.data.clip_tokenizer import CLIPTokenizer
    from vist3a_tpu.eval import scorers
    from vist3a_tpu.nn import clip as clip_mod

    import glob
    import os

    sd = {}
    for shard in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
        sd.update(safetensors.numpy.load_file(shard))
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    vc, tc = hf["vision_config"], hf["text_config"]
    vcfg = clip_mod.CLIPVisionConfig(
        hidden_size=vc["hidden_size"], num_layers=vc["num_hidden_layers"],
        num_heads=vc["num_attention_heads"],
        mlp_dim=vc["intermediate_size"], patch_size=vc["patch_size"],
        image_size=vc["image_size"], projection_dim=hf["projection_dim"],
        act=vc.get("hidden_act", "quick_gelu"))
    tcfg = clip_mod.CLIPTextConfig(
        hidden_size=tc["hidden_size"], num_layers=tc["num_hidden_layers"],
        num_heads=tc["num_attention_heads"],
        mlp_dim=tc["intermediate_size"], vocab_size=tc["vocab_size"],
        context_length=tc["max_position_embeddings"],
        projection_dim=hf["projection_dim"],
        act=tc.get("hidden_act", "quick_gelu"))
    # vision params need the visual_projection; HF CLIPModel prefixes
    vparams = clip_mod.import_hf_clip_vision(sd, vcfg.num_layers)
    tparams = clip_mod.import_hf_clip_text(sd, tcfg.num_layers)
    tok = CLIPTokenizer.from_files(os.path.join(path, "vocab.json"),
                                   os.path.join(path, "merges.txt"))
    text_fn = scorers.make_clip_text_features(tparams, tcfg, tok)
    del long_context  # context length comes from the checkpoint config
    return scorers.make_clip_scorer(vparams, text_fn, vcfg), vparams, vcfg


def build_scorers(args) -> dict:
    out = {}
    if getattr(args, "model_path", None):
        _, unified = _load_judge_callables(args.model_path)
        out["unified_reward"] = unified
    clip_pack = None
    if getattr(args, "clip_path", None):
        scorer, vparams, vcfg = _load_clip_scorer(args.clip_path, False)
        out["clip"] = scorer
        clip_pack = (vparams, vcfg)
    if getattr(args, "longclip_path", None):
        out["longclip"], _, _ = _load_clip_scorer(args.longclip_path, True)
    if getattr(args, "aesthetic_probe", None) and clip_pack is not None:
        import numpy as np

        from vist3a_tpu.eval import scorers

        probe = np.load(args.aesthetic_probe, allow_pickle=True).item() \
            if args.aesthetic_probe.endswith(".npy") else None
        if probe is not None:
            out["aesthetic"] = scorers.make_aesthetic_scorer(
                clip_pack[0], probe["weight"], probe["bias"], clip_pack[1])
    if getattr(args, "musiq_weights", None):
        from vist3a_tpu.eval import musiq

        out["musiq"] = musiq.make_musiq_scorer(
            musiq.load_musiq_npz(args.musiq_weights))
    return out


def main_t3(args) -> dict:
    from vist3a_tpu.eval.gen_eval import run_scene_eval

    result = run_scene_eval(args.folder_path, build_scorers(args),
                            num_frames=args.num_frames,
                            res_path=args.eval_save_path)
    print(json.dumps(result["summary"], indent=2))
    return result


def main_dpg(args) -> dict:
    from vist3a_tpu.eval.gen_eval import prepare_dpg_questions, run_dpg_eval

    with open(args.csv) as f:
        rows = list(csv_mod.DictReader(f))
    questions = prepare_dpg_questions(rows)
    vqa, _ = _load_judge_callables(args.model_path)
    result = run_dpg_eval(args.folder_path, questions, vqa,
                          num_frames=args.num_frames,
                          res_path=args.res_path)
    print(json.dumps({"dpg_score": result["dpg_score"], "l1": result["l1"]},
                     indent=2))
    return result


def main(argv=None) -> None:
    import sys

    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in ("t3", "dpg"):
        raise SystemExit("usage: gen_eval {t3,dpg} [--flags]  "
                         "(t3 = SceneBench/T3-Bench, dpg = DPG-Bench)")
    if argv[0] == "t3":
        main_t3(t3_argument().parse_args(argv[1:]))
    else:
        main_dpg(dpg_argument().parse_args(argv[1:]))


if __name__ == "__main__":
    main()
