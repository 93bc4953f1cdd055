"""CLI entry `cli/gen_eval.py`: reference-flag parsing, scorer assembly,
and the DPG path driven end-to-end through the tiny in-framework judge
(`dpg_evaluation.py:20-77`, `t3_scene_evaluation.py:163-185`)."""

import json

import numpy as np
import pytest

from vist3a_tpu.cli import gen_eval as cli

torch = pytest.importorskip("torch")

from tests.test_qwen_judge import StubTokenizer          # noqa: E402
from tests.test_qwen_vl import hf_model                  # noqa: F401,E402


def _make_scene(root, prompts):
    from vist3a_tpu.io.video_export import save_video

    for i, prompt in enumerate(prompts):
        d = root / f"scene_{i}"
        d.mkdir()
        frames = np.random.default_rng(i).random((4, 3, 16, 16)).astype(
            np.float32)
        save_video(frames, d / "gs.mp4", fps=5)
        (d / "prompt.txt").write_text(prompt)


def test_t3_no_scorers(tmp_path, capsys):
    _make_scene(tmp_path, ["a red chair"])
    args = cli.t3_argument().parse_args(
        ["--folder_path", str(tmp_path),
         "--eval_save_path", str(tmp_path / "res.json")])
    out = cli.main_t3(args)
    assert out["per_prompt"][0]["prompt"] == "a red chair"
    assert json.loads((tmp_path / "res.json").read_text())


def test_dpg_end_to_end_with_tiny_judge(tmp_path, monkeypatch,
                                        hf_model):          # noqa: F811
    """Full DPG loop: csv → question graph → VQA through the JAX judge
    loaded from a saved checkpoint dir."""
    from vist3a_tpu.eval import qwen_judge

    ckpt = tmp_path / "judge"
    hf_model.save_pretrained(ckpt, safe_serialization=True)
    # the tiny checkpoint ships no tokenizer files — inject the stub
    orig = qwen_judge.load_judge
    monkeypatch.setattr(
        qwen_judge, "load_judge",
        lambda path, **kw: orig(path, tokenizer=StubTokenizer()))

    prompt = "a red chair"
    _make_scene(tmp_path, [prompt])
    csv_path = tmp_path / "questions.csv"
    csv_path.write_text(
        "item_id,text,question,keyword,dependency,proposition_id\n"
        f"0,{prompt},is there a chair?,entity - whole (chair),0,1\n"
        f"0,{prompt},is the chair red?,attribute - color (chair),1,2\n")
    args = cli.dpg_argument().parse_args(
        ["--folder_path", str(tmp_path), "--csv", str(csv_path),
         "--res_path", str(tmp_path / "dpg.json"),
         "--num_frames", "2", "--model-path", str(ckpt)])
    out = cli.main_dpg(args)
    assert set(out) == {"dpg_score", "l1", "l2"}
    assert 0.0 <= out["dpg_score"] <= 100.0
    assert (tmp_path / "dpg.json").exists()


def test_usage_error():
    with pytest.raises(SystemExit):
        cli.main([])
