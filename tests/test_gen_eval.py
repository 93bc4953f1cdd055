"""Gen-eval harness: regex parsing, DPG dependency zeroing/aggregation,
scene-eval loop with stub scorers over real mp4 artifacts; voxel fusion vs
naive; profiling utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vist3a_tpu.eval import gen_eval


def test_parse_unified_scores():
    text = ('Word-wise Scores: [["a", 0.1], ["[No_mistakes]", 0.9]]\n\n'
            "Alignment Score (1-5): 3.62\nCoherence Score (1-5): 4\n"
            "Style Score (1-5): 2.8\n")
    s = gen_eval.parse_unified_scores(text)
    assert s == {"alignment": 3.62, "coherence": 4.0, "style": 2.8}
    # fallback line grammar
    s2 = gen_eval.parse_unified_scores(
        "alignment: 3\nthe Coherence was 4.5 overall\nStyle - 2")
    assert s2["coherence"] == 4.5
    with pytest.raises(ValueError):
        gen_eval.parse_unified_scores("no scores here")


def test_dpg_dependency_zeroing():
    entry = {
        "qid2tuple": {1: "entity - whole (cat)", 2: "attribute - color (red)",
                      3: "relation - spatial (on)"},
        "qid2question": {1: "is there a cat?", 2: "is the cat red?",
                         3: "is the cat on a mat?"},
        "qid2dependency": {1: [0], 2: [1], 3: [1]},
    }

    def vqa_no_cat(img, q):
        return "Yes" if "mat" in q or "red" in q else "No"

    score, orig = gen_eval.compute_dpg_one_sample(entry, ["img"], vqa_no_cat)
    # parent (cat) answered No → children zeroed despite Yes
    assert score == 0.0
    assert orig == {1: 0.0, 2: 1.0, 3: 1.0}

    def vqa_all_yes(img, q):
        return "Yes"

    score2, _ = gen_eval.compute_dpg_one_sample(entry, ["img"], vqa_all_yes)
    assert score2 == 1.0


def test_dpg_aggregation():
    out = gen_eval.aggregate_dpg(
        [1.0, 0.5],
        {"entity - whole": [1, 0], "entity - part": [1],
         "attribute - color": [0]})
    assert out["dpg_score"] == 75.0
    np.testing.assert_allclose(out["l1"]["entity"], 200 / 3)
    assert out["l2"]["attribute - color"] == 0.0


def test_scene_eval_loop(tmp_path):
    from vist3a_tpu.io.video_export import save_video

    for i, prompt in enumerate(["a red chair", "a blue car"]):
        d = tmp_path / f"scene_{i}"
        d.mkdir()
        frames = np.random.default_rng(i).random((6, 3, 32, 32)).astype(
            np.float32)
        save_video(frames, d / "gs.mp4", fps=5)
        (d / "prompt.txt").write_text(prompt)

    calls = {"n": 0}

    def unified(images, prompt):
        calls["n"] += 1
        return "Alignment Score (1-5): 3\nCoherence Score (1-5): 4\n" \
               "Style Score (1-5): 5"

    scorers = {
        "unified_reward": unified,
        "clip": lambda f, p: 30.0,
        "longclip": lambda f, p: 25.0,
        "aesthetic": lambda f: 55.0,
        "musiq": lambda f: 60.0,
    }
    out = gen_eval.run_scene_eval(tmp_path, scorers, num_frames=4,
                                  res_path=tmp_path / "res.json")
    assert len(out["per_prompt"]) == 2
    assert out["summary"]["alignment"] == 3.0
    assert out["summary"]["clip"] == 30.0
    assert calls["n"] == 8                    # 4 frames × 2 prompts
    assert (tmp_path / "res.json").exists()


def test_voxel_fusion_matches_naive(rng):
    from vist3a_tpu.ops.voxel_fusion import voxelize_with_fusion

    n, c = 64, 5
    pts = rng.standard_normal((n, 3)).astype(np.float32) * 0.5
    feat = rng.standard_normal((n, c)).astype(np.float32)
    conf = rng.standard_normal((n,)).astype(np.float32)
    vs = 0.4

    vp, vf, valid = voxelize_with_fusion(jnp.asarray(feat), jnp.asarray(pts),
                                         vs, jnp.asarray(conf))
    vp, vf, valid = map(np.asarray, (vp, vf, valid))

    # naive: group by voxel key, per-voxel softmax-weighted mean
    keys = np.round(pts / vs).astype(np.int32)
    uniq = sorted({tuple(k) for k in keys})
    assert valid.sum() == len(uniq)
    got = {tuple(np.round(p, 4)) for p in vp[valid.astype(bool)]}
    for u in uniq:
        sel = (keys == np.asarray(u)).all(-1)
        w = np.exp(conf[sel] - conf[sel].max())
        w = w / (w.sum() + 1e-6)
        want_p = (pts[sel] * w[:, None]).sum(0)
        assert tuple(np.round(want_p, 4)) in got


def test_benchmarker(tmp_path):
    from vist3a_tpu.core.profiling import Benchmarker, assert_all_finite

    b = Benchmarker()
    with b.time("phase_a"):
        _ = jnp.sum(jnp.ones((64, 64))).block_until_ready()
    assert "phase_a" in b.summarize()
    b.dump(tmp_path / "times.json")
    assert (tmp_path / "times.json").exists()

    assert_all_finite({"x": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_all_finite({"x": jnp.asarray([1.0, np.nan])}, "bad")
