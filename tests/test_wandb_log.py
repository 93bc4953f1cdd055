"""Run-logger tests: wandb path (faked module), JSONL fallback, no-op."""

import json
import sys
import types

import numpy as np

from vist3a_tpu.core import wandb_log


def test_disabled_is_noop(tmp_path):
    lg = wandb_log.make_run(False, out_dir=tmp_path)
    lg.log({"loss": 1.0}, step=3)
    lg.log_images("images", [np.zeros((4, 4, 3))], step=3)
    lg.finish()
    assert not lg.enabled
    assert list(tmp_path.iterdir()) == []


def test_jsonl_fallback(tmp_path):
    # wandb is absent from this image -> JSONL writer
    lg = wandb_log.make_run(True, run_name="exp", out_dir=tmp_path)
    assert lg.enabled
    lg.log({"loss": 0.5, "grad_norm": np.float32(2.0)}, step=1)
    lg.log({"loss": 0.25}, step=2)
    lg.log_images("images", [np.zeros((4, 4, 3))], step=2)  # no-op, no crash
    lg.finish()
    lines = (tmp_path / "exp.metrics.jsonl").read_text().splitlines()
    recs = [json.loads(ln) for ln in lines]
    assert recs[0] == {"loss": 0.5, "grad_norm": 2.0, "step": 1}
    assert recs[1]["step"] == 2


def test_wandb_path_with_fake_module(tmp_path, monkeypatch):
    calls = {"log": [], "images": 0, "finished": False}

    class FakeRun:
        def log(self, d, step=None):
            calls["log"].append((d, step))

        def finish(self):
            calls["finished"] = True

    fake = types.ModuleType("wandb")
    fake.init = lambda project, name, config: FakeRun()

    class FakeImage:
        def __init__(self, arr, caption=None):
            calls["images"] += 1
            assert arr.min() >= 0.0 and arr.max() <= 1.0

    fake.Image = FakeImage
    monkeypatch.setitem(sys.modules, "wandb", fake)

    lg = wandb_log.make_run(True, project="p", run_name="n", config={"a": 1})
    lg.log({"total_loss": 1.0}, step=7)
    lg.log_images("images", [np.full((2, 2, 3), 2.0), np.zeros((2, 2, 3))],
                  step=7)
    lg.finish()
    assert calls["log"][0] == ({"total_loss": 1.0}, 7)
    assert calls["images"] == 2
    assert calls["finished"]
