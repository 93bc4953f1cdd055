"""wandb-compatible run logger with a JSONL/PNG fallback.

Parity target: the reference logs scalar metric dicts and image lists to
wandb on the main process only — the 16 stitching terms + lr + grad_norm at
`model_stitching_training.py:173-193`, the VDM losses and every-10-step
decoded-vs-rendered grids at `train_vdm.py:651-688`.

Here the CLIs call `make_run(...)` which returns a `RunLogger`:

  * with `--wandb_logging` AND an importable `wandb` package → a real wandb
    run (`wandb.init(project=..., name=..., config=...)`), scalars via
    `run.log(d, step=...)`, images via `wandb.Image`;
  * otherwise → a JSONL writer (`<out_dir>/<run_name>.metrics.jsonl`, one
    record per `log` call) so the same 16 terms are always captured.  Image
    grids keep flowing through the existing PNG path either way.

Rank discipline matches the reference (`accelerator.is_main_process`): only
`jax.process_index() == 0` emits; other ranks get a no-op logger.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax


class RunLogger:
    """No-op base (used as-is on non-zero ranks)."""

    enabled = False

    def log(self, metrics: dict, step: int | None = None) -> None:
        pass

    def log_images(self, name: str, images, step: int | None = None) -> None:
        """images: iterable of (H, W, 3) float arrays in [0, 1]."""

    def finish(self) -> None:
        pass


class _JsonlLogger(RunLogger):
    enabled = True

    def __init__(self, path: Path):
        path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def log(self, metrics, step=None):
        rec = dict(metrics)
        if step is not None:
            rec.setdefault("step", int(step))
        self._f.write(json.dumps(
            {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
             for k, v in rec.items()}) + "\n")

    def finish(self):
        self._f.close()


class _WandbLogger(RunLogger):
    enabled = True

    def __init__(self, wandb, project, run_name, config):
        self._wandb = wandb
        self._run = wandb.init(project=project, name=run_name,
                               config=config or {})

    def log(self, metrics, step=None):
        self._run.log(dict(metrics), step=step)

    def log_images(self, name, images, step=None):
        imgs = [self._wandb.Image(
            np.clip(np.asarray(im, np.float32), 0.0, 1.0), caption=str(i))
            for i, im in enumerate(images)]
        self._run.log({name: imgs}, step=step)

    def finish(self):
        self._run.finish()


def make_run(enabled: bool, *, project: str = "wan+anysplat",
             run_name: str | None = None, config: dict | None = None,
             out_dir=None) -> RunLogger:
    """Build the rank-0 logger.  `enabled=False` → pure no-op (the CLIs call
    unconditionally); wandb absent from the image → JSONL fallback so the
    flag still produces a durable metric stream."""
    if not enabled or jax.process_index() != 0:
        return RunLogger()
    try:
        import wandb  # noqa: F401 — optional, absent in this image
        return _WandbLogger(wandb, project, run_name, config)
    except Exception:
        name = run_name or "run"
        base = Path(out_dir) if out_dir else Path(".")
        return _JsonlLogger(base / f"{name}.metrics.jsonl")
