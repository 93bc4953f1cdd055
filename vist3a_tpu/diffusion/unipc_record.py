"""OFFLINE diffusers→npz transcript recorder for the UniPC scheduler.

The reference drives denoising with diffusers'
`UniPCMultistepScheduler(prediction_type="flow_prediction",
use_flow_sigmas=True, flow_shift=s)` (`inference_t23d.py:65-70`,
`train_vdm.py:337-343`).  `tests/test_unipc_parity.py` pins our sampler
against a re-statement of that algorithm and `tests/test_unipc.py` against
an independent scipy-RK45 oracle — but the diffusers-SPECIFIC schedule
branches (final-step order drop, corrector usage, flow_shift edge cases)
deserve a transcript recorded by diffusers ITSELF.  Zero egress blocks
running diffusers here, so this is the documented ONE-TIME step (the
`eval/musiq_convert.py` pattern):

Procedure (any machine with diffusers + torch):

    pip install diffusers torch
    python -m vist3a_tpu.diffusion.unipc_record --out /path/out
    # copy unipc_transcript.npz to vist3a_tpu/diffusion/ (or the repo root)

`tests/test_unipc_record.py` then pins `unipc.sample` / `sample_scan` /
`sample_scan_record` step-by-step against the npz and SKIPS when the
artifact is absent.

The "model" is a deterministic closed-form elementwise velocity field (no
weights to ship) evaluated in float64 on both sides, so any trajectory
disagreement is scheduler math, not model noise.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

# (num_steps, flow_shift) grid: tiny lengths exercise the history warm-up
# and lower-order-final branches, 50 is the deployed schedule, shift 5.0 a
# second warp (`utils/argument.py` exposes --flow_shift)
CASES = ((2, 3.0), (3, 3.0), (5, 3.0), (9, 3.0), (50, 3.0), (50, 5.0))
SHAPE = (1, 4, 2, 8, 8)
SEED = 1234


def initial_latents(shape=SHAPE, seed=SEED) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float64)


def model_velocity(x, t, xp=np):
    """Deterministic nonlinear flow field shared by the recorder (numpy,
    fp64) and the test (pass xp=jnp).  Elementwise and smooth, so evaluation
    matches across frameworks to the working precision."""
    return (xp.tanh(x) * (0.5 + t / 1000.0)
            + 0.25 * xp.cos(3.0 * x) - 0.05 * x)


def record_with_diffusers() -> dict:
    """Run every CASE through diffusers' UniPCMultistepScheduler exactly as
    the reference configures it; returns the npz payload."""
    import torch
    from diffusers import UniPCMultistepScheduler

    payload = {"shape": np.asarray(SHAPE), "seed": np.asarray(SEED)}
    x0 = initial_latents()
    payload["x0"] = x0
    for num_steps, shift in CASES:
        sched = UniPCMultistepScheduler(
            prediction_type="flow_prediction", use_flow_sigmas=True,
            flow_shift=shift, solver_order=2)
        sched.set_timesteps(num_steps)
        x = torch.tensor(x0, dtype=torch.float64)
        traj = []
        for t in sched.timesteps:
            v = torch.tensor(
                model_velocity(x.numpy(), float(t)), dtype=torch.float64)
            x = sched.step(v, t, x).prev_sample
            traj.append(x.numpy().copy())
        tag = f"{num_steps}_{shift}"
        payload[f"traj_{tag}"] = np.stack(traj)
        payload[f"timesteps_{tag}"] = np.asarray(
            [float(t) for t in sched.timesteps], np.float64)
        payload[f"sigmas_{tag}"] = np.asarray(
            sched.sigmas.numpy(), np.float64)
    return payload


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=".", help="output directory")
    args = ap.parse_args()
    payload = record_with_diffusers()
    out = Path(args.out) / "unipc_transcript.npz"
    np.savez_compressed(out, **payload)
    print(f"wrote {out}: "
          + ", ".join(k for k in payload if k.startswith("traj_")))


if __name__ == "__main__":
    main()
