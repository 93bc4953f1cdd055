"""Pin the UniPC sampler against a diffusers-recorded transcript.

`vist3a_tpu/diffusion/unipc_record.py` (run OFFLINE — zero egress here)
dumps per-step trajectories of diffusers' `UniPCMultistepScheduler(
prediction_type="flow_prediction", use_flow_sigmas=True, flow_shift=s)` on
a closed-form velocity field.  When the npz is present these tests compare
our `sample` / `sample_scan` / `sample_scan_record` step-by-step; when it
is absent they SKIP (the schedule math is still covered by
`test_unipc_parity.py`'s re-statement and `test_unipc.py`'s RK45 oracle).
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from vist3a_tpu.diffusion import unipc, unipc_record

_SEARCH = (
    Path(__file__).resolve().parent.parent / "vist3a_tpu" / "diffusion"
    / "unipc_transcript.npz",
    Path(__file__).resolve().parent.parent / "unipc_transcript.npz",
)


def _load():
    for p in _SEARCH:
        if p.exists():
            return np.load(p)
    pytest.skip("unipc_transcript.npz absent (recorded offline — see "
                "vist3a_tpu/diffusion/unipc_record.py)")


def _velocity(x, t):
    return unipc_record.model_velocity(x, t, xp=jnp)


@pytest.mark.parametrize("num_steps,shift", unipc_record.CASES)
def test_schedule_matches_diffusers(num_steps, shift):
    """Our flow-sigma grid must equal diffusers' recorded sigmas/timesteps."""
    data = _load()
    tag = f"{num_steps}_{shift}"
    sigmas, timesteps = unipc.flow_sigmas(num_steps, shift)
    np.testing.assert_allclose(sigmas, data[f"sigmas_{tag}"], atol=1e-9)
    np.testing.assert_allclose(timesteps, data[f"timesteps_{tag}"],
                               atol=1e-3)


@pytest.mark.parametrize("num_steps,shift", unipc_record.CASES)
def test_trajectory_matches_diffusers(num_steps, shift):
    data = _load()
    tag = f"{num_steps}_{shift}"
    ref = data[f"traj_{tag}"]                       # (N, *shape) fp64
    x0 = jnp.asarray(data["x0"], jnp.float32)
    cfg = unipc.UniPCConfig(num_steps=num_steps, shift=shift)

    got = np.asarray(unipc.sample(_velocity, x0, cfg))
    np.testing.assert_allclose(got, ref[-1], rtol=2e-4, atol=2e-4)

    got_scan = np.asarray(unipc.sample_scan(_velocity, x0, cfg))
    np.testing.assert_allclose(got_scan, ref[-1], rtol=2e-4, atol=2e-4)

    # per-step: sample_scan_record's x_stack[i] is the model input of step
    # i, i.e. diffusers' prev_sample of step i-1
    x_fin, x_stack, _ = unipc.sample_scan_record(_velocity, x0, cfg)
    traj = np.concatenate([np.asarray(x_stack)[1:],
                           np.asarray(x_fin)[None]], axis=0)
    np.testing.assert_allclose(traj, ref, rtol=2e-4, atol=2e-4)
