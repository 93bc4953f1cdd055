"""UniPC parity against a faithful re-statement of diffusers'
`UniPCMultistepScheduler` — the `test_wan_dit_parity.py` pattern applied to
the sampler.

The reference constructs the scheduler as
`UniPCMultistepScheduler(prediction_type="flow_prediction",
use_flow_sigmas=True, flow_shift=s)` (`inference_t23d.py:65-70`,
`train_vdm.py:337-343`) with the class defaults solver_order=2,
solver_type="bh2", predict_x0=True, lower_order_final=True,
final_sigmas_type="zero", disable_corrector=[], thresholding off.
`_DiffusersUniPC` below restates that configuration's `set_timesteps` /
`convert_model_output` / `multistep_uni_p_bh_update` /
`multistep_uni_c_bh_update` / `step` semantics in numpy, including the
branchy details that shift every published metric if wrong: corrector
application gated on `last_sample`, the x₀ stored in history coming from
the PRE-corrector sample, the order-2 `rhos_p=[0.5]` simplification, the
full 2×2 solve for `rhos_c`, the history warm-up (`lower_order_nums`) and
`lower_order_final` ramps, and the corrector running at the PREVIOUS
step's order.  Both `unipc.sample` (step-driven) and `unipc.sample_scan`
(the one-jit serving/training form) are pinned against it on a 50-step
fake-model trajectory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vist3a_tpu.diffusion import unipc


class _DiffusersUniPC:
    """Numpy re-statement of diffusers' UniPCMultistepScheduler for
    prediction_type="flow_prediction", use_flow_sigmas=True,
    solver_type="bh2", predict_x0=True, final_sigmas_type="zero"."""

    def __init__(self, num_inference_steps, flow_shift=3.0, solver_order=2,
                 num_train_timesteps=1000, lower_order_final=True):
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final
        # --- set_timesteps (use_flow_sigmas branch) ---
        alphas = np.linspace(1.0, 1.0 / num_train_timesteps,
                             num_inference_steps + 1)
        sigmas = 1.0 - alphas
        sigmas = np.flip(flow_shift * sigmas
                         / (1 + (flow_shift - 1) * sigmas))[:-1].copy()
        self.timesteps = (sigmas * num_train_timesteps).copy()
        self.sigmas = np.concatenate([sigmas, [0.0]])   # final zero sigma
        self.num_inference_steps = num_inference_steps
        # --- per-run state ---
        self.model_outputs = [None] * solver_order
        self.timestep_list = [None] * solver_order
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None
        self.step_index = 0

    # _sigma_to_alpha_sigma_t (use_flow_sigmas): alpha = 1 - sigma
    @staticmethod
    def _alpha_sigma(sigma):
        return 1.0 - sigma, sigma

    def convert_model_output(self, model_output, sample):
        # prediction_type="flow_prediction": x0 = x - sigma_t * v
        sigma_t = self.sigmas[self.step_index]
        return sample - np.float32(sigma_t) * model_output

    def _bh_coeffs(self, h, rks, order):
        hh = -h                         # predict_x0
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1.0
        B_h = np.expm1(hh)              # solver_type="bh2"
        R, b = [], []
        factorial_i = 1.0
        rks = np.asarray(rks, np.float64)
        for i in range(1, order + 1):
            R.append(rks ** (i - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1.0 / factorial_i
        return np.stack(R), np.asarray(b), h_phi_1, B_h

    def multistep_uni_p_bh_update(self, sample, order):
        m0 = self.model_outputs[-1]
        x = sample
        sigma_t = self.sigmas[self.step_index + 1]
        sigma_s0 = self.sigmas[self.step_index]
        alpha_t, sigma_t_ = self._alpha_sigma(sigma_t)
        alpha_s0, sigma_s0_ = self._alpha_sigma(sigma_s0)
        lambda_t = np.log(alpha_t) - np.log(max(sigma_t_, 1e-12))
        lambda_s0 = np.log(alpha_s0) - np.log(sigma_s0_)
        h = lambda_t - lambda_s0

        rks, D1s = [], []
        for i in range(1, order):
            sigma_si = self.sigmas[self.step_index - i]
            mi = self.model_outputs[-(i + 1)]
            alpha_si, sigma_si_ = self._alpha_sigma(sigma_si)
            lambda_si = np.log(alpha_si) - np.log(sigma_si_)
            rk = (lambda_si - lambda_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / np.float32(rk))
        rks.append(1.0)

        R, b, h_phi_1, B_h = self._bh_coeffs(h, rks, order)
        if D1s:
            if order == 2:
                rhos_p = np.asarray([0.5])       # diffusers' simplification
            else:
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
        # x0-prediction branch
        x_t_ = (np.float32(sigma_t_ / sigma_s0_) * x
                - np.float32(alpha_t) * np.float32(h_phi_1) * m0)
        if D1s:
            pred_res = sum(np.float32(r) * d for r, d in zip(rhos_p, D1s))
            return x_t_ - np.float32(alpha_t) * np.float32(B_h) * pred_res
        return x_t_

    def multistep_uni_c_bh_update(self, this_model_output, last_sample,
                                  order):
        m0 = self.model_outputs[-1]
        x = last_sample
        model_t = this_model_output
        sigma_t = self.sigmas[self.step_index]
        sigma_s0 = self.sigmas[self.step_index - 1]
        alpha_t, sigma_t_ = self._alpha_sigma(sigma_t)
        alpha_s0, sigma_s0_ = self._alpha_sigma(sigma_s0)
        lambda_t = np.log(alpha_t) - np.log(sigma_t_)
        lambda_s0 = np.log(alpha_s0) - np.log(sigma_s0_)
        h = lambda_t - lambda_s0

        rks, D1s = [], []
        for i in range(1, order):
            sigma_si = self.sigmas[self.step_index - (i + 1)]
            mi = self.model_outputs[-(i + 1)]
            alpha_si, sigma_si_ = self._alpha_sigma(sigma_si)
            lambda_si = np.log(alpha_si) - np.log(sigma_si_)
            rk = (lambda_si - lambda_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / np.float32(rk))
        rks.append(1.0)

        R, b, h_phi_1, B_h = self._bh_coeffs(h, rks, order)
        if order == 1:
            rhos_c = np.asarray([0.5])
        else:
            rhos_c = np.linalg.solve(R, b)
        x_t_ = (np.float32(sigma_t_ / sigma_s0_) * x
                - np.float32(alpha_t) * np.float32(h_phi_1) * m0)
        corr_res = sum(np.float32(r) * d
                       for r, d in zip(rhos_c[:-1], D1s)) if D1s else 0.0
        D1_t = model_t - m0
        return x_t_ - np.float32(alpha_t) * np.float32(B_h) * (
            corr_res + np.float32(rhos_c[-1]) * D1_t)

    def step(self, model_output, sample):
        use_corrector = self.step_index > 0 and self.last_sample is not None
        model_output_convert = self.convert_model_output(model_output,
                                                         sample)
        if use_corrector:
            sample = self.multistep_uni_c_bh_update(
                this_model_output=model_output_convert,
                last_sample=self.last_sample, order=self.this_order)
        for i in range(self.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
        self.model_outputs[-1] = model_output_convert
        if self.lower_order_final:
            this_order = min(self.solver_order,
                             self.num_inference_steps - self.step_index)
        else:
            this_order = self.solver_order
        self.this_order = min(this_order, self.lower_order_nums + 1)
        assert self.this_order > 0
        self.last_sample = sample
        prev_sample = self.multistep_uni_p_bh_update(sample, self.this_order)
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev_sample


def _fake_model(x, t):
    """Deterministic nonlinear fake model: enough structure for the 2nd
    order history terms, corrector and warm-up branches to all matter."""
    tt = np.float32(t) / 1000.0
    return (0.4 * np.cos(3.0 * tt) * x
            + 0.2 * np.sin(7.0 * tt) * (x ** 2 - 0.5)
            + 0.1 * tt)


def _run_restatement(x0, num_steps, shift):
    sched = _DiffusersUniPC(num_steps, flow_shift=shift)
    x = x0.copy()
    for i in range(num_steps):
        v = _fake_model(x, sched.timesteps[i])
        x = sched.step(v, x)
    return x


@pytest.mark.parametrize("num_steps,shift", [(50, 3.0), (50, 5.0), (7, 3.0)])
def test_sample_matches_diffusers_restatement(num_steps, shift):
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    want = _run_restatement(x0, num_steps, shift)

    def model_fn(x, t):
        return jnp.asarray(_fake_model(np.asarray(x), t))

    cfg = unipc.UniPCConfig(num_steps=num_steps, shift=shift)
    got = np.asarray(unipc.sample(model_fn, jnp.asarray(x0), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_steps,shift", [(50, 3.0), (10, 3.0)])
def test_sample_scan_matches_diffusers_restatement(num_steps, shift):
    """The production one-jit scan form (serving + the VDM rollout) must
    track the restatement too — it folds the per-step coefficients
    differently (`unipc.precompute_coeffs`), so pin it independently."""
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    want = _run_restatement(x0, num_steps, shift)

    def model_fn(x, t):
        # t arrives as a traced scalar inside scan; the fake model must be
        # traceable — restate it in jnp
        tt = t / 1000.0
        return (0.4 * jnp.cos(3.0 * tt) * x
                + 0.2 * jnp.sin(7.0 * tt) * (x ** 2 - 0.5)
                + 0.1 * tt)

    cfg = unipc.UniPCConfig(num_steps=num_steps, shift=shift)
    got = np.asarray(unipc.sample_scan(model_fn, jnp.asarray(x0), cfg))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_schedule_matches_restatement():
    """sigma grid + timesteps bit-for-bit vs the set_timesteps restatement."""
    for n, s in ((50, 3.0), (30, 5.0), (4, 3.0)):
        sched = _DiffusersUniPC(n, flow_shift=s)
        sigmas, timesteps = unipc.flow_sigmas(n, s)
        np.testing.assert_allclose(sigmas, sched.sigmas, rtol=0, atol=1e-15)
        np.testing.assert_allclose(timesteps,
                                   sched.timesteps.astype(np.float32),
                                   rtol=0, atol=0)
