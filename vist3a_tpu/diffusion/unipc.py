"""UniPC multistep sampler with flow sigmas (Wan's scheduler), TPU-native.

Parity target: diffusers `UniPCMultistepScheduler(prediction_type=
"flow_prediction", use_flow_sigmas=True, flow_shift=s)` exactly as the
reference constructs it (`inference_t23d.py:65-70`, `train_vdm.py:337-343`):

  * sigma grid: linspace(1, 1/N, N) warped by σ ← s·σ / (1 + (s−1)·σ),
    final sigma 0; timesteps = σ·1000;
  * flow parameterization: α_t = 1−σ_t, model predicts the flow velocity
    v = ε − x₀, so x₀ = x − σ_t·v;
  * UniPC-p (predictor) / UniPC-c (corrector), solver order 2, B(h) = e^h−1
    ("bh2"), x₀-prediction branch, lower-order final.

TPU design: the step index, solver order and corrector flag are STATIC
(the whole schedule is known up front), so each (order, corrector) variant
jits once and the big-tensor solver math stays on device.  The denoise loop
is a host loop over ≤3 compiled step variants — same structure as the
reference's scheduler loop, no data-dependent control flow on device.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def flow_sigmas(num_steps: int, shift: float = 3.0,
                num_train_timesteps: int = 1000):
    """(sigmas incl. trailing 0, timesteps = σ·1000).

    diffusers `set_timesteps` with use_flow_sigmas: σ grid from
    alphas = linspace(1, 1/1000, N+1), σ = 1−α warped by
    σ ← s·σ/(1+(s−1)σ), flipped descending, zero dropped then re-appended
    as the terminal sigma — σ_max = s·(1−1e−3)/(1+(s−1)(1−1e−3)) < 1, which
    keeps α_0 = 1−σ_0 > 0 (the λ-space math is singular at σ=1)."""
    alphas = np.linspace(1.0, 1.0 / num_train_timesteps, num_steps + 1)
    s = 1.0 - alphas
    s = shift * s / (1.0 + (shift - 1.0) * s)
    s = np.flip(s)[:-1]                       # descending, drop the 0
    timesteps = s * num_train_timesteps
    sigmas = np.concatenate([s, [0.0]]).astype(np.float64)
    return sigmas, timesteps.astype(np.float32)


def _alpha_sigma(sig: float):
    return 1.0 - sig, sig


def _lambda(sig: float):
    a, s = _alpha_sigma(sig)
    # guard the terminal sigma=0 point (never used as a source)
    return math.log(max(a, 1e-12)) - math.log(max(s, 1e-12))


@dataclasses.dataclass(frozen=True)
class UniPCConfig:
    num_steps: int = 50
    shift: float = 3.0
    solver_order: int = 2
    num_train_timesteps: int = 1000


class UniPCState(NamedTuple):
    """Device-resident history.  x0 predictions (newest last) + last sample."""
    m_prev: tuple          # up to (order−1) previous x₀ predictions
    last_sample: jnp.ndarray | None


def convert_flow_output(sample, model_output, sigma: float):
    """x₀ = x − σ·v (flow_prediction, use_flow_sigmas)."""
    return sample - jnp.float32(sigma) * model_output


def _uni_bh_coeffs(h: float, rks: Sequence[float], order: int):
    """R matrix / b vector of UniPC-bh2 (host math, float64)."""
    hh = -h                      # predict_x0 branch
    h_phi_1 = math.expm1(hh)
    h_phi_k = h_phi_1 / hh - 1.0
    b_h = math.expm1(hh)         # bh2
    R, b = [], []
    factorial_i = 1.0
    rks = np.asarray(list(rks), np.float64)
    for i in range(1, order + 1):
        R.append(rks ** (i - 1))
        b.append(h_phi_k * factorial_i / b_h)
        factorial_i *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / factorial_i
    return np.stack(R), np.asarray(b), h_phi_1, b_h


def unipc_p_update(m_hist, sample, sigmas, i: int, order: int):
    """Predictor: x_{i+1} from sample at σ_i using m_hist (x₀ preds, newest
    last, length ≥ order).  All schedule math host-side float64."""
    sig_t, sig_s0 = float(sigmas[i + 1]), float(sigmas[i])
    a_t, s_t = _alpha_sigma(sig_t)
    a_s0, _ = _alpha_sigma(sig_s0)
    lam_t, lam_s0 = _lambda(sig_t), _lambda(sig_s0)
    h = lam_t - lam_s0

    m0 = m_hist[-1]
    rks, d1s = [], []
    for k in range(1, order):
        sig_sk = float(sigmas[i - k])
        rk = (_lambda(sig_sk) - lam_s0) / h
        rks.append(rk)
        d1s.append((m_hist[-(k + 1)] - m0) / rk)
    rks.append(1.0)

    R, b, h_phi_1, b_h = _uni_bh_coeffs(h, rks, order)
    if order == 1:
        rhos_p = np.zeros((0,))
    elif order == 2:
        rhos_p = np.asarray([0.5])
    else:
        rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])

    # x₀-prediction (predict_x0) form: sigma ratio on the sample,
    # h_phi_1 = e^{−h} − 1 multiplies α_t·x₀
    _, s_s0 = _alpha_sigma(sig_s0)
    x_t = (jnp.float32(s_t / s_s0) * sample
           - jnp.float32(a_t * h_phi_1) * m0)
    if d1s:
        pred_res = sum(jnp.float32(r) * d for r, d in zip(rhos_p, d1s))
        x_t = x_t - jnp.float32(a_t * b_h) * pred_res
    return x_t


def unipc_c_update(m_this, m_hist, last_sample, sigmas, i: int, order: int):
    """Corrector: refine the sample at σ_i using the NEW model x₀ (m_this)
    evaluated there, previous history m_hist, and the sample at σ_{i−1}."""
    sig_t, sig_s0 = float(sigmas[i]), float(sigmas[i - 1])
    a_t, s_t = _alpha_sigma(sig_t)
    a_s0, _ = _alpha_sigma(sig_s0)
    lam_t, lam_s0 = _lambda(sig_t), _lambda(sig_s0)
    h = lam_t - lam_s0

    m0 = m_hist[-1]
    rks, d1s = [], []
    for k in range(1, order):
        sig_sk = float(sigmas[i - 1 - k])
        rk = (_lambda(sig_sk) - lam_s0) / h
        rks.append(rk)
        d1s.append((m_hist[-(k + 1)] - m0) / rk)
    rks.append(1.0)

    R, b, h_phi_1, b_h = _uni_bh_coeffs(h, rks, order)
    if order == 1:
        rhos_c = np.asarray([0.5])
    else:
        rhos_c = np.linalg.solve(R, b)

    _, s_s0 = _alpha_sigma(sig_s0)
    x_t_ = (jnp.float32(s_t / s_s0) * last_sample
            - jnp.float32(a_t * h_phi_1) * m0)
    corr = sum(jnp.float32(r) * d for r, d in zip(rhos_c[:-1], d1s)) \
        if d1s else 0.0
    d1_t = m_this - m0
    return x_t_ - jnp.float32(a_t * b_h) * (corr + jnp.float32(rhos_c[-1])
                                            * d1_t)


def order_schedule(num_steps: int, solver_order: int):
    """this_order per step (lower_order_final=True, warm-up by history)."""
    orders = []
    for i in range(num_steps):
        o = min(solver_order, num_steps - i)   # lower order final
        o = min(o, i + 1)                      # history warm-up
        orders.append(o)
    return orders


def sample(model_fn: Callable, latents: jnp.ndarray,
           cfg: UniPCConfig = UniPCConfig()):
    """Full denoise loop.  model_fn(latent, t_scalar) → flow prediction (CFG
    already folded in by the caller).  Returns the final clean latent."""
    sigmas, timesteps = flow_sigmas(cfg.num_steps, cfg.shift,
                                    cfg.num_train_timesteps)
    orders = order_schedule(cfg.num_steps, cfg.solver_order)

    m_hist: list = []
    last_sample = None
    x = latents
    for i in range(cfg.num_steps):
        v = model_fn(x, float(timesteps[i]))
        m_this = convert_flow_output(x, v, float(sigmas[i]))
        if i > 0 and last_sample is not None:
            x = unipc_c_update(m_this, m_hist, last_sample, sigmas, i,
                               orders[i - 1])
            # the corrector's refined x is consistent with m_this at σ_i;
            # diffusers recomputes nothing here (same history semantics)
        m_hist.append(m_this)
        if len(m_hist) > cfg.solver_order:
            m_hist.pop(0)
        last_sample = x
        x = unipc_p_update(m_hist, x, sigmas, i, orders[i])
    return x


def cfg_model(dit_apply: Callable, cond, uncond, guidance_scale: float):
    """Classifier-free guidance wrapper: one batched forward per step
    (`inference_t23d.py:94-103` runs the CFG pair; we batch it)."""
    def model_fn(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        text = jnp.concatenate([uncond, cond], axis=0)
        ts = jnp.full((x2.shape[0],), t, jnp.float32)
        v = dit_apply(x2, ts, text)
        v_u, v_c = jnp.split(v, 2, axis=0)
        return v_u + guidance_scale * (v_c - v_u)
    return model_fn


# --------------------------------------------------------------------------- #
# scan form: ONE jit for the whole denoise loop                               #
# --------------------------------------------------------------------------- #
def precompute_coeffs(cfg: UniPCConfig):
    """All per-step UniPC scalars as arrays (host float64 → float32).

    The order-2 updates with zeroed history coefficients reduce EXACTLY to
    the order-1 updates (D1s = 0 ⇒ pred_res/corr_res = 0), so one scan body
    covers the whole schedule:

      predictor: x_{i+1} = P_cx·x − P_cm0·m_i − P_cd1·(m_{i−1} − m_i)
      corrector: x_i ← C_cx·x_{i−1}ˢ − C_cm0·m_{i−1}
                        − C_hist·(m_{i−2} − m_{i−1}) − C_new·(mᵗ − m_{i−1})
    """
    sigmas, timesteps = flow_sigmas(cfg.num_steps, cfg.shift,
                                    cfg.num_train_timesteps)
    orders = order_schedule(cfg.num_steps, cfg.solver_order)
    n = cfg.num_steps
    P_cx = np.zeros(n)
    P_cm0 = np.zeros(n)
    P_cd1 = np.zeros(n)
    C_cx = np.zeros(n)
    C_cm0 = np.zeros(n)
    C_hist = np.zeros(n)
    C_new = np.zeros(n)

    for i in range(n):
        sig_t, sig_s0 = float(sigmas[i + 1]), float(sigmas[i])
        a_t, s_t = _alpha_sigma(sig_t)
        _, s_s0 = _alpha_sigma(sig_s0)
        lam_t, lam_s0 = _lambda(sig_t), _lambda(sig_s0)
        h = lam_t - lam_s0
        hh = -h
        phi1 = math.expm1(hh)
        b_h = math.expm1(hh)
        P_cx[i] = s_t / s_s0
        P_cm0[i] = a_t * phi1
        if orders[i] >= 2:
            rk = (_lambda(float(sigmas[i - 1])) - lam_s0) / h
            P_cd1[i] = a_t * b_h * 0.5 / rk

        if i == 0:
            C_cx[i] = 1.0      # identity corrector at the first step
            continue
        c_order = orders[i - 1]
        sig_ct, sig_cs0 = float(sigmas[i]), float(sigmas[i - 1])
        a_ct, s_ct = _alpha_sigma(sig_ct)
        _, s_cs0 = _alpha_sigma(sig_cs0)
        lam_ct, lam_cs0 = _lambda(sig_ct), _lambda(sig_cs0)
        hc = lam_ct - lam_cs0
        phi1c = math.expm1(-hc)
        b_hc = math.expm1(-hc)
        C_cx[i] = s_ct / s_cs0
        C_cm0[i] = a_ct * phi1c
        if c_order == 1:
            C_new[i] = a_ct * b_hc * 0.5
        else:
            rk_c = (_lambda(float(sigmas[i - 2])) - lam_cs0) / hc
            _, b_vec, _, _ = _uni_bh_coeffs(hc, [rk_c, 1.0], 2)
            rhos = np.linalg.solve(np.stack([np.ones(2),
                                             np.asarray([rk_c, 1.0])]),
                                   b_vec)
            C_hist[i] = a_ct * b_hc * rhos[0] / rk_c
            C_new[i] = a_ct * b_hc * rhos[1]

    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    return {
        "timesteps": f32(timesteps), "sigmas": f32(sigmas[:-1]),
        "P_cx": f32(P_cx), "P_cm0": f32(P_cm0), "P_cd1": f32(P_cd1),
        "C_cx": f32(C_cx), "C_cm0": f32(C_cm0), "C_hist": f32(C_hist),
        "C_new": f32(C_new),
    }


def sample_scan(model_fn: Callable, latents: jnp.ndarray,
                cfg: UniPCConfig = UniPCConfig(), *,
                backprop_mask: jnp.ndarray | None = None):
    """`sample` as ONE `lax.scan` — the TPU-serving form: a single compiled
    program per num_steps instead of a host loop of dispatches.

    backprop_mask: optional (num_steps,) 0/1 floats — gradient flows through
    the model output of step i iff mask[i]=1 (the VDM truncated rollout,
    `train_vdm.py:586-623`); the model INPUT is always stop-gradiented."""
    coeffs = precompute_coeffs(cfg)
    if backprop_mask is None:
        backprop_mask = jnp.ones((cfg.num_steps,), jnp.float32)
    xs = {**coeffs, "bp": backprop_mask.astype(jnp.float32)}

    def body(carry, per):
        x, last, m1, m2 = carry
        v = model_fn(jax.lax.stop_gradient(x), per["timesteps"])
        v = per["bp"] * v + (1.0 - per["bp"]) * jax.lax.stop_gradient(v)
        m_this = x - per["sigmas"] * v
        x_c = (per["C_cx"] * last - per["C_cm0"] * m1
               - per["C_hist"] * (m2 - m1) - per["C_new"] * (m_this - m1))
        x_next = (per["P_cx"] * x_c - per["P_cm0"] * m_this
                  - per["P_cd1"] * (m1 - m_this))
        return (x_next, x_c, m_this, m1), None

    zeros = jnp.zeros_like(latents)
    (x, _, _, _), _ = jax.lax.scan(
        body, (latents, latents, zeros, zeros), xs)
    return x


# --------------------------------------------------------------------------- #
# record + affine replay: the memory-sane truncated-rollout form              #
# --------------------------------------------------------------------------- #
# `sample_scan(backprop_mask=...)` matches the reference's semantics but is a
# memory trap under jit: the mask is TRACED, so XLA cannot DCE the backward of
# the un-chosen steps' model calls — every rollout step keeps its (remat'd)
# model residuals live (~750 MB/step at deployed 1.3B scale ⇒ ~37 GB for a
# 50-step rollout; the dominant term of the 58.7 GB single-chip RL figure).
# The reference's torch Python loop simply doesn't RUN the un-chosen steps
# under grad (`train_vdm.py:586-623`).  The TPU-native equivalent exploits
# that the whole UniPC chain is elementwise-AFFINE in the model outputs once
# the model inputs are detached (which the truncated rollout does anyway):
#
#   1. `sample_scan_record`: one no-grad scan, recording each step's model
#      input x_i and guided output v_i (N×2 small latents, ~260 MB at N=50);
#   2. re-evaluate the model WITH grad only on the K chosen steps' recorded
#      inputs (gathered at traced indices — K is static, the draw is not);
#   3. `replay_affine`: re-run the (cheap, elementwise) affine chain on the
#      recorded v-stack with the K rows spliced in differentiably.
#
# Gradients are mathematically identical to the masked form (the model input
# is detached every step in both), and the value is bitwise the recorded
# rollout's; residuals shrink from N model calls to K.
def sample_scan_record(model_fn: Callable, latents: jnp.ndarray,
                       cfg: UniPCConfig = UniPCConfig()):
    """No-grad denoise scan recording per-step model inputs and outputs.

    Returns (x_final, x_stack, v_stack) — all stop-gradiented; x_stack[i] is
    the (detached) model input at step i, v_stack[i] the model output."""
    coeffs = precompute_coeffs(cfg)

    def body(carry, per):
        x, last, m1, m2 = carry
        x_in = jax.lax.stop_gradient(x)
        v = jax.lax.stop_gradient(model_fn(x_in, per["timesteps"]))
        m_this = x - per["sigmas"] * v
        x_c = (per["C_cx"] * last - per["C_cm0"] * m1
               - per["C_hist"] * (m2 - m1) - per["C_new"] * (m_this - m1))
        x_next = (per["P_cx"] * x_c - per["P_cm0"] * m_this
                  - per["P_cd1"] * (m1 - m_this))
        return (x_next, x_c, m_this, m1), (x_in, v)

    zeros = jnp.zeros_like(latents)
    (x, _, _, _), (x_stack, v_stack) = jax.lax.scan(
        body, (latents, latents, zeros, zeros), coeffs)
    return jax.lax.stop_gradient(x), x_stack, v_stack


def replay_affine(v_stack: jnp.ndarray, latents: jnp.ndarray,
                  cfg: UniPCConfig = UniPCConfig()):
    """Differentiable replay of the UniPC chain with model outputs GIVEN.

    v_stack: (num_steps, *latents.shape) model outputs (some rows spliced in
    differentiably).  Identical arithmetic to `sample_scan`'s body, so the
    value equals the recorded rollout's and gradient flows through v_stack
    and the affine chain exactly as the truncated rollout requires."""
    coeffs = precompute_coeffs(cfg)
    xs = {**coeffs, "v": v_stack}

    def body(carry, per):
        x, last, m1, m2 = carry
        m_this = x - per["sigmas"] * per["v"]
        x_c = (per["C_cx"] * last - per["C_cm0"] * m1
               - per["C_hist"] * (m2 - m1) - per["C_new"] * (m_this - m1))
        x_next = (per["P_cx"] * x_c - per["P_cm0"] * m_this
                  - per["P_cd1"] * (m1 - m_this))
        return (x_next, x_c, m_this, m1), None

    zeros = jnp.zeros_like(latents)
    (x, _, _, _), _ = jax.lax.scan(
        body, (latents, latents, zeros, zeros), xs)
    return x
