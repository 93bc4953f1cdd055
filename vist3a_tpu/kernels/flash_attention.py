"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for every fused attention in the reference stack:
torch SDPA (`vggt/layers/attention.py:64`), xformers
`memory_efficient_attention` (`heads/head_modules.py:220`), and cuDNN flash.

Design (classic FlashAttention-2 schedule on the Mosaic grid):
  * grid (B·H, N_q/BQ, N_k/BK); the trailing grid axis iterates sequentially
    on TPU, so fp32 accumulators in VMEM scratch persist across K blocks of
    one Q block (online softmax, no N×N materialisation);
  * logits fp32 on the MXU (`preferred_element_type`), inputs bf16/fp32;
  * backward = two kernels (dQ over K blocks; dK/dV over Q blocks) using the
    saved per-row logsumexp, via `jax.custom_vjp`;
  * ragged sequence lengths are zero-padded to the block size with key-side
    -inf masking; head_dim 64 (VGGT) is zero-padded to the 128 lane width —
    padded K/V columns provably contribute nothing.

Sequence lengths here are bounded (≤ ~13.4k tokens for VGGT global
attention), so no sequence parallelism is needed (SURVEY §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vist3a_tpu.kernels.partitioning import cached_partitioned

# Tuned on TPU v5e at the VGGT global-attention shape (N=13377, H=16, D=64):
# natural 1024/1024 → 13.6 ms vs 46 ms fused-XLA (3.4×); transposed
# bound-max kernel 2048/1536 → 7.41 ms (vs 7.90 at bk=1024, 8.27 at
# 1024/1024).  r4 re-sweep confirmed 2048/1536 optimal: 1536/1536 8.77,
# 1536/2304 8.83, and every bk≥2304 config fails to lower (VMEM) — don't
# re-tune.  Short sequences still collapse to one rounded block (the
# `bq+256` rule below), so the frame shape (N=1029 → 1056/1056, 0.98 ms)
# is unaffected by the defaults.
DEFAULT_BQ = 1024
DEFAULT_BK = 1024
DEFAULT_BQ_T = 2048
DEFAULT_BK_T = 1536


def _mosaic_target() -> bool:
    """True when kernels should lower through Mosaic: a real TPU backend,
    or VIST3A_FORCE_MOSAIC=1 (AOT topology compiles on a TPU-less host —
    `tools/aot_check.py` — where default_backend() is cpu but the compile
    TARGET is TPU; interpret mode there would hide lowering bugs and
    distort the memory figures)."""
    import os

    return (jax.default_backend() == "tpu"
            or os.environ.get("VIST3A_FORCE_MOSAIC") == "1")


_NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


# --------------------------------------------------------------------------- #
# forward                                                                     #
# --------------------------------------------------------------------------- #
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_s, l_s, *,
                n_k: int, bk: int, masked: bool):
    """Natural (N-on-sublanes) schedule for D ≥ 128: lanes carry the full
    head dim, so bias-feature folding (the D<128 transposed kernel's trick)
    would double the QK lane pad (130→256) — instead scale·log2e is folded
    into q host-side (base-2 softmax, no per-tile scale multiply) and key
    masking compiles away entirely when N_k divides the block size."""
    j = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, _NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK), base-2 scaled

    if masked:  # only compiled in when padded keys exist
        k_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_idx < n_k, s, _NEG_INF)

    m_prev = m_s[:, 0:1]                                 # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)           # (BQ, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)                     # (BQ, 1)
    p = jnp.exp2(s - m_new)                              # (BQ, BK)

    l_s[:, 0:1] = l_s[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_s[:, 0:1] = m_new
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nkb - 1)
    def _():
        l = l_s[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc[:] / safe_l).astype(o_ref.dtype)
        # natural-log lse (ln(Σexp) = ln2·(m₂ + log2 l₂)), stored as 128
        # identical lanes to keep the block tile-aligned
        lse = (m_s[:, 0:1] + jnp.log2(safe_l)) * (1.0 / _LOG2E)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:]).astype(jnp.float32)


def _flash_fwd(q, k, v, scale, bq, bk, interpret):
    """q,k,v: (BH, N, D) padded to block/lane multiples. Returns (o, lse)."""
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    n_qp = _cdiv(n_q, bq) * bq
    n_kp = _cdiv(n_k, bk) * bk
    qp = _pad_to((q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype),
                 n_qp, 1)
    kp = _pad_to(k, n_kp, 1)
    vp = _pad_to(v, n_kp, 1)

    grid = (bh, n_qp // bq, n_kp // bk)
    kernel = functools.partial(_fwd_kernel, n_k=n_k, bk=bk,
                               masked=n_kp != n_k)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_qp, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_qp, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return o[:, :n_q], lse[:, :n_q]


@cached_partitioned
def _fwd_part(scale, bq, bk, interpret):
    """GSPMD-partitionable natural-layout forward: BH dim may shard (TP
    heads / DP batch), N/D replicate (see `kernels/partitioning`)."""
    def fun(q, k, v):
        return _flash_fwd(q, k, v, scale, bq, bk, interpret)

    return fun, 2, True


# --------------------------------------------------------------------------- #
# backward                                                                    #
# --------------------------------------------------------------------------- #
# --------------------------------------------------------------------------- #
# transposed forward (head_dim < 128)                                          #
# --------------------------------------------------------------------------- #
_LOG2E = 1.4426950408889634


def _fwd_kernel_t(qt_ref, kt_ref, vt_ref, ot_ref, lse_ref, acc, *,
                  d: int):
    """Head-dim-on-sublanes schedule: q/k/v arrive as (D, N) tiles so D=64
    needs NO 128-lane zero-padding (halves attention HBM traffic), and the
    PV product is a natural (D, BK)·(BK, BQ) matmul with full 128-lane
    output — the only remaining MXU pad is the unavoidable 64-deep QK
    contraction.  Softmax runs along sublanes of the (BK, BQ) score tile in
    base-2; the saved lse is converted back to natural units so the backward
    kernels are unchanged.

    The VPU (the measured bound at the global shape) does ONLY exp2 here —
    everything else is folded into the MXU products, whose contraction pad
    (64→128) makes the extra feature rows free:
      * scale·log2e is pre-multiplied into q (host-side, N·D work);
      * key masking is an additive BIAS FEATURE: q row d carries 1.0, k row
        d carries 0 (real) / −1e30 (padding), so S already contains the
        mask — no iota/compare/select per block;
      * the softmax max is a PER-ROW UPPER BOUND (Cauchy–Schwarz
        ‖q_i‖·max_j‖k_j‖, exact for the data at hand, computed outside in
        N·D work) carried as q row d+1 against −1 in k row d+1, so scores
        arrive max-subtracted — NO online max, NO rescale, NO m scratch.
        fp32 exp2 keeps ~2⁻¹²⁶ of headroom below the bound, far beyond the
        bound's slack on any real data (LayerNorm'd q/k: slack ≲ 2⁶);
      * the softmax denominator is a ones-ROW in v (row d): PV row d
        accumulates Σp — no VPU sum-reduce, no separate l scratch."""
    j = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    qt = qt_ref[0]                                       # (D+2, BQ)
    kt = kt_ref[0]                                       # (D+2, BK)
    st = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # (BK, BQ): scaled−bound+mask

    p = jnp.exp2(st)                                     # ≤ 1 by the bound
    acc[:] += jax.lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (D+1, BQ); row d = l

    @pl.when(j == nkb - 1)
    def _():
        l = acc[d:d + 1, :]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        ot_ref[0] = (acc[:, :] / safe_l).astype(ot_ref.dtype)
        # natural-log lse: ln(Σ exp(s)) = ln2·(M + log2 l₂); M is read back
        # from the q block so it is EXACTLY the (bf16-rounded) value the
        # MXU subtracted.
        m = qt[d + 1:d + 2, :].astype(jnp.float32)
        lse = (m + jnp.log2(safe_l)) * (1.0 / _LOG2E)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:]).astype(
            jnp.float32)


def _fwd_kernel_t_onmax(qt_ref, kt_ref, vt_ref, ot_ref, lse_ref, acc, m_s, *,
                        d: int):
    """Online-max fallback over the SAME bias-folded inputs as
    `_fwd_kernel_t`: softmax is shift-invariant per row, so the −M shift the
    MXU already applied cancels exactly under a running max — correct for
    ANY input magnitude (the bound kernel's exp2 would underflow once the
    Cauchy–Schwarz slack exceeds ~2¹²⁰).  lse adds M back from q row d+1."""
    j = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, _NEG_INF)

    qt = qt_ref[0]                                       # (D+2, BQ)
    st = jax.lax.dot_general(
        kt_ref[0], qt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (BK, BQ): scaled−M+mask

    m_prev = m_s[0:1, :]
    m_new = jnp.maximum(m_prev, jnp.max(st, axis=0, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(st - m_new)

    m_s[0:1, :] = m_new
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # row d = l

    @pl.when(j == nkb - 1)
    def _():
        l = acc[d:d + 1, :]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        ot_ref[0] = (acc[:, :] / safe_l).astype(ot_ref.dtype)
        m_fold = qt[d + 1:d + 2, :].astype(jnp.float32)
        lse = (m_s[0:1, :] + jnp.log2(safe_l) + m_fold) * (1.0 / _LOG2E)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:]).astype(
            jnp.float32)


def _flash_fwd_t(qt, kt, vt, scale, bq, bk, interpret, kv_bias=None):
    """qt,kt,vt: (BH, D, N) — D unpadded (any sublane multiple of 8).
    kv_bias: optional (BH, 1, N_k) additive key bias (0 = live, −1e30 =
    masked) — arbitrary-position key masking (the padded-token trunk
    layout) rides the SAME bias-feature row as the tail mask.
    Returns (ot (BH, D, N_q), lse (BH, N_q))."""
    bh, d, n_q = qt.shape
    n_k = kt.shape[2]
    n_qp = _cdiv(n_q, bq) * bq
    n_kp = _cdiv(n_k, bk) * bk
    dt = qt.dtype

    # feature row d (mask): q→1, k→0 (real) / −1e30 (pad) — the bias adds to
    # the BASE-2 score directly, so −1e30 is already "−inf" for exp2.
    # feature row d+1 (max bound): q→M_i = ‖q̂_i‖·max_j‖k_j‖ (+ a bf16
    # rounding margin), k→−1, so st = ŝ − M + mask arrives ≤ 0.
    qs = qt.astype(jnp.float32) * (scale * _LOG2E)
    kf = kt.astype(jnp.float32)
    qn = jnp.sqrt(jnp.sum(qs * qs, axis=1))              # (BH, N_q)
    kn_max = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=1), axis=1))   # (BH,)
    m_bound = qn * kn_max[:, None] * 1.02 + 1.0          # margin: bf16 folds
    qp = jnp.concatenate(
        [qs, jnp.ones((bh, 1, n_q), jnp.float32),
         m_bound[:, None, :]], axis=1).astype(dt)
    # concat (not .at[].set) — the scatter form bakes an empty index array
    # into the jaxpr as a constant, which breaks partitioned tracing
    live = (jnp.zeros((bh, 1, n_k), jnp.float32) if kv_bias is None
            else kv_bias.astype(jnp.float32))
    kmask = jnp.concatenate(
        [live,
         jnp.full((bh, 1, n_kp - n_k), _NEG_INF, jnp.float32)],
        axis=2).astype(dt)
    kp = jnp.concatenate([_pad_to(kt, n_kp, 2), kmask,
                          jnp.full((bh, 1, n_kp), -1.0, dt)], axis=1)
    # ones-row on v: PV row d accumulates the softmax denominator
    vp = jnp.concatenate(
        [_pad_to(vt, n_kp, 2),
         jnp.ones((bh, 1, n_kp), dt)], axis=1)
    qp = _pad_to(qp, n_qp, 2)

    grid = (bh, n_qp // bq, n_kp // bk)

    def call(kernel, extra_scratch):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, d + 2, bq), lambda b, i, j: (b, 0, i)),
                pl.BlockSpec((1, d + 2, bk), lambda b, i, j: (b, 0, j)),
                pl.BlockSpec((1, d + 1, bk), lambda b, i, j: (b, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, d + 1, bq), lambda b, i, j: (b, 0, i)),
                pl.BlockSpec((1, 8, bq), lambda b, i, j: (b, 0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, d + 1, n_qp), qt.dtype),
                jax.ShapeDtypeStruct((bh, 8, n_qp), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((d + 1, bq), jnp.float32),
                            *extra_scratch],
            interpret=interpret,
        )

    # Bound-max is safe iff every row's exp2 argument stays within fp32
    # range: slack ≤ M − (−M) = 2M, so max(M) ≤ 60 ⇒ p ∈ [2⁻¹²⁰, 1].
    # LayerNorm'd/qk-norm'd trunks live far below the threshold (M ≈ 11.5·γ²
    # at D=64); anything hotter falls back to the online-max kernel on the
    # SAME folded operands (one scalar branch, both compiled once).
    ot, lse = jax.lax.cond(
        jnp.max(m_bound) <= 60.0,
        lambda q_, k_, v_: call(functools.partial(_fwd_kernel_t, d=d),
                                ())(q_, k_, v_),
        lambda q_, k_, v_: call(functools.partial(_fwd_kernel_t_onmax, d=d),
                                (pltpu.VMEM((8, bq), jnp.float32),))(
                                    q_, k_, v_),
        qp, kp, vp)
    return ot[:, :d, :n_q], lse[:, 0, :n_q]


@cached_partitioned
def _fwd_t_part(scale, bq, bk, interpret):
    """GSPMD-partitionable transposed forward (BH shards, D/N replicate)."""
    def fun(qt, kt, vt):
        return _flash_fwd_t(qt, kt, vt, scale, bq, bk, interpret)

    return fun, 2, True


@cached_partitioned
def _fwd_t_masked_part(scale, bq, bk, interpret):
    """Transposed forward with an explicit key bias (kv_bias carries the
    fused-BH dim so the shard_map policy applies uniformly)."""
    def fun(qt, kt, vt, kv_bias):
        return _flash_fwd_t(qt, kt, vt, scale, bq, bk, interpret,
                            kv_bias=kv_bias)

    return fun, 2, True


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core_t(qt, kt, vt, scale, bq, bk, interpret):
    ot, _ = _fwd_t_part(scale, bq, bk, interpret)(qt, kt, vt)
    return ot


def _flash_core_t_fwd(qt, kt, vt, scale, bq, bk, interpret):
    ot, lse = _fwd_t_part(scale, bq, bk, interpret)(qt, kt, vt)
    return ot, (qt, kt, vt, ot, lse)


def _dq_kernel_t(qb_ref, kb_ref, vb_ref, dob_ref, dq_ref, dq_acc):
    """Transposed dQ: operands stay (D, N) — no 128-lane padding, and the
    dQ matmul contracts over BK at full MXU efficiency.  All softmax/grad
    algebra is folded into the products (see `_flash_core_t_bwd`):
      st = kbᵀ·qb = ŝ + mask − lse₂  →  p = exp2(st) ∈ [0,1] exactly
      dpf = vbᵀ·dob = scale·dp − δ̂  (ones-row on v̂ against −δ̂ row on do)
      ds  = p∘dpf = scale·ds        →  dq = kb·ds  (rows ≥ d sliced off)
    The backward needs NO running max — p is exact by construction."""
    j = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    st = jax.lax.dot_general(
        kb_ref[0], qb_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BK, BQ)
    p = jnp.exp2(st)
    dpf = jax.lax.dot_general(
        vb_ref[0], dob_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BK, BQ)
    ds = (p * dpf).astype(kb_ref.dtype)
    dq_acc[:] += jax.lax.dot_general(
        kb_ref[0], ds, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (D+2, BQ)

    @pl.when(j == nkb - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _dkv_kernel_t(qb_ref, kb_ref, vb_ref, dob_ref, dk_ref, dv_ref,
                  dk_acc, dv_acc, *, inv_alpha: float):
    """Transposed dK/dV: K block parallel on grid axis 1, Q blocks swept on
    the trailing sequential axis.  dV and dK contract over BQ at full MXU
    efficiency; dK accumulates against q̂ = α·q so the final write divides
    by α once per K block."""
    i = pl.program_id(2)
    nqb = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    st = jax.lax.dot_general(
        kb_ref[0], qb_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BK, BQ)
    p = jnp.exp2(st)
    dv_acc[:] += jax.lax.dot_general(
        dob_ref[0], p.astype(dob_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (D+1, BK)
    dpf = jax.lax.dot_general(
        vb_ref[0], dob_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * dpf).astype(qb_ref.dtype)
    dk_acc[:] += jax.lax.dot_general(
        qb_ref[0], ds, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (D+2, BK)

    @pl.when(i == nqb - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * inv_alpha).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_core_t_bwd(scale, bq, bk, interpret, res, g):
    qt, kt, vt, ot, lse = res
    return _bwd_t_part(scale, bq, bk, interpret)(qt, kt, vt, ot, lse, g)


@cached_partitioned
def _bwd_t_part(scale, bq, bk, interpret):
    def fun(qt, kt, vt, ot, lse, g):
        return _flash_bwd_t_impl(qt, kt, vt, ot, lse, g,
                                 scale, bq, bk, interpret)

    return fun, 3, True


def _flash_bwd_t_impl(qt, kt, vt, ot, lse, g, scale, bq, bk, interpret):
    """Transposed backward: residuals stay in (BH, D, N) layout — no
    swapaxes, no 128-lane padding (the natural-layout relayout used to
    double the backward's HBM traffic and halve three matmuls' lane
    efficiency).  The softmax/grad algebra folds into bias feature rows:
      qb = [α·q ; 1 ; lse·log2e]   kb = [k ; 0/−1e30 mask ; −1]
      vb = [scale·v ; 1]           dob = [g ; −scale·δ]
    with α = scale·log2e and δ = Σ_d g·o."""
    bh, d, n_q = qt.shape
    n_k = kt.shape[2]
    # the (BK,BQ)-tile compute set must fit the ~16 MB scoped-VMEM budget
    bq = min(bq, 1024)
    bk = min(bk, 1024)
    n_qp = _cdiv(n_q, bq) * bq
    n_kp = _cdiv(n_k, bk) * bk
    dt = qt.dtype
    alpha = scale * _LOG2E

    delta = jnp.sum(g.astype(jnp.float32) * ot.astype(jnp.float32), axis=1)

    def hi_lo(x):
        """Split an fp32 row into two dt rows summing to ~fp32 accuracy —
        a per-row CONSTANT error in a folded exponent/offset does not cancel
        in gradients (unlike the forward, which renormalizes by Σp), so one
        bf16 row would leak ~0.4%·|x| into every grad row."""
        hi = x.astype(dt)
        lo = (x - hi.astype(jnp.float32)).astype(dt)
        return hi[:, None, :], lo[:, None, :]

    lse_hi, lse_lo = hi_lo(lse * _LOG2E)
    del_hi, del_lo = hi_lo(-delta * scale)
    qb = _pad_to(jnp.concatenate(
        [(qt.astype(jnp.float32) * alpha).astype(dt),
         jnp.ones((bh, 1, n_q), dt), lse_hi, lse_lo], axis=1), n_qp, 2)
    kmask = jnp.concatenate(
        [jnp.zeros((bh, 1, n_k), jnp.float32),
         jnp.full((bh, 1, n_kp - n_k), _NEG_INF, jnp.float32)],
        axis=2).astype(dt)
    kb = jnp.concatenate(
        [_pad_to(kt, n_kp, 2), kmask,
         jnp.full((bh, 2, n_kp), -1.0, dt)], axis=1)
    vb = jnp.concatenate(
        [_pad_to((vt.astype(jnp.float32) * scale).astype(dt), n_kp, 2),
         jnp.ones((bh, 2, n_kp), dt)], axis=1)
    dob = _pad_to(jnp.concatenate([g, del_hi, del_lo], axis=1), n_qp, 2)

    in_specs_dq = [
        pl.BlockSpec((1, d + 3, bq), lambda b, i, j: (b, 0, i)),
        pl.BlockSpec((1, d + 3, bk), lambda b, i, j: (b, 0, j)),
        pl.BlockSpec((1, d + 2, bk), lambda b, i, j: (b, 0, j)),
        pl.BlockSpec((1, d + 2, bq), lambda b, i, j: (b, 0, i)),
    ]
    dq = pl.pallas_call(
        _dq_kernel_t,
        grid=(bh, n_qp // bq, n_kp // bk),
        in_specs=in_specs_dq,
        out_specs=[pl.BlockSpec((1, d + 3, bq), lambda b, i, j: (b, 0, i))],
        out_shape=[jax.ShapeDtypeStruct((bh, d + 3, n_qp), dt)],
        scratch_shapes=[pltpu.VMEM((d + 3, bq), jnp.float32)],
        interpret=interpret,
    )(qb, kb, vb, dob)[0]

    in_specs_dkv = [
        pl.BlockSpec((1, d + 3, bq), lambda b, j, i: (b, 0, i)),
        pl.BlockSpec((1, d + 3, bk), lambda b, j, i: (b, 0, j)),
        pl.BlockSpec((1, d + 2, bk), lambda b, j, i: (b, 0, j)),
        pl.BlockSpec((1, d + 2, bq), lambda b, j, i: (b, 0, i)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_t, inv_alpha=1.0 / alpha),
        grid=(bh, n_kp // bk, n_qp // bq),
        in_specs=in_specs_dkv,
        out_specs=[
            pl.BlockSpec((1, d + 3, bk), lambda b, j, i: (b, 0, j)),
            pl.BlockSpec((1, d + 2, bk), lambda b, j, i: (b, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d + 3, n_kp), dt),
            jax.ShapeDtypeStruct((bh, d + 2, n_kp), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((d + 3, bk), jnp.float32),
            pltpu.VMEM((d + 2, bk), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb, dob)

    return (dq[:, :d, :n_q], dk[:, :d, :n_k], dv[:, :d, :n_k])


_flash_core_t.defvjp(_flash_core_t_fwd, _flash_core_t_bwd)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               dq_acc, *, n_k: int, bk: int, masked: bool):
    """Base-2 backward over host-folded operands: q̂ = q·scale·log2e,
    v̂ = v·scale, lse₂ = lse·log2e, δ̂ = δ·scale — so p = exp2(ŝ − lse₂)
    and d̂s = p∘(d̂p − δ̂) already carries the scale that dq = scale·(ds·k)
    needs.  No per-tile scale multiplies, exp2 instead of exp, and key
    masking compiles out when N_k divides the block size."""
    j = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                    # base-2 scaled
    if masked:
        k_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_idx < n_k, s, _NEG_INF)
    p = jnp.exp2(s - lse_ref[0][:, 0:1])                        # (BQ, BK)
    do = do_ref[0]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                    # = scale·dp
    ds = p * (dp - delta_ref[0][:, 0:1])                 # = scale·ds, fp32
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nkb - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, n_k: int, bk: int,
                masked: bool, inv_alpha: float):
    """Same folded operands as `_dq_kernel`; dk accumulates against the
    pre-scaled q̂, so the final write divides by α = scale·log2e once per
    K block (dk = scale·dsᵀ·q = d̂sᵀ·q̂ / α)."""
    i = pl.program_id(2)   # q-block index (trailing, sequential)
    nqb = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    j = pl.program_id(1)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                            # (BQ, BK)
    if masked:
        k_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_idx < n_k, s, _NEG_INF)
    p = jnp.exp2(s - lse_ref[0][:, 0:1])
    do = do_ref[0]
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0][:, 0:1])
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nqb - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * inv_alpha).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(scale, bq, bk, interpret, residuals, g):
    q, k, v, o, lse = residuals
    return _bwd_part(scale, bq, bk, interpret)(q, k, v, o, lse, g)


@cached_partitioned
def _bwd_part(scale, bq, bk, interpret):
    def fun(q, k, v, o, lse, g):
        return _flash_bwd_impl(q, k, v, o, lse, g, scale, bq, bk, interpret)

    return fun, 3, True


def _flash_bwd_impl(q, k, v, o, lse, g, scale, bq, bk, interpret):
    bh, n_q, d = q.shape
    n_k = k.shape[1]
    n_qp = _cdiv(n_q, bq) * bq
    n_kp = _cdiv(n_k, bk) * bk

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    alpha = scale * _LOG2E
    qp = _pad_to((q.astype(jnp.float32) * alpha).astype(q.dtype), n_qp, 1)
    dop = _pad_to(g, n_qp, 1)
    kp = _pad_to(k, n_kp, 1)
    vp = _pad_to((v.astype(jnp.float32) * scale).astype(v.dtype), n_kp, 1)
    # lse/delta carried as 128 identical lanes (tile-aligned); padded q rows
    # get lse=+inf so p = exp2(ŝ - inf) = 0 and contribute nothing to dK/dV.
    lsep = lse * _LOG2E
    if n_qp > n_q:   # concat, not .at[].set — see the kmask note above
        lsep = jnp.concatenate(
            [lsep, jnp.full((bh, n_qp - n_q, *lsep.shape[2:]), jnp.inf,
                            lsep.dtype)], axis=1)
    deltap = jnp.broadcast_to(_pad_to(delta * scale, n_qp, 1)[:, :, None],
                              (bh, n_qp, 128))

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0)),
    ]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, n_k=n_k, bk=bk, masked=n_kp != n_k),
        grid=(bh, n_qp // bq, n_kp // bk),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0))],
        out_shape=[jax.ShapeDtypeStruct((bh, n_qp, d), q.dtype)],
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)[0]

    # dK/dV: grid puts the K block on axis 1 (parallel) and sweeps Q blocks
    # on the trailing sequential axis so the accumulators persist.
    dkv_specs = [
        pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
        pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, bq, 128), lambda b, j, i: (b, i, 0)),
        pl.BlockSpec((1, bq, 128), lambda b, j, i: (b, i, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, n_k=n_k, bk=bk, masked=n_kp != n_k,
                          inv_alpha=1.0 / alpha),
        grid=(bh, n_kp // bk, n_qp // bq),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_kp, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_kp, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    return dq[:, :n_q], dk[:, :n_k], dv[:, :n_k]


# --------------------------------------------------------------------------- #
# public entry                                                                #
# --------------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core(q, k, v, scale, bq, bk, interpret):
    o, _ = _fwd_part(scale, bq, bk, interpret)(q, k, v)
    return o


def _flash_core_fwd(q, k, v, scale, bq, bk, interpret):
    o, lse = _fwd_part(scale, bq, bk, interpret)(q, k, v)
    return o, (q, k, v, o, lse)


_flash_core.defvjp(_flash_core_fwd, _flash_bwd)


def flash_attention_masked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray,
    *,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """FORWARD-ONLY flash attention with an arbitrary key-validity mask.

    key_valid: (N_k,) bool — False keys get −1e30 on the mask bias-feature
    row (exactly the tail-pad mechanism, at arbitrary positions).  Used by
    the inference trunk's padded-token layout (`nn/aggregator.run_trunk`):
    per-frame token counts are padded to a sublane multiple so the
    frame↔global reshapes are layout bitcasts instead of ~0.8 ms/layer
    repack copies (measured r5, `tools/trunk_bisect.py`).  Transposed
    schedule only (D < 128, multiple of 8 — the trunk shape); no VJP:
    training paths keep the unpadded layout.
    """
    if interpret is None:
        interpret = not _mosaic_target()
    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    assert d % 8 == 0 and d % 128 != 0, (
        "flash_attention_masked supports the transposed schedule only "
        f"(D={d})")
    scale = d ** -0.5 if scale is None else scale
    block_q = DEFAULT_BQ_T if block_q is None else block_q
    block_k = DEFAULT_BK_T if block_k is None else block_k
    n_q128 = _cdiv(n_q, 128) * 128
    n_k128 = _cdiv(n_k, 128) * 128
    bq = n_q128 if n_q128 <= block_q + 256 else block_q
    bk = n_k128 if n_k128 <= block_k + 256 else block_k

    def to_dh(x, n):
        return jnp.transpose(x, (0, 2, 3, 1)).reshape(b * h, d, n)

    kv_bias = jnp.broadcast_to(
        jnp.where(key_valid, 0.0, _NEG_INF).astype(jnp.float32)[None, None],
        (b * h, 1, n_k))
    ot, _ = _fwd_t_masked_part(scale, bq, bk, interpret)(
        to_dh(q, n_q), to_dh(k, n_k), to_dh(v, n_k), kv_bias)
    return jnp.transpose(ot.reshape(b, h, d, n_q), (0, 3, 1, 2))


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
    layout: str = "auto",
) -> jnp.ndarray:
    """Flash attention over (B, N, H, D) tensors (non-causal, full).

    layout:
      * "natural"    — classic schedule; D zero-padded to the 128-lane width
        (inert: masked keys, zero feature columns);
      * "transposed" — head-dim-on-sublanes schedule (`_fwd_kernel_t`): no
        D padding, full-lane PV matmul; wins whenever D < 128;
      * "auto"       — transposed iff D is a sub-lane-width multiple of 8.
    """
    if interpret is None:
        interpret = not _mosaic_target()
    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    scale = d ** -0.5 if scale is None else scale

    use_t = (layout == "transposed"
             or (layout == "auto" and d % 128 != 0 and d % 8 == 0))
    block_q = (DEFAULT_BQ_T if use_t else DEFAULT_BQ) \
        if block_q is None else block_q
    block_k = (DEFAULT_BK_T if use_t else DEFAULT_BK) \
        if block_k is None else block_k

    # Short sequences become ONE rounded block instead of padding up to the
    # default block size (N=1029 with block 1024 would pad to 2048 — ~4× QK
    # waste at the VGGT frame-attention shape).
    n_q128 = _cdiv(n_q, 128) * 128
    n_k128 = _cdiv(n_k, 128) * 128
    bq = n_q128 if n_q128 <= block_q + 256 else block_q
    bk = n_k128 if n_k128 <= block_k + 256 else block_k
    if use_t:
        def to_dh(x, n):
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(b * h, d, n)

        ot = _flash_core_t(to_dh(q, n_q), to_dh(k, n_k), to_dh(v, n_k),
                           scale, bq, bk, interpret)
        return jnp.transpose(ot.reshape(b, h, d, n_q), (0, 3, 1, 2))

    d_pad = max(128, _cdiv(d, 128) * 128)

    def to_bh(x, n):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d)
        return _pad_to(x, d_pad, 2) if d_pad != d else x

    o = _flash_core(to_bh(q, n_q), to_bh(k, n_k), to_bh(v, n_k),
                    scale, bq, bk, interpret)
    o = o[..., :d].reshape(b, h, n_q, d)
    return jnp.swapaxes(o, 1, 2)
