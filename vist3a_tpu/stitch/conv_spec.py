"""Conv-spec string DSL for the stitching layer.

Grammar-compatible with the reference CLI surface
(`models/stitching_layer_builder.py:48-89`):

    conv{1,2,3}d_k<K>_o<OUT>[_s<S>][_p<P>][_d<D>]

where each of K/S/P/D is either an int or an ``x``-joined tuple, e.g. the
canonical VIST3A stitch ``conv3d_k5x3x3_o1024_s1x2x2_p2x1x1`` (16ch latent →
1024ch tokens, spatial stride 2).  The reference builds an ``nn.ConvNd`` with
``padding_mode="replicate"``; here we build a functional JAX conv: edge-pad
with ``jnp.pad(mode="edge")`` then a VALID `lax.conv_general_dilated`, which
XLA maps onto the MXU.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOrTuple = Union[int, Tuple[int, ...]]

_SPEC_RE = re.compile(
    r"^conv(?P<dim>[123])d"
    r"_k(?P<k>[0-9x]+)"
    r"_o(?P<o>[0-9]+)"
    r"(?:_s(?P<s>[0-9x]+))?"
    r"(?:_p(?P<p>[0-9x]+))?"
    r"(?:_d(?P<d>[0-9x]+))?$",
    re.IGNORECASE,
)


def _parse_num(txt: str | None, default: int) -> IntOrTuple:
    if not txt:
        return default
    if "x" in txt:
        return tuple(int(t) for t in txt.split("x"))
    return int(txt)


def _as_tuple(v: IntOrTuple, dim: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * dim
    if len(v) != dim:
        raise ValueError(f"expected {dim}-tuple, got {v}")
    return tuple(v)


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """Declarative N-d convolution spec (N in {1,2,3})."""

    dim: int
    out_channels: int
    kernel_size: IntOrTuple
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    dilation: IntOrTuple = 1

    # ---- shapes -----------------------------------------------------------
    def kernel_shape(self, in_channels: int) -> Tuple[int, ...]:
        """OIX... kernel layout (out, in, *spatial) — matches torch convs so
        imported reference weights drop in without transposition."""
        return (self.out_channels, in_channels, *_as_tuple(self.kernel_size, self.dim))

    # ---- params -----------------------------------------------------------
    def init(self, key: jax.Array, in_channels: int, bias: bool = True,
             dtype=jnp.float32) -> dict:
        kshape = self.kernel_shape(in_channels)
        fan_in = in_channels
        for k in _as_tuple(self.kernel_size, self.dim):
            fan_in *= k
        bound = 1.0 / jnp.sqrt(fan_in)
        wkey, bkey = jax.random.split(key)
        params = {"kernel": jax.random.uniform(wkey, kshape, dtype, -bound, bound)}
        if bias:
            params["bias"] = jax.random.uniform(
                bkey, (self.out_channels,), dtype, -bound, bound
            )
        return params

    # ---- forward ----------------------------------------------------------
    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, C_in, *spatial) channel-first, like the reference pipeline.

        Replicate (edge) padding applied explicitly, then VALID conv.
        """
        dim = self.dim
        pad = _as_tuple(self.padding, dim)
        if any(pad):
            pad_cfg = [(0, 0), (0, 0)] + [(p, p) for p in pad]
            x = jnp.pad(x, pad_cfg, mode="edge")
        dn = lax.conv_dimension_numbers(
            x.shape,
            params["kernel"].shape,
            ("NC" + "DHW"[3 - dim:], "OI" + "DHW"[3 - dim:], "NC" + "DHW"[3 - dim:]),
        )
        # fp32 inputs get true-fp32 math; bf16 inputs ride the MXU fast path
        # (default matmul precision in this stack rounds fp32 operands to
        # bf16 otherwise — see tests/test_conv_spec.py).
        precision = "highest" if x.dtype == jnp.float32 else None
        out = lax.conv_general_dilated(
            x,
            params["kernel"].astype(x.dtype),
            window_strides=_as_tuple(self.stride, dim),
            padding="VALID",
            rhs_dilation=_as_tuple(self.dilation, dim),
            dimension_numbers=dn,
            precision=precision,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if "bias" in params:
            b = params["bias"].astype(x.dtype)
            out = out + b.reshape((1, -1) + (1,) * dim)
        return out


def parse_conv_spec(spec: str) -> ConvSpec:
    """Parse ``conv3d_k5x3x3_o1024_s1x2x2_p2x1x1`` → ConvSpec.

    Raises ValueError on grammar violations (same contract as the reference
    parser, `models/stitching_layer_builder.py:69-89`).
    """
    m = _SPEC_RE.fullmatch(spec)
    if not m:
        raise ValueError(
            f"Bad conv spec {spec!r}; expected e.g. 'conv2d_k3_o64', "
            "'conv3d_k5x3x3_o1024_s1x2x2_p2x1x1'"
        )
    g = m.groupdict()
    return ConvSpec(
        dim=int(g["dim"]),
        out_channels=int(g["o"]),
        kernel_size=_parse_num(g["k"], 1),
        stride=_parse_num(g["s"], 1),
        padding=_parse_num(g["p"], 0),
        dilation=_parse_num(g["d"], 1),
    )


# Canonical VIST3A stitching layer (16-ch Wan latent → 1024-d ViT tokens).
CANONICAL_STITCH_SPEC = "conv3d_k5x3x3_o1024_s1x2x2_p2x1x1"


def conv_spec_to_string(spec: "ConvSpec") -> str:
    """Inverse of `parse_conv_spec` (canonical form)."""
    def fmt(v):
        return "x".join(str(x) for x in v) if isinstance(v, tuple) else str(v)

    s = f"conv{spec.dim}d_k{fmt(spec.kernel_size)}_o{spec.out_channels}"
    if spec.stride != 1:
        s += f"_s{fmt(spec.stride)}"
    if spec.padding != 0:
        s += f"_p{fmt(spec.padding)}"
    if spec.dilation != 1:
        s += f"_d{fmt(spec.dilation)}"
    return s
