"""Functional LoRA: low-rank deltas as a separate pytree, merged at apply.

Reference: `utils/lora_util/` — a Microsoft-LoRA fork that REPLACES
`nn.Linear` / `nn.Conv2d` modules in-place (`utils.py:139-189`) with layers
holding `lora_A` (r, in) kaiming-init and `lora_B` (out, r) zero-init,
applied as `W + (B @ A) * alpha / r` (`layers.py:105-175`).  Conv2d uses
`lora_A (r·k, in·k)`, `lora_B (out·k, r·k)` with the product reshaped to the
OIHW kernel (`layers.py:178-260`).  The spec DSL `r64,a32,d0.0,f0` plus
`b<bias>`, `t<a|b>`, `enc`, `fix_head` is `utils.py:68-117`.

TPU-native design: no module surgery.  `init_lora` builds a pytree that
mirrors the params tree with `{"a","b"}` factors at every eligible site
(dicts holding a linear "w" or a square conv "kernel"); `merge_lora` returns
base-plus-delta params for the unchanged apply functions.  Stacked block
params (leading layer axis from `stack_init`) get stacked factors and merge
via one batched matmul — the whole merge is a handful of MXU calls fused
into the step under jit.  Factor layout is transposed to JAX convention
(a = torch lora_Aᵀ, b = torch lora_Bᵀ) so `w + (a @ b)·s` needs no
transposes; the torch importer/exporter converts.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# conv-transpose sites (DPT "resize" upsamplers) are NOT wrapped by the
# reference (`add_lora` targets nn.Linear/nn.Conv2d only, `utils.py:146-150`)
_EXCLUDED_KEYS = ("resize0", "resize1")


@dataclasses.dataclass
class LoraConfig:
    r: int = 8
    alpha: int = 32
    dropout: float = 0.0
    bias: str = "lora_only"
    target_modules: Optional[Tuple[str, ...]] = None
    fan_in_fan_out: bool = False
    finetune_encoder: bool = False
    freeze_head: bool = False

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def parse_lora_mode(spec: str) -> LoraConfig:
    """Grammar parity with `utils/lora_util/utils.py:68-117`."""
    cfg = LoraConfig()
    pattern = re.compile(
        r"(?P<key>[radbft])(?:(?P<num>[\d.]+)|(?P<str>[^,]+))")
    for chunk in spec.split(","):
        chunk = chunk.strip().lower()
        if not chunk:
            continue
        if chunk == "enc":
            cfg.finetune_encoder = True
            continue
        if chunk in {"fix_head", "fixhead"}:
            cfg.freeze_head = True
            continue
        m = pattern.fullmatch(chunk)
        if not m:
            raise ValueError(f"Bad LoRA chunk: {chunk!r}")
        k = m["key"]
        if k == "r":
            cfg.r = int(m["num"])
        elif k == "a":
            cfg.alpha = int(m["num"])
        elif k == "d":
            cfg.dropout = float(m["num"])
        elif k == "b":
            cfg.bias = m["str"]
            if cfg.bias not in {"none", "all", "lora_only"}:
                raise ValueError("b chunk must be none|all|lora_only")
        elif k == "t":
            cfg.target_modules = tuple(m["str"].split("|"))
        elif k == "f":
            cfg.fan_in_fan_out = bool(int(m["num"]))
    return cfg


# --------------------------------------------------------------------------- #
# site discovery                                                              #
# --------------------------------------------------------------------------- #
def _site_kind(node) -> Optional[str]:
    """'linear' | 'conv' | 'conv_hwio' | None for a params dict node."""
    if not isinstance(node, dict):
        return None
    if "w" in node and getattr(node["w"], "ndim", 0) in (2, 3):
        return "linear"
    k = node.get("kernel")
    if k is not None and k.ndim == 4 and k.shape[-1] == k.shape[-2]:
        return "conv"
    k = node.get("kernel_hwio")
    if k is not None and k.ndim == 4 and k.shape[0] == k.shape[1]:
        return "conv_hwio"
    for key in node:
        if isinstance(key, str) and key.startswith("kernel_mat"):
            return f"conv_mat{key[len('kernel_mat'):]}"
    return None


def _path_matches(path: tuple, targets: Optional[Tuple[str, ...]]) -> bool:
    if not targets:
        return True
    name = "/".join(str(p) for p in path)
    return any(t in name for t in targets)


def lora_sites(params, cfg: LoraConfig):
    """Yield (path, kind, node) for every eligible site."""
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            kind = _site_kind(node)
            if kind is not None:
                if path and path[-1] in _EXCLUDED_KEYS:
                    return
                if _path_matches(path, cfg.target_modules):
                    out.append((path, kind, node))
                return
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(params, ())
    return out


def _init_site(key, kind, node, r, dtype):
    if kind == "linear":
        w = node["w"]
        if w.ndim == 2:
            d_in, d_out = w.shape
            bound = 1.0 / jnp.sqrt(d_in)
            a = jax.random.uniform(key, (d_in, r), dtype, -bound, bound)
            b = jnp.zeros((r, d_out), dtype)
        else:  # stacked (L, in, out): independent kaiming per layer
            n_l, d_in, d_out = w.shape
            bound = 1.0 / jnp.sqrt(d_in)
            a = jax.random.uniform(key, (n_l, d_in, r), dtype, -bound, bound)
            b = jnp.zeros((n_l, r, d_out), dtype)
    else:  # conv (OIHW) / conv_hwio (convT) / conv_mat<k> — same factors
        if kind == "conv":
            o, i, kh, kw = node["kernel"].shape
        elif kind == "conv_hwio":
            kh, kw, i, o = node["kernel_hwio"].shape
        else:
            kh = kw = int(kind[len("conv_mat"):])
            mat = node[f"kernel_mat{kh}"]
            i, o = mat.shape[0] // (kh * kw), mat.shape[1]
        # torch ConvLoRA: A (r·k, i·k) kaiming(fan_in=i·k), B (o·k, r·k) zeros
        bound = 1.0 / jnp.sqrt(i * kh)
        a = jax.random.uniform(key, (i * kh, r * kh), dtype, -bound, bound)
        b = jnp.zeros((r * kh, o * kw), dtype)
    return {"a": a, "b": b}


def init_lora(key, params, cfg: LoraConfig, dtype=jnp.float32):
    """LoRA pytree mirroring `params` with {"a","b"} at each eligible site."""
    sites = lora_sites(params, cfg)
    keys = jax.random.split(key, max(len(sites), 1))
    tree: dict = {}
    for sk, (path, kind, node) in zip(keys, sites):
        cur = tree
        for p in path[:-1]:
            cur = cur.setdefault(p, {})
        cur[path[-1]] = _init_site(sk, kind, node, cfg.r, dtype)
    return tree


def _merge_site(node, factors, kind, scaling):
    a, b = factors["a"], factors["b"]
    if kind == "linear":
        w = node["w"]
        delta = (jnp.matmul(a, b) * scaling).astype(w.dtype)
        return {**node, "w": w + delta}
    if kind == "conv":
        kern = node["kernel"]
        o, i, kh, kw = kern.shape
        # torch: (B@A).view(o,i,kh,kw) with B (o·k, r·k), A (r·k, i·k)
        # (`layers.py:350-355`) — a flat reshape of the (o·k, i·k) product.
        # Our transposed factors give a@b = (B@A)ᵀ; transpose back + reshape.
        delta = (jnp.matmul(a, b) * scaling).astype(kern.dtype)
        delta = delta.T.reshape(o, i, kh, kw)
        return {**node, "kernel": kern + delta}
    if kind == "conv_hwio":
        kern = node["kernel_hwio"]
        kh, kw, i, o = kern.shape
        delta = (jnp.matmul(a, b) * scaling).astype(kern.dtype)
        delta = delta.T.reshape(o, i, kh, kw).transpose(2, 3, 1, 0)
        return {**node, "kernel_hwio": kern + delta}
    # conv_mat<k>: merged kernel stays a 2D (kh·kw·i, o) matrix end to end —
    # the add, its remat residual, and its cotangent are all cleanly tiled
    # (the 4D conv-kernel layout padded 3×3 dims 56.9×, see nn/heads.py)
    kh = kw = int(kind[len("conv_mat"):])
    key = f"kernel_mat{kh}"
    kern = node[key]
    i, o = kern.shape[0] // (kh * kw), kern.shape[1]
    delta = (jnp.matmul(a, b) * scaling).astype(kern.dtype)
    delta = delta.T.reshape(o, i, kh, kw).transpose(2, 3, 1, 0)
    delta = delta.reshape(kh * kw * i, o)
    return {**node, key: kern + delta}


def merge_lora(params, lora, cfg: LoraConfig):
    """Return params with LoRA deltas added wherever `lora` has factors."""
    scaling = cfg.scaling

    def walk(node, ltree):
        if ltree is None or ltree == {}:
            return node
        if isinstance(node, dict):
            kind = _site_kind(node)
            if kind is not None and "a" in ltree:
                return _merge_site(node, ltree, kind, scaling)
            return {k: walk(v, ltree.get(k)) if isinstance(ltree, dict)
                    else v for k, v in node.items()}
        if isinstance(node, list):
            if isinstance(ltree, dict):  # list indices stored as int keys
                return [walk(v, ltree.get(i)) for i, v in enumerate(node)]
            return [walk(v, lt) for v, lt in zip(node, ltree)]
        return node

    return walk(params, lora)


def lora_bias_predicate(params, cfg: LoraConfig):
    """Path predicate for biases made trainable by bias='lora_only'
    (`utils/lora_util/utils.py:27-31`): the bias of every wrapped layer."""
    site_paths = {path for path, _, _ in lora_sites(params, cfg)}

    def pred(path: tuple) -> bool:
        return (len(path) >= 2 and path[-1] in ("b", "bias")
                and path[:-1] in site_paths)

    return pred


def lora_from_flat(flat: dict, params) -> dict:
    """Flat {"path/with/slashes": {"a","b"[,"bias"]}} (e.g. from
    `import_stitched_checkpoint`) → nested LoRA tree matching `params`,
    stacking per-block entries onto the leading layer axis of `stack_init`
    stacks (zero rows where a layer has no entry — chopped ViT blocks).

    Returns (lora_tree, bias_overrides) — bias_overrides is a nested tree of
    {"b"/"bias"} leaves to graft onto the base params (bias="lora_only"
    checkpoints carry trained biases).  Digit path parts become int keys so
    `merge_lora`/`graft` can address list sites (e.g. depth_head/projects/0).
    """
    lora: dict = {}
    biases: dict = {}

    def set_path(tree, parts, leaf_key, value):
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur.setdefault(parts[-1], {})[leaf_key] = value

    def site_shape(parts):
        node = params
        for p in parts:
            node = node[p]
        return node

    def bias_leaf_key(site_parts):
        node = site_shape(site_parts)
        return "b" if isinstance(node, dict) and "w" in node else "bias"

    for path, factors in flat.items():
        parts = [int(p) if p.isdigit() else p for p in path.split("/")]
        # stacked block index: ".../blocks/{i}/..." or frame/global_blocks
        m = None
        for i, p in enumerate(parts):
            if isinstance(p, str) and (p.endswith("blocks") or p == "trunk"):
                if i + 1 < len(parts) and isinstance(parts[i + 1], int):
                    m = (i, parts[i + 1])
                break
        if m is None:
            for leaf, v in factors.items():
                if leaf in ("a", "b"):
                    set_path(lora, parts, leaf, v)
                else:
                    set_path(biases, parts, bias_leaf_key(parts), v)
            continue
        bi, layer = m
        site = parts[:bi + 1] + parts[bi + 2:]
        node = site_shape(site)
        n_layers = jax.tree_util.tree_leaves(node)[0].shape[0]
        for leaf, v in factors.items():
            cur = lora if leaf in ("a", "b") else biases
            for p in site[:-1]:
                cur = cur.setdefault(p, {})
            slot = cur.setdefault(site[-1], {})
            lk = leaf if leaf in ("a", "b") else bias_leaf_key(site)
            if lk not in slot:
                row_shape = v.shape
                slot[lk] = jnp.zeros((n_layers, *row_shape), v.dtype)
            slot[lk] = slot[lk].at[layer].set(v)
    return lora, biases
