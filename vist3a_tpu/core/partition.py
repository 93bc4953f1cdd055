"""Path-predicate pytree partitioning (the functional analogue of
`requires_grad`).

The reference freezes/unfreezes parameters by flipping `requires_grad` on
module attributes (`model_stitching_training.py:218-241`,
`utils/lora_util/utils.py:15-31`).  In JAX, trainability is which subtree we
differentiate: `partition` splits a nested-dict params tree into a trainable
tree and a frozen tree by a predicate over key paths; `combine` reassembles.
Both sides keep the full nesting so module `apply` functions see the same
structure after `combine`.
"""

from __future__ import annotations

from typing import Callable

import jax

_MISSING = None  # placeholder at extracted positions


def _is_leaf(x) -> bool:
    return not isinstance(x, (dict, list))


def partition(tree, predicate: Callable[[tuple], bool], _path=()):
    """Split `tree` (nested dicts/lists of arrays) by `predicate(path)`.

    Returns (taken, rest) with identical nesting; positions belonging to the
    other side hold None.  `path` is a tuple of dict keys / list indices down
    to the leaf.
    """
    if _is_leaf(tree):
        return (tree, _MISSING) if predicate(_path) else (_MISSING, tree)
    if isinstance(tree, list):
        pairs = [partition(v, predicate, _path + (i,))
                 for i, v in enumerate(tree)]
        return [p[0] for p in pairs], [p[1] for p in pairs]
    taken, rest = {}, {}
    for k, v in tree.items():
        t, r = partition(v, predicate, _path + (k,))
        taken[k] = t
        rest[k] = r
    return taken, rest


def combine(a, b):
    """Inverse of `partition`: prefer non-None entries; recurse containers."""
    if a is _MISSING:
        return b
    if b is _MISSING:
        return a
    if isinstance(a, dict):
        return {k: combine(a[k], b[k]) for k in a}
    if isinstance(a, list):
        return [combine(x, y) for x, y in zip(a, b)]
    raise ValueError("partitioned trees overlap at a leaf")


def prune(tree):
    """Drop None placeholders (for counting / checkpointing the taken side)."""
    def _empty(v):
        return v is None or (isinstance(v, (dict, list)) and not v)

    if _is_leaf(tree):
        return tree
    if isinstance(tree, list):
        return [v for v in (prune(x) for x in tree) if not _empty(v)]
    out = {}
    for k, v in tree.items():
        p = prune(v)
        if not _empty(p):
            out[k] = p
    return out


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def graft(tree, overrides):
    """Overlay `overrides` leaves onto `tree` at matching paths (loaded
    checkpoint values over base weights)."""
    if overrides is None:
        return tree
    if _is_leaf(tree) or _is_leaf(overrides):
        return overrides
    if isinstance(tree, list):
        ov = (overrides.get if isinstance(overrides, dict)
              else lambda i: overrides[i] if i < len(overrides) else None)
        return [graft(v, ov(i)) for i, v in enumerate(tree)]
    out = dict(tree)
    for k, v in overrides.items():
        out[k] = graft(tree.get(k), v) if k in tree else v
    return out
