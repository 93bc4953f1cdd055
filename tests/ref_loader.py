"""Load reference torch modules from /root/reference for parity testing.

The reference's package __init__ chains pull heavy, uninstalled deps
(lightning, dacite, gsplat, loguru, ...).  We bypass them: every parent
package is pre-registered in sys.modules as a bare namespace module with the
real directory on __path__, so importing a leaf module executes ONLY that
leaf's file.  Packages whose real __init__ is needed (vggt.layers) are thin
enough to execute directly.

Nothing here is shipped in the framework — read-only test scaffolding.
"""

from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

REF = Path("/root/reference")

_PARENTS = {
    "third_party_model": "third_party_model",
    "third_party_model.anysplat": "third_party_model/anysplat",
    "third_party_model.anysplat.src": "third_party_model/anysplat/src",
    "third_party_model.anysplat.src.model": "third_party_model/anysplat/src/model",
    "third_party_model.anysplat.src.model.encoder":
        "third_party_model/anysplat/src/model/encoder",
    "third_party_model.anysplat.src.model.encoder.common":
        "third_party_model/anysplat/src/model/encoder/common",
    "third_party_model.anysplat.src.model.encoder.heads":
        "third_party_model/anysplat/src/model/encoder/heads",
    "third_party_model.anysplat.src.model.encoder.vggt":
        "third_party_model/anysplat/src/model/encoder/vggt",
    "third_party_model.anysplat.src.model.encoder.vggt.heads":
        "third_party_model/anysplat/src/model/encoder/vggt/heads",
    "third_party_model.anysplat.src.model.encoder.vggt.models":
        "third_party_model/anysplat/src/model/encoder/vggt/models",
    "third_party_model.anysplat.src.model.encoder.vggt.utils":
        "third_party_model/anysplat/src/model/encoder/vggt/utils",
    # vggt.layers has a light real __init__ we must execute (exports Mlp etc.)
}

_STUBS = ("dacite", "gsplat", "torch_scatter", "lpips", "wandb", "loguru",
          "e3nn", "e3nn.o3", "xformers", "xformers.ops")


def _ensure_stub(name):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    if name == "loguru":
        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None
        mod.logger = _L()
    if name == "dacite":
        mod.Config = object
        mod.from_dict = lambda *a, **k: None
    if name == "e3nn.o3":
        mod.matrix_to_angles = lambda *a, **k: None
        mod.wigner_D = lambda *a, **k: None
    sys.modules[name] = mod


def available() -> bool:
    return REF.exists()


def setup() -> None:
    """Register parent namespaces + dependency stubs. Idempotent."""
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    for name in _STUBS:
        _ensure_stub(name)
    for name, rel in _PARENTS.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [str(REF / rel)]
            sys.modules[name] = mod


def load(module_name: str):
    """Import a reference leaf module, e.g.
    'third_party_model.anysplat.src.model.encoder.vggt.heads.dpt_head'."""
    setup()
    return importlib.import_module(module_name)
