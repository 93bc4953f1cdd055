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
    # the reference's first-party `utils` package (lora_util etc.)
    "utils": "utils",
    "utils.lora_util": "utils/lora_util",
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
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
    # wandb integration probe) doesn't choke on the stub
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
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


def _ensure_diffusers_stubs():
    """Minimal diffusers API surface so `utils/wan_utils.py` imports: mixins,
    the diagonal-Gaussian posterior, and trivial decorators.  Faithful enough
    for numeric parity tests (mode/sample math matches diffusers)."""
    if "diffusers" in sys.modules:
        return
    import torch
    import torch.nn as nn

    def _mod(name):
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    root = _mod("diffusers")
    cfgu = _mod("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        return fn

    cfgu.ConfigMixin = ConfigMixin
    cfgu.register_to_config = register_to_config

    sfm = _mod("diffusers.loaders")
    sfm = _mod("diffusers.loaders.single_file_model")

    class FromOriginalModelMixin:
        pass

    sfm.FromOriginalModelMixin = FromOriginalModelMixin

    acts = _mod("diffusers.models")
    acts = _mod("diffusers.models.activations")
    acts.get_activation = lambda name: {"silu": nn.SiLU()}[name]

    vae = _mod("diffusers.models.autoencoders")
    vae = _mod("diffusers.models.autoencoders.vae")

    class DecoderOutput:
        def __init__(self, sample):
            self.sample = sample

    class DiagonalGaussianDistribution:
        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
            self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
            self.std = torch.exp(0.5 * self.logvar)

        def mode(self):
            return self.mean

        def sample(self, generator=None):
            return self.mean + self.std * torch.randn_like(self.mean)

    vae.DecoderOutput = DecoderOutput
    vae.DiagonalGaussianDistribution = DiagonalGaussianDistribution

    mo = _mod("diffusers.models.modeling_outputs")

    class AutoencoderKLOutput:
        def __init__(self, latent_dist):
            self.latent_dist = latent_dist

    mo.AutoencoderKLOutput = AutoencoderKLOutput

    mu = _mod("diffusers.models.modeling_utils")
    mu.ModelMixin = nn.Module

    wp = _mod("diffusers.pipelines")
    wp = _mod("diffusers.pipelines.wan")
    wp = _mod("diffusers.pipelines.wan.pipeline_wan")
    wp.prompt_clean = lambda s: " ".join(s.split())

    au = _mod("diffusers.utils")
    au = _mod("diffusers.utils.accelerate_utils")
    au.apply_forward_hook = lambda fn: fn


def available() -> bool:
    return REF.exists()


def setup() -> None:
    """Register parent namespaces + dependency stubs. Idempotent."""
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    for name in _STUBS:
        _ensure_stub(name)
    _ensure_diffusers_stubs()
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
