"""Host-side checkpoint deserialization (.pt / .safetensors → numpy dicts).

The reference ships torch checkpoints (`anysplat_stitched.pth`, VGGT-1B,
Wan diffusers shards, PEFT lora dirs — `download_checkpoints.sh`).  torch
(CPU) is used ONLY to deserialize on host; everything downstream is numpy →
`vist3a_tpu.io.weight_import` mappers.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np


def load_torch_state_dict(path) -> dict:
    """.pt/.pth/.bin → {name: np.ndarray} (host, CPU)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]

    def to_np(x):
        if isinstance(x, dict):
            return {k: to_np(v) for k, v in x.items()}
        if hasattr(x, "detach"):
            return x.detach().cpu().float().numpy() \
                if x.is_floating_point() else x.detach().cpu().numpy()
        return x

    return to_np(obj)


def load_safetensors(path) -> dict:
    from safetensors.numpy import load_file

    return load_file(path)


def load_sharded_safetensors(model_dir) -> dict:
    """HF hub layout: model.safetensors or model.safetensors.index.json."""
    model_dir = Path(model_dir)
    single = model_dir / "model.safetensors"
    if single.exists():
        return load_safetensors(single)
    index = model_dir / "model.safetensors.index.json"
    if index.exists():
        shards = set(json.loads(index.read_text())["weight_map"].values())
        out = {}
        for shard in sorted(shards):
            out.update(load_safetensors(model_dir / shard))
        return out
    files = sorted(model_dir.glob("*.safetensors"))
    if files:
        out = {}
        for f in files:
            out.update(load_safetensors(f))
        return out
    raise FileNotFoundError(f"no safetensors found under {model_dir}")
