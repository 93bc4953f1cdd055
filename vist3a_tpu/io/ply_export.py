"""3DGS-standard PLY export (no external plyfile dependency).

Parity target: `src/model/ply_export.py:12-75` — vertex attributes
x,y,z, nx,ny,nz (zeros), f_dc_{0..2}, [f_rest_*], opacity, scale_{0..2}
(log), rot_{0..3} (wxyz quaternion); optional shift-and-scale
normalization; `save_sh_dc_only=True` default (the reference keeps only the
DC band, `inference_t23d.py` export path).  Binary little-endian float32,
which every 3DGS viewer reads.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _attribute_names(num_rest: int) -> list[str]:
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(num_rest)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    return names


def export_ply(means, scales, rotations_xyzw, harmonics, opacities,
               path, *, shift_and_scale: bool = False,
               save_sh_dc_only: bool = True) -> Path:
    """means (G,3), scales (G,3) linear, rotations (G,4) xyzw,
    harmonics (G,3,d_sh), opacities (G,).  Writes wxyz quats and log-scales
    like the reference."""
    path = Path(path)
    means = np.asarray(means, np.float32)
    scales = np.asarray(scales, np.float32)
    rot = np.asarray(rotations_xyzw, np.float32)
    harmonics = np.asarray(harmonics, np.float32)
    opacities = np.asarray(opacities, np.float32)

    if shift_and_scale:
        means = means - np.median(means, axis=0)
        factor = np.quantile(np.abs(means), 0.95, axis=0).max()
        means = means / factor
        scales = scales / factor

    # normalize + xyzw → wxyz (the reference round-trips through scipy,
    # which only normalizes; `ply_export.py:46-50`)
    rot = rot / np.maximum(np.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
    rot_wxyz = np.concatenate([rot[:, 3:4], rot[:, :3]], axis=-1)

    f_dc = harmonics[..., 0]                              # (G, 3)
    f_rest = harmonics[..., 1:].reshape(len(means), -1)   # (G, 3·(d_sh−1))
    num_rest = 0 if save_sh_dc_only else f_rest.shape[1]

    cols = [means, np.zeros_like(means), f_dc]
    if not save_sh_dc_only:
        cols.append(f_rest)
    cols += [opacities[:, None], np.log(np.maximum(scales, 1e-20)), rot_wxyz]
    data = np.ascontiguousarray(np.concatenate(cols, axis=1), np.float32)

    names = _attribute_names(num_rest)
    assert data.shape[1] == len(names)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {len(means)}"]
    header += [f"property float {n}" for n in names]
    header += ["end_header", ""]

    path.parent.mkdir(exist_ok=True, parents=True)
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(data.tobytes())
    return path


def load_ply(path):
    """Inverse of export_ply (for tests/round-trips). Returns dict of
    attribute → (G,) array."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = int(next(h.split()[-1] for h in header
                     if h.startswith("element vertex")))
        names = [h.split()[-1] for h in header
                 if h.startswith("property float")]
        data = np.frombuffer(f.read(), np.float32).reshape(n, len(names))
    return {name: data[:, i] for i, name in enumerate(names)}
