"""Visualization helpers (camera trajectories for rendered fly-throughs).

TPU-native counterpart of the reference's
`third_party_model/anysplat/src/visualization/camera_trajectory/` package.
"""

from vist3a_tpu.viz.trajectories import (  # noqa: F401
    generate_spin,
    generate_wobble,
    generate_wobble_transformation,
    interpolate_extrinsics,
    interpolate_intrinsics,
)
