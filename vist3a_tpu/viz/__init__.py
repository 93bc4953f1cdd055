"""Visualization helpers.

TPU-native counterpart of the reference's
`third_party_model/anysplat/src/visualization/` package: camera
trajectories (`trajectories`), image layout/labels/colors
(`layout`/`annotation`/`colors`/`color_map`), anti-aliased primitive
drawing (`drawing`), and 3-D validation renders (`validation_in_3d`).
"""

from vist3a_tpu.viz.annotation import add_label, draw_label  # noqa: F401
from vist3a_tpu.viz.color_map import (  # noqa: F401
    apply_color_map,
    apply_color_map_2d,
    apply_color_map_to_image,
)
from vist3a_tpu.viz.colors import get_distinct_color  # noqa: F401
from vist3a_tpu.viz.drawing import (  # noqa: F401
    draw_cameras,
    draw_lines,
    draw_points,
)
from vist3a_tpu.viz.layout import (  # noqa: F401
    add_border,
    hcat,
    overlay,
    vcat,
)
from vist3a_tpu.viz.validation_in_3d import (  # noqa: F401
    pad,
    render_camera_poses,
    render_projections,
)
from vist3a_tpu.viz.trajectories import (  # noqa: F401
    generate_spin,
    generate_wobble,
    generate_wobble_transformation,
    interpolate_extrinsics,
    interpolate_intrinsics,
)
