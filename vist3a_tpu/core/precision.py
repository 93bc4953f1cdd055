"""Mixed-precision policy.

Reference conventions (SURVEY §2.4):
  * bf16 autocast for the trunk (`model_stitching_training.py` autocast,
    `utils/utils_for_thirdparty.py:53-69` selective bf16 cast skipping any
    module with "head" in its name),
  * fp32 for the camera/depth/GS heads and pose math
    (`models/anysplat_stitched.py:335`, `src/model/encoder/anysplat.py:421`),
  * fp64 only for the offline ridge solve (done on host numpy here).

On TPU this maps to: bf16 params/activations feeding the MXU, fp32
accumulation (``preferred_element_type``), fp32 heads.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32   # master params
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


# trunk: bf16 compute over fp32 master weights
DEFAULT_POLICY = Policy()
# heads + pose math: fp32 end to end
HEAD_POLICY = Policy(compute_dtype=jnp.float32)
