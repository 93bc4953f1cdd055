"""SH rotation (`ops/sh_rotation.py`) vs the renderer's own basis.

Reference: `src/misc/sh_rotation.py:10-38` (e3nn Wigner-D).  e3nn is not in
the image, so instead of matrix-level parity we pin the *defining property*
against `kernels/rasterizer.eval_sh` (the basis every render uses):
appearance is preserved —  eval(rotate_sh(c, R), R d) == eval(c, d) —
plus group structure (identity, composition, orthogonality).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vist3a_tpu.kernels.rasterizer import eval_sh
from vist3a_tpu.ops.sh_rotation import rotate_sh, sh_rotation_matrices


def _random_rotation(rng) -> np.ndarray:
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


@pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
def test_appearance_invariance(degree):
    rng = np.random.default_rng(degree)
    n = (degree + 1) ** 2
    c = rng.standard_normal((3, n)).astype(np.float32) * 0.2
    c[:, 0] += 5.0  # keep eval_sh out of its clamp region
    rot = _random_rotation(rng).astype(np.float32)
    dirs = rng.standard_normal((64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    c_rot = rotate_sh(jnp.asarray(c), jnp.asarray(rot))
    before = eval_sh(jnp.asarray(c)[None], jnp.asarray(dirs)[:, None], degree)
    after = eval_sh(c_rot[None], jnp.asarray(dirs @ rot.T)[:, None], degree)
    np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                               rtol=2e-4, atol=2e-5)


def test_identity_and_composition():
    rng = np.random.default_rng(0)
    c = rng.standard_normal((25,)).astype(np.float32)
    eye = jnp.eye(3)
    np.testing.assert_allclose(np.asarray(rotate_sh(jnp.asarray(c), eye)),
                               c, rtol=1e-5, atol=1e-6)
    r1 = _random_rotation(rng).astype(np.float32)
    r2 = _random_rotation(rng).astype(np.float32)
    once = rotate_sh(jnp.asarray(c), jnp.asarray(r1 @ r2))
    twice = rotate_sh(rotate_sh(jnp.asarray(c), jnp.asarray(r2)),
                      jnp.asarray(r1))
    np.testing.assert_allclose(np.asarray(once), np.asarray(twice),
                               rtol=1e-4, atol=1e-5)


def test_blocks_orthogonal_and_batched():
    rng = np.random.default_rng(1)
    rots = np.stack([_random_rotation(rng) for _ in range(5)]).astype(
        np.float32)
    mats = sh_rotation_matrices(jnp.asarray(rots), 4)
    assert [m.shape[-1] for m in mats] == [1, 3, 5, 7, 9]
    for m in mats:
        m = np.asarray(m)
        prod = np.einsum("bij,bkj->bik", m, m)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(m.shape[-1]), prod.shape),
            atol=1e-4)
    # batched == per-item
    c = rng.standard_normal((5, 25)).astype(np.float32)
    batched = np.asarray(rotate_sh(jnp.asarray(c), jnp.asarray(rots)))
    for i in range(5):
        single = np.asarray(rotate_sh(jnp.asarray(c[i]),
                                      jnp.asarray(rots[i])))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-6)
