"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip behaviour (pjit sharding, FSDP placement, collectives) is validated
on CPU via XLA's host-platform device-count flag, per the build contract.
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests run on a virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Something in this image appends the axon TPU plugin to jax_platforms even
# when the env var says cpu — override at the config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache (works on the CPU backend): the suite is
# compile-dominated (the mesh CLI/RL tests build multi-minute programs), and
# re-runs hit the cache instead — measured 6x on a synthetic repeat, and it
# survives across processes.  Keyed by HLO + flags hash, so code changes
# invalidate exactly the programs they touch.  Dir is repo-local and
# gitignored; only >2 s compiles are cached to bound its size.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from vist3a_tpu.core.mesh import MeshConfig, create_mesh

    return create_mesh(MeshConfig(data=4, model=2))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
