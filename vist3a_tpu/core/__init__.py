from vist3a_tpu.core.mesh import MeshConfig, create_mesh, shard_batch, replicate
from vist3a_tpu.core.precision import Policy, DEFAULT_POLICY, HEAD_POLICY
from vist3a_tpu.core.prng import fold_in_step, fold_in_host, synced_randint, synced_choice

__all__ = [
    "MeshConfig",
    "create_mesh",
    "shard_batch",
    "replicate",
    "Policy",
    "DEFAULT_POLICY",
    "HEAD_POLICY",
    "fold_in_step",
    "fold_in_host",
    "synced_randint",
    "synced_choice",
]
