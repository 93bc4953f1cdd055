import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vist3a_tpu.core.mesh import MeshConfig, create_mesh, fsdp_sharding, shard_batch
from vist3a_tpu.core.prng import synced_choice, synced_perm_take, synced_randint


def test_mesh_shape(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_mesh_infer_data_axis():
    mesh = create_mesh(MeshConfig(model=2))
    assert mesh.shape["data"] * 2 == len(jax.devices())


def test_shard_batch_and_psum(mesh8):
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xs = shard_batch(mesh8, x)
    assert xs.sharding.spec == P("data")
    # jit a sum — XLA inserts the collective
    total = jax.jit(lambda a: a.sum())(xs)
    assert float(total) == x.sum()


def test_fsdp_sharding_places_large_leaves(mesh8):
    params = {
        "big": jnp.zeros((1024, 512)),
        "small": jnp.zeros((7,)),
    }
    placed = fsdp_sharding(mesh8, params, min_size=2**10)
    assert placed["big"].sharding.spec in (P("data"), P("data", None), P(None, "data"))
    assert placed["small"].sharding.spec == P()
    # matmul against sharded params still works under jit
    y = jax.jit(lambda p, x: x @ p["big"])(placed, jnp.ones((2, 1024)))
    assert y.shape == (2, 512)


def test_synced_randomness_is_deterministic():
    key = jax.random.key(23)
    a = synced_randint(key, 7, 0, 100)
    b = synced_randint(key, 7, 0, 100)
    assert a == b
    assert synced_choice(key, 3, [9, 13, 17, 21]) in (9, 13, 17, 21)
    p1 = synced_perm_take(key, 5, 50, 2)
    p2 = synced_perm_take(key, 5, 50, 2)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert len(set(np.asarray(p1).tolist())) == 2
