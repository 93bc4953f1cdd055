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


def test_fsdp_shardings(mesh8):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vist3a_tpu.core.mesh import fsdp_shardings, shard_params
    from vist3a_tpu.nn import wan_dit

    cfg = wan_dit.WanDiTConfig(dim=64, ffn_dim=128, num_layers=2,
                               num_heads=4, freq_dim=32, text_dim=24)
    params = wan_dit.init(jax.random.key(0), cfg)
    want = wan_dit.forward(params,
                           jax.random.normal(jax.random.key(1),
                                             (1, 16, 2, 8, 8)),
                           jnp.asarray([500.0]),
                           jax.random.normal(jax.random.key(2), (1, 5, 24)),
                           cfg)

    shardings = fsdp_shardings(params, mesh8, min_size=64)
    sharded = shard_params(params, shardings)
    # big leaves actually sharded over the data axis
    blocks_w = sharded["blocks"]["ffn"]["fc1"]["w"]
    assert not blocks_w.sharding.is_fully_replicated
    got = wan_dit.forward(sharded,
                          jax.random.normal(jax.random.key(1),
                                            (1, 16, 2, 8, 8)),
                          jnp.asarray([500.0]),
                          jax.random.normal(jax.random.key(2), (1, 5, 24)),
                          cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
