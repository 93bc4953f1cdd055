"""13-view reward render grad (PARITY '2.71 s' measurement, r5 re-run)."""
import time, jax, jax.numpy as jnp
from tools.raster_probe import make_scene, _rtt
from vist3a_tpu.kernels.rasterizer import rasterize

means, covars, harm, opac, viewmat, K, W, H = make_scene()
g = means.shape[0]
budget = g  # 1xG, the reward-path setting
rtt = _rtt()
print(f"backend={jax.default_backend()} rtt={rtt*1e3:.1f}", flush=True)

# 13 slightly rotated views
import numpy as np
vms = []
for i in range(13):
    a = 0.04 * (i - 6)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    vm = np.eye(4, dtype=np.float32); vm[:3, :3] = R
    vms.append(vm)
vms = jnp.asarray(np.stack(vms))
Ks = jnp.broadcast_to(K, (13, 3, 3))

def loss(means, covars, harm, opac):
    rgb, dep, alp = rasterize(means, covars, harm, opac, vms, Ks, W, H,
                              sh_degree=None, pair_budget=budget,
                              remat_views=True)
    return jnp.mean(rgb) + 0.001 * jnp.mean(dep)

f = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32) ** 2)
                           for x in jax.tree_util.tree_leaves(
                               jax.grad(loss, argnums=(0, 1, 2, 3))(*a))))
float(f(means, covars, harm, opac))
t0 = time.perf_counter()
for _ in range(3):
    float(f(means, covars, harm, opac))
dt = (time.perf_counter() - t0) / 3 - rtt
print(f"13-view deg-4 reward grad: {dt:.3f} s", flush=True)
