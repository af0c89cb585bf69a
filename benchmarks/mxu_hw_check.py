"""On-TPU correctness check: MXU cluster kernel vs scalar streaming kernel
on mesh_gallery, compiled (not interpret). Run under timeout."""
import signal, os, sys, time


def _watchdog(sig, frame):
    print("WATCHDOG: dispatch hung", flush=True)
    os._exit(2)


signal.signal(signal.SIGALRM, _watchdog)
signal.alarm(420)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
__import__("mitsuba2_tpu.utils.jaxcache", fromlist=["x"]).configure(jax)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mitsuba2_tpu.kernels import traverse_pallas as tp
from mitsuba2_tpu.scene.presets import mesh_gallery

print("devices:", jax.devices(), flush=True)
scene = mesh_gallery(subdiv=2)
rng = np.random.default_rng(0)
N = 8192
lo = np.asarray(scene.bvh_min)[0]
hi = np.asarray(scene.bvh_max)[0]
o = rng.uniform(lo, hi, (N, 3)).astype(np.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o, d = jnp.asarray(o), jnp.asarray(d)
tm = jnp.full(N, jnp.inf)

fn = jax.jit(lambda sc, o, d: tp.ray_intersect_preliminary(sc, o, d, jnp.inf))
ft = jax.jit(lambda sc, o, d: tp.ray_test(sc, o, d, 2.0))

tp.MXU_LEAVES = False
t_s, p_s, u_s, v_s = map(np.asarray, jax.block_until_ready(fn(scene, o, d)))
occ_s = np.asarray(jax.block_until_ready(ft(scene, o, d)))
print("scalar kernel ran", flush=True)

tp.MXU_LEAVES = True
# FRESH jit closures: MXU_LEAVES is read at trace time, and re-calling the
# SAME jitted fn with identical avals replays the cached scalar executable
# (the original version of this check silently compared scalar vs scalar)
fn2 = jax.jit(lambda sc, o, d: tp.ray_intersect_preliminary(sc, o, d,
                                                            jnp.inf))
ft2 = jax.jit(lambda sc, o, d: tp.ray_test(sc, o, d, 2.0))
t_m, p_m, u_m, v_m = map(np.asarray, jax.block_until_ready(fn2(scene, o, d)))
print("MXU closest-hit ran", flush=True)
occ_m = np.asarray(jax.block_until_ready(ft2(scene, o, d)))
print("MXU any-hit ran", flush=True)

hit_s, hit_m = np.isfinite(t_s), np.isfinite(t_m)
print("hit masks equal:", bool((hit_s == hit_m).all()), flush=True)
dt = np.abs(t_s[hit_s & hit_m] - t_m[hit_s & hit_m])
print("max |t| diff:", float(dt.max()) if dt.size else 0.0, flush=True)
rel = dt / np.maximum(np.abs(t_s[hit_s & hit_m]), 1e-6)
print("max rel t diff:", float(rel.max()) if rel.size else 0.0, flush=True)
same = p_s == p_m
print("prim agree rate:", float(same[hit_s].mean()), flush=True)
print("occ equal:", bool((occ_s == occ_m).all()),
      "occ rate:", float(occ_s.mean()), flush=True)
signal.alarm(0)
print("OK", flush=True)
