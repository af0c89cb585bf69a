import sys, time
def stage(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)
stage("start")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
__import__("mitsuba2_tpu.utils.jaxcache", fromlist=["x"]).configure(jax)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
stage(f"jax init {jax.devices()}")

S = 512
WITH_COND = len(sys.argv) > 1 and sys.argv[1] == "cond"

def kern(feat_hbm, steps_ref, rt_ref, out_ref, scratch, sem):
    rt = rt_ref[:]                       # (16, 1024)
    nsteps = steps_ref[0]
    def cond(st):
        return st[0] < nsteps
    def body(st):
        i, acc = st
        base = (i * 128) % S
        dma = pltpu.make_async_copy(
            feat_hbm.at[pl.ds(base, 128), :], scratch, sem)
        dma.start()
        dma.wait()
        def do_dot(a):
            p = jax.lax.dot_general(
                scratch[:], rt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return a + jnp.min(p, axis=0, keepdims=True).reshape(8, 128)
        if WITH_COND:
            acc = jax.lax.cond(i % 2 == 0, do_dot, lambda a: a, acc)
        else:
            acc = do_dot(acc)
        return i + 1, acc
    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                             jnp.zeros((8, 128), jnp.float32)))
    out_ref[:] = acc

feat = jnp.asarray(np.random.default_rng(0).normal(size=(S, 16)), jnp.float32)
rt = jnp.asarray(np.random.default_rng(1).normal(size=(16, 1024)), jnp.float32)
steps = jnp.full((1,), 4, jnp.int32)
fn = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
              pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
              pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((128, 16), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])
stage("lowering")
compiled = jax.jit(fn).lower(feat, steps, rt).compile()
stage("compiled; dispatching")
out = jax.block_until_ready(compiled(feat, steps, rt))
stage(f"ran: sum={float(out.sum()):.4f}")
ref = np.zeros((8, 128), np.float32)
f_, r_ = np.asarray(feat), np.asarray(rt)
for i in range(4):
    if WITH_COND and i % 2 != 0:
        continue
    base = (i * 128) % S
    ref += (f_[base:base + 128] @ r_).min(0).reshape(8, 128)
print("maxerr vs numpy:", np.abs(ref - np.asarray(out)).max(), flush=True)
