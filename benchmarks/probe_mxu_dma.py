"""Phase-1 hardware probe for the MXU cluster-leaf streaming scheme.

The original scheme DMA'd (4K, 16) feature slabs HBM->VMEM; this Mosaic
rejects any memref slice whose minor dim is not 128-aligned ("Slice shape
along dimension 1 must be aligned to tiling (128), but is 16"), so the
table layout must change. Two candidates, selectable by argv[1]:

  t    (default) featT (16, 4*S) transposed table; per-visit DMA is a
       (16, 4K) slice with a DYNAMIC LANE-DIM START (4*base, always a
       multiple of 512) -> scratch (16, 4K); dot contracts dim0 x dim0.
       Memory-optimal (no padding).
  pad  feat_pad (4*S, 128) lane-padded rows (cols 16: zero); per-visit
       DMA is a (4K, 128) full-width slice with a dynamic SUBLANE start;
       dot contracts the padded 128 dim against a sublane-padded rt.
       8x HBM footprint, proven-shape dynamic start.

Either way the dot output is (4K, lanes) exactly as the kernel's epilogue
expects. Run each under `timeout` — dispatch-time hangs wedge the chip.
"""
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

S = 512          # total feature rows (4 * prim slots)
K4 = 128         # rows per visit (= 4 * CLUSTER_K with CLUSTER_K=32 here)
MODE = sys.argv[1] if len(sys.argv) > 1 else "t"
N_STEPS = 4


def kern_t(featT_hbm, steps_ref, rt_ref, out_ref, scratch, sem):
    rt = rt_ref[:]                       # (16, 1024)
    nsteps = steps_ref[0]
    def body(st):
        i, acc = st
        base = (i * K4) % S              # multiple of K4 (lane-tile aligned)
        dma = pltpu.make_async_copy(
            featT_hbm.at[:, pl.ds(pl.multiple_of(base, 128), K4)],
            scratch, sem)
        dma.start()
        dma.wait()
        p = jax.lax.dot_general(
            scratch[:], rt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # (K4, 1024)
        acc = acc + jnp.min(p, axis=0, keepdims=True).reshape(8, 128)
        return i + 1, acc
    _, acc = jax.lax.while_loop(lambda st: st[0] < nsteps, body,
                                (jnp.int32(0), jnp.zeros((8, 128), jnp.float32)))
    out_ref[:] = acc


def kern_pad(feat_hbm, steps_ref, rt_ref, out_ref, scratch, sem):
    rt = rt_ref[:]                       # (16, 1024)
    rt_pad = jnp.concatenate(
        [rt, jnp.zeros((112, rt.shape[1]), jnp.float32)], axis=0)  # (128,1024)
    nsteps = steps_ref[0]
    def body(st):
        i, acc = st
        base = (i * K4) % S
        dma = pltpu.make_async_copy(
            feat_hbm.at[pl.ds(base, K4), :], scratch, sem)
        dma.start()
        dma.wait()
        p = jax.lax.dot_general(
            scratch[:], rt_pad, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # (K4, 1024)
        acc = acc + jnp.min(p, axis=0, keepdims=True).reshape(8, 128)
        return i + 1, acc
    _, acc = jax.lax.while_loop(lambda st: st[0] < nsteps, body,
                                (jnp.int32(0), jnp.zeros((8, 128), jnp.float32)))
    out_ref[:] = acc


rng = np.random.default_rng(0)
feat_np = rng.normal(size=(S, 16)).astype(np.float32)
rt = jnp.asarray(np.random.default_rng(1).normal(size=(16, 1024)), jnp.float32)
steps = jnp.full((1,), N_STEPS, jnp.int32)

if MODE == "t":
    table = jnp.asarray(feat_np.T)                       # (16, S)
    kern, scratch_shape = kern_t, pltpu.VMEM((16, K4), jnp.float32)
elif MODE == "pad":
    pad = np.zeros((S, 128), np.float32)
    pad[:, :16] = feat_np
    table = jnp.asarray(pad)                             # (S, 128)
    kern, scratch_shape = kern_pad, pltpu.VMEM((K4, 128), jnp.float32)
else:
    raise SystemExit(f"unknown mode {MODE}")

fn = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
              pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    scratch_shapes=[scratch_shape, pltpu.SemaphoreType.DMA(())])
stage(f"lowering mode={MODE}")
compiled = jax.jit(fn).lower(table, steps, rt).compile()
stage("compiled; dispatching")
out = jax.block_until_ready(compiled(table, steps, rt))
stage(f"ran: sum={float(out.sum()):.4f}")
ref = np.zeros((8, 128), np.float32)
r_ = np.asarray(rt)
for i in range(N_STEPS):
    base = (i * K4) % S
    ref += (feat_np[base:base + K4] @ r_).min(0).reshape(8, 128)
err = np.abs(ref - np.asarray(out)).max()
print("maxerr vs numpy:", err, flush=True)
assert err < 1e-3, "MISCOMPILE"
print(f"PROBE-OK mode={MODE}", flush=True)
