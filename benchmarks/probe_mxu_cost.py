"""Per-iteration cost decomposition of the MXU cluster walk.

Times a stripped-down replica of _closest_hit_mxu_kernel's while_loop at
block=4096, CK=128, isolating each component (usage: argv[1] = mode):

  step   scalar node-row load + slab test + link pick only
  dma    step + unconditional 32 KB DMA start/wait per iteration
  dot    dma + the production-precision dot (MI_MXU_PRECISION, default
         cat3) every 4th iteration (cond), NO epilogue
  full   dot + the full Möller–Trumbore epilogue + winner tracking
  opt    dot + the OPTIMIZED epilogue (sign-scaled validity tests — no
         divide on the (CK,B) tile; NR reciprocal only on the t ratio)
  dot1 / full1 / opt1   same but the visit fires EVERY iteration —
         isolates per-VISIT cost directly (visit-bound workloads like
         the incoherent gallery closest-hit live here)

Reports us/iteration for N_ITERS iterations averaged over reps with
per-rep input variation (the tunneled runtime memoizes identical
dispatches). Run under `timeout`.
"""
import sys, time
def stage(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
__import__("mitsuba2_tpu.utils.jaxcache", fromlist=["x"]).configure(jax)
stage(f"jax init {jax.devices()}")

MODE = sys.argv[1] if len(sys.argv) > 1 else "full"
BASE_MODE = MODE.rstrip("1")
EVERY = 1 if MODE.endswith("1") else 4
from mitsuba2_tpu.kernels import traverse_pallas as tp  # noqa: E402
CK = 128
LANES = 4096
SUB = LANES // 128
R = 768                      # cut-tree rows (gallery-sized)
S4 = 4 * CK * 64             # feat columns (64 clusters)
import os
N_ITERS = int(os.environ.get("N_ITERS", "256"))


def kern(node_f, link_i, featT, seed_ref, out_ref, feat_s, sem):
    seed = seed_ref[:]                              # (SUB,128) varies per rep
    ox = seed * 0.001
    oy, oz = ox + 1.0, ox + 2.0
    dx, dy, dz = ox + 0.1, ox + 0.2, ox + 0.3
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    rt = jnp.concatenate(
        [ox.reshape(1, LANES), oy.reshape(1, LANES), oz.reshape(1, LANES),
         dx.reshape(1, LANES), dy.reshape(1, LANES), dz.reshape(1, LANES),
         jnp.ones((10, LANES), jnp.float32)], axis=0)     # (16, LANES)
    rt_pair = tp._rt_split(rt)  # production dot precision (MI_MXU_PRECISION)
    rtA, rtB, rtC = rt * 0.5, rt * 0.25, rt * 0.125  # fake recentring coeffs

    def body(st):
        i, node, t_best, best = st
        nf = node_f[pl.ds(node, 1), :]
        li = link_i[pl.ds(node, 1), :]
        t0x = (nf[0, 0] - ox) * ix
        t1x = (nf[0, 3] - ox) * ix
        t0y = (nf[0, 1] - oy) * iy
        t1y = (nf[0, 4] - oy) * iy
        t0z = (nf[0, 2] - oz) * iz
        t1z = (nf[0, 5] - oz) * iz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmx = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                      jnp.maximum(t0y, t1y)),
                          jnp.maximum(t0z, t1z))
        hit_any = jnp.any((tmin <= tmx) & (tmx > 0.0) & (tmin < t_best))
        nxt = jnp.where(hit_any, li[0, 0], li[0, 8])
        base = (i * (4 * CK)) % S4

        if BASE_MODE != "step":
            d = pltpu.make_async_copy(
                featT.at[:, pl.ds(pl.multiple_of(base, 4 * CK), 4 * CK)],
                feat_s, sem)
            d.start()
            d.wait()

        def visit(args):
            t_b, b = args
            if BASE_MODE in ("fullrt", "optrt"):
                # production shape: the ray matrix is recentred at the
                # visited cluster's centroid (3 broadcast FMAs over
                # (16,B)) and bf16-split PER VISIT — neither hoistable
                ccx, ccy, ccz = nf[0, 1], nf[0, 2], nf[0, 3]
                rtv = rt + ccx * rtA + ccy * rtB + ccz * rtC
                pair = tp._rt_split(rtv)
            else:
                pair = rt_pair
            res = tp._mxu_dot(feat_s[:], pair)        # (4CK, LANES)
            if BASE_MODE == "dot":
                return jnp.minimum(t_b, res[0:SUB, 0:128] * 1e-9), b
            det = res[0 * CK:1 * CK]
            unum = res[1 * CK:2 * CK]
            vnum = res[2 * CK:3 * CK]
            tnum = res[3 * CK:4 * CK]
            tb = t_b.reshape(1, LANES)
            if BASE_MODE in ("opt", "optrt"):
                # sign-scaled validity: all tests against |det| — no
                # (CK,B) divide; the t ratio uses a 2-op NR reciprocal
                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                sd = det * sgn
                su = unum * sgn
                sv = vnum * sgn
                st = tnum * sgn
                ok = ((sd > 1e-12) & (su >= 0.0) & (sv >= 0.0) &
                      (su + sv <= sd) & (st > 0.0) & (st < tb * sd))
                rcp = pl.reciprocal(jnp.maximum(sd, 1e-30), approx=True)
                rcp = rcp * (2.0 - sd * rcp)          # one NR step
                t_m = jnp.where(ok, st * rcp, jnp.inf)
                win_src = t_m
            else:
                inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
                u = unum * inv
                v = vnum * inv
                t = tnum * inv
                ok = ((inv != 0.0) & (u >= 0.0) & (v >= 0.0) &
                      (u + v <= 1.0) & (t > 0.0) & (t < tb))
                t_m = jnp.where(ok, t, jnp.inf)
                win_src = t_m
            t_c = jnp.min(t_m, axis=0, keepdims=True)
            win = win_src <= t_c
            pids = base + jax.lax.broadcasted_iota(jnp.int32, (CK, LANES), 0)
            prim_c = jnp.min(jnp.where(win, pids, 1 << 30),
                             axis=0, keepdims=True)
            closer = t_c < tb
            nt = jnp.where(closer, t_c, tb).reshape(SUB, 128)
            nb = jnp.where(closer, prim_c, b.reshape(1, LANES)
                           ).reshape(SUB, 128)
            return nt, nb

        if BASE_MODE not in ("step", "dma"):
            # *1 modes: fire the visit UNCONDITIONALLY (random node data
            # makes hit_any mostly false, silently skipping the branch
            # being measured); hit_any still feeds the link select so the
            # slab test isn't dead-code-eliminated
            fire = (i % EVERY == 0) if EVERY == 1 else \
                ((i % EVERY == 0) & hit_any)
            t_best, best = jax.lax.cond(fire, visit, lambda a: a,
                                        (t_best, best))
        return i + 1, jnp.maximum(nxt, 0), t_best, best

    _, _, t_best, best = jax.lax.while_loop(
        lambda st: st[0] < N_ITERS, body,
        (jnp.int32(0), jnp.int32(0), jnp.full((SUB, 128), 1e30, jnp.float32),
         jnp.full((SUB, 128), -1, jnp.int32)))
    out_ref[:] = t_best + best.astype(jnp.float32)


rng = np.random.default_rng(0)
node_f = jnp.asarray(rng.normal(size=(R, 8)), jnp.float32)
link_i = jnp.asarray(rng.integers(0, R, size=(R, 16)), jnp.int32)
featT = jnp.asarray(rng.normal(size=(16, S4)), jnp.float32)

fn = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((SUB, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((16, 4 * CK), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])
jfn = jax.jit(fn)
seed = jnp.zeros((SUB, 128), jnp.float32)
out = jax.block_until_ready(jfn(node_f, link_i, featT, seed))
# MANDATORY timing hygiene (docs/TPU_TRAVERSAL.md): one device->host
# fetch before timing, or bur-only numbers are deferred-mode fantasy
_ = np.asarray(out).ravel()[:1]
stage(f"compiled+warm mode={MODE}")
REPS = 8
t0 = time.perf_counter()
for r in range(REPS):
    out = jfn(node_f, link_i, featT, seed + r)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / REPS
print(f"mode={MODE}: {dt * 1e6 / N_ITERS:.2f} us/iter "
      f"({dt * 1e3:.2f} ms / {N_ITERS} iters)", flush=True)
