"""One tiny TPU jit dispatch; prints OK + latency, or hangs (caller must
run under `timeout`). Used to poll for recovery after a chip wedge."""
import time

t0 = time.time()
import jax
import jax.numpy as jnp

x = jnp.arange(1024.0)
y = jax.jit(lambda v: (v * 2.0 + 1.0).sum())(x)
y.block_until_ready()
t1 = time.time()
# second dispatch with varied input (memoization-proof) times steady-state
z = jax.jit(lambda v: (v * 2.0 + 1.0).sum())(x + 1.0)
z.block_until_ready()
t2 = time.time()
print(f"CHIP-OK first={t1 - t0:.1f}s second={t2 - t1:.3f}s "
      f"dev={jax.devices()[0].platform}", flush=True)
