"""Quick chip-health probe: backend init + one bf16 matmul + first pull.

Prints timings; used to decide whether to schedule on-chip experiments.

WARNING (r5): the matmul number here is dominated by TUNNEL DISPATCH
LATENCY (3 sequential dispatches with a host pull between them — ~5 ms of
MXU work per ~13 ms wall at 4096³).  It read a steady "23-32 TF degraded
plateau" for 2 h while bench.py's fori_loop-chained worker_health_probe
read 91-93 TF and the flagship ran at full speed.  Use THIS script for
backend-init/channel-warmup timing only; trust worker_health_probe for
chip compute health.
"""
import time
t0 = time.time()
import jax
import jax.numpy as jnp
try:
    devs = jax.devices()
    print(f"[probe] backend init: {time.time()-t0:.1f}s devices={devs}", flush=True)
    t1 = time.time()
    x = jnp.zeros((), jnp.float32)
    v = float(x)
    print(f"[probe] first pull (channel warmup): {time.time()-t1:.1f}s", flush=True)
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a @ a @ a)
    t2 = time.time()
    r = f(a)
    s = float(jnp.sum(r[0, :8]))
    compile_s = time.time() - t2
    t3 = time.time()
    reps = 3
    for _ in range(reps):
        r = f(a)
    s = float(jnp.sum(r[0, :8]))
    dt = (time.time() - t3) / reps
    tflops = 3 * 2 * n**3 / dt / 1e12
    print(f"[probe] matmul chain: compile {compile_s:.1f}s, {dt*1e3:.1f} ms/call = {tflops:.0f} TFLOP/s bf16", flush=True)
except Exception as e:
    print(f"[probe] FAILED: {type(e).__name__}: {e}", flush=True)
