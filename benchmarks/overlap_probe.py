"""Can a remote compile proceed while the first transfer (channel warmup)
is still blocked?  Thread A: pull a scalar (warmup).  Thread B: AOT-compile
a fresh-shaped program.  If B finishes while A is blocked, prefetch-compile
overlap is viable."""
import time, threading, numpy as np, jax, jax.numpy as jnp

t_start = time.perf_counter()
ev_a = {}
def warmup():
    t0 = time.perf_counter()
    float(jnp.zeros(()))          # first device->host transfer
    ev_a['dt'] = time.perf_counter() - t0
    ev_a['done_at'] = time.perf_counter() - t_start

def compile_b():
    t0 = time.perf_counter()
    def prog(x):
        for _ in range(6):
            x = jnp.tanh(x @ x) + 0.123
        return x
    c = jax.jit(prog).lower(
        jax.ShapeDtypeStruct((937, 937), jnp.float32)).compile()
    print(f"[B] compile {time.perf_counter()-t0:.1f}s "
          f"(done at t+{time.perf_counter()-t_start:.1f}s)", flush=True)

a = threading.Thread(target=warmup); b = threading.Thread(target=compile_b)
a.start(); time.sleep(0.5); b.start()
a.join(); b.join()
print(f"[A] warmup {ev_a['dt']:.1f}s (done at t+{ev_a['done_at']:.1f}s)", flush=True)
