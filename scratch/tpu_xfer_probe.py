import time
import numpy as np
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
a32 = np.random.default_rng(0).random((1920, 1216), dtype=np.float32)
a64 = a32.astype(np.float64)
f = jax.jit(lambda x: x + 1)
for name, arr in (("f32 9MB", a32), ("f64 18MB", a64)):
    d = jnp.asarray(arr); d.block_until_ready(); float(d[0,0])
    t0 = time.perf_counter()
    for _ in range(3):
        d = jnp.asarray(arr)
        float(jnp.sum(d[:2,:2]))
    print(f"upload {name}: {(time.perf_counter()-t0)/3:.3f}s", flush=True)
d = f(jnp.asarray(a32))
float(d[0,0])
t0 = time.perf_counter()
for _ in range(3):
    out = np.asarray(f(d))
print(f"download f32 9MB: {(time.perf_counter()-t0)/3:.3f}s", flush=True)
