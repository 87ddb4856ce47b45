import sys, time; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
exec(open("/root/repo/scratch/pallas_block_taps.py").read().split("# test setup")[0])
from bench import _time_fn
from xcube_resampling_tpu.ops.pallas_kernels import srw_vertical_reference

for (src_h, w, out_h, scale, tilt) in [(128, 512, 512, 0.2, 0.004), (512, 4096, 4096, 0.118, 0.002)]:
    rng = np.random.default_rng(0)
    src = rng.random((src_h, w), dtype=np.float32)
    rr = np.arange(out_h, dtype=np.float32)[:, None]
    cc = np.arange(w, dtype=np.float32)[None, :]
    pos = scale * rr + tilt * cc
    base = np.clip((scale * np.arange(out_h)).astype(np.int32) - 2, -4, src_h)
    d_taps = 2 + int(np.ceil(tilt * w)) + 4
    ref = srw_vertical_reference(src, pos, base, d_taps)
    t0 = time.time()
    out, win_h = srw_vertical_pallas_block(src, pos, base, d_taps)
    print(f"[{out_h}x{w}] compile+run {time.time()-t0:.1f}s win_h {win_h} "
          f"maxerr {np.abs(np.asarray(out)-ref).max():.2e}", flush=True)
    fn = jax.jit(lambda s, p, b=base, d=d_taps: srw_vertical_pallas_block(s, p, b, d)[0])
    dt = _time_fn(fn, jnp.asarray(src), jnp.asarray(pos))
    print(f"[{out_h}x{w}] pallas block-taps: {dt*1e3:.3f} ms -> {out_h*w/dt/1e6:.0f} Mpix/s", flush=True)

    def xla_taps(s, p, b=jnp.asarray(base), d=d_taps, sh=src_h):
        acc = jnp.zeros(p.shape, jnp.float32)
        for dd in range(d):
            idx = jnp.clip(b + dd, 0, sh - 1)
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(p - (b + dd)[:, None].astype(jnp.float32)))
            acc = acc + wgt * jnp.take(s, idx, axis=0)
        return acc
    dt = _time_fn(jax.jit(xla_taps), jnp.asarray(src), jnp.asarray(pos))
    print(f"[{out_h}x{w}] xla taps:          {dt*1e3:.3f} ms -> {out_h*w/dt/1e6:.0f} Mpix/s", flush=True)
