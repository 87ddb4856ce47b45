"""TPU probe: Newton-walk Phase A vs plan-tier stencil + rectify e2e."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, ".")
from tests.sampledata import create_olci_like_swath
from xcube_resampling_tpu.constants import UV_DELTA
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops import rectify_ops

print("devices:", jax.devices(), flush=True)

ds = create_olci_like_swath(width=1189, height=1890, tile_size=512)
gm = GridMapping.from_dataset(ds)
tgm = gm.to_regular(tile_size=512)
src_xy = np.asarray(gm.xy_coords.data, dtype=np.float64)
x_min, y_min, x_max, y_max = tgm.xy_bbox
args = (src_xy[0], src_xy[1], 0, 0, (tgm.height, tgm.width),
        x_min, y_max, tgm.x_res, -tgm.y_res, UV_DELTA)

# --- walk tier
t0 = time.perf_counter()
walked = rectify_ops.inverse_ij_map_walk(*args)
float(walked.device_map()[0, 100, 100])
print(f"walk cold (gate+stage+compile+run): {time.perf_counter()-t0:.2f}s",
      flush=True)
for i in range(3):
    t0 = time.perf_counter()
    walked = rectify_ops.inverse_ij_map_walk(*args)
    float(walked.device_map()[0, 100, 100])
    print(f"walk warm: {time.perf_counter()-t0:.3f}s", flush=True)

# --- plan-tier stencil (flat-gather rewrite)
t0 = time.perf_counter()
plan = rectify_ops.plan_phase_a_device(*args)
print(f"plan (host): {time.perf_counter()-t0:.3f}s", flush=True)
gx_d, gy_d = plan.device_args()
float(gx_d[0, 0])
t0 = time.perf_counter()
out_d = plan.apply(gx_d, gy_d)
float(jnp.nansum(out_d[0, ::256, ::256]))
print(f"stencil apply cold: {time.perf_counter()-t0:.2f}s", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    out_d = plan.apply(gx_d, gy_d)
    float(jnp.nansum(out_d[0, ::256, ::256]))
    print(f"stencil apply warm: {time.perf_counter()-t0:.3f}s", flush=True)

# --- parity walk vs stencil on device (f32): sanity
wm = walked.device_map()
st = out_d
nm = int(jnp.sum(jnp.isnan(wm[0]) != jnp.isnan(st[0])))
both = ~jnp.isnan(wm[0]) & ~jnp.isnan(st[0])
md = float(jnp.max(jnp.where(both, jnp.abs(wm[0] - st[0]), 0.0)))
print(f"walk vs stencil: nan mism {nm}, max |di| {md:.2e}", flush=True)

# --- Phase B 16 bands through the walk map
bands = jnp.asarray(
    np.broadcast_to(
        np.asarray(ds.rad.values, np.float32)[None], (16,) + ds.rad.shape
    ).copy()
)
npix = tgm.height * tgm.width
for interp in ("nearest", "bilinear", "triangular"):
    fn = rectify_ops.make_device_var_image_fn_resident(walked, np.nan, interp)
    out = fn(bands)
    float(out[0, 100, 100])  # compile+run
    t0 = time.perf_counter()
    out = fn(bands)
    float(out[0, 100, 100])
    dt = time.perf_counter() - t0
    print(f"phase B 16-band {interp}: {16*npix/dt/1e6:.0f} Mpix/s "
          f"({dt:.3f}s)", flush=True)

from xcube_resampling_tpu.profiling import GLOBAL_TIMER
print(GLOBAL_TIMER.report(), flush=True)
