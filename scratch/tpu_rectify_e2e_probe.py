"""End-to-end device-resident rectify on the real TPU: plan + apply +
16-band Phase B, amortized throughput."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, ".")

# page-warm: touch ~1.5 GB once so fresh allocations don't pay lazy restore
_w = np.ones((6, 64 << 20), dtype=np.uint8); _w[:] = 1; del _w

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

for rep in range(2):
    t0 = time.perf_counter()
    plan = rectify_ops.plan_phase_a_device(*args)
    print(f"plan: {time.perf_counter()-t0:.3f}s", flush=True)

t0 = time.perf_counter()
gx_d, gy_d = plan.device_args()
jax.block_until_ready((gx_d, gy_d)); float(jnp.sum(gx_d[:2, :2]))
print(f"stage coords: {time.perf_counter()-t0:.3f}s", flush=True)

for tag in ("cold", "warm", "warm"):
    t0 = time.perf_counter()
    out_d = plan.apply(gx_d, gy_d)
    jax.block_until_ready(out_d); float(jnp.sum(out_d[0, :2, :2]))
    print(f"apply {tag}: {time.perf_counter()-t0:.3f}s", flush=True)

ijmap = rectify_ops.DeviceIJMap(plan, out_d)

# 16-band source stack, staged once
rng = np.random.default_rng(0)
bands = rng.random((16, src_xy.shape[1], src_xy.shape[2]), dtype=np.float32)
t0 = time.perf_counter()
bands_d = jnp.asarray(bands)
jax.block_until_ready(bands_d); float(jnp.sum(bands_d[0, :2, :2]))
print(f"stage 16 bands ({bands.nbytes>>20} MB): {time.perf_counter()-t0:.3f}s", flush=True)

dst_pix = tgm.width * tgm.height
for interp in ("nearest", "bilinear", "triangular"):
    fn = rectify_ops.make_device_var_image_fn_resident(ijmap, float("nan"), interp)
    out = fn(bands_d); jax.block_until_ready(out)  # compile
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(bands_d)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"phase B {interp}: {dt*1e3:.1f} ms warm -> {16*dst_pix/dt/1e6:.0f} Mpix/s", flush=True)

# amortized single-geometry: plan + stage + apply + 16-band nearest
fn = rectify_ops.make_device_var_image_fn_resident(ijmap, float("nan"), "nearest")
t0 = time.perf_counter()
plan2 = rectify_ops.plan_phase_a_device(*args)
gx2, gy2 = plan2.device_args()
out2 = plan2.apply(gx2, gy2)
ijmap2 = rectify_ops.DeviceIJMap(plan2, out2)
fn2 = rectify_ops.make_device_var_image_fn_resident(ijmap2, float("nan"), "nearest")
r = fn2(bands_d); jax.block_until_ready(r)
dt = time.perf_counter() - t0
print(f"amortized geometry+16 bands: {dt:.2f}s -> {16*dst_pix/dt/1e6:.0f} Mpix/s", flush=True)
print(f"single-band amortized: {dst_pix/dt*1/1e6*16:.0f}... (see above)", flush=True)
from xcube_resampling_tpu.profiling import GLOBAL_TIMER
print(GLOBAL_TIMER.report(), flush=True)
