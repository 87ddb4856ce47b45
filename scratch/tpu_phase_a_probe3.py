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
import os

print("devices:", jax.devices(), flush=True)

ds = create_olci_like_swath(width=1189, height=1890, tile_size=512)
gm = GridMapping.from_dataset(ds)
tgm = gm.to_regular(tile_size=512)
src_xy = np.asarray(gm.xy_coords.data, dtype=np.float64)
x_min, y_min, x_max, y_max = tgm.xy_bbox
args = (src_xy[0], src_xy[1], 0, 0, (tgm.height, tgm.width),
        x_min, y_max, tgm.x_res, -tgm.y_res, UV_DELTA)

t0 = time.perf_counter()
plan = rectify_ops.plan_phase_a_device(*args)
print(f"plan (host): {time.perf_counter()-t0:.3f}s; "
      f"win_int={plan.cls_all['win']} "
      f"band={None if plan.cls_band is None else (plan.cls_band['n_real'], plan.cls_band['win'])} "
      f"host_blocks={None if plan.host_blocks is None else len(plan.host_blocks[1][0])}",
      flush=True)
t0 = time.perf_counter()
gx_d, gy_d = plan.device_args()
gx_d.block_until_ready(); float(gx_d[0,0])
print(f"stage coords: {time.perf_counter()-t0:.3f}s", flush=True)

t0 = time.perf_counter()
out_d = plan.apply(gx_d, gy_d)
float(jnp.nansum(out_d[0, ::256, ::256]))
print(f"apply cold (compile+run): {time.perf_counter()-t0:.2f}s", flush=True)
for _ in range(3):
    t0 = time.perf_counter()
    out_d = plan.apply(gx_d, gy_d)
    float(jnp.nansum(out_d[0, ::256, ::256]))
    print(f"apply warm: {time.perf_counter()-t0:.3f}s", flush=True)

t0 = time.perf_counter()
out = plan.as_numpy(out_d)
print(f"fetch: {time.perf_counter()-t0:.3f}s", flush=True)

os.environ["XRTPU_PHASEA"] = "host"
from xcube_resampling_tpu.rectify import _compute_target_source_ij
host = _compute_target_source_ij(gm, tgm, UV_DELTA)
nan_mismatch = np.isnan(host[0]) != np.isnan(out[0])
print("nan mismatches:", int(nan_mismatch.sum()), "of", host[0].size, flush=True)
both = ~np.isnan(host[0]) & ~np.isnan(out[0])
d = np.abs(host[:, both] - out[:, both])
print("max |dij|:", float(d.max()), "winner flips:", int((d.max(axis=0) > 0.5).sum()), flush=True)

from xcube_resampling_tpu.profiling import GLOBAL_TIMER
print(GLOBAL_TIMER.report(), flush=True)
