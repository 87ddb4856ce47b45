"""TPU probe: hybrid Phase A vs Newton walk vs host tiers, OLCI geometry."""
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

# --- hybrid tier
t0 = time.perf_counter()
hyb = rectify_ops.inverse_ij_map_hybrid(*args)
assert hyb is not None, "hybrid refused the OLCI geometry"
float(hyb.device_map()[0, 100, 100])
print(f"hybrid cold (gate+stage+compile+run): {time.perf_counter()-t0:.2f}s",
      flush=True)
for i in range(4):
    t0 = time.perf_counter()
    hyb = rectify_ops.inverse_ij_map_hybrid(*args)
    float(hyb.device_map()[0, 100, 100])
    print(f"hybrid warm: {time.perf_counter()-t0:.3f}s", flush=True)

# --- walk tier
t0 = time.perf_counter()
walked = rectify_ops.inverse_ij_map_walk(*args)
float(walked.device_map()[0, 100, 100])
print(f"walk cold: {time.perf_counter()-t0:.2f}s", flush=True)
for i in range(2):
    t0 = time.perf_counter()
    walked = rectify_ops.inverse_ij_map_walk(*args)
    float(walked.device_map()[0, 100, 100])
    print(f"walk warm: {time.perf_counter()-t0:.3f}s", flush=True)

# --- parity hybrid vs host (f32 device vs f64 host: tolerance check)
hm = hyb.as_numpy()
host = rectify_ops.inverse_ij_map(*args)
nan_mismatch = int((np.isnan(hm[0]) != np.isnan(host[0])).sum())
print("nan mismatches:", nan_mismatch, "of", host[0].size, flush=True)
both = ~np.isnan(hm[0]) & ~np.isnan(host[0])
d = np.abs(hm[:, both] - host[:, both])
print("max |dij|:", float(d.max()),
      "winner flips:", int((d.max(axis=0) > 0.5).sum()), flush=True)

from xcube_resampling_tpu.profiling import GLOBAL_TIMER
print(GLOBAL_TIMER.report(), flush=True)
