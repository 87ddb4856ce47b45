import sys, time
import numpy as np
sys.path.insert(0, ".")
from tests.sampledata import create_olci_like_swath
from xcube_resampling_tpu.constants import UV_DELTA
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops import rectify_ops
import os

import jax
print("devices:", jax.devices(), flush=True)

ds = create_olci_like_swath(width=1189, height=1890, tile_size=512)
gm = GridMapping.from_dataset(ds)
tgm = gm.to_regular(tile_size=512)
src_xy = np.asarray(gm.xy_coords.data, dtype=np.float64)
x_min, y_min, x_max, y_max = tgm.xy_bbox
args = (src_xy[0], src_xy[1], 0, 0, (tgm.height, tgm.width),
        x_min, y_max, tgm.x_res, -tgm.y_res, UV_DELTA)

t0 = time.perf_counter()
out = rectify_ops.inverse_ij_map_device(*args)
t_cold = time.perf_counter() - t0
print(f"cold (compile+run): {t_cold:.2f}s, out shape {None if out is None else out.shape}", flush=True)
for _ in range(3):
    t0 = time.perf_counter()
    out = rectify_ops.inverse_ij_map_device(*args)
    print(f"warm: {time.perf_counter()-t0:.3f}s", flush=True)

# fidelity vs host
os.environ["XRTPU_PHASEA"] = "host"
from xcube_resampling_tpu.rectify import _compute_target_source_ij
t0 = time.perf_counter()
host = _compute_target_source_ij(gm, tgm, UV_DELTA)
print(f"host phase A: {time.perf_counter()-t0:.2f}s", flush=True)
nan_mismatch = np.isnan(host[0]) != np.isnan(out[0])
print("nan mismatches:", int(nan_mismatch.sum()), "of", host[0].size)
both = ~np.isnan(host[0]) & ~np.isnan(out[0])
d = np.abs(host[:, both] - out[:, both])
print("max |dij| where both valid:", float(d.max()))
print("pixels with |dij|>0.5 (different winner):", int((d.max(axis=0) > 0.5).sum()))
print("pixels with |dij|>1e-3:", int((d.max(axis=0) > 1e-3).sum()))
