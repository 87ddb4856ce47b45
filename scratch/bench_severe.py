import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops.esw import make_esw_reproject_fn, plan_esw
from xcube_resampling_tpu.ops.srw import _coarse_geometry, _source_window_gm
from xcube_resampling_tpu.ops.esw import _offset_fields

source_gm = GridMapping.regular(size=(7200, 3600), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326")
tgt = GridMapping.regular(size=(4096, 2048), xy_min=(900000.0, 900000.0), xy_res=875.0, crs="epsg:3035")
fields = _coarse_geometry(source_gm, tgt, 16)
w = _source_window_gm(source_gm, fields, margin=56)
win = None; fp = fields
if w is not None:
    _, win = w; fp = _offset_fields(fields, *win)
p = plan_esw(source_gm, tgt, fields=fp, fields_global=fields, win=win)
print(f"S {p.n_samples} d_v {p.d_v}(ct {p.col_tile}) d_h {p.d_h}(rt {p.row_tile}) shifts v={p.s_v is not None}/{p.bits_v} h={p.s_h is not None}/{p.bits_h}", flush=True)

src = jnp.asarray(np.random.default_rng(0).random((3600, 7200), dtype=np.float32))
fn = make_esw_reproject_fn(source_gm, tgt, "bilinear", np.nan)
t0 = time.time(); out = fn(src); out.block_until_ready(); t_c = time.time()-t0
ts = []
for _ in range(5):
    t0 = time.time(); out = fn(src); out.block_until_ready(); ts.append(time.time()-t0)
dt = min(ts)
print(f"severe-big esw: compile {t_c:.1f}s run {dt*1e3:.2f}ms -> {4096*2048/dt/1e6:.0f} Mpix/s finite={float(jnp.isfinite(out).mean()):.3f}", flush=True)
