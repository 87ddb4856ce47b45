import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import xcube_resampling_tpu.ops.esw as esw_mod
from xcube_resampling_tpu.gridmapping import GridMapping

# monkeypatch make_esw_fn/make_gather_piece_fn to count instead of compile
pieces = []
def fake_make_esw_fn(plan, interp, fill, return_parts=False):
    pieces.append(("esw", plan.out_h, plan.out_w, plan.n_samples, plan.d_v, plan.d_h,
                   plan.s_v is not None, plan.s_h is not None))
    return (lambda *a: None), ()
import xcube_resampling_tpu.ops.reproject_ops as rop
def fake_gather(ixs, iys, step, oh, ow, *a, **k):
    pieces.append(("gather", oh, ow))
    return (lambda *a: None), ()
esw_mod.make_esw_fn = fake_make_esw_fn
rop.make_gather_piece_fn = fake_gather
import xcube_resampling_tpu.ops.esw
xcube_resampling_tpu.ops.esw.make_esw_fn = fake_make_esw_fn

source_gm = GridMapping.regular(size=(7200, 3600), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326")
tgt = GridMapping.regular(size=(4096, 4096), xy_min=(2000000.0, 1000000.0), xy_res=1500.0, crs="epsg:3035")
t0 = time.time()
fn = esw_mod.make_esw_region_fn(source_gm, tgt, "bilinear", np.nan, base_split=2, max_depth=3)
print(f"plan {time.time()-t0:.1f}s, {len(pieces)} pieces")
esw_px = sum(p[1]*p[2] for p in pieces if p[0]=="esw")
gat_px = sum(p[1]*p[2] for p in pieces if p[0]=="gather")
print(f"esw pieces {sum(1 for p in pieces if p[0]=='esw')} covering {esw_px/1e6:.1f} Mpix; "
      f"gather pieces {sum(1 for p in pieces if p[0]=='gather')} covering {gat_px/1e6:.1f} Mpix")
for p in pieces:
    print(p)
