import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import xcube_resampling_tpu.ops.esw as esw_mod
from xcube_resampling_tpu.gridmapping import GridMapping

calls = []
real = esw_mod.make_esw_fn
def spy(plan, interp, fill, return_parts=False, uniform=None):
    key = None
    if uniform:
        key = tuple(sorted(uniform.items())) + (plan.out_h, plan.out_w, plan.src_h, plan.src_w)
    else:
        key = ("individual", plan.out_h, plan.out_w, plan.src_h, plan.src_w,
               plan.n_samples, plan.d_v, plan.d_h)
    calls.append(key)
    return (lambda *a: None), ()
esw_mod.make_esw_fn = spy
import xcube_resampling_tpu.ops.reproject_ops as rop
gcalls = []
def fake_gather(ixs, iys, step, oh, ow, shg, swg, joff, ioff, *a, **k):
    gcalls.append((oh, ow))
    return (lambda *a: None), ()
rop.make_gather_piece_fn = fake_gather

source_gm = GridMapping.regular(size=(7200, 3600), xy_min=(-180.0, -90.0), xy_res=0.05, crs="epsg:4326")
tgt = GridMapping.regular(size=(4096, 4096), xy_min=(2000000.0, 1000000.0), xy_res=1500.0, crs="epsg:3035")
t0 = time.time()
fn = esw_mod.make_esw_region_fn(source_gm, tgt, "bilinear", np.nan, base_split=2, max_depth=3)
print(f"plan {time.time()-t0:.1f}s; esw pieces {len(calls)}, unique cfgs {len(set(calls))}; gather {len(gcalls)}")
from collections import Counter
for k, n in Counter(calls).items():
    if k[0] == "individual":
        print("INDIVIDUAL", k)
    else:
        d = dict((a,b) for a,b in k[:-4])
        print(f"group out {k[-4]}x{k[-3]} win {k[-2]}x{k[-1]} n={n} S={d['n_samples']} d_v={d['d_v']} d_h={d['d_h']} ct={d['col_tile']} rt={d['row_tile']} bits={d['bits_v']}/{d['bits_h']}")
