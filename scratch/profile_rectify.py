"""Profile the end-to-end single-band rectify host path (VERDICT item 3)."""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

from tests.sampledata import create_olci_like_swath
from xcube_resampling_tpu.rectify import rectify_dataset

ds = create_olci_like_swath(width=1189, height=1890, tile_size=512)

# warm any lazy imports/compiles out of the measurement
t0 = time.perf_counter()
out = rectify_dataset(ds, interp_methods=0)
_ = out.rad.values
print(f"cold run: {time.perf_counter()-t0:.2f}s")

t0 = time.perf_counter()
out = rectify_dataset(ds, interp_methods=0)
_ = out.rad.values
print(f"warm run: {time.perf_counter()-t0:.2f}s")

pr = cProfile.Profile()
pr.enable()
out = rectify_dataset(ds, interp_methods=0)
_ = out.rad.values
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(30)
print(s.getvalue())
