"""TPU probe: resident SRW Phase B component costs (16-band OLCI)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, ".")
from tests.sampledata import create_olci_like_swath
from xcube_resampling_tpu.constants import UV_DELTA
from xcube_resampling_tpu.gridmapping import GridMapping
from xcube_resampling_tpu.ops import rectify_ops as R

print("devices:", jax.devices(), flush=True)

ds = create_olci_like_swath(width=1189, height=1890, tile_size=512)
gm = GridMapping.from_dataset(ds)
tgm = gm.to_regular(tile_size=512)
src_xy = np.asarray(gm.xy_coords.data, dtype=np.float64)
x_min, y_min, x_max, y_max = tgm.xy_bbox
args = (src_xy[0], src_xy[1], 0, 0, (tgm.height, tgm.width),
        x_min, y_max, tgm.x_res, -tgm.y_res, UV_DELTA)
ij = R.inverse_ij_map_hybrid(*args)
m_dev = ij.device_map()

bands = jnp.asarray(np.broadcast_to(
    ds.rad.values[np.newaxis], (16,) + ds.rad.values.shape).copy())

impl = R._build_resident_srw_phase_b(
    m_dev, (ds.rad.values.shape[0], ds.rad.values.shape[1]), np.nan, "bilinear")
print("impl built:", impl is not None, flush=True)

def timeit(name, fn, *a):
    out = fn(*a)
    float(jnp.asarray(out).reshape(-1)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        float(jnp.asarray(out).reshape(-1)[0])
        ts.append((time.perf_counter() - t0) / 5)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)

timeit("full resident phase B (16 bands)", impl, bands)

# components: rebuild internals
from xcube_resampling_tpu.ops.srw import fields_from_lattice, plan_srw, make_srw_fn, make_srw_fn_batched
from xcube_resampling_tpu.ops.reproject_ops import gather_interp
from scipy.ndimage import minimum_filter

step = 16
out_h, out_w = int(m_dev.shape[-2]), int(m_dev.shape[-1])
m_host = np.asarray(jax.device_get(m_dev), dtype=np.float64)
valid = np.isfinite(m_host[0]) & np.isfinite(m_host[1])
interior = minimum_filter(valid.astype(np.uint8), size=2*(step+2)+1,
                          mode="constant", cval=0) > 0
edge_rows, edge_cols = np.nonzero(valid & ~interior)
print(f"valid px: {valid.sum()}  edge px: {edge_rows.size}", flush=True)
er_d = jnp.asarray(edge_rows.astype(np.int32))
ec_d = jnp.asarray(edge_cols.astype(np.int32))
interior_d = jnp.asarray(interior)

@jax.jit
def edge_gather_only(src, m, erd, ecd):
    ixe = m[0][erd, ecd].astype(jnp.float32)
    iye = m[1][erd, ecd].astype(jnp.float32)
    return gather_interp(src, ixe, iye, "bilinear", np.nan, jnp)

@jax.jit
def edge_scatter(src, m, erd, ecd, out):
    vals = edge_gather_only(src, m, erd, ecd)
    return out.at[..., erd, ecd].set(vals)

out0 = jnp.zeros((16, out_h, out_w), jnp.float32)
timeit("edge gather only", edge_gather_only, bands, m_dev, er_d, ec_d)
timeit("edge gather + scatter", edge_scatter, bands, m_dev, er_d, ec_d, out0)

@jax.jit
def where_only(out, inter):
    return jnp.where(inter, out, jnp.float32(np.nan))
timeit("interior where", where_only, out0, interior_d)
