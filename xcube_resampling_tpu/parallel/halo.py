"""Sharded regridding with genuine halo exchange.

The reference achieves tile overlap by redundant gathering — every target
tile independently slices an enlarged source window (reference
reproject.py:405-423, rectify.py:342-345).  On a TPU mesh the idiomatic
equivalent is *halo exchange*: the source raster is sharded in row bands
across devices, each device swaps ``halo`` boundary rows with its
neighbours over ICI (``lax.ppermute``), then runs the fused gather kernel
on its extended band to produce its target band.  No device ever
materialises more than its band + halo, and the exchange rides the
interconnect instead of re-gathering from host storage.

Coordinates use the approximate-field strategy of
:mod:`..ops.reproject_ops`: a small float32 fractional-index field
(computed on host in float64) is replicated to every device; each band
interpolates its own rows of it.

Validity domain: the target->source row mapping must stay within ±halo of
the proportional band (monotone row-wise reprojection — the common case
for continental-scale CRS pairs); pixels needing farther rows resolve to
the fill value.  :func:`required_halo` sizes the halo from the actual
coordinate mapping.
"""

from __future__ import annotations

import numpy as np

from ..gridmapping import GridMapping
from ..ops.reproject_ops import _interp_field, coarse_coord_field, gather_interp


def _shard_map():
    import jax

    if hasattr(jax, "shard_map"):
        return jax.shard_map
    from jax.experimental.shard_map import shard_map

    return shard_map


def required_halo(
    source_gm: GridMapping,
    target_gm: GridMapping,
    n_bands: int,
    coord_fields=None,
) -> int:
    """Worst-case extra source rows a device needs beyond its proportional
    band, measured from the actual inverse coordinate mapping."""
    if coord_fields is None:
        coord_fields = coarse_coord_field(source_gm, target_gm)
    _, iy_c, step = coord_fields
    band_h = -(-source_gm.height // n_bands)
    out_band_h = -(-target_gm.height // n_bands)
    sample_rows = np.arange(iy_c.shape[0], dtype=np.float64) * step
    # evaluate the row mapping at every band's first and last target row
    # (linear interpolation of the coarse field — the same approximation
    # the device kernel uses)
    edges = []
    for k in range(n_bands):
        r0 = k * out_band_h
        r1 = min((k + 1) * out_band_h - 1, target_gm.height - 1)
        band_start = k * band_h
        for r in (r0, r1):
            iy_row = np.array(
                [
                    np.interp(r, sample_rows, iy_c[:, c])
                    for c in range(iy_c.shape[1])
                ]
            )
            finite = np.isfinite(iy_row)
            if not finite.any():
                continue
            edges.append(float(np.max(band_start - iy_row[finite])))
            edges.append(
                float(np.max(iy_row[finite] - (band_start + band_h - 1)))
            )
    dev = max([0.0] + edges)
    return int(np.ceil(dev)) + 2


def make_sharded_regrid_step(
    mesh,
    source_gm: GridMapping,
    target_gm: GridMapping,
    axis_name: str = "bands",
    halo: int | None = None,
    interp_method: str = "bilinear",
    fill_value: float = np.nan,
    src_batch_dims: int = 0,
    step: int = 16,
):
    """Build the jitted shard_map step: halo exchange + fused gather.

    Returns (step_fn, (src_pad_h, out_h)).  ``step_fn(src)`` expects the
    (padded) source with rows sharded over ``mesh[axis_name]`` and returns
    the target raster sharded the same way.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis_name]

    src_h, src_w = source_gm.height, source_gm.width
    out_h, out_w = target_gm.height, target_gm.width
    band_h = -(-src_h // n)
    out_band_h = -(-out_h // n)
    src_pad_h = band_h * n - src_h

    fields = coarse_coord_field(source_gm, target_gm, step)
    if halo is None:
        halo = required_halo(source_gm, target_gm, n, fields)
    halo = min(halo, band_h)
    ix_c = jnp.asarray(fields[0])
    iy_c = jnp.asarray(fields[1])

    up_perm = [(i, i + 1) for i in range(n - 1)]  # send last rows downward
    down_perm = [(i + 1, i) for i in range(n - 1)]  # send first rows upward

    use_halo = n > 1 and halo > 0

    def band_step(src_band, ix_field, iy_field):
        # src_band: (..., band_h, W) per device; coordinate fields are
        # replicated arguments (not captured constants — see reproject_ops)
        idx = lax.axis_index(axis_name)
        if use_halo:
            above = lax.ppermute(src_band[..., -halo:, :], axis_name, up_perm)
            below = lax.ppermute(src_band[..., :halo, :], axis_name, down_perm)
            ext = jnp.concatenate([above, src_band, below], axis=-2)
        else:
            ext = src_band
        ext_h = ext.shape[-2]

        row0 = (idx * out_band_h).astype(jnp.float32)
        rows = row0 + jnp.arange(out_band_h, dtype=jnp.float32)[:, None]
        cols = jnp.arange(out_w, dtype=jnp.float32)[None, :]
        ix = _interp_field(ix_field, rows, cols, step, jnp)
        iy = _interp_field(iy_field, rows, cols, step, jnp)

        # global bounds mask, clamp to the real source extent (clamp-to-edge
        # like the single-chip kernel), then rebase into the extended band
        in_src = (
            (ix > -0.5) & (ix < src_w - 0.5) & (iy > -0.5) & (iy < src_h - 0.5)
        )
        iy_g = jnp.clip(iy, 0, src_h - 1)
        local_off = (idx * band_h - (halo if use_halo else 0)).astype(jnp.float32)
        iy_local = iy_g - local_off
        in_band = (iy_local > -0.5) & (iy_local < ext_h - 0.5)
        vals = gather_interp(
            ext,
            ix,
            jnp.clip(iy_local, 0, ext_h - 1),
            interp_method,
            fill_value,
            jnp,
            valid=in_src & in_band,
        )
        return vals

    batch_spec = [None] * src_batch_dims
    shard_map = _shard_map()
    mapped = shard_map(
        band_step,
        mesh=mesh,
        in_specs=(
            P(*batch_spec, axis_name, None),
            P(None, None),
            P(None, None),
        ),
        out_specs=P(*batch_spec, axis_name, None),
    )
    jitted = jax.jit(mapped)

    def step_fn(src):
        return jitted(src, ix_c, iy_c)

    return step_fn, (src_pad_h, out_h)


def sharded_reproject(
    src,
    source_gm: GridMapping,
    target_gm: GridMapping,
    mesh,
    axis_name: str = "bands",
    halo: int | None = None,
    interp_method: str = "bilinear",
    fill_value: float = np.nan,
):
    """Reproject *src* with its rows sharded over ``mesh[axis_name]``;
    returns the full target raster (rows sharded the same way)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    step_fn, (src_pad_h, out_h) = make_sharded_regrid_step(
        mesh,
        source_gm,
        target_gm,
        axis_name=axis_name,
        halo=halo,
        interp_method=interp_method,
        fill_value=fill_value,
        src_batch_dims=src.ndim - 2,
    )
    if src_pad_h:
        pad = [(0, 0)] * (src.ndim - 2) + [(0, src_pad_h), (0, 0)]
        src = jnp.pad(src, pad, constant_values=fill_value)
    spec = P(*([None] * (src.ndim - 2)), axis_name, None)
    src = jax.device_put(src, NamedSharding(mesh, spec))
    out = step_fn(src)
    return out[..., :out_h, :]
