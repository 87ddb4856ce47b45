"""Gateway: route a dataset to the rectify / affine / reproject engine.

Routing semantics match the reference gateway (reference
spatial.py:121-168); the implementation here separates the route
*decision* from the engine *invocation* so tests can assert on the
chosen route directly.
"""

from __future__ import annotations

from collections.abc import Iterable

from .affine import affine_transform_dataset
from .constants import (
    LOG,
    AggMethods,
    FillValues,
    InterpMethods,
    RecoverNans,
)
from .gridmapping import GridMapping
from .rectify import rectify_dataset
from .reproject import reproject_dataset
from .utils import _can_apply_affine_transform
from .xrlite import Dataset


def choose_route(source_gm: GridMapping, target_gm: GridMapping | None) -> str:
    """Pick the resampling route for a (source, target) grid-mapping pair.

    Returns one of ``"rectify"``, ``"warn-identity"``, ``"identity"``,
    ``"affine"``, ``"reproject"``.  Raises if *target_gm* is irregular
    (only regular targets can be resampled to).
    """
    if not source_gm.is_regular:
        return "rectify"
    if target_gm is None:
        return "warn-identity"
    GridMapping.assert_regular(target_gm, name="target_gm")
    if source_gm.is_close(target_gm):
        return "identity"
    if _can_apply_affine_transform(source_gm, target_gm):
        return "affine"
    return "reproject"


def resample_in_space(
    source_ds: Dataset,
    target_gm: GridMapping | None = None,
    source_gm: GridMapping | None = None,
    variables: str | Iterable[str] | None = None,
    interp_methods: InterpMethods | None = None,
    agg_methods: AggMethods | None = None,
    recover_nans: RecoverNans = False,
    fill_values: FillValues | None = None,
    tile_size: int | tuple[int, int] | None = None,
) -> Dataset:
    """Resample the spatial dimensions of a dataset to a target grid mapping.

    Routes (see :func:`choose_route`):

    * irregular source -> :func:`rectify_dataset`
    * regular source, no target -> warn and return the input
    * grid mappings close -> return the input
    * same / both-geographic CRS -> :func:`affine_transform_dataset`
    * otherwise -> :func:`reproject_dataset`

    Args:
        source_ds: Input dataset; data variables ordered
            (optional leading dim, y, x).
        target_gm: Target grid mapping (must be regular).  If absent and the
            source is irregular, derived via ``source_gm.to_regular``.
        source_gm: Source grid mapping; inferred from *source_ds* if absent.
        variables: Variable name(s) to resample; all if None.
        interp_methods: Upsampling interpolation per variable/dtype:
            0/"nearest", 1/"bilinear", "triangular".
            Default 0 for integers, else 1.
        agg_methods: Downsampling aggregation per variable/dtype:
            "center", "count", "first", "last", "max", "mean", "median",
            "mode", "min", "prod", "std", "sum", "var".
            Default "center" for integers, else "mean".
        recover_nans: Enable NaN recovery during upsampling.
        fill_values: Fill for areas outside input coverage; defaults by
            dtype (float: NaN, uint8: 255, uint16: 65535, other ints: -1).
        tile_size: Tile size when deriving a regular grid for an irregular
            source (only used when *target_gm* is None).

    Returns:
        A new dataset resampled to the target grid mapping.
    """
    if source_gm is None:
        source_gm = GridMapping.from_dataset(source_ds)

    route = choose_route(source_gm, target_gm)

    if route == "warn-identity":
        LOG.warning(
            "If source grid mapping is regular `target_gm` must be given. "
            "Source dataset is returned."
        )
        return source_ds
    if route == "identity":
        return source_ds

    engine_kwargs = dict(
        source_gm=source_gm,
        variables=variables,
        interp_methods=interp_methods,
        agg_methods=agg_methods,
        recover_nans=recover_nans,
        fill_values=fill_values,
    )
    if route == "rectify":
        return rectify_dataset(
            source_ds, target_gm=target_gm, tile_size=tile_size, **engine_kwargs
        )
    if route == "affine":
        return affine_transform_dataset(source_ds, target_gm, **engine_kwargs)
    return reproject_dataset(source_ds, target_gm, **engine_kwargs)
