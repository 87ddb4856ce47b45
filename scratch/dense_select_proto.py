"""Prototype: exact dense (one-hot matmul) piece kernel vs the gather
piece kernel.  Selection of source values via 0/1 bf16 matmuls with a
manual 3-term bf16 decomposition of the window — exact for finite f32
and NaN; the per-pixel lerp afterwards is the gather formula verbatim.

CPU validation of bit-exactness (TPU validation runs separately).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax import lax

from xcube_resampling_tpu.ops.reproject_ops import (
    make_gather_piece_kernel_dyn,
    _interp_field,
)


def make_dense_piece_kernel(
    step, out_h, out_w, src_h_g, src_w_g, interp_method, fill_value
):
    nearest = interp_method == "nearest"

    def select_rows(win, y0w):
        """Exact row gather: M[p, :] = win[y0w[p], :] via one-hot matmul.

        win: (wh, ww) float32 scrubbed to finite; y0w: (npix,) int32 in
        [0, wh).  Returns (npix, ww) float32, bit-exact selection.
        """
        wh = win.shape[0]
        hi = win.astype(jnp.bfloat16)
        r1 = win - hi.astype(jnp.float32)
        lo = r1.astype(jnp.bfloat16)
        r2 = r1 - lo.astype(jnp.float32)
        lolo = r2.astype(jnp.bfloat16)
        a = (
            jnp.arange(wh, dtype=jnp.int32)[None, :] == y0w[:, None]
        ).astype(jnp.bfloat16)

        def d(m):
            return lax.dot(a, m, preferred_element_type=jnp.float32)

        return d(hi) + d(lo) + d(lolo)

    def select_rows_cls(cls, y0w):
        """Class-matrix row select (values 0..3, exact in bf16)."""
        wh = cls.shape[0]
        a = (
            jnp.arange(wh, dtype=jnp.int32)[None, :] == y0w[:, None]
        ).astype(jnp.bfloat16)
        return lax.dot(
            a, cls.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )

    def col_pick(m, x0w):
        """t[p] = m[p, x0w[p]] via masked sum (one nonzero per row)."""
        ww = m.shape[1]
        c = jnp.arange(ww, dtype=jnp.int32)[None, :] == x0w[:, None]
        return jnp.where(c, m, 0.0).sum(axis=1)

    def restore(val, c):
        return jnp.where(
            c == 1.0,
            jnp.float32(np.nan),
            jnp.where(
                c == 2.0,
                jnp.float32(np.inf),
                jnp.where(c == 3.0, jnp.float32(-np.inf), val),
            ),
        )

    def kernel(src, ix_field, iy_field, j_off, i_off):
        wh, ww = src.shape[-2:]
        rows = jnp.arange(out_h, dtype=jnp.float32)[:, None]
        cols = jnp.arange(out_w, dtype=jnp.float32)[None, :]
        ix = _interp_field(ix_field, rows, cols, step, jnp)
        iy = _interp_field(iy_field, rows, cols, step, jnp)
        valid = (
            (ix > -0.5) & (ix < src_w_g - 0.5)
            & (iy > -0.5) & (iy < src_h_g - 0.5)
        )
        ix = jnp.clip(ix, 0, src_w_g - 1)
        iy = jnp.clip(iy, 0, src_h_g - 1)

        finite = jnp.isfinite(src)
        clean = jnp.where(finite, src, 0.0).astype(jnp.float32)
        cls = jnp.where(
            finite,
            0.0,
            jnp.where(
                jnp.isnan(src), 1.0, jnp.where(src > 0, 2.0, 3.0)
            ),
        ).astype(jnp.float32)

        if nearest:
            jx = (jnp.rint(ix).astype(jnp.int32) - i_off).ravel()
            jy = (jnp.rint(iy).astype(jnp.int32) - j_off).ravel()
            jx = jnp.clip(jx, 0, ww - 1)
            jy = jnp.clip(jy, 0, wh - 1)
            m = select_rows(clean, jy)
            mc = select_rows_cls(cls, jy)
            vals = restore(col_pick(m, jx), col_pick(mc, jx))
            vals = vals.reshape(out_h, out_w)
        else:
            x0f = jnp.floor(ix)
            y0f = jnp.floor(iy)
            fx = (ix - x0f).ravel()
            fy = (iy - y0f).ravel()
            x0g = x0f.astype(jnp.int32)
            y0g = y0f.astype(jnp.int32)
            x1 = (jnp.clip(x0g + 1, 0, src_w_g - 1) - i_off).ravel()
            y1 = (jnp.clip(y0g + 1, 0, src_h_g - 1) - j_off).ravel()
            x0 = (x0g - i_off).ravel()
            y0 = (y0g - j_off).ravel()
            x0 = jnp.clip(x0, 0, ww - 1)
            x1 = jnp.clip(x1, 0, ww - 1)
            y0 = jnp.clip(y0, 0, wh - 1)
            y1 = jnp.clip(y1, 0, wh - 1)
            m0 = select_rows(clean, y0)
            m1 = select_rows(clean, y1)
            c0 = select_rows_cls(cls, y0)
            c1 = select_rows_cls(cls, y1)
            v00 = restore(col_pick(m0, x0), col_pick(c0, x0))
            v01 = restore(col_pick(m0, x1), col_pick(c0, x1))
            v10 = restore(col_pick(m1, x0), col_pick(c1, x0))
            v11 = restore(col_pick(m1, x1), col_pick(c1, x1))
            if interp_method == "triangular":
                near = v00 + fx * (v01 - v00) + fy * (v10 - v00)
                far = (
                    v11
                    + (1.0 - fx) * (v10 - v11)
                    + (1.0 - fy) * (v01 - v11)
                )
                vals = jnp.where(fx + fy < 1.0, near, far)
            else:
                vu0 = v00 + fx * (v01 - v00)
                vu1 = v10 + fx * (v11 - v10)
                vals = vu0 + fy * (vu1 - vu0)
            vals = vals.reshape(out_h, out_w)
        fill = jnp.asarray(fill_value, dtype=vals.dtype)
        return jnp.where(valid, vals, fill)

    return kernel


def main():
    rng = np.random.default_rng(7)
    step = 16
    out_h, out_w = 128, 128
    src_h_g, src_w_g = 3600, 7200
    wh, ww = 176, 272
    # window at the source origin so that out-of-global-bounds (invalid)
    # coords CLAMP into the window — the production invariant is that the
    # window covers every pixel's clamped coordinates (margin at plan
    # time); a window that misses valid pixels is never emitted
    j_off, i_off = 0, 0

    ncj = out_h // step + 2
    nci = out_w // step + 2
    iy_f = (20 + 120 * rng.random((ncj, nci))).astype(np.float32)
    ix_f = (20 + 220 * rng.random((ncj, nci))).astype(np.float32)
    # push a corner out of global bounds: the invalid-pixel sweep clamps
    # to row/col 0, staying inside the window
    ix_f[0, 0] = -50.0
    iy_f[-1, -1] = -40.0

    src_win = rng.random((wh, ww), dtype=np.float32) * 2e8 - 1e8
    # sprinkle non-finite values
    idx = rng.integers(0, wh * ww, 500)
    flat = src_win.ravel()
    flat[idx[:200]] = np.nan
    flat[idx[200:350]] = np.inf
    flat[idx[350:]] = -np.inf
    # and subnormals / negative zero
    flat[idx[:10] // 2] = -0.0
    flat[5] = 1e-41

    for method in ("nearest", "bilinear", "triangular"):
        gk = make_gather_piece_kernel_dyn(
            step, out_h, out_w, src_h_g, src_w_g, method, np.nan
        )
        dk = make_dense_piece_kernel(
            step, out_h, out_w, src_h_g, src_w_g, method, np.nan
        )
        a = np.asarray(
            gk(jnp.asarray(src_win), jnp.asarray(ix_f), jnp.asarray(iy_f),
               j_off, i_off)
        )
        b = np.asarray(
            dk(jnp.asarray(src_win), jnp.asarray(ix_f), jnp.asarray(iy_f),
               j_off, i_off)
        )
        bits_equal = np.array_equal(
            a.view(np.int32), b.view(np.int32)
        )
        val_equal = np.array_equal(a, b, equal_nan=True)
        n_diff = int((~((a == b) | (np.isnan(a) & np.isnan(b)))).sum())
        print(
            f"{method:10s}: bit_equal={bits_equal} value_equal={val_equal} "
            f"n_diff={n_diff}",
            flush=True,
        )
        if not val_equal:
            d = ~((a == b) | (np.isnan(a) & np.isnan(b)))
            ii = np.argwhere(d)[:5]
            for r, c in ii:
                print(f"  ({r},{c}): gather={a[r,c]!r} dense={b[r,c]!r}")


if __name__ == "__main__":
    main()
