// Native host kernel: rectify Phase B (gather + interpolate through the
// fractional (i, j) map).
//
// Replaces the vectorized numpy port of the reference's
// `_compute_var_image_sequential` / `_compute_var_image_for_dest_line`
// (reference rectify.py:640-734) on the host tier.  Semantics are
// bit-identical to ops/rectify_ops.py::var_image_from_ij_map for float32
// and float64 variables:
//
//  * index split: i0 = trunc(map_i), u = map_i - i0 (float64 throughout —
//    the reference upcasts the window to float64 before interpolating);
//  * nearest rounds u > 0.5 up, clipped to the source bounds;
//  * triangular picks the near/far triangle by u + v < 1;
//  * NaN map cells produce the fill value; NaN source taps propagate.
//
// Clipping to the full source bounds equals the numpy path's clip to its
// nanmin/nanmax window: map values are clamped into the source rectangle
// by Phase A (fclamp of u/v), so window-relative indices are never
// negative and i0 + 1 never exceeds the window's +2-padded edge.  That
// equivalence is what lets this kernel skip the two full-map nanmin/nanmax
// passes the numpy path needs to size its window copy.
//
// Built into libxrtpu_native.so next to phase_a.cpp (see __init__.py).

#include <cmath>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

template <typename T>
inline void gather_rows(
    const T* src, int64_t n_bands, int64_t src_h, int64_t src_w,
    const double* map_i, const double* map_j,
    int64_t dst_h, int64_t dst_w,
    double fill, int interp, T* out) {
    const int64_t src_px = src_h * src_w;
    const int64_t dst_px = dst_h * dst_w;

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t dj = 0; dj < dst_h; ++dj) {
        for (int64_t di = 0; di < dst_w; ++di) {
            const int64_t p = dj * dst_w + di;
            const double mi = map_i[p];
            const double mj = map_j[p];
            if (std::isnan(mi) || std::isnan(mj)) {
                for (int64_t b = 0; b < n_bands; ++b)
                    out[b * dst_px + p] = (T)fill;
                continue;
            }
            // truncation matches numpy's positive-index astype(int64)
            int64_t i0 = (int64_t)mi;
            int64_t j0 = (int64_t)mj;
            const double u = mi - (double)i0;
            const double v = mj - (double)j0;

            if (interp == 0) {  // nearest
                int64_t i_sel = u > 0.5 ? i0 + 1 : i0;
                int64_t j_sel = v > 0.5 ? j0 + 1 : j0;
                if (i_sel < 0) i_sel = 0;
                if (i_sel > src_w - 1) i_sel = src_w - 1;
                if (j_sel < 0) j_sel = 0;
                if (j_sel > src_h - 1) j_sel = src_h - 1;
                const int64_t sp = j_sel * src_w + i_sel;
                for (int64_t b = 0; b < n_bands; ++b)
                    out[b * dst_px + p] = src[b * src_px + sp];
                continue;
            }

            int64_t i0c = i0 < 0 ? 0 : (i0 > src_w - 1 ? src_w - 1 : i0);
            int64_t j0c = j0 < 0 ? 0 : (j0 > src_h - 1 ? src_h - 1 : j0);
            int64_t i1 = i0c + 1 > src_w - 1 ? src_w - 1 : i0c + 1;
            int64_t j1 = j0c + 1 > src_h - 1 ? src_h - 1 : j0c + 1;
            const int64_t p00 = j0c * src_w + i0c;
            const int64_t p01 = j0c * src_w + i1;
            const int64_t p10 = j1 * src_w + i0c;
            const int64_t p11 = j1 * src_w + i1;
            for (int64_t b = 0; b < n_bands; ++b) {
                const T* s = src + b * src_px;
                const double v00 = (double)s[p00];
                const double v01 = (double)s[p01];
                const double v10 = (double)s[p10];
                const double v11 = (double)s[p11];
                double value;
                if (interp == 1) {  // triangular
                    if (u + v < 1.0)
                        value = v00 + u * (v01 - v00) + v * (v10 - v00);
                    else
                        value = v11 + (1.0 - u) * (v10 - v11) +
                                (1.0 - v) * (v01 - v11);
                } else {  // bilinear
                    const double vu0 = v00 + u * (v01 - v00);
                    const double vu1 = v10 + u * (v11 - v10);
                    value = vu0 + v * (vu1 - vu0);
                }
                out[b * dst_px + p] = (T)value;
            }
        }
    }
}

}  // namespace

extern "C" {

// src/out share dtype_code (0 = float32, 1 = float64); shapes are
// src (n_bands, src_h, src_w) and out (n_bands, dst_h, dst_w), C order;
// ij_map is (2, dst_h, dst_w) float64 of absolute fractional source
// indices; interp: 0 = nearest, 1 = triangular, 2 = bilinear.
void var_image_gather(
    const void* src, int32_t dtype_code,
    int64_t n_bands, int64_t src_h, int64_t src_w,
    const double* ij_map,
    int64_t dst_h, int64_t dst_w,
    double fill, int32_t interp,
    void* out) {
    const double* map_i = ij_map;
    const double* map_j = ij_map + dst_h * dst_w;
    if (dtype_code == 0)
        gather_rows<float>((const float*)src, n_bands, src_h, src_w,
                           map_i, map_j, dst_h, dst_w, fill, interp,
                           (float*)out);
    else
        gather_rows<double>((const double*)src, n_bands, src_h, src_w,
                            map_i, map_j, dst_h, dst_w, fill, interp,
                            (double*)out);
}

}  // extern "C"
