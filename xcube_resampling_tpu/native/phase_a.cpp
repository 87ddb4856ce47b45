// Native host kernel: rectify Phase A (inverse source-pixel lookup).
//
// This is the rebuild's native runtime tier for the host orchestration
// side, replacing the reference's numba-JIT scatter loops
// (reference rectify.py:424-576).  Semantics are identical to the Python
// float64 reference implementation in ops/rectify_ops.py: per-quad
// destination rects from floored corner coordinates, two barycentric
// triangle solves with uv_delta tolerance, and sequential first-writer-wins
// (row-major quad order), which equals the scatter-min-rank resolution of
// the vectorized paths.
//
// Build: g++ -O3 -fPIC -shared -o libphase_a.so phase_a.cpp
// (see build.py; loaded via ctypes, no pybind11 required)

#include <cmath>
#include <cstdint>
#include <algorithm>
#include <limits>

namespace {

inline double fdet(double px0, double py0, double px1, double py1,
                   double px2, double py2) {
    return (px0 - px1) * (py0 - py2) - (px0 - px2) * (py0 - py1);
}

inline double fu(double px, double py, double px0, double py0,
                 double px2, double py2) {
    return (px0 - px) * (py0 - py2) - (py0 - py) * (px0 - px2);
}

inline double fv(double px, double py, double px0, double py0,
                 double px1, double py1) {
    return (py0 - py) * (px0 - px1) - (px0 - px) * (py0 - py1);
}

inline double fclamp(double x, double lo, double hi) {
    return x < lo ? lo : (x > hi ? hi : x);
}

}  // namespace

extern "C" {

// out must be pre-filled with NaN and have shape (2, dst_h, dst_w), C order.
void inverse_ij_map_f64(
    const double* src_x, const double* src_y,
    int64_t src_h, int64_t src_w,
    int64_t src_i_min, int64_t src_j_min,
    int64_t dst_h, int64_t dst_w,
    double dst_x_offset, double dst_y_offset,
    double dst_x_scale, double dst_y_scale,
    double uv_delta,
    double* out) {
    if (src_h < 2 || src_w < 2) return;

    double* out_i = out;
    double* out_j = out + dst_h * dst_w;

    const double u_min = -uv_delta;
    const double v_min = -uv_delta;
    const double uv_max = 1.0 + 2.0 * uv_delta;

    for (int64_t j0 = 0; j0 + 1 < src_h; ++j0) {
        const double* x_row0 = src_x + j0 * src_w;
        const double* x_row1 = x_row0 + src_w;
        const double* y_row0 = src_y + j0 * src_w;
        const double* y_row1 = y_row0 + src_w;
        for (int64_t i0 = 0; i0 + 1 < src_w; ++i0) {
            const double p0x = x_row0[i0], p1x = x_row0[i0 + 1];
            const double p2x = x_row1[i0], p3x = x_row1[i0 + 1];
            const double p0y = y_row0[i0], p1y = y_row0[i0 + 1];
            const double p2y = y_row1[i0], p3y = y_row1[i0 + 1];

            // any-NaN corner drops the quad (std::min/max would not
            // propagate the NaN reliably)
            if (std::isnan(p0x) || std::isnan(p1x) || std::isnan(p2x) ||
                std::isnan(p3x) || std::isnan(p0y) || std::isnan(p1y) ||
                std::isnan(p2y) || std::isnan(p3y))
                continue;

            // destination rect from floored corner pixel coordinates
            const double fi0 = std::floor((p0x - dst_x_offset) / dst_x_scale);
            const double fi1 = std::floor((p1x - dst_x_offset) / dst_x_scale);
            const double fi2 = std::floor((p2x - dst_x_offset) / dst_x_scale);
            const double fi3 = std::floor((p3x - dst_x_offset) / dst_x_scale);
            const double fj0 = std::floor((p0y - dst_y_offset) / dst_y_scale);
            const double fj1 = std::floor((p1y - dst_y_offset) / dst_y_scale);
            const double fj2 = std::floor((p2y - dst_y_offset) / dst_y_scale);
            const double fj3 = std::floor((p3y - dst_y_offset) / dst_y_scale);

            const double fimin = std::min(std::min(fi0, fi1), std::min(fi2, fi3));
            const double fimax = std::max(std::max(fi0, fi1), std::max(fi2, fi3));
            const double fjmin = std::min(std::min(fj0, fj1), std::min(fj2, fj3));
            const double fjmax = std::max(std::max(fj0, fj1), std::max(fj2, fj3));
            if (std::isnan(fimin) || std::isnan(fjmin)) continue;
            if (fimax < 0 || fjmax < 0 || fimin >= (double)dst_w ||
                fjmin >= (double)dst_h)
                continue;

            int64_t i_lo = (int64_t)std::max(fimin, 0.0);
            int64_t i_hi = (int64_t)std::min(fimax, (double)(dst_w - 1));
            int64_t j_lo = (int64_t)std::max(fjmin, 0.0);
            int64_t j_hi = (int64_t)std::min(fjmax, (double)(dst_h - 1));

            double det_a = fdet(p0x, p0y, p1x, p1y, p2x, p2y);
            double det_b = fdet(p3x, p3y, p2x, p2y, p1x, p1y);
            if (std::isnan(det_a)) det_a = 0.0;
            if (std::isnan(det_b)) det_b = 0.0;
            if (det_a == 0.0 && det_b == 0.0) continue;

            for (int64_t dj = j_lo; dj <= j_hi; ++dj) {
                const double dy = dst_y_offset + ((double)dj + 0.5) * dst_y_scale;
                double* oi_row = out_i + dj * dst_w;
                double* oj_row = out_j + dj * dst_w;
                for (int64_t di = i_lo; di <= i_hi; ++di) {
                    // first writer wins (row-major quad order)
                    if (!std::isnan(oi_row[di])) continue;
                    const double dx =
                        dst_x_offset + ((double)di + 0.5) * dst_x_scale;

                    double si = -1.0, sj = -1.0;
                    if (det_a != 0.0) {
                        const double u =
                            fu(dx, dy, p0x, p0y, p2x, p2y) / det_a;
                        const double v =
                            fv(dx, dy, p0x, p0y, p1x, p1y) / det_a;
                        if (u >= u_min && v >= v_min && u + v <= uv_max) {
                            si = (double)i0 + fclamp(u, 0.0, 1.0);
                            sj = (double)j0 + fclamp(v, 0.0, 1.0);
                        }
                    }
                    if (si == -1.0 && det_b != 0.0) {
                        const double u =
                            fu(dx, dy, p3x, p3y, p1x, p1y) / det_b;
                        const double v =
                            fv(dx, dy, p3x, p3y, p2x, p2y) / det_b;
                        if (u >= u_min && v >= v_min && u + v <= uv_max) {
                            si = (double)(i0 + 1) - fclamp(u, 0.0, 1.0);
                            sj = (double)(j0 + 1) - fclamp(v, 0.0, 1.0);
                        }
                    }
                    if (si != -1.0) {
                        oi_row[di] = (double)src_i_min + si;
                        oj_row[di] = (double)src_j_min + sj;
                    }
                }
            }
        }
    }
}

}  // extern "C"
