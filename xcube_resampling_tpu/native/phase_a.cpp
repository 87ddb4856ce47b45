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
// Each source point's floored destination coordinates and finiteness flag
// are shared by up to four quads; they are computed once per point into
// row caches (bit-identical — the same floor((p - off) / scale)
// expression, evaluated once).  The per-quad work is then a cull on
// cached values, with the triangle solves only for quads whose rect
// intersects the destination grid.
//
// Build: g++ -O3 -ffp-contract=off [-march=native] [-fopenmp] — see
// __init__.py; contraction stays off so the double math matches numpy.
//
// The multi-threaded variant (inverse_ij_map_f64_mt) exploits that
// sequential first-writer-wins over row-major quads equals "minimum quad
// rank wins": threads process contiguous source-row blocks (rank order
// within each thread, so local first-wins stays valid) into private claim
// maps carrying the winning quad rank, then a min-by-rank merge produces
// output bit-identical to the sequential kernel regardless of thread
// count.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

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

// Per-source-row cache of destination-floored coordinates + finiteness.
struct RowCache {
    std::vector<double> fi, fj;
    std::vector<uint8_t> ok;
    void resize(size_t w) {
        fi.resize(w);
        fj.resize(w);
        ok.resize(w);
    }
};

inline void fill_row_cache(
    const double* x_row, const double* y_row, int64_t w,
    double dst_x_offset, double dst_y_offset,
    double dst_x_scale, double dst_y_scale, RowCache& rc) {
    double* fi = rc.fi.data();
    double* fj = rc.fj.data();
    uint8_t* ok = rc.ok.data();
    for (int64_t i = 0; i < w; ++i) {
        const double x = x_row[i];
        const double y = y_row[i];
        fi[i] = std::floor((x - dst_x_offset) / dst_x_scale);
        fj[i] = std::floor((y - dst_y_offset) / dst_y_scale);
        ok[i] = !(std::isnan(x) || std::isnan(y));
    }
}

// Claim policies: Direct = sequential first-writer-wins into the output
// map; Ranked = per-thread claim map carrying the winning quad rank.
struct DirectClaim {
    double* out_i;
    double* out_j;
    int64_t dst_w;
    inline bool taken(int64_t p) const { return !std::isnan(out_i[p]); }
    inline void write(int64_t p, int64_t, double si, double sj,
                      double i_base, double j_base) {
        out_i[p] = i_base + si;
        out_j[p] = j_base + sj;
    }
};

struct RankedClaim {
    int64_t* rank_map;
    double* out_i;
    double* out_j;
    int64_t dst_w;
    static constexpr int64_t kFree = std::numeric_limits<int64_t>::max();
    inline bool taken(int64_t p) const { return rank_map[p] != kFree; }
    inline void write(int64_t p, int64_t rank, double si, double sj,
                      double i_base, double j_base) {
        rank_map[p] = rank;
        out_i[p] = i_base + si;
        out_j[p] = j_base + sj;
    }
};

template <class Claim>
void phase_a_core(
    const double* src_x, const double* src_y,
    int64_t src_h, int64_t src_w, int64_t src_stride,
    int64_t j_begin, int64_t j_end,
    int64_t src_i_min, int64_t src_j_min,
    int64_t dst_h, int64_t dst_w,
    double dst_x_offset, double dst_y_offset,
    double dst_x_scale, double dst_y_scale,
    double uv_delta, Claim claim) {
    const double u_min = -uv_delta;
    const double v_min = -uv_delta;
    const double uv_max = 1.0 + 2.0 * uv_delta;
    const double i_base = (double)src_i_min;
    const double j_base = (double)src_j_min;

    RowCache rc0, rc1;
    rc0.resize((size_t)src_w);
    rc1.resize((size_t)src_w);
    fill_row_cache(src_x + j_begin * src_stride, src_y + j_begin * src_stride,
                   src_w, dst_x_offset, dst_y_offset, dst_x_scale,
                   dst_y_scale, rc0);

    for (int64_t j0 = j_begin; j0 < j_end; ++j0) {
        const double* x_row0 = src_x + j0 * src_stride;
        const double* x_row1 = x_row0 + src_stride;
        const double* y_row0 = src_y + j0 * src_stride;
        const double* y_row1 = y_row0 + src_stride;
        fill_row_cache(x_row1, y_row1, src_w, dst_x_offset, dst_y_offset,
                       dst_x_scale, dst_y_scale, rc1);
        const double* fi0r = rc0.fi.data();
        const double* fj0r = rc0.fj.data();
        const uint8_t* ok0 = rc0.ok.data();
        const double* fi1r = rc1.fi.data();
        const double* fj1r = rc1.fj.data();
        const uint8_t* ok1 = rc1.ok.data();

        for (int64_t i0 = 0; i0 + 1 < src_w; ++i0) {
            // any-NaN corner drops the quad
            if (!(ok0[i0] & ok0[i0 + 1] & ok1[i0] & ok1[i0 + 1])) continue;

            const double fimin = std::min(std::min(fi0r[i0], fi0r[i0 + 1]),
                                          std::min(fi1r[i0], fi1r[i0 + 1]));
            const double fimax = std::max(std::max(fi0r[i0], fi0r[i0 + 1]),
                                          std::max(fi1r[i0], fi1r[i0 + 1]));
            const double fjmin = std::min(std::min(fj0r[i0], fj0r[i0 + 1]),
                                          std::min(fj1r[i0], fj1r[i0 + 1]));
            const double fjmax = std::max(std::max(fj0r[i0], fj0r[i0 + 1]),
                                          std::max(fj1r[i0], fj1r[i0 + 1]));
            if (std::isnan(fimin) || std::isnan(fjmin)) continue;
            if (fimax < 0 || fjmax < 0 || fimin >= (double)dst_w ||
                fjmin >= (double)dst_h)
                continue;

            const double p0x = x_row0[i0], p1x = x_row0[i0 + 1];
            const double p2x = x_row1[i0], p3x = x_row1[i0 + 1];
            const double p0y = y_row0[i0], p1y = y_row0[i0 + 1];
            const double p2y = y_row1[i0], p3y = y_row1[i0 + 1];

            const int64_t i_lo = (int64_t)std::max(fimin, 0.0);
            const int64_t i_hi = (int64_t)std::min(fimax, (double)(dst_w - 1));
            const int64_t j_lo = (int64_t)std::max(fjmin, 0.0);
            const int64_t j_hi = (int64_t)std::min(fjmax, (double)(dst_h - 1));

            double det_a = fdet(p0x, p0y, p1x, p1y, p2x, p2y);
            double det_b = fdet(p3x, p3y, p2x, p2y, p1x, p1y);
            if (std::isnan(det_a)) det_a = 0.0;
            if (std::isnan(det_b)) det_b = 0.0;
            if (det_a == 0.0 && det_b == 0.0) continue;

            // int64: a swath can exceed 2^31 quads, and int32 overflow
            // here is UB plus a possible collision with the kFree sentinel
            const int64_t rank = j0 * (src_w - 1) + i0;

            for (int64_t dj = j_lo; dj <= j_hi; ++dj) {
                const double dy =
                    dst_y_offset + ((double)dj + 0.5) * dst_y_scale;
                const int64_t row_p = dj * dst_w;
                for (int64_t di = i_lo; di <= i_hi; ++di) {
                    const int64_t p = row_p + di;
                    if (claim.taken(p)) continue;
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
                    if (si != -1.0)
                        claim.write(p, rank, si, sj, i_base, j_base);
                }
            }
        }
        std::swap(rc0, rc1);
    }
}

}  // namespace

extern "C" {

// out must be pre-filled with NaN and have shape (2, dst_h, dst_w), C order.
void inverse_ij_map_f64(
    const double* src_x, const double* src_y,
    int64_t src_h, int64_t src_w, int64_t src_stride,
    int64_t src_i_min, int64_t src_j_min,
    int64_t dst_h, int64_t dst_w,
    double dst_x_offset, double dst_y_offset,
    double dst_x_scale, double dst_y_scale,
    double uv_delta,
    double* out) {
    if (src_h < 2 || src_w < 2) return;
    DirectClaim claim{out, out + dst_h * dst_w, dst_w};
    phase_a_core(src_x, src_y, src_h, src_w, src_stride, 0, src_h - 1,
                 src_i_min, src_j_min, dst_h, dst_w,
                 dst_x_offset, dst_y_offset, dst_x_scale, dst_y_scale,
                 uv_delta, claim);
}

// Multi-threaded Phase A: bit-identical to inverse_ij_map_f64 for any
// n_threads (min-rank merge of per-thread contiguous-row-block claims).
void inverse_ij_map_f64_mt(
    const double* src_x, const double* src_y,
    int64_t src_h, int64_t src_w, int64_t src_stride,
    int64_t src_i_min, int64_t src_j_min,
    int64_t dst_h, int64_t dst_w,
    double dst_x_offset, double dst_y_offset,
    double dst_x_scale, double dst_y_scale,
    double uv_delta,
    double* out,
    int32_t n_threads) {
    if (src_h < 2 || src_w < 2) return;
    const int64_t n_rows = src_h - 1;
    int T = n_threads > 0 ? n_threads : 1;
    if ((int64_t)T > n_rows) T = (int)n_rows;
    if (T <= 1) {
        inverse_ij_map_f64(src_x, src_y, src_h, src_w, src_stride,
                           src_i_min, src_j_min, dst_h, dst_w,
                           dst_x_offset, dst_y_offset, dst_x_scale,
                           dst_y_scale, uv_delta, out);
        return;
    }

    const int64_t npx = dst_h * dst_w;
    const int64_t kFree = RankedClaim::kFree;
    std::vector<int64_t> ranks((size_t)T * npx, kFree);
    std::vector<double> ois((size_t)T * npx);
    std::vector<double> ojs((size_t)T * npx);

#ifdef _OPENMP
#pragma omp parallel for num_threads(T) schedule(static, 1)
#endif
    for (int t = 0; t < T; ++t) {
        const int64_t j_begin = n_rows * t / T;
        const int64_t j_end = n_rows * (t + 1) / T;
        RankedClaim claim{ranks.data() + (size_t)t * npx,
                          ois.data() + (size_t)t * npx,
                          ojs.data() + (size_t)t * npx, dst_w};
        phase_a_core(src_x, src_y, src_h, src_w, src_stride, j_begin, j_end,
                     src_i_min, src_j_min, dst_h, dst_w,
                     dst_x_offset, dst_y_offset, dst_x_scale, dst_y_scale,
                     uv_delta, claim);
    }

    double* out_i = out;
    double* out_j = out + npx;
#ifdef _OPENMP
#pragma omp parallel for num_threads(T) schedule(static)
#endif
    for (int64_t p = 0; p < npx; ++p) {
        int64_t best = kFree;
        int bt = -1;
        for (int t = 0; t < T; ++t) {
            const int64_t r = ranks[(size_t)t * npx + p];
            if (r < best) {
                best = r;
                bt = t;
            }
        }
        if (bt >= 0) {
            out_i[p] = ois[(size_t)bt * npx + p];
            out_j[p] = ojs[(size_t)bt * npx + p];
        }
    }
}

}  // extern "C"
