// Native host kernel: pixel-bbox discovery over 2D coordinate images —
// rectify's halo/overlap discovery (reference numba prange scan,
// gridmapping/bboxes.py:28-106; numpy port in gridmapping/bboxes.py).
//
// Semantics match the numpy/reference scan exactly: a pixel is included
// when its x and y coordinates lie inside the border-grown xy box (NaN
// comparisons are false, excluding non-finite pixels); i_max/j_max are
// exclusive; ij_border grows the result clipped to the image; boxes with
// no hit keep their -1 fill.
//
// One prepass records each row's finite x/y extents; per box, rows whose
// extents cannot intersect the box are skipped entirely, so the scan
// touches ~1/n of the image per box instead of all of it — the dominant
// cost of the numpy masked reduction.

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// x_image/y_image: (h, w) float64, C order; xy_boxes: (n, 4) float64 of
// [x_min, y_min, x_max, y_max]; ij_boxes: (n, 4) int64 pre-filled -1.
void compute_ij_bboxes_f64(
    const double* x_image, const double* y_image,
    int64_t h, int64_t w,
    const double* xy_boxes, int64_t n,
    double xy_border, int64_t ij_border,
    int64_t* ij_boxes) {
    const double inf = std::numeric_limits<double>::infinity();

    std::vector<double> row_xmin((size_t)h, inf), row_xmax((size_t)h, -inf);
    std::vector<double> row_ymin((size_t)h, inf), row_ymax((size_t)h, -inf);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t j = 0; j < h; ++j) {
        const double* xr = x_image + j * w;
        const double* yr = y_image + j * w;
        double xmn = inf, xmx = -inf, ymn = inf, ymx = -inf;
        for (int64_t i = 0; i < w; ++i) {
            const double x = xr[i];
            const double y = yr[i];
            // NaN fails every comparison, matching the numpy mask
            if (x < xmn) xmn = x;
            if (x > xmx) xmx = x;
            if (y < ymn) ymn = y;
            if (y > ymx) ymx = y;
        }
        row_xmin[j] = xmn;
        row_xmax[j] = xmx;
        row_ymin[j] = ymn;
        row_ymax[j] = ymx;
    }

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1)
#endif
    for (int64_t k = 0; k < n; ++k) {
        const double x_min = xy_boxes[k * 4 + 0] - xy_border;
        const double y_min = xy_boxes[k * 4 + 1] - xy_border;
        const double x_max = xy_boxes[k * 4 + 2] + xy_border;
        const double y_max = xy_boxes[k * 4 + 3] + xy_border;
        int64_t i0 = w, i1 = -1, j0 = h, j1 = -1;
        for (int64_t j = 0; j < h; ++j) {
            // a row whose finite extents cannot reach the box has an
            // all-false mask row; skipping it is exact
            if (row_xmax[j] < x_min || row_xmin[j] > x_max ||
                row_ymax[j] < y_min || row_ymin[j] > y_max)
                continue;
            const double* xr = x_image + j * w;
            const double* yr = y_image + j * w;
            // only the row's extreme hits matter: scan forward to the
            // first and backward to the last, never the middle
            int64_t lo = -1, hi = -1;
            for (int64_t i = 0; i < w; ++i) {
                if (xr[i] >= x_min && xr[i] <= x_max && yr[i] >= y_min &&
                    yr[i] <= y_max) {
                    lo = i;
                    break;
                }
            }
            if (lo < 0) continue;
            hi = lo;
            for (int64_t i = w - 1; i > lo; --i) {
                if (xr[i] >= x_min && xr[i] <= x_max && yr[i] >= y_min &&
                    yr[i] <= y_max) {
                    hi = i;
                    break;
                }
            }
            if (lo < i0) i0 = lo;
            if (hi > i1) i1 = hi;
            if (j < j0) j0 = j;
            j1 = j;
        }
        if (j1 < 0) continue;  // no hit: keep the -1 fill
        ++i1;  // exclusive stops
        ++j1;
        if (ij_border != 0) {
            i0 = i0 - ij_border < 0 ? 0 : i0 - ij_border;
            j0 = j0 - ij_border < 0 ? 0 : j0 - ij_border;
            i1 = i1 + ij_border > w ? w : i1 + ij_border;
            j1 = j1 + ij_border > h ? h : j1 + ij_border;
        }
        ij_boxes[k * 4 + 0] = i0;
        ij_boxes[k * 4 + 1] = j0;
        ij_boxes[k * 4 + 2] = i1;
        ij_boxes[k * 4 + 3] = j1;
    }
}

}  // extern "C"
