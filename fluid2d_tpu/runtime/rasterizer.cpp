// Native scene rasterizer — host-side runtime component.
//
// The reference's scene construction is per-cell Python loops
// (set_circle iterates a radius² box per obstacle,
// /root/reference/fs/boundary_condition.py:137-154); scene 3 places 100
// circles and production grids go to res=4096 (8192×4096 cells), where
// Python-level construction becomes seconds of host time per scene.
// This translation unit rasterizes circles/boxes/threshold masks
// directly into the scene arrays.
//
// Semantics contract (bit-identical to scenes/builder.py, tested):
//  * circle candidate box = [nearbyint(max(c-r,0)), nearbyint(min(c+r, extent)))
//    with round-half-to-even (matches np.round / Python round),
//  * a cell joins the wall iff hypot(i+0.5-cx, j+0.5-cy) < r in double,
//  * wall cells zero bc (2ch) and dye (3ch) and set mask=1.
//
// Build: see build_rasterizer.sh (g++ -O3 -shared -fPIC). Loaded via
// ctypes by fluid2d_tpu/runtime/__init__.py with a NumPy fallback.

#include <cfenv>
#include <cmath>
#include <cstdint>

namespace {

inline long round_even(double v) {
  // std::nearbyint honours the current rounding mode; default is
  // FE_TONEAREST = round-half-to-even, matching np.round.
  return static_cast<long>(std::nearbyint(v));
}

inline void paint_cell(std::uint8_t* mask, float* bc, float* dye, long x_res,
                       long y_res, long i, long j) {
  (void)x_res;
  const long idx = i * y_res + j;
  mask[idx] = 1;
  bc[2 * idx] = 0.0f;
  bc[2 * idx + 1] = 0.0f;
  dye[3 * idx] = 0.0f;
  dye[3 * idx + 1] = 0.0f;
  dye[3 * idx + 2] = 0.0f;
}

}  // namespace

extern "C" {

// Rasterize `n` circles given as (cx, cy, r) triples.
void raster_circles(std::uint8_t* mask, float* bc, float* dye, long x_res,
                    long y_res, const double* circles, long n) {
  std::fesetround(FE_TONEAREST);
  for (long k = 0; k < n; ++k) {
    const double cx = circles[3 * k], cy = circles[3 * k + 1],
                 r = circles[3 * k + 2];
    const long lo_i = round_even(cx - r > 0.0 ? cx - r : 0.0);
    const long lo_j = round_even(cy - r > 0.0 ? cy - r : 0.0);
    const long hi_i =
        round_even(cx + r < static_cast<double>(x_res) ? cx + r
                                                       : static_cast<double>(x_res));
    const long hi_j =
        round_even(cy + r < static_cast<double>(y_res) ? cy + r
                                                       : static_cast<double>(y_res));
    for (long i = lo_i; i < hi_i; ++i) {
      const double dx = static_cast<double>(i) + 0.5 - cx;
      for (long j = lo_j; j < hi_j; ++j) {
        const double dy = static_cast<double>(j) + 0.5 - cy;
        // sqrt(dx²+dy²), NOT std::hypot: numpy's linalg.norm (the
        // reference's predicate) computes sqrt of the sum of squares,
        // and hypot can differ by 1 ulp at knife-edge cells.
        if (std::sqrt(dx * dx + dy * dy) < r)
          paint_cell(mask, bc, dye, x_res, y_res, i, j);
      }
    }
  }
}

// Rasterize an axis-aligned box [x0, x1) × [y0, y1) (clamped).
void raster_box(std::uint8_t* mask, float* bc, float* dye, long x_res,
                long y_res, long x0, long y0, long x1, long y1) {
  if (x0 < 0) x0 = 0;
  if (y0 < 0) y0 = 0;
  if (x1 > x_res) x1 = x_res;
  if (y1 > y_res) y1 = y_res;
  for (long i = x0; i < x1; ++i)
    for (long j = y0; j < y1; ++j) paint_cell(mask, bc, dye, x_res, y_res, i, j);
}

// Mark cells whose grayscale value is below `threshold` as walls.
void raster_gray_mask(std::uint8_t* mask, float* bc, float* dye, long x_res,
                      long y_res, const std::uint8_t* gray, long threshold) {
  for (long i = 0; i < x_res; ++i)
    for (long j = 0; j < y_res; ++j)
      if (gray[i * y_res + j] < threshold)
        paint_cell(mask, bc, dye, x_res, y_res, i, j);
}

}  // extern "C"
