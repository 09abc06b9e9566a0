// accblas-tpu native host runtime.
//
// TPU-native equivalent of the reference's host-side C++ layer: data
// generation (reference cuda/matrix_helper.cuh:28-75), precision conversion
// (cuda/matrix_helper.cuh:93-103), and the accurate error reductions
// (tree reduce / compare, cuda/utils.cuh:281-332 — here upgraded to long
// double accumulation so "the error of the error" is even smaller).
//
// The uniform generator is the counter-based splitmix64 scheme defined in
// accblas_tpu/utils/prng.py; the two implementations are bit-identical and
// tested for exact equality (tests/test_native.py). Exposed as a plain C ABI
// for ctypes binding — no pybind11 dependency.
//
// Build: accblas_tpu/native/Makefile (g++ -O3 -fopenmp -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cfloat>

extern "C" {

static inline uint64_t splitmix64(uint64_t x) {
    uint64_t z = x + 0x9E3779B97F4A7C15ULL;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

static inline double uniform_at(uint64_t idx, uint64_t seed, uint64_t rnd,
                                double lo, double hi) {
    uint64_t key = idx * 0x9E3779B97F4A7C15ULL + seed + rnd * 0xD1342543DE82EF95ULL;
    uint64_t bits = splitmix64(key);
    double u = (double)(bits >> 11) * (1.0 / 9007199254740992.0); // 2^-53
    return lo + u * (hi - lo);
}

// Generate a rows x stride row-major float64 matrix; the [rows, cols] view is
// filled with uniform(lo, hi) values filtered to be normal in float32 range
// (reference subnormal filter, cuda/matrix_helper.cuh:42-45); stride padding
// is zeroed.
void ab_gen_mtx(double* out, int64_t rows, int64_t cols, int64_t stride,
                uint64_t seed, double lo, double hi) {
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < rows; ++r) {
        double* rowp = out + r * stride;
        for (int64_t c = 0; c < cols; ++c) {
            uint64_t idx = (uint64_t)(r * cols + c);
            uint64_t rnd = 0;
            double v = uniform_at(idx, seed, rnd, lo, hi);
            while (!std::isfinite(v) || std::fabs(v) < (double)FLT_MIN) {
                v = uniform_at(idx, seed, ++rnd, lo, hi);
            }
            rowp[c] = v;
        }
        for (int64_t c = cols; c < stride; ++c) rowp[c] = 0.0;
    }
}

// ||a - b||_1 with long double pairwise-block accumulation.
double ab_abs_diff_norm1(const double* a, const double* b, int64_t n) {
    long double total = 0.0L;
#pragma omp parallel reduction(+ : total)
    {
#pragma omp for schedule(static)
        for (int64_t i = 0; i < n; ++i) {
            total += fabsl((long double)a[i] - (long double)b[i]);
        }
    }
    return (double)total;
}

// ||a||_1 with long double accumulation.
double ab_norm1(const double* a, int64_t n) {
    long double total = 0.0L;
#pragma omp parallel reduction(+ : total)
    {
#pragma omp for schedule(static)
        for (int64_t i = 0; i < n; ++i) total += fabsl((long double)a[i]);
    }
    return (double)total;
}

void ab_convert_f64_f32(const double* in, float* out, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) out[i] = (float)in[i];
}

// float64 -> bfloat16 (round to nearest even), emitted as uint16 bit patterns.
void ab_convert_f64_bf16(const double* in, uint16_t* out, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        float f = (float)in[i];
        uint32_t bits;
        std::memcpy(&bits, &f, 4);
        uint32_t lsb = (bits >> 16) & 1u;
        bits += 0x7FFFu + lsb; // RNE
        out[i] = (uint16_t)(bits >> 16);
    }
}

int ab_version() { return 1; }

} // extern "C"
