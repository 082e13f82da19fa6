// Native host-side kernels for isokann_tpu.
//
// The reference offloads its hot non-device loops to native code (OpenMM
// C++ engine, CUDA kernels).  In the TPU rebuild the device work is XLA;
// the remaining host hot loops — adaptive-sampling selection sweeps and
// sparse graph relaxation — live here, exposed through a C ABI consumed
// via ctypes (isokann_tpu/native.py).
//
// Build: make -C native  (produces libisokann_host.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// pickclosest: sorted sweep matching needles to unique haystack entries.
// hs (sorted ascending, n), ns (sorted ascending, m) -> out indices (m).
// Mirrors the semantics of the Python _pickclosest_sorted
// (reference pickclosestloop, src/utils/subsample.jl:52-76).
// Returns the number of picks written.
// ---------------------------------------------------------------------------
int64_t pickclosest_sorted(const double* hs, int64_t n,
                           const double* ns, int64_t m,
                           int64_t* out) {
    if (n == 0 || m == 0) return 0;
    std::vector<uint8_t> avail(n, 1);
    // doubly linked list over available slots for O(1) neighbor hops
    std::vector<int64_t> nxt(n + 1), prv(n + 1);
    for (int64_t i = 0; i < n; ++i) { nxt[i] = i + 1; prv[i] = i - 1; }
    nxt[n] = n; prv[0] = -1;

    int64_t written = 0;
    int64_t i = 0;
    for (int64_t k = 0; k < m; ++k) {
        double needle = ns[k];
        double di = std::fabs(hs[i] - needle);
        for (;;) {
            int64_t j = nxt[i];
            if (j < n && std::fabs(hs[j] - needle) <= di) {
                di = std::fabs(hs[j] - needle);
                i = j;
            } else {
                out[written++] = i;
                avail[i] = 0;
                // unlink i
                int64_t p = prv[i], q = nxt[i];
                if (p >= 0) nxt[p] = q;
                if (q <= n) prv[q] = p;
                i = p;
                break;
            }
        }
        if (i < 0) {
            // find first available
            int64_t f = 0;
            while (f < n && !avail[f]) ++f;
            if (f == n) break;
            i = f;
        }
    }
    return written;
}

// ---------------------------------------------------------------------------
// ASH greedy resampler: given target probabilities p (m) for candidates ys
// (m) and an ASH histogram (counts over a uniform grid), iteratively pick
// argmax(p - pdf(y)) and deposit the pick into the histogram.
// Mirrors resample_kde_ash (reference src/utils/subsample.jl:127-177).
// ---------------------------------------------------------------------------
void ash_greedy(const double* ys, double* p, int64_t m,
                double* counts, int64_t nbins, double lo, double step,
                int64_t window, double n0, int64_t npick, int64_t* out) {
    auto binindex = [&](double x) -> int64_t {
        int64_t idx = (int64_t)std::llround((x - lo) / step);
        if (idx < 0) idx = 0;
        if (idx >= nbins) idx = nbins - 1;
        return idx;
    };
    double n = n0;
    double h = (double)window * step;
    // per-candidate bin indices
    std::vector<int64_t> ybin(m);
    for (int64_t i = 0; i < m; ++i) ybin[i] = binindex(ys[i]);

    // density via triangular smoothing evaluated lazily per candidate
    auto pdf_at = [&](int64_t bi) -> double {
        double acc = 0.0;
        int64_t a = std::max<int64_t>(0, bi - window + 1);
        int64_t b = std::min<int64_t>(nbins - 1, bi + window - 1);
        for (int64_t j = a; j <= b; ++j) {
            double w = 1.0 - (double)std::llabs(j - bi) / (double)window;
            acc += w * counts[j];
        }
        return acc / (n * h);
    };

    for (int64_t k = 0; k < npick; ++k) {
        double best = -std::numeric_limits<double>::infinity();
        int64_t bi = 0;
        for (int64_t i = 0; i < m; ++i) {
            double delta = p[i] - pdf_at(ybin[i]);
            if (delta > best) { best = delta; bi = i; }
        }
        out[k] = bi;
        p[bi] = 0.0;
        counts[ybin[bi]] += 1.0;
        n += 1.0;
    }
}

// ---------------------------------------------------------------------------
// Sparse Bellman-Ford over a CSR graph (host analog of the reference's
// CUDA kernel, src/utils/reactivepath.jl:252-296).
// indptr (n+1), indices (nnz), weights (nnz); dist/parent outputs (n).
// sources: ns source nodes.
// ---------------------------------------------------------------------------
void bellman_ford_csr(const int64_t* indptr, const int64_t* indices,
                      const double* weights, int64_t n,
                      const int64_t* sources, int64_t ns,
                      double* dist, int64_t* parent) {
    const double INF = std::numeric_limits<double>::infinity();
    for (int64_t i = 0; i < n; ++i) { dist[i] = INF; parent[i] = -1; }
    for (int64_t s = 0; s < ns; ++s) dist[sources[s]] = 0.0;

    bool changed = true;
    for (int64_t it = 0; it < n && changed; ++it) {
        changed = false;
        for (int64_t u = 0; u < n; ++u) {
            double du = dist[u];
            if (du == INF) continue;
            for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
                int64_t v = indices[e];
                double nd = du + weights[e];
                if (nd < dist[v] - 1e-12) {
                    dist[v] = nd;
                    parent[v] = u;
                    changed = true;
                }
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Greedy farthest-point picking over rows of X (npts x d), starting from
// the point farthest from the origin (reference src/utils/picking.jl:16-43).
// ---------------------------------------------------------------------------
void picking_maxmin(const double* X, int64_t npts, int64_t d,
                    int64_t npick, int64_t* out, double* mins_out) {
    std::vector<double> mins(npts, std::numeric_limits<double>::infinity());
    // start: farthest from origin
    int64_t q = 0;
    double best = -1.0;
    for (int64_t i = 0; i < npts; ++i) {
        double s = 0.0;
        for (int64_t j = 0; j < d; ++j) s += X[i * d + j] * X[i * d + j];
        if (s > best) { best = s; q = i; }
    }
    for (int64_t k = 0; k < npick; ++k) {
        out[k] = q;
        const double* xq = X + q * d;
        double nb = -1.0;
        int64_t nq = 0;
        for (int64_t i = 0; i < npts; ++i) {
            double s = 0.0;
            for (int64_t j = 0; j < d; ++j) {
                double diff = X[i * d + j] - xq[j];
                s += diff * diff;
            }
            if (s < mins[i]) mins[i] = s;
            if (mins[i] > nb) { nb = mins[i]; nq = i; }
        }
        q = nq;
    }
    if (mins_out) std::memcpy(mins_out, mins.data(), npts * sizeof(double));
}

}  // extern "C"
