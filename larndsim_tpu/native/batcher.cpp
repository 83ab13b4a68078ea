// Native batch assigner: one pass over track segments.
//
// Replaces the reference's per-(event, TPC-group) re-masking of the whole
// segment array (util/batching.py:17-67 re-evaluates an O(n_segments)
// active-volume mask for every event x TPC-group iteration, i.e.
// O(n_events * n_tpc * n_segments) host work).  Here each segment is
// assigned once to its (event, first-containing-TPC-group) batch in a
// single O(n_segments * n_tpc) pass, preserving the reference's ordering
// semantics: a segment joins the earliest TPC group whose sorted bounding
// box contains its start or end point.
//
// Built as a plain C shared library (no pybind11 in this image); the
// Python wrapper (batching_native.py) loads it via ctypes and falls back
// to a vectorized numpy implementation when no compiler is available.

#include <cstdint>
#include <cstring>

extern "C" {

// coords layout: 6 arrays of length n: x_start, y_start, z_start,
//                x_end, y_end, z_end
// borders: (n_tpc, 3, 2) row-major, pre-sorted along the last axis
// group_of_tpc: (n_tpc,) TPC index -> batch group
// out_group: (n,) first containing group, -1 if none
void assign_batches(int64_t n, int64_t n_tpc,
                    const float* xs, const float* ys, const float* zs,
                    const float* xe, const float* ye, const float* ze,
                    const double* borders, const int32_t* group_of_tpc,
                    int32_t n_groups, int32_t* out_group) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t best = -1;
        for (int64_t t = 0; t < n_tpc; ++t) {
            const double* b = borders + t * 6;
            const double x0 = b[0], x1 = b[1];
            const double y0 = b[2], y1 = b[3];
            const double z0 = b[4], z1 = b[5];
            const bool in_start =
                xs[i] > x0 && xs[i] < x1 && ys[i] > y0 && ys[i] < y1 &&
                zs[i] > z0 && zs[i] < z1;
            const bool in_end =
                xe[i] > x0 && xe[i] < x1 && ye[i] > y0 && ye[i] < y1 &&
                ze[i] > z0 && ze[i] < z1;
            if (in_start || in_end) {
                const int32_t g = group_of_tpc[t];
                if (best < 0 || g < best) best = g;
                if (best == 0) break;  // can't get earlier
            }
        }
        out_group[i] = best;
    }
    (void)n_groups;
}

// Histogram of (event_index * n_groups + group) batch keys; the caller
// builds batch index lists from the counts with a prefix sum.
void batch_counts(int64_t n, const int64_t* keys, int64_t n_keys,
                  int64_t* counts) {
    std::memset(counts, 0, sizeof(int64_t) * n_keys);
    for (int64_t i = 0; i < n; ++i) {
        const int64_t k = keys[i];
        if (k >= 0 && k < n_keys) counts[k] += 1;
    }
}

}  // extern "C"
