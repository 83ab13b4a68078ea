// Fused light-truth record emitter.
//
// The numpy emission path in models/light._emit_truth makes ~6 strided
// passes over the ~270 MB record block per event (per-channel transposes,
// nonzero index arrays, then one structured-field write per column).  Each
// channel's (kc, S) value block is only ~200 KB — cache-resident — so a
// single fused loop that thresholds and writes whole 32-byte records
// sequentially does the same work in one pass over the output.
//
// Record layout must match io/export.TRUTH_DTYPE (packed, 32 bytes):
//   [0]  int32  trigger_id   (the running trigger offset when the worker
//                             resolved it pre-emit; 0 otherwise, and the
//                             writer thread stamps it afterwards)
//   [4]  int32  op_channel_id
//   [8]  int32  tick
//   [12] int32  event_id
//   [16] int64  segment_id
//   [24] double pe_current
//
// Emission order matches the numpy path exactly: channel-major, then tick
// (s), then contributor row within the channel.  The threshold compare is
// float32 (numpy weak promotion casts the python-float threshold to the
// array dtype), so borderline values agree bit-for-bit.

#include <cstdint>
#include <cmath>

extern "C" int64_t truth_count(const float* res, int64_t n_rows, int64_t S,
                               double threshold) {
    const float thr = (float)threshold;
    int64_t n = 0;
    const int64_t total = n_rows * S;
    for (int64_t i = 0; i < total; ++i)
        n += std::fabs(res[i]) > thr;
    return n;
}

extern "C" void truth_emit(const float* res, const int32_t* rows_k,
                           const int64_t* c_starts,
                           const int32_t* op_channel, const int64_t* ids,
                           int64_t C, int64_t K, int64_t S,
                           double threshold, int32_t event_id,
                           int32_t trigger_id, char* out) {
    const float thr = (float)threshold;
    char* p = out;
    for (int64_t c = 0; c < C; ++c) {
        const int64_t r0 = c_starts[c], r1 = c_starts[c + 1];
        if (r0 == r1) continue;
        const int32_t oc = op_channel[c];
        const int64_t* ids_c = ids + c * K;
        for (int64_t s = 0; s < S; ++s) {
            for (int64_t r = r0; r < r1; ++r) {
                const float v = res[r * S + s];
                if (std::fabs(v) > thr) {
                    *(int32_t*)(p + 0) = trigger_id;
                    *(int32_t*)(p + 4) = oc;
                    *(int32_t*)(p + 8) = (int32_t)s;
                    *(int32_t*)(p + 12) = event_id;
                    *(int64_t*)(p + 16) = ids_c[rows_k[r]];
                    *(double*)(p + 24) = (double)v;
                    p += 32;
                }
            }
        }
    }
}
