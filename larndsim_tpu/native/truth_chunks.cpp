// Fused light-truth record emit + shuffle + LZF chunk compress.
//
// The two-stage truth pipeline (worker emits a ~300 MB/spill record block;
// the writer thread later re-reads it to shuffle+LZF each 1 MiB chunk for
// write_direct_chunk) round-trips the whole block through DRAM and costs
// a second full pass on the single bench core.  This module fuses the
// stages: records stream straight into a 1 MiB staging chunk that is
// shuffled (lzf_core.h, AVX-512 when available) and LZF-encoded the moment
// it fills — the record block never exists in memory, and the writer
// thread only calls write_direct_chunk on the precompressed chunks.
//
// HDF5 chunk alignment: the dataset's existing row count is not generally
// a multiple of the 32768-record chunk, so the walk's first
// `head_cap = (chunk_rows - start_offset % chunk_rows) % chunk_rows`
// records are returned RAW (the writer stitches them into the existing
// partial tail chunk with the normal append path), then full chunks are
// compressed here, and the final partial chunk's records are returned RAW
// as the new tail.  Record layout, walk order, and the float32 threshold
// compare are identical to truth_emit.cpp (channel-major, then tick, then
// contributor) — the output stream is byte-identical to the unfused path.

#include <cmath>

#include "lzf_core.h"

namespace {

struct RecordSink {
    char* head;             // raw head records (head_cap capacity)
    char* tail;             // raw tail records
    char* staging;          // one chunk of records (chunk_bytes)
    uint8_t* shuf;          // shuffle scratch (chunk_bytes)
    uint8_t* comp;          // per-chunk compressed output, comp_stride each
    int64_t comp_stride;
    int32_t* comp_sizes;
    uint8_t* comp_flags;
    int64_t chunk_rows;
    int64_t head_cap;
    int64_t n_chunks;       // full chunks expected
    int64_t emitted = 0;
    int64_t chunk_i = 0;
    char* p = nullptr;      // next record slot
    int64_t room = 0;       // record slots left in the current region

    void advance() {
        if (emitted < head_cap) {
            p = head + emitted * 32;
            room = head_cap - emitted;
            return;
        }
        if (p != nullptr && p == staging + chunk_rows * 32) {
            // a full staging chunk just completed: shuffle + encode
            const int cb = int(chunk_rows * 32);
            shuffle((const uint8_t*)staging, cb, 32, shuf);
            int sz = lzf_encode(shuf, cb, comp + chunk_i * comp_stride,
                                cb - 1);
            if (sz > 0) {
                comp_sizes[chunk_i] = sz;
                comp_flags[chunk_i] = 0;
            } else {   // incompressible: store shuffled-raw, mask lzf bit
                std::memcpy(comp + chunk_i * comp_stride, shuf, cb);
                comp_sizes[chunk_i] = cb;
                comp_flags[chunk_i] = 1;
            }
            ++chunk_i;
        }
        if (chunk_i < n_chunks) {
            p = staging;
            room = chunk_rows;
        } else {
            p = tail;
            room = INT64_MAX;   // caller sized tail from the count pass
        }
    }

    inline char* slot() {
        if (room == 0) advance();
        --room;
        ++emitted;
        char* q = p;
        p += 32;
        return q;
    }
};

}  // namespace

extern "C" {

// Same record count as truth_emit.truth_count (duplicated here so this
// library is self-contained for the worker).
int64_t truth_chunks_count(const float* res, int64_t n_rows, int64_t S,
                           double threshold) {
    const float thr = (float)threshold;
    int64_t n = 0;
    const int64_t total = n_rows * S;
    for (int64_t i = 0; i < total; ++i)
        n += std::fabs(res[i]) > thr;
    return n;
}

// Emit + compress.  Caller precomputes via truth_chunks_count:
//   head_cap  = min(total, (chunk_rows - start_offset % chunk_rows)
//                          % chunk_rows)
//   n_chunks  = (total - head_cap) / chunk_rows
//   tail gets   total - head_cap - n_chunks*chunk_rows records
// comp_out must hold n_chunks * comp_stride bytes with
// comp_stride >= chunk_rows*32; staging and shuf hold chunk_rows*32 each.
void truth_emit_chunks(const float* res, const int32_t* rows_k,
                       const int64_t* c_starts, const int32_t* op_channel,
                       const int64_t* ids, int64_t C, int64_t K, int64_t S,
                       double threshold, int32_t event_id,
                       int32_t trigger_id, int64_t head_cap,
                       int64_t n_chunks, int64_t chunk_rows,
                       char* head_out, char* tail_out, char* staging,
                       uint8_t* shuf_scratch, uint8_t* comp_out,
                       int64_t comp_stride, int32_t* comp_sizes,
                       uint8_t* comp_flags) {
    RecordSink sink{head_out, tail_out, staging, shuf_scratch, comp_out,
                    comp_stride, comp_sizes, comp_flags, chunk_rows,
                    head_cap, n_chunks};
    const float thr = (float)threshold;
    for (int64_t c = 0; c < C; ++c) {
        const int64_t r0 = c_starts[c], r1 = c_starts[c + 1];
        if (r0 == r1) continue;
        const int32_t oc = op_channel[c];
        const int64_t* ids_c = ids + c * K;
        for (int64_t s = 0; s < S; ++s) {
            for (int64_t r = r0; r < r1; ++r) {
                const float v = res[r * S + s];
                if (std::fabs(v) > thr) {
                    char* p = sink.slot();
                    *(int32_t*)(p + 0) = trigger_id;
                    *(int32_t*)(p + 4) = oc;
                    *(int32_t*)(p + 8) = (int32_t)s;
                    *(int32_t*)(p + 12) = event_id;
                    *(int64_t*)(p + 16) = ids_c[rows_k[r]];
                    *(double*)(p + 24) = (double)v;
                }
            }
        }
    }
    // flush a just-completed final staging chunk (walk may end exactly on
    // the boundary, with the compress still pending)
    if (sink.p == staging + chunk_rows * 32 && sink.chunk_i < n_chunks)
        sink.advance();
}

}  // extern "C"
