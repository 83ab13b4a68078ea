// Native shuffle + LZF chunk compressor for HDF5 direct-chunk writes.
//
// The light-truth dataset (light_wvfm_mc_assn) is the output file's
// dominant volume (~300 MB/spill at production thresholds) and h5py's
// generic shuffle+lzf filter pipeline runs at ~190-290 MB/s on the bench
// host — the single biggest CPU consumer of the whole simulation once the
// device chain is sub-second.  This module produces byte-streams readable
// by the *standard* h5py lzf filter (H5Z filter 32000, same on-disk format
// as liblzf) but compresses record chunks in one cache-friendly pass:
// byte-plane shuffle of fixed-size records followed by a greedy
// hash-chain LZF encode tuned for the long runs the shuffle produces.
//
// The encoder was written from the LZF stream format:
//   ctrl < 0x20           : literal run of (ctrl+1) bytes follows
//   ctrl >= 0x20, len < 9 : ((len-2)<<5) | ((dist-1)>>8), (dist-1)&0xff
//   ctrl >= 0x20, len >= 9: (7<<5) | ((dist-1)>>8), len-9, (dist-1)&0xff
// with dist in [1, 8192] and match length in [3, 264].  Output is
// validated against h5py's own decompressor in tests/test_h5_direct.py.
#include "lzf_core.h"

extern "C" {

// Compress `n_chunks` consecutive chunks of `chunk_bytes` each from `in`
// (shuffle with record size `rec`, then LZF).  Scratch must hold
// chunk_bytes.  out must hold n_chunks*chunk_bytes.  sizes[i] receives the
// compressed size of chunk i, or chunk_bytes with flags[i]=1 when the
// chunk is stored shuffled-raw (lzf bit masked).  Output for chunk i
// starts at out + i*chunk_bytes.
void shuffle_lzf_chunks(const uint8_t* in, int64_t n_chunks,
                        int chunk_bytes, int rec, uint8_t* scratch,
                        uint8_t* out, int32_t* sizes, uint8_t* flags) {
    for (int64_t c = 0; c < n_chunks; ++c) {
        const uint8_t* src = in + c * chunk_bytes;
        uint8_t* dst = out + c * chunk_bytes;
        shuffle(src, chunk_bytes, rec, scratch);
        // require at least 1 byte of savings, like the HDF5 pipeline
        int sz = lzf_encode(scratch, chunk_bytes, dst, chunk_bytes - 1);
        if (sz > 0) {
            sizes[c] = sz;
            flags[c] = 0;
        } else {
            std::memcpy(dst, scratch, chunk_bytes);
            sizes[c] = chunk_bytes;
            flags[c] = 1;
        }
    }
}

// Single-chunk variant for the stitched head chunk / padded tail chunk.
// `in` holds exactly chunk_bytes of record data (caller pads).
int32_t shuffle_lzf_one(const uint8_t* in, int chunk_bytes, int rec,
                        uint8_t* scratch, uint8_t* out, uint8_t* flag) {
    int32_t size;
    shuffle_lzf_chunks(in, 1, chunk_bytes, rec, scratch, out, &size, flag);
    return size;
}

// Profiling entry: shuffle every chunk without encoding (attributes the
// combined pass's cost between transpose and LZF; tools/profile_truth_h5).
void shuffle_bench(const uint8_t* in, int64_t n_chunks, int chunk_bytes,
                   int rec, uint8_t* scratch) {
    for (int64_t c = 0; c < n_chunks; ++c)
        shuffle(in + c * chunk_bytes, chunk_bytes, rec, scratch);
}

}  // extern "C"
