// Native dense-tile scatter for the stream lookup front end.
//
// The Pallas stream kernel (kmergutsjava_tpu/lookup/pallas_stream.py)
// probes billions of slot-channels per second, but its host front end —
// bucketing query k-mers by home slot into the dense [nsuper, C, ROWS,
// BLOCK] fingerprint tile — ran at ~3.6M queries/s in numpy (np.unique +
// argsort per chunk). This sequential scatter replaces that path: one
// pass over the chunk, O(1) per query.
//
// Deduplication is by (home slot, fingerprint), and the dedup structure
// is THE TILE ITSELF: before taking a new channel, the query's ≤C
// already-occupied channels are scanned for its fingerprint, and a match
// shares that cell. This makes dedup global across streaming chunks with
// no auxiliary hash table (the tiles plus the occupancy plane are the
// entire working set), which is what keeps metagenome-coverage inputs —
// the same genomic k-mer arriving over and over in different reads —
// from exhausting a home slot's C channels.
//
// Sharing a cell on a fingerprint collision (two DISTINCT values with
// equal home and equal fp) is sound: the kernel only ever matches
// fingerprints, and the host decode verifies every candidate against the
// full k-mer value, routing failures to the exact full-window fallback
// (lookup/pallas_stream.py _decode). Both colliding queries therefore
// still get exact answers.
//
// Outputs per query: home slot, flat element index into the flattened
// kernel output [nsuper, C/4, ROWS, BLOCK], and the bit shift of its
// packed result byte (the kernel packs 4 channels' offsets per int32);
// shift = -1 marks channel overflow (the caller routes those to the
// exact fallback).
//
// Reference analog: the home-slot routing side of the merge-join scan,
// /root/reference/lib/src/kmergutsjava/KmerGutsJava.java:964-994
// (neededHashCode = value % numSigs and the inProgress keying).

#include <cstdint>

// Fused decode of the stream kernel's packed output: candidate-offset
// extraction, stop-at-empty gating, full-value verification, the exact
// full-window fallback AND hit compaction in ONE pass per query. The
// numpy twin (lookup/pallas_stream.py _decode_numpy) needs ~20 full-size
// array passes for the same job; on hosts where memory is the bottleneck
// (and at metagenome scales it always is) this pass is ~10x faster.
//
// Per query: if shift < 0 the query overflowed its home's channels at
// scatter time -> probe the window directly. Otherwise read its packed
// byte; a fingerprint-candidate offset strictly before the home's first
// empty slot (fe plane) is verified against the full k-mer value; a
// failed verification or a windowful of non-empty slots falls back to
// the direct window probe (exact: first-free-slot insertion keeps every
// slot between home and placement occupied, see lookup/xla.py).
//
// Exactness contract as the reference's merge-join scan
// (/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:995-1016):
// a hit's slot holds the exact k-mer value; misses stop at an empty slot.
//
// Outputs are the compacted hit columns (cnt, pos, otu, avg, fi, wt) plus
// the hit values (for the kmers-found debug counter); returns the hit
// count. Output arrays must have capacity n.

extern "C" int64_t decode_hits(
    const int64_t* v, const int64_t* cnt, const int64_t* pos,
    const int64_t* homes, const int64_t* flat, const int32_t* shift,
    int64_t n,
    const int32_t* out,       // flattened kernel output
    const uint8_t* fe,        // per-slot distance to first empty (cap w)
    const int64_t* hk,        // padded host k-mer plane
    int64_t hk_len, int64_t w, int64_t full_w,
    const int32_t* t_otu, const int32_t* t_avg, const int32_t* t_fi,
    const float* t_wt,        // contiguous table columns [num_sigs]
    int64_t* o_cnt, int64_t* o_pos, int32_t* o_otu, int32_t* o_avg,
    int32_t* o_fi, float* o_wt, int64_t* o_val)
{
    int64_t k = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t h = homes[i];
        const int64_t vi = v[i];
        int64_t slot = -1;
        bool fallback;
        if (shift[i] < 0) {
            fallback = true;  // channel overflow at scatter time
        } else {
            const int64_t off = (out[flat[i]] >> shift[i]) & 0xFF;
            const uint8_t f = fe[h];
            if (off < (int64_t)f) {      // candidate before first empty
                if (h + off < hk_len && hk[h + off] == vi) {
                    slot = h + off;
                    fallback = false;
                } else {
                    fallback = true;     // fingerprint collision
                }
            } else {
                fallback = (int64_t)f >= w;  // no empty in window: unresolved
            }
        }
        if (fallback) {
            const int64_t lim = full_w < hk_len - h ? full_w : hk_len - h;
            for (int64_t l = 0; l < lim; l++) {
                if (hk[h + l] == vi) { slot = h + l; break; }
            }
        }
        if (slot >= 0) {
            o_cnt[k] = cnt[i];
            o_pos[k] = pos[i];
            o_otu[k] = t_otu[slot];
            o_avg[k] = t_avg[slot];
            o_fi[k] = t_fi[slot];
            o_wt[k] = t_wt[slot];
            o_val[k] = vi;
            k++;
        }
    }
    return k;
}

extern "C" int64_t scatter_chunk(
    const int64_t* values, int64_t n,
    int64_t num_sigs, int64_t channels, int64_t block, int64_t rows,
    int64_t fp_mod,
    uint16_t* qfp_tiles,   // [nsuper*channels*rows*block], mutated
    uint8_t* occ,          // [num_sigs] per-slot channel occupancy, mutated
    int64_t* homes,        // out [n]
    int64_t* flat,         // out [n] flat kernel-output element index
    int32_t* shift)        // out [n] packed-byte bit shift; -1 = overflow
{
    const int64_t planes = channels >> 2;
    const int64_t row_sz = rows * block;
    int64_t placed = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t v = values[i];
        const int64_t h = v % num_sigs;
        homes[i] = h;
        const uint16_t fp = (uint16_t)(v % fp_mod);
        const int64_t blk = h / block;
        const int64_t sup = blk / rows;
        const int64_t row = blk % rows;
        const int64_t within = h % block;
        // tile cell of (home, channel c) = base + c * row_sz
        uint16_t* cell0 = qfp_tiles
            + (sup * channels * row_sz + row * block + within);
        const uint8_t c = occ[h];
        const int64_t live = c < channels ? c : channels;
        int64_t ch = -1;
        for (int64_t ci = 0; ci < live; ci++) {
            if (cell0[ci * row_sz] == fp) { ch = ci; break; }
        }
        if (ch < 0) {
            if (c < 255) occ[h] = (uint8_t)(c + 1);
            if ((int64_t)c >= channels) {  // channel overflow
                flat[i] = 0;
                shift[i] = -1;
                continue;
            }
            ch = c;
            cell0[ch * row_sz] = fp;
        }
        flat[i] = ((sup * planes + (ch >> 2)) * rows + row) * block + within;
        shift[i] = (int32_t)(8 * (ch & 3));
        placed++;
    }
    return placed;
}
