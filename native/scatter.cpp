// Native dense-tile scatter for the stream lookup front end.
//
// The Pallas stream kernel (kmergutsjava_tpu/lookup/pallas_stream.py)
// probes billions of slot-channels per second, but its host front end —
// bucketing query k-mers by home slot into the dense [nsuper, C, ROWS,
// BLOCK] fingerprint tile — ran at ~1M queries/s in numpy (np.unique +
// argsort per chunk). This sequential hash-dedup scatter replaces that
// path: one pass over the chunk, O(1) per query.
//
// Semantics (differentially tested against the numpy path in
// tests/test_pallas_stream.py):
//  - duplicate values within a chunk share one tile cell (equal values
//    have equal home and fingerprint; one probe answers every copy);
//  - each new unique value takes the next free channel c = occ[home] of
//    its home slot; occ advances (saturating at 255) whether or not the
//    value fits, matching the numpy path's unique-count accounting;
//  - values beyond the C channels report shift = -1 (channel overflow;
//    the caller routes them to the exact full-window fallback). Channel
//    ranks are assigned in encounter order rather than the numpy path's
//    value order — a different but equally valid overflow split.
//
// Outputs per query: home slot, flat element index into the flattened
// kernel output [nsuper, C/4, ROWS, BLOCK], and the bit shift of its
// packed result byte (the kernel packs 4 channels' offsets per int32).
//
// Reference analog: the home-slot routing side of the merge-join scan,
// /root/reference/lib/src/kmergutsjava/KmerGutsJava.java:964-994
// (neededHashCode = value % numSigs and the inProgress keying).

#include <cstdint>

extern "C" int64_t scatter_chunk(
    const int64_t* values, int64_t n,
    int64_t num_sigs, int64_t channels, int64_t block, int64_t rows,
    int64_t fp_mod,
    uint16_t* qfp_tiles,   // [nsuper*channels*rows*block], mutated
    uint8_t* occ,          // [num_sigs] per-slot channel occupancy, mutated
    int64_t* homes,        // out [n]
    int64_t* flat,         // out [n] flat kernel-output element index
    int32_t* shift,        // out [n] packed-byte bit shift; -1 = overflow
    int64_t* ht,           // scratch [ht_size]; holds first-occurrence idx
    int64_t ht_size)       // power of two, >= 2n
{
    for (int64_t i = 0; i < ht_size; i++) ht[i] = -1;
    const uint64_t mask = (uint64_t)ht_size - 1;
    const int64_t planes = channels >> 2;
    int64_t placed = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t v = values[i];
        const int64_t h = v % num_sigs;
        homes[i] = h;
        // chunk-local dedup: open-addressed table of first-occurrence
        // indices keyed by value
        uint64_t x = (uint64_t)v * 0x9E3779B97F4A7C15ull;
        x ^= x >> 29;
        uint64_t s = x & mask;
        int64_t first = -1;
        for (;;) {
            const int64_t e = ht[s];
            if (e < 0) { ht[s] = i; break; }
            if (values[e] == v) { first = e; break; }
            s = (s + 1) & mask;
        }
        if (first >= 0) {  // duplicate: share the first copy's cell
            flat[i] = flat[first];
            shift[i] = shift[first];
            if (shift[i] >= 0) placed++;
            continue;
        }
        const uint8_t c = occ[h];
        if (c < 255) occ[h] = (uint8_t)(c + 1);
        if ((int64_t)c >= channels) { flat[i] = 0; shift[i] = -1; continue; }
        const int64_t blk = h / block;
        const int64_t sup = blk / rows;
        const int64_t row = blk % rows;
        const int64_t within = h % block;
        qfp_tiles[((sup * channels + c) * rows + row) * block + within] =
            (uint16_t)(v % fp_mod);
        flat[i] = ((sup * planes + (c >> 2)) * rows + row) * block + within;
        shift[i] = (int32_t)(8 * (c & 3));
        placed++;
    }
    return placed;
}
