"""Differential tests: parity scan vs vectorized XLA lookup, plus the parity
scan's reference-exact edge behaviors."""
import numpy as np
import pytest

from kmergutsjava_tpu.constants import EMPTY_KMER, MAX_ENCODED
from kmergutsjava_tpu.formats.kmer_table import KmerTable, build_table
from kmergutsjava_tpu.lookup.parity import (TableTruncatedError, lookup_stream,
                                            sort_queries)
from kmergutsjava_tpu.lookup.store import QueryKmerStore
from kmergutsjava_tpu.lookup.xla import XlaLookup
from test_table import random_signatures


def make_queries(rng, sig_kmers, n_queries, hit_fraction=0.5):
    n_hit = int(n_queries * hit_fraction)
    hit_vals = rng.choice(sig_kmers, size=n_hit) if len(sig_kmers) else np.array([], np.int64)
    miss_vals = rng.choice(MAX_ENCODED, size=n_queries - n_hit).astype(np.int64)
    values = np.concatenate([hit_vals, miss_vals]).astype(np.int64)
    rng.shuffle(values)
    cnt = rng.integers(0, 7, n_queries).astype(np.int64)
    pos = np.arange(n_queries, dtype=np.int64)
    return values, cnt, pos


def canon(hits):
    """Order-independent canonical multiset of hit records."""
    return sorted(zip(hits.cnt_id.tolist(), hits.pos.tolist(), hits.otu.tolist(),
                      hits.avg_from_end.tolist(), hits.fi.tolist(),
                      hits.wt.tolist()))


@pytest.mark.parametrize("seed,load", [(0, 0.5), (1, 0.7), (2, 0.95), (3, 0.3)])
def test_parity_vs_xla_random(seed, load):
    rng = np.random.default_rng(seed)
    sig = random_signatures(rng, 1500)
    table = build_table(**sig, load_factor=load)
    values, cnt, pos = make_queries(rng, sig["kmers"], 5000)
    a = lookup_stream(table, values, cnt, pos)
    b = XlaLookup(table, chunk=1024).lookup(values, cnt, pos)
    assert canon(a) == canon(b)
    assert a.kmers_found == b.kmers_found


def test_all_hits_and_all_misses():
    rng = np.random.default_rng(10)
    sig = random_signatures(rng, 400)
    table = build_table(**sig)
    # every signature queried once -> every one found
    v = sig["kmers"].copy()
    a = lookup_stream(table, v, np.zeros(len(v)), np.arange(len(v)))
    b = XlaLookup(table).lookup(v, np.zeros(len(v)), np.arange(len(v)))
    assert len(a) == len(v) and canon(a) == canon(b)
    assert a.kmers_found == len(v)
    # misses only
    misses = np.setdiff1d(np.arange(20000, dtype=np.int64), v)[:500]
    a = lookup_stream(table, misses, np.zeros(500), np.arange(500))
    b = XlaLookup(table).lookup(misses, np.zeros(500), np.arange(500))
    assert len(a) == 0 and len(b) == 0


def test_duplicate_query_values_fan_out():
    rng = np.random.default_rng(11)
    sig = random_signatures(rng, 50)
    table = build_table(**sig)
    v = np.repeat(sig["kmers"][:3], 4)
    cnt = np.arange(12) % 5
    pos = np.arange(12) * 10
    a = lookup_stream(table, v, cnt, pos)
    b = XlaLookup(table).lookup(v, cnt, pos)
    assert len(a) == 12
    assert canon(a) == canon(b)
    assert a.kmers_found == 3  # distinct matched values, ref kmersFound


def test_empty_query_set():
    rng = np.random.default_rng(12)
    table = build_table(**random_signatures(rng, 10))
    empty = np.array([], dtype=np.int64)
    a = lookup_stream(table, empty, empty, empty)
    b = XlaLookup(table).lookup(empty, empty, empty)
    assert len(a) == 0 and len(b) == 0


def test_truncated_table_raises_with_partial():
    """A probe walking off the table end = Java EOFException (ref :797-802)."""
    # handcrafted pathological table: last slot occupied by a non-matching
    # value whose chain forces the scan past the end
    num_sigs = 11
    slots = np.zeros(num_sigs, dtype=build_table(
        np.array([], np.int64), [], [], [], []).slots.dtype)
    slots["kmer"] = EMPTY_KMER
    slots["kmer"][0] = 0  # value 0, home 0 -> matches query 0
    slots["kmer"][10] = 21  # home 21 % 11 = 10; occupies last slot
    table = KmerTable(slots=slots, num_sigs=num_sigs)
    table.max_probe = 1
    # query value 32 has home 10; slot 10 holds 21 (non-match, non-empty),
    # scan advances past the last slot -> truncation, partial keeps value 0 hit
    values = np.array([0, 32], dtype=np.int64)
    with pytest.raises(TableTruncatedError) as ei:
        lookup_stream(table, values, np.array([0, 0]), np.array([5, 6]))
    partial = ei.value.partial
    assert partial.pos.tolist() == [5]


def test_sort_queries_matches_reference_comparator():
    values = np.array([23, 1, 12, 12, 3], dtype=np.int64)  # num_sigs 11
    v, c, p, h = sort_queries(values, np.arange(5), np.arange(5), 11)
    # homes: 23->1, 1->1, 12->1, 12->1, 3->3 ; order by (home, value)
    assert v.tolist() == [1, 12, 12, 23, 3]


def test_store_spill_and_merge(tmp_path):
    rng = np.random.default_rng(13)
    num_sigs = 101
    store = QueryKmerStore(num_sigs, input_size_limit=500, temp_dir=str(tmp_path))
    all_vals = []
    for _ in range(10):
        v = rng.integers(0, 10**6, 300).astype(np.int64)
        all_vals.append(v)
        store.add_batch(v, 1, np.arange(300))
    rec = store.finalize()
    vals = np.concatenate(all_vals)
    assert len(rec) == len(vals)
    home = rec["value"] % num_sigs
    key = np.stack([home, rec["value"]])
    assert np.all((np.diff(home) > 0) | ((np.diff(home) == 0) &
                                         (np.diff(rec["value"]) >= 0)))
    assert sorted(rec["value"].tolist()) == sorted(vals.tolist())
    store.close()


def test_store_in_ram_no_sort(tmp_path):
    store = QueryKmerStore(11, input_size_limit=10**9, temp_dir=str(tmp_path))
    v = np.array([5, 3, 9], dtype=np.int64)
    store.add_batch(v, 0, np.arange(3))
    rec = store.finalize()
    assert rec["value"].tolist() == [5, 3, 9]  # insertion order preserved
    store.close()


def test_int64_mode_matches_fingerprint_mode():
    rng = np.random.default_rng(21)
    sig = random_signatures(rng, 2000)
    table = build_table(**sig, load_factor=0.85)
    values, cnt, pos = make_queries(rng, sig["kmers"], 6000)
    a = XlaLookup(table, use_fingerprint=True).lookup(values, cnt, pos)
    b = XlaLookup(table, use_fingerprint=False).lookup(values, cnt, pos)
    assert canon(a) == canon(b)
    c = lookup_stream(table, values, cnt, pos)
    assert canon(a) == canon(c)


def test_wraparound_table_forward_only_miss():
    """A wrap-placed entry (home near the end, stored at the start) is
    invisible to the reference's forward-only scan (ref :991-994) AND to the
    probe-window backends (windows never wrap; the padded tail is empty) —
    both consistently miss."""
    num_sigs = 11
    slots = np.zeros(num_sigs, dtype=build_table(
        np.array([], np.int64), [], [], [], []).slots.dtype)
    slots["kmer"] = EMPTY_KMER
    # value 32 homes at slot 10; pretend slot 10 was full at insert time and
    # the builder wrapped it to slot 0 (textbook wrap placement)
    slots["kmer"][10] = 21  # home 10, occupies its own slot
    slots["kmer"][0] = 32   # wrapped entry
    table = KmerTable(slots=slots, num_sigs=num_sigs)
    table.max_probe = 2  # lie consistent with non-wrapping assumption

    values = np.array([32, 21], dtype=np.int64)
    # parity: probing 32 runs off the table end mid-probe = the reference's
    # EOFException with the 21-hit already recorded (partial report)
    with pytest.raises(TableTruncatedError) as ei:
        lookup_stream(table, values, np.zeros(2), np.arange(2))
    assert ei.value.partial.pos.tolist() == [1]
    # xla: the probe window reads the empty pad past the end -> clean miss
    # for 32; the hit set matches the parity partial
    b = XlaLookup(table).lookup(values, np.zeros(2), np.arange(2))
    assert sorted(b.pos.tolist()) == [1]


def test_store_merge_cascade_fuzz(tmp_path):
    """Many small spill files through the pairwise merge cascade."""
    rng = np.random.default_rng(31)
    for trial in range(5):
        num_sigs = int(rng.integers(11, 5000))
        store = QueryKmerStore(num_sigs, input_size_limit=int(rng.integers(20, 200)),
                               temp_dir=str(tmp_path / f"t{trial}"))
        all_v = []
        for _ in range(int(rng.integers(3, 25))):
            v = rng.integers(0, 10**7, int(rng.integers(1, 400))).astype(np.int64)
            all_v.append(v)
            store.add_batch(v, 0, np.arange(len(v)))
        rec = store.finalize()
        v = np.concatenate(all_v)
        assert len(rec) == len(v)
        home = rec["value"] % num_sigs
        ok = (np.diff(home) > 0) | ((np.diff(home) == 0)
                                    & (np.diff(rec["value"]) >= 0))
        assert ok.all()
        assert sorted(rec["value"].tolist()) == sorted(v.tolist())
        store.close()


def test_streaming_lookup_tiny_chunks():
    """StreamingLookup with a tiny chunk size: many dispatches through the
    resolver thread, same hits as the one-shot path."""
    from kmergutsjava_tpu.lookup.xla import StreamingLookup

    rng = np.random.default_rng(33)
    sig = random_signatures(rng, 2000)
    table = build_table(**sig, load_factor=0.8)
    values, cnt, pos = make_queries(rng, sig["kmers"], 9000)
    lk = XlaLookup(table, chunk=512)
    for async_resolve in (True, False):
        s = StreamingLookup(lk, async_resolve=async_resolve,
                            compute_kmers_found=True)
        # feed in ragged pieces
        i = 0
        while i < len(values):
            j = min(len(values), i + int(rng.integers(1, 700)))
            s.add_batch(values[i:j], 0, pos[i:j])
            i = j
        hits = s.finish()
        ref = lookup_stream(table, values, np.zeros(len(values)), pos)
        assert sorted(zip(hits.pos.tolist(), hits.fi.tolist(),
                          hits.wt.tolist())) == \
            sorted(zip(ref.pos.tolist(), ref.fi.tolist(), ref.wt.tolist()))
        assert hits.kmers_found == ref.kmers_found


def test_probe_fingerprint_pass_sorted_matches_unsorted():
    """Device-side home sort + unsort is a drop-in for the plain pass."""
    import jax.numpy as jnp

    from kmergutsjava_tpu.lookup.xla import (FP_MOD, probe_fingerprint_pass,
                                             probe_fingerprint_pass_sorted)

    rng = np.random.default_rng(91)
    sig = random_signatures(rng, 3000)
    table = build_table(**sig, load_factor=0.85)
    lk = XlaLookup(table, probe_impl="flat")
    values, _, _ = make_queries(rng, sig["kmers"], 4096)
    homes = (values % np.int64(table.num_sigs)).astype(np.int32)
    q_fp = (values % FP_MOD).astype(np.uint16)
    off_a, st_a = probe_fingerprint_pass(lk.tbl_fp, jnp.asarray(q_fp),
                                         jnp.asarray(homes), lk.w1)
    off_b, st_b = probe_fingerprint_pass_sorted(lk.tbl_fp, jnp.asarray(q_fp),
                                                jnp.asarray(homes), lk.w1)
    assert np.array_equal(np.asarray(off_a), np.asarray(off_b))
    assert np.array_equal(np.asarray(st_a), np.asarray(st_b))


def test_probe_rows_matches_flat():
    """Row-gather probe == flat-gather probe on identical queries, and the
    sorted row variant matches too (exercises both probe_impl paths)."""
    import jax.numpy as jnp

    from kmergutsjava_tpu.lookup.xla import (FP_MOD, probe_fingerprint_pass,
                                             probe_fingerprint_rows,
                                             probe_fingerprint_rows_sorted)

    rng = np.random.default_rng(92)
    sig = random_signatures(rng, 5000)
    table = build_table(**sig, load_factor=0.9)
    flat = XlaLookup(table, probe_impl="flat")
    rows = XlaLookup(table, probe_impl="rows")
    assert rows.tbl_fp.ndim == 2 and rows.tbl_fp.shape[1] == 128
    values, _, _ = make_queries(rng, sig["kmers"], 4096)
    # force homes onto row boundaries too (o = 0 and o = 127 edge cases)
    values[:64] = (values[:64] // 128) * 128
    homes = (values % np.int64(table.num_sigs)).astype(np.int32)
    q_fp = (values % FP_MOD).astype(np.uint16)
    off_a, st_a = probe_fingerprint_pass(flat.tbl_fp, jnp.asarray(q_fp),
                                         jnp.asarray(homes), flat.w1)
    off_b, st_b = probe_fingerprint_rows(rows.tbl_fp, jnp.asarray(q_fp),
                                         jnp.asarray(homes), rows.w1)
    off_c, st_c = probe_fingerprint_rows_sorted(
        rows.tbl_fp, jnp.asarray(q_fp), jnp.asarray(homes), rows.w1)
    assert flat.w1 == rows.w1
    assert np.array_equal(np.asarray(off_a), np.asarray(off_b))
    assert np.array_equal(np.asarray(st_a), np.asarray(st_b))
    assert np.array_equal(np.asarray(off_b), np.asarray(off_c))
    assert np.array_equal(np.asarray(st_b), np.asarray(st_c))


def test_probe_rows1_matches_flat():
    """Overlapped single-row-gather probe == flat probe on identical
    queries, incl. row-boundary homes of the overlapped layout; the sorted
    variant matches too, and full lookups agree across all impls."""
    import jax.numpy as jnp

    from kmergutsjava_tpu.lookup.xla import (FP_MOD, probe_fingerprint_pass,
                                             probe_fingerprint_rows1,
                                             probe_fingerprint_rows1_sorted)

    rng = np.random.default_rng(93)
    sig = random_signatures(rng, 5000)
    table = build_table(**sig, load_factor=0.9)
    flat = XlaLookup(table, probe_impl="flat")
    r1 = XlaLookup(table, probe_impl="rows1")
    assert r1.probe_impl == "rows1"
    assert r1.stride == r1.lanes - r1.w1
    # 128 lanes is the default at every window size (round-3 honest
    # re-measurement: narrow rows lose at every plane size; lanes stay
    # overridable via KMER_PROBE_LANES)
    assert r1.lanes == 128
    assert r1.tbl_fp.ndim == 2 and r1.tbl_fp.shape[1] == r1.lanes
    values, cnt, pos = make_queries(rng, sig["kmers"], 4096)
    # force HOMES onto overlapped-row boundaries (o = 0 and o = stride-1):
    # home = value % num_sigs, so the values themselves must be built from
    # the wanted home (rounding values would leave home % stride arbitrary)
    n_rows_in_table = table.num_sigs // r1.stride
    h0 = (np.arange(64, dtype=np.int64) % n_rows_in_table) * r1.stride
    h1 = np.minimum(h0 + r1.stride - 1, table.num_sigs - 1)
    values[:64] = h0 + np.int64(table.num_sigs)  # home == h0, o == 0
    values[64:128] = h1  # home == h1, o == stride-1 (or table edge)
    homes = (values % np.int64(table.num_sigs)).astype(np.int32)
    q_fp = (values % FP_MOD).astype(np.uint16)
    off_a, st_a = probe_fingerprint_pass(flat.tbl_fp, jnp.asarray(q_fp),
                                         jnp.asarray(homes), flat.w1)
    off_b, st_b = probe_fingerprint_rows1(r1.tbl_fp, jnp.asarray(q_fp),
                                          jnp.asarray(homes), r1.w1,
                                          r1.stride)
    off_c, st_c = probe_fingerprint_rows1_sorted(
        r1.tbl_fp, jnp.asarray(q_fp), jnp.asarray(homes), r1.w1, r1.stride)
    assert flat.w1 == r1.w1
    assert np.array_equal(np.asarray(off_a), np.asarray(off_b))
    assert np.array_equal(np.asarray(st_a), np.asarray(st_b))
    assert np.array_equal(np.asarray(off_b), np.asarray(off_c))
    assert np.array_equal(np.asarray(st_b), np.asarray(st_c))
    ha = flat.lookup(values, cnt, pos)
    hb = r1.lookup(values, cnt, pos)
    rec = lambda h: sorted(zip(h.cnt_id, h.pos, h.fi, h.otu,
                               h.avg_from_end, h.wt))
    assert rec(ha) == rec(hb) and ha.kmers_found == hb.kmers_found


def test_probe_rows1_fallback_gates():
    """rows1 falls back to rows when w1 > 64 or the overlap storage factor
    exceeds the byte budget."""
    rng = np.random.default_rng(94)
    sig = random_signatures(rng, 3000)
    table = build_table(**sig, load_factor=0.7)
    lk = XlaLookup(table, first_pass_window=128, probe_impl="rows1")
    assert lk.w1 >= 128 or lk.probe_impl == "rows1"
    if lk.w1 >= 128:
        assert lk.probe_impl in ("rows", "flat")
    import os

    os.environ["KMER_ROWS1_MAX_BYTES"] = "1024"
    try:
        lk2 = XlaLookup(table, probe_impl="rows1")
        assert lk2.probe_impl == "rows"
    finally:
        del os.environ["KMER_ROWS1_MAX_BYTES"]


def test_streaming_lookup_device_sort():
    """StreamingLookup(device_sort=True) produces the same hits."""
    from kmergutsjava_tpu.lookup.xla import StreamingLookup

    rng = np.random.default_rng(44)
    sig = random_signatures(rng, 2500)
    table = build_table(**sig, load_factor=0.8)
    values, cnt, pos = make_queries(rng, sig["kmers"], 8000)
    lk = XlaLookup(table, chunk=1024)
    s = StreamingLookup(lk, sort_chunks=True, device_sort=True,
                        compute_kmers_found=True)
    assert s.device_sort
    i = 0
    while i < len(values):
        j = min(len(values), i + int(rng.integers(1, 900)))
        s.add_batch(values[i:j], 0, pos[i:j])
        i = j
    hits = s.finish()
    ref = lookup_stream(table, values, np.zeros(len(values)), pos)
    assert sorted(zip(hits.pos.tolist(), hits.fi.tolist(),
                      hits.wt.tolist())) == \
        sorted(zip(ref.pos.tolist(), ref.fi.tolist(), ref.wt.tolist()))
    assert hits.kmers_found == ref.kmers_found


def test_probe_chunked_matches_rows1():
    """Chunked probe (host bin routing -> device scan of chunk-local
    gathers) == rows1 on identical queries when no bin overflows, and full
    lookups agree bit-for-bit including overflow/skew cases."""
    import os

    import jax.numpy as jnp

    from kmergutsjava_tpu.lookup.xla import (FP_MOD,
                                             probe_fingerprint_rows1)

    rng = np.random.default_rng(95)
    sig = random_signatures(rng, 50_000)
    table = build_table(**sig, load_factor=0.8)
    os.environ["KMER_CHUNK_ROWS"] = "64"
    try:
        ck = XlaLookup(table, probe_impl="chunked")
        r1 = XlaLookup(table, probe_impl="rows1")
    finally:
        del os.environ["KMER_CHUNK_ROWS"]
    assert ck.probe_impl == "chunked"
    assert ck.tbl_fp.ndim == 3 and ck.tbl_fp.shape[1] == 64
    assert ck.n_chunks == ck.tbl_fp.shape[0]

    values, cnt, pos = make_queries(rng, sig["kmers"], 4096)
    homes = (values % np.int64(table.num_sigs)).astype(np.int32)
    q_fp = (values % FP_MOD).astype(np.uint16)
    # uniform homes: expected max bin load ~ mean + a few sigma << cap
    off_a, st_a = probe_fingerprint_rows1(r1.tbl_fp, jnp.asarray(q_fp),
                                          jnp.asarray(homes), r1.w1,
                                          r1.stride)
    off_b, st_b = ck.resolve_probe(ck.dispatch_probe(q_fp, homes))
    # the (off, state) contract is layout-independent: chunked keeps 128
    # lanes (stride 128-w1) while rows1 defaults narrow (lanes-w1)
    assert ck.w1 == r1.w1 and ck.stride == 128 - ck.w1
    assert np.array_equal(np.asarray(off_a), off_b)
    assert np.array_equal(np.asarray(st_a), st_b)

    # full lookups agree (random + non-power-of-two length)
    ha = r1.lookup(values[:3000], cnt[:3000], pos[:3000])
    hb = ck.lookup(values[:3000], cnt[:3000], pos[:3000])
    assert canon(ha) == canon(hb) and ha.kmers_found == hb.kmers_found

    # adversarial skew: all homes in chunk 0 -> guaranteed bin overflow ->
    # unresolved -> exact host full-window pass; hits still bit-identical
    skew_homes = rng.integers(0, ck.chunk_rows * ck.stride // 2,
                              len(values)).astype(np.int64)
    skew_values = skew_homes.copy()
    # embed some REAL table kmers whose homes land in chunk 0
    in0 = sig["kmers"][(sig["kmers"] % table.num_sigs)
                       < ck.chunk_rows * ck.stride // 2]
    if len(in0):
        skew_values[: len(in0[:500])] = in0[:500]
    # the skewed bins must actually overflow for this to exercise the
    # fallback: dispatch once and check
    skew_fp = (skew_values % FP_MOD).astype(np.uint16)
    skew_h = (skew_values % np.int64(table.num_sigs)).astype(np.int32)
    pend = ck.dispatch_probe(skew_fp, skew_h)
    assert pend[0] == "bins" and (pend[3] >= pend[4]).any(), \
        "skew case no longer overflows; strengthen it"
    hs_a = r1.lookup(skew_values, cnt, pos)
    hs_b = ck.lookup(skew_values, cnt, pos)
    assert canon(hs_a) == canon(hs_b)
    assert hs_a.kmers_found == hs_b.kmers_found
    if len(in0):
        assert len(hs_b) >= min(500, len(in0))


def test_probe_chunked_auto_gate():
    """auto selects chunked only for HBM-large planes; tiny planes stay
    rows1 even when chunked is forced but the plane fits in one chunk."""
    import os

    rng = np.random.default_rng(96)
    sig = random_signatures(rng, 3000)
    table = build_table(**sig, load_factor=0.7)
    lk = XlaLookup(table)  # auto: small plane -> rows1
    assert lk.probe_impl == "rows1"
    lk2 = XlaLookup(table, probe_impl="chunked")  # plane < one chunk
    assert lk2.probe_impl == "rows1"
    # narrow-lane rows1 is the auto default at EVERY plane size now; the
    # HBM-threshold upgrade only applies to forced-128-lane planes
    os.environ["KMER_CHUNKED_MIN_BYTES"] = "1024"
    os.environ["KMER_PROBE_LANES"] = "128"
    os.environ["KMER_CHUNK_ROWS"] = "8"
    try:
        lk3 = XlaLookup(table)  # auto, wide lanes, tiny threshold -> chunked
        lkn = XlaLookup(table, probe_impl="rows1")
    finally:
        del os.environ["KMER_CHUNKED_MIN_BYTES"]
        del os.environ["KMER_PROBE_LANES"]
        del os.environ["KMER_CHUNK_ROWS"]
    assert lk3.probe_impl == "chunked"
    assert lkn.lanes == 128  # env override wins over the narrow default
    rngq = np.random.default_rng(97)
    values, cnt, pos = make_queries(rngq, sig["kmers"], 2048)
    assert canon(lk3.lookup(values, cnt, pos)) == canon(
        lk.lookup(values, cnt, pos))


def test_streaming_lookup_chunked_impl():
    """StreamingLookup over the chunked probe: same hits as rows1,
    including the padded tail dispatch (pad spreading)."""
    import os

    rng = np.random.default_rng(98)
    sig = random_signatures(rng, 40_000)
    table = build_table(**sig, load_factor=0.75)
    os.environ["KMER_CHUNK_ROWS"] = "32"
    try:
        ck = XlaLookup(table, probe_impl="chunked", chunk=1 << 12)
    finally:
        del os.environ["KMER_CHUNK_ROWS"]
    assert ck.probe_impl == "chunked"
    r1 = XlaLookup(table, probe_impl="rows1", chunk=1 << 12)
    values, cnt, pos = make_queries(rng, sig["kmers"], 10_000)
    from kmergutsjava_tpu.lookup.xla import StreamingLookup

    sa = StreamingLookup(r1, compute_kmers_found=True)
    sa.add_batch(values, 3, pos)
    sb = StreamingLookup(ck, compute_kmers_found=True)
    sb.add_batch(values, 3, pos)
    ha, hb = sa.finish(), sb.finish()
    assert canon(ha) == canon(hb) and ha.kmers_found == hb.kmers_found


def test_chunk_defaults_and_explicit_values_honored():
    """Advisor r4: an explicit chunk equal to a default must be honored;
    chunk=None resolves the per-impl default (tilejoin raises to
    KMER_TILEJOIN_CHUNK)."""
    rng = np.random.default_rng(99)
    sig = random_signatures(rng, 30_000)
    table = build_table(**sig, load_factor=0.6)
    lk = XlaLookup(table, probe_impl="rows1")
    assert lk.chunk == XlaLookup.DEFAULT_CHUNK
    lk = XlaLookup(table, probe_impl="rows1", chunk=1 << 19)
    assert lk.chunk == 1 << 19
    tj = XlaLookup(table, probe_impl="tilejoin")
    if tj.probe_impl == "tilejoin":
        # density-aware default: 500 queries/tile, floored at
        # min(4M, 1000/tile) and capped at 16M
        floor = min(4 << 20, 1000 * tj.n_tiles)
        assert tj.chunk == min(max(500 * tj.n_tiles, floor), 16 << 20)
        # the documented non-tilejoin default value, passed explicitly,
        # must NOT be overridden to the tilejoin default
        tj2 = XlaLookup(table, probe_impl="tilejoin", chunk=1 << 19)
        assert tj2.chunk == 1 << 19


def test_huge_table_int32_guard():
    """Advisor r4: >= 2^31 slots must be rejected up front (int32 homes
    would wrap silently in the device impls and native binner ABI)."""
    from types import SimpleNamespace

    fake = SimpleNamespace(max_probe=8, num_sigs=1 << 31,
                           occupied=np.ones(1024, bool), slots=None)
    with pytest.raises(ValueError, match="2\\^31"):
        XlaLookup(fake)
    # host_only stays usable (int64 host arrays)... but don't actually
    # allocate the 16GB host plane here; just assert the guard is scoped
    # to device impls by checking the raise happens before any allocation.


def test_verify_emit_native_matches_numpy():
    """Round-5: the native gather_resolve_slots + emit_hits pair must be
    bit-identical to the numpy verify/compact twin across candidate /
    empty / unresolved / collision mixes."""
    import os

    from kmergutsjava_tpu.utils.native import load_scatter

    if load_scatter() is None:
        pytest.skip("native scatter toolchain unavailable")
    rng = np.random.default_rng(101)
    sig = random_signatures(rng, 50_000)
    table = build_table(**sig, load_factor=0.75)
    lk = XlaLookup(table, probe_impl="rows1")
    n = 30_000
    values, cnt, pos = make_queries(rng, sig["kmers"], n)
    homes = (values % np.int64(table.num_sigs)).astype(np.int32)
    # adversarial (off, state) mix, not the real probe's answer: wrong
    # offsets force collision fallbacks; state 0 forces the exact pass
    state = rng.choice(np.array([0, 1, 2], np.uint8), n,
                       p=[0.1, 0.5, 0.4])
    off = rng.integers(0, lk.w1, n).astype(np.uint8)
    native = lk._verify_emit(values, homes, off, state, cnt, pos, True)
    from kmergutsjava_tpu.utils import native as nat

    os.environ["KMER_NO_NATIVE_SCATTER"] = "1"
    saved = nat._libs.pop("scatter", None)
    try:
        assert load_scatter() is None  # the toggle really disables it
        numpy_res = lk._verify_emit(values, homes, off, state, cnt, pos,
                                    True)
    finally:
        del os.environ["KMER_NO_NATIVE_SCATTER"]
        nat._libs["scatter"] = saved
    for a, b in zip(native[0], numpy_res[0]):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(native[1], numpy_res[1])
