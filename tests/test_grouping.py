"""Hand-traced scenarios for the call-emission state machine."""
import io

import numpy as np

from kmergutsjava_tpu.calls.grouping import (GroupingParams, Report,
                                             gather_hits, process_set_of_hits,
                                             tabulate_otu_data)

FUNCS = ["funcA", "funcB", "func2", "func3", "func4"]


def run_gather(hits, **kw):
    out = io.StringIO()
    oi = []
    gather_hits(hits, FUNCS, oi, Report(out), GroupingParams(**kw))
    return out.getvalue(), oi


def H(pos, fi, oi=7, avg=100, wt=1.0):
    return (pos, oi, avg, fi, np.float32(wt))


def test_simple_run_call():
    text, oi = run_gather([H(p, 2) for p in range(0, 60, 10)], min_hits=5)
    assert text == "CALL\t0\t57\t6\t2\tfunc2\t6.000000\n"
    assert oi == [[7, 6]]


def test_below_min_hits_no_call():
    text, oi = run_gather([H(p, 2) for p in range(0, 40, 10)], min_hits=5)
    assert text == ""
    assert oi == []


def test_gap_splits_runs():
    hits = [H(p, 2) for p in range(0, 50, 10)] + [H(p, 3) for p in range(300, 350, 10)]
    text, _ = run_gather(hits, min_hits=5, max_gap=200)
    assert text == ("CALL\t0\t47\t5\t2\tfunc2\t5.000000\n"
                    "CALL\t300\t347\t5\t3\tfunc3\t5.000000\n")


def test_mid_run_function_switch_pair_trigger():
    hits = [H(p, 2) for p in range(0, 50, 10)] + [H(50, 3), H(60, 3), H(70, 3),
                                                  H(80, 3), H(90, 3)]
    text, _ = run_gather(hits, min_hits=5)
    # pair trigger at the second fI=3 hit: CALL for the five fI=2 hits with
    # end anchored at the last fI=2 position (40) + 7
    assert text == ("CALL\t0\t47\t5\t2\tfunc2\t5.000000\n"
                    "CALL\t50\t97\t5\t3\tfunc3\t5.000000\n")


def test_seed_pair_carryover():
    # min_hits=2: [2@0, 2@10, 3@20, 3@30] triggers at 3@30; the call for fI=2
    # spans only the fI=2 hits; the (3,3) pair seeds the next run which then
    # closes across a gap
    hits = [H(0, 2), H(10, 2), H(20, 3), H(30, 3), H(500, 3), H(510, 3),
            H(520, 3)]
    text, _ = run_gather(hits, min_hits=2, max_gap=200)
    assert text == ("CALL\t0\t17\t2\t2\tfunc2\t2.000000\n"
                    "CALL\t20\t37\t2\t3\tfunc3\t2.000000\n"
                    "CALL\t500\t527\t3\t3\tfunc3\t3.000000\n")


def test_interloper_hit_not_counted_but_kept():
    # single different-function hit inside a run: no pair -> no trigger; it
    # stays in the list but is not counted; CALL start is still hits[0]
    hits = [H(0, 2), H(10, 2), H(20, 3), H(30, 2), H(40, 2), H(50, 2)]
    text, _ = run_gather(hits, min_hits=5)
    assert text == "CALL\t0\t57\t5\t2\tfunc2\t5.000000\n"


def test_unsorted_input_sorted_by_position():
    hits = [H(p, 2) for p in (50, 10, 40, 0, 30, 20)]
    text, _ = run_gather(hits, min_hits=5)
    assert text == "CALL\t0\t57\t6\t2\tfunc2\t6.000000\n"


def test_order_constraint_filters_inconsistent_offsets():
    # consecutive hits must have matching fI and collinear avg-offsets
    # (|delta_pos - delta_avgOffEnd| <= 20, ref :490-494)
    good = [H(p, 2, avg=200 - p) for p in range(0, 50, 10)]
    bad = H(50, 2, avg=500)  # wildly off the collinear line -> rejected
    text, _ = run_gather(good + [bad], min_hits=5, order_constraint=True)
    assert text == "CALL\t0\t47\t5\t2\tfunc2\t5.000000\n"


def test_otu_move_to_front_counter():
    out = io.StringIO()
    oi = []
    hits = [H(p, 1, oi=o) for p, o in zip(range(0, 70, 10),
                                          [5, 6, 6, 5, 5, 6, 6])]
    process_set_of_hits(hits, FUNCS, 1, oi, Report(out), GroupingParams(min_hits=2))
    assert oi == [[6, 4], [5, 3]]
    out2 = io.StringIO()
    tabulate_otu_data("SEQ", 99, oi, Report(out2))
    assert out2.getvalue() == "OTU-COUNTS\tSEQ[99]\t4-6\t3-5\n"
    assert oi == []


def test_otu_counter_cap_overwrites_last():
    out = io.StringIO()
    oi = []
    # 7 distinct OTUs, capped at 5: each new one overwrites the last entry
    hits = [H(p, 1, oi=o) for p, o in zip(range(0, 70, 10), range(7))]
    process_set_of_hits(hits, FUNCS, 1, oi, Report(out), GroupingParams(min_hits=2))
    assert len(oi) == 5
    assert all(c[1] >= 1 for c in oi)


def test_weight_accumulation_float32_and_format():
    # 3 * float32(0.1) accumulated in float32 = 0.30000001192..
    hits = [H(p, 2, wt=0.1) for p in range(0, 50, 10)]
    text, _ = run_gather(hits, min_hits=5)
    w = np.float32(0)
    for _ in range(5):
        w = np.float32(w + np.float32(0.1))
    assert text == "CALL\t0\t47\t5\t2\tfunc2\t0.500000\n"


def test_min_weighted_hits_threshold():
    hits = [H(p, 2, wt=0.1) for p in range(0, 50, 10)]
    text, _ = run_gather(hits, min_hits=5, min_weighted_hits=1)
    assert text == ""  # 0.5 < 1


def test_debug_hit_lines():
    text, _ = run_gather([H(0, 2, oi=3, avg=55, wt=0.25), H(10, 2)], min_hits=5,
                         debug=True)
    lines = text.splitlines()
    assert lines[0] == "HIT\t0\t0\t55\t2\t0.250\t3"
    assert lines[1].startswith("after-hit: hits: 0/0.250000/2 ")
