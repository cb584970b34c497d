"""Batch grouping through the native core (native/grouping.cpp).

One ctypes call runs the exact CALL/OTU state machine over every container
in the batch; Python only formats the CALL text (Java HALF_UP "%f" via
utils/javafmt) and later folds the returned RLE OTU increments into the
per-sequence top-5 move-to-front counter. Same ("pre", lines, updates)
result shape as calls/batch_host.batch_single_fi_calls, pinned to the
Python machine by the differential tests in tests/test_batch_native.py.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from ..utils.javafmt import jformat
from ..utils.native import load_grouping
from .grouping import GroupingParams


def native_available() -> bool:
    return load_grouping() is not None


def batch_group_calls(cnt_s: np.ndarray, pos_s: np.ndarray, otu_s: np.ndarray,
                      avg_s: np.ndarray, fi_s: np.ndarray, wt_s: np.ndarray,
                      todo: np.ndarray, bounds: Sequence[int],
                      functions: Sequence[str],
                      p: GroupingParams) -> Dict[int, tuple]:
    """Run the native machine over the selected containers.

    ``cnt_s``..``wt_s`` are the (cnt_id, pos)-sorted global hit columns;
    ``bounds[k]..bounds[k+1]`` delimits the k-th distinct container and
    ``todo`` lists the k indices to process. Returns
    {cnt_id: ("pre", call_lines, otu_updates)} for every selected container.
    """
    lib = load_grouping()
    if lib is None:
        raise RuntimeError("native grouping library unavailable")
    if not len(todo):
        return {}
    # gather the selected containers into one contiguous batch
    todo = np.asarray(todo, dtype=np.int64)
    bounds = np.asarray(bounds, dtype=np.int64)
    starts = bounds[todo]
    ends = bounds[todo + 1]
    lens = ends - starts
    if (lens == 0).any():  # the jump-correction trick needs lens >= 1
        keep = lens > 0
        todo, starts, ends, lens = todo[keep], starts[keep], ends[keep], \
            lens[keep]
    b_bounds = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    n_containers = len(todo)
    total = int(b_bounds[-1])
    if np.array_equal(starts[1:], ends[:-1]):
        # contiguous selection (the common every-container case): slice
        sl = slice(int(starts[0]) if n_containers else 0,
                   int(ends[-1]) if n_containers else 0)
        idx = None
    else:
        # vectorized multi-range arange: unit steps with jump corrections
        idx = np.ones(total, dtype=np.int64)
        if total:
            off = b_bounds[:-1]
            idx[0] = starts[0]
            nz = off[1:]
            idx[nz] = starts[1:] - (ends[:-1] - 1)
        idx = np.cumsum(idx)
        sl = idx
    pos_b = np.ascontiguousarray(pos_s[sl], dtype=np.int64)
    otu_b = np.ascontiguousarray(otu_s[sl], dtype=np.int32)
    avg_b = np.ascontiguousarray(avg_s[sl], dtype=np.int32)
    fi_b = np.ascontiguousarray(fi_s[sl], dtype=np.int32)
    wt_b = np.ascontiguousarray(wt_s[sl], dtype=np.float32)

    max_calls = total + n_containers + 1
    max_upds = 2 * total + 2
    call_container = np.empty(max_calls, np.int64)
    call_start = np.empty(max_calls, np.int64)
    call_end = np.empty(max_calls, np.int64)
    call_count = np.empty(max_calls, np.int32)
    call_fi = np.empty(max_calls, np.int32)
    call_weight = np.empty(max_calls, np.float32)
    call_nupd = np.empty(max_calls, np.int32)
    upd_oi = np.empty(max_upds, np.int32)
    upd_inc = np.empty(max_upds, np.int32)

    n_calls = lib.group_batch(
        pos_b, otu_b, avg_b, fi_b, wt_b, b_bounds, n_containers,
        p.min_hits, p.min_weighted_hits, p.max_gap,
        1 if p.order_constraint else 0,
        call_container, call_start, call_end, call_count, call_fi,
        call_weight, call_nupd, upd_oi, upd_inc, max_calls, max_upds)
    if n_calls == -2:
        raise IndexError(
            "processSetOfHits with <2 hits (the reference throws here too; "
            "use minHits >= 2)")
    if n_calls < 0:
        raise RuntimeError("native grouping output overflow")

    out: Dict[int, tuple] = {}
    cnt_of_batch = cnt_s[starts].astype(np.int64).tolist()
    for k in range(n_containers):
        out[cnt_of_batch[k]] = ("pre", [], [])
    u = 0
    for i in range(int(n_calls)):
        cid = cnt_of_batch[int(call_container[i])]
        f = int(call_fi[i])
        out[cid][1].append("CALL\t%d\t%d\t%d\t%d\t%s\t%s" % (
            int(call_start[i]), int(call_end[i]), int(call_count[i]), f,
            functions[f], jformat(call_weight[i])))
        nu = int(call_nupd[i])
        out[cid][2].extend(
            (int(upd_oi[u + j]), int(upd_inc[u + j])) for j in range(nu))
        u += nu
    return out
