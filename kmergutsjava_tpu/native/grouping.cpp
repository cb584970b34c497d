// Native core of the hit-grouping state machine (CALL/OTU), batch form.
//
// Exact transcription of the reference's gatherHits/processSetOfHits
// (/root/reference/lib/src/kmergutsjava/KmerGutsJava.java:457-514 and
// :385-455), matching kmergutsjava_tpu/calls/grouping.py line for line:
// gap segmentation with seed-pair carryover, mid-run new-function-pair
// triggers, the MAX_HITS_PER_SEQ-2 append cap, the optional order
// constraint, float32 weight accumulation in hit order, and the weight
// threshold compared in double (numpy float64 promotion semantics, which
// match Java's float-vs-int promotion for all realistic values).
//
// The batch runs many containers in one call; per emitted CALL it also
// emits the OTU increments (run-length encoded over consecutive equal
// oIs) so the Python side only formats text and maintains the top-5
// move-to-front counter. Text formatting (Java HALF_UP "%f") stays in
// Python (utils/javafmt).
//
// Build: g++ -O3 -shared -fPIC -o grouping.so grouping.cpp

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {
constexpr int K = 8;
constexpr long CAP = 40000 - 2;  // MAX_HITS_PER_SEQ - 2 (ref :496-502)
}  // namespace

extern "C" int64_t group_batch(
    const int64_t* pos, const int32_t* otu, const int32_t* avg,
    const int32_t* fi, const float* wt,
    const int64_t* bounds, int64_t n_containers,
    int64_t min_hits, int64_t min_weighted_hits, int64_t max_gap,
    int32_t order_constraint,
    // outputs: one record per emitted CALL (+ its RLE OTU updates)
    int64_t* call_container, int64_t* call_start, int64_t* call_end,
    int32_t* call_count, int32_t* call_fi, float* call_weight,
    int32_t* call_nupd, int32_t* upd_oi, int32_t* upd_inc,
    int64_t max_calls, int64_t max_upds) {
  int64_t n_calls = 0, n_upds = 0;
  std::vector<int64_t> hits;
  for (int64_t c = 0; c < n_containers; ++c) {
    const int64_t a = bounds[c], b = bounds[c + 1];
    hits.clear();
    int32_t current_fi = 0;
    bool overflow = false, too_few = false;

    // processSetOfHits (ref :385-455); returns the next currentFI
    auto process = [&]() -> int32_t {
      int64_t cnt = 0;
      float weighted = 0.0f;  // float accumulation in hit order (ref :393)
      int64_t end_hit = hits[0];
      for (int64_t idx : hits)
        if (fi[idx] == current_fi) {
          ++cnt;
          weighted += wt[idx];
          end_hit = idx;
        }
      if (cnt >= min_hits && (double)weighted >= (double)min_weighted_hits) {
        if (n_calls >= max_calls) { overflow = true; return current_fi; }
        call_container[n_calls] = c;
        call_start[n_calls] = pos[hits[0]];
        call_end[n_calls] = pos[end_hit] + (K - 1);
        call_count[n_calls] = (int32_t)cnt;
        call_fi[n_calls] = current_fi;
        call_weight[n_calls] = weighted;
        // OTU increments: called hits in order, RLE over equal oIs
        int32_t nupd = 0;
        int32_t run_oi = 0, run_len = 0;
        for (int64_t idx : hits) {
          if (fi[idx] != current_fi) continue;
          if (run_len && otu[idx] == run_oi) {
            ++run_len;
          } else {
            if (run_len) {
              if (n_upds >= max_upds) { overflow = true; return current_fi; }
              upd_oi[n_upds] = run_oi;
              upd_inc[n_upds] = run_len;
              ++n_upds;
              ++nupd;
            }
            run_oi = otu[idx];
            run_len = 1;
          }
        }
        if (run_len) {
          if (n_upds >= max_upds) { overflow = true; return current_fi; }
          upd_oi[n_upds] = run_oi;
          upd_inc[n_upds] = run_len;
          ++n_upds;
          ++nupd;
        }
        call_nupd[n_calls] = nupd;
        ++n_calls;
      }
      const size_t num = hits.size();
      if (num < 2) { too_few = true; return current_fi; }  // ref throws (:442)
      // trailing pair with a new shared fI seeds the next run (ref :441-450)
      if (fi[hits[num - 2]] != current_fi
          && fi[hits[num - 2]] == fi[hits[num - 1]]) {
        int32_t next_fi = fi[hits[num - 1]];
        int64_t s1 = hits[num - 2], s2 = hits[num - 1];
        hits.clear();
        hits.push_back(s1);
        hits.push_back(s2);
        return next_fi;
      }
      hits.clear();
      return current_fi;
    };

    // gatherHits main loop (ref :457-514); input is position-sorted
    for (int64_t i = a; i < b && !overflow && !too_few; ++i) {
      if (!hits.empty() && pos[hits.back()] + max_gap < pos[i]) {
        if ((int64_t)hits.size() >= min_hits)
          current_fi = process();
        else
          hits.clear();
        if (overflow || too_few) break;
      }
      if (hits.empty()) current_fi = fi[i];
      bool accept = true;
      if (order_constraint && !hits.empty()) {
        const int64_t last = hits.back();
        const int64_t d = (pos[i] - pos[last])
                          - (int64_t)(avg[last] - avg[i]);
        accept = (fi[i] == fi[last]) && (d <= 20 && d >= -20);
      }
      if (accept) {
        if ((int64_t)hits.size() < CAP) hits.push_back(i);
        if (current_fi != fi[i] && hits.size() > 1
            && fi[hits[hits.size() - 2]] == fi[hits[hits.size() - 1]])
          current_fi = process();
      }
    }
    if (too_few) return -2;
    if (overflow) return -1;
    if ((int64_t)hits.size() >= min_hits) {
      current_fi = process();
      if (too_few) return -2;
      if (overflow) return -1;
    }
  }
  return n_calls;
}
