// Native stream-plan builder for tilespmv-tpu.
//
// C++ core for ops/pallas/stream_plan.py::build_stream_chunks — the
// compile step of the entry-level stream engine (the CSR5-analog residual
// engine; see that module's docstring for the slab/round design). The
// NumPy builder is the reference implementation; this core performs the
// same construction with one sort + linear passes:
//
//   1. sort entries by (row-window, superspan, sublane, row)
//   2. per (window, 8192-value superspan) group: sublane = (col>>10)&7,
//      entries split at 127 per sublane (lane 0 reserved); group slab
//      count = max over sublanes
//   3. window slab counts padded to a multiple of s_batch
//   4. runs = maximal same-row spans per (slab, sublane); round =
//      compacted (src+tgt) mod 8 proper coloring; per-round
//      [rend | rstart | rsrc] int8 planes with zero-diff default
//      routing for inert targets (never spills under 8 rounds)
//
// C ABI (ctypes):
//   h = sp_build(...);  sp_scalars(h, out[6]);  sp_export(h, ...);
//   sp_release(h)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <numeric>

namespace {

constexpr int64_t RW_ROWS = 1024;
constexpr int64_t LANES = 128;
constexpr int64_t SUBS = 8;
constexpr int64_t CAP = LANES - 1;
constexpr int64_t MAXR = 8;
constexpr int64_t SPAN_ROWS = 64;

struct StreamPlan {
    int64_t nslabs = 0, nsteps = 0, nwin = 0;
    int32_t s_batch = 0, rounds = MAXR;

    std::vector<float> val;       // nslabs*8*128 (f32 / df64 HI plane)
    std::vector<float> val_lo;    // nslabs*8*128 df64 LO plane:
                                  // lo = f32(v - f64(f32(v)))
    std::vector<int16_t> vidx;    // nslabs*8*128
    std::vector<int8_t> planes;   // nslabs*rounds*24*128 (built at MAXR)
    std::vector<int32_t> sbase;   // nslabs
    std::vector<int32_t> sbase2;  // nslabs (dual-span builds only)
    std::vector<int32_t> cw;      // nsteps
    std::vector<int32_t> cfirst;  // nsteps
    std::vector<uint8_t> used;    // nslabs*128 color masks
    std::vector<uint8_t> routed;  // nslabs*MAXR*128 target masks
    std::vector<int8_t> segmask;  // nslabs*8*128 df64 segmented-scan
                                  // bit planes (want_lo builds only)
    int32_t seg_levels = 0;       // ceil(log2(max run length))
};

struct Run {
    int32_t slab;
    uint8_t sub, tgt, jj, lane_s, lane_e, color;
};

}  // namespace

extern "C" {

void* sp_build(int64_t nz, const int64_t* g_row, const int64_t* g_col,
               const double* vals, int64_t m, int32_t s_batch_req,
               int32_t span_rows, int32_t want_lo, int32_t dual) {
    auto* P = new StreamPlan();
    const int64_t nwin = std::max<int64_t>(1, (m + RW_ROWS - 1) / RW_ROWS);
    P->nwin = nwin;
    if (nz == 0) { delete P; return nullptr; }
    // superspan geometry (keep in sync with stream_plan.py): span =
    // col >> sh covers span_rows x2d128 rows; sublane = the 3 col bits
    // below the span; vidx = col within the 16*span_rows-col sub-window
    const int64_t R_ = span_rows > 0 ? span_rows : SPAN_ROWS;
    int64_t sh = 7;
    while ((int64_t(1) << (sh - 7)) < R_) ++sh;
    const int64_t vmask = 16 * R_ - 1;

    // --- 1. order by (window, superspan, sublane, row) ---
    std::vector<int64_t> ord(nz);
    std::iota(ord.begin(), ord.end(), 0);
    std::sort(ord.begin(), ord.end(), [&](int64_t a, int64_t b) {
        const int64_t wa = g_row[a] >> 10, wb = g_row[b] >> 10;
        if (wa != wb) return wa < wb;
        const int64_t pa = g_col[a] >> sh, pb = g_col[b] >> sh;
        if (pa != pb) return pa < pb;
        const int64_t sa = (g_col[a] >> (sh - 3)) & 7,
                      sb = (g_col[b] >> (sh - 3)) & 7;
        if (sa != sb) return sa < sb;
        if (g_row[a] != g_row[b]) return g_row[a] < g_row[b];
        return a < b;
    });

    // --- 2. count slabs per window: mono = max over sublanes per
    // group; dual = the sequential dual-span greedy (an open slab
    // carries the previous group's leftover as span A and takes
    // min(count, free) of the next group as span B — see
    // stream_plan._build_dual, kept in exact lockstep) ---
    std::vector<int64_t> slabs_per_win(nwin, 0);
    std::vector<int64_t> g_take, g_shared, g_base;  // dual: per group
    std::vector<int64_t> raw_win_v, raw_sA, raw_sB;  // dual: per raw slab
    if (dual) {
        int64_t i = 0;
        int64_t L[SUBS] = {0};
        int64_t open_id = -1, prev_w = -1;
        while (i < nz) {
            const int64_t w = g_row[ord[i]] >> 10;
            const int64_t p = g_col[ord[i]] >> sh;
            int64_t j = i;
            int64_t c[SUBS] = {0};
            while (j < nz && (g_row[ord[j]] >> 10) == w
                   && (g_col[ord[j]] >> sh) == p) {
                ++c[(g_col[ord[j]] >> (sh - 3)) & 7];
                ++j;
            }
            if (w != prev_w) {
                open_id = -1;
                std::fill(L, L + SUBS, (int64_t)0);
                prev_w = w;
            }
            int64_t take[SUBS] = {0};
            int64_t shared = -1;
            if (open_id >= 0) {
                shared = open_id;
                for (int s = 0; s < SUBS; ++s) {
                    take[s] = std::min(c[s], CAP - L[s]);
                    c[s] -= take[s];
                }
                raw_sB[open_id] = p * R_;
                open_id = -1;
                std::fill(L, L + SUBS, (int64_t)0);
            }
            const int64_t mx = *std::max_element(c, c + SUBS);
            const int64_t kf =
                mx ? std::max<int64_t>(0, (mx + CAP - 1) / CAP - 1) : 0;
            bool any_left = false;
            for (int s = 0; s < SUBS; ++s) {
                L[s] = std::max<int64_t>(0, c[s] - kf * CAP);
                if (L[s]) any_left = true;
            }
            const int64_t nfresh = kf + (any_left ? 1 : 0);
            g_base.push_back((int64_t)raw_win_v.size());
            for (int64_t k = 0; k < nfresh; ++k) {
                raw_win_v.push_back(w);
                raw_sA.push_back(p * R_);
                raw_sB.push_back(p * R_);
            }
            open_id = any_left ? (int64_t)raw_win_v.size() - 1 : -1;
            for (int s = 0; s < SUBS; ++s) g_take.push_back(take[s]);
            g_shared.push_back(shared);
            i = j;
        }
        for (int64_t t : raw_win_v) ++slabs_per_win[t];
    } else {
        int64_t i = 0;
        while (i < nz) {
            const int64_t w = g_row[ord[i]] >> 10;
            const int64_t p = g_col[ord[i]] >> sh;
            int64_t maxk = 1, run = 0;
            int64_t cur_sub = -1;
            int64_t j = i;
            while (j < nz && (g_row[ord[j]] >> 10) == w
                   && (g_col[ord[j]] >> sh) == p) {
                const int64_t sb = (g_col[ord[j]] >> (sh - 3)) & 7;
                if (sb != cur_sub) { cur_sub = sb; run = 0; }
                maxk = std::max(maxk, run / CAP + 1);
                ++run;
                ++j;
            }
            slabs_per_win[w] += maxk;
            i = j;
        }
    }
    std::vector<int64_t> raw_cnt(slabs_per_win);  // pre-padding counts
    int32_t S = s_batch_req;
    std::vector<int64_t> slab_start(nwin + 1, 0);
    {
        if (S <= 0) {
            // cost-minimizing slabs-per-step (keep in sync with
            // stream_plan.pick_s_batch / slab_ns): every slab of an
            // active step costs ~slab_ns(s) (padding included; small
            // batches hide gather latency worse) — the measured
            // power-of-2 anchors log2-interpolated so any s in 1..16
            // can win (64 windows of ~11 slabs want s_batch 11, not 8
            // or 16); active steps pay a fixed cost, empty windows one
            // skippable step
            // refit on v5e rounds 3-4 (scripts/calibrate_slab_ns.py) —
            // keep in sync with stream_plan.SLAB_NS/STEP_NS/skip_ns:
            // skipped steps still DMA their dead slab slots, so their
            // cost scales with s (round-4 skipcal matrices)
            const double anchor_ns[5] = {146.6, 113.0, 90.6, 87.2,
                                         77.8};
            const double step_ns = 267.0;
            const double skip0_ns = 179.0, skip_slot_ns = 47.5;
            auto slab_ns = [&](int s) {
                const double l = std::log2((double)s);
                if (l <= 0.0) return anchor_ns[0];
                if (l >= 4.0) return anchor_ns[4];
                const int k = (int)l;
                const double f = l - k;
                return anchor_ns[k] * (1.0 - f) + anchor_ns[k + 1] * f;
            };
            int64_t skipped = 0;
            for (int64_t w = 0; w < nwin; ++w)
                if (slabs_per_win[w] == 0) ++skipped;
            double best_cost = -1.0;
            for (int s = 1; s <= 16; ++s) {
                double cost = (double)skipped
                              * (skip0_ns + skip_slot_ns * s);
                const double per_step = step_ns + s * slab_ns(s);
                for (int64_t w = 0; w < nwin; ++w) {
                    if (slabs_per_win[w] == 0) continue;
                    const int64_t active = (slabs_per_win[w] + s - 1) / s;
                    cost += (double)active * per_step;
                }
                if (best_cost < 0 || cost < best_cost * 0.98) {
                    best_cost = cost;
                    S = s;
                }
            }
        }
        for (int64_t w = 0; w < nwin; ++w) {
            slabs_per_win[w] = std::max<int64_t>(1, slabs_per_win[w]);
            slabs_per_win[w] = ((slabs_per_win[w] + S - 1) / S) * S;
            slab_start[w + 1] = slab_start[w] + slabs_per_win[w];
        }
    }
    const int64_t nslabs = slab_start[nwin];
    P->nslabs = nslabs;
    P->s_batch = S;
    P->nsteps = nslabs / S;

    P->val.assign(nslabs * SUBS * LANES, 0.0f);
    // the df64 LO plane is only materialized when the caller will
    // export it (round-3 advisor: pure-f32 builds paid the allocation
    // and per-entry subtraction for nothing on the hot planning path)
    if (want_lo) P->val_lo.assign(nslabs * SUBS * LANES, 0.0f);
    P->vidx.assign(nslabs * SUBS * LANES, 0);
    P->planes.assign(nslabs * MAXR * 3 * SUBS * LANES, 0);
    P->sbase.assign(nslabs, 0);
    P->used.assign(nslabs * LANES, 0);
    P->routed.assign(nslabs * MAXR * LANES, 0);
    std::vector<Run> all_runs;
    all_runs.reserve(nz / 2);
    P->cw.assign(P->nsteps, 0);
    P->cfirst.assign(P->nsteps, 0);
    {
        int64_t t = 0;
        for (int64_t w = 0; w < nwin; ++w)
            for (int64_t k = 0; k < slabs_per_win[w] / S; ++k, ++t) {
                P->cw[t] = (int32_t)w;
                P->cfirst[t] = (k == 0) ? 1 : 0;
            }
    }

    // --- 3. fill entries, runs, planes (two passes over runs: first
    // records color masks so compaction ranks are known, then fills) ---
    auto plane = [&](int64_t slab, int64_t row, int64_t j) -> int8_t& {
        return P->planes[(slab * MAXR * 3 * SUBS + row) * LANES + j];
    };
    int32_t max_used = 0;
    if (dual) {
        P->sbase2.assign(nslabs, 0);
        // raw (window-major sequential) -> padded slab id
        std::vector<int64_t> raw_start(nwin + 1, 0);
        for (int64_t w = 0; w < nwin; ++w)
            raw_start[w + 1] = raw_start[w] + raw_cnt[w];
        auto raw2pad = [&](int64_t rid) {
            const int64_t w = raw_win_v[rid];
            return slab_start[w] + (rid - raw_start[w]);
        };
        const int64_t nraw = (int64_t)raw_win_v.size();
        for (int64_t rid = 0; rid < nraw; ++rid) {
            const int64_t pid = raw2pad(rid);
            P->sbase[pid] = (int32_t)raw_sA[rid];
            P->sbase2[pid] = (int32_t)raw_sB[rid];
        }
        // per-entry slab + span-B bit via a second group walk (ranks
        // within (group, sublane) are implicit in the sort order)
        std::vector<int32_t> eslab(nz);
        std::vector<uint8_t> eb(nz);
        {
            int64_t i = 0, g = 0;
            while (i < nz) {
                const int64_t w = g_row[ord[i]] >> 10;
                const int64_t p = g_col[ord[i]] >> sh;
                int64_t j = i;
                while (j < nz && (g_row[ord[j]] >> 10) == w
                       && (g_col[ord[j]] >> sh) == p) ++j;
                int64_t a = i;
                while (a < j) {
                    const int64_t sub = (g_col[ord[a]] >> (sh - 3)) & 7;
                    int64_t b = a;
                    while (b < j
                           && ((g_col[ord[b]] >> (sh - 3)) & 7) == sub)
                        ++b;
                    const int64_t tk = g_take[g * SUBS + sub];
                    for (int64_t e = a; e < b; ++e) {
                        const int64_t rank = e - a;
                        if (rank < tk) {
                            eslab[e] = (int32_t)raw2pad(g_shared[g]);
                            eb[e] = 1;
                        } else {
                            const int64_t rr = rank - tk;
                            eslab[e] = (int32_t)raw2pad(
                                g_base[g] + rr / CAP);
                            eb[e] = 0;
                        }
                    }
                    a = b;
                }
                ++g;
                i = j;
            }
        }
        // order entries by (slab, sublane, row); stable tie-break on
        // the primary sort position so shared-slab merges match the
        // NumPy builder exactly
        std::vector<int64_t> ord2(nz);
        std::iota(ord2.begin(), ord2.end(), 0);
        std::sort(ord2.begin(), ord2.end(), [&](int64_t x, int64_t y) {
            if (eslab[x] != eslab[y]) return eslab[x] < eslab[y];
            const int64_t sx = (g_col[ord[x]] >> (sh - 3)) & 7,
                          sy = (g_col[ord[y]] >> (sh - 3)) & 7;
            if (sx != sy) return sx < sy;
            if (g_row[ord[x]] != g_row[ord[y]])
                return g_row[ord[x]] < g_row[ord[y]];
            return x < y;
        });
        // fill values + runs per (slab, sublane) segment
        int64_t a = 0;
        while (a < nz) {
            const int64_t slab = eslab[ord2[a]];
            const int64_t sub = (g_col[ord[ord2[a]]] >> (sh - 3)) & 7;
            int64_t b = a;
            while (b < nz && eslab[ord2[b]] == slab
                   && ((g_col[ord[ord2[b]]] >> (sh - 3)) & 7) == sub)
                ++b;
            const int64_t w = g_row[ord[ord2[a]]] >> 10;
            int64_t k = a;
            while (k < b) {
                const int64_t row = g_row[ord[ord2[k]]];
                int64_t kk = k;
                while (kk < b && g_row[ord[ord2[kk]]] == row) ++kk;
                const int64_t lane_s = (k - a) + 1;
                const int64_t lane_e = (kk - a);
                for (int64_t e = k; e < kk; ++e) {
                    const int64_t ee = ord[ord2[e]];
                    const int64_t lane = (e - a) + 1;
                    const int64_t idx = (slab * SUBS + sub) * LANES
                                        + lane;
                    const double vv = vals[ee];
                    const float hi = (float)vv;
                    P->val[idx] = hi;
                    if (want_lo)
                        P->val_lo[idx] = (float)(vv - (double)hi);
                    P->vidx[idx] = (int16_t)((g_col[ee] & vmask)
                                             | ((int16_t)eb[ord2[e]]
                                                << 13));
                }
                const int64_t rloc = row - w * RW_ROWS;
                const int64_t tgt = rloc >> 7;
                const int64_t jj = rloc & (LANES - 1);
                const uint8_t color = (uint8_t)((sub + tgt) % SUBS);
                P->used[slab * LANES + jj] |= (uint8_t)(1u << color);
                all_runs.push_back(Run{(int32_t)slab, (uint8_t)sub,
                                       (uint8_t)tgt, (uint8_t)jj,
                                       (uint8_t)lane_s,
                                       (uint8_t)lane_e, color});
                k = kk;
            }
            a = b;
        }
        goto rounds_pass;
    }
    {
    std::vector<int64_t> next_slab(nwin, 0);
    int64_t i = 0;
    while (i < nz) {
        const int64_t w = g_row[ord[i]] >> 10;
        const int64_t p = g_col[ord[i]] >> sh;
        int64_t j = i;
        while (j < nz && (g_row[ord[j]] >> 10) == w
               && (g_col[ord[j]] >> sh) == p) ++j;
        const int64_t gslab0 = slab_start[w] + next_slab[w];
        int64_t maxk = 1;
        // per sublane: split at CAP, fill values + runs
        int64_t a = i;
        while (a < j) {
            const int64_t sub = (g_col[ord[a]] >> (sh - 3)) & 7;
            int64_t b = a;
            while (b < j && ((g_col[ord[b]] >> (sh - 3)) & 7) == sub) ++b;
            for (int64_t s0 = a; s0 < b; s0 += CAP) {
                const int64_t e0 = std::min(b, s0 + CAP);
                const int64_t slab = gslab0 + (s0 - a) / CAP;
                maxk = std::max(maxk, (s0 - a) / CAP + 1);
                P->sbase[slab] = (int32_t)(p * R_);
                int64_t k = s0;
                while (k < e0) {
                    const int64_t row = g_row[ord[k]];
                    int64_t kk = k;
                    while (kk < e0 && g_row[ord[kk]] == row) ++kk;
                    const int64_t lane_s = (k - s0) + 1;
                    const int64_t lane_e = (kk - s0);
                    for (int64_t e = k; e < kk; ++e) {
                        const int64_t lane = (e - s0) + 1;
                        const int64_t idx = (slab * SUBS + sub) * LANES
                                            + lane;
                        const double vv = vals[ord[e]];
                        const float hi = (float)vv;
                        P->val[idx] = hi;
                        if (want_lo)
                            P->val_lo[idx] = (float)(vv - (double)hi);
                        P->vidx[idx] = (int16_t)(g_col[ord[e]]
                                                 & vmask);
                    }
                    const int64_t rloc = row - w * RW_ROWS;
                    const int64_t tgt = rloc >> 7;
                    const int64_t jj = rloc & (LANES - 1);
                    const uint8_t color = (uint8_t)((sub + tgt) % SUBS);
                    P->used[slab * LANES + jj] |= (uint8_t)(1u << color);
                    all_runs.push_back(Run{(int32_t)slab, (uint8_t)sub,
                                           (uint8_t)tgt, (uint8_t)jj,
                                           (uint8_t)lane_s,
                                           (uint8_t)lane_e, color});
                    k = kk;
                }
            }
            a = b;
        }
        // fill sbase for slabs of this group with no entries in some
        // sublane but existing via other sublanes (already set above for
        // written slabs; remaining covered since maxk tracks the max)
        for (int64_t kk2 = 0; kk2 < maxk; ++kk2)
            P->sbase[gslab0 + kk2] = (int32_t)(p * R_);
        next_slab[w] += maxk;
        i = j;
    }
    }

    // --- 4. rounds: rank each run's color within its cell's FINAL
    // color mask (a compacted proper edge coloring), fill the
    // [rend | rstart | rsrc] planes, then default-route inert targets
    // at a source sublane with zero boundary difference ---
rounds_pass:
    std::vector<uint8_t> busy(nslabs * MAXR * LANES, 0);
    int32_t max_off = 0;
    if (want_lo) P->segmask.assign(nslabs * SUBS * LANES, 0);
    for (const Run& rn : all_runs) {
        if (want_lo) {
            // segmented-scan bit planes (stream_plan._seg_masks
            // parity): bit k set at lane L iff element L-2^k is in
            // the same run, i.e. offset o = L - first_lane >= 2^k
            for (int32_t L = rn.lane_s; L <= rn.lane_e; ++L) {
                const int32_t o = L - rn.lane_s;
                int8_t bits = 0;
                for (int k = 0; k < 7; ++k)
                    if (o >> k) bits |= (int8_t)(1 << k);
                P->segmask[((int64_t)rn.slab * SUBS + rn.sub) * LANES
                           + L] = bits;
                if (o > max_off) max_off = o;
            }
        }
        const uint8_t um = P->used[(int64_t)rn.slab * LANES + rn.jj];
        const int64_t t = __builtin_popcount(
            um & (uint8_t)((1u << rn.color) - 1));
        if ((int32_t)(t + 1) > max_used) max_used = (int32_t)(t + 1);
        plane(rn.slab, t * 3 * SUBS + rn.sub, rn.jj) = (int8_t)rn.lane_e;
        plane(rn.slab, t * 3 * SUBS + SUBS + rn.sub, rn.jj)
            = (int8_t)(rn.lane_s - 1);
        plane(rn.slab, t * 3 * SUBS + 2 * SUBS + rn.tgt, rn.jj)
            = (int8_t)rn.sub;
        busy[((int64_t)rn.slab * MAXR + t) * LANES + rn.jj]
            |= (uint8_t)(1u << rn.sub);
        P->routed[((int64_t)rn.slab * MAXR + t) * LANES + rn.jj]
            |= (uint8_t)(1u << rn.tgt);
    }
    P->rounds = std::max(4, ((max_used + 3) / 4) * 4);
    P->seg_levels = 0;
    while ((1 << P->seg_levels) <= max_off) ++P->seg_levels;
    for (int64_t sl = 0; sl < nslabs; ++sl)
        for (int64_t t = 0; t < P->rounds; ++t)
            for (int64_t jj = 0; jj < LANES; ++jj) {
                const uint8_t b = busy[(sl * MAXR + t) * LANES + jj];
                if (b == 0) continue;
                int free_s = 0;
                while (free_s < SUBS && ((b >> free_s) & 1)) ++free_s;
                const uint8_t rq
                    = P->routed[(sl * MAXR + t) * LANES + jj];
                for (int q = 0; q < SUBS; ++q)
                    if (!((rq >> q) & 1))
                        plane(sl, t * 3 * SUBS + 2 * SUBS + q, jj)
                            = (int8_t)free_s;
            }
    return P;
}

void sp_scalars(void* h, int64_t* out) {
    auto* P = (StreamPlan*)h;
    out[0] = P->nslabs;
    out[1] = P->nsteps;
    out[2] = P->s_batch;
    out[3] = P->nwin;
    out[4] = (int64_t)P->rounds * 3 * SUBS;   // exported plane rows
    out[5] = P->rounds;
}

void sp_export(void* h, float* val, int16_t* vidx, int8_t* planes,
               int32_t* sbase, int32_t* cw, int32_t* cfirst) {
    auto* P = (StreamPlan*)h;
    std::memcpy(val, P->val.data(), P->val.size() * 4);
    std::memcpy(vidx, P->vidx.data(), P->vidx.size() * 2);
    // planes were built with MAXR round stride; export trimmed
    const int64_t rows = (int64_t)P->rounds * 3 * SUBS;
    for (int64_t sl = 0; sl < P->nslabs; ++sl)
        std::memcpy(planes + sl * rows * LANES,
                    P->planes.data() + sl * MAXR * 3 * SUBS * LANES,
                    rows * LANES);
    std::memcpy(sbase, P->sbase.data(), P->sbase.size() * 4);
    std::memcpy(cw, P->cw.data(), P->cw.size() * 4);
    std::memcpy(cfirst, P->cfirst.data(), P->cfirst.size() * 4);
}

void sp_export_vlo(void* h, float* lo) {
    auto* P = (StreamPlan*)h;
    std::memcpy(lo, P->val_lo.data(), P->val_lo.size() * 4);
}

void sp_export_sb2(void* h, int32_t* sb2) {
    auto* P = (StreamPlan*)h;
    std::memcpy(sb2, P->sbase2.data(), P->sbase2.size() * 4);
}

void sp_export_cw(void* h, int32_t* cw) {
    auto* P = (StreamPlan*)h;
    std::memcpy(cw, P->cw.data(), P->cw.size() * 4);
}

void sp_export_loads(void* h, int64_t* loads) {
    // per-slab load = nonzero val lanes (+ nonzero LO lanes when df64)
    // — matches stream_plan._finish_stream's count_nonzero exactly
    auto* P = (StreamPlan*)h;
    for (int64_t s = 0; s < P->nslabs; ++s) {
        int64_t c = 0;
        const int64_t base = s * SUBS * LANES;
        for (int64_t k = 0; k < SUBS * LANES; ++k) {
            if (P->val[base + k] != 0.0f) ++c;
            else if (!P->val_lo.empty() && P->val_lo[base + k] != 0.0f)
                ++c;
        }
        loads[s] = c;
    }
}

void sp_export_class(void* h, const int64_t* src, int64_t n_out,
                     int32_t s_batch, int32_t rounds, float* val,
                     float* val_lo, int16_t* vidx, int8_t* planes,
                     int32_t* sbase, int32_t* sbase2) {
    // Export `n_out` slabs picked by `src` (builder slab id, -1 =
    // padding -> zeros) directly in the FINAL kernel layout: planes in
    // the per-STEP stacked order (stream_plan.stack_step_planes — for
    // step t, round r, triple q: all s_batch slabs' sublane rows).
    // One pass; replaces the NumPy reorder + unstack/stack round trips
    // that dominated the stream planning profile.
    auto* P = (StreamPlan*)h;
    const int64_t R = rounds;
    const int64_t sl_bytes = SUBS * LANES;
    for (int64_t o = 0; o < n_out; ++o) {
        const int64_t s = src[o];
        if (s < 0) {
            std::memset(val + o * sl_bytes, 0, sl_bytes * 4);
            if (val_lo) std::memset(val_lo + o * sl_bytes, 0,
                                    sl_bytes * 4);
            std::memset(vidx + o * sl_bytes, 0, sl_bytes * 2);
            sbase[o] = 0;
            if (sbase2) sbase2[o] = 0;
        } else {
            std::memcpy(val + o * sl_bytes, P->val.data() + s * sl_bytes,
                        sl_bytes * 4);
            if (val_lo)
                std::memcpy(val_lo + o * sl_bytes,
                            P->val_lo.data() + s * sl_bytes,
                            sl_bytes * 4);
            std::memcpy(vidx + o * sl_bytes,
                        P->vidx.data() + s * sl_bytes, sl_bytes * 2);
            sbase[o] = P->sbase[s];
            if (sbase2)
                sbase2[o] = P->sbase2.empty() ? 0 : P->sbase2[s];
        }
    }
    // stacked planes: out step t row block = [round r][triple q][slab
    // k][sublane] ; raw builder rows = slab-major [r][q][sublane]
    const int64_t nsteps = n_out / s_batch;
    const int64_t step_rows = R * 3 * SUBS * s_batch;
    for (int64_t t = 0; t < nsteps; ++t) {
        int8_t* outp = planes + t * step_rows * LANES;
        for (int64_t r = 0; r < R; ++r)
            for (int64_t q = 0; q < 3; ++q)
                for (int64_t k = 0; k < s_batch; ++k) {
                    const int64_t s = src[t * s_batch + k];
                    int8_t* dst = outp
                        + (((r * 3 + q) * s_batch + k) * SUBS) * LANES;
                    if (s < 0) {
                        std::memset(dst, 0, SUBS * LANES);
                    } else {
                        // raw planes were built with MAXR stride
                        std::memcpy(dst,
                                    P->planes.data()
                                        + ((s * MAXR * 3
                                            + (r * 3 + q)) * SUBS)
                                              * LANES,
                                    SUBS * LANES);
                    }
                }
    }
}

void sp_export_segmask(void* h, int8_t* out) {
    auto* P = (StreamPlan*)h;
    std::memcpy(out, P->segmask.data(), P->segmask.size());
}

int32_t sp_seg_levels(void* h) {
    return ((StreamPlan*)h)->seg_levels;
}

void sp_release(void* h) { delete (StreamPlan*)h; }

}  // extern "C"
