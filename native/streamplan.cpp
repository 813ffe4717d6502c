// Native stream-plan builder for tilespmv-tpu.
//
// C++ core for ops/pallas/stream_plan.py::build_stream_chunks — the
// compile step of the entry-level stream engine (the CSR5-analog residual
// engine; see that module's docstring for the slab/round design). The
// NumPy builder is kept as the reference implementation; this core does
// the same construction in two sorts + linear passes:
//
//   1. sort entries by (row-window, col); cut greedy 8192-col span groups
//   2. sort by (group, sublane(=1024-col window), row-in-window)
//   3. assign lanes (127 per sublane, lane 0 reserved), slabs, window
//      padding to a multiple of s_batch
//   4. contributors = maximal same-row runs per (slab, sublane); round =
//      compacted (src+tgt) mod 8 proper coloring (stream_plan.py
//      _assign_rounds — sort-free, never spills under 8 rounds)
//   5. fill value/index planes (int8 round planes, slab-major)
//
// C ABI (ctypes):
//   h = sp_build(...);  sp_scalars(h, out[8]);  sp_export(h, ...);
//   sp_release(h)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <numeric>

namespace {

constexpr int64_t RW_ROWS = 1024;
constexpr int64_t LANES = 128;
constexpr int64_t SUBS = 8;
constexpr int64_t CAP = LANES - 1;

struct StreamPlan {
    int64_t nslabs = 0, nsteps = 0, nwin = 0;
    int32_t rounds = 0, s_batch = 0;

    std::vector<float> val;       // nslabs*8*128
    std::vector<int16_t> vidx;    // nslabs*8*128
    std::vector<int8_t> rend;     // nslabs*rounds*8*128
    std::vector<int8_t> rstart;
    std::vector<int8_t> rsrc;
    std::vector<int32_t> sbase;   // nslabs
    std::vector<int32_t> cw;      // nsteps
    std::vector<int32_t> cfirst;  // nsteps
    // spill is always empty (coloring is bounded by 8 = max_rounds)
};

}  // namespace

extern "C" {

void* sp_build(int64_t nz, const int64_t* g_row, const int64_t* g_col,
               const double* vals, int64_t m, int32_t s_batch_req,
               int32_t subwin_rows) {
    // sublane window = subwin_rows x2d128 rows (8 or 16); slab span = 8
    // windows
    const int64_t SUBWIN = (int64_t)subwin_rows * LANES;
    const int64_t SPAN_COLS = SUBS * SUBWIN;
    const int sub_shift = subwin_rows == 16 ? 11 : 10;
    auto* P = new StreamPlan();
    const int64_t nwin = std::max<int64_t>(1, (m + RW_ROWS - 1) / RW_ROWS);
    P->nwin = nwin;
    if (nz == 0) { delete P; return nullptr; }

    // --- 1. order by (window, col) ---
    std::vector<int64_t> ord(nz);
    std::iota(ord.begin(), ord.end(), 0);
    std::sort(ord.begin(), ord.end(), [&](int64_t a, int64_t b) {
        const int64_t wa = g_row[a] >> 10, wb = g_row[b] >> 10;
        if (wa != wb) return wa < wb;
        if (g_col[a] != g_col[b]) return g_col[a] < g_col[b];
        return a < b;
    });

    // --- 2. greedy span groups within each window ---
    struct Group { int64_t start, base, win; };
    std::vector<Group> groups;
    {
        int64_t i = 0;
        while (i < nz) {
            const int64_t w = g_row[ord[i]] >> 10;
            const int64_t base = (g_col[ord[i]] >> 7) << 7;
            groups.push_back({i, base, w});
            int64_t j = i;
            while (j < nz && (g_row[ord[j]] >> 10) == w
                   && g_col[ord[j]] < base + SPAN_COLS) {
                ++j;
            }
            i = j;
        }
    }
    const int64_t ngroups = (int64_t)groups.size();

    // --- 3. order within groups by (sublane, row); assign lanes/slabs ---
    std::vector<int32_t> sub_of(nz);
    std::vector<int64_t> group_of(nz);
    for (int64_t g = 0; g < ngroups; ++g) {
        const int64_t e = (g + 1 < ngroups) ? groups[g + 1].start : nz;
        for (int64_t k = groups[g].start; k < e; ++k) {
            group_of[k] = g;
            sub_of[k] = (int32_t)((g_col[ord[k]] - groups[g].base)
                                  >> sub_shift);
        }
    }
    // stable sort by (group, sub, row) — group blocks are already
    // contiguous, so sort each block independently
    for (int64_t g = 0; g < ngroups; ++g) {
        const int64_t s = groups[g].start;
        const int64_t e = (g + 1 < ngroups) ? groups[g + 1].start : nz;
        std::stable_sort(ord.begin() + s, ord.begin() + e,
                         [&](int64_t a, int64_t b) {
            const int64_t sa = (g_col[a] - groups[g].base) >> sub_shift;
            const int64_t sb = (g_col[b] - groups[g].base) >> sub_shift;
            if (sa != sb) return sa < sb;
            return g_row[a] < g_row[b];
        });
    }

    // slabs per group = max over sublanes of ceil(count/CAP); per-entry
    // (slab, sublane, lane)
    std::vector<int64_t> gslab_start(ngroups + 1, 0);
    std::vector<int32_t> slab_k(nz), lane_of(nz);
    for (int64_t g = 0; g < ngroups; ++g) {
        const int64_t s = groups[g].start;
        const int64_t e = (g + 1 < ngroups) ? groups[g + 1].start : nz;
        int64_t maxk = 0;
        int64_t run = 0;
        int32_t cur_sub = -1;
        for (int64_t k = s; k < e; ++k) {
            const int32_t sb = (int32_t)((g_col[ord[k]]
                                          - groups[g].base) >> sub_shift);
            if (sb != cur_sub) { cur_sub = sb; run = 0; }
            slab_k[k] = (int32_t)(run / CAP);
            lane_of[k] = (int32_t)(run % CAP) + 1;
            maxk = std::max<int64_t>(maxk, run / CAP);
            ++run;
        }
        gslab_start[g + 1] = gslab_start[g] + maxk + 1;
    }
    int64_t nslabs_raw = gslab_start[ngroups];

    // per-window padding to a multiple of s_batch + inert slabs for
    // windows with no entries; slab id remap old -> padded
    std::vector<int64_t> win_of_slab_raw(nslabs_raw);
    std::vector<int64_t> base_of_slab_raw(nslabs_raw);
    for (int64_t g = 0; g < ngroups; ++g)
        for (int64_t k = gslab_start[g]; k < gslab_start[g + 1]; ++k) {
            win_of_slab_raw[k] = groups[g].win;
            base_of_slab_raw[k] = groups[g].base;
        }
    std::vector<int64_t> win_cnt(nwin, 0);
    for (int64_t k = 0; k < nslabs_raw; ++k)
        ++win_cnt[win_of_slab_raw[k]];
    int32_t S = s_batch_req;
    if (S <= 0) {
        // adaptive, matching the NumPy reference exactly: average slab
        // count per window over ALL windows, counting one inert slab for
        // each empty window (stream_plan.py s_batch auto block)
        int64_t n_missing = 0;
        for (int64_t w = 0; w < nwin; ++w)
            if (win_cnt[w] == 0) ++n_missing;
        const double avg = (double)(nslabs_raw + n_missing) / (double)nwin;
        S = 1;
        while (S < 16 && S * 2 <= avg) S *= 2;
    }
    std::vector<int64_t> win_pad(nwin), win_start(nwin + 1, 0);
    for (int64_t w = 0; w < nwin; ++w) {
        int64_t c = win_cnt[w];
        if (c == 0) c = S;                       // inert window slab(s)
        win_pad[w] = ((c + S - 1) / S) * S;
        win_start[w + 1] = win_start[w] + win_pad[w];
    }
    const int64_t nslabs = win_start[nwin];
    std::vector<int64_t> old2new(nslabs_raw);
    {
        std::vector<int64_t> fill(nwin, 0);
        for (int64_t k = 0; k < nslabs_raw; ++k) {
            const int64_t w = win_of_slab_raw[k];
            old2new[k] = win_start[w] + fill[w]++;
        }
    }

    P->nslabs = nslabs;
    P->s_batch = S;
    P->nsteps = nslabs / S;
    P->sbase.assign(nslabs, 0);
    std::vector<int64_t> win_of_slab(nslabs);
    for (int64_t w = 0; w < nwin; ++w)
        for (int64_t k = win_start[w]; k < win_start[w + 1]; ++k)
            win_of_slab[k] = w;
    for (int64_t k = 0; k < nslabs_raw; ++k)
        P->sbase[old2new[k]] = (int32_t)(base_of_slab_raw[k] >> 7);

    P->cw.assign(P->nsteps, 0);
    P->cfirst.assign(P->nsteps, 0);
    for (int64_t t = 0; t < P->nsteps; ++t) {
        P->cw[t] = (int32_t)win_of_slab[t * S];
        P->cfirst[t] = (t == 0 || P->cw[t] != P->cw[t - 1]) ? 1 : 0;
    }

    // --- 4/5. value/index planes + contributors + round coloring ---
    P->val.assign(nslabs * SUBS * LANES, 0.0f);
    P->vidx.assign(nslabs * SUBS * LANES, 0);
    const int32_t rounds = 8;  // coloring bound; trimmed by the caller
    P->rounds = rounds;
    P->rend.assign(nslabs * rounds * SUBS * LANES, 0);
    P->rstart.assign(nslabs * rounds * SUBS * LANES, 0);
    P->rsrc.assign(nslabs * rounds * SUBS * LANES, 0);
    std::vector<uint8_t> used(nslabs * LANES, 0);

    auto plane = [&](std::vector<int8_t>& v, int64_t slab, int64_t t,
                     int64_t s, int64_t j) -> int8_t& {
        return v[((slab * rounds + t) * SUBS + s) * LANES + j];
    };

    int32_t max_used_round = 0;
    // entries are in (group, sub, row) order; runs are contiguous
    int64_t k = 0;
    while (k < nz) {
        const int64_t g = group_of[k];
        const int64_t slab = old2new[gslab_start[g] + slab_k[k]];
        const int32_t sub = sub_of[k];
        const int64_t row = g_row[ord[k]];
        int64_t kk = k;
        while (kk < nz && group_of[kk] == g && sub_of[kk] == sub
               && g_row[ord[kk]] == row
               && old2new[gslab_start[g] + slab_k[kk]] == slab) {
            const int64_t e = ord[kk];
            const int64_t idx = (slab * SUBS + sub) * LANES + lane_of[kk];
            P->val[idx] = (float)vals[e];
            P->vidx[idx] = (int16_t)(g_col[e] - groups[g].base
                                     - (int64_t)sub * SUBWIN);
            ++kk;
        }
        // contributor: run [k, kk) -> round coloring + planes
        const int64_t rloc = row - win_of_slab[slab] * RW_ROWS;
        const int32_t tgt = (int32_t)(rloc >> 7);
        const int32_t j = (int32_t)(rloc & (LANES - 1));
        const int32_t color = (int32_t)((sub + tgt) % SUBS);
        uint8_t& um = used[slab * LANES + j];
        // rank of color among used colors in this cell (colors are
        // visited in arbitrary order, so compaction must be two-pass;
        // first pass just records the mask, second pass assigns)
        um |= (uint8_t)(1u << color);
        // store raw color for now; compact below
        plane(P->rend, slab, color, sub, j) = (int8_t)lane_of[kk - 1];
        plane(P->rstart, slab, color, sub, j) = (int8_t)(lane_of[k] - 1);
        plane(P->rsrc, slab, color, tgt, j) = (int8_t)(sub | 0x40);
        k = kk;
    }

    // compact colors per cell (move round planes from color c to
    // popcount(used & ((1<<c)-1))), tracking which targets are routed
    std::vector<uint8_t> routed(nslabs * 8 * LANES, 0);  // bit q per (t,j)
    for (int64_t slab = 0; slab < nslabs; ++slab) {
        for (int64_t j = 0; j < LANES; ++j) {
            const uint8_t um = used[slab * LANES + j];
            if (um == 0) continue;
            int8_t endb[SUBS][SUBS], startb[SUBS][SUBS], srcb[SUBS][SUBS];
            for (int c = 0; c < SUBS; ++c)
                for (int s = 0; s < SUBS; ++s) {
                    endb[c][s] = plane(P->rend, slab, c, s, j);
                    startb[c][s] = plane(P->rstart, slab, c, s, j);
                    srcb[c][s] = plane(P->rsrc, slab, c, s, j);
                    plane(P->rend, slab, c, s, j) = 0;
                    plane(P->rstart, slab, c, s, j) = 0;
                    plane(P->rsrc, slab, c, s, j) = 0;
                }
            for (int c = 0; c < SUBS; ++c) {
                if (!((um >> c) & 1)) continue;
                const int t = __builtin_popcount(um & ((1u << c) - 1));
                max_used_round = std::max(max_used_round, t + 1);
                for (int s = 0; s < SUBS; ++s) {
                    if (endb[c][s] != startb[c][s]) {
                        plane(P->rend, slab, t, s, j) = endb[c][s];
                        plane(P->rstart, slab, t, s, j) = startb[c][s];
                    }
                    if (srcb[c][s] & 0x40) {
                        plane(P->rsrc, slab, t, s, j) =
                            (int8_t)(srcb[c][s] & 0x07);
                        routed[(slab * 8 + t) * LANES + j] |=
                            (uint8_t)(1u << s);
                    }
                }
            }
        }
    }
    // default rsrc: point every unrouted target at a source whose planes
    // are zero-diff (exists whenever any target is unrouted: a full busy
    // mask implies all 8 targets routed, by the matching property)
    for (int64_t slab = 0; slab < nslabs; ++slab)
        for (int64_t t = 0; t < 8; ++t)
            for (int64_t j = 0; j < LANES; ++j) {
                uint8_t busy = 0;
                for (int s = 0; s < SUBS; ++s)
                    if (plane(P->rend, slab, t, s, j)
                        != plane(P->rstart, slab, t, s, j))
                        busy |= (uint8_t)(1u << s);
                if (busy == 0) continue;           // all-zero: safe
                int free_s = 0;
                while (free_s < SUBS && ((busy >> free_s) & 1)) ++free_s;
                const uint8_t rq = routed[(slab * 8 + t) * LANES + j];
                for (int q = 0; q < SUBS; ++q)
                    if (!((rq >> q) & 1))
                        plane(P->rsrc, slab, t, q, j) = (int8_t)free_s;
            }

    P->rounds = std::max(4, ((max_used_round + 3) / 4) * 4);
    return P;
}

void sp_scalars(void* h, int64_t* out) {
    auto* P = (StreamPlan*)h;
    out[0] = P->nslabs;
    out[1] = P->nsteps;
    out[2] = P->rounds;
    out[3] = P->s_batch;
    out[4] = P->nwin;
    out[5] = 8;  // built-rounds stride of the internal planes
}

void sp_export(void* h, float* val, int16_t* vidx, int8_t* rend,
               int8_t* rstart, int8_t* rsrc, int32_t* sbase, int32_t* cw,
               int32_t* cfirst) {
    auto* P = (StreamPlan*)h;
    std::memcpy(val, P->val.data(), P->val.size() * 4);
    std::memcpy(vidx, P->vidx.data(), P->vidx.size() * 2);
    // planes were built with stride 8 rounds; export trimmed to P->rounds
    const int64_t R = P->rounds;
    for (int64_t s = 0; s < P->nslabs; ++s) {
        const int64_t src_off = s * 8 * SUBS * LANES;
        const int64_t dst_off = s * R * SUBS * LANES;
        std::memcpy(rend + dst_off, P->rend.data() + src_off,
                    R * SUBS * LANES);
        std::memcpy(rstart + dst_off, P->rstart.data() + src_off,
                    R * SUBS * LANES);
        std::memcpy(rsrc + dst_off, P->rsrc.data() + src_off,
                    R * SUBS * LANES);
    }
    std::memcpy(sbase, P->sbase.data(), P->sbase.size() * 4);
    std::memcpy(cw, P->cw.data(), P->cw.size() * 4);
    std::memcpy(cfirst, P->cfirst.data(), P->cfirst.size() * 4);
}

void sp_release(void* h) { delete (StreamPlan*)h; }

}  // extern "C"
