"""Size candidate stream-slab geometries on a captured entry list.

Round-4 headline task (VERDICT #1): the stream engine runs at ~68% slab
fill on powerlaw_large because a slab holds ONE (window, superspan)
group and the group's slab count is the max over its 8 sublanes (column
blocks) of ceil(count/127). Candidate geometries let a slab carry a
SECOND x view — the same span with its block->sublane map rolled by 4
(self-balancing) and/or a different span (cross-group pairing) — so
imbalanced blocks and group tails stop padding slabs. This script
computes exact slab counts per candidate from the captured entries
(scripts/capture_stream_entries.py) and prices them with the measured
v5e cost constants; the winner gets built for real.

Cost model: mono slab ~(83 + 18.5) ns (rounds machinery + 8-chunk x
staging); a dual-view slab stages 16 chunks ~(83 + 37) ns; active steps
pay 252 ns each (priced at s_batch 12).
"""
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

CAP = 127
SUBS = 8

name = sys.argv[1] if len(sys.argv) > 1 else "powerlaw_large"
span_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 64
d = np.load(f"/tmp/stream_entries_{name}.npz")
g_row, g_col, m = d["g_row"], d["g_col"], int(d["m"])
nz = g_row.size
sh = 7 + int(span_rows).bit_length() - 1

win = (g_row >> 10).astype(np.int64)
span = (g_col >> sh).astype(np.int64)
sub = ((g_col >> (sh - 3)) & 7).astype(np.int64)

# per-(window, span) group x sublane counts
key = (win << 34) | (span << 3) | sub
uk, uc = np.unique(key, return_counts=True)
gkey = uk >> 3
ug, ginv = np.unique(gkey, return_inverse=True)
ngroups = ug.size
C = np.zeros((ngroups, SUBS), np.int64)
C[ginv, uk & 7] = uc
T = C.sum(axis=1)
gwin = (ug >> 31).astype(np.int64)

print(f"{name}: nz={nz} groups={ngroups} windows={np.unique(win).size} "
      f"span_rows={span_rows}")

ceil = lambda a, b: -(-a // b)

# --- S0: current geometry ---
K0 = ceil(C, CAP).max(axis=1)
S0 = int(K0.sum())

# --- self-roll: block b can sit in sublane b or b+4; pair {s, s+4}
# shares 2*CAP per slab ---
P = C[:, :4] + C[:, 4:]
K_roll = ceil(P, 2 * CAP).max(axis=1)
S_roll = int(K_roll.sum())

# --- self-perm (arbitrary per-slab permutation view): lower bound ---
K_perm = np.maximum(ceil(T, SUBS * CAP), ceil(C.max(axis=1), 2 * CAP))
S_perm = int(K_perm.sum())

# --- absolute lower bound: free block->sublane assignment ---
S_lb = int(ceil(T, SUBS * CAP).sum())

# --- V1: pure-A cutting + greedy cross-pair of residual slabs.
# A group's first K0-1 slabs are full in the max sublane; residual
# r_s = c_s - (K0-1)*CAP clipped. Cross slab: g1 view A (sublane=b),
# g2 view B (sublane=(b+4)%8): feasible iff r1_s + r2_{s+4} <= CAP. ---
resid = np.clip(C - (K0 - 1)[:, None] * CAP, 0, None)


def greedy_pair(res_list):
    """res_list: list of (8,) residual vectors in one window. Greedy
    first-fit: sort by total desc; each takes the first unpaired partner
    that fits (one partner max — a slab holds 2 views)."""
    order = sorted(range(len(res_list)),
                   key=lambda i: -int(res_list[i].sum()))
    used = [False] * len(res_list)
    slabs = 0
    for i in order:
        if used[i]:
            continue
        used[i] = True
        ri = res_list[i]
        for j in order:
            if used[j]:
                continue
            rj = res_list[j]
            if np.all(ri + np.roll(rj, -4) <= CAP):
                used[j] = True
                break
        slabs += 1
    return slabs


by_win = defaultdict(list)
for g in range(ngroups):
    by_win[int(gwin[g])].append(resid[g])
S_v1 = int((K0 - 1).sum())
for w, lst in by_win.items():
    S_v1 += greedy_pair(lst)

# --- V3: per group min(pure-A, self-roll) for the full slabs; groups
# that chose pure-A contribute residuals to cross-pairing ---
S_v3 = 0
by_win3 = defaultdict(list)
for g in range(ngroups):
    if K_roll[g] < K0[g]:
        S_v3 += int(K_roll[g])        # self-balanced, fully dual
    else:
        S_v3 += int(K0[g]) - 1
        by_win3[int(gwin[g])].append(resid[g])
for w, lst in by_win3.items():
    S_v3 += greedy_pair(lst)

MONO, DUAL, STEP = 83.0 + 18.5, 83.0 + 37.0, 252.0 / 12


def price(slabs, dual=True):
    return slabs * ((DUAL if dual else MONO) + STEP) * 1e-6


print(f"S0   (current)          : {S0:7d} slabs  fill {nz/(S0*1016):.2f}"
      f"  est {price(S0, False):.3f} ms")
print(f"S_roll (self 2-choice)  : {S_roll:7d} slabs  fill "
      f"{nz/(S_roll*1016):.2f}  est {price(S_roll):.3f} ms")
print(f"S_perm (self perm LB)   : {S_perm:7d} slabs  fill "
      f"{nz/(S_perm*1016):.2f}  est {price(S_perm):.3f} ms")
print(f"S_v1 (A + cross resid)  : {S_v1:7d} slabs  fill "
      f"{nz/(S_v1*1016):.2f}  est {price(S_v1):.3f} ms")
print(f"S_v3 (best-of + cross)  : {S_v3:7d} slabs  fill "
      f"{nz/(S_v3*1016):.2f}  est {price(S_v3):.3f} ms")
print(f"S_lb (free assignment)  : {S_lb:7d} slabs  fill "
      f"{nz/(S_lb*1016):.2f}  est {price(S_lb):.3f} ms")

# decomposition: how much of the S0 pad is within-group imbalance vs
# group tails?
full_pad = int((K0 * SUBS * CAP - T).sum())
imb = int((K0 * SUBS * CAP - ceil(T, CAP * SUBS) * SUBS * CAP).sum())
print(f"pad cells: {full_pad} ({full_pad/ (S0*1016):.2%} of capacity); "
      f"within-group imbalance share {imb/max(1,full_pad):.2%}")
# group-size histogram
for lo, hi in [(1, 127), (128, 1016), (1017, 4064), (4065, 1 << 60)]:
    sel = (T >= lo) & (T <= hi)
    print(f"  groups T in [{lo},{hi if hi < 1<<59 else 'inf'}]: "
          f"{int(sel.sum()):6d} entries {int(T[sel].sum()):8d} "
          f"slabs(S0) {int(K0[sel].sum()):6d}")
