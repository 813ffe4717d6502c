"""Calibrate stream_plan.SLAB_NS / STEP_NS / SKIP_NS on the real TPU.

Forces every s_batch in {1, 2, 4, 8, 16} on each corpus matrix with a
stream class, times stream_class_call alone (difference method), and
prints the per-s-batch decomposition plus a joint least-squares refit:

    us = active * STEP_NS + active * s * SLAB_NS[s] + skipped * SKIP_NS

Rows where the forced s_batch explodes padding (active*s >> real slabs)
are the ones that separate STEP_NS from SLAB_NS.

Usage (TPU):  PYTHONPATH=/root/repo:/root/.axon_site \
                  python scripts/calibrate_slab_ns.py [names...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp  # noqa: E402

from tilespmv_tpu.core.convert import tile_create  # noqa: E402
from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.pallas.kernels import stream_class_call  # noqa: E402
from tilespmv_tpu.ops.pallas.lane_plan import build_lane_plan  # noqa: E402
from tilespmv_tpu.utils.profiling import _timed  # noqa: E402

NAMES = sys.argv[1:] or ["powerlaw_large", "mixed_large", "mixed_medium",
                         "uniform_sparse", "skipcal_8", "skipcal_16"]
S_CHOICES = (1, 2, 4, 8, 11, 16, 32)  # 11 validates interpolation;
                                      # 32 probes past the S_MAX cap


def _skipcal(every: int):
    """Entries confined to every `every`-th 1024-row window: the other
    windows produce exactly one SKIPPED step each, whatever s_batch —
    the rows that finally constrain SKIP_NS (round-4 task 7; the
    round-3 refit had no skipped steps anywhere and left SKIP_NS at
    its 60 ns estimate)."""
    from tilespmv_tpu.io.mmio import csr_from_coo
    rng = np.random.default_rng(123 + every)
    m = n = 262144
    live_w = np.arange(0, m // 1024, every)
    nnz_per_w = 3000
    rws = np.repeat(live_w, nnz_per_w) * 1024
    rows_ = rws + rng.integers(0, 1024, rws.size)
    # confine columns to 32 superspans so active slabs stay few and the
    # skipped-step share dominates the signal
    cols_ = rng.integers(0, 32 * 8192, rws.size)
    return csr_from_coo(m, n, rows_, cols_,
                        rng.standard_normal(rws.size))


rows = []  # (active, skipped, s, measured_us)
for name in NAMES:
    if name.startswith("skipcal_"):
        csr = _skipcal(int(name.split("_")[1]))
    else:
        csr = generate.get_matrix(name)
    tm = tile_create(csr)
    for s in S_CHOICES:
        plan = build_lane_plan(tm, stream_s_batch=s)
        st = plan.stream
        if st is None:
            print(f"{name}: no stream class; skipping")
            break
        x = jnp.asarray(((np.arange(plan.n) % 10) / 4.0), jnp.float32)
        x128 = (jnp.zeros(plan.x_padded_len128, jnp.float32)
                .at[: plan.n].set(x).reshape(-1, 128))
        nw2 = plan.n_stream_windows
        active = int(np.asarray(st.sactive).sum())
        skipped = st.nsteps - active
        # st passed as a jit ARGUMENT (pytree): closing over it embeds
        # the plane arrays as constants and blows the remote-compile
        # payload limit (HTTP 413) on large matrices
        us = _timed(
            lambda s_, x2: stream_class_call(s_, x2, nw2), st, x128) * 1e6
        per_slab = us * 1e3 / max(1, active * s)
        rows.append((active, skipped, s, us))
        print(f"{name:18s} s={s:2d}: {us:9.1f} us  "
              f"slabs={st.nslabs} steps={st.nsteps} active={active} "
              f"-> {per_slab:6.1f} ns/active-slab", flush=True)

if len(rows) >= len(S_CHOICES) + 2:
    # least squares: unknowns = [STEP_NS, SKIP_NS, SLAB_NS[s] per s]
    svals = sorted({r[2] for r in rows})
    A = np.zeros((len(rows), 2 + len(svals)))
    b = np.zeros(len(rows))
    for i, (active, skipped, s, us) in enumerate(rows):
        A[i, 0] = active
        A[i, 1] = skipped
        A[i, 2 + svals.index(s)] = active * s
        b[i] = us * 1e3                     # ns
    sol, *_ = np.linalg.lstsq(A, b, rcond=None)
    print(f"\nrefit: STEP_NS={sol[0]:.0f}  SKIP_NS={sol[1]:.0f}")
    print("refit: SLAB_NS = {" + ", ".join(
        f"{s}: {sol[2 + i]:.1f}" for i, s in enumerate(svals)) + "}")
    print("(paste into tilespmv_tpu/ops/pallas/stream_plan.py and the "
          "mirrored table in native/streamplan.cpp)")
