"""In-situ stream-engine variant ablation on a real corpus matrix.

Times stream_class_call on the matrix's actual stream plan under each
STREAM_VARIANT combination (kernels re-trace per call, so flipping the
module dict between timings is sound).
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["TILESPMV_ABLATE"] = "1"  # this harness may time
# wrong-results probe arms; the kernels refuse them without this

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tilespmv_tpu.io import generate  # noqa: E402
from tilespmv_tpu.ops.spmv import TileSpMV  # noqa: E402
from tilespmv_tpu.ops.pallas import kernels  # noqa: E402
from tilespmv_tpu.utils.profiling import _timed  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "powerlaw_large"
csr = generate.get_matrix(name)
op = TileSpMV(csr, backend="pallas")
plan = op.plan
st = plan.stream
assert st is not None, "no stream class on this matrix"
print(f"{name}: {st.nslabs} slabs, s_batch={st.s_batch}, "
      f"rounds={st.rounds}, nsteps={st.nsteps}")

x = jnp.asarray(((np.arange(plan.n) % 10) / 4.0), jnp.float32)
x128 = (jnp.zeros(plan.x_padded_len128, jnp.float32)
        .at[: plan.n].set(x).reshape(-1, 128))

arms = [("wide", False), ("narrow", False), ("chunk", False)]
if "--wide-scatter" in sys.argv:
    arms += [("wide", True), ("narrow", True), ("chunk", True)]
ref = None
for xg, ws in arms:
    kernels.STREAM_VARIANT["xg"] = xg
    kernels.STREAM_VARIANT["wide_scatter"] = ws
    fn = functools.partial(kernels.stream_class_call,
                           n_windows=plan.n_stream_windows)
    y = np.asarray(fn(st, x128))
    if ref is None:
        ref = y
    else:
        assert np.allclose(ref, y, rtol=1e-4, atol=1e-5), \
            f"variant mismatch xg={xg} ws={ws}"
    dt = _timed(fn, st, x128)
    print(f"xg={xg:6s} wide_scatter={int(ws)}: "
          f"{dt*1e6:9.1f} us  ({dt*1e9/st.nslabs:6.1f} ns/slab)",
          flush=True)
