import jax
jax.config.update("jax_enable_x64", True)
import numpy as np
import tilespmv_tpu as tsp
from tilespmv_tpu.io import generate, mmio
import tempfile, os

csr0 = generate.mixed_structure(1000, 777, seed=11)
with tempfile.TemporaryDirectory() as d:
    p = os.path.join(d, "m.mtx")
    mmio.save_mtx(p, csr0)
    csr = mmio.load_mtx(p)
tm = tsp.tile_create(csr)
x = np.linspace(-1, 1, 777)
err = np.max(np.abs(tsp.spmv_cpu(tm, x) - csr.matvec(x)))
print("cpu err:", err, flush=True)
assert err < 1e-10
op = tsp.TileSpMV(csr, backend="pallas")
y = np.asarray(op(x.astype(np.float32)))
ref = csr.matvec(x)
rel = np.max(np.abs(y - ref) / (np.abs(ref) + 1e-6))
print("f32 device rel err:", rel, flush=True)
assert rel < 0.01
op64 = tsp.TileSpMV(csr, compute_dtype=np.float64)
y64 = np.asarray(op64(x))
mag = np.abs(csr.to_dense()) @ np.abs(x)
e64 = np.max(np.abs(y64 - ref) / (1 + mag))
print("f64 device err:", e64, "backend:", op64.backend, flush=True)
assert e64 < 1e-10 and op64.backend == "pallas"
print("VERIFY OK on", jax.devices()[0].device_kind, flush=True)
