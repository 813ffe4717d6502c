"""TileMatrix serialization (checkpoint/resume for converted matrices).

The reference re-converts every matrix on every run (SURVEY.md §5:
no checkpointing exists). Corpus sweeps re-pay conversion constantly, so
converted TileMatrix containers can be saved to a single .npz and reloaded
without touching the converter.
"""
from __future__ import annotations

import dataclasses
import json

import numpy as np

from ..config import TileConfig
from .tile_matrix import (COOBucket, CSRBucket, DNSBucket, DNSColBucket,
                          DNSRowBucket, ELLBucket, HYBBucket, ResidualCSR,
                          TileMatrix)

# the residual CSR is derived lazily by TileMatrix and not serialized
_BUCKETS = ("csr", "coo", "ell", "hyb", "dns", "dnsrow", "dnscol")
_BUCKET_TYPES = dict(csr=CSRBucket, coo=COOBucket, ell=ELLBucket,
                     hyb=HYBBucket, dns=DNSBucket, dnsrow=DNSRowBucket,
                     dnscol=DNSColBucket)


def save_tile_matrix(path: str, tm: TileMatrix) -> None:
    arrays = {
        "tile_ptr": tm.tile_ptr, "tile_rowidx": tm.tile_rowidx,
        "tile_columnidx": tm.tile_columnidx, "tile_nnz": tm.tile_nnz,
        "fmt": tm.fmt,
    }
    for name in _BUCKETS:
        bucket = getattr(tm, name)
        for f in dataclasses.fields(bucket):
            arrays[f"{name}.{f.name}"] = getattr(bucket, f.name)
    cfg = dataclasses.asdict(tm.config)
    cfg["value_dtype"] = np.dtype(tm.config.value_dtype).str
    meta = dict(shape=list(tm.shape), nnz=tm.nnz, tilem=tm.tilem,
                tilen=tm.tilen, config=cfg, version=1)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_tile_matrix(path: str) -> TileMatrix:
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    if meta.get("version") != 1:
        raise ValueError(f"unknown TileMatrix file version {meta.get('version')}")
    cfg_d = meta["config"]
    cfg_d["value_dtype"] = np.dtype(cfg_d["value_dtype"])
    config = TileConfig(**cfg_d)
    buckets = {}
    for name in _BUCKETS:
        cls = _BUCKET_TYPES[name]
        kwargs = {f.name: z[f"{name}.{f.name}"]
                  for f in dataclasses.fields(cls)}
        buckets[name] = cls(**kwargs)
    return TileMatrix(
        shape=tuple(meta["shape"]), nnz=int(meta["nnz"]), config=config,
        tilem=int(meta["tilem"]), tilen=int(meta["tilen"]),
        tile_ptr=z["tile_ptr"], tile_rowidx=z["tile_rowidx"],
        tile_columnidx=z["tile_columnidx"], tile_nnz=z["tile_nnz"],
        fmt=z["fmt"], **buckets)
