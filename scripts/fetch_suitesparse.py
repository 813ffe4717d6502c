"""Fetch the SuiteSparse benchmark corpus listed in a manifest CSV.

The reference's quality bar is a 2,757-matrix SuiteSparse sweep
(reference: external/CSR5_cuda/2757-matrix.csv + bench0.sh:1-14, which
iterates `id,group,name,rows,cols,nnz` rows over a local UFget mirror).
This script reproduces that corpus for a NETWORKED user: it downloads
each matrix's Matrix Market tarball from the SuiteSparse collection
(the ssget URL scheme, https://sparse.tamu.edu) and unpacks it into the
same `<dir>/<Group>/<Name>/<Name>.mtx` layout bench0.sh expects, which
is exactly what `python -m tilespmv_tpu.cli --sweep-manifest <csv>
--matrix-dir <dir>` consumes.

This environment has no network egress — the script is shipped for
reproduction elsewhere and is never run here (its smoke coverage is the
manifest-parsing path shared with the CLI, tests/test_aux.py).

Usage:
    python scripts/fetch_suitesparse.py --dir /data/suitesparse \
        [--manifest tilespmv_tpu/bench/suitesparse_2757.csv] \
        [--limit N] [--start-at K]

Then run the full reference-parity sweep in one command:
    python -m tilespmv_tpu.cli --sweep-manifest \
        tilespmv_tpu/bench/suitesparse_2757.csv --matrix-dir /data/suitesparse
"""
import argparse
import csv
import os
import sys
import tarfile
import tempfile
import urllib.request

BASE_URL = "https://suitesparse-collection-website.herokuapp.com/MM"
# mirror used by ssget; either works:
ALT_URL = "https://sparse-files.engr.tamu.edu/MM"


def fetch_one(group: str, name: str, out_dir: str, base: str) -> bool:
    dest = os.path.join(out_dir, group, name, f"{name}.mtx")
    if os.path.exists(dest):
        return True
    url = f"{base}/{group}/{name}.tar.gz"
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with tempfile.NamedTemporaryFile(suffix=".tar.gz") as tmp:
        print(f"  {url}", flush=True)
        with urllib.request.urlopen(url, timeout=120) as r:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                tmp.write(chunk)
        tmp.flush()
        with tarfile.open(tmp.name, "r:gz") as tf:
            member = f"{name}/{name}.mtx"
            tf.extract(member, os.path.join(out_dir, group),
                       filter="data")
    return os.path.exists(dest)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dir", required=True,
                    help="output corpus root (Group/Name/Name.mtx)")
    ap.add_argument("--manifest",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "tilespmv_tpu", "bench",
                                         "suitesparse_2757.csv"))
    ap.add_argument("--limit", type=int, default=None,
                    help="fetch only the first N manifest rows")
    ap.add_argument("--start-at", type=int, default=1,
                    help="skip manifest ids below K (resume)")
    ap.add_argument("--alt-mirror", action="store_true",
                    help=f"use {ALT_URL} instead of {BASE_URL}")
    args = ap.parse_args(argv)
    base = ALT_URL if args.alt_mirror else BASE_URL

    rows = []
    with open(args.manifest, newline="") as f:
        for row in csv.reader(f):
            if len(row) < 3 or not row[0].strip().isdigit():
                continue  # header/blank tolerant
            rows.append((int(row[0]), row[1].strip(), row[2].strip()))
    if args.limit:
        rows = rows[: args.limit]
    ok = failed = 0
    for mid, group, name in rows:
        if mid < args.start_at:
            continue
        try:
            if fetch_one(group, name, args.dir, base):
                ok += 1
            else:
                failed += 1
        except Exception as e:  # noqa: BLE001 — keep sweeping
            failed += 1
            print(f"FAILED {group}/{name}: {e}", file=sys.stderr)
    print(f"fetched {ok} matrices, {failed} failures -> {args.dir}")
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
