"""Examples are executable documentation — keep them green."""
import sys
import pathlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def test_cg_example():
    from examples import cg
    err = cg.main()
    assert err < 1e-4


def test_pagerank_example():
    from examples import pagerank
    err = pagerank.main()
    assert err < 1e-6


def test_distributed_example():
    from examples import distributed_run
    # quick=True: one scaling-sweep point (each count is a fresh
    # shard_map compile; the full sweep is covered on real hardware)
    distributed_run.main(quick=True)
