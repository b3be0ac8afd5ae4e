"""Regression guard on the measured scaling curve (VERDICT r5 #1).

SCALE_CURVES.json records time-vs-rows points for the heavy pipelines
at three generated scale points.  This guard re-times two
representative pipelines at the sf0.3 point — the banded minhash
build (must stay ~linear) and the one-pass star aggregate (must stay
floor-bound) — against generous multiples of the recorded values, so a
plan regression that bends the curve (a lost broadcast, a new
corpus-wide shuffle, a candidate blowup) fails here long before anyone
re-runs the full curve tool.

The sf0.3 dataset is seed-stable (tools/scale_gen.py) and regenerated
on the fly if absent (~4 s), so the guard is self-contained.
"""
from __future__ import annotations

import json
import os
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "SCALE_CURVES.json")
SF_DIR = os.path.join(REPO, ".scaledata", "sf0.3")

# headroom over the recorded sf0.3 seconds: wide enough for machine /
# contention noise (the pytest session is busier than the curve tool's
# dedicated session), narrow enough that a complexity-class regression
# (linear -> quadratic is >= 10x here) still fails
HEADROOM = 6.0


@pytest.fixture(scope="module")
def record():
    with open(RECORD) as f:
        return json.load(f)["results"]


@pytest.fixture(scope="module")
def sf_dir():
    if not os.path.isdir(SF_DIR):
        from tools.scale_gen import gen

        gen(0.3, SF_DIR)
    return SF_DIR


def _bound(record, name, sf="0.3"):
    pts = {p["sf"]: p["sec"] for p in record[name]["points"]}
    return pts[sf] * HEADROOM


def test_minhash_scaling_point_holds(spark, record, sf_dir):
    from pyspark.sql import functions as F  # noqa: F401

    from stock_ops_spark.operators.dedup import minhash_near_dup_pairs

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    minhash_near_dup_pairs(d, "doc_id", "text", threshold=0.5).count()  # warm
    t0 = time.perf_counter()
    n = minhash_near_dup_pairs(d, "doc_id", "text", threshold=0.5).count()
    el = time.perf_counter() - t0
    assert n == 30  # seed-stable planted dup count at sf0.3
    assert el < _bound(record, "minhash_pairs"), (
        f"minhash sf0.3 took {el:.1f}s vs recorded "
        f"{_bound(record, 'minhash_pairs') / HEADROOM:.1f}s — "
        "the banded build's scaling point regressed"
    )


def test_star_agg_scaling_point_holds(spark, record, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    q = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1))
    )
    q.count()  # warm
    t0 = time.perf_counter()
    assert q.count() == 6
    el = time.perf_counter() - t0
    assert el < _bound(record, "star_agg"), (
        f"star agg sf0.3 took {el:.1f}s — the scan/agg floor regressed"
    )
