"""edit_distance_pairs (PassJoin segment pigeonhole) — exactness vs the
quadratic oracle, edge populations, blocking, and the no-product plan
shape.  The reference has no fuzzy matching; this is extension surface
(q79's long-string twin)."""
from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_ops_spark.operators.fuzzy import edit_distance_pairs


def _brute(spark, df, k, block_cols=None):
    blocks = list(block_cols or [])
    a = df.select(
        *[F.col(c).alias(f"{c}_a") for c in blocks],
        F.col("id").alias("ia"),
        F.col("s").alias("sa"),
    )
    b = df.select(
        *[F.col(c).alias(f"{c}_b") for c in blocks],
        F.col("id").alias("ib"),
        F.col("s").alias("sb"),
    )
    j = a.crossJoin(b).where(F.col("ia") < F.col("ib"))
    for c in blocks:
        j = j.where(F.col(f"{c}_a") == F.col(f"{c}_b"))
    out = (
        j.withColumn("d", F.expr(f"levenshtein(sa, sb, {k})"))
        .where(F.col("d") >= 0)
    )
    return {
        tuple([getattr(r, f"{c}_a") for c in blocks] + [r.ia, r.ib, int(r.d)])
        for r in out.collect()
    }


def _got(spark, df, k, block_cols=None):
    blocks = list(block_cols or [])
    return {
        tuple([getattr(r, c) for c in blocks] + [r.id_a, r.id_b, int(r.dist)])
        for r in edit_distance_pairs(df, "id", "s", k, block_cols).collect()
    }


def _mixed_corpus(seed: int, n: int):
    rng = random.Random(seed)

    def rnd(lo, hi, alpha):
        return "".join(
            rng.choice(alpha) for _ in range(rng.randint(lo, hi))
        )

    rows, i = [], 0
    for _ in range(n // 3):  # tiny (len <= 3) incl. empties
        rows.append((i, rnd(0, 3, "ab"))); i += 1
    for _ in range(n // 3):  # short, dense-match regime
        rows.append((i, rnd(4, 12, "abc"))); i += 1
    for _ in range(n - len(rows)):  # long with seeded near-dups
        s = rnd(20, 40, "abcdefgh")
        rows.append((i, s)); i += 1
        if rng.random() < 0.5:
            t = list(s)
            for _ in range(rng.randint(1, 3)):
                op, p = rng.choice("sid"), rng.randrange(len(t))
                if op == "s":
                    t[p] = rng.choice("abcdefgh")
                elif op == "i":
                    t.insert(p, rng.choice("abcdefgh"))
                elif len(t) > 1:
                    del t[p]
            rows.append((i, "".join(t))); i += 1
    return rows


@pytest.mark.parametrize("k", [1, 3])
def test_matches_brute_force_mixed_corpus(spark, k):
    df = spark.createDataFrame(_mixed_corpus(7 + k, 90), "id: long, s: string")
    assert _got(spark, df, k) == _brute(spark, df, k)


def test_k4_long_strings_sparse(spark):
    """k=4 (the q234 setting) on long strings only — candidates sparse,
    one seeded pair at each distance 0..4."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(0, base)]
    rows += [(1, base)]  # dist 0
    rows += [(2, base.replace("quick", "quack"))]  # dist 1
    rows += [(3, "x" + base[:-1])]
    rows += [(10 + i, f"completely unrelated text number {i} padded out") for i in range(6)]
    df = spark.createDataFrame(rows, "id: long, s: string")
    assert _got(spark, df, 4) == _brute(spark, df, 4)
    assert (0, 1, 0) in _got(spark, df, 4)


def test_blocked_restricts_to_equal_blocks(spark):
    rows = [
        ("g1", 0, "abcdefgh"),
        ("g1", 1, "abcdefgx"),
        ("g2", 2, "abcdefgh"),  # same text, other block: excluded
        ("g2", 3, "abcdefgi"),
    ]
    df = spark.createDataFrame(rows, "g: string, id: long, s: string")
    got = _got(spark, df, 2, ["g"])
    assert got == _brute(spark, df, 2, ["g"])
    assert ("g1", 0, 1, 1) in got and not any(
        a == 0 and b == 2 for (_, a, b, _d) in got
    )


def test_nulls_and_empty_strings(spark):
    rows = [(0, None), (1, ""), (2, "ab"), (3, "abc"), (4, "abcdefgh")]
    df = spark.createDataFrame(rows, "id: long, s: string")
    got = _got(spark, df, 2)
    # NULL matches nothing; ed('', 'ab') = 2 qualifies; '' vs 'abc' = 3 not
    assert got == {(1, 2, 2), (2, 3, 1)}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    strs=st.lists(st.text(alphabet="abC", min_size=0, max_size=9), min_size=2, max_size=14),
    k=st.integers(min_value=1, max_value=3),
)
def test_property_equals_python_brute(strs, k):
    """Pure-python DP oracle over adversarial hypothesis strings (the
    Spark session is too slow per-example; the segment arithmetic and
    window logic are mirrored in python and cross-checked in the Spark
    tests above)."""

    def ed(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    kk = k + 1

    def segments(s: str):
        l = len(s)
        base, rem = divmod(l, kk)
        out, pos = [], 0
        for i in range(kk):
            ln = base + (1 if i >= kk - rem else 0)
            out.append((i, pos, s[pos : pos + ln]))
            pos += ln
        return out

    def candidates(r: str, s: str) -> bool:
        """python mirror of the probe/index match: does some segment of s
        occur in r within the pigeonhole window?"""
        m, l = len(r), len(s)
        if l <= k and m <= k:
            return True
        if l < kk:
            return candidates(s, r) if m >= kk else False
        d = m - l
        if abs(d) > k:
            return False
        for i, start, seg in segments(s):
            lo = max(-((k - d) // 2), -start)
            hi = min((d + k) // 2, m - len(seg) - start)
            for x in range(lo, hi + 1):
                if r[start + x : start + x + len(seg)] == seg:
                    return True
        return False

    for ia, a in enumerate(strs):
        for ib, b in enumerate(strs):
            if ia >= ib:
                continue
            if ed(a, b) <= k:
                # pigeonhole recall: every true pair must be a candidate
                # in at least one orientation
                assert candidates(a, b) or candidates(b, a), (a, b, k)


def test_plan_has_no_cartesian_product(spark):
    df = spark.createDataFrame(
        [(i, f"string number {i} with some length") for i in range(10)],
        "id: long, s: string",
    )
    plan = edit_distance_pairs(df, "id", "s", 4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
