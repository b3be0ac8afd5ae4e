"""containment_pairs: exact prefix-filter set-containment join.

Pins the three properties the operator's docstring claims:
1. the integer ceil/prefix-length arithmetic is exact (incl. the
   IEEE 0.8*5 trap),
2. the output EQUALS the quadratic all-pairs ground truth (100% recall
   from the pigeonhole prefix, precision from exact verification),
3. the asymmetric semantics: a short document embedded in a long one is
   found at containment ~1.0 even though its symmetric Jaccard is far
   below the MinHash pipeline's 0.5 threshold.
"""

from __future__ import annotations

import math
from fractions import Fraction

from stock_ops_spark.operators.dedup import containment_pairs


# ---------------------------------------------------------------------------
# 1. prefix arithmetic
# ---------------------------------------------------------------------------


def _ceil_int(num: int, den: int, z: int) -> int:
    return (num * z + den - 1) // den


def test_prefix_ceil_formula_exact():
    for num, den in [(4, 5), (1, 2), (9, 10), (1, 1), (7, 8), (2, 3)]:
        for z in range(1, 2001):
            exact = math.ceil(Fraction(num * z, den))
            assert _ceil_int(num, den, z) == exact, (num, den, z)


def test_prefix_ceil_ieee_trap():
    # the float path really does go wrong for some thresholds:
    # 9/11 * 77 = 63 exactly, but in IEEE doubles it lands at
    # 63.00000000000001 and ceil() returns 64.
    assert math.ceil(9 / 11 * 77) == 64  # the trap (why floats are banned)
    assert _ceil_int(9, 11, 77) == 63  # the exact path
    for num, den, z in [(9, 11, 77), (7, 12, 108), (9, 14, 42), (3, 17, 85)]:
        assert _ceil_int(num, den, z) == math.ceil(Fraction(num * z, den))


# ---------------------------------------------------------------------------
# shared shingle ground truth (mirrors functions/text.py::char_ngrams)
# ---------------------------------------------------------------------------


def _shingles(text: str, n: int = 8) -> set[str]:
    t = text.lower()
    if len(t) < n:
        return {t}
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def _brute_force(docs: dict[int, str], num: int, den: int, n: int = 8):
    out = {}
    ids = sorted(docs)
    sets = {i: _shingles(docs[i], n) for i in ids}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(sets[a] & sets[b])
            mn = min(len(sets[a]), len(sets[b]))
            if inter * den >= mn * num:
                out[(a, b)] = (inter, round(inter / mn, 6))
    return out


def _letters(seed: int, length: int) -> str:
    """Deterministic letter soup (LCG — no RNG state shared with Spark)."""
    s, state = [], seed * 2654435761 % (1 << 31)
    for _ in range(length):
        state = (state * 1103515245 + 12345) % (1 << 31)
        s.append(chr(ord("a") + state % 26))
    return "".join(s)


# ---------------------------------------------------------------------------
# 2. equals the quadratic ground truth
# ---------------------------------------------------------------------------


def test_matches_brute_force(spark):
    long_a = _letters(1, 600)
    long_b = _letters(2, 500)
    docs = {
        1: long_a,
        2: long_b,
        3: long_a[100:250],            # embedded in 1: containment 1.0
        4: long_b[:90] + _letters(3, 60),   # prefix overlap with 2 (partial)
        5: _letters(4, 200),           # unrelated
        6: long_a[50:130] + long_a[400:480],  # two windows of 1
        7: "tiny",                     # < n chars: whole-text shingle
        8: "tiny",                     # exact twin of 7
        9: _letters(5, 40),
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.containment)
        for r in containment_pairs(df, "doc_id", "text", 4, 5).collect()
    }
    assert got == _brute_force(docs, 4, 5)
    # sanity: the crafted structure actually exercised the interesting rows
    assert (1, 3) in got and got[(1, 3)][1] == 1.0
    assert (7, 8) in got


def test_matches_brute_force_other_threshold(spark):
    docs = {i: _letters(10 + i, 120 + 17 * i) for i in range(1, 8)}
    docs[8] = docs[1][:80] + docs[2][:40]  # mixed borrow
    docs[9] = docs[1][10:100]
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.containment)
        for r in containment_pairs(df, "doc_id", "text", 1, 2).collect()
    }
    assert got == _brute_force(docs, 1, 2)


# ---------------------------------------------------------------------------
# 3. asymmetric semantics: embedded doc invisible to symmetric Jaccard
# ---------------------------------------------------------------------------


def test_finds_embedded_doc_minhash_would_miss(spark):
    long_doc = _letters(42, 2000)
    short_doc = long_doc[700:900]  # fully contained slice
    sa, sb = _shingles(long_doc), _shingles(short_doc)
    jacc = len(sa & sb) / len(sa | sb)
    assert jacc < 0.5, "fixture must sit below the MinHash pipeline threshold"
    df = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, _letters(7, 800))],
        ["doc_id", "text"],
    )
    rows = containment_pairs(df, "doc_id", "text", 4, 5).collect()
    assert [(r.id_a, r.id_b, r.containment) for r in rows] == [(1, 2, 1.0)]


# ---------------------------------------------------------------------------
# 4. persisted artifact (fit-once-read-many)
# ---------------------------------------------------------------------------


def test_containment_cached_serves_artifact(spark, tmp_path, monkeypatch):
    """Second call must read the materialized pair artifact, not
    recompute the join; different params or a rewritten source must
    invalidate the key."""
    import stock_ops_spark.operators.dedup as D

    long_doc = _letters(42, 2000)
    docs = [(1, long_doc), (2, long_doc[700:900]), (3, _letters(7, 800))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "docs.parquet")
    df.write.parquet(src)
    cache = str(tmp_path / "models")
    first = {
        (r.id_a, r.id_b)
        for r in D.containment_pairs_cached(
            df, src, "doc_id", "text", 4, 5, cache_dir=cache
        ).collect()
    }
    assert first == {(1, 2)}

    def boom(*a, **kw):
        raise AssertionError("pipeline recomputed despite cached artifact")

    monkeypatch.setattr(D, "containment_pairs", boom)
    again = {
        (r.id_a, r.id_b)
        for r in D.containment_pairs_cached(
            df, src, "doc_id", "text", 4, 5, cache_dir=cache
        ).collect()
    }
    assert again == first
    import pytest as _pytest

    # different threshold -> different key -> must recompute
    with _pytest.raises(AssertionError, match="recomputed"):
        D.containment_pairs_cached(df, src, "doc_id", "text", 1, 2, cache_dir=cache)
    # rewritten source (new mtime/size) -> must recompute
    df.limit(2).write.mode("overwrite").parquet(src)
    with _pytest.raises(AssertionError, match="recomputed"):
        D.containment_pairs_cached(df, src, "doc_id", "text", 4, 5, cache_dir=cache)
