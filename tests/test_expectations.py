"""plans/expectations.py: the single-pass data-quality suite.

q262 oracle-verifies the clean-table report end-to-end; these tests
prove violations are actually DETECTED (a dirty frame), the report's
single-aggregation-pass compilation (plan shape), denominators, and
suite validation.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_ops_spark.plans.expectations import (
    ExpectationSuite,
    ForeignKey,
    Unique,
    accepted_values,
    in_range,
    matches_regex,
    non_negative,
    not_null,
)


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0, "ok-1"),
            (2, None, -5.0, "ok-2"),   # null key, negative amount
            (2, "B", 20.0, "bad"),     # dup id, bad code format
            (3, "Z", None, "ok-3"),    # unaccepted status, null amount
        ],
        "id long, status string, amount double, code string",
    )


def test_violations_detected(spark, dirty):
    ref = spark.createDataFrame([(1,), (2,)], "k long")
    suite = ExpectationSuite(
        [
            not_null("status"),
            Unique("id"),
            non_negative("amount"),
            accepted_values("status", ["A", "B"]),
            matches_regex("code", "^ok-"),
            in_range("amount", 0.0, 15.0),
            ForeignKey("id", ref=ref, ref_col="k"),
        ]
    )
    rep = {r["check_name"]: r for r in suite.report(dirty).collect()}
    assert rep["not_null(status)"]["n_violations"] == 1
    assert rep["unique(id)"]["n_violations"] == 1
    # nulls count as violations for value checks (paired with not_null)
    assert rep["non_negative(amount)"]["n_violations"] == 2
    assert rep["accepted_values(status)"]["n_violations"] == 2  # None + Z
    assert rep["matches_regex(code)"]["n_violations"] == 1
    assert rep["in_range(amount)"]["n_violations"] == 3  # -5, 20, None
    assert rep["foreign_key(id)"]["n_violations"] == 1  # id=3
    assert rep["foreign_key(id)"]["n_checked"] == 4
    assert all(not r["passed"] for r in rep.values())
    assert all(r["n_checked"] == 4 for r in rep.values())


def test_clean_frame_passes(spark):
    df = spark.createDataFrame(
        [(1, "A", 1.0, "ok-1"), (2, "B", 2.0, "ok-2")],
        "id long, status string, amount double, code string",
    )
    suite = ExpectationSuite(
        [not_null("status"), Unique("id"), non_negative("amount")]
    )
    rows = suite.report(df).collect()
    assert all(r["passed"] for r in rows)
    assert [r["check_name"] for r in rows] == sorted(
        r["check_name"] for r in rows
    )


def test_single_pass_plan(spark, dirty):
    """All row checks + uniqueness must compile to ONE aggregation over
    ONE scan of the table (the 100 TB property): no joins, and exactly
    one scan source in the plan."""
    from stock_ops_spark.plans import audit as A

    suite = ExpectationSuite(
        [
            not_null("status"),
            Unique("id"),
            non_negative("amount"),
            accepted_values("status", ["A", "B"]),
            matches_regex("code", "^ok-"),
        ]
    )
    df = suite.report(dirty)
    assert A.join_types(df) == []
    plan = A.plan_string(df)
    assert plan.count("LocalTableScan") <= 1 or plan.count("Scan") <= 1


def test_suite_validation(spark):
    with pytest.raises(ValueError):
        ExpectationSuite([not_null("a"), not_null("a")])
    with pytest.raises(TypeError):
        ExpectationSuite([not_null("a"), "bogus"])


def test_stream_report_history(spark, tmp_path):
    """Per-micro-batch QA history: two bursts (one clean, one dirty)
    stream through stream_report; the history carries one row per
    check per batch, and the dirty batch's violations land in its own
    batch_id rows."""
    import json as _json

    from stock_ops_spark.plans.expectations import (
        ExpectationSuite,
        non_negative,
        not_null,
        stream_report,
    )

    src = tmp_path / "src"
    src.mkdir()
    clean = [{"id": 1, "amount": 5.0}, {"id": 2, "amount": 7.0}]
    dirty = [{"id": 3, "amount": -1.0}, {"id": None, "amount": 2.0}]
    for i, rows in enumerate([clean, dirty]):
        with open(src / f"b{i}.json", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("id long, amount double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    suite = ExpectationSuite([not_null("id"), non_negative("amount")])
    q = stream_report(
        stream,
        suite,
        history_path=str(tmp_path / "history"),
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    hist = spark.read.parquet(str(tmp_path / "history"))
    rows = hist.collect()
    assert len(rows) == 4  # 2 checks x 2 batches
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], {})[r["check_name"]] = r
    batches = sorted(by_batch)
    assert len(batches) == 2
    per_batch_viol = {
        b: sum(r["n_violations"] for r in by_batch[b].values())
        for b in batches
    }
    assert sorted(per_batch_viol.values()) == [0, 2]  # clean + dirty burst


def test_fk_only_suite_reports(spark):
    """An FK-only suite has no stack() cells — the report must still be
    well-formed SQL (stack(0, ) was the malformed shape)."""
    df = spark.createDataFrame([(1, 10), (2, 99)], "id int, ref_id int")
    ref = spark.createDataFrame([(10,)], "id int")
    suite = ExpectationSuite([ForeignKey("ref_id", ref)])
    rows = {r["check_name"]: r for r in suite.report(df).collect()}
    assert rows["foreign_key(ref_id)"]["n_violations"] == 1
    assert rows["foreign_key(ref_id)"]["n_checked"] == 2
    assert not rows["foreign_key(ref_id)"]["passed"]


def test_empty_suite_rejected():
    with pytest.raises(ValueError, match="at least one check"):
        ExpectationSuite([])
