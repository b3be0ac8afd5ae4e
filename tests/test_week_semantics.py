"""ADVICE r5 (q222): 'weeks old' must be calendar-agnostic elapsed
weeks — floor(days/7) — on BOTH the Spark side and the DuckDB oracle.

DuckDB's date_diff('week', a, b) counts ISO-Monday boundary crossings
(Sat->Mon is 1 'week' though only 2 days elapsed), which coincides
with floor(days/7) only when the anchor lands on a Sunday — true of
all three driver fixtures by accident.  The q222 oracle now spells out
floor(date_diff('day',...)/7.0); this test pins the equivalence on a
NON-Sunday anchor so a fixture regeneration with a different max
shipdate weekday cannot silently split the twins again.
"""
from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def _weeks_spark(spark, anchor: str, dates: list[str]) -> dict[str, int]:
    df = spark.createDataFrame([(d,) for d in dates], "d string").select(
        F.col("d").cast("date").alias("d")
    )
    out = df.select(
        "d",
        F.least(
            F.floor(
                F.datediff(F.lit(anchor).cast("date"), F.col("d")) / 7
            ).cast("int"),
            F.lit(30),
        ).alias("w"),
    ).collect()
    return {str(r["d"]): r["w"] for r in out}


def _weeks_duckdb(anchor: str, dates: list[str]) -> dict[str, int]:
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT d, least(CAST(floor(
                   date_diff('day', d, CAST(? AS DATE)) / 7.0) AS BIGINT), 30)
        FROM (SELECT unnest(?) :: DATE AS d)
        """,
        [anchor, dates],
    ).fetchall()
    return {str(r[0]): int(r[1]) for r in rows}


def test_elapsed_weeks_match_on_non_sunday_anchor(spark):
    # 1998-12-01 is a Tuesday — the case where date_diff('week',...)
    # diverges from floor(days/7) (e.g. Sat 1998-11-28 -> Tue: 3 days
    # elapsed = 0 weeks, but one Monday boundary crossed = 1 "week").
    anchor = "1998-12-01"
    dates = [
        "1998-11-28",  # Sat, 3 days  -> 0 weeks
        "1998-11-30",  # Mon, 1 day   -> 0 weeks
        "1998-11-24",  # Tue, 7 days  -> 1 week
        "1998-11-23",  # Mon, 8 days  -> 1 week
        "1998-06-01",
        "1997-01-15",  # far past -> clamped at 30
    ]
    s = _weeks_spark(spark, anchor, dates)
    d = _weeks_duckdb(anchor, dates)
    assert s == d
    assert s["1998-11-28"] == 0  # the Sat->Tue case ISO-week counting gets wrong
    assert s["1998-11-24"] == 1
    assert s["1997-01-15"] == 30


def test_iso_week_counting_would_have_diverged():
    """Documents WHY the oracle changed: DuckDB's week date_diff is a
    boundary count, not elapsed weeks — the exact trap the ADVICE
    flagged."""
    con = duckdb.connect()
    iso, elapsed = con.execute(
        """
        SELECT date_diff('week', DATE '1998-11-28', DATE '1998-12-01'),
               CAST(floor(date_diff('day', DATE '1998-11-28',
                                    DATE '1998-12-01') / 7.0) AS BIGINT)
        """
    ).fetchone()
    assert iso == 1 and elapsed == 0
