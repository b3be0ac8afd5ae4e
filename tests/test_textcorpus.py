"""JSONL corpus ingestion: quarantine-not-drop, contract defaults,
content-hash ids — driven through real files on disk."""

from __future__ import annotations

from pyspark.sql import types as T

from stock_ops_spark.sources.textcorpus import (
    DOCUMENTS_SCHEMA,
    ingest_documents,
    read_jsonl,
)

LINES = [
    '{"text": "hello world", "lang": "en", "source": "web"}',
    '{"text": "bonjour", "source": "web"}',              # lang absent → NULL
    '{"text": "hello world", "lang": "en", "source": "web"}',  # exact dup
    'not json at all {{{',                               # corrupt
    '{"lang": "en", "source": "web"}',                   # missing text
    '{"text": "truncated line, no close',                # corrupt
]


def _write(tmp_path, lines):
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_jsonl_splits_good_and_quarantine(spark, tmp_path):
    path = _write(tmp_path, LINES)
    r = read_jsonl(spark, path, DOCUMENTS_SCHEMA, required=["text"])
    good = r.good.collect()
    quar = r.quarantine.collect()
    assert len(good) == 3  # both dups and the lang-less row are good
    assert len(quar) == 3
    reasons = sorted(q["reason"] for q in quar)
    assert reasons == ["corrupt", "corrupt", "missing:text"]
    # corrupt rows keep the RAW line for replay
    raws = {q["raw"] for q in quar if q["reason"] == "corrupt"}
    assert "not json at all {{{" in raws
    # total accounting: nothing vanished
    assert len(good) + len(quar) == len(LINES)


def test_read_jsonl_without_required_keeps_nulls(spark, tmp_path):
    path = _write(tmp_path, LINES)
    r = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
    assert r.good.count() == 4  # missing-text row is good when not required
    assert r.quarantine.count() == 2


def test_ingest_documents_contract(spark, tmp_path):
    path = _write(tmp_path, LINES)
    r = ingest_documents(spark, path)
    rows = {row["text"]: row for row in r.good.collect()}
    assert set(r.good.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert rows["bonjour"]["lang"] == "und"  # defaulted, never NULL
    assert rows["hello world"]["n_chars"] == 11
    # content id: the two identical texts share a doc_id (dedup's job later)
    ids = [row["doc_id"] for row in r.good.collect() if row["text"] == "hello world"]
    assert len(ids) == 2 and ids[0] == ids[1]
    # schema types match the documents table contract
    got = {f.name: f.dataType for f in r.good.schema.fields}
    assert got["doc_id"] == T.LongType()
    assert got["n_chars"] == T.LongType()


def test_ingested_rows_flow_into_documents_operators(spark, tmp_path):
    """The whole point: a raw dump becomes queryable by the existing
    documents-table machinery (exact dedup via doc fingerprint)."""
    from pyspark.sql import functions as F

    path = _write(tmp_path, LINES)
    good = ingest_documents(spark, path).good
    deduped = good.dropDuplicates(["doc_id"])
    assert deduped.count() == 2
    stats = deduped.agg(F.sum("n_chars").alias("c")).collect()[0]["c"]
    assert stats == 11 + 7


def test_stream_jsonl_availablenow_accounting(spark, tmp_path):
    """Streaming twin: the same split over a watched directory, driven
    to completion with availableNow; per-batch accounting sums to the
    file totals (nothing vanishes across micro-batches)."""
    from stock_ops_spark.sources.textcorpus import stream_jsonl

    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(LINES[:3]) + "\n")
    (d / "b.jsonl").write_text("\n".join(LINES[3:]) + "\n")

    r = stream_jsonl(
        spark, str(d), DOCUMENTS_SCHEMA, required=["text"],
        max_files_per_trigger=1,
    )
    seen = {"good": 0, "quar": 0, "batches": 0}

    def sink(batch, _bid):
        # one foreachBatch writes both sides: re-split the batch lines
        seen["batches"] += 1
        seen["good"] += batch.count()

    qg = (
        r.good.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_g"))
        .trigger(availableNow=True)
        .start()
    )
    qg.awaitTermination(120)

    def qsink(batch, _bid):
        seen["quar"] += batch.count()

    qq = (
        r.quarantine.writeStream.foreachBatch(qsink)
        .option("checkpointLocation", str(tmp_path / "ckpt_q"))
        .trigger(availableNow=True)
        .start()
    )
    qq.awaitTermination(120)

    assert seen["good"] == 3
    assert seen["quar"] == 3
    assert seen["batches"] >= 2  # maxFilesPerTrigger=1 → one batch per file
