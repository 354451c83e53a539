"""Ingestion robustness: corrupt-record capture and schema evolution —
the two failure modes every production ingest hits (SURVEY §2.1 scans are
schema-ENFORCED; these tests pin what happens when reality disagrees)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_permissive_json_captures_corrupt_records(spark, tmp_path):
    """PERMISSIVE mode: bad lines land in the corrupt-record column
    instead of failing the job (dead-letter at parse time); good rows
    parse normally; DROPMALFORMED silently drops the bad ones."""
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "v": 10}\n'
        "{this is not json}\n"
        '{"id": 2, "v": 20}\n'
        '{"id": "NaN-ish", "v": 30}\n'  # type mismatch -> corrupt too
    )
    schema = "id bigint, v bigint, _bad string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(str(p))
    )
    rows = df.collect()
    good = [(r["id"], r["v"]) for r in rows if r["_bad"] is None]
    bad = [r["_bad"] for r in rows if r["_bad"] is not None]
    assert sorted(good) == [(1, 10), (2, 20)]
    assert len(bad) == 2 and any("not json" in b for b in bad)

    dropped = (
        spark.read.schema("id bigint, v bigint")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    # DROPMALFORMED drops the syntactically-broken line AND (on full
    # materialization) the type-mismatched one.  Note count()-only plans
    # may report a higher number (no field parse) — always validate
    # DROPMALFORMED ingests on materialized columns, not count().
    got = sorted((r["id"], r["v"]) for r in dropped.collect())
    assert got == [(1, 10), (2, 20)]


def test_parquet_merge_schema_unions_columns(spark, tmp_path):
    """Schema evolution on read: files written before/after a column was
    added read as ONE frame under mergeSchema, old rows NULL-filled —
    no rewrite of historical data."""
    old = spark.createDataFrame([(1, "a")], ["id", "name"])
    new = spark.createDataFrame([(2, "b", 99)], ["id", "name", "score"])
    old.write.parquet(str(tmp_path / "t" / "batch=1"))
    new.write.parquet(str(tmp_path / "t" / "batch=2"))

    merged = (
        spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    )
    assert set(merged.columns) >= {"id", "name", "score"}
    got = {r["id"]: r["score"] for r in merged.collect()}
    assert got[1] is None and got[2] == 99
