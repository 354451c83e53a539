from __future__ import annotations

import glob

from pyspark.sql import functions as F

from lakeforge.io.sinks import (
    export_csv,
    export_parquet,
    write_partitioned_parquet,
)
from lakeforge.io.sources import read_parquet_if_exists


def test_partitioned_write_roundtrip_and_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [("202201", "a", 1), ("202201", "b", 2), ("202202", "c", 3)],
        ["p_ym", "k", "v"],
    )
    out = str(tmp_path / "t")
    write_partitioned_parquet(df, out, partition_cols=["p_ym"])

    # Hive layout: one directory per partition value, one file each
    # (repartition by partition col => single writer per partition).
    for ym in ("202201", "202202"):
        files = glob.glob(f"{out}/p_ym={ym}/part-*.parquet")
        assert len(files) == 1, files

    back = spark.read.parquet(out)
    got = {(r["p_ym"], r["k"], r["v"]) for r in back.collect()}
    # partition col round-trips (type inference may widen; compare as str)
    assert {(str(a), b, c) for a, b, c in got} == {
        ("202201", "a", 1), ("202201", "b", 2), ("202202", "c", 3)
    }


def test_dynamic_partition_overwrite_rewrites_only_touched(spark, tmp_path):
    out = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("202201", 1), ("202202", 2)], ["p_ym", "v"]
    )
    write_partitioned_parquet(base, out, partition_cols=["p_ym"])

    # Overwrite only the 202202 partition; 202201 must survive.
    patch = spark.createDataFrame([("202202", 99)], ["p_ym", "v"])
    write_partitioned_parquet(patch, out, partition_cols=["p_ym"])

    got = {(str(r["p_ym"]), r["v"]) for r in spark.read.parquet(out).collect()}
    assert got == {("202201", 1), ("202202", 99)}


def test_export_csv_single_file_with_header(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "name"])
    out = str(tmp_path / "csv")
    export_csv(df, out, single_file=True)
    files = glob.glob(f"{out}/part-*.csv")
    assert len(files) == 1
    lines = open(files[0]).read().strip().splitlines()
    assert lines[0] == "id,name"
    assert sorted(lines[1:]) == ["1,x", "2,y"]


def test_export_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5)], ["id", "val"])
    out = str(tmp_path / "pq")
    export_parquet(df, out)
    assert spark.read.parquet(out).collect() == df.collect()


def test_read_parquet_if_exists_missing_path(spark, tmp_path):
    assert read_parquet_if_exists(spark, str(tmp_path / "nope")) is None
