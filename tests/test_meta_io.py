"""operators/meta_io.py — driver-side KB-metadata parquet I/O.

Pins the contract the index lifecycles (pq model row, minhash meta row)
rely on: bit-exact double roundtrip, interop with Spark-written files in
BOTH directions, zero Spark jobs for the metadata leg, and save-mode
semantics mirroring Spark's.
"""

import math
import os

import pyarrow as pa
import pytest

from fs2_kinesis_firehose_spark.operators import meta_io


def _schema():
    return pa.schema(
        [
            ("m", pa.int32()),
            ("name", pa.string()),
            ("vals", pa.list_(pa.float64())),
        ]
    )


ROW = {"m": 7, "name": "idx", "vals": [0.1, 1.0 / 3.0, math.pi, -0.0]}


def test_roundtrip_bit_exact(tmp_path):
    path = str(tmp_path / "meta")
    table = pa.Table.from_pylist([ROW], schema=_schema())
    assert meta_io.write_meta_rows(path, table)
    [back] = meta_io.read_meta_rows(path, schema=_schema())
    assert back["m"] == 7 and back["name"] == "idx"
    # doubles must round-trip bit-for-bit (parquet DOUBLE is exact)
    assert [x.hex() for x in back["vals"]] == [x.hex() for x in ROW["vals"]]


def test_spark_reads_pyarrow_written_dir(spark, tmp_path):
    path = str(tmp_path / "meta")
    meta_io.write_meta_rows(path, pa.Table.from_pylist([ROW], schema=_schema()))
    [r] = (
        spark.read.schema("m INT, name STRING, vals ARRAY<DOUBLE>")
        .parquet(path)
        .collect()
    )
    assert r["m"] == 7 and r["name"] == "idx"
    assert [x.hex() for x in r["vals"]] == [x.hex() for x in ROW["vals"]]


def test_meta_io_reads_spark_written_dir(spark, tmp_path):
    path = str(tmp_path / "meta")
    spark.createDataFrame(
        [(7, "idx", ROW["vals"])], "m INT, name STRING, vals ARRAY<DOUBLE>"
    ).coalesce(1).write.parquet(path)
    [back] = meta_io.read_meta_rows(path, schema=_schema())
    assert back["m"] == 7
    assert [x.hex() for x in back["vals"]] == [x.hex() for x in ROW["vals"]]


def test_metadata_read_runs_zero_spark_jobs(spark, tmp_path):
    """The point of the module: reloading an index's model/meta row must
    not cost a Spark job round-trip.  ``read_pq_index``'s model leg and
    ``read_minhash_index``'s meta leg both go through ``read_meta_rows``;
    this pins the primitive itself."""
    path = str(tmp_path / "meta")
    meta_io.write_meta_rows(path, pa.Table.from_pylist([ROW], schema=_schema()))
    sc = spark.sparkContext
    group = "meta-io-zero-jobs-pin"
    sc.setJobGroup(group, "meta_io job-count pin")
    try:
        meta_io.write_meta_rows(
            path, pa.Table.from_pylist([ROW], schema=_schema()), mode="overwrite"
        )
        meta_io.read_meta_rows(path, schema=_schema())
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert not jobs, f"metadata write/read submitted Spark jobs: {jobs}"


def test_overwrite_replaces_and_error_mode_raises(tmp_path):
    path = str(tmp_path / "meta")
    t1 = pa.Table.from_pylist([ROW], schema=_schema())
    t2 = pa.Table.from_pylist([{**ROW, "m": 8}], schema=_schema())
    meta_io.write_meta_rows(path, t1)
    meta_io.write_meta_rows(path, t2, mode="overwrite")
    [back] = meta_io.read_meta_rows(path, schema=_schema())
    assert back["m"] == 8  # fully replaced, not appended
    with pytest.raises(FileExistsError):
        meta_io.write_meta_rows(path, t1, mode="error")


def test_unhandled_modes_and_remote_paths_fall_back(tmp_path):
    t = pa.Table.from_pylist([ROW], schema=_schema())
    # append keeps Spark's exact semantics — not re-implemented here
    assert not meta_io.write_meta_rows(str(tmp_path / "x"), t, mode="append")
    assert not (tmp_path / "x").exists()
    assert not meta_io.write_meta_rows("s3://bucket/path", t)
    assert meta_io.read_meta_rows("hdfs://nn/path") is None
    assert meta_io.local_fs_path("file:/tmp/x") == "/tmp/x"
    assert meta_io.local_fs_path("s3a://b/k") is None


def test_multi_file_dir_concatenates(tmp_path):
    import pyarrow.parquet as pq

    path = tmp_path / "meta"
    path.mkdir()
    for i, name in enumerate(["part-00000.parquet", "part-00001.parquet"]):
        pq.write_table(
            pa.Table.from_pylist([{**ROW, "m": i}], schema=_schema()),
            str(path / name),
        )
    # non-parquet markers (Spark's _SUCCESS) are ignored
    (path / "_SUCCESS").write_text("")
    rows = meta_io.read_meta_rows(str(path), schema=_schema())
    assert [r["m"] for r in rows] == [0, 1]


def test_empty_dir_raises(tmp_path):
    path = tmp_path / "meta"
    path.mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        meta_io.read_meta_rows(str(path))
