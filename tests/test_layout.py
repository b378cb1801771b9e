"""Z-order layout (operators/layout.py): Morton key correctness and the
measured file-pruning advantage over an unclustered layout."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators import layout as L
from fs2_kinesis_firehose_spark.tables import load_table


def test_morton_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3)], "x long, y long")
    out = df.select(
        "x", "y", L.morton_key([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()
    got = {(r["x"], r["y"]): r["z"] for r in out}
    # bit b of col i → position b*2+i: (1,0)→1, (0,1)→2, (3,3)→15
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 3): 15}


def test_morton_key_rejects_long_overflow(spark):
    import pytest

    with pytest.raises(ValueError):
        L.morton_key([F.col("a"), F.col("b")], bits=32)


def test_zorder_write_prunes_multidim_box(spark, sf_oracle):
    """The measured claim: a 2-D range predicate over a Z-ordered layout
    opens a fraction of the files an unclustered write needs."""
    orders = load_table(spark, sf_oracle, "orders").withColumn(
        "o_day", F.datediff("o_orderdate", F.lit("1995-01-01"))
    )
    n_files = 16
    with tempfile.TemporaryDirectory() as tmp:
        zpath, rpath = f"{tmp}/zorder", f"{tmp}/random"
        L.zorder_write(orders, zpath, ["o_custkey", "o_day"], n_files=n_files)
        orders.repartition(n_files).write.parquet(rpath)

        cols = ["o_custkey", "o_day"]
        zstats = L.file_stats(zpath, cols)
        rstats = L.file_stats(rpath, cols)
        assert len(zstats) == n_files

        # a central box covering ~1/16 of each dimension
        ck_hi = orders.agg(F.max("o_custkey")).collect()[0][0]
        day_hi = orders.agg(F.max("o_day")).collect()[0][0]
        box = {
            "o_custkey": (ck_hi // 2, ck_hi // 2 + ck_hi // 16),
            "o_day": (day_hi // 2, day_hi // 2 + day_hi // 16),
        }
        z_open = L.files_overlapping_box(zstats, box)
        r_open = L.files_overlapping_box(rstats, box)
        # unclustered: every file spans the whole domain → zero pruning
        assert r_open == len(rstats)
        # z-ordered: the box hits a strict minority of files
        assert z_open <= len(zstats) // 2, (z_open, len(zstats))

        # and the data still round-trips completely
        assert spark.read.parquet(zpath).count() == orders.count()


def test_zorder_explicit_bounds_skip_extra_aggregate(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        L.zorder_write(
            orders,
            f"{tmp}/z",
            ["o_custkey", "o_totalprice"],
            n_files=4,
            bounds={"o_custkey": (0, 20000), "o_totalprice": (0.0, 600000.0)},
        )
        assert spark.read.parquet(f"{tmp}/z").count() == orders.count()
