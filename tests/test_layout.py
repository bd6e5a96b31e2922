"""Z-order file layout: Morton codes + the data-skipping property the
layout exists for (per-file min/max extents shrink vs a hash layout)."""

import pytest
from pyspark.sql import functions as F

from grove_spark.operators.layout import zorder_layout, zorder_value


def test_zorder_value_bit_interleave(spark):
    df = spark.createDataFrame([(3, 5)], "x int, y int")
    # x=0b011 at even positions, y=0b101 at odd: z = 1*1 + 0*2? compute:
    # bits of x (j=0) land at 0,2,4; bits of y (j=1) at 1,3,5
    # x=3 -> bits 0,1 set -> z bits 0,2; y=5 -> bits 0,2 set -> z bits 1,5
    want = (1 << 0) | (1 << 2) | (1 << 1) | (1 << 5)
    got = df.select(zorder_value(["x", "y"], bits=3).alias("z")).first()["z"]
    assert got == want

    with pytest.raises(ValueError):
        zorder_value([], bits=4)


def test_zorder_layout_shrinks_file_extents(spark):
    """The point of the layout: with predicates on BOTH columns, pruning
    is bounded by the per-file area sum. Z-order must beat the unsorted
    hash layout by a wide margin on uniform 2-d data."""
    n = 20_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") * 2654435761 % 1000).alias("x"),
            (F.col("id") * 40503 % 1000).alias("y"),
        )
    )

    def area_sum(frame):
        per = (
            frame.groupBy(F.spark_partition_id().alias("p"))
            .agg(
                (F.max("x") - F.min("x")).alias("dx"),
                (F.max("y") - F.min("y")).alias("dy"),
            )
            .select(F.sum(F.col("dx") * F.col("dy")).alias("a"))
            .first()["a"]
        )
        return per

    base = area_sum(df.repartition(16, "x"))
    z = area_sum(zorder_layout(df, ["x", "y"], n_files=16, bits=10))
    assert z < base / 4, (z, base)

    out = zorder_layout(df, ["x", "y"], n_files=16, bits=10)
    assert out.rdd.getNumPartitions() == 16
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_zorder_layout_constant_column_ok(spark):
    df = spark.range(100).select(F.lit(7).alias("x"), F.col("id").alias("y"))
    out = zorder_layout(df, ["x", "y"], n_files=4, bits=8)
    assert out.count() == 100
