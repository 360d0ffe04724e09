from __future__ import annotations

from pyspark.sql import functions as F

from tsp_spark.ops.skew import salted_agg


def test_salted_agg_matches_plain(spark):
    # one hot key (90% of rows) + long tail
    rows = [(1 if i % 10 else i, float(i % 100)) for i in range(5000)]
    df = spark.createDataFrame(rows, "k int, v double")
    got = {
        r["k"]: (r["n"], r["tot"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "tot": ("sum", F.sum("v")),
                "mx": ("max", F.max("v")),
            },
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["tot"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("tot"), F.max("v").alias("mx"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6
        assert got[k][2] == want[k][2]
