"""Multi-seed fuzz sweep: run the tests/test_fuzz_oracle.py pattern
corpus against the pure-Python reference oracle on FRESH random series,
several seeds per invocation.

The pinned-seed pytest run is the regression gate; this sweep is the
exploration probe — a 7-seed sweep on 2026-08-13 surfaced the
SegmentizerPattern equal-value bridge (absent indices sandwiched
between equal lag emissions inherit the value, Patterns.scala:123)
that the pinned seed never exercised.

Usage: python tools/fuzz_sweep.py [seed ...]   (default: 3 seeds)
Exit code 1 on any divergence.
"""

from __future__ import annotations

import datetime as dt
import random
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    import test_fuzz_oracle as T
    from tsp_spark.api import RawPattern, search_incidents

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    seeds = [int(s) for s in sys.argv[1:]] or [7, 99, 424242]
    bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        cases = {cid: T.gen_series(rng, rng.randint(3, 60)) for cid in range(40)}
        rows = [
            (cid, T.EPOCH + dt.timedelta(milliseconds=ms), r["v"], r["w"], r["u"])
            for cid, series in cases.items()
            for ms, r in series
        ]
        df = spark.createDataFrame(
            rows, "series_id int, ts timestamp, v double, w double, u double"
        ).cache()
        df.count()
        base_ms = int(T.EPOCH.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        for pattern in T.PATTERNS:
            want = T.oracle_incidents(cases, pattern)
            if want is None:
                continue
            got: dict[int, list[tuple[int, int]]] = {cid: [] for cid in cases}
            out = search_incidents(
                df,
                [RawPattern(1, pattern)],
                ["series_id"],
                "ts",
                fields_types=T.FIELDS,
                max_gap_ms=T.GAP_MS,
                session_gap_ms=T.SESSION_MS,
            ).collect()
            for r in out:
                got[r["series_id"]].append(
                    (
                        int(
                            r["from_ts"].replace(tzinfo=dt.timezone.utc).timestamp()
                            * 1000
                        ),
                        int(
                            r["to_ts"].replace(tzinfo=dt.timezone.utc).timestamp()
                            * 1000
                        ),
                    )
                )
            for cid in cases:
                g = sorted((f - base_ms, t - base_ms) for f, t in got[cid])
                o = sorted(want[cid])
                if g != o:
                    bad += 1
                    print(f"DIVERGE seed={seed} case={cid} pat={pattern!r}")
                    print(f"  engine={g}")
                    print(f"  oracle={o}")
        df.unpersist()
        print(f"seed {seed}: done")
    print("TOTAL DIVERGENCES:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
