"""sf10 soak for the worst sf1 scalers (VERDICT r10 item 7).

dedup_simhash (5.9×), text_top_tokens (4.4×) and dedup_jaccard (3.5×)
were output-growth-explained at sf1 — this proves the explanation
holds another decade of scale: generate sf10 DOCUMENTS ONLY
(tools/gen_sf.py `tables=` filter — 500k docs; the other tables would
cost 60M lineitem rows for nothing), run the three legs at sf1 and
sf10 from the same generator, and report wall clock, output rows, and
OUTPUT-NORMALIZED per-row cost (sec / output row). The pass bar is
per-output-row cost flat or falling across the decade — that is what
"the growth is the answer getting bigger, not the engine slowing
down" means.

Usage: python tools/soak_sf10.py            (~10 min incl. generation)
Writes one JSON line to stdout; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LEGS = ["dedup_simhash", "text_top_tokens", "dedup_jaccard", "c4_full_clean"]

# The dedup_simhash QUERY pins bits=32 / bands=4 (8-bit band values,
# 256 per band) for oracle parity — structurally too narrow past
# ~100k docs: 500k docs x 4 bands over 1,024 buckets floods the 10k
# bucket guard on a Zipf corpus, and the guard fail-fasts BY DESIGN
# (first soak run confirmed: "bucket 0,1125 holds more than 10000
# rows"). Band-value space must grow with corpus size — bits=48 gives
# 12-bit bands (4,096 values each), the right width for this decade.
# The soak therefore drives the OPERATOR at bits=48 at BOTH scales so
# the per-output-row cost comparison is like-for-like.
SIMHASH_SOAK_BITS = 48


def main() -> None:
    from pyspark.sql import SparkSession

    from tools.gen_sf import ensure
    from tsp_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = Path(__file__).resolve().parent.parent / ".localdata"
    d1 = ensure(1.0, str(base / "sf1"))
    # documents-only generation: the three legs read nothing else
    d10 = ensure(10.0, str(base / "sf10docs"), tables={"documents"})

    def simhash48(spark, d):
        from pyspark.sql import functions as F

        from tsp_spark.pipeline.dedup import simhash_pairs

        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )
        return simhash_pairs(
            docs, "text", "doc_id", bits=SIMHASH_SOAK_BITS, bands=4
        )

    def c4s_leg(spark, d):
        # r12 (VERDICT r11 Next #7): the sentence-span/C4 path rides the
        # token-span plan that soaked green, but sentence grams have
        # different length/cardinality distributions — soak it directly.
        from tsp_spark.pipeline.text import c4_full_clean

        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )
        return c4_full_clean(docs, "text", "doc_id")

    legs = [a for a in sys.argv[1:] if a in LEGS] or LEGS
    out: dict = {}
    for name in legs:
        fn = {
            "dedup_simhash": simhash48, "c4_full_clean": c4s_leg,
        }.get(name, QUERIES.get(name))
        row = {}
        guarded = False
        for tag, d in (("sf1", d1), ("sf10", d10)):
            best, n = float("inf"), 0
            reps = 2 if tag == "sf1" else 1
            try:
                for _ in range(reps):
                    t0 = time.perf_counter()
                    n = fn(spark, d).count()
                    best = min(best, time.perf_counter() - t0)
            except Exception as e:  # the bucket fail-fast guard
                row[f"{tag}_guard"] = str(e).split("SQLSTATE")[0][-300:]
                guarded = True
                continue
            row[f"{tag}_sec"] = round(best, 3)
            row[f"{tag}_rows"] = n
            row[f"{tag}_us_per_out_row"] = (
                round(best / n * 1e6, 2) if n else None
            )
        if not guarded:
            row["scale_x"] = round(row["sf10_sec"] / row["sf1_sec"], 2)
            row["rows_x"] = (
                round(row["sf10_rows"] / row["sf1_rows"], 2)
                if row["sf1_rows"]
                else None
            )
            row["per_row_cost_x"] = (
                round(
                    row["sf10_us_per_out_row"] / row["sf1_us_per_out_row"],
                    2,
                )
                if row["sf1_us_per_out_row"] and row["sf10_us_per_out_row"]
                else None
            )
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
