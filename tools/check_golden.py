"""Golden parity check against the reference's integration fixtures.

Runs the reference's pattern corpus over the vendored fixture tables
and compares incident counts + (from, to) second-level timestamps with
the golden outputs (ε = 1e-4 like SimpleCasesTest.scala:436-444).

Usage: python tools/check_golden.py [core|ivolga|narrow|ivolga_narrow] [pattern_id ...]
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIX = REPO / "tests" / "fixtures"

from pyspark.sql import functions as F  # noqa: E402

from tsp_spark.api import RawPattern  # noqa: E402
from tsp_spark.compile.compiler import PatternCompiler  # noqa: E402
from tsp_spark.dsl.parser import parse_pattern  # noqa: E402
from tsp_spark.ops.reshape import unfold_narrow  # noqa: E402
from tsp_spark.ops.sessionize import sessionize_intervals  # noqa: E402
from tsp_spark.session import get_spark  # noqa: E402

WIDE_SENSORS = ["POilDieselOut", "SpeedThrustMin", "PowerPolling"]
IVOLGA_SENSORS = [
    "car_2_TCU_out_E_Bog", "car_2_BCU_out_Indirect_Brake_Active",
    "car_4_TCU_out_E_Bog", "car_4_BCU_out_Indirect_Brake_Active",
    "PSN_1_HV_OUTPUT_VOLTAGE", "PSN_1_is_working", "PSN_1_HV_INPUT_VOLTAGE",
    "PSN_1_CHARGER_CHARGER_CURRENT", "SOC_2_UKV1_UOVS", "ABKM_Brake_Pos",
    "ABKM_Brake_Fail",
]


def load_wide(spark):
    schema = (
        "ts double, upload_id string, loco_num int, section string, "
        "POilDieselOut float, SpeedThrustMin float, PowerPolling float"
    )
    df = spark.read.csv(str(FIX / "cases-wide-new.csv"), header=True, schema=schema)
    keys = ["loco_num", "section", "upload_id"]
    fields = {s: "float64" for s in WIDE_SENSORS}
    return df.withColumn("ts", F.timestamp_millis((F.col("ts") * 1000).cast("long"))), keys, fields


def load_narrow(spark):
    schema = (
        "dt double, sensor_id string, value_float float, loco_num int, "
        "section string, upload_id string"
    )
    df = spark.read.csv(str(FIX / "cases-narrow-new.csv"), header=True, schema=schema, nullValue="\\N")
    df = df.withColumn("ts", F.timestamp_millis((F.col("dt") * 1000).cast("long")))
    keys = ["loco_num", "section", "upload_id"]
    wide = unfold_narrow(
        df, keys, "ts", "sensor_id", "value_float", WIDE_SENSORS,
        default_timeout_ms=1000,
    )
    fields = {s: "float64" for s in WIDE_SENSORS}
    return wide, keys, fields


def load_ivolga_wide(spark):
    cols = ", ".join(
        f"{c} float" if c != "SOC_2_UKV1_UOVS" else f"{c} string" for c in IVOLGA_SENSORS
    )
    schema = f"ts double, upload_id string, stock_num int, {cols}"
    df = spark.read.csv(
        str(FIX / "cases-wide-ivolga.csv"), header=True, schema=schema, nullValue="\\N"
    )
    df = df.withColumn("ts", F.timestamp_millis((F.col("ts") * 1000).cast("long")))
    keys = ["stock_num", "upload_id"]
    from tsp_spark.ops.fill import forward_fill

    df = forward_fill(df, keys, "ts", IVOLGA_SENSORS, default_timeout_ms=15000)
    fields = {
        c: ("string" if c == "SOC_2_UKV1_UOVS" else "float64") for c in IVOLGA_SENSORS
    }
    return df, keys, fields


def load_ivolga_narrow(spark):
    schema = (
        "dt double, sensor_id string, value_float float, stock_num int, "
        "value_str string, upload_id string"
    )
    df = spark.read.csv(
        str(FIX / "cases-narrow-ivolga.csv"), header=True, schema=schema, nullValue="\\N"
    )
    df = df.withColumn("ts", F.timestamp_millis((F.col("dt") * 1000).cast("long")))
    keys = ["stock_num", "upload_id"]
    wide = unfold_narrow(
        df, keys, "ts", "sensor_id", "value_float", IVOLGA_SENSORS,
        value_col_mapping={"value_str": ["SOC_2_UKV1_UOVS"]},
        default_timeout_ms=15000,
    )
    fields = {
        c: ("string" if c == "SOC_2_UKV1_UOVS" else "float64") for c in IVOLGA_SENSORS
    }
    return wide, keys, fields


CONFIGS = {
    "core": (load_wide, "core"),
    "narrow": (load_narrow, "core"),
    "ivolga": (load_ivolga_wide, "ivolga"),
    "ivolga_narrow": (load_ivolga_narrow, "ivolga"),
}


def golden(corpus: str):
    pats = json.loads((FIX / "simple_cases" / corpus / "patterns.json").read_text())
    counts = {
        int(k): int(v)
        for k, v in json.loads(
            (FIX / "simple_cases" / corpus / "incidents.json").read_text()
        ).items()
    }
    ivs: dict[int, list[tuple[float, float]]] = {}
    with open(FIX / "simple_cases" / corpus / "timestamps.csv") as f:
        for row in csv.reader(f):
            if not row or not row[0].strip():
                continue
            pid, fr, to = int(row[0]), float(row[1]), float(row[2])
            ivs.setdefault(pid, []).append((fr, to))
    return pats, counts, ivs


def run(config: str, only: set[int]) -> int:
    loader, corpus = CONFIGS[config]
    spark = get_spark("golden_check", master="local[4]", shuffle_partitions=4)
    df, keys, fields = loader(spark)
    df = df.cache()
    df.count()
    pats, counts, ivs = golden(corpus)

    failures = 0
    ts_devs = 0
    for p in pats:
        pid = int(p["id"])
        if only and pid not in only:
            continue
        src = p["sourceCode"]
        try:
            node = parse_pattern(src, fields, tolerance_fraction=0.0)
            compiler = PatternCompiler(keys, "ts", fields, max_gap_ms=60_000)
            iv = compiler.compile_intervals(df, node)
            merged = sessionize_intervals(iv, keys, gap_ms=1_000)
            got = sorted(
                (r["from_ts"].timestamp(), r["to_ts"].timestamp())
                for r in merged.collect()
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {pid}: error: {type(e).__name__}: {e} [{src}]")
            failures += 1
            continue
        want = sorted(ivs.get(pid, []))
        want_n = counts.get(pid)
        ok_n = want_n is None or len(got) == want_n
        ok_iv = len(got) == len(want) and all(
            abs(g[0] - w[0]) < 1e-4 and abs(g[1] - w[1]) < 1e-4
            for g, w in zip(got, want)
        )
        if ok_n and ok_iv:
            print(f"PASS {pid} ({len(got)} incidents) [{src}]")
        elif ok_n:
            # The reference only soft-asserts timestamps
            # (SimpleCasesTest.scala:436-444 alertByQuery catches the
            # failure and asserts true) — count parity is the hard gate.
            ts_devs += 1
            print(f"TSDEV {pid}: counts match ({len(got)}), timestamps differ [{src}]")
            print(f"  got : {got}")
            print(f"  want: {want}")
        else:
            failures += 1
            print(f"FAIL {pid}: got {len(got)} want {want_n} [{src}]")
            print(f"  got : {got}")
            print(f"  want: {want}")
    print(f"\n{failures} count failures, {ts_devs} timestamp-only deviations ({config})")
    return failures


if __name__ == "__main__":
    config = sys.argv[1] if len(sys.argv) > 1 else "core"
    only = {int(x) for x in sys.argv[2:]}
    raise SystemExit(1 if run(config, only) else 0)
