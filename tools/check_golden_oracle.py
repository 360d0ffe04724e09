"""Golden parity check for the pure-Python reference oracle (no Spark).

Runs the reference's fixture corpora through tools/ref_oracle.py and
compares against the golden incident intervals — fast feedback on the
interval-reporting semantics before involving the Spark engine.

Usage: python tools/check_golden_oracle.py [core|narrow|ivolga|ivolga_narrow|all] [pattern_id...]
"""

from __future__ import annotations

import csv
import json
import struct
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools import ref_oracle as O  # noqa: E402

FIX = REPO / "tests" / "fixtures"

WIDE_SENSORS = ["POilDieselOut", "SpeedThrustMin", "PowerPolling"]
IVOLGA_SENSORS = [
    "car_2_TCU_out_E_Bog", "car_2_BCU_out_Indirect_Brake_Active",
    "car_4_TCU_out_E_Bog", "car_4_BCU_out_Indirect_Brake_Active",
    "PSN_1_HV_OUTPUT_VOLTAGE", "PSN_1_is_working", "PSN_1_HV_INPUT_VOLTAGE",
    "PSN_1_CHARGER_CHARGER_CURRENT", "SOC_2_UKV1_UOVS", "ABKM_Brake_Pos",
    "ABKM_Brake_Fail",
]


def f32(s: str | None):
    """Parse like a float32 column read as double (ClickHouse Float32)."""
    if s is None or s == "" or s == "\\N":
        return None
    return struct.unpack("f", struct.pack("f", float(s)))[0]


def read_csv(name: str):
    with open(FIX / name) as f:
        reader = csv.DictReader(f)
        # the ivolga header has a stray space before ABKM_Brake_Pos
        reader.fieldnames = [n.strip() for n in reader.fieldnames]
        return list(reader)


def load_wide():
    rows_by_key = defaultdict(list)
    for r in read_csv("cases-wide-new.csv"):
        ms = round(float(r["ts"]) * 1000)
        key = (r["loco_num"], r["section"], r["upload_id"])
        row = {s: f32(r[s]) for s in WIDE_SENSORS}
        rows_by_key[key].append((ms, row))
    fields = {s: "float64" for s in WIDE_SENSORS}
    return rows_by_key, fields


def load_narrow():
    raw_by_key = defaultdict(list)
    for r in read_csv("cases-narrow-new.csv"):
        ms = round(float(r["dt"]) * 1000)
        key = (r["loco_num"], r["section"], r["upload_id"])
        raw_by_key[key].append((ms, {"sensor_id": r["sensor_id"], "value_float": f32(r["value_float"])}))
    rows_by_key = {
        k: O.sparse_accumulate(
            v, key_column="sensor_id", value_column="value_float",
            sensors=WIDE_SENSORS, default_timeout_ms=1000,
        )
        for k, v in raw_by_key.items()
    }
    fields = {s: "float64" for s in WIDE_SENSORS}
    return rows_by_key, fields


def _ivolga_val(name, raw):
    return raw if name == "SOC_2_UKV1_UOVS" else f32(raw)


def load_ivolga_wide():
    raw_by_key = defaultdict(list)
    for r in read_csv("cases-wide-ivolga.csv"):
        ms = round(float(r["ts"]) * 1000)
        key = (r["stock_num"], r["upload_id"])
        row = {
            s: _ivolga_val(s, None if r[s] in ("", "\\N") else r[s])
            for s in IVOLGA_SENSORS
        }
        raw_by_key[key].append((ms, row))
    rows_by_key = {
        k: O.sparse_accumulate(
            v, key_column=None, value_column=None,
            sensors=IVOLGA_SENSORS, default_timeout_ms=15000,
        )
        for k, v in raw_by_key.items()
    }
    fields = {s: ("string" if s == "SOC_2_UKV1_UOVS" else "float64") for s in IVOLGA_SENSORS}
    return rows_by_key, fields


def load_ivolga_narrow():
    raw_by_key = defaultdict(list)
    for r in read_csv("cases-narrow-ivolga.csv"):
        ms = round(float(r["dt"]) * 1000)
        key = (r["stock_num"], r["upload_id"])
        raw_by_key[key].append(
            (
                ms,
                {
                    "sensor_id": r["sensor_id"],
                    "value_float": f32(r["value_float"]),
                    "value_str": None if r["value_str"] in ("", "\\N") else r["value_str"],
                },
            )
        )
    rows_by_key = {
        k: O.sparse_accumulate(
            v, key_column="sensor_id", value_column="value_float",
            sensors=IVOLGA_SENSORS, default_timeout_ms=15000,
            value_col_mapping={"value_str": ["SOC_2_UKV1_UOVS"]},
        )
        for k, v in raw_by_key.items()
    }
    fields = {s: ("string" if s == "SOC_2_UKV1_UOVS" else "float64") for s in IVOLGA_SENSORS}
    return rows_by_key, fields


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
        for k, v in json.loads((FIX / "simple_cases" / corpus / "incidents.json").read_text()).items()
    }
    ivs: dict[int, list[tuple[float, float]]] = {}
    with open(FIX / "simple_cases" / corpus / "timestamps.csv") as f:
        for row in csv.reader(f):
            if not row or not row[0].strip():
                continue
            ivs.setdefault(int(row[0]), []).append((float(row[1]), float(row[2])))
    return pats, counts, ivs


def run(config: str, only: set[int]) -> int:
    loader, corpus = CONFIGS[config]
    rows_by_key, fields = loader()
    pats, counts, ivs = golden(corpus)
    failures = 0
    for p in pats:
        pid = int(p["id"])
        if only and pid not in only:
            continue
        src = p["sourceCode"]
        try:
            got = sorted(
                (f / 1000.0, t / 1000.0)
                for f, t in O.run_pattern(src, rows_by_key, fields)
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {pid}: error: {type(e).__name__}: {e} [{src}]")
            failures += 1
            continue
        want = sorted(ivs.get(pid, []))
        want_n = counts.get(pid)
        ok_n = want_n is None or len(got) == want_n
        ok_iv = len(got) == len(want) and all(
            abs(g[0] - w[0]) < 1e-4 and abs(g[1] - w[1]) < 1e-4 for g, w in zip(got, want)
        )
        if ok_n and ok_iv:
            print(f"PASS {pid} ({len(got)}) [{src}]")
        else:
            failures += 1
            print(f"FAIL {pid}: got {len(got)} want {want_n} [{src}]")
            print(f"  got : {got}")
            print(f"  want: {want}")
    print(f"\n{failures} failures ({config})")
    return failures


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "core"
    only = {int(x) for x in sys.argv[2:]}
    configs = list(CONFIGS) if which == "all" else [which]
    total = sum(run(c, only) for c in configs)
    raise SystemExit(1 if total else 0)
