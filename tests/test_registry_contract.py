"""Driver-contract regression guards: the declared registry must stay
inside the correctness window and keep its invariants."""

from __future__ import annotations

DRIVER_WINDOW = 50  # the driver verifies exactly the first 50 entries


def test_registry_size_and_oracle_coverage():
    from tsp_spark.queries import ORACLES, QUERIES

    # every declared query must land a driver CORRECTNESS row: the
    # registry must not grow past the window (fold near-duplicates
    # instead — see the cep_wait_until_tol / text_profile folds)
    assert len(QUERIES) <= DRIVER_WINDOW, (
        f"{len(QUERIES)} queries > driver window of {DRIVER_WINDOW}: "
        f"entries beyond the window silently get NO correctness row"
    )
    # exact DuckDB oracle for every entry (zero rows-only checks)
    assert set(ORACLES) == set(QUERIES)
    assert all(isinstance(sql, str) and "SELECT" in sql.upper()
               for sql in ORACLES.values())


def test_entry_contract_importable():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) == set(q) and len(q) <= DRIVER_WINDOW
    assert callable(next(iter(q.values())))


def test_oracle_dtypes_stay_driver_hashable():
    """Every oracle's DuckDB result must avoid dtypes the driver's hash
    treats differently from Spark's: an uncast integer sum() yields
    HUGEINT (int128 → pandas object dtype) and hash-mismatches even when
    every value is equal. This cost rounds 3 AND 4 — r4 shipped 5 such
    oracles (rel_q10/q12/q18/q19/q22). Bind each oracle against the
    smallest sf dir and assert no HUGEINT/UHUGEINT/DECIMAL column
    escapes; cast with ::BIGINT (or ::DOUBLE) in the outer SELECT."""
    import duckdb

    from tsp_spark.queries import ORACLES

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    offenders = []
    for name, sql in ORACLES.items():
        rel = con.sql(sql)  # binds + type-checks without executing
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if "HUGEINT" in t or t.startswith("DECIMAL"):
                offenders.append(f"{name}.{col}: {t}")
    assert not offenders, (
        "oracle columns with driver-hash-hostile dtypes (add ::BIGINT): "
        + "; ".join(offenders)
    )
