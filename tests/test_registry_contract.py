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
