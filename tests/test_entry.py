"""Driver-contract regression net: __spark_entry__ must keep its shape."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_contract_shapes():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 90
    assert set(oracles) <= set(qs)
    # rows-only set is small and intentional
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "agg_approx_distinct",
        "dedup_simhash",
        "expr_rand",
        "multimodal_decode",
        "multimodal_resize",
        "sim_ann_ivf",
    }
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_every_oracle_parses_in_duckdb(oracle):
    """Cheap guard: every oracle SQL at least *parses* against the views
    (EXPLAIN, no execution) — catches dialect typos before the driver does."""
    import __spark_entry__ as e

    for name, sql in e.oracle_sql().items():
        oracle.execute(f"EXPLAIN {sql}")
