"""Driver-contract shape tests."""

from __future__ import annotations


def test_contract_shape():
    import __spark_entry__ as mod

    qs, oracles = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 50, f"expected broad coverage, got {len(qs)}"
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
    # oracle coverage should dominate (rows-only is the exception)
    assert len(oracles) >= 0.7 * len(qs)


def test_queries_idempotent():
    import __spark_entry__ as mod

    assert set(mod.queries()) == set(mod.queries())


def test_entry_runs(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "revenue"}
