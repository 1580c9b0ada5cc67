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


def test_selfcheck_oracle_type_audit_flags_uncast_sum():
    """The selfcheck typing audit must flag a bare integer SUM (DuckDB
    widens it to HUGEINT — the bug class behind three rounds of red driver
    rows) and pass the CAST form."""
    import importlib.util

    from tests.conftest import SF_DIR

    spec = importlib.util.spec_from_file_location(
        "selfcheck_mod", "/root/repo/tools/selfcheck.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = mod.make_duck(SF_DIR)
    bad = mod.audit_oracle_types(
        con,
        {
            "injected_bad": "SELECT SUM(r_regionkey) AS s FROM region",
            "cast_ok": "SELECT CAST(SUM(r_regionkey) AS BIGINT) AS s FROM region",
            "broken_sql": "SELECT FROM nowhere x x",
        },
    )
    assert "injected_bad" in bad and "HUGEINT" in bad["injected_bad"][0]
    assert "cast_ok" not in bad
    assert "broken_sql" in bad  # unplannable oracle is also a failure
