"""Every oracle-declared query must exact-match DuckDB (stricter than the
driver's hash compare) at sf0.001; the driver re-checks at sf0.01."""

from __future__ import annotations

import pytest

from kenshin_backup_spark import queries as registry
from tests.conftest import SF_SMOKE
from tests.harness import compare_query

QUERIES = registry.queries()
ORACLE = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, name):
    res = compare_query(spark, name, QUERIES[name], ORACLE[name], SF_SMOKE)
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_queries_rerun_in_same_session(spark):
    """The driver may invoke a query more than once per session (smoke +
    correctness): temp views, persisted inputs, and streaming memory sinks
    must not collide or change results."""
    for name in ("tsdb_rollup_1h", "tpch_q17_small_quantity",
                 "dedup_ngram_jaccard", "streaming_rollup_1h",
                 "streaming_update_sink_rollup", "emb_ann_topk_srp",
                 "dedup_minhash_portable"):
        a = QUERIES[name](spark, SF_SMOKE).count()
        b = QUERIES[name](spark, SF_SMOKE).count()
        assert a == b, name
