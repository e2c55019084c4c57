"""Driver-contract pipelines vs their DuckDB oracles at sf0.001 — the
same comparison the driver runs at sf0.01 (tools/check_oracles.py)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()


def _entry_maps():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    e = importlib.import_module("__ray_entry__")
    return e.queries(), e.oracle_sql()


_SQL_CHECKED = None


def _sql_checked_names():
    global _SQL_CHECKED
    if _SQL_CHECKED is None:
        qs, sqls = _entry_maps()
        _SQL_CHECKED = sorted(set(qs) & set(sqls))
    return _SQL_CHECKED


@pytest.mark.parametrize("name", [
    "pricing_summary", "revenue_by_nation", "top_orders", "distinct_counts",
    "union_projection", "customers_without_orders", "orders_per_month",
    "quantity_moments", "events_tumbling_window", "bm25_topk_or",
    "bm25_topk_and", "term_df_top100", "doc_length_stats",
    "dedup_exact_groups", "ann_cosine_topk", "text_token_stats", "text_quality",
])
def test_query_matches_oracle(ray_session, con, name):
    qs, sqls = _entry_maps()
    assert name in qs and name in sqls
    got = _canon(_to_pandas(qs[name](SF_DIR)))
    expect = _canon(con.sql(sqls[name]).df())
    assert list(got.columns) == list(expect.columns), name
    assert len(got) == len(expect), name
    pd.testing.assert_frame_equal(got, expect, check_exact=True)


def test_rows_only_queries_run(ray_session):
    qs, sqls = _entry_maps()
    rows_only = sorted(set(qs) - set(sqls))
    assert rows_only, "expected some rows-only queries"
    for name in rows_only:
        out = _to_pandas(qs[name](SF_DIR))
        assert out is not None, name
        # pair-finding queries may legitimately return zero rows (and an
        # empty pandas frame loses its schema); non-empty results must
        # carry columns
        if len(out) > 0:
            assert len(out.columns) > 0, name


def test_entry_smoke(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    e = importlib.import_module("__ray_entry__")
    out = _to_pandas(e.entry())
    assert len(out) >= 0 and "doc_id" in out.columns
