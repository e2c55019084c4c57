"""Join-search pipelines: textual (Lazo containment) candidate ranking
over a catalog of columns from the TPC-H-ish test tables.

Driver query `join_search_textual` uses the EXACT containment path so a
DuckDB oracle can verify it value-for-value; the Lazo sketch-estimate
path (the reference's actual big-vs-big mechanism) is exercised against
the exact scores in tests/test_joinsearch.py.
"""

from __future__ import annotations

import os

import ray.data

import pyarrow as pa
import pyarrow.compute as pc

from auctus_ray.functions.joinsearch import (
    distinct_str_values,
    exact_containment_scores,
)

# the candidate-column catalog: every joinable (key or categorical)
# column of the test schema, as (table, column). The reference's
# analogue is every profiled textual column in the `columns` ES index.
CATALOG: list[tuple[str, str]] = [
    ("customer", "c_custkey"),
    ("customer", "c_mktsegment"),
    ("customer", "c_nationkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_returnflag"),
    ("nation", "n_name"),
    ("nation", "n_nationkey"),
    ("orders", "o_custkey"),
    ("orders", "o_orderpriority"),
    ("part", "p_brand"),
    ("part", "p_partkey"),
    ("part", "p_type"),
    ("region", "r_name"),
    ("region", "r_regionkey"),
    ("supplier", "s_nationkey"),
    ("supplier", "s_suppkey"),
]

QUERY_TABLE, QUERY_COL = "customer", "c_custkey"


def _distinct(sf_dir: str, table: str, col: str):
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=[col]
    )
    return distinct_str_values(ds, col)


def _catalog_values(sf_dir: str):
    """Union all catalog columns into one (dataset_id, column_name,
    value) Dataset — one streamed pipeline for the whole catalog."""
    parts = []
    for t, c in CATALOG:
        if t == QUERY_TABLE and c == QUERY_COL:
            continue
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, f"{t}.parquet"), columns=[c]
        )

        def tag(batch: pa.Table, t=t, c=c) -> pa.Table:
            v = pc.cast(batch[c], pa.string())
            out = pa.table(
                {
                    "dataset_id": pa.array([t] * len(v), pa.string()),
                    "column_name": pa.array([c] * len(v), pa.string()),
                    "value": v,
                }
            )
            return out.filter(pc.is_valid(out["value"]))

        parts.append(ds.map_batches(tag, batch_format="pyarrow"))
    out = parts[0]
    for p_ in parts[1:]:
        out = out.union(p_)
    return out


def join_search_textual(sf_dir: str):
    """J7: containment-ranked joinable-column search. The query column
    (customer.c_custkey) is containment-scored against every catalog
    column in ONE pipeline (union -> distinct aggregate -> membership
    -> groupby sum); scores are exact |Q∩C|/|Q| (the Lazo estimate's
    ground truth), ranked desc and capped at the reference's 300."""
    q = _distinct(sf_dir, QUERY_TABLE, QUERY_COL)
    cat = [(t, c) for t, c in CATALOG if not (t == QUERY_TABLE and c == QUERY_COL)]
    return exact_containment_scores(q, _catalog_values(sf_dir), catalog=cat)


def _sql_join_search_textual() -> str:
    parts = []
    for t, c in CATALOG:
        if t == QUERY_TABLE and c == QUERY_COL:
            continue
        parts.append(
            f"SELECT '{t}' AS dataset_id, '{c}' AS column_name,\n"
            f"  ROUND((SELECT COUNT(*) FROM\n"
            f"     (SELECT DISTINCT CAST({c} AS VARCHAR) AS v FROM {t}) cand\n"
            f"     JOIN q USING (v)) * 1.0 / (SELECT n FROM qn), 6)\n"
            f"   AS containment"
        )

    body = "\nUNION ALL\n".join(parts)
    return (
        "WITH q AS (SELECT DISTINCT CAST("
        f"{QUERY_COL} AS VARCHAR) AS v FROM {QUERY_TABLE} WHERE {QUERY_COL} IS NOT NULL),\n"
        "qn AS (SELECT COUNT(*) AS n FROM q)\n"
        + body
        + "\nORDER BY containment DESC, dataset_id, column_name"
    )


SQL_JOIN_SEARCH_TEXTUAL = _sql_join_search_textual()

QUERIES = {"join_search_textual": join_search_textual}
SQL = {"join_search_textual": SQL_JOIN_SEARCH_TEXTUAL}
