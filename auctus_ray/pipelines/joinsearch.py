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

from auctus_ray.util import round6 as _round6
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
    # single-column reads of small-to-mid tables: one block per table
    # keeps Ray task overhead off the 16-way catalog sweep (at real
    # scale the default splitting takes over via larger files)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=[col],
        override_num_blocks=1,
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
            os.path.join(sf_dir, f"{t}.parquet"), columns=[c],
            override_num_blocks=2,
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

# ------------------------------------------------- spatial join search (J6)

# deterministic pseudo-coordinates in integer centi-degrees derived from
# customer keys: the testdata has no geo columns, so the spatial-coverage
# catalog is synthesized identically on both sides (Ray and the DuckDB
# oracle) — per-nation bounding boxes over the hashed point cloud.
_LAT_MUL, _LON_MUL = 7919, 104729
# two query envelopes (min_lat, max_lat, min_lon, max_lon), centi-degrees
QUERY_ENVELOPES = [
    (-4500, 3000, -9000, 4500),
    (1000, 8000, 6000, 17000),
]


def join_search_spatial(sf_dir: str):
    """J6: rank candidate datasets (per-nation coverage boxes) by
    bbox-envelope intersection area against the query envelopes —
    the reference's ES geo_shape + painless overlap-area score
    (apiserver/search/join.py:255-358). Integer centi-degree areas keep
    Ray and the SQL oracle bit-identical."""
    import numpy as np

    from ray.data.aggregate import Max, Min

    from auctus_ray.functions.spatial import bbox_overlap_scores

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )

    def to_points(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = (k * _LAT_MUL) % 18000 - 9000
        lon = (k * _LON_MUL) % 36000 - 18000
        return pa.table(
            {
                "dataset_id": pc.cast(batch["c_nationkey"], pa.int64()),
                "lat": pa.array(lat),
                "lon": pa.array(lon),
            }
        )

    boxes = (
        cust.map_batches(to_points, batch_format="pyarrow")
        .groupby("dataset_id")
        .aggregate(
            Min("lat", alias_name="min_lat"),
            Max("lat", alias_name="max_lat"),
            Min("lon", alias_name="min_lon"),
            Max("lon", alias_name="max_lon"),
        )
    )
    scored = bbox_overlap_scores(
        boxes, [(a, b, c, d) for a, b, c, d in QUERY_ENVELOPES]
    )

    def round6(batch: pa.Table) -> pa.Table:
        import numpy as np

        sc = batch["score"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dataset_id": batch["dataset_id"],
                "score": pa.array(_round6(sc)),
            }
        )

    return scored.map_batches(round6, batch_format="pyarrow")


def _sql_join_search_spatial() -> str:
    cov = sum((b - a) * (d - c) for a, b, c, d in QUERY_ENVELOPES)
    values = ", ".join(
        f"({a}, {b}, {c}, {d})" for a, b, c, d in QUERY_ENVELOPES
    )
    return f"""
WITH pts AS (
  SELECT CAST(c_nationkey AS BIGINT) AS dataset_id,
         (CAST(c_custkey AS BIGINT) * {_LAT_MUL}) % 18000 - 9000 AS lat,
         (CAST(c_custkey AS BIGINT) * {_LON_MUL}) % 36000 - 18000 AS lon
  FROM customer
),
boxes AS (
  SELECT dataset_id, MIN(lat) AS min_lat, MAX(lat) AS max_lat,
         MIN(lon) AS min_lon, MAX(lon) AS max_lon
  FROM pts GROUP BY dataset_id
),
q(min_lat, max_lat, min_lon, max_lon) AS (VALUES {values}),
inter AS (
  SELECT b.dataset_id,
         CASE WHEN LEAST(b.max_lat, q.max_lat) > GREATEST(b.min_lat, q.min_lat)
               AND LEAST(b.max_lon, q.max_lon) > GREATEST(b.min_lon, q.min_lon)
              THEN CAST(LEAST(b.max_lat, q.max_lat) - GREATEST(b.min_lat, q.min_lat) AS DOUBLE)
                 * CAST(LEAST(b.max_lon, q.max_lon) - GREATEST(b.min_lon, q.min_lon) AS DOUBLE)
              ELSE 0.0 END AS a
  FROM boxes b CROSS JOIN q
)
SELECT dataset_id, ROUND(SUM(a / {cov}.0), 6) AS score
FROM inter GROUP BY dataset_id HAVING SUM(a) > 0
"""


SQL_JOIN_SEARCH_SPATIAL = _sql_join_search_spatial()

QUERIES = {
    "join_search_textual": join_search_textual,
    "join_search_spatial": join_search_spatial,
}
SQL = {
    "join_search_textual": SQL_JOIN_SEARCH_TEXTUAL,
    "join_search_spatial": SQL_JOIN_SEARCH_SPATIAL,
}
