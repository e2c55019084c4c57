"""Relational operator pipelines over the TPC-H-ish testdata tables.

Each pipeline re-expresses a reference operator family (SURVEY.md §2) as
a Ray Data transform chain, and ships with an ANSI-SQL oracle (SQL dict)
the driver runs via DuckDB — row-count + schema + value-hash must match.

Float discipline for oracle comparability: monetary aggregates are
converted to integer cents (CAST(ROUND(x*100) AS BIGINT)) BEFORE
summation in both engines, so results are exact int64 and hash-stable;
means/stddevs are returned as exact integer moments (n, sum, sumsq).

Reference citations per pipeline are in the docstrings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr) -> pa.Array:
    """double dollars -> exact int64 cents. round_mode matters: Arrow's
    default is half-to-even but DuckDB ROUND is half-away-from-zero, so
    an exact half cent (0.125 * 100) would diverge by 1 under the
    default and fail the value-hash oracle."""
    return pc.cast(
        pc.round(pc.multiply(arr, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


# ---------------------------------------------------------------- Q: pricing summary


def pricing_summary(sf_dir: str):
    """A1/A9-style grouped aggregation with map-side partial aggregation:
    per-batch combine -> tiny groupby (SURVEY.md §4 'pre-aggregate before
    the shuffle'). Reference analogue: post-join group-agg semantics
    (lib_augmentation/augmentation.py:250-336)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(batch["l_quantity"], pa.int64()),
                "price_cents": _cents(batch["l_extendedprice"]),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_cents", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "count_order"]
        )

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    return out


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- Q: revenue by nation


def revenue_by_nation(sf_dir: str, broadcast_bytes: int = 64 << 20):
    """Equi-join + group-agg with a BYTE-budgeted broadcast-vs-shuffle
    planner (J1 pattern; reference lib_augmentation/augmentation.py:376-624).

    Customer is a GROWING dimension, so the plan is chosen from its
    on-disk byte size (Parquet file size — no data read): under
    `broadcast_bytes` the sorted key/nation-code arrays are built inside
    a REMOTE task — they land in the object store and the driver only
    ever holds the ObjectRef (round-3 fix of the driver-side
    `.to_pandas()` build) — and a vectorized searchsorted lookup rides
    map_batches over orders; beyond the budget orders hash-join
    customer (`Dataset.join`). Nation is bounded (25 rows) and always
    broadcasts."""
    from auctus_ray.util import join_partitions, parquet_bytes

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nat_names = nation.sort_values("n_nationkey")["n_name"].to_numpy()
    nat_keys = nation.sort_values("n_nationkey")["n_nationkey"].to_numpy()

    cust_ds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    if parquet_bytes(f"{sf_dir}/customer.parquet") > broadcast_bytes:
        # shuffle path: orders hash-join customer, nation via broadcast
        from auctus_ray.util import drop_schema_metadata

        joined = drop_schema_metadata(orders).join(
            drop_schema_metadata(cust_ds),
            "inner",
            num_partitions=join_partitions(32),
            on=("o_custkey",),
            right_on=("c_custkey",),
        )

        def agg_joined(batch: pa.Table) -> pa.Table:
            code = np.searchsorted(
                nat_keys, batch["c_nationkey"].to_numpy(zero_copy_only=False)
            )
            t = pa.table(
                {
                    "n_name": pa.array(nat_names[code], pa.string()),
                    "cents": _cents(batch["o_totalprice"]),
                }
            )
            g = t.group_by("n_name").aggregate([("cents", "sum"), ("cents", "count")])
            return g.rename_columns(["n_name", "revenue_cents", "n_orders"])

        mapped = joined.map_batches(agg_joined, batch_format="pyarrow")
    else:
        # broadcast path: the lookup arrays are built OFF-driver
        @ray.remote(num_cpus=1)
        def build_side(path: str):
            import pyarrow.parquet as _pq

            t = _pq.read_table(path, columns=["c_custkey", "c_nationkey"])
            ck = t["c_custkey"].to_numpy(zero_copy_only=False)
            order = np.argsort(ck)
            cnat = t["c_nationkey"].to_numpy(zero_copy_only=False)[order]
            return ck[order], np.searchsorted(nat_keys, cnat)

        side_ref = build_side.remote(f"{sf_dir}/customer.parquet")

        class JoinAgg:
            def __init__(self):
                self.ckeys, self.ncode = ray.get(side_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                from auctus_ray.util import sorted_membership

                keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
                hit, pos_c = sorted_membership(self.ckeys, keys)
                cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
                # DROP misses — inner-join semantics, identical to the
                # shuffle path and the oracle (a spurious "" group would
                # make the answer depend on the planner's threshold)
                t = pa.table(
                    {
                        "n_name": pa.array(
                            nat_names[self.ncode[pos_c[hit]]], pa.string()
                        ),
                        "cents": pa.array(cents[hit]),
                    }
                )
                g = t.group_by("n_name").aggregate(
                    [("cents", "sum"), ("cents", "count")]
                )
                return g.rename_columns(["n_name", "revenue_cents", "n_orders"])

        mapped = orders.map_batches(JoinAgg, batch_format="pyarrow", concurrency=(1, 2))

    return mapped.groupby("n_name").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_orders", alias_name="n_orders"),
    )


SQL_REVENUE_BY_NATION = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# ---------------------------------------------------------------- Q: top-k orders


def top_orders(sf_dir: str, k: int = 50):
    """K1: distributed top-k = sort desc + limit, deterministic tiebreak
    by key (reference TOP_K_SIZE=50, apiserver/search/base.py:1)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def with_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "price_cents": _cents(batch["o_totalprice"]),
            }
        )

    return (
        ds.map_batches(with_cents, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["price_cents", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
FROM orders
ORDER BY price_cents DESC, o_orderkey ASC
LIMIT 50
"""


# ---------------------------------------------------------------- Q: distinct counts


def distinct_counts(sf_dir: str):
    """A5/D3: exact distinct counts via per-batch unique partials merged
    on the driver (the partial+final sketch pattern, SURVEY.md §2.5 A4)."""
    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_returnflag"])

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "col": pa.array(
                    ["l_partkey"] * len(pc.unique(batch["l_partkey"]))
                    + ["l_suppkey"] * len(pc.unique(batch["l_suppkey"]))
                    + ["l_returnflag"] * len(pc.unique(batch["l_returnflag"])),
                    pa.string(),
                ),
                "val": pa.array(
                    [str(v) for v in pc.unique(batch["l_partkey"]).to_pylist()]
                    + [str(v) for v in pc.unique(batch["l_suppkey"]).to_pylist()]
                    + [str(v) for v in pc.unique(batch["l_returnflag"]).to_pylist()],
                    pa.string(),
                ),
            }
        )

    uniq = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["col", "val"])
        .aggregate(Count(alias_name="_n"))
        .groupby("col")
        .aggregate(Count(alias_name="n_distinct"))
    )
    return uniq


SQL_DISTINCT_COUNTS = """
SELECT col, n_distinct FROM (
  SELECT 'l_partkey' AS col, COUNT(DISTINCT l_partkey) AS n_distinct FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', COUNT(DISTINCT l_suppkey) FROM lineitem
  UNION ALL
  SELECT 'l_returnflag', COUNT(DISTINCT l_returnflag) FROM lineitem
)
"""


# ---------------------------------------------------------------- Q: union with schema alignment


def union_projection(sf_dir: str):
    """J4/D1: union with schema alignment (projection to a shared schema,
    then bag concat) — reference union augmentation
    (lib_augmentation/augmentation.py:627-764). Aggregated to per-source
    totals so the result is small and exact."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    lines = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])

    def proj_orders(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["o_orderkey"],
                "amount_cents": _cents(b["o_totalprice"]),
                "src": pa.array(["order"] * b.num_rows, pa.string()),
            }
        )

    def proj_lines(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["l_orderkey"],
                "amount_cents": _cents(b["l_extendedprice"]),
                "src": pa.array(["line"] * b.num_rows, pa.string()),
            }
        )

    u = orders.map_batches(proj_orders, batch_format="pyarrow").union(
        lines.map_batches(proj_lines, batch_format="pyarrow")
    )
    return u.groupby("src").aggregate(
        Count(alias_name="n_rows"),
        Sum("amount_cents", alias_name="total_cents"),
        Min("key", alias_name="min_key"),
        Max("key", alias_name="max_key"),
    )


SQL_UNION_PROJECTION = """
WITH u AS (
  SELECT o_orderkey AS key, CAST(ROUND(o_totalprice*100) AS BIGINT) AS amount_cents,
         'order' AS src FROM orders
  UNION ALL
  SELECT l_orderkey, CAST(ROUND(l_extendedprice*100) AS BIGINT), 'line' FROM lineitem
)
SELECT src, COUNT(*) AS n_rows, CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
       MIN(key) AS min_key, MAX(key) AS max_key
FROM u GROUP BY src
"""


# ---------------------------------------------------------------- Q: anti join


def customers_without_orders(sf_dir: str, min_price: float = 300000.0,
                             broadcast_bytes: int = 64 << 20):
    """J10 anti-join with a BYTE-budgeted broadcast-vs-join planner
    (reference deletion sweep socrata_discovery.py:66-98; planner shape
    shared with functions/dedup.py's hot-bucket semi-join).

    The distinct big-order keyset is a DISTRIBUTED aggregate; its
    measured in-memory size picks the plan (util.broadcast_plan): under
    `broadcast_bytes` the sorted key array broadcasts once (`ray.put`)
    and an anti searchsorted filter rides map_batches (round-3 fix of
    the driver `take_all()` keyset); beyond it the anti-join runs as
    `Dataset.join(left_outer)` + null-marker filter. The price
    threshold keeps the result non-empty on the synthetic data at every
    test scale factor."""
    from auctus_ray.util import broadcast_plan, join_partitions

    okeys = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial_keys(b: pa.Table) -> pa.Table:
        big = b.filter(pc.greater_equal(b["o_totalprice"], min_price))
        return pa.table({"k": pc.unique(big["o_custkey"])})

    keys_ds = (
        okeys.map_batches(partial_keys, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["k"])
    )
    # O(distinct big-order customers), not O(orders)
    keys_ds, _n_keys, _kb, fits = broadcast_plan(keys_ds, broadcast_bytes)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    if not fits:
        # join path: left_outer against a marker column, keep null marker
        marked = keys_ds.map_batches(
            lambda t: pa.table(
                {"k": t["k"], "_hit": pa.array(np.ones(t.num_rows, np.int8))}
            ),
            batch_format="pyarrow",
        )
        from auctus_ray.util import drop_schema_metadata

        joined = drop_schema_metadata(cust).join(
            marked,
            "left_outer",
            num_partitions=join_partitions(32),
            on=("c_custkey",),
            right_on=("k",),
        )
        def keep_unmatched(t: pa.Table) -> pa.Table:
            sub = t.filter(pc.is_null(t["_hit"]))
            return pa.table(
                {"c_custkey": sub["c_custkey"], "c_nationkey": sub["c_nationkey"]}
            )

        return joined.map_batches(keep_unmatched, batch_format="pyarrow")

    keys_np = np.sort(
        np.concatenate(
            [
                b["k"].to_numpy(zero_copy_only=False)
                for b in keys_ds.iter_batches(batch_format="pyarrow")
            ]
            or [np.empty(0, np.int64)]
        )
    )
    ref = ray.put(keys_np)

    def anti(batch: pa.Table) -> pa.Table:
        from auctus_ray.util import sorted_membership

        keys = ray.get(ref)
        c = batch["c_custkey"].to_numpy(zero_copy_only=False)
        hit, _ = sorted_membership(keys, c)
        return batch.filter(pa.array(~hit))

    return cust.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_nationkey FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 300000.0
)
"""


# ---------------------------------------------------------------- Q: temporal bucketing


def orders_per_month(sf_dir: str):
    """J3/A6: temporal bucket keys (strftime month) + counts — the
    reference's resolution-aligned keys (lib_profiler/temporal.py:15-33)."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def bucket(batch: pa.Table) -> pa.Table:
        month = pc.strftime(batch["o_orderdate"], format="%Y-%m")
        t = pa.table({"month": month, "cents": _cents(batch["o_totalprice"])})
        g = t.group_by("month").aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["month", "total_cents", "n_orders"])

    return (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("month")
        .aggregate(
            Sum("total_cents", alias_name="total_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


SQL_ORDERS_PER_MONTH = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------- Q: moments (mean/stddev as exact ints)


def quantity_moments(sf_dir: str):
    """A1 mean/stddev via exact integer moments (n, sum, sumsq): the
    reference's two-pass mean_stddev (lib_profiler/numerical.py:17-35)
    restated as a single-pass distributed moment aggregation; the float
    mean/σ are derived from these exact ints by the consumer."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        q = pc.cast(batch["l_quantity"], pa.int64())
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "s": q,
                "s2": pc.multiply(q, q),
            }
        )
        g = t.group_by("l_returnflag").aggregate(
            [("s", "sum"), ("s2", "sum"), ("s", "count")]
        )
        return g.rename_columns(["l_returnflag", "sum_qty", "sumsq_qty", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sumsq_qty", alias_name="sumsq_qty"),
            Sum("n", alias_name="n"),
        )
    )


SQL_QUANTITY_MOMENTS = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumsq_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------- Q: events tumbling window


def events_tumbling_window(sf_dir: str):
    """Streaming-shaped: tumbling 1-hour windows per event_type — the
    ordered-log groupby restatement of windowed aggregation (ray_guide
    'Streaming-shaped workloads'; reference has no true streaming, §2.9)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.strftime(batch["ts"], format="%Y-%m-%d %H:00:00")
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": hour,
                "value_milli": pc.cast(
                    pc.round(
                        pc.multiply(batch["value"], 1000.0),
                        round_mode="half_towards_infinity",  # = SQL ROUND
                    ),
                    pa.int64(),
                ),
            }
        )
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("value_milli", "sum"), ("value_milli", "count")]
        )
        return g.rename_columns(["event_type", "window_start", "sum_value_milli", "n_events"])

    return (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(
            Sum("sum_value_milli", alias_name="sum_value_milli"),
            Sum("n_events", alias_name="n_events"),
        )
    )


SQL_EVENTS_TUMBLING_WINDOW = """
SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS window_start,
       CAST(SUM(CAST(ROUND(value*1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def events_asof_attribution(sf_dir: str):
    """AS-OF join (the brief's canonical custom temporal operator):
    attribute each 'purchase' event to the same user's latest signup at
    or before it. One groupby(user) shuffle co-locates both sides; the
    per-group merge is a vectorized searchsorted
    (functions/windows.py:asof_join). Oracle: DuckDB ASOF LEFT JOIN."""
    from auctus_ray.functions.windows import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "event_type": t["event_type"],
            }
        )

    ev = ev.map_batches(to_us, batch_format="pyarrow")
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "user_id", "ts_us"]
    )
    signups = (
        ev.filter(expr="event_type == 'signup'")
        .select_columns(["event_id", "user_id", "ts_us"])
        .map_batches(
            lambda t: pa.table(
                {
                    "user_id": t["user_id"],
                    "ts_us": t["ts_us"],
                    "signup_event_id": t["event_id"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    joined = asof_join(
        purchases, signups, key="user_id", ts_col="ts_us",
        right_cols=["signup_event_id"], right_suffix="_signup",
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "signup_ts_us": t["ts_us_signup"],
                "signup_event_id": t["signup_event_id_signup"],
            }
        )

    return joined.map_batches(fmt, batch_format="pyarrow")


SQL_EVENTS_ASOF_ATTRIBUTION = """
SELECT p.event_id, p.user_id,
       epoch_us(s.ts) AS signup_ts_us,
       s.event_id AS signup_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def events_hopping_window(sf_dir: str, size_minutes: int = 60, hop_minutes: int = 30):
    """Hopping windowed aggregate (60-min windows every 30 min): each
    event lands in 2 overlapping windows via an arithmetic explode,
    then one groupby(window) reduce (functions/windows.py)."""
    from auctus_ray.functions.windows import hopping_window_agg

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    return hopping_window_agg(
        ds, "ts", "value", size_minutes=size_minutes, hop_minutes=hop_minutes
    )


SQL_EVENTS_HOPPING_WINDOW = """
WITH exploded AS (
  SELECT (epoch_us(ts) // 1800000000) * 1800000000 AS window_start_us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
  UNION ALL
  SELECT (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000,
         CAST(ROUND(value * 100) AS BIGINT)
  FROM events
)
SELECT window_start_us, COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_value_cents
FROM exploded GROUP BY window_start_us
"""


QUERIES = {
    "events_asof_attribution": events_asof_attribution,
    "events_hopping_window": events_hopping_window,
    "pricing_summary": pricing_summary,
    "revenue_by_nation": revenue_by_nation,
    "top_orders": top_orders,
    "distinct_counts": distinct_counts,
    "union_projection": union_projection,
    "customers_without_orders": customers_without_orders,
    "orders_per_month": orders_per_month,
    "quantity_moments": quantity_moments,
    "events_tumbling_window": events_tumbling_window,
}

SQL = {
    "events_asof_attribution": SQL_EVENTS_ASOF_ATTRIBUTION,
    "events_hopping_window": SQL_EVENTS_HOPPING_WINDOW,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "top_orders": SQL_TOP_ORDERS,
    "distinct_counts": SQL_DISTINCT_COUNTS,
    "union_projection": SQL_UNION_PROJECTION,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "orders_per_month": SQL_ORDERS_PER_MONTH,
    "quantity_moments": SQL_QUANTITY_MOMENTS,
    "events_tumbling_window": SQL_EVENTS_TUMBLING_WINDOW,
}


# ---------------------------------------------------------------- Q: sessionization


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Streaming-shaped session windows: per user, events sorted by ts;
    a gap > 30 min starts a new session (ray_guide 'Streaming-shaped
    workloads': ordered-log groupby + per-group windowing; the
    gaps-and-islands oracle uses LAG + cumulative sum).

    The per-group merge is vectorized Arrow/numpy gaps-and-islands
    (sort + diff + boundary indices) — no Arrow→pandas conversion per
    tiny group (round-3 rewrite of the pandas map_groups)."""
    gap_us = gap_minutes * 60 * 1_000_000
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def sessions(g: pa.Table) -> pa.Table:
        ts = (
            pc.cast(pc.cast(g["ts"], pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ev = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, ts))
        ts = ts[order]
        # session boundaries: first event + every gap > threshold
        starts = np.flatnonzero(np.concatenate([[True], np.diff(ts) > gap_us]))
        counts = np.diff(np.append(starts, ts.size))
        uid = g["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array(np.full(starts.size, uid, dtype=np.int64)),
                "session_start_us": pa.array(ts[starts]),
                "n_events": pa.array(counts.astype(np.int64)),
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


SQL_USER_SESSIONS = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
       COUNT(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""

QUERIES["user_sessions"] = user_sessions
SQL["user_sessions"] = SQL_USER_SESSIONS


# ---------------------------------------------------------------- Q: exact quantiles


def quantity_quantiles(sf_dir: str):
    """Exact discrete quantiles of l_quantity via distributed value
    counts (integral domain): per-batch counts -> tiny groupby -> driver
    cumulative pick. The A2-adjacent coverage statistic without a sort."""
    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        q = pc.cast(batch["l_quantity"], pa.int64())
        t = pa.table({"q": q})
        g = t.group_by("q").aggregate([("q", "count")])
        return g.rename_columns(["q", "cnt"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("q")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("q")
    )
    total = int(counts["cnt"].sum())
    cum = counts["cnt"].cumsum()
    rows = []
    for p in (0.25, 0.5, 0.75, 0.95):
        # discrete quantile: smallest value with cum count >= ceil(p * n)
        import math

        rank = math.ceil(p * total)
        v = int(counts.loc[cum >= rank, "q"].iloc[0])
        rows.append({"p": int(p * 100), "value": v})
    return pa.Table.from_pylist(rows)


SQL_QUANTITY_QUANTILES = """
SELECT p, value FROM (
  SELECT CAST(25 AS BIGINT) AS p, CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.25) AS BIGINT) AS value FROM lineitem
  UNION ALL SELECT CAST(50 AS BIGINT), CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.50) AS BIGINT) FROM lineitem
  UNION ALL SELECT CAST(75 AS BIGINT), CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.75) AS BIGINT) FROM lineitem
  UNION ALL SELECT CAST(95 AS BIGINT), CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.95) AS BIGINT) FROM lineitem
)
"""


# ---------------------------------------------------------------- Q: JSON field extraction


def events_props_sum(sf_dir: str):
    """Scalar JSON extraction (§2.8): pull the integer field k out of the
    props JSON string with a vectorized Arrow regex, aggregate per
    event_type — the map-side-partial pattern over a parsed field."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(pc.fill_null(batch["props"], ""), pattern=r'"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "k": pc.fill_null(k, 0),
                "has_k": pc.cast(pc.is_valid(k), pa.int64()),
            }
        )
        g = t.group_by("event_type").aggregate([("k", "sum"), ("has_k", "sum"), ("k", "count")])
        return g.rename_columns(["event_type", "sum_k", "n_with_k", "n_events"])

    return (
        ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Sum("n_with_k", alias_name="n_with_k"),
            Sum("n_events", alias_name="n_events"),
        )
    )


SQL_EVENTS_PROPS_SUM = """
SELECT event_type,
       CAST(SUM(COALESCE(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT), 0)) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN regexp_extract(props, '"k": ([0-9]+)', 1) <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""

QUERIES["quantity_quantiles"] = quantity_quantiles
SQL["quantity_quantiles"] = SQL_QUANTITY_QUANTILES
QUERIES["events_props_sum"] = events_props_sum
SQL["events_props_sum"] = SQL_EVENTS_PROPS_SUM
