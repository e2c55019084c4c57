"""Dataset profiling: the reference profiler's type system re-expressed
as distributed partial aggregation.

Mirrors lib_profiler/datamart_profiler semantics (citations inline):
every cell is treated as a string (core.py:266-274, na_filter=False ->
missing == ''), per-cell regex voting with a 2% unclean tolerance
(profile_types.py:82-126, MAX_UNCLEAN), structural decision order
empty -> int -> int+float -> point -> text (profile_types.py:186-208),
then semantic heuristics: boolean literals, URL/file thresholds, free
text (>=50% rows with >=4 words), categorical (<=10% distinct), ID by
column-name affix, the 'year' special case, lat/long by name+range
(profile_types.py:241-356). Type names are the same public schema.org
URL constants (types.py:1-57).

Ray Data shape: one map_batches pass emits per-(batch, column) partial
counters (regex votes, capped distinct samples, numeric moments,
min/max); the driver reduces partials and runs the tiny decision logic
— the classic partial+final aggregation (SURVEY.md §2.5 A4), so no
column ever materializes on one node.

Deviations from the reference (documented, deliberate):
  * date-parse voting runs on the (capped) distinct sample instead of
    every cell — same decisions on test data, bounded driver work;
  * distinct sets are capped at `distinct_cap` per column with an
    `distinct_exact` flag (reference is exact in RAM, core.py).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# public schema URIs (reference types.py:1-57)
T_MISSING = "https://metadata.datadrivendiscovery.org/types/MissingData"
T_INTEGER = "http://schema.org/Integer"
T_FLOAT = "http://schema.org/Float"
T_TEXT = "http://schema.org/Text"
T_BOOLEAN = "http://schema.org/Boolean"
T_LATITUDE = "http://schema.org/latitude"
T_LONGITUDE = "http://schema.org/longitude"
T_DATE_TIME = "http://schema.org/DateTime"
T_URL = "http://schema.org/URL"
T_FILE_PATH = "https://metadata.datadrivendiscovery.org/types/FileName"
T_ID = "http://schema.org/identifier"
T_CATEGORICAL = "http://schema.org/Enumeration"
T_GEO_POINT = "http://schema.org/GeoCoordinates"
T_GEO_POLYGON = "http://schema.org/GeoShape"

MAX_UNCLEAN = 0.02
TEXT_WORDS_THRESHOLD = 0.5
MAX_CATEGORICAL_RATIO = 0.10
LATITUDE_NAMES = ("latitude", "lat")
LONGITUDE_NAMES = ("longitude", "long", "lon", "lng")

# vectorized vote patterns (profile_types.py regexes, re-expressed as
# full-match RE2 patterns for pyarrow)
_VOTES = {
    "int": r"^[+-]?[0-9]+$",
    "float": r"^[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?$",
    "url": r"^https?://[^\s]+$",
    "file": r"^(?:/[^/\s]+)+/?$",
    "wkt_point": r"^POINT ?\(-?[0-9]{1,3}(?:\.[0-9]{1,15})? -?[0-9]{1,3}(?:\.[0-9]{1,15})?\)$",
    # reference _re_wkt_polygon (profile_types.py:48-55): ring(s) of
    # digit/space/dot vertices — negatives deliberately unmatched there.
    # DIVERGENCE: the reference ring class omits ',', which rejects
    # standard comma-separated WKT vertices ("30 10, 40 40, ..."); we
    # accept them (a superset of the reference's matches)
    "wkt_polygon": r"^POLYGON ?\(\([0-9 .,]+\)(?:, ?\([0-9 .,]+\))*\)$",
    "latlong_point": r"^\(?-?[0-9]{1,3}\.[0-9]{1,15}, ?-?[0-9]{1,3}\.[0-9]{1,15}\)?$",
    "text4": r"^\S+(?:\s+\S+){3,}",  # >= 4 whitespace-separated words
    "bool": r"^(?i:0|1|true|false|y|n|yes|no)$",
}


def _string_view(batch: pa.Table) -> pa.Table:
    """All-cells-to-string view (reference: dtype=str, na_filter=False)."""
    cols = {}
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_timestamp(col.type):
            col = pc.strftime(col, format="%Y-%m-%d %H:%M:%S")
        elif not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        cols[name] = pc.fill_null(col, "")
    return pa.table(cols)


def profile_partials(batch: pa.Table, *, distinct_cap: int = 4096) -> pa.Table:
    """Per-(batch, column) partial profile counters."""
    sb = _string_view(batch)
    rows = []
    for name in sb.column_names:
        arr = sb[name].combine_chunks() if isinstance(sb[name], pa.ChunkedArray) else sb[name]
        n = len(arr)
        empty = int(pc.sum(pc.equal(arr, "")).as_py() or 0)
        counts = {}
        for key, pattern in _VOTES.items():
            counts[key] = int(
                pc.sum(pc.match_substring_regex(arr, pattern)).as_py() or 0
            )
        # numeric moments + range over float-parsable cells (regex-gated:
        # Arrow cast has no parse-to-null mode)
        numeric_mask = pc.or_(
            pc.match_substring_regex(arr, _VOTES["int"]),
            pc.match_substring_regex(arr, _VOTES["float"]),
        )
        fv = pc.cast(arr.filter(numeric_mask), pa.float64())
        nnum = len(fv)
        fs = fv.to_numpy(zero_copy_only=False) if nnum else np.empty(0)
        num_lat = int(((fs >= -90.0) & (fs <= 90.0)).sum())
        num_long = int(((fs >= -180.0) & (fs <= 180.0)).sum())
        uniq = pc.unique(arr)
        if len(uniq) > distinct_cap:
            uniq = uniq.slice(0, distinct_cap)
            exact = False
        else:
            exact = True
        rows.append(
            {
                "column": name,
                "n": n,
                "empty": empty,
                **{f"c_{k}": v for k, v in counts.items()},
                "num_sum": float(fs.sum()) if nnum else 0.0,
                "num_sumsq": float((fs * fs).sum()) if nnum else 0.0,
                "num_cnt": nnum,
                "num_min": float(fs.min()) if nnum else float("inf"),
                "num_max": float(fs.max()) if nnum else float("-inf"),
                "num_lat": num_lat,
                "num_long": num_long,
                "distinct_sample": json.dumps(uniq.to_pylist()),
                "distinct_exact": exact,
            }
        )
    return pa.Table.from_pylist(rows)


_DATE_LIKE = re.compile(
    # note: Arrow strftime('%S') emits fractional seconds (".000000")
    r"^\d{4}[-/]\d{1,2}[-/]\d{1,2}([ T]\d{2}:\d{2}(:\d{2}(\.\d{1,9})?)?)?$|^\d{8}$"
)


def _strict_parse_dates(values: list[str]) -> int:
    """Count values parseable as full dates. Reference parse_date rejects
    time-only strings via double-default parsing (temporal.py:77-102);
    here a date-shaped prefilter + dateutil parse."""
    try:
        from dateutil import parser as duparser
    except ImportError:
        return 0
    ok = 0
    for v in values:
        if not v or not _DATE_LIKE.match(v):
            continue
        try:
            duparser.parse(v)
            ok += 1
        except (ValueError, OverflowError):
            pass
    return ok


_ADMIN_RESOLVER = None


def _admin_resolver():
    """Gazetteer lookup built once per process (the reference's
    per-worker GeoData cache, profiler/profiler.py:193)."""
    global _ADMIN_RESOLVER
    if _ADMIN_RESOLVER is None:
        from auctus_ray.functions.admin import AdminResolver

        _ADMIN_RESOLVER = AdminResolver()
    return _ADMIN_RESOLVER


def finalize_profile(partials: "list[dict]",
                     annotations: dict | None = None) -> pa.Table:
    """Reduce per-batch partials -> one profile row per column.

    annotations: optional manual per-column overrides
    ``{column: {"structural_type": ..., "semantic_types": [...]}}`` —
    user-supplied types REPLACE the inferred ones while computed
    statistics are kept, the reference's manual-annotation hook
    (lib_profiler core.py:612-619, profile_types.py:188-189, 217-240).
    """
    by_col: dict[str, dict] = {}
    for p in partials:
        c = by_col.setdefault(
            p["column"],
            {
                "n": 0, "empty": 0, "num_sum": 0.0, "num_sumsq": 0.0,
                "num_cnt": 0, "num_min": float("inf"), "num_max": float("-inf"),
                "num_lat": 0, "num_long": 0, "distinct": set(),
                "distinct_exact": True,
                **{f"c_{k}": 0 for k in _VOTES},
            },
        )
        for k in ["n", "empty", "num_cnt", "num_lat", "num_long"] + [
            f"c_{k}" for k in _VOTES
        ]:
            c[k] += p[k]
        c["num_sum"] += p["num_sum"]
        c["num_sumsq"] += p["num_sumsq"]
        c["num_min"] = min(c["num_min"], p["num_min"])
        c["num_max"] = max(c["num_max"], p["num_max"])
        c["distinct"].update(json.loads(p["distinct_sample"]))
        c["distinct_exact"] &= bool(p["distinct_exact"])

    out = []
    for name, c in sorted(by_col.items()):
        n = c["n"]
        empty = c["empty"]
        threshold = max(1, (1.0 - MAX_UNCLEAN) * (n - empty))
        distinct = {v for v in c["distinct"] if v}
        # structural decision (profile_types.py:186-208 order)
        if empty == n:
            structural = T_MISSING
        elif c["c_int"] >= threshold:
            structural = T_INTEGER
        elif c["c_float"] >= threshold:
            # the float pattern matches integer strings too, so this count
            # IS the reference's int+float bucket sum (its elif chain makes
            # buckets exclusive; ours overlap by construction)
            structural = T_FLOAT
        elif c["c_wkt_point"] >= threshold or c["c_latlong_point"] >= threshold:
            structural = T_GEO_POINT
        elif c["c_wkt_polygon"] >= threshold:
            # reference profile_types.py:203-204: WKT polygons are their
            # own structural type, decided after the point formats
            structural = T_GEO_POLYGON
        else:
            structural = T_TEXT

        semantic: list[str] = []
        if c["c_bool"] >= threshold:
            semantic.append(T_BOOLEAN)
        if structural == T_TEXT:
            if c["c_url"] >= threshold:
                semantic.append(T_URL)
            if c["c_file"] >= threshold:
                semantic.append(T_FILE_PATH)
            # administrative areas: >=3 distinct values, >=70% resolving
            # against the gazetteer, consistent level (reference
            # profile_types.py:266-275; forces categorical)
            admin_info = None
            if len(distinct) >= 3:
                from auctus_ray.functions.admin import (
                    T_ADMIN,
                    resolve_admin_column,
                )

                admin_info = resolve_admin_column(
                    sorted(distinct)[:2000], _admin_resolver()
                )
                if admin_info is not None:
                    semantic.append(T_ADMIN)
            text_threshold = max(1, (1.0 - TEXT_WORDS_THRESHOLD) * (n - empty))
            if admin_info is None and c["c_text4"] >= text_threshold:
                semantic.append(T_TEXT)
            else:
                max_cat = MAX_CATEGORICAL_RATIO * (n - empty)
                if (
                    admin_info is not None
                    or len(distinct) <= max_cat
                    or T_BOOLEAN in semantic
                ):
                    semantic.append(T_CATEGORICAL)
        elif structural == T_INTEGER:
            low = name.lower()
            if low.startswith(("id", "identifier", "index")) or low.endswith(
                ("id", "identifier", "index", "key")
            ):
                semantic.append(T_ID)
            if name.strip().lower() == "year":
                years = sum(
                    1 for v in distinct if v.isdigit() and 1 <= int(v) <= 9999
                )
                # >= 98% must parse as years (reference
                # profile_types.py:311-322: len(dates) >= threshold with
                # threshold = (1-MAX_UNCLEAN)*n) — NOT 2%
                if years and years >= max(
                    1, (1.0 - MAX_UNCLEAN) * len(distinct)
                ):
                    structural = T_TEXT
                    semantic.append(T_DATE_TIME)
        if structural == T_FLOAT:
            low = name.lower()
            if c["num_lat"] >= threshold and any(k in low for k in LATITUDE_NAMES):
                semantic.append(T_LATITUDE)
            if c["num_long"] >= threshold and any(k in low for k in LONGITUDE_NAMES):
                semantic.append(T_LONGITUDE)
        if structural == T_TEXT and T_DATE_TIME not in semantic:
            sample = sorted(distinct)[:2000]
            if sample and _strict_parse_dates(sample) >= 0.98 * len(sample):
                semantic.append(T_DATE_TIME)

        # A6: temporal resolution from the distinct sample
        resolution = None
        if T_DATE_TIME in semantic:
            try:
                import numpy as _np

                from auctus_ray.functions.temporal import get_temporal_resolution

                sample = sorted(distinct)[:2000]
                vals = _np.array(
                    [v for v in sample if _DATE_LIKE.match(v)], dtype="datetime64[s]"
                )
                if vals.size:
                    resolution = get_temporal_resolution(vals)
            except (ValueError, TypeError):
                resolution = None

        ann = (annotations or {}).get(name)
        if ann:
            if "structural_type" in ann:
                structural = ann["structural_type"]
            if "semantic_types" in ann:
                semantic = list(ann["semantic_types"])

        nnum = c["num_cnt"]
        mean = c["num_sum"] / nnum if nnum else None
        var = (c["num_sumsq"] / nnum - mean * mean) if nnum else None
        out.append(
            {
                "column": name,
                "structural_type": structural,
                "semantic_types": ";".join(sorted(set(semantic))),
                "n_rows": n,
                "missing_values_ratio": round(empty / n, 6) if n else 0.0,
                "num_distinct_values": len(distinct),
                "distinct_exact": c["distinct_exact"],
                "mean": round(mean, 6) if mean is not None else None,
                "stddev": round(max(var, 0.0) ** 0.5, 6) if var is not None else None,
                "min": c["num_min"] if nnum else None,
                "max": c["num_max"] if nnum else None,
                "temporal_resolution": resolution,
                # capped distinct sample (value-truncated) — feeds the
                # document assembler's coverage ranges (pipelines/document.py)
                "distinct_json": json.dumps(
                    [v[:64] for v in sorted(distinct)[:2000]]
                ),
            }
        )
    return pa.Table.from_pylist(out)


def profile_table(sf_dir: str, table: str = "orders") -> pa.Table:
    """Distributed profile of one testdata table (rows-only driver check;
    exact semantics pytest-verified on reference-shaped fixtures).

    Routed through the ingestion sniffer (read_table_auto), so `table`
    may also name a CSV/TSV/XLSX file (garbage headers skipped, pivots
    unpivoted) — the reference's detect -> convert -> profile flow
    (profiler/profiler.py:90-160)."""
    import os

    from auctus_ray.sources.ingest import read_table_auto

    path = os.path.join(sf_dir, table)
    if not os.path.exists(path):
        path = f"{path}.parquet"
    ds = read_table_auto(path)
    partial_ds = ds.map_batches(
        profile_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = partial_ds.to_pandas().to_dict("records")
    return finalize_profile(partials)


def numeric_ranges_kmeans(
    values: np.ndarray, k: int = 3, min_share: float = 0.1, seed: int = 0
) -> list[tuple[float, float]]:
    """A2 numeric coverage: k<=3 1-D Lloyd k-means (deterministic seeded
    init on quantiles), drop clusters under 10% of rows, 5th-95th
    percentile per cluster (lib_profiler/numerical.py:38-86 semantics;
    sklearn is not available in this environment, so a quantile-seeded
    Lloyd iteration replaces KMeans(random_state=0))."""
    v = np.sort(values[np.isfinite(values)].astype(np.float64))
    if v.size == 0:
        return []
    k = min(k, np.unique(v).size)
    centers = np.quantile(v, np.linspace(0.1, 0.9, k))
    for _ in range(50):
        assign = np.argmin(np.abs(v[:, None] - centers[None, :]), axis=1)
        new = np.array(
            [v[assign == j].mean() if (assign == j).any() else centers[j] for j in range(k)]
        )
        if np.allclose(new, centers):
            break
        centers = new
    ranges = []
    for j in range(k):
        cluster = v[assign == j]
        if cluster.size < min_share * v.size:
            continue
        ranges.append(
            (float(np.quantile(cluster, 0.05)), float(np.quantile(cluster, 0.95)))
        )
    return sorted(ranges)


# ---------------------------------------------------------------- queries


def profile_orders(sf_dir: str) -> pa.Table:
    return profile_table(sf_dir, "orders")


def profile_documents(sf_dir: str) -> pa.Table:
    return profile_table(sf_dir, "documents")


def _round_half_up(x: float, d: int) -> float:
    import math

    m = 10 ** d
    return math.floor(x * m + 0.5) / m


# Profiler-stats oracle surface: these orders columns get their profile
# checked value-for-value against DuckDB aggregates (upgrading the
# profiler from a rows-only driver check). Expected types in the SQL
# are INDEPENDENT literals derived from the reference's decision rules
# (profile_types.py:186-356), so a type-decision regression mismatches.
_ORACLE_STAT_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_totalprice",
    "o_orderstatus",
    "o_orderpriority",
    "o_orderdate",
]
# only columns whose distinct sets are structurally small (exact under
# the per-batch sample cap at every test scale) claim a distinct count
_ORACLE_DISTINCT_COLS = {
    "o_orderstatus",
    "o_orderpriority",
}

_STATS_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("structural_type", pa.string()),
        ("semantic_types", pa.string()),
        ("n_rows", pa.int64()),
        ("n_distinct", pa.int64()),
        ("mean_r4", pa.float64()),
        ("stddev_r2", pa.float64()),
        ("min_val", pa.float64()),
        ("max_val", pa.float64()),
    ]
)


def _profile_stats(sf_dir: str, table: str, cols: list[str],
                   distinct_cols: set[str]) -> pa.Table:
    """Oracle-checkable slice of one table's profile: type decisions
    plus numeric statistics per column. Rounding margins are sized to
    the float-summation noise floor (mean to 4 decimals, stddev to 2 —
    the profiler's sum/sumsq pass and DuckDB's Welford accumulate in
    different orders, so tighter rounding would flake)."""
    prof = {r["column"]: r for r in profile_table(sf_dir, table).to_pylist()}
    rows = []
    for col in cols:
        p = prof[col]
        numeric = p["mean"] is not None
        rows.append(
            {
                "column": col,
                "structural_type": p["structural_type"],
                "semantic_types": p["semantic_types"],
                "n_rows": int(p["n_rows"]),
                "n_distinct": (
                    int(p["num_distinct_values"])
                    if col in distinct_cols and p["distinct_exact"]
                    else None
                ),
                "mean_r4": _round_half_up(p["mean"], 4) if numeric else None,
                "stddev_r2": _round_half_up(p["stddev"], 2) if numeric else None,
                "min_val": float(p["min"]) if numeric else None,
                "max_val": float(p["max"]) if numeric else None,
            }
        )
    return pa.Table.from_pylist(rows, schema=_STATS_SCHEMA)


def profile_stats_orders(sf_dir: str) -> pa.Table:
    return _profile_stats(
        sf_dir, "orders", _ORACLE_STAT_COLS, _ORACLE_DISTINCT_COLS
    )


# documents-table variant: same SQL-checkable surface over the
# training-corpus table (doc_id/text/lang/source/n_chars) — the second
# profiler oracle, covering the TEXT + Enumeration decision legs the
# orders table lacks on free text
_DOC_STAT_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
_DOC_DISTINCT_COLS = {"lang", "source"}


def profile_stats_documents(sf_dir: str) -> pa.Table:
    return _profile_stats(
        sf_dir, "documents", _DOC_STAT_COLS, _DOC_DISTINCT_COLS
    )


def _sql_profile_stats(table: str, cols: list[str],
                       expected: dict[str, tuple[str, str]],
                       distinct_cols: set[str]) -> str:
    """UNION ALL of one SELECT per column; (structural, semantic)
    literals are INDEPENDENT expectations from the reference's decision
    rules (profile_types.py:186-356), so a type-decision regression
    mismatches the oracle."""
    parts = []
    for col in cols:
        st, sem = expected[col]
        numeric = st in (T_INTEGER, T_FLOAT)
        dist = (
            f"CAST(COUNT(DISTINCT {col}) AS BIGINT)"
            if col in distinct_cols
            else "CAST(NULL AS BIGINT)"
        )
        if numeric:
            stats = (
                f"ROUND(AVG({col}), 4) AS mean_r4,\n"
                f"  ROUND(COALESCE(STDDEV_POP({col}), 0.0), 2) AS stddev_r2,\n"
                f"  CAST(MIN({col}) AS DOUBLE) AS min_val,\n"
                f"  CAST(MAX({col}) AS DOUBLE) AS max_val"
            )
        else:
            stats = (
                "CAST(NULL AS DOUBLE) AS mean_r4,\n"
                "  CAST(NULL AS DOUBLE) AS stddev_r2,\n"
                "  CAST(NULL AS DOUBLE) AS min_val,\n"
                "  CAST(NULL AS DOUBLE) AS max_val"
            )
        # "EXPR:" marks a raw SQL expression (scale-dependent semantics
        # like the categorical flag); plain values are literals
        sem_sql = sem[5:] if sem.startswith("EXPR:") else f"'{sem}'"
        parts.append(
            f"SELECT '{col}' AS column, '{st}' AS structural_type,\n"
            f"  {sem_sql} AS semantic_types,\n"
            f"  COUNT(*) AS n_rows, {dist} AS n_distinct,\n"
            f"  {stats}\nFROM {table}"
        )
    return "\nUNION ALL\n".join(parts)


# orders expectations: *key -> Integer+identifier; totalprice -> Float;
# status/priority -> Text+Enumeration (<=10% distinct); orderdate ->
# Text+DateTime, PLUS Enumeration when the distinct-date ratio crosses
# the 10% categorical threshold — the reference applies the categorical
# rule to every non-free-text Text column (profile_types.py:285-294),
# DateTime included, and the ratio is scale-dependent (sf0.01: ~16%
# distinct -> no; sf0.1: ~1.6% -> yes). LEAST(.., 4096) mirrors the
# engine's capped distinct sample.
_ORDERDATE_SEM = (
    "EXPR:'" + T_DATE_TIME + "' || CASE WHEN "
    "LEAST(COUNT(DISTINCT o_orderdate), 4096) <= 0.10 * COUNT(*) "
    "THEN ';" + T_CATEGORICAL + "' ELSE '' END"
)
SQL_PROFILE_STATS_ORDERS = _sql_profile_stats(
    "orders",
    _ORACLE_STAT_COLS,
    {
        "o_orderkey": (T_INTEGER, T_ID),
        "o_custkey": (T_INTEGER, T_ID),
        "o_totalprice": (T_FLOAT, ""),
        "o_orderstatus": (T_TEXT, T_CATEGORICAL),
        "o_orderpriority": (T_TEXT, T_CATEGORICAL),
        "o_orderdate": (T_TEXT, _ORDERDATE_SEM),
    },
    _ORACLE_DISTINCT_COLS,
)

# documents expectations: doc_id -> Integer+identifier (name suffix);
# text -> free TEXT (>=50% of rows have >=4 words); lang/source ->
# Text+Enumeration (tiny distinct sets); n_chars -> plain Integer
SQL_PROFILE_STATS_DOCUMENTS = _sql_profile_stats(
    "documents",
    _DOC_STAT_COLS,
    {
        "doc_id": (T_INTEGER, T_ID),
        "text": (T_TEXT, T_TEXT),
        "lang": (T_TEXT, T_CATEGORICAL),
        "source": (T_TEXT, T_CATEGORICAL),
        "n_chars": (T_INTEGER, ""),
    },
    _DOC_DISTINCT_COLS,
)


def histogram_quantity(sf_dir: str):
    """A4 numerical histogram: 10 equal-width bins over l_quantity.
    Bin rule floor((x-min)*10/(max-min)) capped at 9 — expressed with
    the identical float operations in the SQL oracle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity"]
    )
    from ray.data.aggregate import Max, Min, Sum

    # pass 1: global min/max (tiny aggregate)
    stats = ds.aggregate(
        Min("l_quantity", alias_name="lo"), Max("l_quantity", alias_name="hi")
    )
    lo, hi = float(stats["lo"]), float(stats["hi"])

    def bucketize(batch: pa.Table) -> pa.Table:
        x = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.minimum(np.floor((x - lo) * 10.0 / (hi - lo)), 9.0).astype(np.int64)
        t = pa.table({"bin": pa.array(b)})
        g = t.group_by("bin").aggregate([("bin", "count")])
        return g.rename_columns(["bin", "cnt"])

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


SQL_HISTOGRAM_QUANTITY = """
WITH mm AS (SELECT MIN(l_quantity) lo, MAX(l_quantity) hi FROM lineitem)
SELECT CAST(LEAST(FLOOR((l_quantity - mm.lo) * 10.0 / (mm.hi - mm.lo)), 9.0) AS BIGINT) AS bin,
       COUNT(*) AS cnt
FROM lineitem, mm GROUP BY 1
"""


def range_overlap_search(sf_dir: str, q_lo: str = "1995-01-01", q_hi: str = "1995-12-31"):
    """J5 numerical/temporal join search: per customer, score the overlap
    of their order-date range with the query range using the reference's
    painless-script formula (min(lte)-max(gte)+1)/query_coverage
    (apiserver/search/join.py:150-252), top 20 by score desc, key asc."""
    from ray.data.aggregate import Max, Min

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    ranges = ds.groupby("o_custkey").aggregate(
        Min("o_orderdate", alias_name="lo"), Max("o_orderdate", alias_name="hi")
    )

    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    qsec_lo = (datetime.datetime.fromisoformat(q_lo) - epoch).total_seconds()
    qsec_hi = (datetime.datetime.fromisoformat(q_hi) - epoch).total_seconds()
    qcov = qsec_hi - qsec_lo + 1.0

    def score(batch: pa.Table) -> pa.Table:
        lo = pc.cast(
            pc.cast(batch["lo"], pa.timestamp("s")), pa.int64()
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        hi = pc.cast(
            pc.cast(batch["hi"], pa.timestamp("s")), pa.int64()
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        overlap = np.minimum(hi, qsec_hi) - np.maximum(lo, qsec_lo) + 1.0
        sc = overlap / qcov
        keep = sc > 0
        from auctus_ray.util import round6
        sc6 = round6(sc[keep])
        return pa.table(
            {
                "o_custkey": pa.array(
                    batch["o_custkey"].to_numpy(zero_copy_only=False)[keep]
                ),
                "score": pa.array(sc6, pa.float64()),
            }
        )

    return (
        ranges.map_batches(score, batch_format="pyarrow")
        .sort(["score", "o_custkey"], descending=[True, False])
        .limit(20)
    )


SQL_RANGE_OVERLAP_SEARCH = """
WITH r AS (
  SELECT o_custkey, MIN(o_orderdate) lo, MAX(o_orderdate) hi FROM orders GROUP BY 1
),
s AS (
  SELECT o_custkey,
         (LEAST(epoch(hi), epoch(TIMESTAMP '1995-12-31 00:00:00'))
          - GREATEST(epoch(lo), epoch(TIMESTAMP '1995-01-01 00:00:00')) + 1.0)
         / (epoch(TIMESTAMP '1995-12-31 00:00:00') - epoch(TIMESTAMP '1995-01-01 00:00:00') + 1.0)
           AS raw
  FROM r
)
SELECT o_custkey, ROUND(raw, 6) AS score FROM s WHERE raw > 0
ORDER BY score DESC, o_custkey ASC LIMIT 20
"""


def orders_with_line_aggs(sf_dir: str):
    """J1+A9: left-cardinality-preserving join — orders joined to
    per-order lineitem aggregates (reference join keeps every left row
    and aggregates the right side back, augmentation.py:250-336).

    Scale path (round-2 rewrite): the per-order aggregate side is one
    row PER ORDER — fact-table-sized, so it is NOT broadcast. Both sides
    meet in a hash-partitioned Dataset.join on the order key; orders
    without lineitems surface as nulls from the left-outer join and are
    filled with 0 (the reference's left-cardinality semantics)."""
    import ray

    from ray.data.aggregate import Count, Sum

    from auctus_ray.util import join_partitions

    line_aggs = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "qty": pc.cast(b["l_quantity"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("l_orderkey")
        .aggregate(Sum("qty", alias_name="sum_qty"), Count(alias_name="n_lines"))
    )
    from auctus_ray.util import drop_schema_metadata

    orders = drop_schema_metadata(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    )
    joined = orders.join(
        line_aggs,
        "left_outer",
        num_partitions=join_partitions(32),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "sum_qty": pc.fill_null(pc.cast(batch["sum_qty"], pa.int64()), 0),
                "n_lines": pc.fill_null(pc.cast(batch["n_lines"], pa.int64()), 0),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


SQL_ORDERS_WITH_LINE_AGGS = """
SELECT o.o_orderkey,
       COALESCE(CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT), 0) AS sum_qty,
       COUNT(l.l_orderkey) AS n_lines
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey
"""


def customer_order_aggs_spec(sf_dir: str):
    """The augment join with a USER-SPECIFIED per-column aggregation map
    (the reference's `agg_functions` knob, augmentation.py:250-336):
    customers augmented with their orders' totalprice aggregated five
    ways and o_orderstatus by reference-style `first` (data order
    defined by the globally-unique o_orderkey), outputs renamed
    "{agg} {col}". Left rows with no match keep nulls (the reference's
    left-join NaN semantics). Exercises functions/augment.py:
    aggregate_join end-to-end."""
    import ray

    from auctus_ray.functions.augment import aggregate_join
    from auctus_ray.pipelines.relational import _cents as _rel_cents

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus"],
    ).map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b["o_custkey"],
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "price_cents": _rel_cents(b["o_totalprice"]),
                "o_orderstatus": b["o_orderstatus"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    joined = aggregate_join(
        cust,
        orders,
        left_on="c_custkey",
        right_on="o_custkey",
        agg_spec={
            "price_cents": ["mean", "sum", "max", "min", "count"],
            "o_orderstatus": "first",
        },
        order_col="o_orderkey",
    )
    keep = [
        "c_custkey",
        "mean price_cents",
        "sum price_cents",
        "max price_cents",
        "min price_cents",
        "count price_cents",
        "first o_orderstatus",
    ]
    return joined.map_batches(lambda t: t.select(keep), batch_format="pyarrow")


SQL_CUSTOMER_ORDER_AGGS_SPEC = """
WITH agg AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_c,
         COUNT(o_totalprice) AS cnt_c,
         CAST(MIN(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS min_c,
         CAST(MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS max_c,
         arg_min(o_orderstatus, o_orderkey) AS first_s
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey,
       CAST(a.sum_c AS DOUBLE) / CAST(a.cnt_c AS DOUBLE) AS "mean price_cents",
       a.sum_c AS "sum price_cents",
       a.max_c AS "max price_cents",
       a.min_c AS "min price_cents",
       a.cnt_c AS "count price_cents",
       a.first_s AS "first o_orderstatus"
FROM customer c LEFT JOIN agg a ON c.c_custkey = a.o_custkey
"""


QUERIES = {
    "profile_orders": profile_orders,
    "profile_documents": profile_documents,
    "profile_stats_orders": profile_stats_orders,
    "profile_stats_documents": profile_stats_documents,
    "histogram_quantity": histogram_quantity,
    "range_overlap_search": range_overlap_search,
    "orders_with_line_aggs": orders_with_line_aggs,
    "customer_order_aggs_spec": customer_order_aggs_spec,
}

SQL = {
    "profile_stats_orders": SQL_PROFILE_STATS_ORDERS,
    "profile_stats_documents": SQL_PROFILE_STATS_DOCUMENTS,
    "histogram_quantity": SQL_HISTOGRAM_QUANTITY,
    "range_overlap_search": SQL_RANGE_OVERLAP_SEARCH,
    "orders_with_line_aggs": SQL_ORDERS_WITH_LINE_AGGS,
    "customer_order_aggs_spec": SQL_CUSTOMER_ORDER_AGGS_SPEC,
}


# dataset-level type labels (reference types.py:54-57)
DATASET_NUMERICAL = "numerical"
DATASET_CATEGORICAL = "categorical"
DATASET_SPATIAL = "spatial"
DATASET_TEMPORAL = "temporal"


def determine_dataset_type(structural: str, semantic_types) -> str | None:
    """One column's dataset-type contribution (reference
    profile_types.py:360-384): spatial structural/semantic types win,
    then temporal, categorical, numerical. Our profiler emits GeoPoint
    / GeoShape / latitude / longitude / ADMIN / address (the last only
    when a Nominatim geocoder is configured) for the spatial sets."""
    from auctus_ray.functions.admin import T_ADMIN
    from auctus_ray.functions.geocode import T_ADDRESS

    if structural in (T_GEO_POINT, T_GEO_POLYGON):
        return DATASET_SPATIAL
    if any(
        t in (T_LATITUDE, T_LONGITUDE, T_ADMIN, T_ADDRESS)
        for t in semantic_types
    ):
        return DATASET_SPATIAL
    if T_DATE_TIME in semantic_types:
        return DATASET_TEMPORAL
    if T_CATEGORICAL in semantic_types:
        return DATASET_CATEGORICAL
    if structural in (T_INTEGER, T_FLOAT):
        return DATASET_NUMERICAL
    return None
