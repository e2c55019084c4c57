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
    "augmentation_search", "profile_stats_orders", "bm25_topk_incremental",
    "bm25_filtered_topk", "bm25_facets_lang", "lang_id",
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


def test_asof_join_semantics(ray_session):
    """AS-OF join: latest right row at-or-before each left ts per key;
    no prior row -> nulls; exact-ts match counts; tie on ts -> greatest
    payload wins (deterministic)."""
    import ray.data
    import pyarrow as pa

    from auctus_ray.functions.windows import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([7, 7, 7, 9], pa.int64()),
                "ts_us": pa.array([100, 205, 50, 500], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([7, 7, 7, 8], pa.int64()),
                "ts_us": pa.array([100, 200, 200, 1], pa.int64()),
                "signup_event_id": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
    )
    out = (
        asof_join(left, right, key="user_id", ts_col="ts_us",
                  right_cols=["signup_event_id"], right_suffix="_s")
        .to_pandas()
        .set_index("event_id")
    )
    assert out.loc[1, "ts_us_s"] == 100 and out.loc[1, "signup_event_id_s"] == 10
    # tie at ts=200: greatest signup_event_id (12) wins
    assert out.loc[2, "ts_us_s"] == 200 and out.loc[2, "signup_event_id_s"] == 12
    # before any right row -> null
    assert out.loc[3, ["ts_us_s", "signup_event_id_s"]].isna().all()
    # user with NO right rows at all -> null
    assert out.loc[4, ["ts_us_s", "signup_event_id_s"]].isna().all()


def test_hopping_window_agg(ray_session):
    """Each event lands in exactly size/hop windows; counts add up."""
    import numpy as np
    import ray.data
    import pyarrow as pa

    from auctus_ray.functions.windows import hopping_window_agg

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = [base + np.timedelta64(m, "m") for m in (0, 10, 45, 75)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": pa.array([1.0, 2.0, 3.0, 4.0]),
            }
        )
    )
    out = hopping_window_agg(ds, "ts", "value", 60, 30).to_pandas()
    # 4 events x 2 windows = 8 exploded rows
    assert out["n_events"].sum() == 8
    got = dict(zip(out["window_start_us"], out["n_events"]))
    m30 = 30 * 60 * 1_000_000
    b = int(np.int64(base.astype("int64")))
    # window starting at t=0 contains events at 0,10,45 min
    assert got[b] == 3
    # window starting at -30min contains events at 0,10 min
    assert got[b - m30] == 2
    # window at +30min: events at 45,75; window at +60min: event at 75
    assert got[b + m30] == 2 and got[b + 2 * m30] == 1


def test_asof_join_large_ids_no_float_corruption(ray_session):
    """Right-side 64-bit ids above 2^53 survive the join exactly
    (regression: NaN-padded float64 roundtrip rounded them)."""
    import ray.data
    import pyarrow as pa

    from auctus_ray.functions.windows import asof_join

    big = 9_223_372_036_854_775_000  # > 2^53, near int64 max
    left = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "user_id": pa.array([7], pa.int64()),
                "ts_us": pa.array([100], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([7], pa.int64()),
                "ts_us": pa.array([50], pa.int64()),
                "signup_event_id": pa.array([big], pa.int64()),
            }
        )
    )
    out = asof_join(left, right, key="user_id", ts_col="ts_us",
                    right_cols=["signup_event_id"], right_suffix="_s").to_pandas()
    assert int(out.loc[0, "signup_event_id_s"]) == big


def test_asof_join_nonint_left_columns(ray_session):
    """Left tables with string payload columns survive the tagged union
    (right-side null placeholders are typed from the left schema)."""
    import ray.data
    import pyarrow as pa

    from auctus_ray.functions.windows import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([7, 7], pa.int64()),
                "ts_us": pa.array([100, 10], pa.int64()),
                "label": pa.array(["buy", "view"], pa.string()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([7], pa.int64()),
                "ts_us": pa.array([50], pa.int64()),
                "ref_id": pa.array([42], pa.int64()),
            }
        )
    )
    out = (
        asof_join(left, right, key="user_id", ts_col="ts_us",
                  right_cols=["ref_id"], right_suffix="_r")
        .to_pandas()
        .set_index("label")
    )
    assert out.loc["buy", "ref_id_r"] == 42
    assert out.loc["view"][["ts_us_r", "ref_id_r"]].isna().all()


def test_relational_join_path_planners(ray_session, con):
    """broadcast_threshold=0 forces the Dataset.join plans of
    revenue_by_nation and customers_without_orders; rows must match the
    DuckDB oracles exactly (same check the broadcast paths pass)."""
    from auctus_ray.pipelines.relational import (
        SQL_CUSTOMERS_WITHOUT_ORDERS,
        SQL_REVENUE_BY_NATION,
        customers_without_orders,
        revenue_by_nation,
    )

    got = _canon(revenue_by_nation(SF_DIR, broadcast_bytes=0).to_pandas())
    want = _canon(con.execute(SQL_REVENUE_BY_NATION).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got = _canon(
        customers_without_orders(SF_DIR, broadcast_bytes=0).to_pandas()
    )
    want = _canon(con.execute(SQL_CUSTOMERS_WITHOUT_ORDERS).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_simhash_and_fingerprint_probes(ray_session):
    """Planted-probe self-validation for the two rows-only dedup
    queries: the probe pairs/rows MUST be present and exact, so the
    driver's rows-only check cannot be vacuously green."""
    import hashlib

    import pyarrow as pa

    from auctus_ray.functions.textstats import fingerprint_batch
    from auctus_ray.pipelines.training import (
        FP_PROBE_TEXTS,
        doc_fingerprints,
        near_dup_simhash,
    )

    sim = near_dup_simhash(SF_DIR).to_pandas()
    pairs = dict(zip(zip(sim["id_a"], sim["id_b"]), sim["hamming"]))
    assert pairs.get((-1, 0)) == 0  # exact copy of doc 0
    assert pairs.get((-2, 1)) == 0  # exact copy of doc 1

    fp = doc_fingerprints(SF_DIR).to_pandas().set_index("doc_id")
    local = fingerprint_batch(
        pa.table(
            {
                "doc_id": pa.array([-1, -2], pa.int64()),
                "text": pa.array(list(FP_PROBE_TEXTS), pa.string()),
            }
        )
    ).to_pandas().set_index("doc_id")
    for pid, text in zip((-1, -2), FP_PROBE_TEXTS):
        assert fp.loc[pid, "content_sha256"] == hashlib.sha256(
            text.encode()
        ).hexdigest()
        assert fp.loc[pid, "fingerprint_min"] == local.loc[pid, "fingerprint_min"]


def test_augmentation_search_interleave(ray_session):
    """The combined endpoint must reproduce the reference's zip-interleave
    (join[i], union[i], ... then the longer tail; search/__init__.py:407-414)
    of its two component result lists."""
    from auctus_ray.pipelines.augsearch import augmentation_search
    from auctus_ray.pipelines.joinsearch import join_search_textual
    from auctus_ray.pipelines.unionsearch import union_search

    combined = augmentation_search(SF_DIR).to_pandas()
    j = join_search_textual(SF_DIR).to_pandas()
    u = union_search(SF_DIR).to_pandas()

    assert list(combined["rank"]) == list(range(1, len(combined) + 1))
    assert len(combined) == min(50, len(j) + len(u))
    # per-type order preserved, and types alternate while both lists last
    jt = combined[combined["aug_type"] == "join"]
    ut = combined[combined["aug_type"] == "union"]
    assert list(jt["dataset_id"])[: len(j)] == list(j["dataset_id"])[: len(jt)]
    assert list(ut["dataset_id"])[: len(u)] == list(u["cand_table"])[: len(ut)]
    both = min(len(j), len(u))
    head = list(combined["aug_type"])[: 2 * both]
    assert head == ["join", "union"] * both


def test_lang_id_planted_probes(ray_session):
    """lang_id's rows-only driver output must carry the four planted
    probe docs with their planted language predictions."""
    from auctus_ray.pipelines.training import LANG_PROBE_TEXTS, lang_id

    out = lang_id(SF_DIR).to_pandas().set_index("doc_id")
    for pid, lg in zip((-1, -2, -3, -4), ("en", "fr", "es", "de")):
        assert out.loc[pid, "lang_pred"] == lg
    assert set(LANG_PROBE_TEXTS) == {"en", "fr", "es", "de"}


def test_segsrc_stale_temp_not_reused(ray_session):
    """A crashed split attempt leaves a partial .temp dir; the retry
    must start clean (rmtree first) or the committed split contains
    BOTH the stale partial and the fresh files -> duplicated docs in
    the incremental segments."""
    import hashlib
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from auctus_ray.pipelines.fulltext import (
        _CACHE_ROOT, _docs_segments_root, bm25_topk_incremental,
    )
    from auctus_ray.state.manifest import file_fingerprint

    sf_dir = "/root/testdata/sf0.001"
    src = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.ParquetFile(src).metadata.num_rows
    tag = hashlib.sha256(
        (sf_dir + file_fingerprint([src])).encode()
    ).hexdigest()[:12]
    split_dir = os.path.join(_CACHE_ROOT, f"docs_segsrc_{tag}.cache")
    root = os.path.join(_CACHE_ROOT, f"docs_segroot_{tag}.cache")
    shutil.rmtree(split_dir, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    # plant a stale partial block from a "crashed" earlier attempt
    stale = os.path.join(split_dir + ".temp", "a")
    os.makedirs(stale, exist_ok=True)
    pq.write_table(
        pq.read_table(src).slice(0, 5), os.path.join(stale, "stale.parquet")
    )
    _docs_segments_root(sf_dir)
    total = sum(
        pq.ParquetFile(os.path.join(dp, f)).metadata.num_rows
        for dp, _, fs in os.walk(split_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    assert total == n_docs  # no duplicated rows from the stale block
    out = bm25_topk_incremental(sf_dir)
    assert len(out) == 10
