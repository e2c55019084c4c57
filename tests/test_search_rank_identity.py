"""THE correctness gate: engine top-k must be rank-identical to the
brute-force oracle — same docIDs, bit-identical float64 BM25 scores,
ties broken by ascending docID — on the reference query set, for both
the WAND path (pruned) and the exhaustive scan path."""

import numpy as np
import pyarrow as pa
import pytest

from auctus_ray.index.search import BatchSearcher, Searcher
from auctus_ray.sources.code_corpus import generate_query_set


@pytest.fixture(scope="module")
def searcher(built_index):
    return Searcher(built_index.index_dir)


def _queries():
    qs = generate_query_set()
    return list(
        zip(
            qs["qid"].to_pylist(),
            qs["query"].to_pylist(),
            qs["k"].to_pylist(),
            qs["operator"].to_pylist(),
        )
    )


@pytest.mark.parametrize("algorithm", ["auto", "wand", "scan"])
def test_rank_identity_all_queries(searcher, oracle_small, algorithm):
    for qid, q, k, op in _queries():
        od, oscore = oracle_small.search(q, k=k, operator=op)
        ed, escore = searcher.search(q, k=k, operator=op, algorithm=algorithm)
        assert len(od) == len(ed), (qid, q)
        assert (od == ed).all(), (qid, q, od[:5], ed[:5])
        # bit-identical float64 (shared float discipline, SURVEY.md §7.4)
        assert (oscore == escore).all(), (qid, q)


def test_scores_sorted_and_ties_by_docid(searcher):
    d, s = searcher.search("the license", k=50, operator="or")
    assert (np.diff(s) <= 0).all()
    for i in range(len(s) - 1):
        if s[i] == s[i + 1]:
            assert d[i] < d[i + 1]


def test_absent_term_and_empty_query(searcher):
    d, s = searcher.search("zzznotaterm", k=10, operator="and")
    assert d.size == 0
    d, s = searcher.search("zzznotaterm the", k=10, operator="and")
    assert d.size == 0  # conjunctive: any missing term -> empty
    d, s = searcher.search("", k=10)
    assert d.size == 0
    d, s = searcher.search("!!!", k=10)
    assert d.size == 0


def test_or_with_missing_term_matches_present_term(searcher, oracle_small):
    od, osc = oracle_small.search("zzznotaterm license", k=10, operator="or")
    ed, esc = searcher.search("zzznotaterm license", k=10, operator="or")
    assert (od == ed).all() and (osc == esc).all()
    assert ed.size > 0


def test_k_larger_than_matches(searcher, oracle_small):
    od, osc = oracle_small.search("rareterm10x", k=50, operator="and")
    ed, esc = searcher.search("rareterm10x", k=50, operator="and")
    assert len(ed) == len(od) and len(ed) >= 1
    assert (od == ed).all() and (osc == esc).all()


def test_camelcase_query_matches_after_split(searcher, oracle_small):
    """'getHttpResponse' splits to [get, http, response] — reference
    expand_attribute_name semantics applied at query time too."""
    ed, _ = searcher.search("getHttpResponse", k=10, operator="and")
    od, _ = oracle_small.search("getHttpResponse", k=10, operator="and")
    assert (ed == od).all()


def test_batch_searcher_actor_pool(ray_session, built_index, oracle_small):
    """Distributed query serving: QUERY_SET dataset -> actor-pool
    map_batches -> TOPK_RESULT dataset; equals oracle row-for-row."""
    import ray.data

    qs = generate_query_set()
    ds = ray.data.from_arrow(qs)
    out = ds.map_batches(
        BatchSearcher,
        fn_constructor_kwargs={"index_dir": built_index.index_dir},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    )
    got = out.to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    expect = (
        oracle_small.topk_table(qs)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pa_got = pa.Table.from_pandas(got)
    pa_expect = pa.Table.from_pandas(expect)
    assert pa_got.equals(pa_expect)


def test_distributed_shard_searcher(ray_session, built_index, oracle_small):
    """Per-query shard fan-out (actor tasks + merge-sort reduce) must be
    rank-identical to the oracle too."""
    from auctus_ray.index.search import DistributedSearcher

    ds = DistributedSearcher(built_index.index_dir, n_actors=3)
    try:
        for qid, q, k, op in _queries():
            od, osc = oracle_small.search(q, k=k, operator=op)
            ed, esc = ds.search(q, k=k, operator=op)
            assert len(od) == len(ed), (qid, q)
            assert (od == ed).all() and (osc == esc).all(), (qid, q)
    finally:
        ds.shutdown()


def test_randomized_queries_rank_identity(searcher, oracle_small):
    """Fuzz: 40 random queries drawn from the corpus vocabulary (plus
    absent terms), random k/operator — engine must stay bit-identical
    to the oracle on every algorithm path."""
    import numpy as np

    rng = np.random.default_rng(1234)
    vocab = sorted(oracle_small.postings.keys())
    for trial in range(40):
        n_terms = int(rng.integers(1, 5))
        terms = list(rng.choice(vocab, n_terms, replace=False))
        if trial % 5 == 0:
            terms.append("zz_absent_term")
        q = " ".join(terms)
        k = int(rng.choice([1, 3, 10, 50]))
        op = "and" if rng.random() < 0.5 else "or"
        od, osc = oracle_small.search(q, k=k, operator=op)
        for alg in ("auto", "wand", "scan"):
            ed, esc = searcher.search(q, k=k, operator=op, algorithm=alg)
            assert len(od) == len(ed), (q, k, op, alg)
            assert (od == ed).all(), (q, k, op, alg)
            assert (osc == esc).all(), (q, k, op, alg)


def test_filters_facets_pagination(searcher, oracle_small):
    """ES filter context / terms aggs / from+size, mirrored: filtered
    search, facet counts, and offset pagination all match the oracle."""
    # filters
    for q, op in [("the license", "or"), ("def return", "and")]:
        for langs in (["python"], ["python", "md"], ["go"]):
            od, osc = oracle_small.search(q, k=20, operator=op,
                                          filters={"lang": langs})
            ed, esc = searcher.search(q, k=20, operator=op,
                                      filters={"lang": langs})
            assert (od == ed).all() and (osc == esc).all(), (q, langs)
    # facets over all matches
    od, osc, ofac = oracle_small.search("license", k=5, operator="or",
                                        facet_by="lang")
    ed, esc, efac = searcher.search("license", k=5, operator="or",
                                    facet_by="lang")
    assert (od == ed).all() and ofac == efac and sum(efac.values()) > 0
    # pagination: page 2 == ranks 10..19 of a deep search
    full, _ = searcher.search("the", k=30, operator="or")
    page2, _ = searcher.search("the", k=10, operator="or", offset=10)
    assert (page2 == full[10:20]).all()
    op2, _ = oracle_small.search("the", k=10, operator="or", offset=10)
    assert (page2 == op2).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        searcher.search("the", k=6000, offset=5000)


def test_distributed_filters_facets(ray_session, built_index, oracle_small):
    from auctus_ray.index.search import DistributedSearcher

    ds = DistributedSearcher(built_index.index_dir, n_actors=2)
    try:
        od, osc, ofac = oracle_small.search(
            "license", k=10, operator="or", filters={"lang": ["python", "go"]},
            facet_by="lang",
        )
        ed, esc, efac = ds.search(
            "license", k=10, operator="or", filters={"lang": ["python", "go"]},
            facet_by="lang",
        )
        assert (od == ed).all() and (osc == esc).all() and ofac == efac
    finally:
        ds.shutdown()


def test_multi_field_search_with_boosts(ray_session, tmp_path):
    """ES multi_match most_fields with boosts (reference id^10/name^3):
    per-field BM25 summed with boosts over shared content-derived
    docIDs; verified against a hand-computed multi-field oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from auctus_ray.index.build import build_index
    from auctus_ray.index.oracle import OracleIndex
    from auctus_ray.index.search import MultiFieldSearcher

    rows = {
        "repo": [f"r/{i}" for i in range(10)],
        "path": [
            "search/engine.py", "search/index.py", "util/strings.py",
            "util/math.py", "core/engine.py", "core/loop.py",
            "docs/readme.md", "docs/search.md", "a/b.py", "a/c.py",
        ],
        "commit": [f"c{i}" for i in range(10)],
        "lang": ["python"] * 10,
        "content": [
            "the search engine indexes documents",
            "index building for the engine",
            "string utilities and helpers",
            "math helpers for scoring",
            "engine core loop",
            "event loop internals",
            "readme about the project",
            "how search works",
            "miscellaneous one",
            "miscellaneous two",
        ],
    }
    t = pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})
    src = str(tmp_path / "mf.parquet")
    pq.write_table(t, src)
    idx_content = str(tmp_path / "idx_content")
    idx_path = str(tmp_path / "idx_path")
    build_index([src], idx_content, n_shards=2)
    build_index([src], idx_path, n_shards=2, content_col="path")

    mf = MultiFieldSearcher(
        {"content": (idx_content, 1.0), "path": (idx_path, 3.0)}
    )
    d, s = mf.search("search engine", k=5, operator="or")
    assert d.size > 0

    # oracle: per-field OracleIndex scores summed with boosts, field order
    o_content = OracleIndex(t)
    t_path = t.set_column(t.schema.get_field_index("content"), "content", t["path"])
    o_path = OracleIndex(t_path)
    exp: dict[int, float] = {}
    for oracle, boost in ((o_content, 1.0), (o_path, 3.0)):
        od, osc = oracle.search("search engine", k=10000, operator="or")
        for did, sc in zip(od.tolist(), osc.tolist()):
            exp[did] = exp.get(did, 0.0) + boost * sc
    items = sorted(exp.items(), key=lambda x: (-x[1], x[0]))[:5]
    assert d.tolist() == [x for x, _ in items]
    assert s.tolist() == [y for _, y in items]

    # cross-fields AND: 'search engine' both present somewhere per doc
    d_and, _ = mf.search("search engine", k=10, operator="and")
    assert set(d_and.tolist()) <= set(d.tolist())
    assert d_and.size >= 1


def test_prefix_wildcard_queries(searcher, oracle_small):
    """pars* expands against the term dictionary (df-capped) and scores
    as the equivalent OR query — identical to expanding via the oracle's
    vocabulary."""
    from auctus_ray.index.search import PrefixExpander

    pe = PrefixExpander(searcher, max_terms=5)
    expanded = pe.expand("re")
    assert expanded and all(t.startswith("re") for t in expanded)
    # oracle-side expansion from its own vocabulary, df-capped at 5
    vocab = sorted(t for t in oracle_small.postings if t.startswith("re"))
    by_df = sorted(vocab, key=lambda t: (-len(oracle_small.postings[t]), t))[:5]
    assert sorted(by_df) == expanded

    d, s = pe.search("re*", k=20)
    od, osc = oracle_small.search(" ".join(expanded), k=20, operator="or")
    assert (d == od).all() and (s == osc).all()

    # mixed literal + wildcard
    d2, s2 = pe.search("license re*", k=10)
    od2, osc2 = oracle_small.search(
        " ".join(sorted(set(expanded) | {"license"})), k=10, operator="or"
    )
    assert (d2 == od2).all() and (s2 == osc2).all()
    # no match
    d3, _ = pe.search("zzznope*", k=5)
    assert d3.size == 0


def test_filtered_wand_rank_identity(searcher, oracle_small):
    """Round 2: plain filters no longer force the exhaustive scan — they
    ride WAND/AND as a score-time mask over the shard-local docmap
    slice. Every algorithm must agree with the oracle under filters."""
    for q, op in [("the license", "or"), ("def return", "and"),
                  ("import license copyright", "or")]:
        for langs in (["python"], ["python", "md", "go"],):
            od, osc = oracle_small.search(q, k=15, operator=op,
                                          filters={"lang": langs})
            for alg in ("wand", "scan", "auto"):
                ed, esc = searcher.search(q, k=15, operator=op,
                                          algorithm=alg,
                                          filters={"lang": langs})
                assert (od == ed).all() and (osc == esc).all(), (q, op, alg, langs)
    # the per-shard layout keeps no n_docs-sized global attribute array
    assert not hasattr(searcher, "_doc_mask")
    for (shard_file, attr), (base, codes, values) in getattr(
        searcher, "_attr_cache", {}
    ).items():
        assert codes.size < searcher.n_docs  # shard slice, not global


def test_cross_fields_blended_scoring(ray_session, tmp_path):
    """ES cross_fields parity: blended df = max over fields, per-term
    dismax across fields, AND = every term in >=1 field. Verified
    bit-for-bit against a brute-force oracle computed from the
    OracleIndex internals with the same formula."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from auctus_ray.index.build import build_index
    from auctus_ray.index.codec import bm25_idf
    from auctus_ray.index.oracle import OracleIndex
    from auctus_ray.index.search import CrossFieldsSearcher
    from auctus_ray import B, K1

    rows = {
        "repo": [f"r/{i}" for i in range(8)],
        "path": [
            "search/engine.py", "search/index.py", "util/strings.py",
            "core/engine.py", "core/loop.py", "docs/search.md",
            "a/engine_test.py", "a/c.py",
        ],
        "commit": [f"c{i}" for i in range(8)],
        "lang": ["python"] * 8,
        "content": [
            "the search engine indexes documents",
            "index building for the engine",
            "string utilities and helpers",
            "engine core loop",
            "event loop internals",
            "how search works in the engine",
            "tests for the engine search paths",
            "miscellaneous",
        ],
    }
    t = pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})
    src = str(tmp_path / "cf.parquet")
    pq.write_table(t, src)
    idx_content = str(tmp_path / "cf_content")
    idx_path = str(tmp_path / "cf_path")
    build_index([src], idx_content, n_shards=2)
    build_index([src], idx_path, n_shards=2, content_col="path")

    cf = CrossFieldsSearcher(
        {"content": (idx_content, 1.0), "path": (idx_path, 3.0)}
    )

    # oracle over OracleIndex internals, same blended formula
    o_content = OracleIndex(t)
    t_path = t.set_column(t.schema.get_field_index("content"), "content", t["path"])
    o_path = OracleIndex(t_path)
    oracles = [("content", o_content, 1.0), ("path", o_path, 3.0)]

    def oracle_cross(query, k, operator):
        terms = sorted(set(
            __import__("auctus_ray.tokenize", fromlist=["tokenize_text"])
            .tokenize_text(query, "code")
        ))
        per_doc: dict[int, list[float]] = {}
        n_terms = 0
        for term in terms:
            df_b = max(len(o.postings.get(term, {})) for _, o, _ in oracles)
            if df_b == 0:
                if operator == "and":
                    return np.empty(0, np.int64), np.empty(0, np.float64)
                continue
            n_terms += 1
            idf_b = float(bm25_idf(float(df_b), o_content.n_docs))
            best: dict[int, float] = {}
            for _, o, boost in oracles:
                for did, tf in o.postings.get(term, {}).items():
                    dl = float(o._dl_by_doc[did])
                    tfn = tf / (tf + K1 * (1.0 - B + B * dl / o.avgdl))
                    v = boost * idf_b * tfn
                    if v > best.get(did, -1.0):
                        best[did] = v
            for did, v in best.items():
                per_doc.setdefault(did, []).append(v)
        items = []
        for did, vs in per_doc.items():
            if operator == "and" and len(vs) != n_terms:
                continue
            s = 0.0
            for v in vs:  # appended in term order
                s += v
            items.append((did, s))
        items.sort(key=lambda x: (-x[1], x[0]))
        items = items[:k]
        return (
            np.array([d for d, _ in items], np.int64),
            np.array([s for _, s in items], np.float64),
        )

    for q in ("search engine", "engine", "search core loop", "engine util"):
        for op in ("and", "or"):
            d, s = cf.search(q, k=6, operator=op)
            od, osc = oracle_cross(q, 6, op)
            assert d.tolist() == od.tolist(), (q, op)
            assert s.tolist() == osc.tolist(), (q, op)
    # a doc matching all terms only ACROSS fields must survive AND:
    # row 2 has 'util', 'strings', 'py' in its path but not in content
    from auctus_ray.index.docid import assign_doc_ids_local

    docid_row2 = int(assign_doc_ids_local(t)[2])
    d, _ = cf.search("util strings py", k=8, operator="and")
    assert docid_row2 in d.tolist()


def test_distributed_multifield_matches_local(ray_session, tmp_path):
    """DistributedMultiFieldSearcher (per-shard actor fan-out) returns
    bit-identical (docIDs, scores) to the single-process searcher in
    BOTH modes — the blended/per-field statistics are global, so shard
    restriction must not change any score."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from auctus_ray.index.build import build_index
    from auctus_ray.index.search import (
        CrossFieldsSearcher,
        DistributedMultiFieldSearcher,
        MultiFieldSearcher,
    )

    rows = {
        "repo": [f"r/{i}" for i in range(10)],
        "path": [
            "search/engine.py", "search/index.py", "util/strings.py",
            "core/engine.py", "core/loop.py", "docs/search.md",
            "a/engine_test.py", "a/c.py", "b/query_planner.py",
            "b/merge_sort.py",
        ],
        "commit": [f"c{i}" for i in range(10)],
        "lang": ["python"] * 10,
        "content": [
            "the search engine indexes documents",
            "index building for the engine",
            "string utilities and helpers",
            "engine core loop",
            "event loop internals",
            "how search works in the engine",
            "tests for the engine search paths",
            "miscellaneous",
            "query planning and the merge step",
            "merge sort for partial results",
        ],
    }
    t = pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})
    src = str(tmp_path / "dmf.parquet")
    pq.write_table(t, src)
    idx_content = str(tmp_path / "dmf_content")
    idx_path = str(tmp_path / "dmf_path")
    build_index([src], idx_content, n_shards=4)
    build_index([src], idx_path, n_shards=4, content_col="path")
    fields = {"content": (idx_content, 1.0), "path": (idx_path, 3.0)}

    locals_ = {
        "cross_fields": CrossFieldsSearcher(fields),
        "most_fields": MultiFieldSearcher(fields),
    }
    queries = ("search engine", "engine", "merge sort", "query engine util")
    for mode, local in locals_.items():
        dist = DistributedMultiFieldSearcher(fields, mode=mode, n_actors=3)
        try:
            for q in queries:
                for op in ("and", "or"):
                    ld, ls = local.search(q, k=6, operator=op)
                    dd, ds_ = dist.search(q, k=6, operator=op)
                    assert ld.tolist() == dd.tolist(), (mode, q, op)
                    assert ls.tolist() == ds_.tolist(), (mode, q, op)
        finally:
            dist.shutdown()

    # mismatched shard layouts are rejected, not silently mis-merged
    idx_bad = str(tmp_path / "dmf_bad")
    build_index([src], idx_bad, n_shards=2, content_col="path")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        DistributedMultiFieldSearcher(
            {"content": (idx_content, 1.0), "path": (idx_bad, 3.0)}
        )


def test_distributed_hydrate_matches_local(ray_session, built_index, searcher):
    """DistributedSearcher.hydrate_hits (per-shard docmap slices) ==
    module-level hydrate_hits (whole-docmap filtered read)."""
    from auctus_ray.index.search import DistributedSearcher, hydrate_hits

    d, s = searcher.search("license", k=8, operator="or")
    assert d.size > 0
    local = hydrate_hits(built_index.index_dir, d, s)
    ds = DistributedSearcher(built_index.index_dir, n_actors=2)
    try:
        dist = ds.hydrate_hits(d, s)
    finally:
        ds.shutdown()
    lp = local.to_pandas().sort_index(axis=1)
    dp = dist.to_pandas().sort_index(axis=1)
    assert list(lp.columns) == list(dp.columns)
    assert lp.equals(dp)


def test_most_fields_per_field_analyzers(ray_session, tmp_path):
    """Fields built with DIFFERENT analyzers each analyze the query with
    their own chain: a stemming field matches 'connections'->'connect'
    while a code field matches the literal token — both contribute
    (round-3 fix: the query was analyzed once with the first field's
    analyzer, silently zeroing differently-analyzed fields)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from auctus_ray.index.build import build_index
    from auctus_ray.index.docid import assign_doc_ids_local
    from auctus_ray.index.search import MultiFieldSearcher

    rows = {
        "repo": [f"r/{i}" for i in range(4)],
        "path": [
            "connections/util.py",  # literal 'connections' in path
            "a/b.py",
            "c/d.py",
            "e/f.py",
        ],
        "commit": [f"c{i}" for i in range(4)],
        "lang": ["python"] * 4,
        "content": [
            "unrelated words here",
            "connecting services together",  # stems to 'connect'
            "more unrelated text",
            "even more filler",
        ],
    }
    t = pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})
    src = str(tmp_path / "pf.parquet")
    pq.write_table(t, src)
    idx_content = str(tmp_path / "pf_content")
    idx_path = str(tmp_path / "pf_path")
    build_index([src], idx_content, n_shards=1, analyzer="text_en")
    build_index([src], idx_path, n_shards=1, content_col="path", analyzer="code")

    mf = MultiFieldSearcher(
        {"content": (idx_content, 1.0), "path": (idx_path, 1.0)}
    )
    d, s = mf.search("connections", k=4, operator="or")
    ids = assign_doc_ids_local(t)
    # row 0 matches via the code-analyzed path, row 1 via the stemmed content
    assert {int(ids[0]), int(ids[1])} <= set(d.tolist())


def test_k0_facet_only_query(searcher):
    """Regression: k=0 (facet-/count-only) crashed the scan kernel
    (empty-slice min) and WAND (heap[0] on an empty heap)."""
    d, s, counts0 = searcher.search(
        "the license", k=0, operator="or", facet_by="lang"
    )
    assert d.size == 0 and s.size == 0
    _, _, counts10 = searcher.search(
        "the license", k=10, operator="or", facet_by="lang"
    )
    assert counts0 == counts10 and counts0
    for alg in ("scan", "wand"):
        d, s = searcher.search(
            "the license", k=0, operator="and", algorithm=alg
        )
        assert d.size == 0 and s.size == 0


def test_oracle_facet_missing_bucket(oracle_small):
    """Null attribute values bucket as '__missing__' in the oracle,
    matching the engine's facet key (regression: the oracle used None)."""
    import pyarrow.parquet as pq

    from auctus_ray.index.oracle import OracleIndex

    # rebuild a small oracle with one null lang
    tbl = oracle_small  # fixture is the oracle itself; build fresh corpus
    corpus = pa.table(
        {
            "repo": pa.array(["r1", "r1"], pa.string()),
            "path": pa.array(["a.py", "b.py"], pa.string()),
            "commit": pa.array(["c1", "c1"], pa.string()),
            "content": pa.array(["alpha beta", "alpha gamma"], pa.string()),
            "lang": pa.array(["py", None], pa.string()),
        }
    )
    o = OracleIndex(corpus)
    _, _, counts = o.search("alpha", k=10, operator="or", facet_by="lang")
    assert counts == {"py": 1, "__missing__": 1}


def test_prefix_wildcard_on_stemmed_index(ray_session, tmp_path):
    """Regression: expanded dictionary terms are already index terms;
    re-analyzing them re-stems (Porter is not idempotent: 'univers' ->
    'univ') and zeroed out wildcard queries on stemmed indexes."""
    import pyarrow.parquet as pq

    from auctus_ray.index.build import build_index
    from auctus_ray.index.search import PrefixExpander, Searcher

    corpus = pa.table(
        {
            "repo": pa.array(["r"] * 4, pa.string()),
            "path": pa.array([f"f{i}.txt" for i in range(4)], pa.string()),
            "commit": pa.array(["c"] * 4, pa.string()),
            "lang": pa.array(["txt"] * 4, pa.string()),
            "content": pa.array(
                [
                    "the university of somewhere has agreed terms",
                    "another university agreed as well",
                    "nothing relevant here at all",
                    "universal truths are agreeable",
                ],
                pa.string(),
            ),
        }
    )
    src = tmp_path / "src.parquet"
    pq.write_table(corpus, str(src))
    idx = str(tmp_path / "idx")
    build_index([str(src)], idx, n_shards=2, analyzer="code_stem")
    pe = PrefixExpander(Searcher(idx))
    d, s = pe.search("univer*", k=10)
    assert d.size == 3  # both 'university' docs + 'universal'
    d2, s2 = pe.search("agre*", k=10)
    assert d2.size == 3


def test_postings_cache_lru_bound(built_index):
    """The per-(shard, term) postings/dense cache evicts at the byte
    budget instead of growing without bound in long-lived actors —
    results stay identical after eviction."""
    tight = Searcher(built_index.index_dir, postings_cache_bytes=1 << 14)
    ref = Searcher(built_index.index_dir)
    queries = ["the license", "parser error", "return value", "search index"]
    from auctus_ray.index.search import _postings_entry_nbytes

    for q in queries * 2:
        d1, s1 = tight.search(q, k=10, operator="or")
        d2, s2 = ref.search(q, k=10, operator="or")
        assert (d1 == d2).all() and (s1 == s2).all()
        total = sum(
            _postings_entry_nbytes(e)
            for e in tight._postings_cache.values()
        )
        # bound holds up to one entry of slack (eviction keeps >= 1)
        assert total <= (1 << 14) + max(
            (_postings_entry_nbytes(e) for e in tight._postings_cache.values()),
            default=0,
        )
    assert len(ref._postings_cache) > len(tight._postings_cache)
