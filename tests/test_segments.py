"""Multi-segment incremental indexing (index/segments.py): merged-stats
search must be rank-identical to a monolithic rebuild — same documents,
bit-identical float64 BM25 scores — across algorithms; deletes mask
results without touching stats (Lucene live-docs), and compaction
purges them (stats then match a filtered monolithic build)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from auctus_ray.index.search import Searcher
from auctus_ray.index.segments import (
    SegmentedSearcher,
    add_segment,
    compact,
    delete_docs,
    load_segments,
)
from auctus_ray.sources.code_corpus import generate_query_set


def _hydrated(searcher, hydrate, query, k, operator, algorithm="auto"):
    """[(repo, path, commit, score)] sorted by (-score, identity) — the
    docID-free comparison key (segmented and monolithic builds assign
    different engine docIDs to the same documents)."""
    d, s = searcher.search(query, k=k, operator=operator, algorithm=algorithm)
    t = hydrate(d, s)
    rows = [
        (r["repo"], r["path"], r["commit"], r["score"])
        for r in t.to_pylist()
    ]
    return sorted(rows, key=lambda r: (-r[3], r[0], r[1], r[2]))


def _assert_topk_equivalent(seg, ref, ctx):
    """Bit-identical score sequences; identical documents above the
    k-boundary score. WITHIN the boundary tie group membership is
    legitimately underdetermined (ties break on engine docID, which
    differs across physical builds), so only its size is compared."""
    assert [r[3] for r in seg] == [r[3] for r in ref], ctx
    if not seg:
        return
    s_min = seg[-1][3]
    seg_above = [r for r in seg if r[3] > s_min]
    ref_above = [r for r in ref if r[3] > s_min]
    assert seg_above == ref_above, ctx
    assert len(seg) == len(ref), ctx


@pytest.fixture(scope="module")
def seg_root(ray_session, small_corpus, tmp_path_factory):
    """Two segments over the same 4-file corpus the monolithic
    built_index fixture indexes (2 files each)."""
    d, paths = small_corpus
    root = str(tmp_path_factory.mktemp("seg_root"))
    add_segment(root, paths[:2], n_shards=4, files_per_group=2)
    add_segment(root, paths[2:], n_shards=4, files_per_group=2)
    return root


@pytest.fixture(scope="module")
def seg_searcher(seg_root):
    return SegmentedSearcher(seg_root)


def test_merged_stats_match_monolithic(seg_searcher, built_index):
    mono = Searcher(built_index.index_dir)
    assert seg_searcher.n_docs == mono.n_docs
    assert seg_searcher.n_tokens == mono.n_tokens
    assert seg_searcher.avgdl == mono.avgdl  # bit-identical division
    qs = generate_query_set()
    terms = sorted(
        {t for q in qs["query"].to_pylist() for t in q.lower().split()}
    )
    assert seg_searcher.dfs(terms) == mono.dfs(terms)


@pytest.mark.parametrize("algorithm", ["auto", "wand", "scan"])
def test_rank_identity_vs_monolithic(seg_searcher, built_index, algorithm):
    from auctus_ray.index.search import hydrate_hits

    mono = Searcher(built_index.index_dir)
    qs = generate_query_set()
    for qid, q, k, op in zip(
        qs["qid"].to_pylist(), qs["query"].to_pylist(),
        qs["k"].to_pylist(), qs["operator"].to_pylist(),
    ):
        seg = _hydrated(
            seg_searcher, seg_searcher.hydrate_hits, q, k, op, algorithm
        )
        ref = _hydrated(
            mono, lambda d, s: hydrate_hits(built_index.index_dir, d, s),
            q, k, op, algorithm,
        )
        _assert_topk_equivalent(seg, ref, (qid, q, algorithm))


def test_filters_and_facets_merge(seg_searcher, built_index):
    mono = Searcher(built_index.index_dir)
    langs = ["python", "go"]
    sd, ss, sfac = seg_searcher.search(
        "the license", k=20, operator="or",
        filters={"lang": langs}, facet_by="lang",
    )
    md, ms, mfac = mono.search(
        "the license", k=20, operator="or",
        filters={"lang": langs}, facet_by="lang",
    )
    assert (ss == ms).all()
    assert sfac == mfac


def test_offset_pagination(seg_searcher):
    d0, s0 = seg_searcher.search("the", k=20, operator="or")
    d1, s1 = seg_searcher.search("the", k=10, operator="or", offset=10)
    assert (d0[10:] == d1).all() and (s0[10:] == s1).all()


def test_add_is_idempotent(seg_root, small_corpus):
    _, paths = small_corpus
    before = load_segments(seg_root)
    add_segment(seg_root, paths[:2], n_shards=4, files_per_group=2)
    assert load_segments(seg_root) == before


def test_registration_crash_heals(seg_root, small_corpus):
    """Lost segments.json (crash between build and commit): the next
    identical add re-registers instantly via build resume."""
    _, paths = small_corpus
    before = load_segments(seg_root)
    os.remove(os.path.join(seg_root, "segments.json"))
    add_segment(seg_root, paths[:2], n_shards=4, files_per_group=2)
    add_segment(seg_root, paths[2:], n_shards=4, files_per_group=2)
    assert load_segments(seg_root) == before


def test_compact_swap_is_atomic(ray_session, small_corpus, tmp_path_factory,
                                monkeypatch):
    """A crash during compact's registration swap must never leave the
    merged segment AND its sources simultaneously registered (that
    state duplicates documents and inflates df/n_docs). The merged
    segment registers in the SAME atomic segments.json write that drops
    the sources — so a crash before the swap leaves only the original
    sources plus an orphan directory, and retrying completes."""
    import auctus_ray.index.segments as segmod

    _, paths = small_corpus
    root = str(tmp_path_factory.mktemp("seg_atomic"))
    add_segment(root, paths[:2], n_shards=2, files_per_group=2)
    add_segment(root, paths[2:], n_shards=2, files_per_group=2)
    before = load_segments(root)
    assert len(before) == 2

    real = segmod._atomic_json

    def crash_on_swap(path, obj):
        if path.endswith(segmod.SEGMENTS_FILE):
            raise RuntimeError("simulated crash during swap")
        return real(path, obj)

    monkeypatch.setattr(segmod, "_atomic_json", crash_on_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact(root, n_shards=2)
    monkeypatch.setattr(segmod, "_atomic_json", real)

    # pre-swap crash: registration unchanged — never merged+sources both
    assert load_segments(root) == before
    s = SegmentedSearcher(root)
    d, _ = s.search("the license", k=50, operator="or")
    hits = s.hydrate_hits(d, _[: len(d)]).to_pylist()
    keys = [(r["repo"], r["path"], r["commit"]) for r in hits]
    assert len(keys) == len(set(keys))  # no duplicated documents

    # retry completes: exactly one registered segment, same corpus size
    compact(root, n_shards=2)
    after = load_segments(root)
    assert len(after) == 1
    assert after[0]["n_docs"] == sum(e["n_docs"] for e in before)


def test_wand_bound_safety_mixed_avgdl(ray_session, tmp_path_factory):
    """Segments with very different document lengths: the merged avgdl
    exceeds the short segment's build avgdl, so its stored block-max
    bounds UNDERESTIMATE true contributions — the bound rescale must
    keep WAND pruning safe (wand == scan exactly)."""
    from auctus_ray.sources.code_corpus import generate_corpus

    d1 = str(tmp_path_factory.mktemp("seg_short"))
    d2 = str(tmp_path_factory.mktemp("seg_long"))
    p1 = generate_corpus(d1, n_rows=400, rows_per_file=200, mean_tokens=20)
    p2 = generate_corpus(d2, n_rows=400, rows_per_file=200, mean_tokens=300)
    root = str(tmp_path_factory.mktemp("seg_mixed"))
    add_segment(root, p1, n_shards=2)
    add_segment(root, p2, n_shards=2)
    s = SegmentedSearcher(root)
    assert any(x.tfnorm_bound_scale > 1.0 for x in s.searchers)
    for q, op in [
        ("the license", "or"), ("def return", "and"), ("import the", "or"),
    ]:
        dw, sw = s.search(q, k=50, operator=op, algorithm="wand")
        de, se = s.search(q, k=50, operator=op, algorithm="scan")
        assert (dw == de).all() and (sw == se).all(), q


@pytest.fixture(scope="module")
def del_root(ray_session, small_corpus, tmp_path_factory):
    """Fresh segmented root for the delete/compact lifecycle."""
    _, paths = small_corpus
    root = str(tmp_path_factory.mktemp("seg_del"))
    add_segment(root, paths[:2], n_shards=4, files_per_group=2)
    add_segment(root, paths[2:], n_shards=4, files_per_group=2)
    return root


def test_delete_masks_results_not_stats(seg_root, small_corpus, tmp_path):
    root = seg_root
    s0 = SegmentedSearcher(root)
    d, sc = s0.search("the license", k=5, operator="or")
    top = s0.hydrate_hits(d, sc).to_pylist()[0]
    delete_docs(root, [top["path"]], column="path")
    try:
        s1 = SegmentedSearcher(root)
        # stats untouched (Lucene live-docs semantics)
        assert s1.n_docs == s0.n_docs and s1.avgdl == s0.avgdl
        for alg in ("wand", "scan"):
            d1, sc1 = s1.search("the license", k=5, operator="or", algorithm=alg)
            paths1 = {r["path"] for r in s1.hydrate_hits(d1, sc1).to_pylist()}
            assert top["path"] not in paths1
        # surviving docs keep their exact scores, shifted up one rank
        d1, sc1 = s1.search("the license", k=4, operator="or")
        assert (sc1 == sc[1:]).all()
        assert s1.stats()["n_deleted"] == 1
    finally:
        os.remove(os.path.join(root, "deletes.json"))


def test_compact_purges_deletes(del_root, small_corpus, tmp_path_factory):
    """After compaction the tombstoned doc is gone from the corpus, and
    the compacted index is rank-identical (bit-identical scores) to a
    monolithic build over the filtered corpus."""
    from auctus_ray.index.build import build_index
    from auctus_ray.index.search import hydrate_hits

    _, paths = small_corpus
    root = del_root
    s0 = SegmentedSearcher(root)
    d, sc = s0.search("the license", k=3, operator="or")
    victim = s0.hydrate_hits(d, sc).to_pylist()[0]["path"]
    delete_docs(root, [victim], column="path")
    compact(root, n_shards=4, files_per_group=2)

    entries = load_segments(root)
    assert len(entries) == 1
    assert not os.path.exists(os.path.join(root, "deletes.json"))

    s1 = SegmentedSearcher(root)
    assert s1.n_docs == s0.n_docs - 1

    # filtered monolithic reference build
    filt_dir = str(tmp_path_factory.mktemp("filt_corpus"))
    fps = []
    for i, p in enumerate(paths):
        t = pq.read_table(p)
        mask = pa.compute.not_equal(t["path"], victim)
        fp = os.path.join(filt_dir, f"part-{i}.parquet")
        pq.write_table(t.filter(mask), fp)
        fps.append(fp)
    mono = build_index(
        fps, str(tmp_path_factory.mktemp("idx_filt")), n_shards=4,
        files_per_group=2,
    )
    ms = Searcher(mono.index_dir)
    assert s1.n_docs == ms.n_docs and s1.avgdl == ms.avgdl
    for q, op in [("the license", "or"), ("def return", "and")]:
        seg = _hydrated(s1, s1.hydrate_hits, q, 20, op)
        ref = _hydrated(
            ms, lambda dd, ss: hydrate_hits(mono.index_dir, dd, ss), q, 20, op
        )
        _assert_topk_equivalent(seg, ref, q)


def test_distributed_segmented_equals_local(seg_root, seg_searcher):
    """Per-(segment, shard-group) actor fan-out must reproduce the
    local segmented search exactly — same global docIDs, bit-identical
    scores, same merged facets."""
    from auctus_ray.index.segments import DistributedSegmentedSearcher

    dist = DistributedSegmentedSearcher(seg_root, n_actors=3)
    try:
        qs = generate_query_set()
        for qid, q, k, op in zip(
            qs["qid"].to_pylist(), qs["query"].to_pylist(),
            qs["k"].to_pylist(), qs["operator"].to_pylist(),
        ):
            ld, ls = seg_searcher.search(q, k=k, operator=op)
            dd, dsc = dist.search(q, k=k, operator=op)
            assert (ld == dd).all() and (ls == dsc).all(), (qid, q)
        ld, ls, lf = seg_searcher.search(
            "the license", k=15, operator="or",
            filters={"lang": ["python", "go"]}, facet_by="lang",
        )
        dd, dsc, df_ = dist.search(
            "the license", k=15, operator="or",
            filters={"lang": ["python", "go"]}, facet_by="lang",
        )
        assert (ld == dd).all() and (ls == dsc).all() and lf == df_
    finally:
        dist.shutdown()


def test_small_segment_fast_path_parity(ray_session, tiny_corpus, tmp_path_factory):
    """The in-process small-segment build must be OUTPUT-IDENTICAL to
    the distributed build_index: same global stats, same dfs, same
    docIDs and bit-identical scores on every query."""
    from auctus_ray.index.build import build_index
    from auctus_ray.index.segments import _build_small_segment
    from auctus_ray.state.manifest import file_fingerprint, fingerprint

    _, paths = tiny_corpus
    dist = build_index(
        paths, str(tmp_path_factory.mktemp("idx_dist")), n_shards=4,
        files_per_group=2,
    )
    fast = _build_small_segment(
        sorted(paths), str(tmp_path_factory.mktemp("idx_fast")),
        analyzer="code", n_buckets=4, column_map=None,
        content_col="content", params_fp="t",
    )
    assert (fast.n_docs, fast.n_tokens, fast.n_terms, fast.n_shards) == (
        dist.n_docs, dist.n_tokens, dist.n_terms, dist.n_shards
    )
    assert fast.avgdl == dist.avgdl
    sd = Searcher(dist.index_dir)
    sf = Searcher(fast.index_dir)
    qs = generate_query_set()
    terms = sorted({t for q in qs["query"].to_pylist() for t in q.lower().split()})
    assert sf.dfs(terms) == sd.dfs(terms)
    for qid, q, k, op in zip(
        qs["qid"].to_pylist(), qs["query"].to_pylist(),
        qs["k"].to_pylist(), qs["operator"].to_pylist(),
    ):
        dd, ds_ = sd.search(q, k=k, operator=op)
        fd, fs_ = sf.search(q, k=k, operator=op)
        assert (dd == fd).all() and (ds_ == fs_).all(), (qid, q)

    # resume: a second call with the same fingerprint is a no-op read
    again = _build_small_segment(
        sorted(paths), fast.index_dir, analyzer="code", n_buckets=4,
        column_map=None, content_col="content", params_fp="t",
    )
    assert again.n_docs == fast.n_docs and again.avgdl == fast.avgdl


def test_tiered_maybe_compact(ray_session, tmp_path_factory):
    """Partial (tiered) merge: the small tail folds into one segment,
    the big segment is untouched, search results stay bit-identical
    (same corpus, same merged stats), and a full compact still purges
    tombstones afterwards."""
    from auctus_ray.index.segments import maybe_compact
    from auctus_ray.sources.code_corpus import generate_corpus

    root = str(tmp_path_factory.mktemp("seg_tiered"))
    big_dir = str(tmp_path_factory.mktemp("tier_big"))
    big = generate_corpus(big_dir, n_rows=600, rows_per_file=600,
                          mean_tokens=60, seed=89)
    add_segment(root, big, n_shards=2)
    for i in range(4):
        d = str(tmp_path_factory.mktemp(f"tier_small{i}"))
        p = generate_corpus(d, n_rows=60, rows_per_file=60,
                            mean_tokens=60, seed=200 + i)
        add_segment(root, p, n_shards=1)
    assert len(load_segments(root)) == 5
    before = SegmentedSearcher(root)
    bd, bs = before.search("the license", k=30, operator="or")
    b_keys = [
        (r["repo"], r["path"], r["commit"])
        for r in before.hydrate_hits(bd, bs).to_pylist()
    ]

    assert maybe_compact(root, max_segments=3) is not None
    entries = load_segments(root)
    assert len(entries) == 3  # 2 big kept + 1 merged tail
    big_entry = max(entries, key=lambda e: e["n_docs"])
    assert big_entry["n_docs"] == 600  # untouched
    after = SegmentedSearcher(root)
    ad, as_ = after.search("the license", k=30, operator="or")
    a_keys = [
        (r["repo"], r["path"], r["commit"])
        for r in after.hydrate_hits(ad, as_).to_pylist()
    ]
    assert (bs == as_).all() and b_keys == a_keys

    # under the threshold: no-op
    assert maybe_compact(root, max_segments=3) is None


def test_empty_segment_is_harmless(ray_session, tmp_path_factory):
    """A zero-row segment (e.g. a discovery drain over an empty source)
    neither crashes the add nor perturbs merged search."""
    from auctus_ray.sources.code_corpus import generate_corpus

    root = str(tmp_path_factory.mktemp("seg_empty"))
    d1 = str(tmp_path_factory.mktemp("seg_e1"))
    p1 = generate_corpus(d1, n_rows=80, rows_per_file=80, mean_tokens=40)
    add_segment(root, p1, n_shards=1)

    t = pq.read_table(p1[0]).slice(0, 0)
    empty_path = str(tmp_path_factory.mktemp("seg_e0") / "empty.parquet")
    pq.write_table(t, empty_path)
    add_segment(root, [empty_path], n_shards=1)
    assert len(load_segments(root)) == 2

    s = SegmentedSearcher(root)
    mono = Searcher(
        add_segment(
            str(tmp_path_factory.mktemp("mono_e")), p1, n_shards=1
        ).index_dir
    )
    d, sc = s.search("the license", k=10, operator="or")
    md, ms = mono.search("the license", k=10, operator="or")
    assert (sc == ms).all() and len(d) == len(md)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    cuts=st.lists(st.integers(min_value=1, max_value=149), min_size=0,
                  max_size=4, unique=True),
    data=st.data(),
)
def test_property_any_split_matches_monolithic(
    ray_session, tmp_path_factory, cuts, data
):
    """PROPERTY: for ANY partition of a corpus into segments, merged-
    stats search returns bit-identical scores to the monolithic build
    (the fast path makes per-example builds cheap)."""
    from auctus_ray.index.segments import _build_small_segment
    from auctus_ray.sources.code_corpus import generate_corpus

    base = tmp_path_factory.mktemp("prop")
    src = generate_corpus(str(base / "src"), n_rows=150, rows_per_file=150,
                          mean_tokens=30)
    full = pq.read_table(src[0])
    bounds = sorted(set(cuts)) + [150]
    lo = 0
    parts = []
    for i, hi in enumerate(bounds):
        if hi <= lo:
            continue
        p = str(base / f"part{i}.parquet")
        pq.write_table(full.slice(lo, hi - lo), p)
        parts.append(p)
        lo = hi
    root = str(base / "root")
    for p in parts:
        add_segment(root, [p], n_shards=2)
    seg = SegmentedSearcher(root)
    mono = Searcher(
        add_segment(str(base / "mono"), src, n_shards=2).index_dir
    )
    q = data.draw(st.sampled_from(
        ["the license", "def return", "import class function", "the"]
    ))
    op = data.draw(st.sampled_from(["or", "and"]))
    sd, ss = seg.search(q, k=25, operator=op)
    md, ms = mono.search(q, k=25, operator=op)
    assert (ss == ms).all(), (cuts, q, op)


def test_distributed_segmented_synonyms_equal_local(seg_root):
    """Synonym maps must reach the shard-group ACTORS: a worker without
    the map re-tokenizes the query unexpanded and silently drops
    expansion-only matches. distributed == local under synonyms."""
    from auctus_ray.index.segments import (
        DistributedSegmentedSearcher,
        SegmentedSearcher,
    )

    # 'zzzqqq' exists nowhere: every hit for it comes ONLY through the
    # expansion — an actor without the map would return nothing
    syn = {"license": ["copyright"], "zzzqqq": ["def"]}
    local = SegmentedSearcher(seg_root, synonyms=syn)
    dist = DistributedSegmentedSearcher(seg_root, n_actors=3, synonyms=syn)
    try:
        for q, op in [("the license", "or"), ("zzzqqq", "or"), ("license", "and")]:
            ld, ls = local.search(q, k=20, operator=op)
            dd, dsc = dist.search(q, k=20, operator=op)
            assert (ld == dd).all() and (ls == dsc).all(), q
        # non-vacuous: the expansion-only query actually returns hits
        sd_, _ = local.search("zzzqqq", k=20, operator="or")
        assert len(sd_) > 0
        plain = SegmentedSearcher(seg_root)
        pd_, _ = plain.search("zzzqqq", k=20, operator="or")
        assert len(pd_) == 0
    finally:
        dist.shutdown()


def test_compact_src_dirs_garbage_collected(
    ray_session, small_corpus, tmp_path_factory
):
    """Each tombstone-purging compact materializes a filtered corpus
    copy (compact-src-*); once no registered segment references one it
    must be removed, or N delete+compact cycles keep ~N corpus copies."""
    import glob as _glob

    from auctus_ray.index.segments import (
        add_segment, compact, delete_docs, load_segments,
    )

    _, paths = small_corpus
    root = str(tmp_path_factory.mktemp("gc_root"))
    add_segment(root, paths[:2], n_shards=2, files_per_group=2)
    add_segment(root, paths[2:], n_shards=2, files_per_group=2)

    seg0 = SegmentedSearcher(root)
    d0, _ = seg0.search("the", k=2, operator="or")
    victims = seg0.hydrate_hits(d0, np.zeros(len(d0)))["path"].to_pylist()

    delete_docs(root, [victims[0]], column="path")
    compact(root, n_shards=2)
    assert len(_glob.glob(os.path.join(root, "segments", "compact-src-*"))) == 1

    delete_docs(root, [victims[1]], column="path")
    compact(root, n_shards=2)
    # the first cycle's rewrite dir is no longer referenced -> gone
    srcs = _glob.glob(os.path.join(root, "segments", "compact-src-*"))
    assert len(srcs) == 1
    entries = load_segments(root)
    assert len(entries) == 1
    assert all(p.startswith(srcs[0] + os.sep) for p in entries[0]["inputs"])


def test_tokenize_text_matches_array_unicode(ray_session):
    """tokenize_text now delegates to the vectorized path — Unicode
    special-casing (U+0130) no longer splits query tokenization away
    from index tokenization."""
    import pyarrow as pa

    from auctus_ray.tokenize import tokenize_array, tokenize_text

    for text in ("İstanbul fooBar", "STRASSE straße", "ĀĒĪ v2Api"):
        for an in ("code", "simple", "code_stem", "text_en"):
            assert (
                tokenize_text(text, an)
                == tokenize_array(pa.array([text]), an)[0].as_py()
            ), (text, an)


def test_stem_list_array_sliced(ray_session):
    import pyarrow as pa

    from auctus_ray.tokenize import stem_list_array, tokenize_array

    arr = tokenize_array(
        pa.array(["running dogs", "jumped quickly", "universities agreed"]),
        "code",
    )
    assert stem_list_array(arr.slice(1)).to_pylist() == [
        ["jump", "quickli"], ["univers", "agre"],
    ]


def test_readd_after_compact_never_duplicates(ray_session, tmp_path):
    """Regression: delete -> compact -> re-add of the SAME content
    registered a duplicate full segment next to the merged (filtered)
    copy — duplicate hits and inflated df/n_docs. The merged entry now
    remembers what it absorbed and the re-add no-ops."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from auctus_ray.index.segments import (
        SegmentedSearcher,
        add_segment,
        compact,
        delete_docs,
        load_segments,
    )

    src = tmp_path / "src.parquet"
    pq.write_table(
        pa.table(
            {
                "repo": pa.array(["r"] * 4),
                "path": pa.array([f"d{i}" for i in range(4)]),
                "commit": pa.array(["c"] * 4),
                "lang": pa.array(["t"] * 4),
                "content": pa.array(
                    ["alpha beta", "alpha gamma", "beta gamma", "alpha delta"]
                ),
            }
        ),
        str(src),
    )
    root = str(tmp_path / "root")
    add_segment(root, [str(src)], n_shards=2)
    delete_docs(root, ["d1"], column="path")
    compact(root, n_shards=2)
    # re-add identical content: must NO-OP (no new segment, no dupes,
    # no resurrection of the purged doc)
    res = add_segment(root, [str(src)], n_shards=2)
    assert res.metrics.get("noop_existing_segment")
    assert len(load_segments(root)) == 1
    ids, scores = SegmentedSearcher(root).search("alpha", k=10, operator="or")
    assert len(ids) == len(set(ids.tolist())) == 2  # d0, d3 (d1 purged)


def test_mixed_analyzer_root_rejected(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from auctus_ray.index.segments import add_segment, compact

    src = tmp_path / "s.parquet"
    pq.write_table(
        pa.table(
            {
                "repo": pa.array(["r"]), "path": pa.array(["p"]),
                "commit": pa.array(["c"]), "lang": pa.array(["t"]),
                "content": pa.array(["fooBar baz"]),
            }
        ),
        str(src),
    )
    root = str(tmp_path / "root")
    add_segment(root, [str(src)], n_shards=2, analyzer="code")
    with _pytest.raises(ValueError, match="analyzer"):
        add_segment(root, [str(src)], n_shards=2, analyzer="simple")
    with _pytest.raises(ValueError, match="selects no segments"):
        compact(root, only=[])


def test_falsy_facet_by_returns_empty_facets(ray_session, seg_root):
    from auctus_ray.index.segments import SegmentedSearcher

    s = SegmentedSearcher(seg_root)
    out = s.search("!!!", k=5, operator="or", facet_by=[])
    assert len(out) == 2 and out[0].size == 0  # normalized to no-facet
