"""Build pipeline: docID determinism, forward map, sha256 invariant,
global stats, manifest checkpointing + resume."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from auctus_ray.index.docid import assign_doc_ids_local


def _read_dir(d):
    return pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(os.path.join(d, "**/*.parquet"), recursive=True))]
    )


def test_docids_match_local_reference(built_index, small_corpus):
    """Distributed dense rank == single-process rank (bit-identical)."""
    d, paths = small_corpus
    corpus = pa.concat_tables([pq.read_table(p) for p in paths])
    expected = assign_doc_ids_local(corpus)
    docmap = _read_dir(os.path.join(built_index.index_dir, "docmap"))
    got = {}
    for r, p, c, did in zip(
        docmap["repo"].to_pylist(),
        docmap["path"].to_pylist(),
        docmap["commit"].to_pylist(),
        docmap["doc_id"].to_pylist(),
    ):
        got[(r, p, c)] = did
    for i in range(corpus.num_rows):
        key = (
            corpus["repo"][i].as_py(),
            corpus["path"][i].as_py(),
            corpus["commit"][i].as_py(),
        )
        assert got[key] == expected[i]
    # dense: exactly 0..N-1
    ids = np.sort(docmap["doc_id"].to_numpy(zero_copy_only=False))
    assert (ids == np.arange(corpus.num_rows)).all()


def test_sha256_per_row_invariant(built_index, small_corpus):
    """The per-row invariant from the graft contract: sha256(content)."""
    import hashlib

    d, paths = small_corpus
    corpus = pa.concat_tables([pq.read_table(p) for p in paths])
    docmap = _read_dir(os.path.join(built_index.index_dir, "docmap"))
    by_key = {
        (r, p, c): s
        for r, p, c, s in zip(
            docmap["repo"].to_pylist(),
            docmap["path"].to_pylist(),
            docmap["commit"].to_pylist(),
            docmap["sha256"].to_pylist(),
        )
    }
    for i in range(corpus.num_rows):
        key = (
            corpus["repo"][i].as_py(),
            corpus["path"][i].as_py(),
            corpus["commit"][i].as_py(),
        )
        expect = hashlib.sha256(
            (corpus["content"][i].as_py() or "").encode()
        ).hexdigest()
        assert by_key[key] == expect


def test_global_stats_vs_oracle(built_index, oracle_small):
    assert built_index.n_docs == oracle_small.n_docs
    assert built_index.avgdl == pytest.approx(oracle_small.avgdl, rel=0, abs=0)
    # df per term matches oracle for a sample of terms
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    ts = pads.dataset(
        os.path.join(built_index.index_dir, "term_stats"), format="parquet"
    )
    sample_terms = ["the", "def", "license", "get", "rareterm10x"]
    t = ts.to_table(filter=pc.field("term").isin(sample_terms))
    dfs = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
    for term in sample_terms:
        expect = len(oracle_small.postings.get(term, {}))
        assert dfs.get(term, 0) == expect, term


def test_resume_skips_completed_stages(ray_session, tiny_corpus, tmp_path):
    """Kill-and-resume: a second build over the same inputs re-runs nothing
    (fingerprints match); a build after deleting one stage re-runs only it."""
    from auctus_ray.index.build import build_index
    from auctus_ray.state.manifest import Manifest

    d, paths = tiny_corpus
    idx = str(tmp_path / "idx")
    r1 = build_index(paths, idx, n_shards=4, files_per_group=2)
    man1 = Manifest(idx)
    seqs1 = {(r["stage"], r["partition"]): r["seq"] for r in man1.records()}

    r2 = build_index(paths, idx, n_shards=4, files_per_group=2)
    man2 = Manifest(idx)
    # tokenize/bucket/docmap/postings/termstats records unchanged (skipped);
    # only the cheap 'global' summary is re-stamped
    for key, seq in seqs1.items():
        if key[0] != "global":
            assert man2._records[key]["seq"] == seq, key
    assert r2.n_docs == r1.n_docs and r2.n_terms == r1.n_terms

    # simulate a crash that lost the postings stage -> only it re-runs
    import shutil

    os.remove(os.path.join(idx, "shard_summary.parquet"))
    r3 = build_index(paths, idx, n_shards=4, files_per_group=2)
    man3 = Manifest(idx)
    assert man3._records[("encode", "all")]["seq"] > seqs1[("encode", "all")]
    for key, seq in seqs1.items():
        if key[0] in ("tokenize", "bucket_stats", "docmap"):
            assert man3._records[key]["seq"] == seq, key
    assert r3.n_terms == r1.n_terms


def test_build_metrics_present(built_index):
    m = built_index.metrics
    assert m["n_postings"] > 0
    assert m["postings_per_sec"] > 0
    assert "shard_skew_max_over_mean" in m
    assert m["shard_skew_max_over_mean"] < 3.0  # docID-range salting bounds skew


def test_duplicate_row_key_rejected(ray_session, tmp_path):
    from auctus_ray.index.build import build_index

    t = pa.table(
        {
            "repo": ["a/b", "a/b"],
            "path": ["x.py", "x.py"],
            "commit": ["c1", "c1"],
            "lang": ["python", "python"],
            "content": ["def f", "def g"],
        }
    )
    p = str(tmp_path / "dup.parquet")
    pq.write_table(t, p)
    with pytest.raises(Exception, match="duplicate"):
        build_index([p], str(tmp_path / "idx2"), n_shards=2)


def test_single_doc_corpus(ray_session, tmp_path):
    """Degenerate build: one document, one token class."""
    from auctus_ray.index.build import build_index
    from auctus_ray.index.search import Searcher

    t = pa.table(
        {
            "repo": ["r/solo"], "path": ["only.py"], "commit": ["c0"],
            "lang": ["python"], "content": ["def lonely(): return lonely"],
        }
    )
    p = str(tmp_path / "solo.parquet")
    pq.write_table(t, p)
    res = build_index([p], str(tmp_path / "solo_idx"), n_shards=2)
    assert res.n_docs == 1 and res.avgdl == 4.0
    s = Searcher(res.index_dir)
    d, sc = s.search("lonely", k=10, operator="and")
    assert d.tolist() == [0] and sc[0] > 0
    d, _ = s.search("absent", k=10, operator="and")
    assert d.size == 0


def test_all_empty_contents(ray_session, tmp_path):
    """Corpus where every content is empty: index builds, queries empty."""
    from auctus_ray.index.build import build_index
    from auctus_ray.index.search import Searcher

    t = pa.table(
        {
            "repo": ["a", "b"], "path": ["x", "y"], "commit": ["1", "2"],
            "lang": ["md", "md"], "content": ["", ""],
        }
    )
    p = str(tmp_path / "empty.parquet")
    pq.write_table(t, p)
    res = build_index([p], str(tmp_path / "empty_idx"), n_shards=2)
    assert res.n_docs == 2 and res.n_terms == 0
    s = Searcher(res.index_dir)
    d, _ = s.search("anything", k=5)
    assert d.size == 0


def test_incremental_input_reuses_tokenize(ray_session, tiny_corpus, tmp_path):
    """Adding corpus files re-tokenizes ONLY the new group (fingerprint
    checkpoints); the encode re-runs (dense docIDs are global ranks) and
    the merged index is correct — the reference's reprocess-on-change
    semantics (D5) at file-group granularity."""
    from auctus_ray.index.build import build_index
    from auctus_ray.index.oracle import OracleIndex
    from auctus_ray.index.search import Searcher
    from auctus_ray.state.manifest import Manifest
    from auctus_ray.sources.code_corpus import generate_corpus

    corpus_dir = str(tmp_path / "incr_corpus")
    paths = generate_corpus(corpus_dir, n_rows=200, rows_per_file=50, mean_tokens=60)
    idx = str(tmp_path / "incr_idx")
    r1 = build_index(paths, idx, n_shards=4, files_per_group=2)
    man1 = Manifest(idx)
    tok_seqs = {
        r["partition"]: r["seq"] for r in man1.records() if r["stage"] == "tokenize"
    }

    # grow the corpus in place: one new file; existing files regenerate
    # byte-identical (pure function of (seed, chunk)), fingerprints match
    all_paths = generate_corpus(corpus_dir, n_rows=250, rows_per_file=50, mean_tokens=60)
    r2 = build_index(all_paths, idx, n_shards=4, files_per_group=2)
    assert r2.n_docs == 250  # 200 original (shared prefix) + 50 new rows
    man2 = Manifest(idx)
    # original tokenize groups skipped (same fingerprints)
    for part, seq in tok_seqs.items():
        assert man2._records[("tokenize", part)]["seq"] == seq, part

    # correctness of the merged index vs oracle
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = pa.concat_tables([pq.read_table(p) for p in all_paths])
    oracle = OracleIndex(corpus)
    s = Searcher(idx)
    for q, op in [("the license", "or"), ("def return", "and"), ("rareterm240x", "and")]:
        od, osc = oracle.search(q, k=10, operator=op)
        ed, esc = s.search(q, k=10, operator=op)
        assert (od == ed).all() and (osc == esc).all(), q


def test_resumable_partitioned_write(ray_session, tmp_path):
    """Generic resumable sink: finished partitions are skipped on
    re-run; a changed input re-runs exactly its partition."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from auctus_ray.state.manifest import resumable_partitioned_write

    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):
        pq.write_table(
            pa.table({"x": pa.array([i * 10 + j for j in range(5)], pa.int64())}),
            str(src / f"in-{i}.parquet"),
        )
    parts = {
        "a": [str(src / "in-0.parquet"), str(src / "in-1.parquet")],
        "b": [str(src / "in-2.parquet"), str(src / "in-3.parquet")],
    }
    out = tmp_path / "out"
    calls = []

    def run(files, tmp_dir):
        calls.append(sorted(files))
        t = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        pq.write_table(
            pa.table({"doubled": pa.array([v * 2 for v in t["x"].to_pylist()])}),
            f"{tmp_dir}/data.parquet",
        )

    r1 = resumable_partitioned_write(parts, str(out), run)
    assert r1 == {"a": "done", "b": "done"} and len(calls) == 2

    # re-run: everything skipped, no extra work
    r2 = resumable_partitioned_write(parts, str(out), run)
    assert r2 == {"a": "skipped", "b": "skipped"} and len(calls) == 2

    # change ONE input (same size, different content) -> only its
    # partition re-runs (the content-digest fingerprint catches it)
    pq.write_table(
        pa.table({"x": pa.array([99, 98, 97, 96, 95], pa.int64())}),
        str(src / "in-3.parquet"),
    )
    r3 = resumable_partitioned_write(parts, str(out), run)
    assert r3 == {"a": "skipped", "b": "done"} and len(calls) == 3
    got = pq.read_table(str(out / "part=b" / "data.parquet"))["doubled"].to_pylist()
    assert got == [40, 42, 44, 46, 48, 198, 196, 194, 192, 190]


def test_rebuild_with_shrunk_input_drops_stale_groups(ray_session,
                                                      tiny_corpus, tmp_path):
    """Regression: rebuilding into an existing index_dir with fewer
    input files left the removed files' tokenized group dirs behind —
    bucket_stats/encode glob them and counted phantom docs (or crashed
    on duplicate row keys when files_per_group changed)."""
    from auctus_ray.index.build import build_index
    from auctus_ray.index.search import Searcher

    d, paths = tiny_corpus
    idx = str(tmp_path / "idx")
    r2 = build_index(paths, idx, n_shards=4, files_per_group=1)
    n_all = r2.n_docs
    # shrink the input set: only the first file remains
    r1 = build_index(paths[:1], idx, n_shards=4, files_per_group=1)
    assert r1.n_docs == pq.read_table(paths[0]).num_rows < n_all
    s = Searcher(idx)
    assert s.n_docs == r1.n_docs
    # regroup (files_per_group changes the group layout): no duplicate
    # corpus row keys, doc count unchanged
    r2b = build_index(paths, idx, n_shards=4, files_per_group=2)
    assert r2b.n_docs == n_all
