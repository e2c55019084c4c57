"""BM25 query serving: block-skip WAND top-k over index shards.

Replaces the reference's Elasticsearch query path — `multi_match` with
`operator: and` over BM25-scored fields (apiserver/apiserver/search/
__init__.py:67-79) and `TOP_K_SIZE=50` (search/base.py:1) — with an
explicit DAAT scorer over our sharded Parquet index:

  * shards are docID ranges (document-partitioned, as ES shards are), so
    every shard scores its own documents completely and the global top-k
    is a merge-sort reduce of per-shard top-k heaps;
  * per (term, shard) posting lists are delta+varint blocks with skip
    metadata (first/last docID) and per-block max-score components —
    blocks that are skipped are never decoded;
  * OR queries run WAND with suffix-max upper bounds (safe pruning: the
    prune threshold is deflated by 1e-10 relative slack to absorb
    float-summation order differences, so pruning can never change the
    top-k — verified by rank-identity tests vs the brute-force oracle);
  * AND queries run rarest-first conjunctive intersection with block
    skipping;
  * float discipline matches index/oracle.py: float64, contributions
    summed in lexicographic term order, ties broken by ascending docID.

Distributed serving: `BatchSearcher` is an actor-pool `map_batches`
callable — the index loads once per actor (`__init__`), query batches
stream through (`__call__`) — the reference's stateful-service pattern
(Lazo server / GeoData resolver, SURVEY.md §2.3 T1/T2) in Ray Data form.
"""

from __future__ import annotations

import glob
import heapq
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from auctus_ray import B, K1
from auctus_ray.index.codec import bm25_idf, decode_block, decode_blocks_concat
from auctus_ray.tokenize import tokenize_text

_PRUNE_SLACK = 1e-10  # relative; absorbs float sum-order differences


class _PostingList:
    """Iterator over one (term, shard) block list. Lazy block decode."""

    __slots__ = (
        "term",
        "idf",
        "first",
        "last",
        "ns",
        "blobs",
        "max_tfnorm",
        "suffix_max",
        "avgdl",
        "bi",
        "pos",
        "_docs",
        "_contrib",
        "cur_doc",
        "exhausted",
    )

    def __init__(self, term, idf, first, last, ns, blobs, max_tfnorm, avgdl):
        self.term = term
        self.idf = idf
        self.first = first
        self.last = last
        self.ns = ns
        self.blobs = blobs
        self.max_tfnorm = max_tfnorm
        self.suffix_max = np.maximum.accumulate(max_tfnorm[::-1])[::-1]
        self.avgdl = avgdl
        self.bi = -1
        self.pos = 0
        self._docs = None
        self._contrib = None
        self.cur_doc = -1
        self.exhausted = False
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= len(self.blobs):
            self.exhausted = True
            self.cur_doc = np.iinfo(np.int64).max
            return
        if bi != self.bi:
            doc_ids, tfs, dls = decode_block(self.blobs[bi], int(self.ns[bi]))
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            tfn = tf / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
            self._docs = doc_ids.astype(np.int64)
            self._contrib = self.idf * tfn
            self.bi = bi
        self.pos = 0
        self.cur_doc = int(self._docs[0])

    def upper_bound(self) -> float:
        """Max possible contribution for any doc >= cur_doc (safe)."""
        if self.exhausted:
            return 0.0
        return self.idf * float(self.suffix_max[self.bi])

    def cur_contrib(self) -> float:
        return float(self._contrib[self.pos])

    def next(self) -> None:
        if self.exhausted:
            return
        self.pos += 1
        if self.pos < self._docs.size:
            self.cur_doc = int(self._docs[self.pos])
        else:
            self._load_block(self.bi + 1)

    def advance_to(self, target: int) -> None:
        """Move to first doc >= target; skipped blocks are never decoded."""
        if self.exhausted or self.cur_doc >= target:
            return
        bi = self.bi
        if target > self.last[bi]:
            # block skip via metadata
            bi = int(np.searchsorted(self.last, target, side="left"))
            if bi >= len(self.blobs):
                self.exhausted = True
                self.cur_doc = np.iinfo(np.int64).max
                return
            self._load_block(bi)
        self.pos = int(np.searchsorted(self._docs, target, side="left"))
        if self.pos >= self._docs.size:  # can't happen if last[] correct
            self._load_block(self.bi + 1)
        else:
            self.cur_doc = int(self._docs[self.pos])


def _topk_push(heap, k, score, doc_id):
    """Heap of (score, -doc_id): root = worst (lowest score, then largest doc)."""
    if len(heap) < k:
        heapq.heappush(heap, (score, -doc_id))
        return
    if (score, -doc_id) > heap[0]:
        heapq.heapreplace(heap, (score, -doc_id))


def _wand_shard(plists: list[_PostingList], k: int, heap: list) -> None:
    """WAND over one shard's posting lists (OR semantics). Mutates heap."""
    live = [p for p in plists if not p.exhausted]
    while True:
        live = [p for p in live if not p.exhausted]
        if not live:
            return
        live.sort(key=lambda p: p.cur_doc)
        theta = heap[0][0] if len(heap) >= k else -np.inf
        # pivot selection with suffix-max upper bounds
        ub = 0.0
        pivot = -1
        thr = theta * (1.0 - _PRUNE_SLACK) if theta > 0 else theta
        for i, p in enumerate(live):
            ub += p.upper_bound()
            if ub > thr:
                pivot = i
                break
        if pivot < 0:
            return  # no doc can beat theta
        pivot_doc = live[pivot].cur_doc
        if live[0].cur_doc == pivot_doc:
            # all iterators at/before pivot are positioned at pivot_doc
            matching = [p for p in live if p.cur_doc == pivot_doc]
            matching.sort(key=lambda p: p.term)  # float discipline
            score = 0.0
            for p in matching:
                score += p.cur_contrib()
            _topk_push(heap, k, score, pivot_doc)
            for p in matching:
                p.next()
        else:
            # advance an iterator strictly before pivot_doc (progress is
            # guaranteed: live[0].cur_doc < pivot_doc in this branch);
            # pick the one with the largest upper bound
            behind = [p for p in live[:pivot] if p.cur_doc < pivot_doc]
            cand = max(behind, key=lambda p: p.upper_bound())
            cand.advance_to(pivot_doc)


def _and_shard(plists: list[_PostingList], k: int, heap: list) -> None:
    """Rarest-first conjunctive intersection with block skipping."""
    if any(p.exhausted for p in plists):
        return
    order = sorted(plists, key=lambda p: sum(p.ns))  # rarest leader
    by_term = sorted(plists, key=lambda p: p.term)
    lead = order[0]
    while not lead.cur_doc == np.iinfo(np.int64).max:
        d = lead.cur_doc
        ok = True
        for p in order[1:]:
            p.advance_to(d)
            if p.exhausted or p.cur_doc != d:
                ok = False
                # leader jumps to the blocker's position
                if not p.exhausted:
                    lead.advance_to(p.cur_doc)
                else:
                    return
                break
        if ok:
            score = 0.0
            for p in by_term:  # float discipline: term-sorted accumulation
                score += p.cur_contrib()
            _topk_push(heap, k, score, d)
            lead.next()
        if lead.exhausted:
            return


class Searcher:
    """Single-process searcher over a built index directory.

    Loads global stats eagerly; per-(term, shard) posting blocks are read
    on demand with Parquet row-group pruning (files are term-sorted with
    small row groups) and cached. Used directly in tests and wrapped in
    actor pools (`BatchSearcher`) for distributed serving.
    """

    def __init__(self, index_dir: str, synonyms: dict[str, list[str]] | None = None):
        # search-time-only synonym expansion, mirroring the reference's
        # default_search analyzer (synonym_graph applied at query time
        # only, elasticsearch.yml:16-31). Simplification: term-level OR
        # expansion; each expanded term scores with its own idf.
        self.synonyms = synonyms or {}
        self.index_dir = index_dir
        gs = pq.read_table(os.path.join(index_dir, "global_stats.parquet"))
        self.n_docs = int(gs["n_docs"][0].as_py())
        self.avgdl = float(gs["avgdl"][0].as_py())
        self.analyzer = gs["analyzer"][0].as_py()
        self.n_shards = int(gs["n_shards"][0].as_py())
        self.shard_files = sorted(
            glob.glob(os.path.join(index_dir, "postings", "shard=*.parquet"))
        )
        self._term_stats_ds = pads.dataset(
            os.path.join(index_dir, "term_stats"), format="parquet"
        )
        self._df_cache: dict[str, int] = {}
        self._postings_cache: dict[tuple[str, str], list | None] = {}

    # ---------------- term metadata ----------------

    def dfs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            if "term" not in self._term_stats_ds.schema.names:
                # empty vocabulary (e.g. all-empty corpus): Ray wrote a
                # schema-less part file for the empty aggregate
                for m in missing:
                    self._df_cache[m] = 0
                return {t: self._df_cache[t] for t in terms}
            t = self._term_stats_ds.to_table(
                columns=["term", "df"],
                filter=pc.field("term").isin(missing),
            )
            found = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
            for m in missing:
                self._df_cache[m] = int(found.get(m, 0))
        return {t: self._df_cache[t] for t in terms}

    # ---------------- postings ----------------

    def _shard_postings(self, shard_file: str, terms: list[str]) -> dict[str, dict]:
        """term -> block arrays for one shard (cached per term)."""
        out = {}
        missing = []
        for t in terms:
            key = (shard_file, t)
            if key in self._postings_cache:
                if self._postings_cache[key] is not None:
                    out[t] = self._postings_cache[key]
            else:
                missing.append(t)
        if missing:
            tbl = pq.read_table(
                shard_file,
                filters=pc.field("term").isin(missing),
                columns=["term", "block_id", "first_docid", "last_docid", "n", "blob", "max_tfnorm"],
            )
            tbl = tbl.sort_by([("term", "ascending"), ("block_id", "ascending")])
            terms_np = np.asarray(tbl["term"].to_pylist(), dtype=object)
            for t in missing:
                mask = terms_np == t
                if not mask.any():
                    self._postings_cache[(shard_file, t)] = None
                    continue
                idx = np.flatnonzero(mask)
                entry = {
                    "first": tbl["first_docid"].to_numpy(zero_copy_only=False)[idx],
                    "last": tbl["last_docid"].to_numpy(zero_copy_only=False)[idx],
                    "n": tbl["n"].to_numpy(zero_copy_only=False)[idx],
                    "blobs": [tbl["blob"][int(i)].as_py() for i in idx],
                    "max_tfnorm": tbl["max_tfnorm"].to_numpy(zero_copy_only=False)[idx],
                }
                self._postings_cache[(shard_file, t)] = entry
                out[t] = entry
        return out

    def term_docs(self, term: str) -> set[int]:
        """All docIDs containing term (decodes the term's postings)."""
        out: set[int] = set()
        for sf in self.shard_files:
            e = self._shard_postings(sf, [term]).get(term)
            if e:
                d, _, _ = decode_blocks_concat(e["blobs"], e["n"])
                out.update(int(x) for x in d)
        return out

    # ---------------- search ----------------

    def _attr_codes(self, attr: str) -> tuple[np.ndarray, list]:
        """Dense docID-indexed attribute codes from the forward map
        (loaded once; the ES 'keyword field' for filter context/facets).
        At larger scale this is a per-shard columnar read, not one array."""
        cached = getattr(self, "_attr_cache", None)
        if cached is None:
            cached = self._attr_cache = {}
        if attr not in cached:
            files = sorted(
                glob.glob(os.path.join(self.index_dir, "docmap", "*.parquet"))
            )
            tbl = pa.concat_tables(
                [pq.read_table(f, columns=["doc_id", attr]) for f in files]
            )
            enc = tbl[attr].combine_chunks().dictionary_encode()
            codes = np.full(self.n_docs, -1, dtype=np.int32)
            # null attribute values encode to null indices; keep them as
            # the -1 "missing" sentinel (to_numpy would smuggle them in
            # as NaN-cast garbage ints)
            idx = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
            codes[tbl["doc_id"].to_numpy(zero_copy_only=False)] = idx.astype(np.int32)
            cached[attr] = (codes, enc.dictionary.to_pylist())
        return cached[attr]

    def _doc_mask(self, filters: dict[str, list] | None) -> np.ndarray | None:
        """AND of keyword filters -> boolean mask over dense docIDs
        (reference filter context, apiserver/search/__init__.py:81-107)."""
        if not filters:
            return None
        mask = np.ones(self.n_docs, dtype=bool)
        for attr, allowed in filters.items():
            codes, values = self._attr_codes(attr)
            allowed_ids = np.array(
                [i for i, v in enumerate(values) if v in set(allowed)], dtype=np.int32
            )
            mask &= np.isin(codes, allowed_ids)
        return mask

    def search(
        self,
        query: str,
        k: int = 10,
        operator: str = "and",
        algorithm: str = "auto",
        filters: dict[str, list] | None = None,
        offset: int = 0,
        facet_by: str | None = None,
    ):
        """Top-k (doc_ids, scores), score desc then docID asc, float64.

        filters: keyword-attribute constraints ANDed with the text query
        (e.g. {"lang": ["python"]}); offset: pagination (offset+k capped
        at 10000, mirroring the reference's page*size guard,
        search/__init__.py:576-577); facet_by: attribute whose value
        counts over ALL matching docs are returned as a third element
        (ES terms aggs, search/__init__.py:587-603).
        """
        if offset + k > 10000:
            raise ValueError("offset + k must be <= 10000")
        base_terms = set(tokenize_text(query, self.analyzer))
        if self.synonyms:
            for t in list(base_terms):
                for syn in self.synonyms.get(t, ()):
                    base_terms.update(tokenize_text(syn, self.analyzer))
        terms = sorted(base_terms)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if facet_by:
            empty = (*empty, {})
        if not terms:
            return empty
        dfs = self.dfs(terms)
        if operator == "and" and any(dfs[t] == 0 for t in terms):
            return empty
        terms = [t for t in terms if dfs[t] > 0]
        if not terms:
            return empty
        idfs = {t: float(bm25_idf(float(dfs[t]), self.n_docs)) for t in terms}
        doc_mask = self._doc_mask(filters)
        facet_docs: list | None = [] if facet_by else None

        kk = k + offset
        heap: list = []
        for sf in self.shard_files:
            postings = self._shard_postings(sf, terms)
            if operator == "and" and len(postings) < len(terms):
                continue
            if not postings:
                continue
            alg = algorithm
            if alg == "auto":
                # conjunctive queries with a rare leader win from skip-based
                # intersection (decodes ~df_min blocks); everything else is
                # fastest fully vectorized (numpy decode + accumulate)
                if operator == "and" and len(postings) > 1:
                    dfs_here = [int(e["n"].sum()) for e in postings.values()]
                    alg = "wand" if min(dfs_here) * 10 < max(dfs_here) else "scan"
                else:
                    alg = "scan"
            if doc_mask is not None or facet_docs is not None:
                alg = "scan"  # filter/facet context runs on the dense path
            if alg == "scan":
                entries = [(t, idfs[t], e) for t, e in postings.items()]
                self._scan_shard_vectorized(
                    entries, self.avgdl, kk, heap, operator,
                    doc_mask=doc_mask, facet_docs=facet_docs,
                )
                continue
            plists = [
                _PostingList(
                    t,
                    idfs[t],
                    e["first"],
                    e["last"],
                    e["n"],
                    e["blobs"],
                    e["max_tfnorm"],
                    self.avgdl,
                )
                for t, e in sorted(postings.items())
            ]
            if operator == "and":
                _and_shard(plists, kk, heap)
            else:
                _wand_shard(plists, kk, heap)
        # final merge-sort reduce: heap -> (score desc, docID asc)
        items = sorted(heap, key=lambda x: (-x[0], -x[1]))[offset : offset + k]
        doc_ids = np.array([-d for _, d in items], dtype=np.int64)
        scores = np.array([s for s, _ in items], dtype=np.float64)
        if facet_by is None:
            return doc_ids, scores
        codes, values = self._attr_codes(facet_by)
        counts: dict[str, int] = {}
        if facet_docs:
            all_docs = np.concatenate(facet_docs)
            sel = codes[all_docs]
            valid = sel >= 0  # -1 = null value or doc absent from docmap
            bc = np.bincount(sel[valid], minlength=len(values))
            counts = {values[i]: int(bc[i]) for i in np.flatnonzero(bc)}
            n_missing = int((~valid).sum())
            if n_missing:  # ES terms-agg style explicit missing bucket
                counts["__missing__"] = n_missing
        return doc_ids, scores, counts

    @staticmethod
    def _scan_shard(plists: list[_PostingList], k: int, heap: list) -> None:
        """Exhaustive DAAT scoring (no pruning) — verification baseline."""
        plists = sorted(plists, key=lambda p: p.term)
        scores: dict[int, float] = {}
        for p in plists:  # term-sorted: per-doc sums accumulate in term order
            while not p.exhausted:
                d = p.cur_doc
                scores[d] = scores.get(d, 0.0) + p.cur_contrib()
                p.next()
        for d, s in scores.items():
            _topk_push(heap, k, s, d)

    @staticmethod
    def _scan_shard_vectorized(
        term_entries: list[tuple[str, float, dict]], avgdl: float, k: int,
        heap: list, operator: str,
        doc_mask: np.ndarray | None = None,
        facet_docs: list | None = None,
    ) -> None:
        """Vectorized exhaustive evaluation of one shard: decode every
        block of the query terms (numpy varint), np.unique the candidate
        docIDs, accumulate contributions per term in lexicographic term
        order (identical float discipline to the oracle), then push
        survivors into the shared top-k heap.

        Cost is O(P log P) for P postings of the query terms in this
        shard — the fast path when P is moderate; WAND wins when P >> k
        (block skipping avoids most decodes)."""
        # level-2 cache: per (shard, term) dense span arrays with idf
        # already applied (idf is a constant of the index). Query eval is
        # then pure vectorized slice-adds; adding the in-span zeros keeps
        # float64 results bit-identical (x + 0.0 == x), so rank identity
        # is preserved.
        dense = []
        for term, idf, e in sorted(term_entries, key=lambda x: x[0]):
            cached = e.get("_dense")
            if cached is None:
                d, tf, dl = decode_blocks_concat(e["blobs"], e["n"])
                tf = tf.astype(np.float64)
                dl = dl.astype(np.float64)
                tfn = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
                d64 = d.astype(np.int64)
                tb = int(d64[0])
                span_t = int(d64[-1]) - tb + 1
                contrib = np.zeros(span_t, dtype=np.float64)
                contrib[d64 - tb] = idf * tfn
                present = np.zeros(span_t, dtype=np.int16)
                present[d64 - tb] = 1
                cached = (tb, contrib, present)
                e["_dense"] = cached
            dense.append(cached)
        # dense-span accumulation: a shard is a bounded docID range by
        # construction (shard == docID bucket), so span-sized arrays
        # beat sorting the posting union; with the level-2 cache the
        # per-query work is nterms slice-adds over the shard span
        base = min(tb for tb, _, _ in dense)
        hi = max(tb + c.size for tb, c, _ in dense)
        span = hi - base
        scores = np.zeros(span, dtype=np.float64)
        counts = np.zeros(span, dtype=np.int16)
        for tb, contrib, present in dense:  # already term-sorted
            lo = tb - base
            scores[lo : lo + contrib.size] += contrib
            counts[lo : lo + present.size] += present
        cond = counts == len(dense) if operator == "and" else counts > 0
        if doc_mask is not None:
            cond &= doc_mask[base : base + span]
        nz = np.flatnonzero(cond)
        if nz.size == 0:
            return
        if facet_docs is not None:
            facet_docs.append(nz + base)
        # vectorized shard-local top-k (score desc, docID asc): argpartition
        # narrows to ~k candidates, ties at the boundary resolved by
        # ascending position in nz (== ascending docID), then a tiny
        # stable sort orders the survivors
        kk = min(k, nz.size)
        s_nz = scores[nz]
        if nz.size > 2 * kk + 64:
            part = np.argpartition(-s_nz, kk - 1)[:kk]
            v = s_nz[part].min()
            greater = np.flatnonzero(s_nz > v)
            equal = np.flatnonzero(s_nz == v)
            cand = np.concatenate([greater, equal[: kk - greater.size]])
        else:
            cand = np.arange(nz.size)
        sel = cand[np.argsort(-s_nz[cand], kind="stable")][:kk]
        top = nz[sel]
        for i in range(top.size):
            _topk_push(heap, k, float(scores[top[i]]), int(top[i] + base))

    def topk_table(self, query_set: pa.Table, algorithm: str = "auto") -> pa.Table:
        """TOPK_RESULT table for a QUERY_SET table (engine-side golden)."""
        qids, ranks, dids, scs = [], [], [], []
        for qid, q, k, op in zip(
            query_set["qid"].to_pylist(),
            query_set["query"].to_pylist(),
            query_set["k"].to_pylist(),
            query_set["operator"].to_pylist(),
        ):
            d, s = self.search(q, k=k, operator=op, algorithm=algorithm)
            for r in range(d.size):
                qids.append(qid)
                ranks.append(r)
                dids.append(int(d[r]))
                scs.append(float(s[r]))
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(dids, pa.int64()),
                "score": pa.array(scs, pa.float64()),
            }
        )


class BatchSearcher:
    """Actor-pool `map_batches` callable: index loaded once per actor
    (__init__), query batches scored per __call__ — distributed query
    serving as a Ray Data pipeline over a QUERY_SET dataset.
    """

    def __init__(self, index_dir: str, algorithm: str = "auto"):
        self.searcher = Searcher(index_dir)
        self.algorithm = algorithm

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.searcher.topk_table(batch, algorithm=self.algorithm)


class _ShardGroupSearcher:
    """One actor per shard group: holds a Searcher restricted to its
    shard files (index state loaded once — reference stateful-service
    pattern T1/T2), returns its local top-k per query."""

    def __init__(self, index_dir: str, shard_files: list[str]):
        self.searcher = Searcher(index_dir)
        self.searcher.shard_files = shard_files

    def search(self, query: str, k: int, operator: str, algorithm: str, **kw):
        return self.searcher.search(
            query, k=k, operator=operator, algorithm=algorithm, **kw
        )


class DistributedSearcher:
    """Per-query shard fan-out: the query runs as distributed actor tasks
    over disjoint shard-file groups; partial top-k results stream back
    and a final merge-sort reduce picks the global top-k (score desc,
    docID asc) — the north-star query-serving shape. Safe because shards
    are docID ranges: every shard scores its own documents completely
    with globally-correct idf (df comes from the global term_stats).
    """

    def __init__(self, index_dir: str, n_actors: int = 4):
        import ray

        files = sorted(
            glob.glob(os.path.join(index_dir, "postings", "shard=*.parquet"))
        )
        n_actors = max(1, min(n_actors, len(files)))
        groups = [files[i::n_actors] for i in range(n_actors)]
        actor_cls = ray.remote(_ShardGroupSearcher)
        self.actors = [
            actor_cls.remote(index_dir, grp) for grp in groups if grp
        ]

    def search(
        self, query: str, k: int = 10, operator: str = "and",
        algorithm: str = "auto", filters: dict[str, list] | None = None,
        offset: int = 0, facet_by: str | None = None,
    ):
        import ray

        kw = {"filters": filters, "facet_by": facet_by}
        parts = ray.get(
            [
                a.search.remote(query, k + offset, operator, algorithm, **kw)
                for a in self.actors
            ]
        )
        doc_ids = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        scores = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.float64)
        order = np.lexsort((doc_ids, -scores))[offset : offset + k]
        if facet_by is None:
            return doc_ids[order], scores[order]
        facets: dict[str, int] = {}
        for p in parts:
            for v, c in p[2].items():
                facets[v] = facets.get(v, 0) + c
        return doc_ids[order], scores[order], facets

    def shutdown(self):
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


def hydrate_hits(index_dir: str, doc_ids, scores) -> pa.Table:
    """Resolve engine docIDs to hit metadata (repo, path, commit, lang,
    snippet) via the forward map — the reference returns dataset metadata
    + samples with search results (enhance_metadata.py:4-35, M14)."""
    import pyarrow.dataset as _pads

    ids = [int(d) for d in doc_ids]
    dm = _pads.dataset(os.path.join(index_dir, "docmap"), format="parquet")
    cols = [c for c in ("doc_id", "repo", "path", "commit", "lang", "snippet")
            if c in dm.schema.names]
    tbl = dm.to_table(columns=cols, filter=pc.field("doc_id").isin(ids))
    by_id = {int(r["doc_id"]): r for r in tbl.to_pylist()}
    rows = []
    for rank, (d, s) in enumerate(zip(ids, scores), start=1):
        r = dict(by_id.get(d, {}))
        r.update({"rank": rank, "doc_id": d, "score": float(s)})
        rows.append(r)
    return pa.Table.from_pylist(rows)


class MultiFieldSearcher:
    """ES `multi_match` in `most_fields` mode with per-field boosts — the
    reference boosts fields in its query (`id^10`, `name^3`,
    apiserver/search/__init__.py:67-79). Each field has its own index
    (own df/dl/avgdl statistics, i.e. per-field BM25); docIDs are shared
    across indexes because identity is content-derived from
    (repo, path, commit) (index/docid.py), so per-field scores sum
    exactly. Accumulation order: fields sorted by name, then the field's
    own term-sorted discipline — mirrored by the test oracle.

    Scale note: exact multi-field top-k needs full per-field score maps;
    at 10^12 scale this becomes a per-shard fan-out like
    DistributedSearcher with a blockwise upper-bound prune.
    """

    def __init__(self, fields: dict[str, tuple[str, float]]):
        # fields: name -> (index_dir, boost)
        self.fields = {
            name: (Searcher(d), boost) for name, (d, boost) in sorted(fields.items())
        }

    def search(self, query: str, k: int = 10, operator: str = "or"):
        scores: dict[int, float] = {}
        seen_per_field: list[set] = []
        for name, (searcher, boost) in self.fields.items():  # name-sorted
            d, s = searcher.search(query, k=10000, operator="or")
            if len(d) >= 10000:
                # exactness requires the field's FULL score map; the 10k
                # retrieval cap silently truncates beyond this point
                import warnings

                warnings.warn(
                    f"MultiFieldSearcher: field {name!r} hit the 10000-doc "
                    "retrieval cap; scores beyond the cap are dropped and "
                    "the merged top-k may be inexact",
                    RuntimeWarning,
                    stacklevel=2,
                )
            seen_per_field.append(set(d.tolist()))
            for did, sc in zip(d.tolist(), s.tolist()):
                scores[did] = scores.get(did, 0.0) + boost * sc
        if operator == "and":
            # cross-fields conjunction: every query term must appear in at
            # least one field of the doc (terms analyzed per field)
            any_searcher = next(iter(self.fields.values()))[0]
            terms = sorted(set(tokenize_text(query, any_searcher.analyzer)))
            per_term_docs = []
            for t in terms:
                docs_t: set[int] = set()
                for _, (srch, _) in self.fields.items():
                    docs_t |= srch.term_docs(t)
                per_term_docs.append(docs_t)
            keep = set(scores)
            for docs_t in per_term_docs:
                keep &= docs_t
            scores = {d: s for d, s in scores.items() if d in keep}
        items = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        doc_ids = np.array([d for d, _ in items], dtype=np.int64)
        out = np.array([s for _, s in items], dtype=np.float64)
        return doc_ids, out


def _prefix_upper_bound(prefix: str) -> str:
    return prefix + "￿"


class PrefixExpander:
    """Multi-term (prefix/wildcard) queries: expand `pars*` against the
    term dictionary (range-pruned read of term_stats), cap the expansion
    at `max_terms` by descending df (ES's multi-term query expansion
    behavior), then run the expanded OR query through the normal scorer.
    """

    def __init__(self, searcher: "Searcher", max_terms: int = 50):
        self.searcher = searcher
        self.max_terms = max_terms

    def expand(self, prefix: str) -> list[str]:
        ds = self.searcher._term_stats_ds
        if "term" not in ds.schema.names:
            return []
        tbl = ds.to_table(
            columns=["term", "df"],
            filter=(pc.field("term") >= prefix)
            & (pc.field("term") < _prefix_upper_bound(prefix)),
        )
        pairs = sorted(
            zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()),
            key=lambda x: (-x[1], x[0]),
        )[: self.max_terms]
        return sorted(t for t, _ in pairs)

    def search(self, query: str, k: int = 10):
        """Terms ending in '*' are prefix-expanded; the expanded term set
        runs as a disjunctive query (scores per expanded term, like ES
        rewritten multi-term queries)."""
        raw = query.split()
        terms: list[str] = []
        for w in raw:
            if w.endswith("*") and len(w) > 1:
                base = tokenize_text(w[:-1], self.searcher.analyzer)
                if base:
                    # the analyzer may split the wildcard word ('foo.bar*'
                    # -> ['foo','bar']): earlier tokens are exact terms,
                    # only the final token is the prefix to expand
                    terms.extend(base[:-1])
                    terms.extend(self.expand(base[-1]))
            else:
                terms.extend(tokenize_text(w, self.searcher.analyzer))
        if not terms:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        return self.searcher.search(" ".join(sorted(set(terms))), k=k, operator="or")
