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


def _wand_shard(plists: list[_PostingList], k: int, heap: list,
                mask_info: tuple[int, np.ndarray] | None = None) -> None:
    """WAND over one shard's posting lists (OR semantics). Mutates heap.
    mask_info = (shard_base_docid, bool mask): filter context applied at
    score time — masked docs never enter the heap, pruning stays safe
    (theta only grows slower)."""
    mbase, mask = mask_info if mask_info is not None else (0, None)
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
            if mask is None or mask[pivot_doc - mbase]:
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


def _and_shard(plists: list[_PostingList], k: int, heap: list,
               mask_info: tuple[int, np.ndarray] | None = None) -> None:
    """Rarest-first conjunctive intersection with block skipping."""
    mbase, mask = mask_info if mask_info is not None else (0, None)
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
            if mask is None or mask[d - mbase]:
                score = 0.0
                for p in by_term:  # float discipline: term-sorted accumulation
                    score += p.cur_contrib()
                _topk_push(heap, k, score, d)
            lead.next()
        if lead.exhausted:
            return


def load_synonyms(path: str) -> dict[str, list[str]]:
    """Parse a Solr/ES-format synonyms file (the artifact the reference
    mounts into Elasticsearch: docker/synonyms.txt wired through
    elasticsearch.yml:16-31) into the Searcher's expansion dict.

    Supported syntax (Solr synonym_graph format):
      * '# ...' comments and blank lines are skipped;
      * 'a, b, c'    — equivalence group: each term expands to the rest;
      * 'a, b => c'  — explicit mapping: each LHS term expands to every
                       RHS term (RHS terms are not expanded back).
    """
    out: dict[str, list[str]] = {}

    def add(term: str, exps: list[str]) -> None:
        term = term.strip()
        cur = out.setdefault(term, [])
        for e in exps:
            e = e.strip()
            if e and e != term and e not in cur:
                cur.append(e)

    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "=>" in line:
                lhs, rhs = line.split("=>", 1)
                rhs_terms = [t for t in rhs.split(",") if t.strip()]
                for term in lhs.split(","):
                    add(term, rhs_terms)
            else:
                group = [t.strip() for t in line.split(",") if t.strip()]
                for term in group:
                    add(term, group)
    return out


def _postings_entry_nbytes(e: dict | None) -> int:
    """Approximate heap size of one (shard, term) cache entry — block
    arrays + blobs (memoized on the entry: they never change) plus the
    dense span arrays when attached."""
    if e is None:
        return 64
    n = e.get("_nbytes_static")
    if n is None:
        n = (
            e["first"].nbytes + e["last"].nbytes + e["n"].nbytes
            + e["max_tfnorm"].nbytes
            + sum(len(b) for b in e["blobs"]) + 64
        )
        e["_nbytes_static"] = n
    d = e.get("_dense")
    if d is not None:
        n += d[1].nbytes + d[2].nbytes
    return n


class Searcher:
    """Single-process searcher over a built index directory.

    Loads global stats eagerly; per-(term, shard) posting blocks are read
    on demand with Parquet row-group pruning (files are term-sorted with
    small row groups) and cached. Used directly in tests and wrapped in
    actor pools (`BatchSearcher`) for distributed serving.
    """

    def __init__(self, index_dir: str,
                 synonyms: dict[str, list[str]] | str | None = None,
                 postings_cache_bytes: int = 256 << 20):
        # search-time-only synonym expansion, mirroring the reference's
        # default_search analyzer (synonym_graph applied at query time
        # only, elasticsearch.yml:16-31). Simplification: term-level OR
        # expansion; each expanded term scores with its own idf. A str
        # value is a Solr-format synonyms.txt path (load_synonyms).
        if isinstance(synonyms, str):
            synonyms = load_synonyms(synonyms)
        self.index_dir = index_dir
        gs = pq.read_table(os.path.join(index_dir, "global_stats.parquet"))
        self.n_docs = int(gs["n_docs"][0].as_py())
        self.n_tokens = int(gs["n_tokens"][0].as_py())
        self.avgdl = float(gs["avgdl"][0].as_py())
        self.analyzer = gs["analyzer"][0].as_py()
        # Multi-segment support (index/segments.py): a SegmentedSearcher
        # overrides n_docs/avgdl with corpus-merged values and primes
        # _df_cache with merged dfs. Stored block max_tfnorm bounds were
        # computed with THIS segment's build avgdl; tfnorm is increasing
        # in avgdl (bounded by avgdl_query/avgdl_build, and tfnorm < 1
        # always), so scaling bounds by max(1, ratio) capped at 1 keeps
        # WAND pruning safe under an avgdl override.
        self.tfnorm_bound_scale = 1.0
        # sorted engine docIDs masked out of every result (Lucene live-docs
        # tombstones: deleted docs still count in df/avgdl until compaction)
        self.deleted_ids: np.ndarray | None = None
        # Keys are looked up by ANALYZED query token, so normalize each
        # entry key through the index analyzer (ES analyzes synonym_graph
        # entries with the same chain) — a raw 'Quick'/'speedy' key would
        # otherwise never match the lowercased/stemmed token. Expansion
        # VALUES stay raw: search() re-tokenizes them at query time.
        # Multi-token keys are term-level inexpressible and kept as-is
        # (inert), matching the term-level expansion simplification.
        norm: dict[str, list[str]] = {}
        for key, exps in (synonyms or {}).items():
            toks = tokenize_text(key, self.analyzer)
            nk = toks[0] if len(toks) == 1 else key
            norm.setdefault(nk, []).extend(
                e for e in exps if e not in norm.get(nk, ())
            )
        self.synonyms = norm
        self.n_shards = int(gs["n_shards"][0].as_py())
        self.shard_files = sorted(
            glob.glob(os.path.join(index_dir, "postings", "shard=*.parquet"))
        )
        self._term_stats_ds = pads.dataset(
            os.path.join(index_dir, "term_stats"), format="parquet"
        )
        self._df_cache: dict[str, int] = {}
        # LRU with a byte budget: a long-lived serving actor otherwise
        # accumulates per-(shard, term) blocks PLUS their dense spans
        # (O(shard) float64 each) without bound and eventually OOMs
        from collections import OrderedDict

        self._postings_cache: "OrderedDict[tuple[str, str], dict | None]" = (
            OrderedDict()
        )
        self.postings_cache_bytes = postings_cache_bytes

    # ---------------- term metadata ----------------

    def local_dfs(self, terms: list[str]) -> dict[str, int]:
        """THIS index's dfs straight from term_stats, bypassing the
        cache — SegmentedSearcher merges these across segments and then
        primes _df_cache with the merged values."""
        if not terms:
            return {}
        if "term" not in self._term_stats_ds.schema.names:
            # empty vocabulary (e.g. all-empty corpus): Ray wrote a
            # schema-less part file for the empty aggregate
            return {t: 0 for t in terms}
        t = self._term_stats_ds.to_table(
            columns=["term", "df"],
            filter=pc.field("term").isin(terms),
        )
        found = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        return {t_: int(found.get(t_, 0)) for t_ in terms}

    def dfs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            self._df_cache.update(self.local_dfs(missing))
        return {t: self._df_cache[t] for t in terms}

    # ---------------- postings ----------------

    def _shard_postings(self, shard_file: str, terms: list[str]) -> dict[str, dict]:
        """term -> block arrays for one shard (cached per term)."""
        out = {}
        missing = []
        for t in terms:
            key = (shard_file, t)
            if key in self._postings_cache:
                self._postings_cache.move_to_end(key)
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
            self._evict_postings_cache()
        return out

    def _evict_postings_cache(self) -> None:
        """Evict least-recently-used postings entries until the cache
        (blocks + attached dense spans) fits the byte budget. Entries
        returned by the CURRENT query survive: eviction only drops the
        dict reference, and the heaviest queries touch far fewer bytes
        than the budget."""
        total = sum(
            _postings_entry_nbytes(e) for e in self._postings_cache.values()
        )
        while total > self.postings_cache_bytes and len(self._postings_cache) > 1:
            _, e = self._postings_cache.popitem(last=False)
            total -= _postings_entry_nbytes(e)

    def term_docs(self, term: str) -> set[int]:
        """All docIDs containing term (decodes the term's postings)."""
        out: set[int] = set()
        for sf in self.shard_files:
            e = self._shard_postings(sf, [term]).get(term)
            if e:
                d, _, _ = decode_blocks_concat(e["blobs"], e["n"])
                out.update(int(x) for x in d)
        return out

    def terms_tfnorms(self, terms: list[str]) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """{term: (doc_ids, tfnorm)} across shards — the idf-free BM25
        component tf/(tf + k1*(1-b+b*dl/avgdl)), used by multi-field
        scoring where the idf is applied separately. BATCHED: one
        filtered postings read per shard covers every requested term
        (not one read per (term, shard))."""
        parts: dict[str, tuple[list, list]] = {t: ([], []) for t in terms}
        for sf in self.shard_files:
            by_term = self._shard_postings(sf, list(terms))
            for t, e in by_term.items():
                d, tf, dl = decode_blocks_concat(e["blobs"], e["n"])
                tf = tf.astype(np.float64)
                dl = dl.astype(np.float64)
                parts[t][0].append(d.astype(np.int64))
                parts[t][1].append(tf / (tf + K1 * (1.0 - B + B * dl / self.avgdl)))
        out = {}
        for t, (ds, ts) in parts.items():
            if ds:
                out[t] = (np.concatenate(ds), np.concatenate(ts))
            else:
                out[t] = (np.empty(0, np.int64), np.empty(0, np.float64))
        return out

    def term_tfnorms(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Single-term convenience wrapper over terms_tfnorms."""
        return self.terms_tfnorms([term])[term]

    # ---------------- search ----------------

    def _shard_attr_codes(self, shard_file: str, attr: str):
        """Shard-LOCAL attribute codes from the shard's own forward-map
        slice (docmap/bucket=N.parquet): (base_docid, codes, values).

        docIDs are dense ranks within a bucket, so the codes array is
        exactly the shard's row count — no n_docs-sized allocation
        anywhere (round-2 rewrite of the global dense _attr_codes; each
        shard actor in DistributedSearcher holds only its own slices,
        the per-shard keyword-field layout ES uses for filter context).
        """
        cached = getattr(self, "_attr_cache", None)
        if cached is None:
            cached = self._attr_cache = {}
        key = (shard_file, attr)
        if key not in cached:
            bucket = os.path.basename(shard_file).split("=", 1)[1].split(".", 1)[0]
            dm = os.path.join(self.index_dir, "docmap", f"bucket={bucket}.parquet")
            if attr not in pq.read_schema(dm).names:
                # field no document carries (e.g. an older segment built
                # before the attr existed): every doc is missing — the
                # ES missing-field shape (code -1 = __missing__ bucket,
                # never matches a terms filter)
                tbl = pq.read_table(dm, columns=["doc_id"])
                dids = tbl["doc_id"].to_numpy(zero_copy_only=False)
                base = int(dids.min()) if dids.size else 0
                cached[key] = (base, np.full(dids.size, -1, np.int32), [])
                return cached[key]
            tbl = pq.read_table(dm, columns=["doc_id", attr])
            dids = tbl["doc_id"].to_numpy(zero_copy_only=False)
            base = int(dids.min()) if dids.size else 0
            enc = tbl[attr].combine_chunks().dictionary_encode()
            idx = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
            codes = np.full(dids.size, -1, dtype=np.int32)
            codes[dids - base] = idx.astype(np.int32)
            cached[key] = (base, codes, enc.dictionary.to_pylist())
        return cached[key]

    def _shard_attr_numeric(self, shard_file: str, attr: str):
        """Shard-LOCAL float64 attribute values from the shard's own
        forward-map slice: (base_docid, values) with NaN for null —
        the ES numeric doc-values shape backing range filters."""
        cached = getattr(self, "_attr_cache", None)
        if cached is None:
            cached = self._attr_cache = {}
        key = (shard_file, attr, "num")
        if key not in cached:
            bucket = os.path.basename(shard_file).split("=", 1)[1].split(".", 1)[0]
            dm = os.path.join(self.index_dir, "docmap", f"bucket={bucket}.parquet")
            if attr not in pq.read_schema(dm).names:
                # absent field: all-NaN = never matches (missing-field)
                n = pq.ParquetFile(dm).metadata.num_rows
                tbl = pq.read_table(dm, columns=["doc_id"])
                dids = tbl["doc_id"].to_numpy(zero_copy_only=False)
                base = int(dids.min()) if dids.size else 0
                cached[key] = (base, np.full(n, np.nan, np.float64))
                return cached[key]
            tbl = pq.read_table(dm, columns=["doc_id", attr])
            dids = tbl["doc_id"].to_numpy(zero_copy_only=False)
            base = int(dids.min()) if dids.size else 0
            col = pc.cast(tbl[attr].combine_chunks(), pa.float64())
            vals = np.full(dids.size, np.nan, np.float64)
            vals[dids - base] = col.to_numpy(zero_copy_only=False)
            cached[key] = (base, vals)
        return cached[key]

    def _shard_doc_mask(self, shard_file: str, filters: dict[str, list] | None):
        """AND of keyword filters over ONE shard's docID span ->
        (base_docid, bool mask) or None (reference filter context,
        apiserver/search/__init__.py:81-107). Tombstoned docIDs
        (`deleted_ids`) are masked out here too, so deletions apply on
        every algorithm path exactly like a filter.

        Filter specs: a LIST is a keyword terms-filter; a TUPLE is a
        numeric comparison — ("<=", x), (">=", x) or ("range", lo, hi)
        — over a float-castable docmap attribute (the reference's
        temporal/spatial coverage range queries, search/__init__.py:
        212-330), or ("has", token) — token membership within a
        space-joined multi-valued keyword attr (the reference's nested
        per-column terms query, search/__init__.py:212-330: ANY column
        matching the term qualifies the doc). Docs with a null
        attribute never match (NaN compares false), the ES
        missing-field semantics."""
        deleted = self.deleted_ids
        if not filters and (deleted is None or deleted.size == 0):
            return None
        base = None
        mask = None
        for attr, allowed in (filters or {}).items():
            if isinstance(allowed, tuple) and allowed and allowed[0] == "has":
                b, codes, values = self._shard_attr_codes(shard_file, attr)
                tok = allowed[1]
                allowed_ids = np.array(
                    [
                        i for i, v in enumerate(values)
                        if v and tok in v.split()
                    ],
                    dtype=np.int32,
                )
                m = np.isin(codes, allowed_ids)
            elif isinstance(allowed, tuple) and allowed and allowed[0] in (
                "<=", ">=", "range",
            ):
                b, vals = self._shard_attr_numeric(shard_file, attr)
                with np.errstate(invalid="ignore"):
                    if allowed[0] == "<=":
                        m = vals <= float(allowed[1])
                    elif allowed[0] == ">=":
                        m = vals >= float(allowed[1])
                    else:
                        m = (vals >= float(allowed[1])) & (
                            vals <= float(allowed[2])
                        )
            else:
                b, codes, values = self._shard_attr_codes(shard_file, attr)
                allowed_set = set(allowed)
                allowed_ids = np.array(
                    [i for i, v in enumerate(values) if v in allowed_set],
                    dtype=np.int32,
                )
                m = np.isin(codes, allowed_ids)
            if mask is None:
                base, mask = b, m
            else:
                mask &= m
        if deleted is not None and deleted.size:
            if mask is None:
                # dl is always present in the docmap: cheapest way to the
                # shard's (base, row-count) span
                base, codes, _ = self._shard_attr_codes(shard_file, "dl")
                mask = np.ones(codes.size, dtype=bool)
            in_shard = deleted[
                np.searchsorted(deleted, base):
                np.searchsorted(deleted, base + mask.size)
            ]
            mask[in_shard - base] = False
        return base, mask

    def _shard_facet_counts(self, shard_file: str, attr: str,
                            docs: np.ndarray, counts: dict) -> None:
        """Accumulate value->count for the matching docs of ONE shard
        (ES terms aggs, search/__init__.py:587-603); -1 codes (null
        value) land in the explicit __missing__ bucket."""
        base, codes, values = self._shard_attr_codes(shard_file, attr)
        sel = codes[docs - base]
        valid = sel >= 0
        bc = np.bincount(sel[valid], minlength=len(values))
        for i in np.flatnonzero(bc):
            v = values[i]
            counts[v] = counts.get(v, 0) + int(bc[i])
        n_missing = int((~valid).sum())
        if n_missing:
            counts["__missing__"] = counts.get("__missing__", 0) + n_missing

    def search(
        self,
        query: str,
        k: int = 10,
        operator: str = "and",
        algorithm: str = "auto",
        filters: dict[str, list] | None = None,
        offset: int = 0,
        facet_by: str | list | None = None,
        pre_analyzed: bool = False,
    ):
        """Top-k (doc_ids, scores), score desc then docID asc, float64.

        filters: keyword-attribute constraints ANDed with the text query
        (e.g. {"lang": ["python"]}); offset: pagination (offset+k capped
        at 10000, mirroring the reference's page*size guard,
        search/__init__.py:576-577); facet_by: attribute whose value
        counts over ALL matching docs are returned as a third element
        (ES terms aggs, search/__init__.py:587-603). A LIST of
        attributes returns {attr: {value: count}} — the reference's
        multi-agg search body (source/license/type, :587-603).
        """
        if offset + k > 10000:
            raise ValueError("offset + k must be <= 10000")
        if pre_analyzed:
            # whitespace-separated INDEX terms (e.g. dictionary
            # expansions from PrefixExpander): re-analysis would re-stem
            # them — Porter is not idempotent ('univers' -> 'univ') —
            # and silently zero out the query. ES likewise never
            # analyzes rewritten multi-term expansions.
            base_terms = set(query.split())
        else:
            base_terms = set(tokenize_text(query, self.analyzer))
        if self.synonyms and not pre_analyzed:
            for t in list(base_terms):
                for syn in self.synonyms.get(t, ()):
                    base_terms.update(tokenize_text(syn, self.analyzer))
        terms = sorted(base_terms)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if facet_by:
            empty = (
                *empty,
                {a: {} for a in facet_by}
                if isinstance(facet_by, (list, tuple))
                else {},
            )
        if not terms:
            return empty
        dfs = self.dfs(terms)
        if operator == "and" and any(dfs[t] == 0 for t in terms):
            return empty
        terms = [t for t in terms if dfs[t] > 0]
        if not terms:
            return empty
        idfs = {t: float(bm25_idf(float(dfs[t]), self.n_docs)) for t in terms}
        facet_attrs = (
            list(facet_by) if isinstance(facet_by, (list, tuple))
            else [facet_by] if facet_by else []
        )
        facet_multi = isinstance(facet_by, (list, tuple))
        counts: dict = {a: {} for a in facet_attrs} if facet_multi else {}

        # k=0 is the natural facet-/count-only query: evaluate with an
        # internal top-1 (the scan/WAND kernels assume a non-empty heap
        # budget) and slice back to zero hits below
        kk = max(k + offset, 1)
        heap: list = []
        for sf in self.shard_files:
            postings = self._shard_postings(sf, terms)
            if operator == "and" and len(postings) < len(terms):
                continue
            if not postings:
                continue
            mask_info = self._shard_doc_mask(sf, filters)
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
            if facet_by is not None:
                # a terms agg counts over ALL matching docs, so the shard
                # must be fully evaluated — like ES, aggregations pay the
                # exhaustive path. Plain filters do NOT force this: they
                # ride along WAND/AND as a score-time mask.
                alg = "scan"
            if alg == "scan":
                entries = [(t, idfs[t], e) for t, e in postings.items()]
                facet_docs: list | None = [] if facet_by else None
                self._scan_shard_vectorized(
                    entries, self.avgdl, kk, heap, operator,
                    mask_info=mask_info, facet_docs=facet_docs,
                )
                if facet_by and facet_docs:
                    fdocs = np.concatenate(facet_docs)
                    for a in facet_attrs:
                        self._shard_facet_counts(
                            sf, a, fdocs, counts[a] if facet_multi else counts
                        )
                continue
            scale = self.tfnorm_bound_scale
            plists = [
                _PostingList(
                    t,
                    idfs[t],
                    e["first"],
                    e["last"],
                    e["n"],
                    e["blobs"],
                    e["max_tfnorm"] if scale == 1.0
                    else np.minimum(e["max_tfnorm"] * scale, 1.0),
                    self.avgdl,
                )
                for t, e in sorted(postings.items())
            ]
            if operator == "and":
                _and_shard(plists, kk, heap, mask_info=mask_info)
            else:
                _wand_shard(plists, kk, heap, mask_info=mask_info)
        # final merge-sort reduce: heap -> (score desc, docID asc)
        items = sorted(heap, key=lambda x: (-x[0], -x[1]))[offset : offset + k]
        doc_ids = np.array([-d for _, d in items], dtype=np.int64)
        scores = np.array([s for s, _ in items], dtype=np.float64)
        if facet_by is None:
            return doc_ids, scores
        return doc_ids, scores, counts

    @staticmethod
    def _scan_shard_vectorized(
        term_entries: list[tuple[str, float, dict]], avgdl: float, k: int,
        heap: list, operator: str,
        mask_info: tuple[int, np.ndarray] | None = None,
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
        if mask_info is not None:
            mbase, mask = mask_info
            # posting docIDs lie inside the shard's docID range, so the
            # slice below is always within the shard-local mask
            cond &= mask[base - mbase : base - mbase + span]
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

    def hydrate_local(self, doc_ids: list[int]) -> dict[int, dict]:
        """Hit metadata for the requested docIDs found in THIS actor's
        own docmap slices (one file per owned shard) — ids owned by
        other shards are simply absent from the result."""
        out: dict[int, dict] = {}
        if not doc_ids:
            return out
        ids = sorted(set(int(d) for d in doc_ids))
        for sf in self.searcher.shard_files:
            bucket = os.path.basename(sf).split("=", 1)[1].split(".", 1)[0]
            dm = os.path.join(
                self.searcher.index_dir, "docmap", f"bucket={bucket}.parquet"
            )
            dset = pads.dataset(dm, format="parquet")
            cols = [
                c
                for c in ("doc_id", "repo", "path", "commit", "lang", "snippet")
                if c in dset.schema.names
            ]
            # filter pushed into the scan: row groups without requested
            # ids are pruned, snippet payloads of non-hits never load
            tbl = dset.to_table(columns=cols, filter=pc.field("doc_id").isin(ids))
            for r in tbl.to_pylist():
                out[int(r["doc_id"])] = r
        return out


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
        from auctus_ray.util import merge_facet_counts

        facets: dict = {}
        for p in parts:
            merge_facet_counts(facets, p[2])
        return doc_ids[order], scores[order], facets

    def hydrate_hits(self, doc_ids, scores) -> pa.Table:
        """Distributed hit hydration: each shard actor resolves the ids
        it owns from ITS OWN docmap slices (the per-shard _source fetch
        ES does); partial rows merge on the driver in rank order. Same
        output contract as the module-level `hydrate_hits`."""
        import ray

        ids = [int(d) for d in doc_ids]
        parts = ray.get([a.hydrate_local.remote(ids) for a in self.actors])
        by_id: dict[int, dict] = {}
        for p in parts:
            by_id.update(p)
        rows = []
        for rank, (d, s) in enumerate(zip(ids, scores), start=1):
            r = dict(by_id.get(d, {}))
            r.update({"rank": rank, "doc_id": d, "score": float(s)})
            rows.append(r)
        return pa.Table.from_pylist(rows)

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

    EXACT at any size (round-3 rewrite): instead of retrieving each
    field's top-10000 (whose cap silently truncated dense fields), the
    query terms' postings are fully decoded per field (terms_tfnorms,
    one batched read per shard) and the per-doc sums are vectorized
    reduceats — cost O(postings of the query terms), the same as the
    scan path, with no cap. The query is analyzed PER FIELD, so fields
    built with different analyzers score correctly; with mixed
    analyzers the AND conjunction requires every per-field token form
    somewhere in the doc (an approximation — ES applies AND per field).
    The per-shard fan-out of this scorer is
    DistributedMultiFieldSearcher(mode='most_fields'). The reference's
    actual query type
    (`cross_fields`) lives in CrossFieldsSearcher; this class is the
    `most_fields` variant.
    """

    def __init__(self, fields: dict[str, tuple[str, float]]):
        # fields: name -> (index_dir, boost)
        self.fields = {
            name: (Searcher(d), boost) for name, (d, boost) in sorted(fields.items())
        }

    def search(self, query: str, k: int = 10, operator: str = "or"):
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        field_docs: list[np.ndarray] = []
        field_scores: list[np.ndarray] = []
        # the query is analyzed PER FIELD (each field's own analyzer
        # chain, as ES analyzes a multi_match per mapped field); the
        # per-term docs for the AND filter are collected from whichever
        # field(s) produced that token
        per_term_docs: dict[str, list[np.ndarray]] = {}
        for name, (searcher, boost) in self.fields.items():  # name-sorted
            terms_f = sorted(set(tokenize_text(query, searcher.analyzer)))
            if not terms_f:
                continue
            dfs = searcher.dfs(terms_f)
            live = [t for t in terms_f if dfs[t] > 0]
            tfn_by_term = searcher.terms_tfnorms(live)
            docs_parts, contrib_parts = [], []
            for t in live:  # sorted: the field's term-order discipline
                d, tfn = tfn_by_term[t]
                idf = float(bm25_idf(float(dfs[t]), searcher.n_docs))
                docs_parts.append(d)
                contrib_parts.append(idf * tfn)
                per_term_docs.setdefault(t, []).append(d)
            for t in terms_f:
                per_term_docs.setdefault(t, [])
            if not docs_parts:
                continue
            d = np.concatenate(docs_parts)
            c = np.concatenate(contrib_parts)
            if d.size == 0:
                # shard-restricted searcher: global df > 0 but no
                # postings in THIS shard for any live term
                continue
            order = np.argsort(d, kind="stable")  # stable: term order per doc
            d, c = d[order], c[order]
            starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
            field_docs.append(d[starts])
            field_scores.append(boost * np.add.reduceat(c, starts))
        if not field_docs:
            return empty
        alld = np.concatenate(field_docs)
        alls = np.concatenate(field_scores)
        order = np.argsort(alld, kind="stable")  # stable: field order per doc
        alld, alls = alld[order], alls[order]
        starts = np.flatnonzero(np.concatenate([[True], alld[1:] != alld[:-1]]))
        docs_u = alld[starts]
        scores = np.add.reduceat(alls, starts)
        if operator == "and":
            # cross-fields conjunction: every analyzed query term must
            # appear (in its field's form) in at least one field
            from auctus_ray.util import sorted_membership

            keep = np.ones(docs_u.size, dtype=bool)
            for t, parts in sorted(per_term_docs.items()):
                if not parts:
                    return empty
                tdocs = np.unique(np.concatenate(parts))
                hit, _ = sorted_membership(tdocs, docs_u)
                keep &= hit
            docs_u, scores = docs_u[keep], scores[keep]
        sel = np.lexsort((docs_u, -scores))[:k]
        return docs_u[sel], scores[sel]


class CrossFieldsSearcher:
    """ES `multi_match` in `cross_fields` mode — the reference's actual
    keyword-query type (`type: cross_fields, operator: and` over
    id^10/description/name^3/attribute_keywords,
    apiserver/search/__init__.py:67-79).

    Term-centric blended scoring (Lucene BlendedTermQuery with the
    default tie_breaker=0, i.e. dismax):
      * per query term, document frequency is BLENDED across fields:
        df_blended = max over fields of df_field(term), idf computed
        from it once (term statistics comparable across fields);
      * per (term, doc): score = max over fields of
        boost_field * idf_blended * tfnorm_field(term, doc);
      * document score = sum of per-term scores in lexicographic term
        order (the engine-wide float discipline);
      * operator='and': the doc must contain EVERY query term in at
        least one field (cross-field conjunction).

    All fields must index the same corpus (shared content-derived
    docIDs, index/docid.py) with the SAME analyzer — faithful to ES,
    where cross_fields groups fields by analyzer and blends only within
    a group (the query here is analyzed once with the first field's
    chain).
    """

    def __init__(self, fields: dict[str, tuple[str, float]]):
        # fields: name -> (index_dir, boost); name-sorted for determinism
        self.fields = {
            name: (Searcher(d), boost) for name, (d, boost) in sorted(fields.items())
        }

    def search(self, query: str, k: int = 10, operator: str = "and"):
        first_searcher = next(iter(self.fields.values()))[0]
        n_docs = first_searcher.n_docs
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        terms = sorted(set(tokenize_text(query, first_searcher.analyzer)))
        if not terms:
            return empty
        term_docs_list: list[np.ndarray] = []
        term_score_list: list[np.ndarray] = []
        # one batched term_stats scan + one batched postings read per
        # field covering every query term (not one per (term, field))
        field_dfs = {
            name: s.dfs(terms) for name, (s, _) in self.fields.items()
        }
        field_tfn = {
            name: s.terms_tfnorms([t for t in terms if field_dfs[name][t] > 0])
            for name, (s, _) in self.fields.items()
        }
        for t in terms:  # lexicographic: the float-discipline sum order
            df_b = max(dfs[t] for dfs in field_dfs.values())
            if df_b == 0:
                if operator == "and":
                    return empty
                continue
            idf_b = float(bm25_idf(float(df_b), n_docs))
            docs_parts, contrib_parts = [], []
            for name, (s, boost) in self.fields.items():  # name-sorted
                d, tfn = field_tfn[name].get(
                    t, (np.empty(0, np.int64), np.empty(0, np.float64))
                )
                docs_parts.append(d)
                contrib_parts.append(boost * idf_b * tfn)
            d = np.concatenate(docs_parts)
            c = np.concatenate(contrib_parts)
            if d.size == 0:
                # shard-restricted searcher: global df > 0 but no
                # postings in THIS shard — the term still counts for
                # the AND conjunction, with no local docs
                term_docs_list.append(np.empty(0, np.int64))
                term_score_list.append(np.empty(0, np.float64))
                continue
            order = np.argsort(d, kind="stable")
            d, c = d[order], c[order]
            starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
            term_docs_list.append(d[starts])
            term_score_list.append(np.maximum.reduceat(c, starts))  # dismax
        if not term_docs_list:
            return empty
        alld = np.concatenate(term_docs_list)
        alls = np.concatenate(term_score_list)
        if alld.size == 0:  # no local docs in this shard slice
            return empty
        order = np.argsort(alld, kind="stable")  # stable: term order per doc
        alld, alls = alld[order], alls[order]
        starts = np.flatnonzero(np.concatenate([[True], alld[1:] != alld[:-1]]))
        docs_u = alld[starts]
        counts = np.diff(np.append(starts, alld.size))
        scores = np.add.reduceat(alls, starts)  # sums in term order per doc
        if operator == "and":
            keep = counts == len(term_docs_list)
            docs_u, scores = docs_u[keep], scores[keep]
        sel = np.lexsort((docs_u, -scores))[:k]
        return docs_u[sel], scores[sel]


def _shard_bucket(path: str) -> str:
    """'.../postings/shard=7.parquet' -> '7' (docID bucket id)."""
    return os.path.basename(path).split("=", 1)[1].split(".", 1)[0]


class _MultiShardWorker:
    """One actor per shard group for `multi_match` queries: holds a
    Multi/CrossFieldsSearcher whose per-field Searchers are all
    restricted to the SAME docID buckets — index state loads once per
    actor (__init__), queries score per call (T1/T2 pattern)."""

    def __init__(self, fields: dict[str, tuple[str, float]],
                 buckets: list[str], mode: str):
        inner = (
            CrossFieldsSearcher(fields)
            if mode == "cross_fields"
            else MultiFieldSearcher(fields)
        )
        want = set(buckets)
        for _name, (s, _boost) in inner.fields.items():
            s.shard_files = [f for f in s.shard_files if _shard_bucket(f) in want]
        self.inner = inner

    def search(self, query: str, k: int, operator: str):
        return self.inner.search(query, k=k, operator=operator)


class DistributedMultiFieldSearcher:
    """Per-shard fan-out for `multi_match` queries — `cross_fields`
    (the reference's production query type,
    apiserver/search/__init__.py:67-79) or `most_fields` — mirroring
    DistributedSearcher's shape for the single-field path.

    Exactness: shards are disjoint docID buckets SHARED across the
    field indexes (content-derived docIDs + the same bucket hash,
    index/docid.py), and every statistic the scorers blend (per-field
    df for the blended max, n_docs, avgdl) is GLOBAL per field
    (Searcher.dfs reads the global term_stats), so each actor scores
    its own documents bit-identically to the single-process searcher
    and the k-way merge of local top-k (score desc, docID asc) is the
    global top-k. The AND conjunction is per-document and therefore
    shard-local.
    """

    def __init__(self, fields: dict[str, tuple[str, float]],
                 mode: str = "cross_fields", n_actors: int = 4):
        import ray

        def field_buckets(d: str) -> list[str]:
            return sorted(
                _shard_bucket(f)
                for f in glob.glob(os.path.join(d, "postings", "shard=*.parquet"))
            )

        items = sorted(fields.items())
        buckets = field_buckets(items[0][1][0])
        for name, (d, _boost) in items[1:]:
            if field_buckets(d) != buckets:
                raise ValueError(
                    f"field {name!r} has a different shard layout; all "
                    "fields must index the same corpus with the same "
                    "n_shards (shared docID buckets)"
                )
        n_actors = max(1, min(n_actors, len(buckets)))
        groups = [buckets[i::n_actors] for i in range(n_actors)]
        actor_cls = ray.remote(_MultiShardWorker)
        self.mode = mode
        self.actors = [
            actor_cls.remote(fields, grp, mode) for grp in groups if grp
        ]

    def search(self, query: str, k: int = 10, operator: str | None = None):
        import ray

        if operator is None:
            operator = "and" if self.mode == "cross_fields" else "or"
        parts = ray.get(
            [a.search.remote(query, k, operator) for a in self.actors]
        )
        doc_ids = (
            np.concatenate([p[0] for p in parts])
            if parts
            else np.empty(0, np.int64)
        )
        scores = (
            np.concatenate([p[1] for p in parts])
            if parts
            else np.empty(0, np.float64)
        )
        order = np.lexsort((doc_ids, -scores))[:k]
        return doc_ids[order], scores[order]

    def shutdown(self):
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


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
        return self.searcher.search(
            " ".join(sorted(set(terms))), k=k, operator="or",
            pre_analyzed=True,
        )
