"""Union-search pipeline (J8 end-to-end): rank candidate datasets by
fuzzy column-schema compatibility with a query dataset.

Reference semantics (apiserver/apiserver/search/union.py:58-241):
  * candidate column pairs = right columns within the AUTO Levenshtein
    edit budget of a left column (0 edits for names < 3 chars, 1 for
    3-5, 2 for 6+ — the ES `fuzzy` clause on columns.name.raw,
    union.py:95, inherits fuzziness AUTO) whose structural type matches
    (`minimum_should_match: 1` over the type terms, union.py:85-93);
  * pairs are greedily assigned 1-1 by DESCENDING 3-gram multiset
    similarity (union.py:172-189 seen-set loop);
  * datasets with <= 1 matched pair are dropped (union.py:184-186);
  * dataset score = (sum of pair similarities / n_query_columns) *
    max_es_score (union.py:191-196), ranked descending.

Divergences, chosen for determinism and oracle-comparability:
  * max_es_score = 1 (no keyword filter in this surface — exactly the
    reference's `es_score = 1` branch when query_args_main is empty,
    union.py:152);
  * similarities are exact integers: sim_e9 = round(inter/union * 1e9)
    computed in integer arithmetic, so `sum_sim_e9` is hash-identical
    to the DuckDB oracle (the float score is sum_sim_e9 /
    (n_query_cols * 1e9), a monotone transform — ranking unchanged);
  * greedy ties resolve by (sim desc, left name, right name) — the
    reference relies on Python sort stability over ES hit order, which
    a distributed engine cannot reproduce.

Shape: the candidate sweep is a Dataset over tables; each task reads
only Parquet FOOTERS (schemas), scores its tables independently
(per-candidate parallelism — the reference scores per ES hit), and the
final ranked page is a tiny driver-side slice (top-k-style result).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from auctus_ray.functions.scalars import edit_distance, name_similarity_counts

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QUERY_TABLE = "customer"

_OUT_SCHEMA = pa.schema(
    [
        ("cand_table", pa.string()),
        ("n_pairs", pa.int64()),
        ("sum_sim_e9", pa.int64()),
        ("n_query_cols", pa.int64()),
        ("matched", pa.string()),
    ]
)


def _tclass(t: pa.DataType) -> str:
    """Structural type class — the union-search type-match term. Must
    mirror the oracle's information_schema data_type mapping."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    return "other"


def _sim_e9(inter: int, union: int) -> int:
    """round-half-up(inter/union * 1e9) in exact integer arithmetic."""
    return (inter * 2_000_000_000 + union) // (2 * union)


def _schema_cols(sf_dir: str, table: str) -> list[tuple[str, str]]:
    s = pq.read_schema(os.path.join(sf_dir, f"{table}.parquet"))
    return [(n.lower(), _tclass(t)) for n, t in zip(s.names, s.types)]


def score_candidate(query_cols: list[tuple[str, str]],
                    cand_cols: list[tuple[str, str]]) -> tuple | None:
    """Greedy fuzzy column match of one candidate against the query:
    (n_pairs, sum_sim_e9, matched_pairs) or None when <= 1 pair."""
    from auctus_ray.functions.scalars import auto_fuzziness

    cands = []
    for ln, lt in query_cols:
        cap = auto_fuzziness(ln)  # ES AUTO: 0/1/2 by query-name length
        for rn, rt in cand_cols:
            if lt == rt and edit_distance(ln, rn, cap) <= cap:
                inter, union = name_similarity_counts(ln, rn)
                cands.append((_sim_e9(inter, union), ln, rn))
    cands.sort(key=lambda x: (-x[0], x[1], x[2]))
    used_l: set[str] = set()
    used_r: set[str] = set()
    pairs = []
    for s, ln, rn in cands:
        if ln in used_l or rn in used_r:
            continue
        used_l.add(ln)
        used_r.add(rn)
        pairs.append((ln, rn, s))
    if len(pairs) <= 1:  # reference: del column_pairs[dataset]
        return None
    pairs.sort(key=lambda p: p[0])
    return (
        len(pairs),
        sum(p[2] for p in pairs),
        ",".join(f"{ln}={rn}" for ln, rn, _ in pairs),
    )


def union_search(sf_dir: str, query_table: str = QUERY_TABLE,
                 page: int = 0, size: int = 50) -> pa.Table:
    """Ranked union-search results for `query_table` against every other
    test table: (rank, cand_table, n_pairs, sum_sim_e9, n_query_cols,
    matched), ordered by score desc (= sum_sim_e9 desc; n_query_cols is
    constant per query) then table name; paginated by (page, size)."""
    query_cols = _schema_cols(sf_dir, query_table)
    nq = len(query_cols)
    tables = [
        t
        for t in TABLES
        if t != query_table and os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    ]
    cands = ray.data.from_items([{"cand_table": t} for t in tables])

    def score_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for tbl in batch["cand_table"].to_pylist():
            r = score_candidate(query_cols, _schema_cols(sf_dir, tbl))
            if r is not None:
                rows.append(
                    {
                        "cand_table": tbl,
                        "n_pairs": r[0],
                        "sum_sim_e9": r[1],
                        "n_query_cols": nq,
                        "matched": r[2],
                    }
                )
        return pa.Table.from_pylist(rows, schema=_OUT_SCHEMA)

    scored = cands.map_batches(score_batch, batch_format="pyarrow").sort(
        ["sum_sim_e9", "cand_table"], descending=[True, False]
    )
    parts = list(scored.iter_batches(batch_format="pyarrow"))
    tbl = pa.concat_tables(parts) if parts else _OUT_SCHEMA.empty_table()
    off = page * size
    tbl = tbl.slice(off, size)
    rank = pa.array(np.arange(off + 1, off + 1 + tbl.num_rows, dtype=np.int64))
    return pa.table(
        {
            "rank": rank,
            "cand_table": tbl["cand_table"],
            "n_pairs": tbl["n_pairs"],
            "sum_sim_e9": tbl["sum_sim_e9"],
            "n_query_cols": tbl["n_query_cols"],
            "matched": tbl["matched"],
        }
    )


def _sql_union_search(query_table: str = QUERY_TABLE) -> str:
    """DuckDB oracle: same candidate generation (AUTO levenshtein
    budget + type-class match via information_schema), same integer 3-gram
    multiset similarity, greedy 1-1 via a recursive CTE walking pairs
    in (sim desc, lcol, rcol) order with used-column lists."""
    tables = ", ".join(f"'{t}'" for t in TABLES)
    return f"""
WITH RECURSIVE cols AS (
  SELECT table_name AS tbl, lower(column_name) AS name,
         CASE WHEN data_type IN ('BIGINT','INTEGER','SMALLINT','TINYINT','HUGEINT','UBIGINT','UINTEGER','USMALLINT','UTINYINT') THEN 'int'
              WHEN data_type IN ('DOUBLE','FLOAT','REAL') OR data_type LIKE 'DECIMAL%' THEN 'float'
              WHEN data_type = 'VARCHAR' THEN 'str'
              WHEN data_type = 'DATE' THEN 'date'
              WHEN data_type LIKE 'TIMESTAMP%' THEN 'ts'
              ELSE 'other' END AS tclass
  FROM information_schema.columns
  WHERE table_name IN ({tables})
),
lcols AS (SELECT name, tclass FROM cols WHERE tbl = '{query_table}'),
rcols AS (SELECT tbl, name, tclass FROM cols WHERE tbl <> '{query_table}'),
cand AS (
  -- ES AUTO fuzziness: edit budget 0/1/2 by query-name length
  SELECT r.tbl, l.name AS lcol, r.name AS rcol
  FROM lcols l JOIN rcols r ON l.tclass = r.tclass
  WHERE levenshtein(l.name, r.name) <=
        CASE WHEN length(l.name) < 3 THEN 0
             WHEN length(l.name) <= 5 THEN 1
             ELSE 2 END
),
names AS (
  SELECT name FROM lcols UNION SELECT name FROM rcols
),
positions AS (SELECT CAST(i AS INTEGER) AS i FROM range(1, 64) t(i)),
grams AS (
  -- uncorrelated cross join + filter (range() rejects lateral params)
  SELECT name,
         CASE WHEN length(name) < 3 THEN name
              ELSE substr(name, p.i, 3) END AS gram,
         COUNT(*) AS cnt
  FROM names, positions p
  WHERE p.i <= CASE WHEN length(name) < 3 THEN 1 ELSE length(name) - 2 END
  GROUP BY 1, 2
),
pair_grams AS (
  -- explicit DISTINCT: inside a WITH RECURSIVE block DuckDB treats the
  -- bare UNION of a non-recursive member as UNION ALL
  SELECT DISTINCT tbl, lcol, rcol, gram FROM (
    SELECT c.tbl, c.lcol, c.rcol, g.gram FROM cand c JOIN grams g ON g.name = c.lcol
    UNION ALL
    SELECT c.tbl, c.lcol, c.rcol, g.gram FROM cand c JOIN grams g ON g.name = c.rcol
  )
),
sims AS (
  SELECT p.tbl, p.lcol, p.rcol,
         SUM(LEAST(COALESCE(a.cnt, 0), COALESCE(b.cnt, 0))) AS inter,
         SUM(GREATEST(COALESCE(a.cnt, 0), COALESCE(b.cnt, 0))) AS uni
  FROM pair_grams p
  LEFT JOIN grams a ON a.name = p.lcol AND a.gram = p.gram
  LEFT JOIN grams b ON b.name = p.rcol AND b.gram = p.gram
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT tbl, lcol, rcol,
         CAST((inter * 2000000000 + uni) // (2 * uni) AS BIGINT) AS sim_e9,
         ROW_NUMBER() OVER (
           PARTITION BY tbl
           ORDER BY (inter * 2000000000 + uni) // (2 * uni) DESC, lcol, rcol
         ) AS rn
  FROM sims
),
pick AS (
  SELECT tbl, CAST(0 AS BIGINT) AS rn,
         CAST([] AS VARCHAR[]) AS used_l, CAST([] AS VARCHAR[]) AS used_r,
         CAST(NULL AS VARCHAR) AS lcol, CAST(NULL AS VARCHAR) AS rcol,
         CAST(NULL AS BIGINT) AS sim_e9, FALSE AS picked
  FROM (SELECT DISTINCT tbl FROM ranked)
  UNION ALL
  SELECT r.tbl, r.rn,
         CASE WHEN NOT list_contains(p.used_l, r.lcol)
               AND NOT list_contains(p.used_r, r.rcol)
              THEN list_append(p.used_l, r.lcol) ELSE p.used_l END,
         CASE WHEN NOT list_contains(p.used_l, r.lcol)
               AND NOT list_contains(p.used_r, r.rcol)
              THEN list_append(p.used_r, r.rcol) ELSE p.used_r END,
         r.lcol, r.rcol, r.sim_e9,
         (NOT list_contains(p.used_l, r.lcol)
          AND NOT list_contains(p.used_r, r.rcol))
  FROM pick p JOIN ranked r ON r.tbl = p.tbl AND r.rn = p.rn + 1
),
pairs AS (SELECT tbl, lcol, rcol, sim_e9 FROM pick WHERE picked),
tablescore AS (
  SELECT tbl AS cand_table, COUNT(*) AS n_pairs,
         CAST(SUM(sim_e9) AS BIGINT) AS sum_sim_e9,
         (SELECT COUNT(*) FROM lcols) AS n_query_cols,
         string_agg(lcol || '=' || rcol, ',' ORDER BY lcol) AS matched
  FROM pairs GROUP BY tbl HAVING COUNT(*) >= 2
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY sum_sim_e9 DESC, cand_table) AS BIGINT) AS rank,
       cand_table, n_pairs, sum_sim_e9, CAST(n_query_cols AS BIGINT) AS n_query_cols, matched
FROM tablescore
ORDER BY rank
"""


SQL_UNION_SEARCH = _sql_union_search()

QUERIES = {"union_search": union_search}
SQL = {"union_search": SQL_UNION_SEARCH}
