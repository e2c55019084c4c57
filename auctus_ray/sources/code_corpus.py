"""Deterministic synthetic source-code corpus + query set (FIXTURES.md §A).

No external data and no wall-clock: every row is a pure function of
``(seed, row index)``. Content mixes (1) a Zipfian common-token pool to
force term skew (the `the`/`license`/`def` problem, SURVEY.md §7.4),
(2) camelCase / snake_case / digit-suffixed identifiers exercising the
code-aware splitter (reference ``expand_attribute_name``,
lib_profiler/datamart_profiler/core.py:100-123), (3) rare one-doc tokens
for df=1 scoring, and (4) empty + oversized contents for edge/skew cases.

The generator is vectorized with numpy and emits Parquet in row-group
sized files so Ray Data can parallelize the read.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from auctus_ray.schema import CORPUS, QUERY_SET

LANGS = ["python", "java", "js", "go", "c", "md"]
LANG_WEIGHTS = [0.35, 0.2, 0.15, 0.1, 0.1, 0.1]
LANG_EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "c": "c", "md": "md"}

# Zipfian common pool — includes real stop-ish code terms
COMMON_POOL = (
    "the def return license import class if else for while in not and or "
    "is none true false self this function var let const static void int "
    "public private new delete try except raise string value data result "
    "foo bar baz qux main test util index node list map set key"
).split()

CAMEL_PARTS = (
    "get set http response request parse build make read write open close "
    "buffer stream token index shard merge query score batch block actor"
).split()


def _rng(seed: int, tag: str) -> np.random.Generator:
    h = hashlib.sha256(f"{seed}:{tag}".encode()).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "little")))


def generate_corpus(
    out_dir: str,
    n_rows: int = 5000,
    seed: int = 89,  # reference RANDOM_SEED (lib_profiler core.py:33)
    rows_per_file: int = 2500,
    mean_tokens: int = 120,
) -> list[str]:
    """Write the corpus as Parquet files under out_dir; returns file paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, n_rows, rows_per_file):
        end = min(start + rows_per_file, n_rows)
        table = _make_rows(start, end, seed, mean_tokens)
        p = os.path.join(out_dir, f"corpus-{start:08d}.parquet")
        pq.write_table(table, p)
        paths.append(p)
    return paths


def generate_corpus_ray(
    out_dir: str,
    n_rows: int,
    seed: int = 89,
    rows_per_file: int = 5000,
    mean_tokens: int = 120,
) -> list[str]:
    """Parallel generation via Ray tasks. Bit-identical output to
    generate_corpus with the same rows_per_file: every file is a pure
    function of (seed, start, end). Ray must already be initialized."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    spans = [
        (s, min(s + rows_per_file, n_rows)) for s in range(0, n_rows, rows_per_file)
    ]

    @ray.remote
    def _gen(start: int, end: int) -> str:
        table = _make_rows(start, end, seed, mean_tokens)
        p = os.path.join(out_dir, f"corpus-{start:08d}.parquet")
        tmp = p + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, p)
        return p

    return sorted(ray.get([_gen.remote(s, e) for s, e in spans]))


def _make_rows(start: int, end: int, seed: int, mean_tokens: int) -> pa.Table:
    n = end - start
    idx = np.arange(start, end)
    rng = _rng(seed, f"rows:{start}:{end}")

    n_repos = 40
    repo_i = rng.integers(0, 8, n)
    repo_j = rng.integers(0, n_repos // 8, n)
    repos = [f"org{i}/proj{j}" for i, j in zip(repo_i, repo_j)]
    langs = rng.choice(len(LANGS), n, p=LANG_WEIGHTS)
    lang_col = [LANGS[i] for i in langs]
    paths = [
        f"src/{d}/{name}_{k}.{LANG_EXT[LANGS[li]]}"
        for d, name, k, li in zip(
            rng.integers(0, 20, n), rng.integers(0, 50, n), idx, langs
        )
    ]
    commits = [
        hashlib.sha1(f"{r}/{p}#{k}".encode()).hexdigest()
        for r, p, k in zip(repos, paths, idx)
    ]

    contents = []
    # Zipf over the common pool: rank r has weight 1/(r+1)
    ranks = np.arange(len(COMMON_POOL))
    zipf_p = 1.0 / (ranks + 1.0)
    zipf_p /= zipf_p.sum()
    lens = np.maximum(1, rng.poisson(mean_tokens, n))
    for i in range(n):
        row_id = int(idx[i])
        rr = _rng(seed, f"content:{row_id}")
        if row_id % 97 == 0:
            contents.append("")  # empty-content edge case
            continue
        ln = int(lens[i])
        if row_id % 401 == 0:
            ln = 40_000  # oversized blob (~hundreds of KB) — skew case
        common = rr.choice(COMMON_POOL, size=ln, p=zipf_p)
        # sprinkle camelCase / snake_case / digit identifiers (~1 in 8 tokens)
        n_ident = max(1, ln // 8)
        pos = rr.integers(0, ln, n_ident)
        parts = rr.choice(CAMEL_PARTS, size=(n_ident, 3))
        styles = rr.integers(0, 3, n_ident)
        toks = common.astype(object)
        for j in range(n_ident):
            a, b, c = parts[j]
            if styles[j] == 0:
                ident = a + b.capitalize() + c.capitalize()  # camelCase
            elif styles[j] == 1:
                ident = f"{a}_{b}_{c}"  # snake_case
            else:
                ident = f"{a}{b.capitalize()}{int(rr.integers(0, 100))}"
            toks[pos[j]] = ident
        # one rare unique token per ~5 docs
        if row_id % 5 == 0:
            toks[int(rr.integers(0, ln))] = f"rareterm{row_id}x"
        contents.append(" ".join(toks.tolist()))

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
            "content": pa.array(contents, pa.string()),
        },
        schema=CORPUS,
    )


def generate_query_set(out_path: str | None = None, seed: int = 89) -> pa.Table:
    """The reference query set (FIXTURES.md §A2): common/rare/conjunctive/
    camelCase/absent queries at k=10 and k=50 (TOP_K_SIZE, search/base.py:1)."""
    queries: list[tuple[str, int, str]] = []
    for k in (10, 50):
        queries += [
            ("the", k, "or"),
            ("license", k, "and"),
            ("rareterm10x", k, "and"),
            ("def return", k, "and"),
            ("import class function", k, "and"),
            ("getHttpResponse", k, "and"),  # must match after code splitting
            ("parseBuildMake", k, "or"),
            ("zzznotaterm", k, "and"),  # absent term -> empty result
            ("the license def return", k, "and"),
            ("buffer_stream_token", k, "or"),
            ("score batch", k, "or"),
            ("rareterm0x rareterm5x", k, "or"),
        ]
    t = pa.table(
        {
            "qid": pa.array(range(len(queries)), pa.int64()),
            "query": pa.array([q for q, _, _ in queries], pa.string()),
            "k": pa.array([k for _, k, _ in queries], pa.int64()),
            "operator": pa.array([op for _, _, op in queries], pa.string()),
        },
        schema=QUERY_SET,
    )
    if out_path:
        pq.write_table(t, out_path)
    return t
