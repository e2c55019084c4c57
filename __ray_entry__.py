"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself, then:
  * ``entry()`` — smoke: flagship pipeline at sf0.001;
  * ``queries()[name](sf_dir)`` vs ``oracle_sql()[name]`` via DuckDB at
    sf0.01 (row-count + schema + order-insensitive value-hash).

Nothing here (or in auctus_ray) calls ray.init/ray.shutdown.
"""

from __future__ import annotations

import sys
import os
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents and run
    the BM25 top-k query pipeline; returns the top-k result table."""
    from auctus_ray.pipelines.fulltext import bm25_topk_or

    return bm25_topk_or("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from auctus_ray.pipelines import (
        augsearch,
        document,
        fulltext,
        joinsearch,
        profile,
        relational,
        training,
        unionsearch,
    )

    out: dict[str, Callable[[str], Any]] = {}
    out.update(relational.QUERIES)
    out.update(augsearch.QUERIES)
    out.update(fulltext.QUERIES)
    out.update(training.QUERIES)
    out.update(profile.QUERIES)
    out.update(joinsearch.QUERIES)
    out.update(unionsearch.QUERIES)
    out.update(document.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from auctus_ray.pipelines import (
        augsearch,
        fulltext,
        joinsearch,
        profile,
        relational,
        training,
        unionsearch,
    )

    out: dict[str, str] = {}
    out.update(relational.SQL)
    out.update(augsearch.SQL)
    out.update(fulltext.SQL)
    out.update(training.SQL)
    out.update(profile.SQL)
    out.update(joinsearch.SQL)
    out.update(unionsearch.SQL)
    return out
