"""Augmentation operators: schema-aligned union (reference J4).

Mirrors lib_augmentation/datamart_augmentation/augmentation.py:627-764:
the right table's columns are mapped onto the left schema (explicit
mapping, else fuzzy 3-gram greedy matching — the union-search pairing,
apiserver/search/union.py:172-189), unmapped left columns become nulls,
column order follows the left schema, and the result is a bag union.
Streaming: the right side is projected per batch; no materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from auctus_ray.functions.scalars import greedy_column_match


def union_align(left_ds, right_ds, mapping: dict[str, str] | None = None,
                min_similarity: float = 0.3):
    """left_ds ∪ right_ds with the right side projected to left's schema.

    mapping: {left_col: right_col}; inferred by greedy 3-gram name
    similarity when omitted (pairs under min_similarity stay unmapped ->
    null column). Returns (unioned_dataset, mapping_used).
    """
    left_schema = left_ds.schema()
    left_names = left_schema.names
    right_names = right_ds.schema().names
    if mapping is None:
        matched = greedy_column_match(left_names, right_names, min_sim=min_similarity)
        mapping = {lc: rc for lc, rc, _ in matched}

    left_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}

    def project(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in left_names:
            src = mapping.get(name)
            if src is not None and src in batch.column_names:
                col = batch[src]
                if col.type != left_types[name]:
                    col = col.cast(left_types[name])
                cols[name] = col
            else:
                cols[name] = pa.nulls(batch.num_rows, type=left_types[name])
        return pa.table(cols)

    projected = right_ds.map_batches(project, batch_format="pyarrow")
    return left_ds.union(projected), mapping


def pivot_wide_to_long(ds, carried_cols: list[str], value_cols: list[str],
                       var_name: str = "date", value_name: str = "value"):
    """S5 wide->long unpivot (reference pivot converter,
    lib_materialize/datamart_materialize/pivot.py:9-40: tables whose
    columns are dates/years become (carried..., date, value) rows).
    A flat_map-shaped map_batches: each input row emits one row per
    value column."""
    import pyarrow as pa

    def unpivot(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = len(value_cols)
        cols = {}
        for c in carried_cols:
            col = batch[c].combine_chunks() if isinstance(batch[c], pa.ChunkedArray) else batch[c]
            # repeat each carried value k times (row-major explode)
            idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
            cols[c] = col.take(idx)
        cols[var_name] = pa.array(value_cols * n, pa.string())
        vals = [batch[vc] for vc in value_cols]
        casted = [v.cast(pa.float64()) for v in vals]
        stacked = np.empty(n * k, dtype=np.float64)
        for j, v in enumerate(casted):
            stacked[j::k] = v.to_numpy(zero_copy_only=False)
        cols[value_name] = pa.array(stacked)
        return pa.table(cols)

    return ds.map_batches(unpivot, batch_format="pyarrow")
