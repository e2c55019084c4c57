"""Temporal join/window operators Ray Data lacks natively.

The brief's canonical "custom operator" examples: the AS-OF join and
hopping (sliding) windowed aggregates. Both are expressed as
composition of map_batches + groupby(key).map_groups — one hash
shuffle co-locates each key's rows, per-group work is vectorized
searchsorted / bucket arithmetic. Partitioning assumption: a single
key's rows fit one task (same assumption as the reference's per-chunk
pandas join, lib_augmentation/augmentation.py:250-336).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(left_ds, right_ds, key: str, ts_col: str,
              right_cols: list[str], right_suffix: str = "_right"):
    """For every left row, attach the right row with the greatest
    ts <= left.ts within the same key (classic as-of join; e.g.
    attribute each purchase to the user's latest prior signup).

    `ts_col` must be an integer column on both sides (cast timestamps
    to epoch micros upstream — keeps the merge math dtype-exact).
    Left rows with no prior right row keep nulls. Right-side ties on
    (key, ts) resolve deterministically: greatest right_cols[0] wins.

    Shape: both sides are tagged and unioned, ONE groupby(key) shuffle
    co-locates them, and the per-group merge is a vectorized
    searchsorted of left timestamps into the sorted right timestamps.
    Partitioning assumption: one key's rows fit one task.
    """
    lschema = left_ds.schema()
    lcols = lschema.names
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}

    def pad_l(t: pa.Table) -> pa.Table:
        for c in right_cols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, pa.int64()))
        return t.append_column("_side", pa.array([0] * t.num_rows, pa.int8()))

    def tag_r(t: pa.Table) -> pa.Table:
        cols = {key: t[key], ts_col: pc.cast(t[ts_col], pa.int64())}
        for c in right_cols:
            cols[c] = pc.cast(t[c], pa.int64())
        out = pa.table(cols)
        for c in lcols:
            if c not in out.column_names:
                # null placeholders typed from the LEFT schema, so the
                # union works for string/float left columns too
                out = out.append_column(c, pa.nulls(t.num_rows, ltypes[c]))
        out = out.select(lcols + [c for c in right_cols if c not in lcols])
        return out.append_column("_side", pa.array([1] * t.num_rows, pa.int8()))

    both = left_ds.map_batches(pad_l, batch_format="pyarrow").union(
        right_ds.map_batches(tag_r, batch_format="pyarrow")
    )
    payload0 = right_cols[0]

    def merge(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        lt = group.filter(pa.array(lmask))
        rt = group.filter(pa.array(~lmask))
        lcols_out = {c: lt[c] for c in lcols}
        n = lt.num_rows
        # right rows carry no nulls in ts/payload, so these convert as
        # int64 directly — never through NaN-padded float64, which would
        # silently corrupt ids above 2^53
        rts = rt[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rpay = {
            c: rt[c].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in right_cols
        }
        lts = lt[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if n == 0:
            # empty output typed from the LEFT schema (an all-int64
            # empty block would conflict with string/float left columns
            # at schema unification)
            out = {c: pa.nulls(0, ltypes[c]) for c in lcols}
            out[ts_col + right_suffix] = pa.nulls(0, pa.int64())
            for c in right_cols:
                out[c + right_suffix] = pa.nulls(0, pa.int64())
            return pa.table(out)
        if rts.size == 0:
            out = dict(lcols_out)
            out[ts_col + right_suffix] = pa.nulls(n, pa.int64())
            for c in right_cols:
                out[c + right_suffix] = pa.nulls(n, pa.int64())
            return pa.table(out)
        order = np.lexsort((rpay[payload0], rts))
        rts = rts[order]
        rpay = {c: v[order] for c, v in rpay.items()}
        pos = np.searchsorted(rts, lts, side="right") - 1
        matched = pos >= 0
        pos_c = np.clip(pos, 0, rts.size - 1)
        unmatched = ~matched
        out = dict(lcols_out)
        # vectorized null-masked gather (mask=True marks nulls)
        out[ts_col + right_suffix] = pa.array(rts[pos_c], mask=unmatched)
        for c in right_cols:
            out[c + right_suffix] = pa.array(rpay[c][pos_c], mask=unmatched)
        return pa.table(out)

    return both.groupby(key).map_groups(merge, batch_format="pyarrow")


def hopping_window_agg(ds, ts_col: str, value_col: str,
                       size_minutes: int = 60, hop_minutes: int = 30):
    """Hopping (sliding) windowed aggregate: each event lands in
    size/hop overlapping windows; per (window_start) emit count + sum.

    Shape: a flat-map-style map_batches explodes each row into its
    size/hop windows (pure arithmetic — timestamps bucket to the hop
    grid, then offsets enumerate the windows), then ONE groupby(window)
    reduce. The explode factor (size/hop) is the only amplification;
    no sort, no per-row Python."""
    from ray.data.aggregate import Count, Sum

    n_offsets = size_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False)
        base = (tsv // hop_us) * hop_us  # newest window containing ts
        n = tsv.size
        # windows: base, base - hop, ..., (size/hop of them)
        starts = (
            base[None, :].repeat(n_offsets, axis=0)
            - (np.arange(n_offsets, dtype=np.int64) * hop_us)[:, None]
        ).ravel()
        v = pc.cast(batch[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        # half-AWAY rounding, matching DuckDB ROUND() in the oracle
        # (np.rint is half-to-even; floor(x+0.5) alone is half-UP and
        # diverges on NEGATIVE exact half cents — copysign fixes both)
        vc = v * 100.0
        cents = np.copysign(np.floor(np.abs(vc) + 0.5), vc).astype(np.int64)
        return pa.table(
            {
                "window_start_us": pa.array(starts),
                "cents": pa.array(np.tile(cents, n_offsets)),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="sum_value_cents"),
        )
    )
