"""D3M dataset-directory writer (the reference's `d3m` materialization
format, lib_materialize/datamart_materialize/d3m.py:220-287).

Layout written under `destination/`:
    datasetDoc.json            -- MIT-LL dataset schema (3.2.0 / 4.0.0)
    tables/learningData.csv    -- the table, single CSV

Re-expressed for Ray Data: the table arrives as a Dataset and STREAMS
through the writer batch-by-batch (pyarrow.csv incremental writer —
vectorized C++ CSV encoding, constant memory, never a whole-table
materialization). The single-file output is the FORMAT's requirement
(a D3M consumer expects exactly `tables/learningData.csv`), not an
engine choice — the engine-native resumable sink remains partitioned
Parquet (index/build.py, state/manifest.py); this writer is the
interchange exit, mirroring the reference's own single-threaded CSV
writer at parity. The optional `d3mIndex` column is generated with a
running counter across batches (reference _D3mAddIndex:101-218).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

# structural-type -> D3M colType (reference d3m.py:14-19), keyed by the
# same public schema.org URI constants the profiler emits
from auctus_ray.pipelines.profile import (
    T_BOOLEAN,
    T_CATEGORICAL,
    T_DATE_TIME,
    T_FLOAT,
    T_INTEGER,
    T_TEXT,
)

STRUCTURAL_TYPE_MAP = {
    T_BOOLEAN: "boolean",
    T_INTEGER: "integer",
    T_FLOAT: "real",
    T_TEXT: "string",
}

DEFAULT_VERSION = "4.0.0"

_ARROW_STRUCTURAL = (
    (pa.types.is_boolean, T_BOOLEAN),
    (pa.types.is_integer, T_INTEGER),
    (pa.types.is_floating, T_FLOAT),
)


def _columns_from_schema(schema: pa.Schema) -> list[dict]:
    """Minimal column metadata straight from an Arrow schema, for
    callers without a profile document."""
    cols = []
    for f in schema:
        st = T_TEXT
        for pred, t in _ARROW_STRUCTURAL:
            if pred(f.type):
                st = t
                break
        sem = [T_DATE_TIME] if pa.types.is_timestamp(f.type) else []
        cols.append(
            {"name": f.name, "structural_type": st, "semantic_types": sem}
        )
    return cols


def d3m_metadata(dataset_id: str, metadata: dict, *, version: str | None = None,
                 need_d3mindex: bool = False) -> dict:
    """datasetDoc.json contents (reference d3m.py:25-99: same column
    type precedence — boolean/categorical semantic types win, TEXT with
    a DateTime semantic becomes dateTime, else the structural map)."""
    if not version:
        version = DEFAULT_VERSION
    elif version not in ("3.2.0", "4.0.0"):
        raise ValueError(f"unknown D3M schema version {version!r}")

    columns = list(metadata["columns"])
    if need_d3mindex and not any(c["name"] == "d3mIndex" for c in columns):
        columns.insert(
            0,
            {
                "name": "d3mIndex",
                "structural_type": T_INTEGER,
                "semantic_types": ["http://schema.org/identifier"],
            },
        )

    d3m_columns = []
    for i, column in enumerate(columns):
        sem = column.get("semantic_types", [])
        if T_BOOLEAN in sem:
            col_type = "boolean"
        elif T_CATEGORICAL in sem:
            col_type = "categorical"
        elif column["structural_type"] == T_TEXT and T_DATE_TIME in sem:
            col_type = "dateTime"
        else:
            col_type = STRUCTURAL_TYPE_MAP.get(column["structural_type"], "string")
        d3m_columns.append(
            {
                "colIndex": i,
                "colName": column["name"],
                "colType": col_type,
                "role": ["index" if column["name"] == "d3mIndex" else "attribute"],
            }
        )

    meta = {
        "about": {
            "datasetID": dataset_id,
            "datasetName": metadata.get("name", dataset_id),
            "license": metadata.get("license", "unknown"),
            "datasetSchemaVersion": version,
            "redacted": False,
            "datasetVersion": "1.0",
        },
        "dataResources": [
            {
                "resID": "learningData",
                "resPath": "tables/learningData.csv",
                "resType": "table",
                "resFormat": (
                    {"text/csv": ["csv"]} if version == "4.0.0" else ["text/csv"]
                ),
                "isCollection": False,
                "columns": d3m_columns,
            }
        ],
    }
    if "description" in metadata:
        meta["about"]["description"] = metadata["description"]
    if "size" in metadata:
        meta["about"]["approximateSize"] = "%d B" % metadata["size"]
    if "qualities" in metadata:
        meta["qualities"] = metadata["qualities"]
    return meta


def write_d3m_dataset(ds, destination: str, dataset_id: str, *,
                      version: str = DEFAULT_VERSION,
                      need_d3mindex: bool = False,
                      metadata: dict | None = None) -> str:
    """Write a ray.data.Dataset (or pyarrow.Table) as a D3M dataset
    directory. Streams batch-by-batch; `metadata` follows the
    reference's writer contract ({'columns': [...], 'name'?, ...}) and
    defaults to schema-derived column metadata. Returns `destination`.
    """
    import pyarrow.csv as pacsv

    if isinstance(ds, pa.Table):
        batches = ds.to_batches()
        schema = ds.schema
    else:
        schema = ds.schema().base_schema

        def _flat(it):
            # iter_batches may yield RecordBatch or Table depending on
            # the Ray version; one type test, no intermediate lists
            for item in it:
                if isinstance(item, pa.RecordBatch):
                    yield item
                else:
                    yield from item.to_batches()

        batches = _flat(ds.iter_batches(batch_format="pyarrow"))

    add_index = need_d3mindex and "d3mIndex" not in schema.names
    out_schema = schema
    if add_index:
        out_schema = schema.insert(0, pa.field("d3mIndex", pa.int64()))

    os.makedirs(os.path.join(destination, "tables"), exist_ok=True)
    csv_path = os.path.join(destination, "tables", "learningData.csv")
    n_rows = 0
    with pacsv.CSVWriter(csv_path, out_schema) as w:
        for rb in batches:
            if add_index:
                idx = pa.array(
                    np.arange(n_rows, n_rows + rb.num_rows, dtype=np.int64)
                )
                cols = [idx] + [rb.column(i) for i in range(rb.num_columns)]
                rb = pa.RecordBatch.from_arrays(cols, schema=out_schema)
            n_rows += rb.num_rows
            w.write(rb)

    meta = dict(metadata or {})
    meta.setdefault("columns", _columns_from_schema(schema))
    meta.setdefault("size", os.path.getsize(csv_path))
    doc = d3m_metadata(
        dataset_id, meta, version=version, need_d3mindex=need_d3mindex
    )
    with open(os.path.join(destination, "datasetDoc.json"), "w",
              encoding="utf-8", newline="") as fp:
        json.dump(doc, fp, sort_keys=True, indent=2)
    return destination
