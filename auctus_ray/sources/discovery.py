"""Discoverer plugin surface: the reference's user-extension base class
(lib_core/datamart_core/discovery.py:20-167) re-expressed without the
AMQP/Elasticsearch service mesh.

Mapping of the reference's moving parts:
  * the AMQP `profile` queue  -> a PENDING set in a `Manifest` journal
    (stage "discovered" minus stage "profiled"), durable + resumable;
  * `record_dataset`          -> same metadata defaulting contract
    (name/source fallbacks, strip_html on description, `identifier.`
    id prefix, materialize identifier+date stamp), journaled instead of
    published (discovery.py:107-124);
  * the profiler consumers    -> `profile_pending`, which drains the
    pending set one dataset at a time — each dataset's profile is
    itself a DISTRIBUTED Ray Data pipeline, so draining sequentially
    mirrors the reference's prefetch_count=1 consumer loop
    (profiler.py:229-232) while still using the whole cluster per
    dataset; finished datasets are skipped on resume via content
    fingerprints (T7 idempotency);
  * `delete_dataset`          -> a journaled tombstone; listings and
    the pending set honor it (the D5 delete-then-reinsert shape:
    re-recording after a delete makes the dataset pending again).

Profiles land as one JSON file per dataset (atomic tmp+rename) under
`<catalog_dir>/profiles/` — the analog of the reference's per-dataset
ES documents.
"""

from __future__ import annotations

import datetime
import json
import os
import uuid

from auctus_ray.functions.scalars import encode_dataset_id, strip_html
from auctus_ray.state.manifest import Manifest, file_fingerprint


class Discoverer:
    """Base class for discoverer plugins: subclass, implement
    ``discover_datasets``, call ``record_dataset`` for each find."""

    def __init__(self, identifier: str, catalog_dir: str):
        self.identifier = identifier
        self.catalog_dir = catalog_dir
        self.catalog = Manifest(catalog_dir)

    # -- plugin hook ------------------------------------------------------
    def discover_datasets(self) -> None:  # pragma: no cover - interface
        """Override: sweep the source, call record_dataset per dataset."""

    # -- recording --------------------------------------------------------
    def record_dataset(
        self,
        materialize: dict,
        metadata: dict,
        dataset_id: str | None = None,
    ) -> str:
        """Journal a found dataset for profiling; returns the full id.
        Same defaulting contract as the reference (discovery.py:107-124)."""
        if dataset_id is None:
            dataset_id = uuid.uuid4().hex
        full_id = f"{self.identifier}.{dataset_id}"
        metadata = dict(metadata)
        metadata.setdefault("name", dataset_id)
        metadata.setdefault("source", self.identifier)
        if "description" in metadata:
            metadata["description"] = strip_html(metadata["description"])
        materialize = dict(
            materialize,
            identifier=self.identifier,
            date=datetime.datetime.utcnow().isoformat() + "Z",
        )
        path = materialize.get("path")
        fp = file_fingerprint([path]) if path and os.path.exists(path) else "meta"
        self.catalog.mark(
            "discovered",
            full_id,
            fp,
            "done",
            metrics={"metadata": metadata, "materialize": materialize},
        )
        return full_id

    def delete_dataset(self, *, full_id: str | None = None,
                       dataset_id: str | None = None) -> None:
        """Tombstone a dataset no longer present in the source
        (discovery.py:141-158); its profile file is removed too."""
        if (full_id is not None) == (dataset_id is not None):
            raise TypeError("Pass only one of 'dataset_id' and 'full_id'")
        if full_id is None:
            full_id = f"{self.identifier}.{dataset_id}"
        self.catalog.mark("discovered", full_id, "tombstone", "deleted")
        # invalidate the profiled record too: re-recording after a delete
        # must re-profile even if the content fingerprint is unchanged
        # (D5 delete-then-reinsert — the reference drops the ES document)
        self.catalog.mark("profiled", full_id, "tombstone", "deleted")
        prof = self._profile_path(full_id)
        if os.path.exists(prof):
            os.remove(prof)

    # -- listings ---------------------------------------------------------
    def datasets(self) -> list[dict]:
        """Live (non-deleted) discovered datasets, discovery order."""
        return [
            {
                "id": r["partition"],
                "fingerprint": r["fingerprint"],
                **r["metrics"],
            }
            for r in self.catalog.records()
            if r["stage"] == "discovered" and r["status"] == "done"
        ]

    def pending(self) -> list[dict]:
        """Discovered datasets whose CURRENT content fingerprint has no
        'profiled' record — the profile queue."""
        out = []
        for d in self.datasets():
            if not self.catalog.is_done("profiled", d["id"], d["fingerprint"]):
                out.append(d)
        return out

    # -- profiling (queue consumer) --------------------------------------
    def _profile_path(self, full_id: str) -> str:
        return os.path.join(
            self.catalog_dir, "profiles", encode_dataset_id(full_id) + ".json"
        )

    def profile_pending(self, **profile_kwargs) -> list[str]:
        """Drain the pending set: profile each dataset (a distributed
        Ray Data pipeline per dataset) and journal completion keyed by
        content fingerprint, so reruns skip finished work and content
        changes re-profile. Returns the ids profiled this call."""
        from auctus_ray.pipelines.document import profile_dataset_document

        os.makedirs(os.path.join(self.catalog_dir, "profiles"), exist_ok=True)
        done = []
        for d in self.pending():
            path = d.get("materialize", {}).get("path")
            if not path or not os.path.exists(path):
                self.catalog.mark(
                    "profiled", d["id"], d["fingerprint"], "error",
                    metrics={"error": "materialize.path missing"},
                )
                continue
            doc = profile_dataset_document(path, **profile_kwargs)
            doc["id"] = d["id"]
            doc["metadata"] = d.get("metadata", {})
            tmp = self._profile_path(d["id"]) + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(doc, f, sort_keys=True)
            os.replace(tmp, self._profile_path(d["id"]))
            self.catalog.mark(
                "profiled", d["id"], d["fingerprint"], "done",
                metrics={"nb_rows": doc.get("nb_rows", 0)},
            )
            done.append(d["id"])
        return done


class LocalDirectoryDiscoverer(Discoverer):
    """Example plugin: sweep a directory of data files (every format the
    ingestion sniffer understands) and record each as a dataset — the
    shape of the reference's socrata/zenodo/... directory plugins
    without their network clients."""

    EXTENSIONS = (".parquet", ".csv", ".tsv", ".xlsx", ".txt")

    def __init__(self, identifier: str, catalog_dir: str, root: str):
        super().__init__(identifier, catalog_dir)
        self.root = root

    def discover_datasets(self) -> list[str]:
        found = []
        for name in sorted(os.listdir(self.root)):
            if not name.lower().endswith(self.EXTENSIONS):
                continue
            path = os.path.join(self.root, name)
            if not os.path.isfile(path):
                continue
            dataset_id = os.path.splitext(name)[0]
            found.append(
                self.record_dataset(
                    {"path": path},
                    {"name": dataset_id},
                    dataset_id=dataset_id,
                )
            )
        return found
