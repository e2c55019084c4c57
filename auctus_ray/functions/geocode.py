"""Nominatim geocoder client (T3): the reference's external-service
wrapper with batching, failure-splitting, a request cap and a per-run
cache (lib_profiler/datamart_profiler/spatial.py:211-330), re-expressed
transport-injectable so it tests against an in-process mock exactly
like the reference's own suite (tests/test_profile.py:725-857 swaps
nominatim_query) — this environment has no network, so the DEFAULT
transport fails fast.

Reference semantics mirrored:
  * batch queries of NOMINATIM_BATCH_SIZE=20 addresses (spatial.py:32);
  * 5 attempts on 502/503/504 (nominatim_query, spatial.py:214-231);
  * a 414/500 batch is SPLIT in half recursively down to
    NOMINATIM_MIN_SPLIT_BATCH_SIZE=2 (_nominatim_batch, :255-268);
  * per-run cache of value -> (lat, lon) | None; at most
    MAX_NOMINATIM_REQUESTS=200 distinct values queried (:290-316);
  * values longer than MAX_ADDRESS_LENGTH=90 are skipped (:305);
  * a column is an ADDRESS when >= 80% of its non-empty values resolve
    (MAX_UNCLEAN_ADDRESSES=0.20, core.py:38, 448-463).

Scale shape: the cache lives in ONE Ray actor (`GeocoderActor`) shared
by every profiling task — the reference's single Nominatim service +
requests.Session. The request cap bounds total external calls per run,
so fan-out parallelism is deliberately NOT applied to the HTTP leg.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_ADDRESS_LENGTH = 90  # reference spatial.py:30
MAX_NOMINATIM_REQUESTS = 200  # spatial.py:31
NOMINATIM_BATCH_SIZE = 20  # spatial.py:32
NOMINATIM_MIN_SPLIT_BATCH_SIZE = 2  # spatial.py:33
MAX_UNCLEAN_ADDRESSES = 0.20  # reference core.py:38
RETRY_STATUSES = (502, 503, 504)
SPLIT_STATUSES = (414, 500)

T_ADDRESS = "http://schema.org/address"  # reference types.py


class GeocodeHTTPError(Exception):
    """Transport-level failure carrying the HTTP status code."""

    def __init__(self, message: str, status_code: int):
        super().__init__(message)
        self.status_code = status_code


class GeocoderUnavailable(RuntimeError):
    """No transport injected and the environment has no network."""


def _no_network_transport(url: str, queries: list[str]):
    raise GeocoderUnavailable(
        "Nominatim transport not configured (this environment has no "
        "network); inject transport=callable(url, queries) -> "
        "list[list[{'lat','lon'}]]"
    )


class NominatimClient:
    """Batched, retrying, cache-backed Nominatim client.

    ``transport(url, queries)`` performs ONE batch HTTP query and
    returns one result list per query (possibly empty), raising
    GeocodeHTTPError on failure — the reference's nominatim_query
    minus the requests.Session plumbing."""

    def __init__(self, url: str, transport=None):
        self.url = url.rstrip("/")
        self.transport = transport or _no_network_transport
        self.cache: dict[str, tuple[float, float] | None] = {}
        self.n_requests = 0  # transport calls (for tests/metrics)

    def _query(self, queries: list[str]):
        """5 attempts on gateway errors (reference spatial.py:214-231;
        no sleep here — the transport owns pacing)."""
        last: GeocodeHTTPError | None = None
        for _ in range(5):
            try:
                self.n_requests += 1
                return self.transport(self.url, queries)
            except GeocodeHTTPError as e:
                last = e
                if e.status_code not in RETRY_STATUSES:
                    raise
        raise last

    def _resolve_batch(self, batch: dict[str, int],
                       locations: list) -> int:
        """One batch through the transport; 414/500 splits in half
        recursively (reference _nominatim_batch, spatial.py:255-286).
        Returns the not-found occurrence count."""
        try:
            locs = self._query(list(batch.keys()))
        except GeocodeHTTPError as e:
            if (
                e.status_code in SPLIT_STATUSES
                and len(batch) >= max(2, NOMINATIM_MIN_SPLIT_BATCH_SIZE)
            ):
                items = list(batch.items())
                mid = len(batch) // 2
                # the caller's dict must empty too — a stale batch would
                # re-query (and double-append) everything at the final
                # flush and stop the ==BATCH_SIZE flush from ever firing
                batch.clear()
                return self._resolve_batch(
                    dict(items[:mid]), locations
                ) + self._resolve_batch(dict(items[mid:]), locations)
            raise
        not_found = 0
        for location, (value, count) in zip(locs, batch.items()):
            if location:
                loc = (float(location[0]["lat"]), float(location[0]["lon"]))
                self.cache[value] = loc
                locations.extend([loc] * count)
            else:
                self.cache[value] = None
                not_found += count
        batch.clear()
        return not_found

    def resolve_all(self, values,
                    max_requests: int = MAX_NOMINATIM_REQUESTS):
        """(locations, non_empty) over an iterable of raw cell values —
        the reference nominatim_resolve_all (spatial.py:290-330): strip,
        skip empties and >90-char values, dedupe through the cache,
        flush every 20 distinct unknowns, stop querying once
        ``max_requests`` distinct values have been resolved."""
        locations: list[tuple[float, float]] = []
        non_empty = 0
        batch: dict[str, int] = {}
        capped = False
        for value in values:
            value = (value or "").strip()
            if not value:
                continue
            non_empty += 1
            if len(value) > MAX_ADDRESS_LENGTH:
                continue
            if value in self.cache:
                if self.cache[value] is not None:
                    locations.append(self.cache[value])
            elif capped:
                continue
            elif value in batch:
                batch[value] += 1
            else:
                batch[value] = 1
                if len(batch) == NOMINATIM_BATCH_SIZE:
                    self._resolve_batch(batch, locations)
                    if len(self.cache) >= max_requests:
                        capped = True
        if batch and len(self.cache) < max_requests:
            self._resolve_batch(batch, locations)
        return locations, non_empty


def make_geocoder_actor(url: str, transport=None):
    """The shared geocoder service as ONE Ray actor: every profiling
    task resolves through the same cache (the reference's single
    Nominatim instance + session). Returns the actor handle; call
    ``.resolve.remote(list_of_values)`` -> (locations, non_empty)."""
    import ray

    @ray.remote(num_cpus=0)
    class GeocoderActor:
        def __init__(self, url: str, transport):
            self.client = NominatimClient(url, transport)

        def resolve(self, values: list,
                    max_requests: int = MAX_NOMINATIM_REQUESTS):
            return self.client.resolve_all(values, max_requests)

        def stats(self) -> dict:
            return {
                "cached": len(self.client.cache),
                "requests": self.client.n_requests,
            }

    return GeocoderActor.remote(url, transport)


def column_is_address(ds, column: str, geocoder) -> tuple[bool, list]:
    """ADDRESS decision for one column against a geocoder actor
    (reference core.py:448-463): stream the column's values to the
    shared actor (cap-bounded), ADDRESS when >= 80% of non-empty
    values resolve. Returns (is_address, resolved_locations)."""
    import pyarrow.compute as pc
    import ray

    def to_vals(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        return pa.table({"value": pc.fill_null(col, "")})

    # the request cap (200 distinct queries) bounds external work, so
    # the column streams through the ONE cache-holding actor serially —
    # parallel fan-out would multiply requests, not speed
    locations: list = []
    non_empty = 0
    for b in ds.map_batches(to_vals, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        locs, ne = ray.get(geocoder.resolve.remote(b["value"].to_pylist()))
        locations.extend(locs)
        non_empty += ne
    if non_empty == 0:
        return False, []
    unclean = 1.0 - len(locations) / non_empty
    return unclean <= MAX_UNCLEAN_ADDRESSES, locations


def address_spatial_coverage(column: str, locations: list,
                             col_idx: int = 0) -> dict | None:
    """Spatial-coverage entry from resolved address points (reference
    core.py:754-775 'address' leg): geohash sketch + k-means envelope
    boxes over the (lat, lon) cloud."""
    from auctus_ray.functions.spatial import (
        GeohashSketch,
        spatial_ranges_kmeans,
    )

    if not locations:
        return None
    arr = np.asarray(locations, dtype=np.float64)
    lat, lon = arr[:, 0], arr[:, 1]
    sk = GeohashSketch()
    sk.add_points(lat, lon)
    boxes = spatial_ranges_kmeans(lat, lon)
    return {
        "type": "address",
        "column_names": [column],
        "column_indexes": [col_idx],
        "geohashes4": [
            {"hash": h, "number": n} for h, n in sk.get_hashes()
        ],
        "ranges": [
            {
                "range": {
                    "type": "envelope",
                    "coordinates": [[lo_lon, hi_lat], [hi_lon, lo_lat]],
                }
            }
            for lo_lat, hi_lat, lo_lon, hi_lon in boxes
        ],
        "number": len(locations),
    }
