"""Augmentation sessions — the reference's TA3/frontend handoff
(apiserver/sessions.py:40-116 + augment.py:221-234) without the
Redis/HTTP shell.

Reference semantics kept:
  * a session is created with {format, format_options, system_name,
    data_token?}; unknown keys are rejected; the response carries the
    session_id (for the caller system) and a frontend link embedding
    the compact-JSON session object (sessions.py:66-95);
  * augment results ATTACH to the session (a Redis list keyed
    'session:<id>' in the reference, augment.py:221-234) instead of
    being returned to the caller; getting the session lists the
    attached results as {url, type} records (sessions.py:98-116).

Storage is a journal directory (atomic appends, one JSON file per
session) so sessions survive restarts — the Redis stand-in, same shape
as the catalog journal.
"""

from __future__ import annotations

import json
import os
import uuid
from urllib.parse import urlencode

VALID_FORMATS = {"csv", "d3m", "parquet"}


class SessionStore:
    def __init__(self, session_dir: str,
                 frontend_url: str = "https://frontend",
                 api_url: str = "https://api"):
        self.session_dir = session_dir
        self.frontend_url = frontend_url.rstrip("/")
        self.api_url = api_url.rstrip("/")
        os.makedirs(session_dir, exist_ok=True)

    def _path(self, session_id: str) -> str:
        if not session_id.replace("-", "").isalnum():
            raise ValueError("invalid session id")
        return os.path.join(self.session_dir, session_id + ".json")

    def _write(self, session: dict) -> None:
        p = self._path(session["session_id"])
        tmp = p + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(session, f, sort_keys=True)
        os.replace(tmp, p)

    def _read(self, session_id: str) -> dict:
        with open(self._path(session_id), encoding="utf-8") as f:
            return json.load(f)

    def new_session(self, spec: dict | None = None) -> dict:
        """Create a session; returns {session_id, link_url}
        (sessions.py:40-95). Unknown keys are rejected like the
        reference's 400."""
        spec = dict(spec or {})
        data_token = spec.pop("data_token", None)
        fmt = spec.pop("format", "csv")
        if fmt not in VALID_FORMATS:
            raise ValueError(f"invalid format {fmt!r}")
        format_options = spec.pop("format_options", {})
        system_name = spec.pop("system_name", "TA3")
        if spec:
            raise ValueError(f"unrecognized key {next(iter(spec))!r}")
        session = {
            "session_id": str(uuid.uuid4()),
            "format": fmt,
            "format_options": format_options,
            "system_name": system_name,
            "results": [],
        }
        if data_token:
            session["data_token"] = data_token
        self._write(session)
        link_obj = {
            k: v for k, v in session.items() if k != "results"
        }
        link_json = json.dumps(
            link_obj, sort_keys=True, indent=None, separators=(",", ":")
        )
        return {
            "session_id": session["session_id"],
            "link_url": (
                self.frontend_url + "/?" + urlencode({"session": link_json})
            ),
        }

    def attach_result(self, session_id: str, url: str,
                      result_type: str = "join") -> None:
        """Attach an augmentation result (augment.py:221-234: RPUSH to
        'session:<id>'). The read-modify-write is serialized with a
        per-session flock — the reference's RPUSH is atomic, and two
        concurrent augmentations must both land."""
        import fcntl

        lock_path = self._path(session_id) + ".lock"
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                s = self._read(session_id)
                s["results"].append({"url": url, "type": result_type})
                self._write(s)
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    def get_session(self, session_id: str) -> dict:
        """{results: [{url: <api_url + rel>, type}]} (sessions.py:98-116)."""
        s = self._read(session_id)
        return {
            "results": [
                {"url": self.api_url + r["url"], "type": r["type"]}
                for r in s["results"]
            ]
        }
