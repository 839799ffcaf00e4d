"""Incremental-ingest state: watermark + idempotency markers.

Mirrors the reference's control-plane semantics (SURVEY §2.8):

- ST1 watermark (extractor/main.go:433-473, 693-702): a single
  max-observed event-time persisted as JSON; streaming runs filter
  ``event_time > watermark`` and advance it; **backfills never advance
  it**; it never moves backwards.
- ST2 idempotency markers (extractor/main.go:494-557): per-(job
  fingerprint, page) done-markers enabling resume-with-skip. The
  fingerprint is the first 12 hex chars of SHA-1 over the job params
  (F20, main.go:501-513).

This is driver-side state (tiny JSON files) — in Structured Streaming
mode the checkpoint supersedes both; this store exists for the
batch-incremental mode the reference actually runs.
"""

from __future__ import annotations

import hashlib
import json
import os


def job_fingerprint(*parts: str) -> str:
    """F20 (extractor/main.go:501-513): 12-hex-char SHA-1 of the job
    parameters, '|'-joined."""
    return hashlib.sha1("|".join(parts).encode("utf-8")).hexdigest()[:12]


class WatermarkStore:
    def __init__(self, path: str):
        self.path = path

    def get(self) -> str | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f).get("watermark")

    def advance(self, candidate: str | None, mode: str = "streaming") -> str | None:
        """Advance to ``candidate`` iff this is a streaming run and the
        candidate is ahead (backfills never advance — main.go:695-699;
        watermarks never regress)."""
        if candidate is None or mode != "streaming":
            return self.get()
        current = self.get()
        if current is None or candidate > current:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "w") as f:
                json.dump({"watermark": candidate}, f)
            return candidate
        return current


class MarkerStore:
    """ST2 resume markers: one empty JSON per (fingerprint, page)."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def _path(self, fingerprint: str, page: int) -> str:
        return os.path.join(self.base_dir, fingerprint, f"page_{page}.done.json")

    def is_done(self, fingerprint: str, page: int) -> bool:
        return os.path.exists(self._path(fingerprint, page))

    def mark_done(self, fingerprint: str, page: int, meta: dict | None = None) -> None:
        p = self._path(fingerprint, page)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(meta or {}, f)
