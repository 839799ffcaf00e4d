"""In-process loopback SODA server — fixture for gating the Socrata
DataSource against real HTTP.

The driver's correctness gate (and tests) need a SODA endpoint whose
content is DERIVED FROM the sf parquet tables so the scan result can be
oracle-checked with plain SQL over the same tables. This module serves
a list of row-dicts over HTTP with the SODA request surface the
connector uses:

- ``$select=count(*) AS n`` (the partition-planning COUNT probe);
- ``$where`` as AND-joined, optionally parenthesized comparison
  clauses (the grammar the connector's ``where`` option + filter
  pushdown emit);
- ``$order`` / ``$limit`` / ``$offset`` paging;
- SODA's stringly JSON: every cell serializes as a string, so the
  connector's schema-driven coercion is exercised end-to-end;
- scripted transient failures (``fail_first`` requests get a 429 with
  ``Retry-After``) to exercise the retry/backoff path in-gate.

This is fixture machinery (like ``operators/multimodal.make_bmp``),
not a production server; the reference's real counterpart is the
Socrata service itself (extractor/main.go:716-779 pages it the same
way this fixture expects to be paged).
"""

from __future__ import annotations

import http.server
import json
import re
import threading
import urllib.parse


def _match_where(row: dict, where: str) -> bool:
    """AND-joined comparison clauses; numeric compare when the literal
    is unquoted, string compare when quoted. IS [NOT] NULL supported
    (Spark's pushdown adds null guards)."""
    for clause in re.split(r"\s+AND\s+", where):
        clause = clause.strip()
        while clause.startswith("(") and clause.endswith(")"):
            clause = clause[1:-1].strip()
        m = re.match(r"^(\w+)\s+IS\s+(NOT\s+)?NULL$", clause, re.IGNORECASE)
        if m:
            is_null = row.get(m.group(1)) is None
            if is_null != (not m.group(2)):
                return False
            continue
        m = re.match(r"^(\w+)\s*(>=|<=|!=|=|>|<)\s*(.+)$", clause)
        if not m:
            raise ValueError(f"loopback SODA can't parse clause: {clause!r}")
        col, op, lit = m.group(1), m.group(2), m.group(3).strip()
        cell = row.get(col)
        if cell is None:
            return False  # SQL comparison with NULL is never true
        if lit.startswith("'"):
            val: object = lit[1:-1].replace("''", "'")
            cell = str(cell)
        else:
            val = float(lit)
            cell = float(cell)
        ok = {
            ">": cell > val,
            ">=": cell >= val,
            "<": cell < val,
            "<=": cell <= val,
            "=": cell == val,
            "!=": cell != val,
        }[op]
        if not ok:
            return False
    return True


class _Handler(http.server.BaseHTTPRequestHandler):
    server_version = "LoopbackSoda/1.0"

    def log_message(self, *args):  # silent fixture
        pass

    def do_GET(self):
        state = self.server.soda_state
        with state["lock"]:
            state["hits"].append(self.path)
            if state["fail_left"] > 0:
                state["fail_left"] -= 1
                self.send_response(state["fail_status"])
                self.send_header("Retry-After", "0")
                self.end_headers()
                return
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        rows = state["rows"]
        where = q.get("$where", [None])[0]
        if where:
            rows = [r for r in rows if _match_where(r, where)]
        select = q.get("$select", [None])[0]
        if select and select.startswith("count("):
            body = [{"n": str(len(rows))}]
        else:
            order = q.get("$order", [None])[0]
            if order:
                key = order.split()[0]
                rows = sorted(rows, key=lambda r: (r[key] is None, r[key]))
            off = int(q.get("$offset", ["0"])[0])
            lim = int(q.get("$limit", [str(len(rows))])[0])
            rows = rows[off : off + lim]
            if select:
                cols = [c.strip() for c in select.split(",")]
                rows = [{c: r.get(c) for c in cols} for r in rows]
            # SODA serializes scalars as strings — exercise coercion
            body = [
                {k: (None if v is None else str(v)) for k, v in r.items()}
                for r in rows
            ]
        payload = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


class LoopbackSoda:
    """Context manager: ``with LoopbackSoda(rows) as endpoint: ...``.

    ``rows`` are plain dicts with native Python values (ints/floats/
    strs/None); serialization to SODA's stringly JSON happens at
    response time so ``$where``/``$order`` evaluate on typed values.
    """

    def __init__(self, rows: list[dict], fail_first: int = 0, fail_status: int = 429):
        self._rows = rows
        self._fail_first = fail_first
        self._fail_status = fail_status
        self._srv: http.server.ThreadingHTTPServer | None = None

    @property
    def hits(self) -> list[str]:
        assert self._srv is not None
        return list(self._srv.soda_state["hits"])

    def __enter__(self) -> str:
        self._srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._srv.soda_state = {
            "lock": threading.Lock(),
            "hits": [],
            "rows": self._rows,
            "fail_left": self._fail_first,
            "fail_status": self._fail_status,
        }
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        host, port = self._srv.server_address[:2]
        return f"http://{host}:{port}/resource/loopback.json"

    def __exit__(self, *exc):
        if self._srv is not None:
            self._srv.shutdown()
            self._srv.server_close()
        return False
