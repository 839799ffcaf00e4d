"""Socrata paged-scan DataSource (sources/socrata_source.py) against an
in-process mock SODA server: page-partition planning, $select/$where
propagation, retry/backoff on 429/503, type coercion, and the
determinism guard. Reference parity: extractor/main.go:716-779 (paged
scan) and 291-336 (retry/backoff), re-expressed as partition-parallel
reads."""

from __future__ import annotations

import http.server
import json
import threading
import urllib.parse

import pytest

from chicago_crash_data_pipeline_dashboard_spark.sources.socrata_source import (
    SocrataDataSource,
    _coerce,
    _http_get_json,
)

N_ROWS = 25


def _dataset():
    return [
        {
            "id": str(i),  # SODA returns numbers as strings
            "name": f"rec{i}",
            "score": f"{i}.5",
            "ts": f"2024-01-{(i % 28) + 1:02d}T12:00:0{i % 10}",
        }
        for i in range(N_ROWS)
    ]


class _MockSoda(http.server.BaseHTTPRequestHandler):
    """Minimal SODA endpoint: $select=count(1), $where ('id > N' only),
    $order (by int id), $limit/$offset paging, and scripted failures."""

    server_version = "MockSoda/1.0"

    def log_message(self, *args):  # keep pytest output clean
        pass

    def do_GET(self):
        state = self.server.state
        with state["lock"]:
            state["hits"].append(self.path)
            fail = state["fail_next"]
            if fail:
                status, n_left = fail
                if n_left > 0:
                    state["fail_next"] = (status, n_left - 1)
                    self.send_response(status)
                    if status == 429:
                        self.send_header("Retry-After", "0")
                    self.end_headers()
                    return
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        rows = _dataset()
        where = q.get("$where", [None])[0]
        if where:  # fixture grammar: 'id > N'
            bound = int(where.split(">")[1])
            rows = [r for r in rows if int(r["id"]) > bound]
        select = q.get("$select", [None])[0]
        if select and select.startswith("count(1)"):
            body = [{"n": str(len(rows))}]
        else:
            if q.get("$order"):
                rows = sorted(rows, key=lambda r: int(r["id"]))
            off = int(q.get("$offset", ["0"])[0])
            lim = int(q.get("$limit", [str(len(rows))])[0])
            rows = rows[off : off + lim]
            if select:
                cols = [c.strip() for c in select.split(",")]
                rows = [{c: r[c] for c in cols} for r in rows]
            body = rows
        payload = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def soda_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _MockSoda)
    srv.state = {"lock": threading.Lock(), "hits": [], "fail_next": None}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, f"http://127.0.0.1:{srv.server_address[1]}/resource/mock.json"
    finally:
        srv.shutdown()


SCHEMA = "id long, name string, score double, ts timestamp"


def _read(spark, endpoint, **opts):
    spark.dataSource.register(SocrataDataSource)
    r = (
        spark.read.format("socrata")
        .option("endpoint", endpoint)
        .option("schema", SCHEMA)
        .option("order", "id")
        .option("backoff_s", 0.01)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_paged_scan_reads_all_rows_across_partitions(spark, soda_server):
    srv, endpoint = soda_server
    df = _read(spark, endpoint, page_size=7)
    rows = df.collect()
    assert len(rows) == N_ROWS
    got = {r.id: (r.name, r.score) for r in rows}
    assert got[3] == ("rec3", 3.5)
    assert rows[0].ts is not None  # timestamp coercion happened
    # planning probed the count once, then one request per page
    paged = [h for h in srv.state["hits"] if "%24offset" in h or "$offset" in urllib.parse.unquote(h)]
    assert len(paged) == -(-N_ROWS // 7)  # ceil(25/7) = 4 page fetches
    # the scan is partition-parallel: one InputPartition per page
    assert df.rdd.getNumPartitions() == 4


def test_where_pushes_to_server_and_count_probe(spark, soda_server):
    srv, endpoint = soda_server
    df = _read(spark, endpoint, page_size=10, where="id > 19")
    assert sorted(r.id for r in df.collect()) == [20, 21, 22, 23, 24]
    # the COUNT probe carried the same $where — only ONE page planned
    assert df.rdd.getNumPartitions() == 1
    count_hits = [h for h in srv.state["hits"] if "count%281%29" in h]
    assert count_hits and all("id+%3E+19" in h or "id%20%3E%2019" in h for h in count_hits)


def test_select_projection_propagates(spark, soda_server):
    srv, endpoint = soda_server
    df = _read(spark, endpoint, select="id, name")
    rows = df.collect()
    assert len(rows) == N_ROWS
    assert rows[0].score is None  # column absent from server reply -> NULL
    page_hits = [h for h in srv.state["hits"] if "%24offset" in h]
    assert all("%24select=id%2C+name" in h for h in page_hits)


def test_retry_backoff_survives_transient_failures(spark, soda_server):
    srv, endpoint = soda_server
    srv.state["fail_next"] = (503, 2)  # first two requests fail
    df = _read(spark, endpoint, page_size=25)
    assert len(df.collect()) == N_ROWS
    assert len(srv.state["hits"]) >= 4  # 2 failures + probe + page


def test_retry_gives_up_after_max_retries():
    import urllib.error

    calls = []

    def sleep(s):
        calls.append(s)

    with pytest.raises((urllib.error.URLError, ConnectionError, OSError)):
        _http_get_json(
            "http://127.0.0.1:9/nothing",  # discard port: refuses instantly
            {},
            timeout_s=0.2,
            max_retries=2,
            backoff_s=0.01,
            sleep=sleep,
        )
    assert calls == [0.01, 0.02]  # exponential, then give up


def test_missing_order_or_schema_rejected(spark, soda_server):
    _, endpoint = soda_server
    spark.dataSource.register(SocrataDataSource)
    with pytest.raises(Exception, match="order"):
        (
            spark.read.format("socrata")
            .option("endpoint", endpoint)
            .option("schema", SCHEMA)
            .load()
            .collect()
        )
    with pytest.raises(Exception, match="schema"):
        spark.read.format("socrata").option("endpoint", endpoint).load().collect()


def test_coerce_permissive_nulls():
    from pyspark.sql.types import IntegerType, TimestampType

    assert _coerce("12", IntegerType()) == 12
    assert _coerce("not-a-number", IntegerType()) is None
    assert _coerce("2024-02-30T00:00:00", TimestampType()) is None  # bad date
    assert _coerce(None, IntegerType()) is None
