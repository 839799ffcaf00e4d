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


def _match_where(row: dict, where: str) -> bool:
    """Evaluate the fixture's $where grammar: AND-joined, optionally
    parenthesized comparison clauses (`id > 19`, `name = 'rec3'`,
    `name != 'x'`) — the shapes the connector's option + pushdown emit."""
    import re

    for clause in re.split(r"\s+AND\s+", where):
        clause = clause.strip()
        while clause.startswith("(") and clause.endswith(")"):
            clause = clause[1:-1].strip()
        m = re.match(r"^(\w+)\s+IS\s+(NOT\s+)?NULL$", clause, re.IGNORECASE)
        if m:  # fixture rows are dense: IS NOT NULL true, IS NULL false
            if not m.group(2):
                return False
            continue
        m = re.match(r"^(\w+)\s*(>=|<=|!=|=|>|<)\s*(.+)$", clause)
        if not m:
            raise ValueError(f"mock SODA can't parse clause: {clause!r}")
        colname, op, lit = m.group(1), m.group(2), m.group(3).strip()
        if lit.startswith("'"):
            val, cell = lit[1:-1].replace("''", "'"), str(row[colname])
        else:
            val, cell = float(lit), float(row[colname])
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


class _MockSoda(http.server.BaseHTTPRequestHandler):
    """Minimal SODA endpoint: $select=count(*), $where (AND-joined
    comparisons), $order (by int id), $limit/$offset paging, scripted
    failures, and a scriptable count (to test the tail partition's
    page-until-short against a stale COUNT probe)."""

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
                        retry_after = state.get("retry_after", "0")
                        self.send_header("Retry-After", retry_after)
                    self.end_headers()
                    return
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        rows = state.get("rows") or _dataset()
        where = q.get("$where", [None])[0]
        if where:
            rows = [r for r in rows if _match_where(r, where)]
        select = q.get("$select", [None])[0]
        if select and select.startswith("count("):
            n = state.get("count_override")
            body = [{"n": str(len(rows) if n is None else n)}]
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
        soda_types = state.get("soda_types")
        if soda_types:  # SODA 2.1 native-type metadata headers
            self.send_header("X-SODA2-Fields", json.dumps(list(soda_types)))
            self.send_header("X-SODA2-Types", json.dumps(list(soda_types.values())))
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
    count_hits = [h for h in srv.state["hits"] if "count%28%2A%29" in h]
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


def test_tail_partition_pages_until_short_past_stale_count(spark, soda_server):
    """Rows appended between the COUNT probe and the page fetches must
    still arrive: the probe is scripted to report only 10 of the 25
    rows, so a frozen plan would read 10 — the tail partition pages
    until a short page and reads all 25 (reference reads-to-end,
    extractor/main.go:716-779)."""
    srv, endpoint = soda_server
    srv.state["count_override"] = 10
    df = _read(spark, endpoint, page_size=5)
    assert df.rdd.getNumPartitions() == 2  # planned from the stale count
    assert sorted(r.id for r in df.collect()) == list(range(N_ROWS))


def test_empty_count_probe_still_reads_appended_rows(spark, soda_server):
    srv, endpoint = soda_server
    srv.state["count_override"] = 0
    df = _read(spark, endpoint, page_size=50)
    assert len(df.collect()) == N_ROWS  # the single tail page found them


def test_filter_pushdown_compiles_to_where(spark, soda_server):
    """A DataFrame .filter() over declared columns must reach the mock
    server as $where (VERDICT r7 item 4): the COUNT probe sees it (one
    page planned instead of three) and the page request carries it."""
    srv, endpoint = soda_server
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = _read(spark, endpoint, page_size=10, filter_pushdown="true").filter(
            "id > 19 AND name != 'rec21'"
        )
        assert sorted(r.id for r in df.collect()) == [20, 22, 23, 24]
        assert df.rdd.getNumPartitions() == 1  # probe saw the pushed filter
        where_hits = [
            urllib.parse.unquote_plus(h) for h in srv.state["hits"] if "%24where" in h
        ]
        assert where_hits and all("(id > 19)" in h for h in where_hits)
        assert any("(name != 'rec21')" in h for h in where_hits)
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_filter_pushdown_unsupported_predicate_stays_in_spark(spark, soda_server):
    """A predicate SoQL can't express (id % 2 = 0) is returned to Spark
    and evaluated post-scan — results unchanged, server never sees it."""
    srv, endpoint = soda_server
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = _read(spark, endpoint, page_size=50, filter_pushdown="true").filter(
            "id > 19 AND id % 2 = 0"
        )
        assert sorted(r.id for r in df.collect()) == [20, 22, 24]
        where_hits = [
            urllib.parse.unquote_plus(h) for h in srv.state["hits"] if "%24where" in h
        ]
        assert where_hits and all("%" not in h.split("$where=")[1] for h in where_hits)
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_pushdown_combines_with_where_option(spark, soda_server):
    srv, endpoint = soda_server
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = _read(
            spark, endpoint, page_size=50, filter_pushdown="true", where="id > 10"
        ).filter("id < 14")
        assert sorted(r.id for r in df.collect()) == [11, 12, 13]
        where_hits = [
            urllib.parse.unquote_plus(h) for h in srv.state["hits"] if "%24where" in h
        ]
        # option clause leads; pushed clauses AND-append after it
        # (Spark interleaves an IS NOT NULL guard between them)
        assert where_hits and all(
            "$where=(id > 10) AND " in h and "(id < 14)" in h for h in where_hits
        )
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_total_rows_snapshot_bounds_the_scan(spark, soda_server):
    """total_rows is documented as a fixed-size snapshot plan (ADVICE
    r8): tail paging must be disabled and the last page's $limit
    clamped, so exactly total_rows rows are read even though the
    server holds more."""
    srv, endpoint = soda_server
    df = _read(spark, endpoint, page_size=4, total_rows=10)
    assert df.rdd.getNumPartitions() == 3  # ceil(10/4) fixed pages, no tail
    assert sorted(r.id for r in df.collect()) == list(range(10))
    page_hits = [
        urllib.parse.unquote_plus(h) for h in srv.state["hits"] if "$offset" in urllib.parse.unquote(h)
    ]
    assert len(page_hits) == 3  # no page-until-short tail requests
    assert any("$limit=2" in h and "$offset=8" in h for h in page_hits)


def test_total_rows_zero_reads_nothing(spark, soda_server):
    srv, endpoint = soda_server
    df = _read(spark, endpoint, page_size=5, total_rows=0)
    assert df.collect() == []
    # neither a COUNT probe nor any page request was needed
    assert srv.state["hits"] == []


def test_pushdown_yields_every_filter_back_to_spark():
    """Pushdown must be a pure optimization (ADVICE r8): supported
    predicates compile into $where for server-side pruning, but ALL
    filters — supported or not — return to Spark for re-evaluation on
    the coerced values."""
    from pyspark.sql.datasource import EqualTo, GreaterThan
    from pyspark.sql.types import StructType

    from chicago_crash_data_pipeline_dashboard_spark.sources.socrata_source import (
        _PushdownPageReader,
    )

    schema = StructType.fromDDL(SCHEMA)
    reader = _PushdownPageReader(
        schema, {"endpoint": "http://127.0.0.1:9/x.json", "order": "id"}
    )
    pushable = GreaterThan(("id",), 19)
    unsupported = EqualTo(("zz",), 1)  # undeclared column
    returned = list(reader.pushFilters([pushable, unsupported]))
    assert returned == [pushable, unsupported]
    assert reader.pushed_where == ["(id > 19)"]


def test_startswith_wildcard_prefix_not_pushed():
    """A LIKE wildcard inside the startswith prefix would match a
    superset server-side (ADVICE r8) — the filter must stay in Spark."""
    from pyspark.sql.datasource import StringStartsWith

    from chicago_crash_data_pipeline_dashboard_spark.sources.socrata_source import (
        _filter_to_soql,
    )

    cols = {"a"}
    assert _filter_to_soql(StringStartsWith(("a",), "100%"), cols) is None
    assert _filter_to_soql(StringStartsWith(("a",), "a_b"), cols) is None
    assert _filter_to_soql(StringStartsWith(("a",), "plain"), cols) == "(a like 'plain%')"


def test_nonfinite_float_literal_not_pushed():
    """repr(nan/inf) is invalid SoQL → non-retryable 400 (ADVICE r8);
    the literal must render as None so the predicate stays in Spark."""
    from pyspark.sql.datasource import GreaterThan

    from chicago_crash_data_pipeline_dashboard_spark.sources.socrata_source import (
        _filter_to_soql,
        _soql_literal,
    )

    assert _soql_literal(float("nan")) is None
    assert _soql_literal(float("inf")) is None
    assert _soql_literal(float("-inf")) is None
    assert _soql_literal(1.5) == "1.5"
    assert _filter_to_soql(GreaterThan(("a",), float("nan")), {"a"}) is None


def test_soql_filter_rendering():
    import datetime as dt

    from chicago_crash_data_pipeline_dashboard_spark.sources.socrata_source import (
        _filter_to_soql,
    )
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNull,
        Not,
        StringStartsWith,
    )

    cols = {"a", "b"}
    assert _filter_to_soql(EqualTo(("a",), "o'brien"), cols) == "(a = 'o''brien')"
    assert _filter_to_soql(GreaterThan(("b",), 1.5), cols) == "(b > 1.5)"
    assert _filter_to_soql(In(("a",), (1, 2)), cols) == "(a IN (1, 2))"
    assert _filter_to_soql(IsNull(("a",)), cols) == "(a IS NULL)"
    assert _filter_to_soql(Not(EqualTo(("a",), 3)), cols) == "(a != 3)"
    assert _filter_to_soql(StringStartsWith(("a",), "rec"), cols) == "(a like 'rec%')"
    assert (
        _filter_to_soql(EqualTo(("a",), dt.date(2024, 1, 2)), cols) == "(a = '2024-01-02')"
    )
    # not pushable: undeclared column, nested path, opaque value
    assert _filter_to_soql(EqualTo(("zz",), 1), cols) is None
    assert _filter_to_soql(EqualTo(("a", "b"), 1), cols) is None
    assert _filter_to_soql(EqualTo(("a",), bytearray(b"x")), cols) is None


def test_negative_retry_after_clamped_to_zero(soda_server):
    """A negative Retry-After header must clamp to 0, not raise inside
    time.sleep (ADVICE r7): the retry still succeeds."""
    srv, endpoint = soda_server
    srv.state["fail_next"] = (429, 1)
    srv.state["retry_after"] = "-5"
    slept = []
    rows = _http_get_json(
        endpoint + "?%24select=count(%2A)+AS+n",
        {},
        timeout_s=5,
        max_retries=2,
        backoff_s=0.01,
        sleep=slept.append,
    )
    assert rows == [{"n": str(N_ROWS)}]
    assert slept == [0.0]


def test_coerce_permissive_nulls():
    from pyspark.sql.types import IntegerType, TimestampType

    assert _coerce("12", IntegerType()) == 12
    assert _coerce("not-a-number", IntegerType()) is None
    assert _coerce("2024-02-30T00:00:00", TimestampType()) is None  # bad date
    assert _coerce(None, IntegerType()) is None


def _where_hits(srv):
    return [
        urllib.parse.unquote_plus(h) for h in srv.state["hits"] if "%24where" in h
    ]


def test_pushdown_typecheck_disables_mismatched_column(spark, soda_server):
    """r10 VERDICT item 7: with pushdown_typecheck on, a filter over a
    column whose declared type disagrees with the server's native SODA
    type must NOT push (a server-evaluated $where over the mismatched
    column can drop rows the coerced predicate would keep) — while
    filters over agreeing columns still push. Results are identical
    either way because Spark re-evaluates everything post-scan."""
    srv, endpoint = soda_server
    # server: id is native number (agrees with declared long), score is
    # native TEXT (disagrees with declared double)
    srv.state["soda_types"] = {
        "id": "number",
        "name": "text",
        "score": "text",
        "ts": "floating_timestamp",
    }
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = _read(
            spark, endpoint, page_size=50, filter_pushdown="true",
            pushdown_typecheck="true",
        ).filter("id > 19 AND score >= 0.0")
        got = sorted(r.id for r in df.collect())
        assert got == [20, 21, 22, 23, 24]
        hits = _where_hits(srv)
        assert hits and all("(id > 19)" in h for h in hits)  # agreeing: pushed
        assert all("score" not in h for h in hits)  # mismatched: kept Spark-side
        # the $limit=0 typecheck probe ran exactly once per plan phase
        assert any("$limit=0" in urllib.parse.unquote_plus(h) for h in srv.state["hits"])
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        srv.state["soda_types"] = None


def test_pushdown_typecheck_without_headers_pushes_nothing(spark, soda_server):
    """A server that doesn't publish X-SODA2-Types gives the typecheck
    nothing to verify against — the conservative outcome is NO pushes
    (correctness preserved; only transfer bytes lost)."""
    srv, endpoint = soda_server
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = _read(
            spark, endpoint, page_size=50, filter_pushdown="true",
            pushdown_typecheck="true",
        ).filter("id > 19")
        assert sorted(r.id for r in df.collect()) == [20, 21, 22, 23, 24]
        assert all("id > 19" not in h for h in _where_hits(srv))
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_pushdown_columns_allowlist_restricts_pushes(spark, soda_server):
    """option("pushdown_columns", ...) is the explicit caller contract:
    only the listed columns may compile into $where."""
    srv, endpoint = soda_server
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = _read(
            spark, endpoint, page_size=50, filter_pushdown="true",
            pushdown_columns="id",
        ).filter("id > 19 AND name != 'rec21'")
        assert sorted(r.id for r in df.collect()) == [20, 22, 23, 24]
        hits = _where_hits(srv)
        assert hits and all("(id > 19)" in h for h in hits)
        assert all("name" not in h for h in hits)
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_soda_type_compatibility_matrix():
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        DoubleType,
        LongType,
        StringType,
        TimestampType,
    )

    from chicago_crash_data_pipeline_dashboard_spark.sources.socrata_source import (
        _soda_type_compatible,
    )

    assert _soda_type_compatible(StringType(), "text")
    assert not _soda_type_compatible(StringType(), "number")
    assert _soda_type_compatible(LongType(), "number")
    assert _soda_type_compatible(DoubleType(), "Money")  # case-insensitive
    assert not _soda_type_compatible(LongType(), "text")
    assert _soda_type_compatible(BooleanType(), "checkbox")
    assert _soda_type_compatible(TimestampType(), "floating_timestamp")
    assert not _soda_type_compatible(TimestampType(), "calendar_date")
    assert _soda_type_compatible(DateType(), "calendar_date")
    assert not _soda_type_compatible(DateType(), "text")
