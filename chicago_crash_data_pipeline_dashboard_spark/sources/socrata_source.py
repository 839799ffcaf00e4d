"""Socrata-style paged HTTP scan as a Spark Python DataSource.

Reference parity: the reference's extractor pages a Socrata SODA
endpoint with ``$limit``/``$offset`` until a short page arrives
(extractor/main.go:716-779) and wraps every request in bounded
exponential-backoff retries (extractor/main.go:291-336). This module
re-expresses BOTH Spark-first:

- **pagination becomes the partition plan** — one bounded COUNT probe
  (``$select=count(1)``, same ``$where``) at planning time sizes the
  result, and each page becomes an ``InputPartition``; on a
  1000-executor cluster the pages fetch CONCURRENTLY instead of the
  reference's serial driver loop, and a failed page retries as a task
  (plus the in-task backoff below) without refetching the others;
- **retry/backoff lives in the partition reader** — each HTTP GET
  retries on 429/5xx/connection errors with exponential backoff,
  honoring ``Retry-After`` when the server sends one, so transient
  throttling never fails the scan.

Deterministic paging requires a total ``$order`` (the same invariant
the reference's ensureSelect enforces for ``$select``): without one,
SODA page boundaries can shift between requests and rows duplicate or
vanish — so ``order`` is a REQUIRED option here, not a default.

Usage::

    spark.dataSource.register(SocrataDataSource)
    df = (spark.read.format("socrata")
          .option("endpoint", "https://host/resource/xxxx.json")
          .option("schema", "crash_record_id string, crash_date timestamp, injuries_total int")
          .option("order", "crash_record_id")
          .option("where", "crash_date > '2023-01-01'")
          .option("page_size", 50000)
          .load())

The scan is schema-on-read against SODA's JSON (everything may arrive
as strings); values coerce to the declared column types, with
unparseable cells -> NULL (PERMISSIVE, matching the bronze reader's
posture). ``app_token`` forwards as ``X-App-Token``.

At 100 TB scale the fan-out is bounded by ``page_size`` x partition
count; the COUNT probe is one tiny request, and no page is ever held
whole in driver memory — partitions stream rows via the Arrow batch
channel like any other source.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)

RETRYABLE_STATUS = {429, 500, 502, 503, 504}


def _http_get_json(
    url: str,
    headers: dict[str, str],
    timeout_s: float,
    max_retries: int,
    backoff_s: float,
    sleep=time.sleep,
):
    """GET ``url`` -> parsed JSON, with bounded exponential backoff on
    retryable failures (the reference's retry loop, minus the global
    mutable state). ``sleep`` is injectable for tests."""
    attempt = 0
    while True:
        try:
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return json.load(resp)
        except urllib.error.HTTPError as exc:
            retryable = exc.code in RETRYABLE_STATUS
            if not retryable or attempt >= max_retries:
                raise
            retry_after = exc.headers.get("Retry-After") if exc.headers else None
            if retry_after is not None:
                try:
                    delay = min(float(retry_after), 30.0)
                except ValueError:
                    delay = backoff_s * (2**attempt)
            else:
                delay = backoff_s * (2**attempt)
        except (urllib.error.URLError, TimeoutError, ConnectionError):
            if attempt >= max_retries:
                raise
            delay = backoff_s * (2**attempt)
        sleep(delay)
        attempt += 1


def _coerce(value, dtype):
    """SODA JSON cell -> declared Spark type; unparseable -> NULL
    (PERMISSIVE posture, like the bronze JSON reader)."""
    if value is None:
        return None
    try:
        if isinstance(dtype, (IntegerType, LongType)):
            return int(float(value)) if not isinstance(value, bool) else None
        if isinstance(dtype, (DoubleType, FloatType)):
            return float(value)
        if isinstance(dtype, BooleanType):
            if isinstance(value, bool):
                return value
            return str(value).strip().lower() in ("true", "t", "1", "yes", "y")
        if isinstance(dtype, TimestampType):
            import datetime as dt

            s = str(value).replace("T", " ").rstrip("Z")
            for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
                try:
                    return dt.datetime.strptime(s, fmt)
                except ValueError:
                    continue
            return None
        if isinstance(dtype, DateType):
            import datetime as dt

            return dt.datetime.strptime(str(value)[:10], "%Y-%m-%d").date()
        if isinstance(dtype, StringType):
            return value if isinstance(value, str) else json.dumps(value)
        return value
    except (ValueError, TypeError):
        return None


class _PageReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.endpoint = options.get("endpoint")
        if not self.endpoint:
            raise ValueError("socrata source requires an 'endpoint' option")
        self.order = options.get("order")
        if not self.order:
            raise ValueError(
                "socrata source requires an 'order' option: SODA paging is "
                "only deterministic under a total $order (reference "
                "ensureSelect invariant)"
            )
        self.select = options.get("select")  # None -> all declared columns
        self.where = options.get("where")
        self.page_size = int(options.get("page_size", 1000))
        if self.page_size <= 0:
            raise ValueError(f"page_size must be positive, got {self.page_size}")
        self.max_retries = int(options.get("max_retries", 3))
        self.backoff_s = float(options.get("backoff_s", 0.5))
        self.timeout_s = float(options.get("timeout_s", 30))
        self.total_rows = options.get("total_rows")  # optional probe override
        token = options.get("app_token")
        self.headers = {"Accept": "application/json"}
        if token:
            self.headers["X-App-Token"] = token

    # -- URL building ----------------------------------------------------
    def _url(self, params: dict[str, str]) -> str:
        return f"{self.endpoint}?{urllib.parse.urlencode(params)}"

    def _base_params(self) -> dict[str, str]:
        p: dict[str, str] = {}
        if self.select:
            p["$select"] = self.select
        if self.where:
            p["$where"] = self.where
        return p

    # -- planning: COUNT probe -> page partitions ------------------------
    def _count(self) -> int:
        if self.total_rows is not None:
            return int(self.total_rows)
        params = {"$select": "count(1) AS n"}
        if self.where:  # the probe must see the same filter as the scan
            params["$where"] = self.where
        rows = _http_get_json(
            self._url(params),
            self.headers,
            self.timeout_s,
            self.max_retries,
            self.backoff_s,
        )
        if not rows:
            return 0
        return int(next(iter(rows[0].values())))

    def partitions(self):
        total = self._count()
        offsets = range(0, max(total, 1), self.page_size) if total else []
        return [InputPartition((off, self.page_size)) for off in offsets] or [
            InputPartition((0, self.page_size))  # empty probe: one confirming page
        ]

    # -- execution: one page per partition, retried ----------------------
    def read(self, partition):
        offset, limit = partition.value
        params = self._base_params()
        params["$order"] = self.order
        params["$limit"] = str(limit)
        params["$offset"] = str(offset)
        rows = _http_get_json(
            self._url(params),
            self.headers,
            self.timeout_s,
            self.max_retries,
            self.backoff_s,
        )
        fields = [(f.name, f.dataType) for f in self.schema.fields]
        for row in rows:
            yield tuple(_coerce(row.get(name), dtype) for name, dtype in fields)


class SocrataDataSource(DataSource):
    """``spark.read.format("socrata")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "socrata"

    def schema(self):
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError(
                "socrata source requires a 'schema' option (DDL string): "
                "SODA JSON is schemaless, the declared schema drives "
                "coercion — same posture as the bronze reader's explicit "
                "schema"
            )
        return ddl

    def reader(self, schema: StructType) -> DataSourceReader:
        return _PageReader(schema, self.options)
