"""Bench-artifact contracts: the latency bench, the IO bench, and the
driver rotation must stay mutually consistent — a rename or a new
registration that silently falls out of every artifact is the failure
mode these guard."""

from __future__ import annotations


def _registered():
    import __spark_entry__ as entry

    return set(entry.QUERIES), entry


def test_skip_set_names_are_registered():
    from bench import SKIP

    names, _ = _registered()
    assert SKIP <= names, f"SKIP references unregistered queries: {SKIP - names}"


def test_io_bench_covers_every_nonstreaming_skip():
    """Every skipped query is timed SOMEWHERE: streaming gates aside,
    the IO bench must cover exactly the latency bench's SKIP set."""
    from bench import SKIP
    from bench_io import IO_QUERIES

    streaming = {q for q in SKIP if q.endswith("_stream") or q == "streaming_ingest_e2e"}
    assert set(IO_QUERIES) == SKIP - streaming
    assert len(IO_QUERIES) == len(set(IO_QUERIES))  # no double-timing


def test_stream_bench_covers_every_streaming_skip():
    """The stream bench (bench_stream.py) must cover exactly the
    streaming portion of the SKIP set — with the IO-bench test above,
    every registered query is timed in exactly one artifact."""
    from bench import SKIP
    from bench_stream import STREAM_QUERIES

    streaming = {q for q in SKIP if q.endswith("_stream") or q == "streaming_ingest_e2e"}
    assert set(STREAM_QUERIES) == streaming
    assert len(STREAM_QUERIES) == len(set(STREAM_QUERIES))


def test_coverage_md_registered_count_matches_registry():
    """COVERAGE.md's rotation header states the registered-query count
    — keep the coverage source of truth numerically exact (VERDICT r6
    item 4: the header drifted to a stale count in r6)."""
    import os
    import re

    names, _ = _registered()
    path = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    text = open(path).read()
    m = re.search(r"(\d+) are registered", text)
    assert m, "COVERAGE.md rotation header must state the registered count"
    assert int(m.group(1)) == len(names), (
        f"COVERAGE.md says {m.group(1)} registered, registry has {len(names)}"
    )


def test_rotation_sample_covers_all_but_benched():
    """_ordered_names() enforces its own invariants (raises on drift);
    this pins the derived facts the round artifacts rely on: 50 sampled,
    every benched query registered, no overlap."""
    names, entry = _registered()
    ordered = entry._ordered_names()
    assert len(ordered) == len(names)
    sample = ordered[: entry._DRIVER_SAMPLE_ROWS]
    assert len(sample) == 50
    assert not (set(entry._VERIFY_FIRST) & set(entry._ROTATION_BENCHED))
    assert set(entry._ROTATION_BENCHED) == set(ordered) - set(sample)
