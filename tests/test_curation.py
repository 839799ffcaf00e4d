"""Semantic tests for the corpus-curation operators (per-source caps,
boilerplate line stripping) on small planted fixtures — driver gates
are queued for the next rotation (COVERAGE.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.operators import curation as CU


def test_cap_per_key_deterministic_priority(spark):
    rows = [(i, "a" if i < 7 else "b", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality"])
    kept = CU.cap_per_key(
        df, "source", 3, order_by=[F.desc("quality"), F.asc("doc_id")]
    )
    got = {r.source: sorted(x.doc_id for x in kept.filter(F.col("source") == r.source).collect())
           for r in kept.select("source").distinct().collect()}
    assert got == {"a": [4, 5, 6], "b": [7, 8, 9]}  # top-3 quality per source
    assert kept.count() == 6


def test_cap_per_key_rejects_nonpositive_k(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    import pytest

    with pytest.raises(ValueError, match="positive"):
        CU.cap_per_key(df, "source", 0, order_by=[F.asc("doc_id")])
    with pytest.raises(ValueError, match="order_by"):
        CU.cap_per_key(df, "source", 1, order_by=[])


def test_boilerplate_lines_frequency_and_min_docs(spark):
    header = "SITE NAVIGATION MENU"
    rows = (
        [(i, f"{header}\nreal content {i}\n\nfooter junk", "big") for i in range(4)]
        + [(10, f"{header}\nunique", "small"), (11, "other text", "small")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    boiler = {(r._grp, r._line) for r in CU.boilerplate_lines(df, "text", "source").collect()}
    # 'big' source (4 docs): header + footer in 100% of docs -> boilerplate
    assert ("big", header) in boiler and ("big", "footer junk") in boiler
    # per-doc content lines never qualify; 'small' fails min_docs=3
    assert not any(g == "small" for g, _ in boiler)
    assert not any(l.startswith("real content") for _, l in boiler)


def test_strip_boilerplate_preserves_order_blanks_and_other_groups(spark):
    header = "SITE NAVIGATION MENU"
    rows = (
        [(i, f"{header}\nreal content {i}\n\nfooter junk", "big") for i in range(4)]
        + [(10, f"{header}\nkept because small group", "small")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.doc_id: r.text for r in CU.strip_boilerplate_lines(df, "doc_id", "text", "source").collect()}
    # header/footer removed, content + blank line kept, order preserved
    assert out[0] == "real content 0\n"
    assert out[3] == "real content 3\n"
    # the same header in the under-min_docs group survives
    assert out[10] == f"{header}\nkept because small group"
    # schema/columns pass through
    cols = CU.strip_boilerplate_lines(df, "doc_id", "text", "source").columns
    assert cols == ["doc_id", "text", "source"]


def test_strip_boilerplate_all_lines_removed_yields_empty_text(spark):
    rows = [(i, "only boilerplate", "s") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.doc_id: r.text for r in CU.strip_boilerplate_lines(df, "doc_id", "text", "source").collect()}
    assert set(out.values()) == {""}


def test_strip_boilerplate_plan_broadcasts_and_stays_jvm_side(spark):
    rows = [(i, "h\ncontent", "s") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    plan = CU.strip_boilerplate_lines(df, "doc_id", "text", "source")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # the boilerplate set never shuffles the lines


def test_curation_chain_on_testdata(spark, sf_smoke):
    """Integration: cap → boilerplate-strip → semantic dedup compose on
    the real documents/embeddings tables with their real schemas."""
    from chicago_crash_data_pipeline_dashboard_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    capped = CU.cap_per_key(
        docs, "source", 5, order_by=[F.desc("n_chars"), F.asc("doc_id")]
    )
    per_src = capped.groupBy("source").count().collect()
    assert per_src and all(r["count"] <= 5 for r in per_src)
    stripped = CU.strip_boilerplate_lines(capped, "doc_id", "text", "source")
    assert stripped.count() == capped.count()  # row-preserving rewrite
    assert stripped.columns == docs.columns

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    kept = DD.semantic_dedup(emb, "vec_id", "embedding", n_clusters=4, threshold=0.999)
    n, k = emb.count(), kept.count()
    assert 0 < k <= n
    assert kept.columns == emb.columns


def test_cap_per_key_salted_matches_single_phase(spark):
    """The two-phase (skew-safe) cap must produce EXACTLY the single-
    phase survivors — per-salt top-k union is a superset of the global
    top-k, and stage 2 is the same exact window."""
    rows = [(i, "hot" if i % 5 else "cold", float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality"])
    order = [F.desc("quality"), F.asc("doc_id")]
    plain = sorted(tuple(r) for r in CU.cap_per_key(df, "source", 7, order).collect())
    salted = sorted(
        tuple(r) for r in CU.cap_per_key(df, "source", 7, order, salts=8).collect()
    )
    assert salted == plain
    import pytest

    with pytest.raises(ValueError, match="salts"):
        CU.cap_per_key(df, "source", 7, order, salts=1)


def test_boilerplate_validates_frac_and_min_docs(spark):
    import pytest

    df = spark.createDataFrame([(1, "x", "s")], ["doc_id", "text", "source"])
    with pytest.raises(ValueError, match="frac"):
        CU.boilerplate_lines(df, "text", "source", frac=0.0)
    with pytest.raises(ValueError, match="min_docs"):
        CU.boilerplate_lines(df, "text", "source", min_docs=1)
