"""Property-based tests (hypothesis): cleaning and text column
expressions vs pure-Python reference models over adversarial inputs —
a layer the reference has nothing like (SURVEY §5). Each example
batches many strings into ONE Spark job to keep runtime sane."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chicago_crash_data_pipeline_dashboard_spark.functions import cleaning as C
from chicago_crash_data_pipeline_dashboard_spark.functions import text as TX

TRUTHY = {"y", "yes", "true", "t", "1", "1.0"}

# printable-ish ASCII + whitespace, incl. the tokens that matter
token_st = st.one_of(
    st.none(),
    st.sampled_from(["Y", "n", " yes ", "TRUE", "t", "1", "1.0", "0", "no", "1.00"]),
    st.text(alphabet=" \tabyYtT10.", max_size=8),
)
text_st = st.text(
    alphabet=" abcdefgh.,!?the of and", max_size=60
)


def _bool_model(v):
    return 1 if v is not None and v.strip().lower() in TRUTHY else 0


def _tokcount_model(s):
    return 0 if s is None or not s.strip() else len(s.strip().split())


@settings(max_examples=5, deadline=None)
@given(st.lists(token_st, min_size=1, max_size=30))
def test_standardize_boolean_matches_model(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, v string")
    got = {r.i: r.b for r in df.select("i", C.standardize_boolean(F.col("v")).alias("b")).collect()}
    for i, v in enumerate(values):
        assert got[i] == _bool_model(v), f"value {v!r}"


@settings(max_examples=5, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=30))
def test_token_count_matches_python_split(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r.i: r.n for r in df.select("i", TX.token_count(F.col("t")).alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _tokcount_model(t), f"text {t!r}"


@settings(max_examples=5, deadline=None)
@given(st.lists(text_st.filter(lambda s: s.strip()), min_size=1, max_size=20))
def test_word_shingle_invariants(spark, texts):
    n = 3
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r.i: r.sh for r in df.select("i", TX.word_shingles(F.col("t"), n).alias("sh")).collect()}
    for i, t in enumerate(texts):
        sh = got[i]
        toks = t.strip().lower().split()
        assert len(sh) >= 1
        assert len(sh) == len(set(sh))  # distinct
        assert len(sh) <= max(len(toks) - n + 1, 1)
        for s in sh:
            assert len(s.split(" ")) <= n


@settings(max_examples=5, deadline=None)
@given(st.lists(st.one_of(st.none(), st.floats(min_value=-5, max_value=30)), min_size=1, max_size=25))
def test_hour_bin_matches_model(spark, hours):
    df = spark.createDataFrame([(i, h) for i, h in enumerate(hours)], "i int, h double")
    got = {r.i: r.b for r in df.select("i", C.hour_bin(F.col("h")).alias("b")).collect()}

    def model(h):
        if h is None:
            return None
        if h <= 6:
            return "night"
        if h <= 12:
            return "morning"
        if h <= 18:
            return "afternoon"
        if h <= 23:
            return "evening"
        return None

    for i, h in enumerate(hours):
        assert got[i] == model(h), f"hour {h!r}"


def test_corrupt_bronze_file_does_not_poison_read(spark, tmp_path):
    """S6 parity: the reference returns [] for an unparseable page and
    keeps going (transformer.py:127-168); Spark's PERMISSIVE JSON read
    must keep every valid row when a garbage file sits in the layout."""
    from chicago_crash_data_pipeline_dashboard_spark.schemas import BRONZE_CRASHES
    from chicago_crash_data_pipeline_dashboard_spark.sources.bronze import (
        read_bronze,
        write_bronze,
    )

    rows = [("CR1", "2025-01-02T03:04:05"), ("CR2", "2025-02-03T04:05:06")]
    df = spark.createDataFrame(rows, ["crash_record_id", "crash_date"])
    base = str(tmp_path)
    write_bronze(df, base, "crashes", corr="r1")
    part = f"{base}/crashes/year=2025/corr=r1"
    with open(f"{part}/garbage.json", "w") as f:
        f.write("this is { not json ]]")
    back = read_bronze(spark, base, "crashes", BRONZE_CRASHES, corr="r1")
    ids = sorted(r.crash_record_id for r in back.collect() if r.crash_record_id is not None)
    assert ids == ["CR1", "CR2"]


# --------------------------------------------------------------------------
# Connected components and as-of join vs pure-Python models
# --------------------------------------------------------------------------

edge_st = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _cc_model(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=5, deadline=None)
@given(edge_st)
def test_connected_components_match_union_find(spark, edges):
    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _cc_model(edges)


@settings(max_examples=5, deadline=None)
@given(edge_st, edge_st)
def test_extend_components_matches_full_recompute(spark, run1, run2):
    """Incremental CC property: for ANY split of an edge list into two
    runs, extending run 1's assignments with run 2's batch equals the
    union-find model over the union (merges, takeover canonicals, and
    batch-only components all arise from the random strategies)."""
    from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (
        connected_components,
        extend_components,
    )

    e1 = spark.createDataFrame(run1, "src long, dst long")
    e2 = spark.createDataFrame(run2, "src long, dst long")
    assignments = connected_components(e1)
    got = {r["node"]: r["comp"] for r in extend_components(assignments, e2).collect()}
    assert got == _cc_model(run1 + run2)


asof_rows_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
)


def _asof_model(left, right):
    # latest right (ts, value) with ts <= left ts, per key; dedupe right
    # per (key, ts) keeping max value — mirrors asof_join's contract
    best = {}
    for k, ts, v in right:
        cur = best.get((k, ts))
        if cur is None or v > cur:
            best[(k, ts)] = v
    out = {}
    for i, (k, ts) in enumerate(left):
        cands = [(t, v) for (kk, t), v in best.items() if kk == k and t <= ts]
        out[i] = max(cands) if cands else None
    return out


@settings(max_examples=5, deadline=None)
@given(asof_rows_st, asof_rows_st)
def test_asof_join_matches_model(spark, lrows, rrows):
    import datetime as dt

    from chicago_crash_data_pipeline_dashboard_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)

    def ts(x):
        return base + dt.timedelta(minutes=x)

    left = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(lrows)], "i long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(k, ts(t), float(i)) for i, (k, t) in enumerate(rrows)],
        "k long, ts timestamp, v double",
    )
    got = {
        r["i"]: (r["ts_right"], r["v_right"])
        for r in asof_join(left, right, on="ts", by="k", value_cols=["v"]).collect()
    }
    model = _asof_model(lrows, [(k, t, float(i)) for i, (k, t) in enumerate(rrows)])
    assert set(got) == set(model)
    for i, expect in model.items():
        if expect is None:
            assert got[i] == (None, None), f"row {i}"
        else:
            assert got[i] == (ts(expect[0]), expect[1]), f"row {i}"


# NULL-heavy right sides + duplicate (by, on) pairs: the dedupe must
# keep the greatest value tuple with NULLs losing to any non-NULL
# (desc_nulls_last), and a matched-but-NULL value must surface as
# (ts_right set, v_right NULL) — never as a chimera from another row
# (operators/asof.py:50-58 contract; VERDICT r3 hardening item).
asof_null_rows_st = st.lists(
    st.tuples(
        st.integers(0, 2),  # tiny key domain -> many (by, on) collisions
        st.integers(0, 10),
        st.one_of(st.none(), st.integers(0, 5)),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(asof_rows_st, asof_null_rows_st)
def test_asof_join_null_and_duplicate_rights(spark, lrows, rrows):
    import datetime as dt

    from chicago_crash_data_pipeline_dashboard_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)

    def ts(x):
        return base + dt.timedelta(minutes=x)

    # model: dedupe per (k, t) keeping the greatest value, NULL last
    best: dict = {}
    for k, t, v in rrows:
        fv = None if v is None else float(v)
        if (k, t) not in best:
            best[(k, t)] = fv
        else:
            cur = best[(k, t)]
            if cur is None or (fv is not None and fv > cur):
                best[(k, t)] = fv
    model = {}
    for i, (k, t) in enumerate(lrows):
        cands = [(tt, vv) for (kk, tt), vv in best.items() if kk == k and tt <= t]
        model[i] = max(cands, key=lambda x: x[0]) if cands else None

    left = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(lrows)], "i long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(k, ts(t), None if v is None else float(v)) for k, t, v in rrows],
        "k long, ts timestamp, v double",
    )
    got = {
        r["i"]: (r["ts_right"], r["v_right"])
        for r in asof_join(left, right, on="ts", by="k", value_cols=["v"]).collect()
    }
    assert set(got) == set(model)
    for i, expect in model.items():
        if expect is None:
            assert got[i] == (None, None), f"row {i}"
        else:
            assert got[i] == (ts(expect[0]), expect[1]), f"row {i}"


def test_asof_join_rejects_reserved_value_cols(spark):
    import datetime as dt

    from chicago_crash_data_pipeline_dashboard_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0)], "k long, ts timestamp")
    right = spark.createDataFrame([(1, t0, 1.0)], "k long, ts timestamp, _on double")
    with pytest.raises(ValueError, match="_on"):
        asof_join(left, right, on="ts", by="k", value_cols=["_on"])
    with pytest.raises(ValueError, match="value_cols"):
        asof_join(left, right.withColumnRenamed("_on", "v"), on="ts", by="k",
                  value_cols=["ts", "v"])


# Winnowing fingerprints vs a direct python model of the same scheme
# (polynomial 8-gram hash mod 2^31-1, min per 4-window, distinct).
winnow_text_st = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c\ndef!"), min_size=0, max_size=60
    ),
    min_size=1,
    max_size=6,
)


def _winnow_model(text: str, k: int = 8, w: int = 4):
    import re

    m = (1 << 31) - 1
    pw = [pow(257, j, m) for j in range(k)]
    # trim() in BOTH engines strips only ASCII spaces (not \n/\t) —
    # python str.strip() is broader, so emulate the SQL semantics
    s = re.sub(r"\s+", " ", text.strip(" ").lower())
    cs = [ord(c) for c in s]
    hs = [
        sum(((cs[i + j] if i + j < len(cs) else 0) * pw[k - 1 - j]) % m for j in range(k)) % m
        for i in range(max(len(cs) - k + 1, 1))
    ]
    mins = [min(hs[j : j + w]) for j in range(max(len(hs) - w + 1, 1))]
    return list(dict.fromkeys(mins))


@settings(max_examples=5, deadline=None)
@given(winnow_text_st)
def test_winnow_fingerprints_match_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["fps"]
        for r in df.select(
            "i", TX.winnow_fingerprints(F.col("text"), 8, 4).alias("fps")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _winnow_model(t), f"text {t!r}"


# --------------------------------------------------------------------------
# PII scrub vs Python `re` (a third regex engine besides Java and RE2)
# --------------------------------------------------------------------------

# texts mixing near-PII fragments with real addresses/numbers so both
# the match and no-match paths are exercised
_pii_piece = st.sampled_from(
    [
        "a@b.co",
        "x.y@mail.example.org",
        "not@an",  # no TLD → not an email
        "10.0.0.1",
        "999.999.999.999",  # matches the (deliberately loose) ipv4 shape
        "1.2.3.4567",  # 4-digit tail breaks the \b → no match
        "312-555-0148",
        "773.555.0199",
        "12-345-6789",  # 2-digit area → no match
        "plain words",
        "trailing dot.",
    ]
)
pii_text_st = st.lists(_pii_piece, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(pii_text_st, min_size=1, max_size=25))
def test_pii_scrub_matches_python_re(spark, texts):
    import re

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    c = TX.pii_counts(F.col("t"))
    out = {
        r.i: r
        for r in df.select(
            "i",
            TX.scrub_pii(F.col("t")).alias("clean"),
            *[c[k].alias(k) for k in TX.PII_PATTERNS],
        ).collect()
    }
    for i, t in enumerate(texts):
        expect = t
        for pat in TX.PII_PATTERNS.values():
            expect = re.sub(pat, "<PII>", expect)
        assert out[i]["clean"] == expect, f"text {t!r}"
        for kind, pat in TX.PII_PATTERNS.items():
            assert out[i][kind] == len(re.findall(pat, t)), f"{kind} on {t!r}"


# --------------------------------------------------------------------------
# Packing / chunking arithmetic vs pure-Python models
# --------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=40))
def test_pack_and_chunk_arithmetic_match_models(spark, counts):
    """bin_id (running-sum integer DIV) and chunk fan-out (ceil-div
    sequence explode) vs plain Python over arbitrary token counts —
    the same expressions doc_pack_bins / doc_chunk_overlap use."""
    from pyspark.sql import Window

    rows = [(i, n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens long")

    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    out = df.withColumn("start_off", start).withColumn(
        "bin_id", F.expr("start_off DIV 512")
    ).withColumn(
        "nc",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN 0 ELSE "
            "1 + (greatest(n_tokens - 128, 0) + 95) DIV 96 END"
        ),
    )
    got = {r.doc_id: (r.bin_id, r.nc) for r in out.collect()}

    acc = 0
    for i, n in enumerate(counts):
        exp_bin = acc // 512
        exp_nc = 0 if n == 0 else 1 + (max(n - 128, 0) + 95) // 96
        assert got[i] == (exp_bin, exp_nc), f"doc {i} n={n} acc={acc}"
        acc += n


def _boiler_model(rows, min_docs=3, frac=0.5):
    """Pure-Python strip_boilerplate_lines: per group, a non-blank line
    is boilerplate when the group has >= min_docs docs and the line
    appears (once-per-doc) in >= frac of them."""
    from collections import defaultdict

    by_grp = defaultdict(list)
    for i, t, g in rows:
        by_grp[g].append((i, t))
    boiler = defaultdict(set)
    for g, docs in by_grp.items():
        if len(docs) < min_docs:
            continue
        df = defaultdict(int)
        for _i, t in docs:
            for line in {l for l in t.split("\n") if l.strip()}:
                df[line] += 1
        boiler[g] = {l for l, c in df.items() if c >= len(docs) * frac}
    return {
        i: "\n".join(l for l in t.split("\n") if not (l.strip() and l in boiler[g]))
        for i, t, g in rows
    }


_line_st = st.sampled_from(["HEADER", "footer", "body one", "body two", "", "  "])
_doc_st = st.lists(_line_st, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(_doc_st, st.sampled_from(["s1", "s2"])), min_size=1, max_size=12))
def test_strip_boilerplate_matches_model(spark, docs):
    from chicago_crash_data_pipeline_dashboard_spark.operators import curation as CU

    rows = [(i, t, g) for i, (t, g) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        r.doc_id: r.text
        for r in CU.strip_boilerplate_lines(df, "doc_id", "text", "source").collect()
    }
    assert got == _boiler_model(rows)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
             min_size=1, max_size=25),
    st.integers(1, 4),
)
def test_cap_per_key_matches_model(spark, rows, k):
    from collections import defaultdict

    from chicago_crash_data_pipeline_dashboard_spark.operators import curation as CU

    data = [(i, g, q) for i, (g, q) in enumerate(rows)]
    df = spark.createDataFrame(data, ["doc_id", "source", "q"])
    kept = CU.cap_per_key(df, "source", k, order_by=[F.desc("q"), F.asc("doc_id")])
    got = sorted(r.doc_id for r in kept.collect())
    by_g = defaultdict(list)
    for i, g, q in data:
        by_g[g].append((-q, i))
    want = sorted(i for g, members in by_g.items() for _q, i in sorted(members)[:k])
    assert got == want


@given(
    buckets=st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=8),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None)
def test_explode_pairs_matches_itertools_combinations(spark, buckets):
    """The shared two-level pair generate (dedup._explode_pairs — under
    the jaccard/tfidf/minhash/semantic/simhash-hamming paths) must emit
    exactly itertools.combinations(bucket, 2) per bucket, in-array
    order, including duplicate elements and multi-bucket unions."""
    import itertools

    from chicago_crash_data_pipeline_dashboard_spark.operators.dedup import (
        _explode_pairs,
    )

    df = spark.createDataFrame([(b,) for b in buckets], "docs array<long>")
    got = sorted(
        (r.x, r.y) for r in _explode_pairs(df).collect()
    )
    want = sorted(
        (x, y) for b in buckets for x, y in itertools.combinations(b, 2)
    )
    assert got == want


@given(
    docs=st.lists(
        st.text(
            alphabet=st.sampled_from("ab x"),  # tiny alphabet → real collisions
            min_size=0,
            max_size=20,
        ),
        min_size=2,
        max_size=8,
    ),
    d=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=8, deadline=None)
def test_simhash_hamming_pigeonhole_complete(spark, docs, d):
    """The d+1-segment probe must find EXACTLY the all-pairs brute-force
    result at any distance bound — the pigeonhole completeness argument,
    exercised on random near-colliding docs (tiny alphabet drives many
    identical/close fingerprints, including the all-empty-token case)."""
    from chicago_crash_data_pipeline_dashboard_spark.operators import dedup as DD

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in DD.simhash_hamming_pairs(df, "doc_id", "text", max_distance=d).collect()
    }
    fp = DD.simhash(df, "doc_id", "text")
    a = fp.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("fa"))
    b = fp.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("fb"))
    brute = {
        (r.doc_a, r.doc_b, int(r.h))
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("h") <= d)
        .collect()
    }
    assert got == brute


@given(
    docs=st.lists(
        st.text(
            alphabet=st.sampled_from("ab x\t"),  # tiny alphabet → real dup groups
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=8, deadline=None)
def test_dedup_exact_matches_min_id_model(spark, docs):
    """The r7 single-window dedup_exact must keep EXACTLY the min id
    per normalized-content group — the same contract the r6
    groupBy-min + semi-join shape had, pinned against a pure-Python
    model of the fingerprint normalization (lower → trim spaces →
    collapse \\s+), including all-whitespace and empty texts."""
    import re

    from chicago_crash_data_pipeline_dashboard_spark.operators import dedup as DD

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    kept = sorted(r.doc_id for r in DD.dedup_exact(df, "doc_id", "text").collect())

    groups: dict[str, int] = {}
    for i, t in enumerate(docs):
        norm = re.sub(r"\s+", " ", t.lower().strip(" "))
        groups.setdefault(norm, i)  # first occurrence = min id (enumerate order)
    assert kept == sorted(groups.values())
    # row contents survive untouched (no helper columns leak)
    cols = DD.dedup_exact(df, "doc_id", "text").columns
    assert cols == ["doc_id", "text"]


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.text(alphabet=" abcXY tHe", min_size=0, max_size=20), min_size=1, max_size=12
    ),
    st.lists(
        st.text(alphabet=" abcXY tHe", min_size=0, max_size=20), min_size=1, max_size=12
    ),
)
def test_dedup_exact_against_matches_set_model(spark, tmp_path_factory, corpus_texts, batch_texts):
    """Cross-run exact dedup vs the obvious set model: a batch row
    survives iff its NORMALIZED content fingerprint is absent from the
    corpus — over adversarial text (case/whitespace collisions between
    corpus and batch)."""
    from chicago_crash_data_pipeline_dashboard_spark.operators import dedup as DD

    def norm(s):
        return " ".join(s.strip().lower().split())

    tmp = tmp_path_factory.mktemp("fps")
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(batch_texts)], "doc_id long, text string"
    )
    path = str(tmp / "t")
    DD.write_fingerprints(corpus, path, "doc_id", "text", parts=4)
    got = sorted(r.doc_id for r in DD.dedup_exact_against(batch, path, "doc_id", "text").collect())
    corpus_norms = {norm(t) for t in corpus_texts}
    want = sorted(1000 + i for i, t in enumerate(batch_texts) if norm(t) not in corpus_norms)
    assert got == want
