"""Training-data-pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing — the operations a 100 TB LLM data
pipeline needs beyond the reference's own surface.

Every SQL-expressible query carries a DuckDB oracle that reproduces the
Spark result BIT-FOR-BIT:

- tokenization/shingling is mirrored formula-by-formula (Spark
  ``split/slice/concat_ws`` ≡ DuckDB ``regexp_split_to_array/
  list_slice/array_to_string``);
- hashing uses the engine-portable md5 mode (``functions.text.hash32``
  ≡ ``('0x'||substr(md5(s),1,8))::BIGINT``) so MinHash/SimHash
  signatures agree exactly — the murmur3 mode remains the fast path
  for production runs;
- float math relies on both engines folding arrays sequentially
  left-to-right (verified bitwise-identical for ``F.aggregate`` vs
  ``list_sum(list_transform(...))``), plus ``round(x, 6)`` margins.

The media queries run an Arrow-batched ``mapInPandas`` over an
in-memory fixture — not expressible against the registered SQL views,
so they take the driver's rows-only check (the decode itself is a
documented stub; see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions import vectors as VX
from ..operators import dedup as DD
from ..operators import multimodal as MM
from ..operators import similarity as SIM
from .registry import load, register

# --------------------------------------------------------------------------
# Shared DuckDB SQL fragments (mirror functions/text.py exactly)
# --------------------------------------------------------------------------

_TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_H32 = "CAST('0x' || substring(md5({s}), 1, 8) AS BIGINT)"
_P31 = (1 << 31) - 1


def _shingles_sql(n: int) -> str:
    """word_shingles(text, n) in DuckDB: same sequence/slice formula."""
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({_TOKS}) - {n} + 1, 1) + 1), "
        f"i -> array_to_string(list_slice({_TOKS}, i, i + {n} - 1), ' ')))"
    )


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS[lang]) + "]"


def _dot_sql(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _cosine_sql(a: str, b: str, dim: int) -> str:
    """cosine(a, b) with the same 0-norm guard and operand order."""
    denom = f"(sqrt({_dot_sql(a, a, dim)}) * sqrt({_dot_sql(b, b, dim)}))"
    return f"(CASE WHEN {denom} = 0 THEN 0.0 ELSE {_dot_sql(a, b, dim)} / {denom} END)"


def _lsh_sig_sql(vec: str, n_planes: int, dim: int, seed: int = 42) -> str:
    """vectors.lsh_signature with the hyperplanes inlined as literals.

    Plane weights are emitted as CAST('repr' AS DOUBLE) — string→double
    parsing is correctly rounded in both engines, so the literals are
    the exact same doubles Spark folds into its plan.
    """
    planes = VX.random_hyperplanes(dim, n_planes, seed)
    terms = []
    for i, plane in enumerate(planes):
        lits = ", ".join(f"'{w!r}'" for w in plane)
        plane_list = f"CAST([{lits}] AS DOUBLE[])"
        proj = (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"j -> CAST({vec}[j] AS DOUBLE) * ({plane_list})[j]))"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << i} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# --------------------------------------------------------------------------
# Text analysis over `documents`
# --------------------------------------------------------------------------

_EN_SW = _sw_list("en")
_TOKCNT = f"(CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END)"
_PUNCT = (
    "(CASE WHEN length(text) = 0 THEN 0.0 ELSE "
    "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)"
    " / length(text) END)"
)
_SWRATIO = (
    f"(CASE WHEN len({_TOKS}) <= 0 THEN 0.0 ELSE "
    f"CAST(len(list_filter({_TOKS}, t -> list_contains({_EN_SW}, t))) AS DOUBLE)"
    f" / len({_TOKS}) END)"
)
_QUALITY = (
    f"round(0.5 * least(CAST({_TOKCNT} AS DOUBLE) / 100.0, 1.0)"
    f" + 0.25 * (1.0 - least({_PUNCT} * 5.0, 1.0))"
    f" + 0.25 * least({_SWRATIO} * 4.0, 1.0), 6)"
)


@register(
    "doc_text_stats",
    oracle=f"""
    SELECT
      doc_id,
      CAST({_TOKCNT} AS BIGINT) AS n_tokens,
      CAST(length(text) AS BIGINT) AS n_chars_txt,
      round({_PUNCT}, 6) AS punct_ratio,
      round(CASE WHEN len({_TOKS}) <= 0 THEN 0.0 ELSE
        CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE)
          / len({_TOKS}) END, 6) AS mean_tok_len,
      {_QUALITY} AS quality
    FROM documents
    """,
    doc="Per-document text statistics: token count, char count, punctuation "
    "ratio, mean token length, composite quality score. All JVM-side "
    "higher-order column functions — a narrow map over the parquet scan, "
    "no shuffle, no UDF (functions/text.py).",
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    p = TX.text_profile(t)  # one tokenize+punct pass for all five stats
    return d.select(
        "doc_id",
        p["n_tokens"].alias("n_tokens"),
        TX.char_count(t).alias("n_chars_txt"),
        F.round(p["punct_ratio"], 6).alias("punct_ratio"),
        F.round(p["mean_tok_len"], 6).alias("mean_tok_len"),
        p["quality"].alias("quality"),
    )


@register(
    "doc_repetition_stats",
    oracle=f"""
    WITH per_line AS (
      SELECT doc_id, source,
             CASE WHEN len(ls) <= 1 THEN 0.0
                  ELSE CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
             END AS dup_line_frac
      FROM (SELECT doc_id, source,
                   list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ls
            FROM documents) t
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                    i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS g
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) t
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
    per_gram AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top2_frac
                 FROM gc GROUP BY doc_id),
    j AS (SELECT p.doc_id, p.source, p.dup_line_frac,
                 COALESCE(g.top2_frac, 0.0) AS top2_frac
          FROM per_line p LEFT JOIN per_gram g USING (doc_id))
    SELECT source,
           count(*) AS n_docs,
           round(CAST(SUM(CAST(dup_line_frac AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS avg_dup_line_frac,
           round(CAST(SUM(CAST(top2_frac AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS avg_top2_frac,
           CAST(SUM(CASE WHEN dup_line_frac > 0.30 OR top2_frac > 0.20 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM j GROUP BY source
    """,
    doc="Gopher-style repetition quality signals per source: duplicate "
    "non-blank-line fraction (functions/text.py line_dup_ratio — a "
    "narrow JVM-side map) and top-2-gram frequency fraction (explode + "
    "two-level groupBy — LINEAR in tokens; an in-array HOF mode count "
    "would be quadratic per document). n_flagged counts docs beyond the "
    "Gopher-ish thresholds (dup lines > 0.30 or top 2-gram > 0.20) — "
    "the boilerplate/templated pages a curation pipeline drops.",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per_line = d.select(
        "doc_id", "source", TX.line_dup_ratio(F.col("text")).alias("dup_line_frac")
    )
    grams = d.select(
        "doc_id", F.explode(TX.word_ngram_list(F.col("text"), 2)).alias("g")
    )
    per_gram = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top2_frac"))
    )
    j = per_line.join(per_gram, "doc_id", "left").select(
        "source",
        "dup_line_frac",
        F.coalesce(F.col("top2_frac"), F.lit(0.0)).alias("top2_frac"),
    )
    flagged = (F.col("dup_line_frac") > 0.30) | (F.col("top2_frac") > 0.20)
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("dup_line_frac").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_dup_line_frac"),
        F.round(
            F.sum(F.col("top2_frac").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_top2_frac"),
        F.sum(F.when(flagged, 1).otherwise(0)).alias("n_flagged"),
    )


def _winnow_fps_cte(k: int, w: int, carry: str = "") -> str:
    """WITH-body computing ``wnd(doc_id[, carry cols], fps)`` — the
    DuckDB twin of winnow_fingerprints, shared by the fingerprint
    profile and decontamination oracles. ``carry`` is extra column SQL
    (e.g. ``, source``) threaded through every CTE."""
    from ..functions.text import WINNOW_BASE, WINNOW_MOD

    m = WINNOW_MOD
    pw = [pow(WINNOW_BASE, j, m) for j in range(k)]
    terms = " + ".join(
        f"(COALESCE(cs[i+{j}], 0) * CAST({pw[k - 1 - j]} AS BIGINT)) % {m}"
        for j in range(k)
    )
    return f"""
    n AS (SELECT doc_id{carry}, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s
               FROM documents),
    c AS (SELECT doc_id{carry},
                 list_transform(range(1, length(s) + 1), i -> CAST(ord(substr(s, i, 1)) AS BIGINT)) AS cs,
                 length(s) AS L
          FROM n),
    h AS (SELECT doc_id{carry},
                 list_transform(range(1, greatest(L - {k} + 1, 1) + 1),
                                i -> ({terms}) % {m}) AS hs
          FROM c),
    wnd AS (SELECT doc_id{carry},
                   list_distinct(list_transform(
                     range(1, greatest(len(hs) - {w} + 1, 1) + 1),
                     j -> list_min(list_slice(hs, j, j + {w} - 1)))) AS fps
            FROM h)"""


def _winnow_oracle(k: int, w: int) -> str:
    return f"""
    WITH {_winnow_fps_cte(k, w)}
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fps,
           list_min(fps) AS fp_min,
           list_max(fps) AS fp_max,
           CAST(list_aggregate(fps, 'sum') AS BIGINT) AS fp_sum
    FROM wnd
    """


@register(
    "doc_winnow_fp",
    oracle=_winnow_oracle(8, 4),
    doc="Winnowing (rolling k-gram hash) document fingerprints "
    "(functions/text.py winnow_fingerprints — the MOSS scheme): "
    "polynomial 8-gram hashes mod 2^31-1 over normalized chars, min of "
    "each 4-window, distinct survivors. Profiled per doc (count / min "
    "/ max / sum of the fingerprint set) so the whole selection "
    "pipeline is hash-verified against DuckDB's bit-identical integer "
    "arithmetic. Narrow JVM-side map, no shuffle; at corpus scale the "
    "fingerprints feed an inverted index exactly like the shingle "
    "dedup (explode → groupBy fingerprint).",
)
def doc_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    fps = TX.winnow_fingerprints(F.col("text"), k=8, w=4)
    prof = TX._let(
        fps,
        lambda f: F.struct(
            F.size(f).cast("long").alias("n_fps"),
            F.array_min(f).alias("fp_min"),
            F.array_max(f).alias("fp_max"),
            F.aggregate(f, F.lit(0).cast("long"), lambda a, x: a + x).alias("fp_sum"),
        ),
    )
    return d.select(
        "doc_id",
        prof["n_fps"].alias("n_fps"),
        prof["fp_min"].alias("fp_min"),
        prof["fp_max"].alias("fp_max"),
        prof["fp_sum"].alias("fp_sum"),
    )


# Mixing weights for the stratified-sampling gate: named strata keep
# more, the long tail keeps the default rate (the shape of an LLM data
# mix: upweight curated sources, downsample the crawl).
_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1

# CASE arms generated from _MIX_RATES so the two engines can't drift
# when the mix changes (same coupling discipline as _winnow_fps_cte);
# the uniform reuses the _H32 md5-hash32 fragment TX.hash32 mirrors.
_MIX_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {r}" for s, r in _MIX_RATES.items())
    + f" ELSE {_MIX_DEFAULT} END"
)


@register(
    "doc_stratified_sample",
    oracle=f"""
    WITH u AS (
      SELECT source,
             {_H32.format(s="CAST(doc_id AS VARCHAR) || '|mix'")} / 4294967296.0 AS u,
             {_MIX_CASE} AS rate
      FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS realized_rate,
           round(CAST(max(rate) AS DOUBLE), 6) AS expected_rate
    FROM u GROUP BY source
    """,
    doc="Stratified (mixing-weight) sampling — the data-mix step of a "
    "training pipeline: per-source keep rates (upweight curated "
    "strata, downsample the crawl tail), decided by a DETERMINISTIC "
    "per-row uniform u = md5-hash32(doc_id||salt)/2^32 so the sample "
    "is reproducible row-for-row across runs AND engines (no RNG "
    "state, no seed coordination; W7's hash-bucket sampling "
    "generalized to per-stratum rates). A narrow map + one rollup "
    "shuffle; at 100 TB the filter rides the scan and the kept "
    "fraction is the only data that moves.",
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    u = TX.hash32(
        F.concat(F.col("doc_id").cast("string"), F.lit("|mix"))
    ) / F.lit(float(1 << 32))
    rate = F.lit(float(_MIX_DEFAULT))
    for src, r in _MIX_RATES.items():
        rate = F.when(F.col("source") == src, float(r)).otherwise(rate)
    return (
        d.select("source", u.alias("u"), rate.alias("rate"))
        .withColumn("kept", (F.col("u") < F.col("rate")).cast("int"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.round(F.sum("kept").cast("double") / F.count(F.lit(1)), 6).alias(
                "realized_rate"
            ),
            F.round(F.max("rate"), 6).alias("expected_rate"),
        )
    )


_EVAL_SOURCE = "src0"


@register(
    "doc_decontaminate",
    oracle=f"""
    WITH {_winnow_fps_cte(8, 4, carry=", source")},
    f AS (SELECT doc_id, source, unnest(fps) AS fp FROM wnd),
    e AS (SELECT DISTINCT fp FROM f WHERE source = '{_EVAL_SOURCE}'),
    cont AS (SELECT DISTINCT doc_id, source FROM f
             WHERE source <> '{_EVAL_SOURCE}' AND fp IN (SELECT fp FROM e)),
    t AS (SELECT source, count(*) AS n_docs FROM documents
          WHERE source <> '{_EVAL_SOURCE}' GROUP BY source),
    cc AS (SELECT source, count(*) AS n_contaminated FROM cont GROUP BY source)
    SELECT t.source, t.n_docs,
           COALESCE(cc.n_contaminated, CAST(0 AS BIGINT)) AS n_contaminated,
           round(CAST(COALESCE(cc.n_contaminated, 0) AS DOUBLE) / t.n_docs, 6) AS contamination_rate
    FROM t LEFT JOIN cc USING (source)
    """,
    doc="Eval-set decontamination (the GPT-3-style n-gram-overlap "
    "scrub every training pipeline needs): training docs sharing ANY "
    "winnowing fingerprint with the held-out source are counted as "
    "contaminated, per source. The eval set's distinct fingerprints "
    "are BROADCAST (eval benchmarks are tiny relative to a 100 TB "
    "crawl), so the whole scrub is one narrow pass over the corpus "
    "explode — zero corpus shuffle before the per-source rollup; the "
    "winnow guarantee makes any shared normalized substring of >= "
    "k+w-1 chars detectable.",
)
def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    fps = d.select(
        "doc_id",
        "source",
        F.explode(TX.winnow_fingerprints(F.col("text"), k=8, w=4)).alias("fp"),
    )
    eval_fps = (
        fps.filter(F.col("source") == _EVAL_SOURCE).select("fp").distinct()
    )
    contaminated = (
        fps.filter(F.col("source") != _EVAL_SOURCE)
        .join(F.broadcast(eval_fps), "fp", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    train_counts = (
        d.filter(F.col("source") != _EVAL_SOURCE)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    cont_counts = contaminated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0).cast("long"))
    return train_counts.join(cont_counts, "source", "left").select(
        "source",
        "n_docs",
        n_cont.alias("n_contaminated"),
        F.round(n_cont.cast("double") / F.col("n_docs"), 6).alias(
            "contamination_rate"
        ),
    )


@register(
    "emb_quantize_error",
    oracle="""
    WITH q AS (
      SELECT label,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
             embedding
      FROM embeddings
    ),
    err AS (
      SELECT label, scale,
             CASE WHEN scale = 0 THEN 0.0 ELSE
               list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / scale) * scale)))
             END AS max_abs_err
      FROM q
    )
    SELECT label,
           count(*) AS n_vecs,
           round(CAST(SUM(CAST(max_abs_err AS DECIMAL(25,18))) AS DOUBLE) / count(*), 9) AS mean_max_err,
           CAST(SUM(CASE WHEN max_abs_err <= scale / 2.0 + 1e-12 THEN 0 ELSE 1 END) AS BIGINT) AS n_out_of_bound
    FROM err GROUP BY label
    """,
    doc="Symmetric int8 embedding quantization error profile — the 4x "
    "storage compression a 100 TB embedding store runs on. Per vector: "
    "scale = max|x|/127, q = round(x/scale), reconstruction error = "
    "max|x - q*scale|; per label: mean of the per-vector max errors "
    "(decimal-routed at scale 18 — errors are ~1e-3) and a count of "
    "vectors violating the scale/2 error bound (0 by construction — "
    "the oracle proves the quantizer's bound, not just its shape). "
    "Pure JVM-side HOF arithmetic, one narrow pass, one label rollup.",
)
def emb_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")

    def max_abs_err(emb: F.Column, scale: F.Column) -> F.Column:
        return F.when(scale == 0, F.lit(0.0)).otherwise(
            F.array_max(
                F.transform(
                    emb,
                    lambda x: F.abs(
                        x.cast("double")
                        - F.round(x.cast("double") / scale) * scale
                    ),
                )
            )
        )

    scale = (
        F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))))
        / 127.0
    )
    per_vec = e.select(
        "label",
        F.col("embedding").alias("emb"),
        scale.alias("scale"),
    ).select(
        "label",
        "scale",
        max_abs_err(F.col("emb"), F.col("scale")).alias("max_abs_err"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(F.col("max_abs_err").cast("decimal(25,18)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_max_err"),
        F.sum(
            F.when(F.col("max_abs_err") <= F.col("scale") / 2.0 + 1e-12, 0).otherwise(1)
        )
        .cast("long")
        .alias("n_out_of_bound"),
    )


def _lang_confusion_oracle() -> str:
    hits = ", ".join(
        f"len(list_filter({_TOKS}, t -> list_contains({_sw_list(lang)}, t))) AS h_{lang}"
        for lang in TX.LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"h_{lang}" for lang in TX.LANG_ORDER) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'und' "
    for lang in TX.LANG_ORDER:
        case += f"WHEN h_{lang} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
    WITH h AS (SELECT lang, {hits} FROM documents),
    p AS (SELECT lang, {case} AS pred_lang FROM h)
    SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM p GROUP BY lang, pred_lang
    """


@register(
    "doc_lang_confusion",
    oracle=_lang_confusion_oracle(),
    doc="Language-ID (stopword-hit argmax heuristic, functions/text.py) "
    "confusion matrix against the labeled lang column. One shuffle on the "
    "(label, prediction) pair — the A18-style crosstab shape.",
)
def doc_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", TX.lang_id(F.col("text")).alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_FPRINT = "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))"


@register(
    "doc_min_shingle_fp",
    oracle=f"""
    SELECT doc_id,
           list_min(list_transform({_shingles_sql(3)}, s -> md5(s))) AS min_shingle_md5
    FROM documents
    """,
    doc="Rolling-style document fingerprint: lexicographic min of md5 over "
    "3-word shingles (one-permutation MinHash). Narrow map, no shuffle.",
)
def doc_min_shingle_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TX.min_shingle_fingerprint(F.col("text"), 3).alias("min_shingle_md5")
    )


# --------------------------------------------------------------------------
# Deduplication over `documents`
# --------------------------------------------------------------------------


@register(
    "doc_exact_dup_stats",
    oracle=f"""
    WITH g AS (SELECT {_FPRINT} AS f, count(*) AS n FROM documents GROUP BY 1)
    SELECT CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_unique,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_docs
    FROM g
    """,
    doc="Exact-duplicate profile: md5 content-fingerprint groupBy "
    "(operators/dedup.py exact family). One shuffle on the fingerprint; "
    "map-side partial aggregation makes this linear at 100 TB.",
)
def doc_exact_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    g = (
        d.select(TX.fingerprint(F.col("text")).alias("f"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return g.agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("n_dup_docs"),
    )


@register(
    "doc_dedup_exact_by_source",
    oracle=f"""
    WITH fp AS (SELECT doc_id, source, {_FPRINT} AS f FROM documents),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
    FROM fp JOIN keep USING (doc_id)
    GROUP BY source
    """,
    doc="dedup_exact (keep min-id per identical-content group, left-semi "
    "join back) then per-source survivor counts. Two shuffles: fingerprint "
    "agg + the semi join (broadcast when the keep-set is small).",
)
def doc_dedup_exact_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    kept = DD.dedup_exact(d, "doc_id", "text")
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


def _jaccard_ctes(n: int, max_bucket: int) -> str:
    """CTE chain (sh → sizes → inv → pairs) shared by the Jaccard-pair
    oracle and the dedup-cluster oracle built on those pairs."""
    return f"""
    sh AS (SELECT doc_id AS doc,
                list_distinct(list_transform({_shingles_sql(n)},
                  s -> CAST('0x' || substring(md5(s), 1, 15) AS BIGINT))) AS shingles
                FROM documents),
    sizes AS (SELECT doc, len(shingles) AS n_sh FROM sh),
    inv0 AS (SELECT doc, unnest(shingles) AS shingle FROM sh),
    hot AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING count(*) > {max_bucket}),
    inv AS (SELECT * FROM inv0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
    pairs AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS inter
      FROM inv a JOIN inv b USING (shingle)
      WHERE a.doc < b.doc
      GROUP BY 1, 2
    )"""


@register(
    "doc_jaccard_pairs",
    oracle=f"""
    WITH {_jaccard_ctes(3, 1000)}
    SELECT doc_a, doc_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
           round(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
    """,
    doc="Exact n-gram Jaccard near-dup pairs via an inverted shingle index "
    "(operators/dedup.py): explode → self-join on 60-bit hashed shingles "
    "(8-byte shuffle keys) → pair-count intersection; hot-shingle skew "
    "guard (>1000 docs) bounds the quadratic bucket at scale.",
)
def doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, max_bucket=1000, hash_mode="md5"
    )


@register(
    "doc_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_jaccard_ctes(3, 1000)},
    jp AS (
      SELECT doc_a, doc_b
      FROM pairs
      JOIN sizes sa ON sa.doc = doc_a
      JOIN sizes sb ON sb.doc = doc_b
      WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
    ),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM jp
              UNION SELECT doc_b AS a, doc_a AS b FROM jp),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
    SELECT comp AS cluster, CAST(count(*) AS BIGINT) AS n_docs,
           array_to_string(list_sort(list(node)), ',') AS doc_ids
    FROM comp GROUP BY comp
    """,
    doc="Near-dup CLUSTERS: connected components (operators/graph.py, "
    "iterative min-label propagation with localCheckpoint lineage "
    "truncation) over the exact-Jaccard pair list — the step that turns "
    "pairwise dedup output into keep-one-per-group decisions. The oracle "
    "computes the same components via a recursive-CTE transitive closure "
    "+ group-min, putting the iterative distributed algorithm under the "
    "full differential gate.",
)
def doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import dedup_clusters

    d = load(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, max_bucket=1000, hash_mode="md5"
    )
    return dedup_clusters(
        pairs, "doc_a", "doc_b", stats_out=DUP_CLUSTERS_LAST_STATS
    )


# Bench-telemetry side channel for the gate above: the registry
# callable signature is fixed at (spark, sf_dir), so bench.py reads the
# CC round stats here after timing the query (serial runs only — the
# OPERATOR itself takes a caller-owned stats_out dict and has no
# global state).
DUP_CLUSTERS_LAST_STATS: dict = {}


@register(
    "doc_tfidf_cosine_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id AS doc,
             unnest(list_transform({_TOKS},
               t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT))) AS term
      FROM documents
    ),
    tf AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY doc, term),
    vocab AS (SELECT term, count(*) AS df FROM tf GROUP BY term
              HAVING count(*) BETWEEN 2 AND LEAST(1000, GREATEST(2,
                (SELECT count(DISTINCT doc_id) FROM documents) // 5))),
    w AS (SELECT tf.doc, tf.term,
                 tf.tf * ((SELECT count(DISTINCT doc_id) FROM documents) / vocab.df) AS w
          FROM tf JOIN vocab USING (term)),
    norms AS (SELECT doc, sqrt(CAST(SUM(CAST(w*w AS DECIMAL(25,6))) AS DOUBLE)) AS nrm
              FROM w GROUP BY doc),
    dots AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
                    CAST(SUM(CAST(a.w*b.w AS DECIMAL(25,6))) AS DOUBLE) AS dot
             FROM w a JOIN w b USING (term)
             WHERE a.doc < b.doc GROUP BY 1, 2)
    SELECT doc_a, doc_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN norms na ON na.doc = dots.doc_a
    JOIN norms nb ON nb.doc = dots.doc_b
    WHERE dot / (na.nrm * nb.nrm) >= 0.8
    """,
    doc="df-weighted cosine near-dup pairs (operators/dedup.py "
    "tfidf_cosine_pairs): rare terms weigh more than stop-terms — the "
    "weighted complement of the Jaccard dedup. Weights use the log-free "
    "tf·(N/df) form so the math is bit-reproducible across engines; dot "
    "products and norms are decimal-routed (order-independent). Same "
    "2-shuffle bucket-explosion shape as the Jaccard pairs, weights "
    "computed inside the term bucket (df = bucket size, no df join).",
)
def doc_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.tfidf_cosine_pairs(
        d, "doc_id", "text", threshold=0.8, max_df=1000, hash_mode="md5"
    )


def _minhash_oracle(
    num_hashes: int,
    bands: int,
    shingle_n: int,
    seed: int,
    threshold: float,
    max_bucket: int = 1000,
) -> str:
    rows = num_hashes // bands
    params = DD._hash_params(num_hashes, seed)
    mins = ", ".join(
        f"list_min(list_transform(hvals, h -> ((h % {_P31}) * {a} + {b}) % {_P31}))"
        for a, b in params
    )
    band_selects = []
    for i in range(bands):
        cols = ", ".join(f"signature[{i * rows + j + 1}]" for j in range(rows))
        band_selects.append(
            f"SELECT doc, {i} AS band, concat_ws('_', {cols}) AS bucket FROM sig"
        )
    banded = " UNION ALL ".join(band_selects)
    return f"""
    WITH sh AS (SELECT doc_id AS doc, {_shingles_sql(shingle_n)} AS shingles FROM documents),
    hv AS (SELECT doc, list_transform(shingles, s -> {_H32.format(s='s')}) AS hvals FROM sh),
    sig AS (SELECT doc, [{mins}] AS signature FROM hv),
    banded0 AS ({banded}),
    hot AS (SELECT band, bucket FROM banded0
            GROUP BY band, bucket HAVING count(*) > {max_bucket}),
    banded AS (SELECT b.* FROM banded0 b
               WHERE NOT EXISTS (SELECT 1 FROM hot h
                                 WHERE h.band = b.band AND h.bucket = b.bucket)),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b USING (band, bucket)
      WHERE a.doc < b.doc
    ),
    est AS (
      SELECT doc_a, doc_b,
        CAST(len(list_filter(range(1, {num_hashes} + 1),
                 i -> sa.signature[i] = sb.signature[i])) AS DOUBLE) / {num_hashes}
          AS est_jaccard
      FROM cand
      JOIN sig sa ON sa.doc = doc_a
      JOIN sig sb ON sb.doc = doc_b
    )
    SELECT doc_a, doc_b, round(est_jaccard, 6) AS est_jaccard
    FROM est WHERE est_jaccard >= {threshold}
    """


@register(
    "doc_minhash_near_dups",
    oracle=_minhash_oracle(
        num_hashes=32, bands=8, shingle_n=3, seed=42, threshold=0.5, max_bucket=1000
    ),
    doc="MinHash+LSH near-dup pairs (operators/dedup.py): 32 universal-hash "
    "permutations over md5-hashed 3-shingles, 8 bands × 4 rows banding, "
    "signature-estimated Jaccard ≥ 0.5. Signature build is a narrow map; "
    "the only shuffles are the (band, bucket) collect and the pair "
    "distinct — linear-time candidate generation at 100 TB, with buckets "
    "beyond max_bucket=1000 dropped (hot-bucket skew guard, mirrored in "
    "the oracle's `hot` CTE). The oracle reproduces signatures exactly "
    "via the portable md5 hash mode.",
)
def doc_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.minhash_near_duplicates(
        d, "doc_id", "text",
        threshold=0.5, num_hashes=32, bands=8, shingle_n=3, seed=42, hash_mode="md5",
        max_bucket=1000,
    )


def _minhash_against_oracle(
    num_hashes: int,
    bands: int,
    shingle_n: int,
    seed: int,
    threshold: float,
    max_bucket: int,
    clone_offset: int,
) -> str:
    """DuckDB twin of write_minhash_signatures + near_duplicates_against
    over the gate's corpus/batch split: corpus = doc_id % 5 != 0 (its
    signatures are 'at rest'), batch = doc_id % 5 = 0 plus clones of
    every corpus doc with doc_id % 50 = 1 under id + clone_offset. The
    oracle replays the SAME band-bucket join — corpus side banded and
    cap-filtered on its WRITE-TIME bucket size, batch side banded
    fresh — and the same signature-estimated Jaccard."""
    rows = num_hashes // bands
    params = DD._hash_params(num_hashes, seed)
    mins = ", ".join(
        f"list_min(list_transform(hvals, h -> ((h % {_P31}) * {a} + {b}) % {_P31}))"
        for a, b in params
    )

    def banded(sig_cte: str) -> str:
        selects = []
        for i in range(bands):
            cols = ", ".join(f"signature[{i * rows + j + 1}]" for j in range(rows))
            selects.append(
                f"SELECT doc, {i} AS band, concat_ws('_', {cols}) AS bucket "
                f"FROM {sig_cte}"
            )
        return " UNION ALL ".join(selects)

    return f"""
    WITH corpus_docs AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id % 5 <> 0
    ),
    batch_docs AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + {clone_offset} AS doc, text FROM documents
      WHERE doc_id % 5 <> 0 AND doc_id % 50 = 1
    ),
    csh AS (SELECT doc, {_shingles_sql(shingle_n)} AS shingles FROM corpus_docs),
    chv AS (SELECT doc, list_transform(shingles, s -> {_H32.format(s='s')}) AS hvals FROM csh),
    csig AS (SELECT doc, [{mins}] AS signature FROM chv),
    bsh AS (SELECT doc, {_shingles_sql(shingle_n)} AS shingles FROM batch_docs),
    bhv AS (SELECT doc, list_transform(shingles, s -> {_H32.format(s='s')}) AS hvals FROM bsh),
    bsig AS (SELECT doc, [{mins}] AS signature FROM bhv),
    cbanded0 AS ({banded('csig')}),
    hot AS (SELECT band, bucket FROM cbanded0
            GROUP BY band, bucket HAVING count(*) > {max_bucket}),
    cbanded AS (SELECT b.* FROM cbanded0 b
                WHERE NOT EXISTS (SELECT 1 FROM hot h
                                  WHERE h.band = b.band AND h.bucket = b.bucket)),
    bbanded AS ({banded('bsig')}),
    cand AS (
      SELECT DISTINCT c.doc AS corpus_doc, b.doc AS batch_doc
      FROM cbanded c JOIN bbanded b USING (band, bucket)
    ),
    est AS (
      SELECT corpus_doc, batch_doc,
        CAST(len(list_filter(range(1, {num_hashes} + 1),
                 i -> sc.signature[i] = sb.signature[i])) AS DOUBLE) / {num_hashes}
          AS est_jaccard
      FROM cand
      JOIN csig sc ON sc.doc = corpus_doc
      JOIN bsig sb ON sb.doc = batch_doc
    )
    SELECT corpus_doc, batch_doc, round(est_jaccard, 6) AS est_jaccard
    FROM est WHERE est_jaccard >= {threshold}
    """


_AGAINST_CLONE_OFFSET = 1_000_000


@register(
    "doc_minhash_against_corpus",
    oracle=_minhash_against_oracle(
        num_hashes=32, bands=8, shingle_n=3, seed=42, threshold=0.5,
        max_bucket=1000, clone_offset=_AGAINST_CLONE_OFFSET,
    ),
    doc="Cross-run dedup against signatures AT REST (operators/dedup.py "
    "write_minhash_signatures / near_duplicates_against — VERDICT r10 "
    "item 3): the corpus's banded MinHash signatures persist as one "
    "parquet table partitionBy(part = hash(band, bucket) % parts) with "
    "a write-time bucket_size column, and an incoming batch dedups "
    "against the WHOLE ingested corpus by (a) banding its own "
    "signatures, (b) pruning the table scan to only the hive "
    "partitions its buckets hash into (PartitionFilters, "
    "plan-asserted in test_plans), (c) a batch-broadcast join on "
    "(band, bucket) with the hot-bucket cap applied scan-side from the "
    "stored bucket_size — no query-time aggregation of the corpus and "
    "no corpus text read, the generalization of doc_decontaminate's "
    "one-off shape. Gate: batch = the held-out 20% of documents plus "
    "planted clones of 10 corpus docs under new ids; every planted "
    "clone must surface at est_jaccard 1.0 (raised in-gate) and the "
    "full pair set must hash-match the oracle's SQL replay of the "
    "band-bucket join. At 100 TB the probe is O(batch + matched "
    "buckets): the corpus is touched only through its pruned "
    "signature partitions.",
)
def doc_minhash_against_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    clones = corpus.filter(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + _AGAINST_CLONE_OFFSET).alias("doc_id"), "text"
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).unionByName(clones)
    tmp = tempfile.mkdtemp(prefix="ccpd_sigs_")
    try:
        path = f"{tmp}/sigs"
        DD.write_minhash_signatures(
            corpus, path, "doc_id", "text",
            num_hashes=32, bands=8, shingle_n=3, seed=42,
            hash_mode="md5", parts=16,
        )
        pairs = DD.near_duplicates_against(
            batch, path, "doc_id", "text", threshold=0.5, max_bucket=1000
        )
        rows = pairs.collect()
        got = {(r.corpus_doc, r.batch_doc): r.est_jaccard for r in rows}
        planted = [r.doc_id for r in clones.select("doc_id").collect()]
        missed = [
            b for b in planted
            if got.get((b - _AGAINST_CLONE_OFFSET, b)) != 1.0
        ]
        if planted and missed:
            raise AssertionError(
                f"planted cross-run clones not caught at est_jaccard=1.0: {missed}"
            )
        # the signature files vanish with the scratch dir — return data
        return spark.createDataFrame(rows, pairs.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _simhash_fp_ctes(bits: int) -> str:
    """Shared CTE chain ending in ``fp(doc, simhash)`` — the portable
    md5-mode SimHash fingerprint, reused by the fingerprint gate and
    the Hamming-pair gate."""
    bsums = ", ".join(
        f"list_sum(list_transform(hvals, h -> CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) AS b{i}"
        for i in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits))
    return f"""hv AS (SELECT doc_id AS doc,
                list_transform({_TOKS}, t -> {_H32.format(s='t')}) AS hvals
                FROM documents),
    bs AS (SELECT doc, {bsums} FROM hv),
    fp AS (SELECT doc, CAST({fp} AS BIGINT) AS simhash FROM bs)"""


def _simhash_oracle(bits: int) -> str:
    return f"""
    WITH {_simhash_fp_ctes(bits)}
    SELECT doc, simhash FROM fp
    """


@register(
    "doc_simhash",
    oracle=_simhash_oracle(32),
    doc="Per-document 32-bit SimHash fingerprint (operators/dedup.py): "
    "sign-aggregated token-hash bits; one shuffle on doc with 32 partial "
    "sums. Portable md5 token hash so the oracle matches bit-for-bit.",
)
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.simhash(d, "doc_id", "text", bits=32, hash_mode="md5")


@register(
    "doc_simhash_hamming",
    oracle=f"""
    WITH {_simhash_fp_ctes(32)}
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc < b.doc
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-dup pairs within Hamming distance 3 "
    "(operators/dedup.py simhash_hamming_pairs, Manku et al. WWW 2007 "
    "pigeonhole probe): the 32-bit fingerprint splits into 4 segments; "
    "two fingerprints within distance 3 must agree on at least one "
    "segment, so bucketing per (segment, value) finds every qualifying "
    "pair — one shuffle, linear candidate generation — and exact "
    "popcount verifies. The oracle brute-forces all pairs with "
    "bit_count(xor) on the identical md5-mode fingerprints, so the "
    "probe's completeness (not just its precision) is under the hash "
    "gate. The opt-in hot-bucket cap is unit-tested; the gate runs "
    "uncapped for the exact differential.",
)
def doc_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return DD.simhash_hamming_pairs(
        d, "doc_id", "text", max_distance=3, bits=32, hash_mode="md5"
    )


# --------------------------------------------------------------------------
# Similarity search over `embeddings`
# --------------------------------------------------------------------------

_DIM = 64
_NQ = 8

# Shared self-gating shape for the ANN variants whose index step is not
# SQL-expressible (iterative k-means): cardinality is cross-engine, and
# recall@5 >= 0.5 is checked against the in-Spark brute-force twin —
# whose own results are fully hash-gated as emb_knn_brute.
_ANN_GATE_ORACLE = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(5 * count(*) AS BIGINT) AS n_results,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < {_NQ}
    """

# Clone-hardened variant (r7): the gate plants one exact-duplicate of
# every query vector in the corpus; all must be found, so
# n_planted_found == n_queries is part of the compared row.
_ANN_CLONE_GATE_ORACLE = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(5 * count(*) AS BIGINT) AS n_results,
           CAST(count(*) AS BIGINT) AS n_planted_found,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < {_NQ}
    """

_IVF_CLONE_OFFSET = 2_000_000


def _clone_queries(corpus: DataFrame, queries: DataFrame, offset: int) -> DataFrame:
    """One exact duplicate of every query vector under id
    ``query_id + offset`` — the planted ground truth of the ANN gates.

    Guards that the offset actually clears the corpus id space (ADVICE
    r7): on a larger fixture a clone id colliding with a real vec_id
    would SILENTLY corrupt the recall gates (a "planted hit" could be a
    real corpus vector). The max-id probe is one tiny agg job; failing
    loudly here beats a quietly meaningless green row."""
    max_id = corpus.agg(F.max("vec_id").alias("m")).first()["m"]
    if max_id is not None and max_id >= offset:
        raise AssertionError(
            f"planted-clone offset {offset} collides with the corpus "
            f"vec_id space (max vec_id = {max_id}); raise the offset"
        )
    return queries.select(
        (F.col("vec_id") + F.lit(offset)).alias("vec_id"), "embedding"
    )


def _ann_recall_gate(
    approx: DataFrame, exact: DataFrame, clone_offset: int | None = None
) -> DataFrame:
    """Cardinality + recall@5 gate row for an approximate top-k result
    vs its exact twin (both keyed (query_id, neighbor_id)).

    With ``clone_offset`` set, the gate ALSO counts planted-clone hits:
    the caller cloned every query vector into the corpus under id
    ``query_id + clone_offset`` — an exact duplicate has cosine 1.0, is
    assigned/bucketed exactly where its query probes first, and so MUST
    appear in the approximate result for every query. n_planted_found
    (Spark-counted) is compared against the oracle's literal query
    count — a probe-selection bug that invariants-only recall could
    miss fails this column outright."""
    # ONE pass over the approximate result: the former shape referenced
    # `approx` twice (stats agg + hits join), and Spark plans are trees
    # — the entire ANN pipeline (probe, rerank, windows) executed twice
    # per gate, and the hits join planned as a SortMergeJoin (two
    # exchanges + sorts) because the sides' size estimates come from
    # the big subtrees beneath them. The exact twin is bounded by
    # |queries|·k rows by construction, so it broadcasts as a hit
    # MARKER onto a left join instead: exact pairs are unique (ranked
    # top-k), so every approx row matches at most once and
    # count(_hit) == the former inner-join count, over the identical
    # approx row set (r15 plan diff: approx subtree 2x -> 1x,
    # SortMergeJoin -> BroadcastHashJoin, no crossJoin).
    marked = approx.select("query_id", "neighbor_id").join(
        F.broadcast(
            exact.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1))
        ),
        ["query_id", "neighbor_id"],
        "left",
    )
    aggs = [
        F.count_distinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_results"),
    ]
    if clone_offset is not None:
        aggs.append(
            F.sum(
                (F.col("neighbor_id") == F.col("query_id") + clone_offset).cast("long")
            ).alias("n_planted_found")
        )
    cols = ["n_queries", "n_results"]
    if clone_offset is not None:
        cols.append("n_planted_found")
    return (
        marked.agg(*aggs, F.count("_hit").alias("n_hits"))
        .select(
            *cols,
            (
                F.col("n_hits").cast("double") / F.col("n_results") >= F.lit(0.5)
            ).alias("recall_ok"),
        )
    )


@register(
    "emb_knn_brute",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {_NQ}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cvec FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             round({_cosine_sql('cvec', 'qvec', _DIM)}, 6) AS cos
      FROM c, q WHERE neighbor_id <> query_id
    ),
    r AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS "rank"
      FROM scored
    )
    SELECT * FROM r WHERE "rank" <= 5
    """,
    doc="Exact cosine top-k (operators/similarity.py brute_force_topk): "
    "queries broadcast, corpus streams in one narrow pass, per-query "
    "top-k via window row_number. Zero corpus shuffle.",
)
def emb_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(
        e, e.filter(F.col("vec_id") < _NQ), id_col="vec_id", vec_col="embedding", k=5
    )


def _lsh_topk_oracle(k: int, n_planes: int) -> str:
    sig = _lsh_sig_sql("embedding", n_planes, _DIM)
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << i})" for i in range(n_planes)])
    return f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL  -- the planted clones, exactly as the Spark gate unions them
      SELECT vec_id + {_IVF_CLONE_OFFSET}, embedding
      FROM embeddings WHERE vec_id < {_NQ}
    ),
    sig AS (SELECT vec_id, embedding, {sig} AS bucket FROM corpus),
    q AS (SELECT vec_id AS query_id, embedding AS qvec,
                 unnest([{probes}]) AS bucket2
          FROM sig WHERE vec_id < {_NQ}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cvec, bucket FROM sig),
    scored AS (
      SELECT DISTINCT query_id, neighbor_id,
             round({_cosine_sql('cvec', 'qvec', _DIM)}, 6) AS cos
      FROM c JOIN q ON c.bucket = q.bucket2
      WHERE neighbor_id <> query_id
    ),
    r AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS "rank"
      FROM scored
    )
    SELECT * FROM r WHERE "rank" <= {k}
    """


@register(
    "emb_lsh_topk",
    oracle=_lsh_topk_oracle(k=5, n_planes=4),
    doc="Approximate top-k (operators/similarity.py lsh_topk): sign-LSH "
    "bucketing (4 hyperplanes → 16 buckets) with Hamming-1 multi-probe, "
    "exact in-bucket cosine rerank. Corpus bucketed in one narrow map; "
    "queries broadcast — the IVF-style 100 TB scale path. The oracle "
    "inlines the same hyperplane literals. Clone-hardened (r9, queued "
    "since r7): every query vector is planted into the corpus under an "
    "offset id — an exact duplicate signs into the query's OWN bucket "
    "(Hamming-0 probe) with cosine 1.0, so it must surface at rank 1 "
    "for every query under the bit-exact hash oracle, which unions the "
    "identical clones; a multi-probe or bucketing bug that drops the "
    "query's own bucket now fails the hash, not just recall.",
)
def emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _NQ)
    aug = e.select("vec_id", "embedding").unionByName(
        _clone_queries(e, q, _IVF_CLONE_OFFSET)
    )
    return SIM.lsh_topk(
        aug, q,
        id_col="vec_id", vec_col="embedding", k=5, n_planes=4, dim=_DIM, seed=42,
    )


def _emb_near_dup_oracle(threshold: float, n_planes: int) -> str:
    sig = _lsh_sig_sql("embedding", n_planes, _DIM)
    cos = _cosine_sql("a.embedding", "b.embedding", _DIM)
    return f"""
    WITH sig AS (SELECT vec_id, embedding, {sig} AS bucket FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, {cos} AS raw
      FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT doc_a, doc_b, round(raw, 6) AS cosine
    FROM pairs WHERE raw >= {threshold}
    """


@register(
    "emb_near_dup_pairs",
    oracle=_emb_near_dup_oracle(threshold=0.4, n_planes=4),
    doc="Embedding-cosine near-dup pairs (operators/dedup.py "
    "embedding_near_duplicates): sign-LSH buckets bound the pairwise "
    "blow-up, exact in-bucket cosine ≥ 0.4.",
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return DD.embedding_near_duplicates(
        e, "vec_id", "embedding", threshold=0.4, n_planes=4, dim=_DIM, seed=42
    )


# --------------------------------------------------------------------------
# Multimodal plumbing (mapInPandas over real WAV/BMP/PPM byte decoding)
# --------------------------------------------------------------------------
#
# The media fixture is generated in-memory (no media table in the
# testdata), but every size/duration is a CLOSED-FORM integer function
# of the row index (multimodal.make_media_fixture docstring), so the
# DuckDB oracle recomputes the aggregates from range() arithmetic —
# a true differential check of the Spark side's byte-level encode →
# header parse → aggregate path: any drift in the writers or parsers
# breaks total_bytes / width / duration equality.

_MEDIA_STATS_ORACLE = """
WITH idx AS (SELECT i FROM range(0, 100) t(i)),
bmp AS (SELECT i, 8+(i%5) AS w, 6+(i%7) AS h FROM idx WHERE i%5=0),
wav AS (SELECT i, 1+(i%2) AS ch, 800+40*(i%10) AS fr FROM idx WHERE i%5=1),
ppm AS (SELECT i, 4+(i%4) AS w, 3+(i%6) AS h FROM idx WHERE i%5=2),
vid AS (SELECT i, 200+(i%7)*16 AS nb, 5000+100*i AS dur FROM idx WHERE i%5=3),
png AS (SELECT i, 5+(i%3) AS w, 4+(i%6) AS h FROM idx WHERE i%5=4)
SELECT 'bmp' AS format, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(54 + h*((3*w+3)//4*4)) AS BIGINT) AS total_bytes,
       CAST(count(*) AS BIGINT) AS n_from_header,
       CAST(SUM(w) AS BIGINT) AS sum_width,
       CAST(0 AS BIGINT) AS sum_duration_ms
FROM bmp
UNION ALL
SELECT 'wav', CAST(count(*) AS BIGINT), CAST(SUM(44 + fr*ch*2) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
       CAST(SUM(100 + 5*(i%10)) AS BIGINT)
FROM wav
UNION ALL
SELECT 'ppm', CAST(count(*) AS BIGINT), CAST(SUM(11 + 3*w*h) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(SUM(w) AS BIGINT), CAST(0 AS BIGINT)
FROM ppm
UNION ALL
SELECT 'mp4', CAST(count(*) AS BIGINT), CAST(SUM(nb) AS BIGINT),
       CAST(0 AS BIGINT), CAST(SUM(640) AS BIGINT), CAST(SUM(dur) AS BIGINT)
FROM vid
UNION ALL
SELECT 'png', CAST(count(*) AS BIGINT), CAST(SUM(68 + h*(3*w+1)) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(SUM(w) AS BIGINT), CAST(0 AS BIGINT)
FROM png
"""


@register(
    "media_feature_stats",
    oracle=_MEDIA_STATS_ORACLE,
    doc="REAL header-level media decode (operators/multimodal.py "
    "extract_media_meta): WAV/BMP/PPM/PNG width/height/duration/channels "
    "parsed from the binary column's bytes in an Arrow-batched "
    "mapInPandas (mp4 rows fall back to provided metadata), then "
    "per-format integer aggregation checked against a closed-form "
    "DuckDB oracle over the fixture's generator arithmetic (PNG sizes "
    "are closed-form because the fixture writes stored-block deflate: "
    "68 + h*(3w+1) bytes).",
)
def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.make_media_fixture(spark, n=100)
    meta = MM.extract_media_meta(media)
    return meta.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(
            F.when(F.col("meta_source") == "header", 1).otherwise(0)
        ).alias("n_from_header"),
        F.coalesce(F.sum("width"), F.lit(0)).cast("long").alias("sum_width"),
        F.coalesce(F.sum("duration_ms"), F.lit(0)).cast("long").alias("sum_duration_ms"),
    )


@register(
    "media_frame_plan",
    oracle="""
WITH vid AS (SELECT i, 5000+100*i AS dur FROM range(0, 100) t(i) WHERE i%5=3)
SELECT 'mp4' AS format, CAST(count(*) AS BIGINT) AS n_videos,
       CAST(SUM((dur-1)//1000 + 1) AS BIGINT) AS n_frames
FROM vid
""",
    doc="Video frame-sampling plan (operators/multimodal.py): one row per "
    "sampled frame timestamp from metadata duration — explode(sequence), "
    "no decode; oracle = closed-form frame counts from the fixture's "
    "duration arithmetic.",
)
def media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.make_media_fixture(spark, n=100)
    frames = MM.frame_sample_plan(media, every_ms=1000)
    return frames.groupBy(F.col("meta.format").alias("format")).agg(
        F.countDistinct("media_id").alias("n_videos"),
        F.count(F.lit(1)).alias("n_frames"),
    )


@register(
    "emb_ivf_topk",
    oracle=_ANN_CLONE_GATE_ORACLE,
    doc="IVF approximate top-k (operators/similarity.py ivf_topk): "
    "k-means coarse quantizer (16 clusters, seeded), 4-probe nearest-"
    "centroid search, exact in-cluster cosine rerank. Iterative k-means "
    "is not SQL-expressible, so the gate PLANTS its own ground truth "
    "(r7): every query vector is cloned into the corpus under an "
    "offset id — an exact duplicate lands in the cluster the query "
    "probes FIRST with cosine 1.0, so all clones MUST surface "
    "(n_planted_found == n_queries fails outright if probe selection "
    "breaks, which an invariants-only recall bound could miss). "
    "Cardinality is cross-engine and recall@5 ≥ 0.5 is checked against "
    "the in-Spark brute-force twin — whose own results are fully "
    "hash-gated as emb_knn_brute. Raw IVF neighbor lists are pinned in "
    "tests/test_llm_ops.py.",
)
def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < _NQ)
    aug = e.unionByName(_clone_queries(e, q, _IVF_CLONE_OFFSET))
    approx = SIM.ivf_topk(
        aug, q, id_col="vec_id", vec_col="embedding", k=5, n_clusters=16, n_probe=4, seed=42,
    )
    exact = SIM.brute_force_topk(aug, q, id_col="vec_id", vec_col="embedding", k=5)
    return _ann_recall_gate(approx, exact, clone_offset=_IVF_CLONE_OFFSET)


@register(
    "emb_ivf_largek",
    oracle=_ANN_CLONE_GATE_ORACLE,
    doc="IVF approximate top-k at LARGE k via the Arrow-batched "
    "assignment path (operators/similarity.py ivf_topk with "
    "assignment='batched' -> assign_clusters_batched): 64 clusters, "
    "16-probe search. The constant-folded HOF assignment pays "
    "whole-stage-codegen COMPILE time growing with k (minutes of "
    "Janino at k=64 — COVERAGE.md scale probes), so production IVF at "
    "k ≈ √N routes assignment through one numpy matmul per Arrow "
    "batch against a broadcast centroid matrix — no generated-code "
    "growth in k. Same planted-clone + cardinality + recall@5 gate as "
    "emb_ivf_topk, so the documented large-k path is driver-verified, "
    "not just agreement-tested (tests/test_llm_ops.py pins "
    "batched ≡ HOF assignment on separated data).",
)
def emb_ivf_largek(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < _NQ)
    aug = e.unionByName(_clone_queries(e, q, _IVF_CLONE_OFFSET))
    approx = SIM.ivf_topk(
        aug, q, id_col="vec_id", vec_col="embedding", k=5,
        n_clusters=64, n_probe=16, seed=42, assignment="batched",
    )
    exact = SIM.brute_force_topk(aug, q, id_col="vec_id", vec_col="embedding", k=5)
    return _ann_recall_gate(approx, exact, clone_offset=_IVF_CLONE_OFFSET)


@register(
    "emb_ivf_pruned",
    oracle=_ANN_GATE_ORACLE,
    doc="IVF index AT REST (operators/similarity.py write_ivf_index / "
    "ivf_topk_indexed): the cluster-assigned corpus written as parquet "
    "partitionBy(_cluster) with the centroids persisted alongside, then "
    "probed through a literal IN filter on the partition column — the "
    "probe scan lists only the probed clusters' files (PartitionFilters "
    "asserted in tests/test_plans.py). Same seed/params as emb_ivf_topk, "
    "so the same cardinality + recall@5 gate applies; the brute-force "
    "twin is fully hash-gated as emb_knn_brute.",
)
def emb_ivf_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _NQ)
    tmp = tempfile.mkdtemp(prefix="ccpd_ivf_")
    try:
        path = f"{tmp}/ivf_index"
        SIM.write_ivf_index(
            e, path, id_col="vec_id", vec_col="embedding", n_clusters=16, seed=42
        )
        approx = SIM.ivf_topk_indexed(
            spark, path, q, id_col="vec_id", vec_col="embedding", k=5, n_probe=4
        )
        exact = SIM.brute_force_topk(e, q, id_col="vec_id", vec_col="embedding", k=5)
        gate = _ann_recall_gate(approx, exact)
        # the index files vanish with the scratch dir — return data, not a plan
        return spark.createDataFrame(gate.collect(), gate.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "emb_pq_pruned",
    oracle=_ANN_GATE_ORACLE,
    doc="PQ index AT REST (operators/similarity.py write_pq_index / "
    "pq_topk_indexed): the codes table persisted as (id, codes) parquet "
    "— m small ints per vector, PQ's compression made real ON DISK: the "
    "candidate scan's ReadSchema carries no embedding column — with the "
    "full vectors in a second id-sorted table read only for the "
    "k·refine rerank ids through a pushed IN filter (both asserted in "
    "tests/test_plans.py). Same codebook/seed as emb_pq_topk, so the "
    "same cardinality + recall@5 gate applies; result parity with the "
    "in-memory pq_topk is pinned exactly in tests/test_llm_ops.py.",
)
def emb_pq_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _NQ)
    tmp = tempfile.mkdtemp(prefix="ccpd_pq_")
    try:
        path = f"{tmp}/pq_index"
        SIM.write_pq_index(
            e, path, id_col="vec_id", vec_col="embedding",
            dim=_DIM, m=16, ks=16, seed=42,
        )
        approx = SIM.pq_topk_indexed(
            spark, path, q, id_col="vec_id", vec_col="embedding", k=5, refine=8
        )
        exact = SIM.brute_force_topk(e, q, id_col="vec_id", vec_col="embedding", k=5)
        gate = _ann_recall_gate(approx, exact)
        # the index files vanish with the scratch dir — return data, not a plan
        return spark.createDataFrame(gate.collect(), gate.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "emb_ivfpq_pruned",
    oracle=_ANN_GATE_ORACLE,
    doc="IVF-PQ index AT REST (operators/similarity.py write_ivfpq_index "
    "/ ivfpq_topk_indexed) — the FAISS IVFADC+refine composition the two "
    "standalone indexes each lack half of: ONE parquet table "
    "partitionBy(_cluster), so the ADC candidate pass prunes COLUMNS to "
    "(id, codes) — m small ints per row, no vector bytes — while the "
    "exact rerank prunes PARTITIONS to the probed clusters; each query "
    "joins ONLY its probed clusters' codes (per-query _cluster join, "
    "not a cross join) and ranks by ADC through the salted two-phase "
    "top-k. Same cardinality + recall@5 gate as the other ANN rows; the "
    "brute-force twin is fully hash-gated as emb_knn_brute. "
    "PartitionFilters + codes-only ReadSchema asserted in "
    "tests/test_plans.py.",
)
def emb_ivfpq_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _NQ)
    tmp = tempfile.mkdtemp(prefix="ccpd_ivfpq_")
    try:
        path = f"{tmp}/ivfpq_index"
        SIM.write_ivfpq_index(
            e, path, id_col="vec_id", vec_col="embedding",
            n_clusters=16, m=16, ks=16, seed=42,
        )
        approx = SIM.ivfpq_topk_indexed(
            spark, path, q, id_col="vec_id", vec_col="embedding",
            k=5, n_probe=4, refine=8,
        )
        exact = SIM.brute_force_topk(e, q, id_col="vec_id", vec_col="embedding", k=5)
        gate = _ann_recall_gate(approx, exact)
        # the index files vanish with the scratch dir — return data, not a plan
        return spark.createDataFrame(gate.collect(), gate.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "doc_training_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             {_QUALITY} AS quality,
             CAST({_TOKCNT} AS BIGINT) AS n_tokens,
             {_FPRINT} AS f,
             len(list_filter({_TOKS}, t -> list_contains({_EN_SW}, t))) AS h_en
      FROM documents
    ),
    gated AS (SELECT * FROM scored WHERE h_en > 0 AND quality >= 0.3),
    keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY f)
    SELECT g.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(g.n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(CAST(g.quality AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS avg_quality
    FROM gated g JOIN keep USING (doc_id)
    GROUP BY g.source
    """,
    doc="The end-to-end training-data curation pipeline in one lazy plan: "
    "language gate (English stopword hits > 0) → quality gate (score ≥ "
    "0.3) → exact dedup (min-id per content fingerprint) → per-source "
    "corpus stats. Narrow maps into one fingerprint shuffle + one "
    "group-by; the shape that curates a 100 TB crawl.",
)
def doc_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    p = TX.text_profile(t)  # one tokenize pass for quality/counts/hits
    scored = d.select(
        "doc_id",
        "source",
        p["quality"].alias("quality"),
        p["n_tokens"].alias("n_tokens"),
        TX.fingerprint(t).alias("f"),
        p["en_hits"].cast("int").alias("h_en"),
    )
    gated = scored.filter((F.col("h_en") > 0) & (F.col("quality") >= 0.3))
    keep = gated.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
    kept = gated.join(keep, "doc_id", "left_semi")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        # decimal-routed sum: order-independent, exact across engines
        F.round(
            F.sum(F.col("quality").cast("decimal(25,6)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_quality"),
    )


# --------------------------------------------------------------------------
# Sequence packing / curriculum bucketing / PII scrubbing
# --------------------------------------------------------------------------

_PACK_BIN = 512  # tokens per context window (small so sf0.01 yields many bins)
_PACK_SHARDS = 8  # deterministic shards; packing is per (source, shard)


@register(
    "doc_pack_bins",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, doc_id % {_PACK_SHARDS} AS shard,
             CAST({_TOKCNT} AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
      FROM toks
    )
    SELECT source, CAST(shard AS BIGINT) AS shard,
           CAST(start_off // {_PACK_BIN} AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY source, shard, start_off // {_PACK_BIN}
    """,
    doc="GPT-style sequence packing accounting: documents are "
    "concatenated per (source, shard) in doc_id order and chunked into "
    f"{_PACK_BIN}-token context windows; each document is billed to the "
    "window containing its start offset (running token sum via a window "
    "function). The shard key (doc_id % 8) makes the running sum "
    "embarrassingly parallel — at 100 TB a single per-source running "
    "sum would serialize the partition; per-shard packing is how real "
    "pretraining pipelines keep the concat-and-chunk step linear. One "
    "shuffle on (source, shard), integer arithmetic end-to-end.",
)
def doc_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        TX.token_count(F.col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    packed = toks.withColumn("start_off", start).withColumn(
        # integer DIV, not float /: exact at any running-sum magnitude
        # (a double round-trip is only exact below 2^53) and identical
        # to the oracle's `//` for these non-negative offsets
        "bin_id", F.expr(f"start_off DIV {_PACK_BIN}")
    )
    return packed.groupBy("source", "shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


@register(
    "doc_quality_buckets",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, {_QUALITY} AS q FROM documents
    ),
    tiled AS (
      SELECT lang, q,
             ntile(3) OVER (PARTITION BY lang ORDER BY q NULLS LAST, doc_id) AS t
      FROM scored
    )
    SELECT lang,
           CASE t WHEN 3 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(q), 6) AS min_q,
           round(max(q), 6) AS max_q,
           round(CAST(SUM(CAST(q AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS avg_q
    FROM tiled
    GROUP BY lang, t
    """,
    doc="CCNet-style curriculum bucketing: per-language quality "
    "terciles (ntile over a deterministic (quality, doc_id) total "
    "order) labeled head/middle/tail — the split CCNet uses to keep "
    "head-quality web text and drop the tail. ntile needs a per-lang "
    "sort; at 100 TB the same cut points come from approx_percentile "
    "(documented scale path, same shape as approx_sketch_stats) "
    "instead of a full sort.",
)
def doc_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    p = TX.text_profile(F.col("text"))
    scored = d.select("doc_id", "lang", p["quality"].alias("q"))
    # explicit NULLS LAST on both sides: Spark's ASC default is NULLS
    # FIRST, DuckDB's is NULLS LAST — a NULL quality (NULL text) would
    # otherwise land in opposite terciles on the two engines
    t = F.ntile(3).over(
        Window.partitionBy("lang").orderBy(F.col("q").asc_nulls_last(), "doc_id")
    )
    tiled = scored.withColumn("t", t)
    bucket = (
        F.when(F.col("t") == 3, "head")
        .when(F.col("t") == 2, "middle")
        .otherwise("tail")
    )
    return (
        tiled.groupBy("lang", "t")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("q"), 6).alias("min_q"),
            F.round(F.max("q"), 6).alias("max_q"),
            F.round(
                F.sum(F.col("q").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_q"),
        )
        .select(
            "lang",
            bucket.alias("bucket"),
            "n_docs",
            "min_q",
            "max_q",
            "avg_q",
        )
    )


def _pii_inject_sql() -> str:
    """The deterministic PII-injection expression (DuckDB side). The
    synthetic corpus contains no PII, so the gate query injects
    synthetic addresses/numbers as a FUNCTION OF doc_id on both engines
    and verifies detection + redaction exactly — the scrub machinery is
    what's under test, the injection is part of the query spec."""
    return (
        "text"
        " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' call 312-555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
        " || CASE WHEN doc_id % 13 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.0.' || CAST(1 + doc_id % 254 AS VARCHAR) ELSE '' END"
    )


@register(
    "doc_pii_scrub",
    oracle=f"""
    WITH inj AS (
      SELECT doc_id, source, {_pii_inject_sql()} AS txt FROM documents
    ),
    per AS (
      SELECT source,
             len(regexp_extract_all(txt, '{TX.PII_PATTERNS["email"]}')) AS e,
             len(regexp_extract_all(txt, '{TX.PII_PATTERNS["ipv4"]}')) AS i,
             len(regexp_extract_all(txt, '{TX.PII_PATTERNS["phone"]}')) AS p,
             length(txt) - length(
               regexp_replace(regexp_replace(regexp_replace(txt,
                 '{TX.PII_PATTERNS["email"]}', '<PII>', 'g'),
                 '{TX.PII_PATTERNS["ipv4"]}', '<PII>', 'g'),
                 '{TX.PII_PATTERNS["phone"]}', '<PII>', 'g')) AS delta
      FROM inj
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(e) AS BIGINT) AS n_emails,
           CAST(SUM(i) AS BIGINT) AS n_ipv4,
           CAST(SUM(p) AS BIGINT) AS n_phones,
           CAST(SUM(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
           CAST(SUM(delta) AS BIGINT) AS chars_redacted
    FROM per GROUP BY source
    """,
    doc="C4/RefinedWeb-style PII redaction gate (functions/text.py "
    "pii_counts + scrub_pii): emails, IPv4s, and phone numbers are "
    "injected deterministically from doc_id (the synthetic corpus has "
    "none), then detected (regexp_count) and redacted "
    "(regexp_replace → '<PII>'), with per-source match counts and "
    "exact redacted-char deltas verified against the oracle. Patterns "
    "are restricted to Java-regex ∩ RE2 syntax. A narrow JVM-side map "
    "plus one group-by — the per-row shape that sweeps a 100 TB crawl.",
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    inj = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" call 312-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.concat(
                F.lit(" from 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                (1 + did % 254).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    base = d.select("source", inj.alias("txt"))
    c = TX.pii_counts(F.col("txt"))
    delta = F.length(F.col("txt")) - F.length(TX.scrub_pii(F.col("txt")))
    per = base.select(
        "source",
        c["email"].alias("e"),
        c["ipv4"].alias("i"),
        c["phone"].alias("p"),
        delta.cast("long").alias("delta"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("e").alias("n_emails"),
        F.sum("i").alias("n_ipv4"),
        F.sum("p").alias("n_phones"),
        F.sum(
            F.when(F.col("e") + F.col("i") + F.col("p") > 0, 1).otherwise(0)
        ).cast("long").alias("n_pii_docs"),
        F.sum("delta").alias("chars_redacted"),
    )


@register(
    "emb_pq_topk",
    oracle=_ANN_GATE_ORACLE,
    doc="Product-quantization approximate top-k (operators/similarity.py "
    "pq_topk): 16 per-subspace codebooks (4 dims × 16 centroids each, "
    "seeded k-means on a bounded driver sample) compress every corpus "
    "vector to 16 codes; queries broadcast with a per-query ADC lookup "
    "table so candidate scoring is 16 array lookups instead of a "
    "64-float loop; the top k·8 per query rerank by exact cosine "
    "(FAISS refine stage). Iterative k-means is not SQL-expressible, "
    "so the gate row checks result cardinality (cross-engine) and "
    "recall@5 ≥ 0.5 against the in-Spark brute-force twin — whose own "
    "results are fully hash-gated as emb_knn_brute. Raw recall is "
    "pinned in tests/test_llm_ops.py (0.9 at sf0.01, 0.75 at sf0.1).",
)
def emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _NQ)
    approx = SIM.pq_topk(
        e, q, id_col="vec_id", vec_col="embedding",
        k=5, dim=_DIM, m=16, ks=16, refine=8, seed=42,
    )
    exact = SIM.brute_force_topk(e, q, id_col="vec_id", vec_col="embedding", k=5)
    return _ann_recall_gate(approx, exact)


_CHUNK = 128  # tokens per chunk
_STRIDE = 96  # chunk stride (32-token overlap)


@register(
    "doc_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS} AS t,
             CAST({_TOKCNT} AS BIGINT) AS n_tokens
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, source, n_tokens,
             unnest(range(0, CASE WHEN n_tokens = 0 THEN 0
                    ELSE 1 + (greatest(n_tokens - {_CHUNK}, 0) + {_STRIDE} - 1) // {_STRIDE}
                    END)) AS ci,
             t
      FROM toks
    ),
    per_chunk AS (
      SELECT source,
             len(list_slice(t, ci * {_STRIDE} + 1, ci * {_STRIDE} + {_CHUNK})) AS chunk_tokens,
             {_H32.format(s=f"array_to_string(list_slice(t, ci * {_STRIDE} + 1, ci * {_STRIDE} + {_CHUNK}), ' ')")} AS h
      FROM chunks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(SUM(chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
           CAST(SUM(CASE WHEN chunk_tokens = {_CHUNK} THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
           CAST(SUM(h) AS BIGINT) AS chunk_checksum
    FROM per_chunk GROUP BY source
    """,
    doc="RAG/pretraining document chunking with overlap: each document "
    f"splits into {_CHUNK}-token windows every {_STRIDE} tokens "
    f"({_CHUNK - _STRIDE}-token overlap, the sliding-window chunking "
    "long-context pipelines use so no boundary sentence is lost). "
    "Chunk indices come from one explode(sequence) per doc — rows "
    "scale with chunks, not chunks x tokens — and the md5-derived "
    "checksum over every chunk's reassembled text pins the actual "
    "chunk CONTENT cross-engine, not just the counts. A narrow map + "
    "one explode + one group-by; embarrassingly parallel at any scale.",
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        TX.tokens(F.col("text")).alias("t"),
        TX.token_count(F.col("text")).alias("n_tokens"),
    ).withColumn(
        # 1 + ceil((n - chunk)/stride): windows stop once one reaches
        # the doc end — the naive ceil(n/stride) emits a tail window
        # whose content is entirely inside the previous one whenever
        # n mod stride <= overlap
        "nc",
        F.expr(
            f"CASE WHEN n_tokens = 0 THEN 0 ELSE "
            f"1 + (greatest(n_tokens - {_CHUNK}, 0) + {_STRIDE} - 1) DIV {_STRIDE} END"
        ),
    )
    chunks = toks.select(
        "source",
        "t",
        F.explode(
            # guard: sequence(0, -1) would DESCEND, not be empty
            F.when(F.col("nc") > 0, F.sequence(F.lit(0), F.col("nc") - 1))
            .otherwise(F.array().cast("array<int>"))
        ).alias("ci"),
    )
    sl = F.slice(F.col("t"), F.col("ci") * _STRIDE + 1, _CHUNK)
    per_chunk = chunks.select(
        "source",
        F.size(sl).cast("long").alias("chunk_tokens"),
        TX.hash32(F.concat_ws(" ", sl)).alias("h"),
    )
    return per_chunk.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_tokens").alias("sum_chunk_tokens"),
        F.sum(F.when(F.col("chunk_tokens") == _CHUNK, 1).otherwise(0))
        .cast("long")
        .alias("n_full"),
        F.sum("h").alias("chunk_checksum"),
    )


@register(
    "doc_quality_regression",
    oracle=f"""
    WITH pts AS (
      SELECT source,
             CAST(CAST({_TOKCNT} AS BIGINT) AS DECIMAL(25,6)) AS x,
             CAST({_QUALITY} AS DECIMAL(25,6)) AS y
      FROM documents
    ),
    mom AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts GROUP BY source
    )
    SELECT source, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / n, 6) AS intercept
    FROM mom
    """,
    doc="Per-source OLS regression of quality on token count, computed "
    "from EXACT decimal moments (n, Σx, Σy, Σxy, Σx²) so the slope and "
    "intercept are order-independent and bit-identical across engines "
    "— the built-in regr_slope/regr_intercept fold doubles in "
    "engine-specific order and were deliberately bypassed. One "
    "group-by; the moments are mergeable partials, so the same "
    "expression incrementalizes (see incremental_agg_merge) and "
    "distributes at any scale. The corpus-curation use: a source "
    "whose quality DROPS with length is boilerplate-padded.",
)
def doc_quality_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    p = TX.text_profile(F.col("text"))
    pts = d.select(
        "source",
        p["n_tokens"].cast("decimal(25,6)").alias("x"),
        p["quality"].cast("decimal(25,6)").alias("y"),
    )
    mom = pts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope_d = (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx).cast("double")
    return mom.select(
        "source",
        "n",
        F.round(slope_d, 6).alias("slope"),
        F.round((sy.cast("double") - slope_d * sx.cast("double")) / n, 6).alias(
            "intercept"
        ),
    )


# --------------------------------------------------------------------------
# Corpus curation gates (operators/curation.py + dedup.semantic_dedup)
# --------------------------------------------------------------------------

from ..operators import curation as CU  # noqa: E402


@register(
    "doc_cap_per_source",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE rn <= 5
    """,
    doc="Per-source cap (operators/curation.py cap_per_key): at most 5 "
    "docs per source under the explicit (n_chars desc, doc_id asc) "
    "priority. The gate runs the TWO-PHASE skew-safe variant (salts=8: "
    "content-hash salted per-bucket top-k, then the exact per-key "
    "window — no task ever windows a hot source's full population), "
    "which is provably identical to the single-phase cap the oracle's "
    "row_number expresses; full row-level hash differential.",
)
def doc_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return CU.cap_per_key(
        d, "source", 5,
        order_by=[F.desc("n_chars"), F.asc("doc_id")],
        salts=8,
    )


@register(
    "doc_strip_boilerplate",
    oracle="""
    WITH lines AS (
      SELECT doc_id, source, unnest(string_split(text, chr(10))) AS line
      FROM documents
    ),
    grp AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    df AS (
      SELECT source, line, count(DISTINCT doc_id) AS d
      FROM lines WHERE trim(line) <> '' GROUP BY source, line
    ),
    boiler AS (
      SELECT df.source, df.line FROM df JOIN grp USING (source)
      WHERE grp.n_docs >= 3 AND df.d >= grp.n_docs * 0.5
    ),
    kept AS (
      SELECT l.doc_id, l.source, l.line FROM lines l
      WHERE NOT EXISTS (SELECT 1 FROM boiler b
                        WHERE b.source = l.source AND b.line = l.line)
    ),
    doc_after AS (
      SELECT d.doc_id, d.source,
             COALESCE(SUM(length(k.line)), 0)
             + CASE WHEN count(k.line) > 0 THEN count(k.line) - 1 ELSE 0 END
               AS chars_after
      FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id
      GROUP BY d.doc_id, d.source
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(chars_after) AS BIGINT) AS chars_after
    FROM doc_after GROUP BY source
    """,
    doc="CCNet-style boilerplate stripping (operators/curation.py "
    "strip_boilerplate_lines): non-blank lines appearing (once per "
    "doc) in >= 50% of a >= 3-doc source are removed; texts "
    "reassemble in original line order via posexplode -> broadcast "
    "anti-join -> position-sorted regroup. The oracle recomputes each "
    "stripped text's LENGTH from line arithmetic (kept line chars + "
    "inter-line newlines), so reassembly itself is under the hash "
    "gate, per source.",
)
def doc_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    stripped = CU.strip_boilerplate_lines(
        d, "doc_id", "text", "source", min_docs=3, frac=0.5
    )
    return stripped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("chars_after"),
    )


@register(
    "doc_curation_pipeline",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id, source,
             unnest(string_split(text, chr(10))) AS line,
             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      FROM documents
    ),
    grp AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    dfq AS (
      SELECT source, line, count(DISTINCT doc_id) AS d
      FROM lines WHERE trim(line) <> '' GROUP BY source, line
    ),
    boiler AS (
      SELECT dfq.source, dfq.line FROM dfq JOIN grp USING (source)
      WHERE grp.n_docs >= 3 AND dfq.d >= grp.n_docs * 0.5
    ),
    keptl AS (
      SELECT l.doc_id, l.line, l.pos FROM lines l
      WHERE NOT EXISTS (SELECT 1 FROM boiler b
                        WHERE b.source = l.source AND b.line = l.line)
    ),
    rebuilt AS (
      SELECT d.doc_id, d.source,
             CASE WHEN d.text IS NULL THEN NULL
                  ELSE COALESCE(string_agg(k.line, chr(10) ORDER BY k.pos), '')
             END AS text
      FROM documents d LEFT JOIN keptl k ON k.doc_id = d.doc_id
      GROUP BY d.doc_id, d.source, d.text
    ),
    uniq AS (
      SELECT doc_id, source, text FROM (
        SELECT *, row_number() OVER (PARTITION BY {_FPRINT}
                                     ORDER BY doc_id) AS rn
        FROM rebuilt) WHERE rn = 1
    ),
    capped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY source
                 ORDER BY length(text) DESC, doc_id ASC) AS rn
        FROM uniq) WHERE rn <= 10
    ),
    toks AS (
      SELECT source, doc_id, length(text) AS chars,
             CAST({_TOKCNT} AS BIGINT) AS n_tokens
      FROM capped
    ),
    packedc AS (
      SELECT source, doc_id, chars, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
      FROM toks
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(chars) AS BIGINT) AS chars_total,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT start_off // {_PACK_BIN}) AS BIGINT) AS n_windows
    FROM packedc GROUP BY source
    """,
    doc="END-TO-END curation chain under ONE oracle — strip boilerplate "
    "(strip_boilerplate_lines) -> exact dedup on the STRIPPED text "
    "(dedup_exact keep-min-id; stripping first is what makes docs that "
    "differed only in nav chrome collapse) -> per-source cap of 10 "
    "under the (stripped length desc, doc_id asc) priority "
    "(cap_per_key, two-phase salted) -> sequence packing of the "
    f"survivors into {_PACK_BIN}-token context windows (running token "
    "sum, the doc_pack_bins operator as the pipeline's LAST stage — "
    "reference-scale pipelines ship packed sequences, not capped docs) "
    "-> per-source survivor + packing stats. Each stage is "
    "individually gated (doc_strip_boilerplate, "
    "doc_dedup_exact_by_source, doc_cap_per_source, doc_pack_bins); "
    "this gate proves the COMPOSITION: sum_ids pins the exact survivor "
    "id-set per source and n_windows/total_tokens pin the packed "
    "layout over them, so a drift in any stage interaction (e.g. dedup "
    "seeing unstripped text, packing seeing pre-cap docs) flips the "
    "row hash. The oracle rebuilds stripped texts via position-ordered "
    "string_agg (preserving NULL input texts as NULL — mirroring "
    "strip_boilerplate_lines' r6 NULL semantics, so a NULL-text "
    "fixture row would exercise, not mask, that path) and chains the "
    "same four stages in SQL.",
)
def doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    stripped = CU.strip_boilerplate_lines(
        d, "doc_id", "text", "source", min_docs=3, frac=0.5
    )
    # NO stage-boundary materialization since r7: dedup_exact is one
    # row_number window (single input reference) and cap_per_key /
    # packing are sequential windows, so the whole chain downstream of
    # strip is LINEAR — the strip subtree appears exactly once in the
    # final plan (asserted in test_plans) and Catalyst prunes/pushes
    # through the entire composite. The r6 shape needed
    # localCheckpoint(eager=True) because the keep-set semi-join
    # re-ran the strip subtree per branch; dropping it also stops
    # checkpoint blocks from occupying storage memory for the rest of
    # a long-lived session.
    deduped = DD.dedup_exact(stripped, "doc_id", "text")
    capped = CU.cap_per_key(
        deduped, "source", 10,
        order_by=[F.desc(F.length("text")), F.asc("doc_id")],
        salts=8,
    )
    # Final stage: pack the survivors into _PACK_BIN-token context
    # windows (doc_pack_bins' running-sum shape). Survivors are capped
    # at 10/source, so a per-source running sum is exact AND bounded
    # here; the production-scale sharded variant is gated separately
    # as doc_pack_bins.
    from pyspark.sql import Window

    toks = capped.select(
        "source",
        "doc_id",
        F.length("text").alias("chars"),
        TX.token_count(F.col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn("bin_id", F.expr(f"start_off DIV {_PACK_BIN}"))
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("chars").alias("chars_total"),
        F.sum("doc_id").alias("sum_ids"),
        F.sum("n_tokens").alias("total_tokens"),
        F.count_distinct("bin_id").alias("n_windows"),
    )


_SEM_CLONES = 10  # planted exact-duplicate vectors (see gate doc)
_SEM_CLONE_OFFSET = 1_000_000


@register(
    "emb_semantic_dedup",
    oracle=f"""
    SELECT CAST(count(*) + {_SEM_CLONES} AS BIGINT) AS n_total,
           CAST(count(DISTINCT embedding) AS BIGINT) AS n_distinct_vec,
           CAST({_SEM_CLONES} AS BIGINT) AS n_planted_dropped,
           TRUE AS kept_nonempty, TRUE AS kept_le_distinct, TRUE AS kept_ids_unique
    FROM embeddings
    """,
    doc="SemDeDup (operators/dedup.py semantic_dedup, Abbas et al. "
    "2023): k-means clusters the embedding space (bounded driver-"
    "sample quantizer, one narrow assignment map), capped in-cluster "
    "cosine >= 0.99 drops the larger id of each semantic near-dup "
    "pair. Iterative k-means is not SQL-expressible, so the gate "
    "PLANTS its own ground truth: the 10 lowest-id vectors are cloned "
    "under offset ids — exact duplicates are semantic dups at ANY "
    "threshold, land in their original's cluster deterministically, "
    "and must ALL be dropped (keep-min-id). n_planted_dropped (Spark-"
    "counted) must equal the oracle's literal 10, and n_kept must stay "
    "<= the cross-engine count(DISTINCT embedding) — both FAIL if "
    "thresholding silently stops working, which the r5 invariants-only "
    "gate could not detect. Raw keep-min semantics remain pinned in "
    "tests/test_llm_ops.py.",
)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = (
        e.orderBy("vec_id")
        .limit(_SEM_CLONES)
        .select(
            (F.col("vec_id") + F.lit(_SEM_CLONE_OFFSET)).alias("vec_id"),
            "embedding",
        )
    )
    aug = e.unionByName(clones)
    kept = DD.semantic_dedup(
        aug, "vec_id", "embedding", n_clusters=16, threshold=0.99, seed=42,
        # explicit: the gate must never silently skip a cluster — the
        # planted-clone guarantee depends on every cluster being paired
        max_cluster=100_000,
    )
    stats = kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.count_distinct("vec_id").alias("n_kept_ids"),
        F.sum((F.col("vec_id") >= _SEM_CLONE_OFFSET).cast("long")).alias(
            "n_planted_kept"
        ),
    )
    totals = aug.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_distinct("embedding").alias("n_distinct_vec"),
    )
    return totals.crossJoin(stats).select(
        "n_total",
        "n_distinct_vec",
        (F.lit(_SEM_CLONES) - F.col("n_planted_kept")).cast("long").alias(
            "n_planted_dropped"
        ),
        (F.col("n_kept") > 0).alias("kept_nonempty"),
        (F.col("n_kept") <= F.col("n_distinct_vec")).alias("kept_le_distinct"),
        (F.col("n_kept_ids") == F.col("n_kept")).alias("kept_ids_unique"),
    )


# --------------------------------------------------------------------------
# r12 registrations — the at-rest incremental family under the driver's
# hard differential (VERDICT r11 item 1: the registration debt). Each
# gate stages its scratch table/index inside a tempdir, runs the
# cross-run probe / maintenance path, asserts its planted ground truth
# in-gate, and returns data the oracle reproduces independently.
# --------------------------------------------------------------------------


def _exact_against_oracle(clone_offset: int) -> str:
    """DuckDB twin of write_fingerprints + dedup_exact_against over the
    family's corpus/batch split: survivors are the batch docs whose
    normalized-content md5 does not appear among the corpus
    fingerprints. NOT EXISTS, not NOT IN — a NULL-text doc has a NULL
    fingerprint, never equal to anything in either engine, so it
    always survives (Spark's left_anti has the same null-key
    semantics)."""
    return f"""
    WITH corpus AS (
      SELECT {_FPRINT} AS f FROM documents WHERE doc_id % 5 <> 0
    ),
    batch_docs AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + {clone_offset} AS doc, text FROM documents
      WHERE doc_id % 5 <> 0 AND doc_id % 50 = 1
    ),
    bf AS (SELECT doc, {_FPRINT} AS f FROM batch_docs)
    SELECT doc AS doc_id FROM bf b
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.f = b.f)
    """


@register(
    "doc_exact_against_corpus",
    oracle=_exact_against_oracle(_AGAINST_CLONE_OFFSET),
    doc="Cross-run EXACT dedup against fingerprints AT REST "
    "(operators/dedup.py write_fingerprints / dedup_exact_against): the "
    "corpus persists one (doc, md5-of-normalized-text) row per document, "
    "partitionBy(part = hash(fingerprint) % parts); the batch prunes the "
    "corpus scan to its own fingerprint partitions, LEFT-SEMI joins the "
    "BROADCAST batch (the corpus side never shuffles — a plain batch-"
    "LEFT-ANTI-corpus would shuffle the 100 TB side), then anti-joins "
    "the tiny hit set. Gate: batch = held-out 20% plus exact clones of "
    "corpus docs under new ids; every planted clone must drop (raised "
    "in-gate) and the survivor set must hash-match the oracle's "
    "NOT-EXISTS replay.",
)
def doc_exact_against_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    clones = corpus.filter(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + _AGAINST_CLONE_OFFSET).alias("doc_id"), "text"
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).unionByName(clones)
    tmp = tempfile.mkdtemp(prefix="ccpd_xfps_")
    try:
        path = f"{tmp}/fps"
        DD.write_fingerprints(corpus, path, "doc_id", "text", parts=16)
        surv = DD.dedup_exact_against(batch, path, "doc_id", "text").select("doc_id")
        rows = surv.collect()
        survived = {r.doc_id for r in rows}
        planted = {r.doc_id for r in clones.select("doc_id").collect()}
        leaked = sorted(survived & planted)
        if leaked:
            raise AssertionError(
                f"planted exact clones survived cross-run dedup: {leaked}"
            )
        if not planted:
            raise AssertionError("no clones planted — gate is vacuous")
        # the fingerprint files vanish with the scratch dir — return data
        return spark.createDataFrame(rows, surv.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _simhash_against_oracle(bits: int, max_distance: int, clone_offset: int) -> str:
    """DuckDB twin of write_simhash_index + simhash_near_duplicates_against:
    md5-mode SimHash fingerprints for the corpus and batch sides computed
    independently, then BRUTE-FORCE joined on popcount(xor) <= d. The
    Spark side's Manku pigeonhole segment index is complete for any
    distance <= its segmentation and precision-filtered by the same
    exact popcount — so segment-probe == brute force, and the oracle
    checks completeness AND precision at once."""
    bsums = ", ".join(
        f"list_sum(list_transform(hvals, h -> CASE WHEN (h >> {i}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) AS b{i}"
        for i in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    )
    return f"""
    WITH cdocs AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id % 5 <> 0
    ),
    bdocs AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + {clone_offset} AS doc, text FROM documents
      WHERE doc_id % 5 <> 0 AND doc_id % 50 = 1
    ),
    chv AS (SELECT doc, list_transform({_TOKS}, t -> {_H32.format(s='t')}) AS hvals
            FROM cdocs),
    cbs AS (SELECT doc, {bsums} FROM chv),
    cfp AS (SELECT doc, CAST({fp} AS BIGINT) AS simhash FROM cbs),
    bhv AS (SELECT doc, list_transform({_TOKS}, t -> {_H32.format(s='t')}) AS hvals
            FROM bdocs),
    bbs AS (SELECT doc, {bsums} FROM bhv),
    bfp AS (SELECT doc, CAST({fp} AS BIGINT) AS simhash FROM bbs)
    SELECT c.doc AS corpus_doc, b.doc AS batch_doc,
           CAST(bit_count(xor(c.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM cfp c JOIN bfp b
      ON bit_count(xor(c.simhash, b.simhash)) <= {max_distance}
    """


@register(
    "doc_simhash_against_corpus",
    oracle=_simhash_against_oracle(
        bits=32, max_distance=3, clone_offset=_AGAINST_CLONE_OFFSET
    ),
    doc="Cross-run SimHash near-dup probe against the segment index AT "
    "REST (operators/dedup.py write_simhash_index / "
    "simhash_near_duplicates_against): the corpus fingerprints persist "
    "pre-exploded into Manku pigeonhole segments, partitionBy(part = "
    "hash(seg, val) % parts); the batch segments itself under the "
    "INDEX's pinned params, prunes the corpus scan to its own segment "
    "partitions, broadcast-joins on (seg, val) and verifies candidates "
    "by exact popcount of the XOR. The oracle brute-forces ALL "
    "corpus x batch pairs at the same distance — completeness (the "
    "pigeonhole guarantee) and precision (the popcount filter) are "
    "both under the differential. Gate: planted clones of corpus docs "
    "must surface at hamming 0 (raised in-gate).",
)
def doc_simhash_against_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    clones = corpus.filter(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + _AGAINST_CLONE_OFFSET).alias("doc_id"), "text"
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).unionByName(clones)
    tmp = tempfile.mkdtemp(prefix="ccpd_xsim_")
    try:
        path = f"{tmp}/simhash"
        DD.write_simhash_index(
            corpus, path, "doc_id", "text",
            max_distance=3, bits=32, hash_mode="md5", parts=16,
        )
        pairs = DD.simhash_near_duplicates_against(batch, path, "doc_id", "text")
        rows = pairs.collect()
        got = {(r.corpus_doc, r.batch_doc): r.hamming for r in rows}
        planted = [r.doc_id for r in clones.select("doc_id").collect()]
        missed = [
            b for b in planted if got.get((b - _AGAINST_CLONE_OFFSET, b)) != 0
        ]
        if not planted:
            raise AssertionError("no clones planted — gate is vacuous")
        if missed:
            raise AssertionError(
                f"planted clones not found at hamming 0 by the segment probe: {missed}"
            )
        # the segment files vanish with the scratch dir — return data
        return spark.createDataFrame(rows, pairs.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _ingest_round_oracle(
    num_hashes: int,
    bands: int,
    shingle_n: int,
    seed: int,
    threshold: float,
    max_bucket: int,
    clone_offset: int,
) -> str:
    """DuckDB twin of the ENTIRE minhash_ingest_round survivor policy:
    (1) cross pairs — the corpus banded with its write-time bucket
    sizes (hot cap on the corpus side only, exactly
    near_duplicates_against's scan-side filter) joined to the freshly
    banded batch; (2) within-batch pairs — the batch banded against
    itself with the hot cap applied to batch-local bucket sizes,
    exactly minhash_near_duplicates; (3) connected components over the
    union edge graph via a recursive CTE; (4) the INGEST policy: every
    component containing corpus content drops ALL its batch members
    (already-ingested wins, transitively), a corpus-free component
    keeps exactly its minimum batch member. Survivors are the batch
    docs not dropped."""
    rows = num_hashes // bands
    params = DD._hash_params(num_hashes, seed)
    mins = ", ".join(
        f"list_min(list_transform(hvals, h -> ((h % {_P31}) * {a} + {b}) % {_P31}))"
        for a, b in params
    )

    def banded(sig_cte: str) -> str:
        selects = []
        for i in range(bands):
            cols = ", ".join(f"signature[{i * rows + j + 1}]" for j in range(rows))
            selects.append(
                f"SELECT doc, {i} AS band, concat_ws('_', {cols}) AS bucket "
                f"FROM {sig_cte}"
            )
        return " UNION ALL ".join(selects)

    est = (
        f"CAST(len(list_filter(range(1, {num_hashes} + 1), "
        f"i -> sa.signature[i] = sb.signature[i])) AS DOUBLE) / {num_hashes}"
    )
    return f"""
    WITH RECURSIVE corpus_docs AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id % 5 <> 0
    ),
    batch_docs AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + {clone_offset} AS doc, text FROM documents
      WHERE doc_id % 5 <> 0 AND doc_id % 50 = 1
    ),
    csh AS (SELECT doc, {_shingles_sql(shingle_n)} AS shingles FROM corpus_docs),
    chv AS (SELECT doc, list_transform(shingles, s -> {_H32.format(s='s')}) AS hvals FROM csh),
    csig AS (SELECT doc, [{mins}] AS signature FROM chv),
    bsh AS (SELECT doc, {_shingles_sql(shingle_n)} AS shingles FROM batch_docs),
    bhv AS (SELECT doc, list_transform(shingles, s -> {_H32.format(s='s')}) AS hvals FROM bsh),
    bsig AS (SELECT doc, [{mins}] AS signature FROM bhv),
    cbanded0 AS ({banded('csig')}),
    chot AS (SELECT band, bucket FROM cbanded0
             GROUP BY band, bucket HAVING count(*) > {max_bucket}),
    cbanded AS (SELECT b.* FROM cbanded0 b
                WHERE NOT EXISTS (SELECT 1 FROM chot h
                                  WHERE h.band = b.band AND h.bucket = b.bucket)),
    bbanded0 AS ({banded('bsig')}),
    bhot AS (SELECT band, bucket FROM bbanded0
             GROUP BY band, bucket HAVING count(*) > {max_bucket}),
    bbanded AS (SELECT b.* FROM bbanded0 b
                WHERE NOT EXISTS (SELECT 1 FROM bhot h
                                  WHERE h.band = b.band AND h.bucket = b.bucket)),
    cross_cand AS (
      SELECT DISTINCT c.doc AS corpus_doc, b.doc AS batch_doc
      FROM cbanded c JOIN bbanded0 b USING (band, bucket)
      WHERE NOT EXISTS (SELECT 1 FROM chot h
                        WHERE h.band = c.band AND h.bucket = c.bucket)
    ),
    cross_pairs AS (
      SELECT corpus_doc, batch_doc FROM cross_cand
      JOIN csig sa ON sa.doc = corpus_doc
      JOIN bsig sb ON sb.doc = batch_doc
      WHERE {est} >= {threshold}
    ),
    within_cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM bbanded a JOIN bbanded b USING (band, bucket)
      WHERE a.doc < b.doc
    ),
    within_pairs AS (
      SELECT doc_a, doc_b FROM within_cand
      JOIN bsig sa ON sa.doc = doc_a
      JOIN bsig sb ON sb.doc = doc_b
      WHERE {est} >= {threshold}
    ),
    edges AS (
      SELECT corpus_doc AS a, batch_doc AS b FROM cross_pairs
      UNION SELECT batch_doc, corpus_doc FROM cross_pairs
      UNION SELECT doc_a, doc_b FROM within_pairs
      UNION SELECT doc_b, doc_a FROM within_pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
    tainted AS (
      SELECT DISTINCT c.comp FROM comp c
      JOIN (SELECT DISTINCT corpus_doc FROM cross_pairs) x ON c.node = x.corpus_doc
    ),
    clustered AS (
      SELECT c.node, c.comp FROM comp c
      JOIN batch_docs b ON c.node = b.doc
    ),
    keep AS (
      SELECT min(node) AS node FROM clustered c
      WHERE NOT EXISTS (SELECT 1 FROM tainted t WHERE t.comp = c.comp)
      GROUP BY comp
    ),
    dropped AS (
      SELECT node FROM clustered c
      WHERE NOT EXISTS (SELECT 1 FROM keep k WHERE k.node = c.node)
    )
    SELECT doc AS doc_id FROM batch_docs b
    WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.node = b.doc)
    """


_ROUND_SIG = dict(num_hashes=32, bands=8, shingle_n=3, seed=42, hash_mode="md5")


@register(
    "doc_ingest_round",
    oracle=_ingest_round_oracle(
        num_hashes=32, bands=8, shingle_n=3, seed=42, threshold=0.5,
        max_bucket=1000, clone_offset=_AGAINST_CLONE_OFFSET,
    ),
    doc="ONE ingest round of cross-run dedup as one call "
    "(operators/dedup.py minhash_ingest_round — the highest-frequency "
    "user path of the at-rest family, VERDICT r11 item 1): probe the "
    "batch against the corpus signatures AT REST (corpus text never "
    "read, scan pruned to the batch's bucket partitions), probe the "
    "batch against itself under the TABLE's pinned params, apply the "
    "INGEST survivor policy (corpus always wins — transitively: a "
    "batch doc chained to the corpus only through other batch docs "
    "drops too; corpus-free components keep their min member), append "
    "only the survivors' signatures. The oracle replays the WHOLE "
    "round in SQL: both band-bucket joins with their hot-bucket caps, "
    "a recursive-CTE connected components over the union edge graph, "
    "and the survivor policy. Gate: every planted clone of an ingested "
    "doc must drop (raised in-gate); the survivor id set hash-matches "
    "the replay.",
)
def doc_ingest_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    clones = corpus.filter(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + _AGAINST_CLONE_OFFSET).alias("doc_id"), "text"
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).unionByName(clones)
    tmp = tempfile.mkdtemp(prefix="ccpd_round_")
    t = _PhaseTimer("doc_ingest_round")
    try:
        path = f"{tmp}/sigs"
        DD.write_minhash_signatures(
            corpus, path, "doc_id", "text", parts=16, **_ROUND_SIG
        )
        t.lap("corpus_signature_build")
        rep = DD.minhash_ingest_round(
            batch, path, "doc_id", "text", threshold=0.5, max_bucket=1000
        )
        # the round reports its own per-step split — surface it in the
        # gate's phase notes instead of one opaque "round" lap
        for step, s in rep["secs"].items():
            t.secs[f"round_{step}"] = s
        t.lap("round_total")
        surv = rep["survivors"].select("doc_id")
        rows = surv.collect()
        t.lap("survivor_collect_and_asserts")
        survived = {r.doc_id for r in rows}
        planted = {r.doc_id for r in clones.select("doc_id").collect()}
        leaked = sorted(survived & planted)
        if leaked:
            raise AssertionError(f"planted clones survived the ingest round: {leaked}")
        if not planted:
            raise AssertionError("no clones planted — gate is vacuous")
        if rep["n_cross_pairs"] < len(planted):
            raise AssertionError(
                f"only {rep['n_cross_pairs']} cross pairs for {len(planted)} "
                "planted clones — the corpus probe missed plants"
            )
        if rep["n_survivors"] == 0:
            raise AssertionError("round dropped everything — gate is vacuous")
        # the signature table vanishes with the scratch dir — return data
        return spark.createDataFrame(rows, surv.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "doc_cc_extend",
    oracle=f"""
    WITH RECURSIVE {_jaccard_ctes(3, 1000)},
    jp AS (
      SELECT doc_a, doc_b
      FROM pairs
      JOIN sizes sa ON sa.doc = doc_a
      JOIN sizes sb ON sb.doc = doc_b
      WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
    ),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM jp
              UNION SELECT doc_b AS a, doc_a AS b FROM jp),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    )
    SELECT node, min(comp) AS comp FROM reach GROUP BY node
    """,
    doc="Incremental connected components AT REST (operators/graph.py "
    "write_components / extend_components_at_rest — VERDICT r11 item 1, "
    "the extend gate): the corpus-only near-dup clusters persist "
    "comp-hash-partitioned, then one ingest round's NEW edges (every "
    "exact-Jaccard pair touching a held-out doc) fold in by rewriting "
    "ONLY the touched components' partitions — touched comps from one "
    "column-pruned corpus pass, members re-read partition-pruned, "
    "dynamic partition overwrite with foreign-partition riders carried. "
    "EXACT by the star-graph property. The oracle recomputes components "
    "over the FULL edge union via a recursive-CTE transitive closure — "
    "the incremental result must hash-match a from-scratch recompute; "
    "the same equality is also asserted in-gate against the Spark "
    "full-union twin so a divergence names the side that moved.",
)
def doc_cc_extend(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.graph import (
        connected_components,
        extend_components_at_rest,
        read_components,
        write_components,
    )

    d = load(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, max_bucket=1000, hash_mode="md5"
    ).select("doc_a", "doc_b")
    base = pairs.filter((F.col("doc_a") % 5 != 0) & (F.col("doc_b") % 5 != 0))
    delta = pairs.filter((F.col("doc_a") % 5 == 0) | (F.col("doc_b") % 5 == 0))
    if delta.limit(1).count() == 0:
        raise AssertionError("no edges touch the held-out split — gate is vacuous")
    tmp = tempfile.mkdtemp(prefix="ccpd_ccext_")
    t = _PhaseTimer("doc_cc_extend")
    try:
        path = f"{tmp}/components"
        # parts=256 honors the operator's measured sizing rule (parts >=
        # ~20x touched comps) at both driver scales — the gate checks
        # correctness, not the adversarial-sizing regime
        write_components(
            connected_components(base, src="doc_a", dst="doc_b"), path, parts=256
        )
        t.lap("base_cc_and_write")
        extend_components_at_rest(spark, path, delta, src="doc_a", dst="doc_b")
        t.lap("extend_at_rest")
        ext = read_components(spark, path)
        rows = sorted(map(tuple, ext.collect()))
        t.lap("read_back")
        full = sorted(
            map(tuple, connected_components(pairs, src="doc_a", dst="doc_b").collect())
        )
        t.lap("full_union_recompute_twin")
        if rows != full:
            raise AssertionError(
                "incremental extend diverged from the full-union recompute "
                f"({len(rows)} vs {len(full)} rows)"
            )
        # the component table vanishes with the scratch dir — return data
        return spark.createDataFrame(rows, ext.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_COMPACT_GATE_ORACLE = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(5 * count(*) AS BIGINT) AS n_results,
           TRUE AS recall_ok,
           TRUE AS probe_unchanged
    FROM embeddings WHERE vec_id < {_NQ}
    """

# Last run's per-phase wall-time split for the composite at-rest gates
# (query name -> {phase: secs}). bench_io.py copies these into its
# artifact's ``notes`` so a gate's total is attributable from the
# artifact alone (VERDICT r11 items 6-7 / r12 item 4: emb_ivfpq_append
# grew 26.4 -> 34.9 s across rounds with no way to tell the timed
# OPERATOR from the gate's own oracle scaffolding — rebuild, double
# probe, brute-force twin).
LAST_PHASE_SECS: dict[str, dict] = {}


class _PhaseTimer:
    def __init__(self, query: str):
        import time as _time

        self._time = _time
        self.secs: dict[str, float] = {}
        self._t0 = _time.perf_counter()
        LAST_PHASE_SECS[query] = self.secs

    def lap(self, phase: str) -> None:
        now = self._time.perf_counter()
        self.secs[phase] = round(now - self._t0, 3)
        self._t0 = now


@register(
    "emb_ivfpq_append",
    oracle=_ANN_GATE_ORACLE,
    doc="O(batch) incremental append to the IVF-PQ index AT REST "
    "(operators/similarity.py append_to_ivfpq_index — VERDICT r11 "
    "item 1): the index is built on 80% of the corpus, the held-out "
    "20% appends under the SAVED quantizers (assign + encode only — "
    "no k-means, no codebook math, the 1M probe measured 20 s vs "
    "118-330 s rebuild), and the grown index is probed. Self-gating "
    "EXACTLY: the grown probe must equal row-for-row the probe of a "
    "full rebuild under the same quantizers (raised in-gate), so the "
    "append path provably changes nothing but the rows it adds; the "
    "returned row is the family's cardinality + recall@5 gate vs the "
    "brute-force twin.",
)
def emb_ivfpq_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings")
    initial = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    q = e.filter(F.col("vec_id") < _NQ)
    tmp = tempfile.mkdtemp(prefix="ccpd_ivfpq_append_")
    t = _PhaseTimer("emb_ivfpq_append")
    try:
        grown = f"{tmp}/grown"
        cents, cb = SIM.write_ivfpq_index(
            initial, grown, n_clusters=16, m=16, ks=16, seed=42
        )
        t.lap("build_initial_index")
        SIM.append_to_ivfpq_index(batch, grown)
        t.lap("append")  # <- the OPERATOR under test; the rest is gate scaffolding
        rebuilt = f"{tmp}/rebuilt"
        SIM.write_ivfpq_index(e, rebuilt, quantizers=(cents, cb))
        t.lap("rebuild_twin")
        # n_probe=8 (vs the full-build gates' 4): the coarse quantizer is
        # trained on 80% of a tiny fixture, so cluster geometry is noisier
        # than a full-corpus build — probing half the clusters restores the
        # recall margin the family gate expects (measured 0.475 -> 0.725 at
        # sf0.01); the exact grown==rebuilt equality is probe-independent
        got = SIM.ivfpq_topk_indexed(spark, grown, q, k=5, n_probe=8, refine=8)
        want = SIM.ivfpq_topk_indexed(spark, rebuilt, q, k=5, n_probe=8, refine=8)
        g = sorted(map(tuple, got.collect()))
        w = sorted(map(tuple, want.collect()))
        t.lap("probe_both")
        if g != w:
            raise AssertionError(
                "append-grown probe diverged from the same-quantizer rebuild"
            )
        approx = spark.createDataFrame(g, got.schema)
        exact = SIM.brute_force_topk(e, q, id_col="vec_id", vec_col="embedding", k=5)
        gate = _ann_recall_gate(approx, exact)
        # the index files vanish with the scratch dir — return data
        out = spark.createDataFrame(gate.collect(), gate.schema)
        t.lap("brute_force_recall_gate")
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "emb_index_compact",
    oracle=_COMPACT_GATE_ORACLE,
    doc="Partition-selective index compaction (operators/similarity.py "
    "compact_index — VERDICT r11 item 1): an IVF index grown by three "
    "appends accumulates small files per cluster; compact_index "
    "rewrites ONLY the bloated cluster partitions (zero quantizer "
    "math, wave-bounded, staged swap with crash recovery through the "
    "Hadoop FS API). Self-gating: probe results before and after "
    "compaction must be identical, at least one cluster must actually "
    "have been rewritten, and every cluster must be back at one file "
    "(all raised in-gate); the returned row adds the family's "
    "cardinality + recall@5 gate vs the brute-force twin plus the "
    "probe_unchanged verdict.",
)
def emb_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sources import fsutil as FS

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _NQ)
    tmp = tempfile.mkdtemp(prefix="ccpd_compact_")
    t = _PhaseTimer("emb_index_compact")
    try:
        path = f"{tmp}/ivf"
        SIM.write_ivf_index(
            e.filter(F.col("vec_id") % 10 > 2), path, n_clusters=16, seed=42
        )
        t.lap("build_initial_index")
        for r in (0, 1, 2):
            SIM.append_to_ivf_index(e.filter(F.col("vec_id") % 10 == r), path)
        t.lap("three_appends")
        # n_probe=8: quantizer trained on 70% of the tiny fixture — see
        # emb_ivfpq_append; the before==after equality is probe-independent
        before = sorted(
            map(tuple, SIM.ivf_topk_indexed(spark, path, q, k=5, n_probe=8).collect())
        )
        t.lap("probe_before")
        stats = SIM.compact_index(spark, path, files_per_cluster=1)
        t.lap("compact")  # <- the OPERATOR under test
        if stats["clusters_compacted"] < 1:
            raise AssertionError("appends produced nothing to compact — gate is vacuous")
        bad = [
            d for d in FS.glob_paths(f"{path}/_cluster=*")
            if len(FS.glob_paths(f"{d}/*.parquet")) != 1
        ]
        if bad:
            raise AssertionError(f"clusters above the file bound after compaction: {bad}")
        got = SIM.ivf_topk_indexed(spark, path, q, k=5, n_probe=8)
        after = sorted(map(tuple, got.collect()))
        t.lap("probe_after")
        if before != after:
            raise AssertionError("compaction changed probe results")
        approx = spark.createDataFrame(after, got.schema)
        exact = SIM.brute_force_topk(e, q, id_col="vec_id", vec_col="embedding", k=5)
        gate = _ann_recall_gate(approx, exact).withColumn(
            "probe_unchanged", F.lit(True)
        )
        # the index files vanish with the scratch dir — return data
        out = spark.createDataFrame(gate.collect(), gate.schema)
        t.lap("brute_force_recall_gate")
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "emb_semantic_dedup_against",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0
    ),
    batch AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
      UNION ALL
      SELECT vec_id + {_AGAINST_CLONE_OFFSET} AS vec_id, embedding
      FROM embeddings WHERE vec_id % 5 <> 0 AND vec_id % 50 = 1
    ),
    hits AS (
      -- plain join, not correlated NOT EXISTS: DuckDB cannot bind an
      -- outer column inside a list_transform lambda
      SELECT DISTINCT vec_id FROM (
        SELECT b.vec_id,
               {_cosine_sql('c.embedding', 'b.embedding', _DIM)} AS cos
        FROM batch b, corpus c
      ) WHERE cos >= 0.9
    )
    SELECT vec_id FROM batch
    WHERE vec_id NOT IN (SELECT vec_id FROM hits)
    """,
    doc="Cross-run SEMANTIC dedup against the at-rest ANN index "
    "(operators/similarity.py semantic_dedup_against — r13, completing "
    "the against-corpus family: exact fingerprints / MinHash / SimHash "
    "/ embeddings): the batch probes its n_probe nearest saved-centroid "
    "clusters (scan pruned to those partitions, corpus never shuffled), "
    "exact cosine with stored corpus norms verifies candidates, and "
    "rows matching any ingested vector at >= threshold drop. The gate "
    "probes EXHAUSTIVELY (n_probe = n_clusters), so the survivor set "
    "is exact and the oracle is a brute-force NOT-EXISTS cosine replay; "
    "the pruned probe (n_probe=4) is asserted in-gate to still drop "
    "every planted exact clone (identical vectors share a "
    "nearest-centroid list — the IVF recall trade only touches "
    "near-threshold pairs).",
)
def emb_semantic_dedup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") % 5 != 0)
    clones = corpus.filter(F.col("vec_id") % 50 == 1).select(
        (F.col("vec_id") + _AGAINST_CLONE_OFFSET).alias("vec_id"), "embedding"
    )
    batch = e.filter(F.col("vec_id") % 5 == 0).unionByName(clones)
    planted = {r.vec_id for r in clones.select("vec_id").collect()}
    if not planted:
        raise AssertionError("no clones planted — gate is vacuous")
    tmp = tempfile.mkdtemp(prefix="ccpd_semdd_")
    try:
        idx = f"{tmp}/ivf"
        SIM.write_ivf_index(corpus, idx, n_clusters=16, seed=42)
        # exhaustive probe (n_probe = n_clusters) == brute force: the
        # differential is exact end-to-end
        surv = SIM.semantic_dedup_against(
            batch, idx, threshold=0.9, n_probe=16
        ).select("vec_id")
        rows = surv.collect()
        leaked = sorted({r.vec_id for r in rows} & planted)
        if leaked:
            raise AssertionError(f"planted exact clones survived: {leaked}")
        # pruned probe: exact duplicates must STILL all drop
        pruned = {
            r.vec_id
            for r in SIM.semantic_dedup_against(batch, idx, threshold=0.9, n_probe=4)
            .select("vec_id")
            .collect()
        }
        leaked4 = sorted(pruned & planted)
        if leaked4:
            raise AssertionError(f"pruned probe missed exact clones: {leaked4}")
        # the index vanishes with the scratch dir — return data
        return spark.createDataFrame(rows, surv.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SEM_BATCHED_OFFSET = 3_000_000


@register(
    "emb_semantic_batched",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0
    ),
    batch AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
      UNION ALL
      SELECT vec_id + {_SEM_BATCHED_OFFSET} AS vec_id, embedding
      FROM embeddings WHERE vec_id % 5 <> 0 AND vec_id % 25 = 3
    ),
    hits AS (
      SELECT DISTINCT vec_id FROM (
        SELECT b.vec_id,
               {_cosine_sql('c.embedding', 'b.embedding', _DIM)} AS cos
        FROM batch b, corpus c
      ) WHERE cos >= 0.9
    )
    SELECT vec_id FROM batch
    WHERE vec_id NOT IN (SELECT vec_id FROM hits)
    """,
    doc="Cross-run semantic dedup with the PRODUCTION-REGIME executed "
    "path under the driver differential (r15, VERDICT r14 item 2): the "
    "index is written with 40 clusters — at or above "
    "_BATCHED_ASSIGN_MIN_K (33), so the write-side assignment, the "
    "probe (_probed_compact_batched) and the verify='auto' resolution "
    "ALL take the Arrow-batched numpy regime, and the verify stage runs "
    "the per-cluster matmul (_semantic_hits_matmul) instead of the "
    "per-pair HOF fold — the exact seam the r13/r14 review passes each "
    "caught a bug in, now visible to the driver instead of pytest-only. "
    "The gate asserts the resolved regime in-gate (a drifted threshold "
    "constant fails loudly, not by silently testing the HOF path), "
    "probes EXHAUSTIVELY (n_probe = n_clusters = 40) so the survivor "
    "set is exact and the brute-force NOT-IN cosine replay is the "
    "oracle, and exercises the return_release plumbing (ADVICE r14): "
    "survivors materialize first, then the round's matmul broadcast is "
    "released explicitly.",
)
def emb_semantic_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.similarity import (
        _BATCHED_ASSIGN_MIN_K,
        _index_assign_regime,
        _resolve_verify,
    )

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") % 5 != 0)
    clones = corpus.filter(F.col("vec_id") % 25 == 3).select(
        (F.col("vec_id") + _SEM_BATCHED_OFFSET).alias("vec_id"), "embedding"
    )
    batch = e.filter(F.col("vec_id") % 5 == 0).unionByName(clones)
    planted = {r.vec_id for r in clones.select("vec_id").collect()}
    if not planted:
        raise AssertionError("no clones planted — gate is vacuous")
    n_clusters = 40
    if n_clusters < _BATCHED_ASSIGN_MIN_K:
        raise AssertionError(
            "gate misconfigured: index must sit in the batched regime"
        )
    tmp = tempfile.mkdtemp(prefix="ccpd_sembat_")
    try:
        idx = f"{tmp}/ivf"
        # auto assignment at 40 clusters -> assign_clusters_batched
        SIM.write_ivf_index(corpus, idx, n_clusters=n_clusters, seed=42)
        cents = SIM.read_ivf_centroids(spark, idx)
        regime = _index_assign_regime(spark, idx, False, cents)
        if regime != "batched":
            raise AssertionError(f"expected batched write regime, got {regime!r}")
        if not _resolve_verify("auto", regime, True):
            raise AssertionError("verify='auto' did not resolve to the matmul")
        # exhaustive probe (n_probe = n_clusters) == brute force; the
        # executed path is batched probe + matmul verify
        surv, release = SIM.semantic_dedup_against(
            batch, idx, threshold=0.9, n_probe=n_clusters, return_release=True
        )
        rows = surv.select("vec_id").collect()
        release()  # survivors materialized — drop the round's broadcast
        leaked = sorted({r.vec_id for r in rows} & planted)
        if leaked:
            raise AssertionError(f"planted exact clones survived: {leaked}")
        return spark.createDataFrame(rows, "vec_id long")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "doc_ingest_stream",
    oracle=_ingest_round_oracle(
        num_hashes=32, bands=8, shingle_n=3, seed=42, threshold=0.5,
        max_bucket=1000, clone_offset=_AGAINST_CLONE_OFFSET,
    ),
    doc="Cross-run MinHash dedup AS A STREAM (streaming/ingest.py "
    "stream_minhash_ingest — the dedup twin of stream_maintain_index): "
    "the batch arrives as a file in a watched directory, one "
    "availableNow drain runs the full ingest round per micro-batch "
    "under the table's staged-move transaction ledger (probe + "
    "survivor policy frozen strictly before any signature file moves "
    "— a replay can never re-probe a half-appended table and watch "
    "the batch pair with itself). Gate, all raised in-gate: drain 1 "
    "runs exactly ONE batch with action=appended and every planted "
    "clone dropped; a re-drain with no new files runs ZERO batches; a "
    "manual replay of the drained batch's txn id reports "
    "skipped_replay with the identical survivor count and leaves the "
    "signature table's file census untouched. The survivor set (read "
    "from the stream's survivors sink) hash-matches the same "
    "full-round SQL replay as doc_ingest_round — one micro-batch IS "
    "one round, so the oracle is shared.",
)
def doc_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sources import fsutil as FS
    from ..streaming.ingest import _stream_ledger_id, stream_minhash_ingest

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    clones = corpus.filter(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + _AGAINST_CLONE_OFFSET).alias("doc_id"), "text"
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).unionByName(clones)
    n_planted = clones.count()
    if n_planted == 0:
        raise AssertionError("no clones planted — gate is vacuous")
    tmp = tempfile.mkdtemp(prefix="ccpd_ingest_stream_")
    try:
        sigs = f"{tmp}/sigs"
        DD.write_minhash_signatures(
            corpus, sigs, "doc_id", "text", parts=16, **_ROUND_SIG
        )
        batch.coalesce(1).write.parquet(f"{tmp}/src")
        args = dict(
            spark=spark, src_dir=f"{tmp}/src", sig_path=sigs,
            checkpoint_dir=f"{tmp}/ckpt", threshold=0.5, max_bucket=1000,
            survivors_dir=f"{tmp}/survivors",
        )
        reports = stream_minhash_ingest(**args)
        if len(reports) != 1 or reports[0]["action"] != "appended":
            raise AssertionError(f"expected one appended batch, got {reports}")
        if stream_minhash_ingest(**args):  # re-drain: checkpoint dedups input
            raise AssertionError("re-drain with no new files ran batches")
        census = len(FS.glob_paths(f"{sigs}/banded/part=*/*.parquet"))
        replay = DD.minhash_ingest_round(
            batch, sigs, "doc_id", "text", threshold=0.5, max_bucket=1000,
            txn=f"{_stream_ledger_id(args['checkpoint_dir'])}-b0",
        )
        if replay["action"] != "skipped_replay":
            raise AssertionError(f"txn replay re-ran the round: {replay['action']}")
        if replay["n_survivors"] != reports[0]["n_survivors"]:
            raise AssertionError("replay reconstructed a different survivor count")
        if len(FS.glob_paths(f"{sigs}/banded/part=*/*.parquet")) != census:
            raise AssertionError("txn replay changed the signature table")
        surv = spark.read.parquet(f"{tmp}/survivors/batch=0").select("doc_id")
        rows = surv.collect()
        leaked = sorted(
            {r.doc_id for r in rows}
            & {r.doc_id for r in clones.select("doc_id").collect()}
        )
        if leaked:
            raise AssertionError(f"planted clones survived the streamed round: {leaked}")
        # scratch table and sink vanish with the tempdir — return data
        return spark.createDataFrame(rows, surv.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _exact_ingest_round_oracle(clone_offset: int) -> str:
    """DuckDB twin of one fingerprint_ingest_round: within-batch exact
    dedup keeps the min id per identical-content group, then every
    batch doc whose fingerprint exists in the corpus drops — one
    streamed micro-batch IS one round, so the stream gate shares it."""
    return f"""
    WITH fpt AS (SELECT doc_id AS doc, {_FPRINT} AS f FROM documents),
    corpus AS (SELECT f FROM fpt WHERE doc % 5 <> 0),
    bf AS (
      SELECT doc, f FROM fpt WHERE doc % 5 = 0
      UNION ALL
      SELECT doc + {clone_offset} AS doc, f FROM fpt
      WHERE doc % 5 <> 0 AND doc % 50 = 1
    ),
    dedup AS (
      SELECT doc, f FROM (
        SELECT doc, f, row_number() OVER (PARTITION BY f ORDER BY doc) AS rn
        FROM bf
      ) WHERE rn = 1
    )
    SELECT doc AS doc_id FROM dedup b
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.f = b.f)
    """


def _simhash_ingest_round_oracle(
    bits: int, max_distance: int, clone_offset: int
) -> str:
    """DuckDB twin of one simhash_ingest_round: brute-force popcount
    pairs (cross AND within — the Spark side's pigeonhole probe is
    complete for d <= the index segmentation and precision-filtered by
    the same popcount), recursive-CTE connected components over the
    union edge graph, then the shared INGEST survivor policy (corpus
    wins transitively; corpus-free components keep their min batch
    member). Clones share their source's text, hence its fingerprint —
    the batch side reuses the corpus fp rows at the shifted ids."""
    return f"""
    WITH RECURSIVE {_simhash_fp_ctes(bits)},
    cfp AS (SELECT doc, simhash FROM fp WHERE doc % 5 <> 0),
    bfp AS (
      SELECT doc, simhash FROM fp WHERE doc % 5 = 0
      UNION ALL
      SELECT doc + {clone_offset} AS doc, simhash FROM fp
      WHERE doc % 5 <> 0 AND doc % 50 = 1
    ),
    cross_pairs AS (
      SELECT c.doc AS corpus_doc, b.doc AS batch_doc
      FROM cfp c JOIN bfp b
        ON bit_count(xor(c.simhash, b.simhash)) <= {max_distance}
    ),
    within_pairs AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b
      FROM bfp a JOIN bfp b
        ON a.doc < b.doc
       AND bit_count(xor(a.simhash, b.simhash)) <= {max_distance}
    ),
    edges AS (
      SELECT corpus_doc AS a, batch_doc AS b FROM cross_pairs
      UNION SELECT batch_doc, corpus_doc FROM cross_pairs
      UNION SELECT doc_a, doc_b FROM within_pairs
      UNION SELECT doc_b, doc_a FROM within_pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
    tainted AS (
      SELECT DISTINCT c.comp FROM comp c
      JOIN (SELECT DISTINCT corpus_doc FROM cross_pairs) x ON c.node = x.corpus_doc
    ),
    clustered AS (
      SELECT c.node, c.comp FROM comp c JOIN bfp b ON c.node = b.doc
    ),
    keep AS (
      SELECT min(node) AS node FROM clustered c
      WHERE NOT EXISTS (SELECT 1 FROM tainted t WHERE t.comp = c.comp)
      GROUP BY comp
    ),
    dropped AS (
      SELECT node FROM clustered c
      WHERE NOT EXISTS (SELECT 1 FROM keep k WHERE k.node = c.node)
    )
    SELECT doc AS doc_id FROM bfp b
    WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.node = b.doc)
    """


def _streamed_round_gate(
    spark,
    sf_dir: str,
    write_corpus,
    run_stream,
    run_replay,
    census_glob: str,
):
    """Shared body of the three streamed cross-run dedup gates: plant
    clones of corpus docs into the held-out batch, drain it as ONE
    availableNow micro-batch, and raise in-gate unless (a) exactly one
    batch ran with action=appended, (b) a re-drain with no new files
    runs ZERO batches, (c) a manual replay of the drained batch's txn
    id reports skipped_replay with the identical survivor count and an
    untouched data-file census, (d) every planted clone dropped.
    Returns the survivors frame read back from the stream's sink."""
    import shutil
    import tempfile

    from ..sources import fsutil as FS
    from ..streaming.ingest import _stream_ledger_id

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    clones = corpus.filter(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + _AGAINST_CLONE_OFFSET).alias("doc_id"), "text"
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).unionByName(clones)
    if clones.count() == 0:
        raise AssertionError("no clones planted — gate is vacuous")
    tmp = tempfile.mkdtemp(prefix="ccpd_fam_stream_")
    try:
        table = f"{tmp}/table"
        write_corpus(corpus, table)
        batch.coalesce(1).write.parquet(f"{tmp}/src")
        ckpt = f"{tmp}/ckpt"
        reports = run_stream(f"{tmp}/src", table, ckpt, f"{tmp}/survivors")
        if len(reports) != 1 or reports[0]["action"] != "appended":
            raise AssertionError(f"expected one appended batch, got {reports}")
        if run_stream(f"{tmp}/src", table, ckpt, f"{tmp}/survivors"):
            raise AssertionError("re-drain with no new files ran batches")
        census = len(FS.glob_paths(f"{table}/{census_glob}"))
        replay = run_replay(batch, table, f"{_stream_ledger_id(ckpt)}-b0")
        if replay["action"] != "skipped_replay":
            raise AssertionError(f"txn replay re-ran the round: {replay['action']}")
        if replay["n_survivors"] != reports[0]["n_survivors"]:
            raise AssertionError("replay reconstructed a different survivor count")
        if len(FS.glob_paths(f"{table}/{census_glob}")) != census:
            raise AssertionError("txn replay changed the at-rest table")
        surv = spark.read.parquet(f"{tmp}/survivors/batch=0").select("doc_id")
        rows = surv.collect()
        leaked = sorted(
            {r.doc_id for r in rows}
            & {r.doc_id for r in clones.select("doc_id").collect()}
        )
        if leaked:
            raise AssertionError(f"planted clones survived the streamed round: {leaked}")
        # scratch table and sink vanish with the tempdir — return data
        return spark.createDataFrame(rows, surv.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "doc_exact_ingest_stream",
    oracle=_exact_ingest_round_oracle(_AGAINST_CLONE_OFFSET),
    doc="Cross-run EXACT dedup AS A STREAM (streaming/ingest.py "
    "stream_fingerprint_ingest over operators/dedup.py "
    "fingerprint_ingest_round — r13: the staged-move transaction "
    "ledger extended from the MinHash/ANN families to the fingerprint "
    "table, fulfilling sources/txn.py's every-at-rest-table contract): "
    "each availableNow micro-batch collapses within-batch exact dups "
    "(keep min id), probes the at-rest corpus fingerprints (pruned "
    "scan, corpus never shuffled), and appends only the survivors — "
    "probe + survivor policy frozen strictly before any staged "
    "fingerprint file moves, so a foreachBatch replay can never "
    "re-probe a half-appended table and drop every row. Gate (all "
    "raised in-gate): one appended batch, zero-batch re-drain, "
    "skipped_replay manual txn replay with identical survivor count "
    "and untouched file census, every planted clone dropped. The "
    "oracle replays the round's policy in SQL: window-dedup then "
    "NOT-EXISTS against the corpus fingerprints.",
)
def doc_exact_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ingest import stream_fingerprint_ingest

    return _streamed_round_gate(
        spark, sf_dir,
        write_corpus=lambda corpus, table: DD.write_fingerprints(
            corpus, table, "doc_id", "text", parts=16
        ),
        run_stream=lambda src, table, ckpt, sink: stream_fingerprint_ingest(
            spark, src, table, ckpt, survivors_dir=sink
        ),
        run_replay=lambda batch, table, txn: DD.fingerprint_ingest_round(
            batch, table, "doc_id", "text", txn=txn
        ),
        census_glob="fingerprints/part=*/*.parquet",
    )


@register(
    "doc_simhash_ingest_stream",
    oracle=_simhash_ingest_round_oracle(
        bits=32, max_distance=3, clone_offset=_AGAINST_CLONE_OFFSET
    ),
    doc="Cross-run SIMHASH dedup AS A STREAM (streaming/ingest.py "
    "stream_simhash_ingest over operators/dedup.py simhash_ingest_round "
    "— r13: the transaction ledger extended to the segment index, "
    "completing the signature family's exactly-once streaming story): "
    "each availableNow micro-batch probes the corpus segments (Manku "
    "pigeonhole, scan pruned to the batch's segment partitions) and "
    "itself under the index's pinned params, applies the shared INGEST "
    "survivor policy (corpus wins transitively), and appends only the "
    "survivors' segments — all strictly before any staged file moves. "
    "Gate: one appended batch, zero-batch re-drain, skipped_replay "
    "manual txn replay with identical count and census, every planted "
    "clone dropped. The oracle replays the WHOLE round: brute-force "
    "popcount pairs both ways, recursive-CTE connected components, the "
    "survivor policy.",
)
def doc_simhash_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ingest import stream_simhash_ingest

    return _streamed_round_gate(
        spark, sf_dir,
        write_corpus=lambda corpus, table: DD.write_simhash_index(
            corpus, table, "doc_id", "text",
            max_distance=3, bits=32, hash_mode="md5", parts=16,
        ),
        run_stream=lambda src, table, ckpt, sink: stream_simhash_ingest(
            spark, src, table, ckpt, survivors_dir=sink
        ),
        run_replay=lambda batch, table, txn: DD.simhash_ingest_round(
            batch, table, "doc_id", "text", txn=txn
        ),
        census_glob="segments/part=*/*.parquet",
    )


_FORGET_OFFSET = 3_000_000


@register(
    "doc_forget_docs",
    oracle=f"""
    WITH kept AS (
      SELECT {_FPRINT} AS f FROM documents WHERE doc_id % 7 <> 3
    ),
    batch_docs AS (
      SELECT doc_id + {_FORGET_OFFSET} AS doc, text FROM documents
      WHERE doc_id % 7 = 3 AND doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + {2 * _FORGET_OFFSET} AS doc, text FROM documents
      WHERE doc_id % 7 <> 3 AND doc_id % 10 = 1
    ),
    bf AS (SELECT doc, {_FPRINT} AS f FROM batch_docs)
    SELECT doc AS doc_id FROM bf b
    WHERE NOT EXISTS (SELECT 1 FROM kept c WHERE c.f = b.f)
    """,
    doc="Right-to-be-forgotten AT REST (sources/forget.py "
    "delete_rows_partitioned via operators/dedup.py forget_documents): "
    "the whole corpus is ingested into BOTH cross-run tables (exact "
    "fingerprints + MinHash signatures), then every doc with "
    "doc_id % 7 = 3 is hard-deleted from both — one column-pruned key "
    "scan finds the partitions holding the docs' rows, only those "
    "rewrite (dynamic partition overwrite; fully-emptied partitions "
    "cleared through the FS API). Gate: a batch of clones of FORGOTTEN "
    "docs must now SURVIVE the exact probe (their fingerprints are "
    "gone) while clones of KEPT docs still drop — the oracle replays "
    "the probe against corpus-minus-forgotten; the MinHash side is "
    "asserted in-gate the same way (forgotten-clone pairs gone, "
    "kept-clone pairs intact at est_jaccard 1.0).",
)
def doc_forget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    forget = d.filter(F.col("doc_id") % 7 == 3)
    forgotten_clones = forget.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + _FORGET_OFFSET).alias("doc_id"), "text"
    )
    kept_clones = d.filter(
        (F.col("doc_id") % 7 != 3) & (F.col("doc_id") % 10 == 1)
    ).select((F.col("doc_id") + 2 * _FORGET_OFFSET).alias("doc_id"), "text")
    batch = forgotten_clones.unionByName(kept_clones)
    n_forgotten = forgotten_clones.count()
    n_kept = kept_clones.count()
    if n_forgotten == 0 or n_kept == 0:
        raise AssertionError("clone plant is vacuous on this fixture")
    tmp = tempfile.mkdtemp(prefix="ccpd_forget_")
    t = _PhaseTimer("doc_forget_docs")
    try:
        fps, sigs = f"{tmp}/fps", f"{tmp}/sigs"
        DD.write_fingerprints(d, fps, "doc_id", "text", parts=16)
        DD.write_minhash_signatures(d, sigs, "doc_id", "text", parts=16, **_ROUND_SIG)
        t.lap("table_builds")
        ids = forget.select("doc_id")
        st_fp = DD.forget_documents(spark, fps, ids)
        t.lap("forget_fingerprints")
        st_sig = DD.forget_documents(spark, sigs, ids)
        t.lap("forget_signatures")
        if st_fp["table"] != "fingerprints" or st_sig["table"] != "banded":
            raise AssertionError(f"layout sniff wrong: {st_fp} / {st_sig}")
        if st_fp["rows_deleted"] == 0 or st_sig["rows_deleted"] == 0:
            raise AssertionError("deletion removed nothing — gate is vacuous")
        # exact probe: forgotten clones survive, kept clones drop
        surv = DD.dedup_exact_against(batch, fps, "doc_id", "text").select("doc_id")
        rows = surv.collect()
        t.lap("exact_probe")
        got = {r.doc_id for r in rows}
        leaked = sorted(
            {r.doc_id for r in kept_clones.select("doc_id").collect()} & got
        )
        if leaked:
            raise AssertionError(f"kept-doc clones survived the exact probe: {leaked}")
        # (exact-dup docs inside the forgotten set can shadow each
        # other through a KEPT twin — the oracle replays exactly that)
        # minhash probe: no pair may point at a forgotten corpus doc,
        # and every kept clone still pairs at est_jaccard 1.0
        pairs = DD.near_duplicates_against(
            batch, sigs, "doc_id", "text", threshold=0.99
        )
        forgot_ids = {r.doc_id for r in forget.select("doc_id").collect()}
        bad = pairs.filter(F.col("corpus_doc").isin(list(forgot_ids))).count()
        if bad:
            raise AssertionError(f"{bad} pairs still reference forgotten docs")
        kept_hits = {
            r.batch_doc
            for r in pairs.filter(F.col("est_jaccard") >= 0.999).collect()
        }
        missed = sorted(
            {r.doc_id for r in kept_clones.select("doc_id").collect()} - kept_hits
        )
        if missed:
            raise AssertionError(f"kept-doc clones lost their signatures: {missed}")
        t.lap("minhash_probe_and_asserts")
        # the tables vanish with the scratch dir — return data
        return spark.createDataFrame(rows, surv.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "emb_index_delete",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(5 * count(*) AS BIGINT) AS n_results,
           TRUE AS recall_ok,
           TRUE AS delete_clean
    FROM embeddings WHERE vec_id < {_NQ}
    """,
    doc="Right-to-be-forgotten for the at-rest ANN index "
    "(operators/similarity.py delete_from_index): vectors hard-delete "
    "from the IVF index by id — one column-pruned (neighbor_id, "
    "_cluster) scan finds the deleted vectors' clusters, only those "
    "partitions rewrite; centroids stay as built (deletion never moves "
    "a survivor between clusters, the mirror image of the append "
    "case's frozen-quantizer argument). Gate, raised in-gate: the "
    "post-delete probe equals row-for-row a same-centroid rebuild on "
    "the surviving corpus, and no deleted id appears; the returned row "
    "is the family cardinality + recall@5 gate vs brute force over "
    "the survivors.",
)
def emb_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings")
    doomed = e.filter((F.col("vec_id") % 9 == 2) & (F.col("vec_id") >= _NQ))
    survivors = e.join(
        doomed.select("vec_id"), "vec_id", "left_anti"
    )
    q = e.filter(F.col("vec_id") < _NQ)
    tmp = tempfile.mkdtemp(prefix="ccpd_idx_del_")
    t = _PhaseTimer("emb_index_delete")
    try:
        path = f"{tmp}/ivf"
        cents = SIM.write_ivf_index(e, path, n_clusters=16, seed=42)
        t.lap("index_build")
        stats = SIM.delete_from_index(spark, path, doomed.select("vec_id"))
        if stats["rows_deleted"] != doomed.count():
            raise AssertionError(f"deletion count off: {stats}")
        t.lap("delete_from_index")
        got = SIM.ivf_topk_indexed(spark, path, q, k=5, n_probe=8)
        rows = sorted(map(tuple, got.collect()))
        doomed_ids = {r.vec_id for r in doomed.select("vec_id").collect()}
        leaked = sorted({r[1] for r in rows} & doomed_ids)
        if leaked:
            raise AssertionError(f"deleted ids still in top-k: {leaked}")
        t.lap("probe_after_delete")
        rebuilt = f"{tmp}/rebuilt"
        SIM.write_ivf_index(survivors, rebuilt, centroids=cents)
        want = sorted(
            map(tuple, SIM.ivf_topk_indexed(spark, rebuilt, q, k=5, n_probe=8).collect())
        )
        if rows != want:
            raise AssertionError(
                "post-delete probe diverged from a same-centroid rebuild "
                "on the surviving corpus"
            )
        t.lap("rebuild_twin_and_probe")
        approx = spark.createDataFrame(rows, got.schema)
        exact = SIM.brute_force_topk(
            survivors, q, id_col="vec_id", vec_col="embedding", k=5
        )
        gate = _ann_recall_gate(approx, exact).withColumn(
            "delete_clean", F.lit(True)
        )
        out = spark.createDataFrame(gate.collect(), gate.schema)
        t.lap("brute_force_recall_gate")
        # the index files vanish with the scratch dir — return data
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _semantic_ingest_round_oracle(threshold: float, clone_offset: int) -> str:
    """DuckDB twin of one semantic_ingest_round at EXHAUSTIVE probe
    (n_probe = n_clusters, where the IVF probe IS brute force): cosine
    >= threshold pairs — cross (corpus x batch) and within
    (batch x batch) — recursive-CTE connected components over the
    union edge graph, then the shared INGEST survivor policy (corpus
    wins transitively; corpus-free components keep their min batch
    member). One streamed micro-batch IS one round, so the stream gate
    uses it directly."""
    cos_cb = _cosine_sql("c.embedding", "b.embedding", _DIM)
    cos_ab = _cosine_sql("a.embedding", "b.embedding", _DIM)
    return f"""
    WITH RECURSIVE corpus AS (
      SELECT vec_id AS doc, embedding FROM embeddings WHERE vec_id % 5 <> 0
    ),
    batch AS (
      SELECT vec_id AS doc, embedding FROM embeddings WHERE vec_id % 5 = 0
      UNION ALL
      SELECT vec_id + {clone_offset} AS doc, embedding FROM embeddings
      WHERE vec_id % 5 <> 0 AND vec_id % 50 = 1
    ),
    cross_pairs AS (
      SELECT c.doc AS corpus_doc, b.doc AS batch_doc
      FROM corpus c, batch b
      WHERE {cos_cb} >= {threshold}
    ),
    within_pairs AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b
      FROM batch a, batch b
      WHERE a.doc < b.doc AND {cos_ab} >= {threshold}
    ),
    edges AS (
      SELECT corpus_doc AS a, batch_doc AS b FROM cross_pairs
      UNION SELECT batch_doc, corpus_doc FROM cross_pairs
      UNION SELECT doc_a, doc_b FROM within_pairs
      UNION SELECT doc_b, doc_a FROM within_pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
    tainted AS (
      SELECT DISTINCT c.comp FROM comp c
      JOIN (SELECT DISTINCT corpus_doc FROM cross_pairs) x ON c.node = x.corpus_doc
    ),
    clustered AS (
      SELECT c.node, c.comp FROM comp c
      JOIN batch b ON c.node = b.doc
    ),
    keep AS (
      SELECT min(node) AS node FROM clustered c
      WHERE NOT EXISTS (SELECT 1 FROM tainted t WHERE t.comp = c.comp)
      GROUP BY comp
    ),
    dropped AS (
      SELECT node FROM clustered c
      WHERE NOT EXISTS (SELECT 1 FROM keep k WHERE k.node = c.node)
    )
    SELECT doc AS vec_id FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.node = b.doc)
    """


@register(
    "emb_semantic_ingest_stream",
    oracle=_semantic_ingest_round_oracle(0.9, _AGAINST_CLONE_OFFSET),
    doc="Cross-run SEMANTIC dedup + ANN ingest AS A STREAM "
    "(streaming/ingest.py stream_semantic_ingest -> "
    "operators/similarity.py semantic_ingest_round — r14, completing "
    "the one-call + streamed ingest round across all four at-rest "
    "signature families, VERDICT r13 item 3): each availableNow "
    "micro-batch probes the IVF index (scan pruned to the probed "
    "cluster partitions, corpus never shuffled) and itself under the "
    "index's geometry, applies the shared INGEST survivor policy, and "
    "appends only the survivors under the SAVED quantizer — the whole "
    "round inside the staged-move txn ledger (probe frozen strictly "
    "before any cluster file moves). Gate, raised in-gate: drain 1 "
    "runs exactly ONE appended batch with every planted clone "
    "dropped; a re-drain with no new files runs ZERO batches; a "
    "manual replay of the drained txn id reports skipped_replay with "
    "the identical survivor count and an untouched index file census. "
    "The gate probes EXHAUSTIVELY (n_probe = n_clusters), so the "
    "oracle is a brute-force cosine replay of the WHOLE round: "
    "cross + within >= threshold pairs, recursive-CTE connected "
    "components, the ingest policy.",
)
def emb_semantic_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sources import fsutil as FS
    from ..streaming.ingest import _stream_ledger_id, stream_semantic_ingest

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") % 5 != 0)
    clones = corpus.filter(F.col("vec_id") % 50 == 1).select(
        (F.col("vec_id") + _AGAINST_CLONE_OFFSET).alias("vec_id"), "embedding"
    )
    batch = e.filter(F.col("vec_id") % 5 == 0).unionByName(clones)
    planted = {r.vec_id for r in clones.select("vec_id").collect()}
    if not planted:
        raise AssertionError("no clones planted — gate is vacuous")
    tmp = tempfile.mkdtemp(prefix="ccpd_sem_stream_")
    try:
        idx = f"{tmp}/ivf"
        SIM.write_ivf_index(corpus, idx, n_clusters=16, seed=42)
        batch.coalesce(1).write.parquet(f"{tmp}/src")
        args = dict(
            spark=spark, src_dir=f"{tmp}/src", index_path=idx,
            checkpoint_dir=f"{tmp}/ckpt", threshold=0.9, n_probe=16,
            survivors_dir=f"{tmp}/survivors",
        )
        reports = stream_semantic_ingest(**args)
        if len(reports) != 1 or reports[0]["action"] != "appended":
            raise AssertionError(f"expected one appended batch, got {reports}")
        if stream_semantic_ingest(**args):  # re-drain: checkpoint dedups input
            raise AssertionError("re-drain with no new files ran batches")
        census = len(FS.glob_paths(f"{idx}/_cluster=*/*.parquet"))
        replay = SIM.semantic_ingest_round(
            batch, idx, threshold=0.9, n_probe=16,
            txn=f"{_stream_ledger_id(args['checkpoint_dir'])}-b0",
        )
        if replay["action"] != "skipped_replay":
            raise AssertionError(f"txn replay re-ran the round: {replay['action']}")
        if replay["n_survivors"] != reports[0]["n_survivors"]:
            raise AssertionError("replay reconstructed a different survivor count")
        if len(FS.glob_paths(f"{idx}/_cluster=*/*.parquet")) != census:
            raise AssertionError("txn replay changed the index")
        surv = spark.read.parquet(f"{tmp}/survivors/batch=0").select("vec_id")
        rows = surv.collect()
        leaked = sorted({r.vec_id for r in rows} & planted)
        if leaked:
            raise AssertionError(f"planted clones survived the streamed round: {leaked}")
        # scratch index and sink vanish with the tempdir — return data
        return spark.createDataFrame(rows, surv.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "emb_maintain_stream",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {_NQ}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cvec FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             round({_cosine_sql('cvec', 'qvec', _DIM)}, 6) AS cos
      FROM c, q WHERE neighbor_id <> query_id
    ),
    r AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS "rank"
      FROM scored
    )
    SELECT * FROM r WHERE "rank" <= 5
    """,
    doc="Streamed ANN-index maintenance under the txn ledger "
    "(streaming/ingest.py stream_maintain_index -> "
    "operators/similarity.py maintain_index — r14, VERDICT r13 item 4: "
    "the one at-rest streaming drain that had no driver-oracle gate): "
    "the index is built on 80% of the corpus, the held-out 20% "
    "arrives as a file and one availableNow drain runs the full "
    "maintenance policy per micro-batch (drift measured vs the "
    "build-time baseline, append under the SAVED quantizer, "
    "trigger-gated compaction), idempotent against foreachBatch "
    "replays. Gate, raised in-gate: ONE appended batch with a "
    "non-null drift ratio; a re-drain runs ZERO batches; a manual "
    "maintain_index replay of the drained txn id reports "
    "skipped_replay and leaves the file census untouched; the grown "
    "index probed EXHAUSTIVELY (n_probe = n_clusters) equals "
    "row-for-row a same-quantizer rebuild over the full corpus — and "
    "exhaustive probe IS brute force, so the returned top-k "
    "hash-matches the brute-force cosine SQL twin.",
)
def emb_maintain_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sources import fsutil as FS
    from ..streaming.ingest import _stream_ledger_id, stream_maintain_index

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    q = e.filter(F.col("vec_id") < _NQ)
    tmp = tempfile.mkdtemp(prefix="ccpd_maint_stream_")
    try:
        idx = f"{tmp}/ivf"
        cents = SIM.write_ivf_index(corpus, idx, n_clusters=16, seed=42)
        batch.coalesce(1).write.parquet(f"{tmp}/src")
        args = dict(
            spark=spark, src_dir=f"{tmp}/src", index_path=idx,
            checkpoint_dir=f"{tmp}/ckpt", retrain="never",
        )
        reports = stream_maintain_index(**args)
        if len(reports) != 1 or reports[0]["action"] != "appended":
            raise AssertionError(f"expected one appended batch, got {reports}")
        if reports[0]["drift_ratio"] is None:
            raise AssertionError("drift ratio not measured against the baseline")
        if stream_maintain_index(**args):  # re-drain: checkpoint dedups input
            raise AssertionError("re-drain with no new files ran batches")
        census = len(FS.glob_paths(f"{idx}/_cluster=*/*.parquet"))
        replay = SIM.maintain_index(
            spark, idx, batch, retrain="never",
            txn=f"{_stream_ledger_id(args['checkpoint_dir'])}-b0",
        )
        if replay["action"] != "skipped_replay":
            raise AssertionError(f"txn replay re-ran the round: {replay['action']}")
        if len(FS.glob_paths(f"{idx}/_cluster=*/*.parquet")) != census:
            raise AssertionError("txn replay changed the index")
        # exhaustive probe of the grown index == same-quantizer rebuild
        # == brute force (the oracle)
        got = SIM.ivf_topk_indexed(spark, idx, q, k=5, n_probe=16)
        rows = sorted(map(tuple, got.collect()))
        rebuilt = f"{tmp}/rebuilt"
        SIM.write_ivf_index(e, rebuilt, centroids=cents)
        want = sorted(
            map(tuple, SIM.ivf_topk_indexed(spark, rebuilt, q, k=5, n_probe=16).collect())
        )
        if rows != want:
            raise AssertionError(
                "streamed-append probe diverged from a same-quantizer rebuild"
            )
        # the index files vanish with the scratch dir — return data
        return spark.createDataFrame(rows, got.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "emb_semantic_ingest_round",
    oracle=_semantic_ingest_round_oracle(0.9, _AGAINST_CLONE_OFFSET),
    doc="ONE cross-run semantic ingest round, as ONE call "
    "(operators/similarity.py semantic_ingest_round — r14, the "
    "embeddings member of the one-call round family, completing the "
    "doc_ingest_round symmetry across all four at-rest signature "
    "types): probe the batch against the IVF index (scan pruned to "
    "the probed cluster partitions, corpus never shuffled) AND "
    "against itself under the index's geometry, apply the shared "
    "INGEST survivor policy (corpus wins transitively; corpus-free "
    "components keep their min batch member), append only the "
    "survivors under the SAVED quantizer, compact on the worst-"
    "cluster trigger. The gate probes EXHAUSTIVELY "
    "(n_probe = n_clusters), so the oracle is the same brute-force "
    "full-round replay the stream gate uses (one micro-batch IS one "
    "round): cosine cross+within pairs, recursive-CTE connected "
    "components, the ingest policy.",
)
def emb_semantic_ingest_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") % 5 != 0)
    clones = corpus.filter(F.col("vec_id") % 50 == 1).select(
        (F.col("vec_id") + _AGAINST_CLONE_OFFSET).alias("vec_id"), "embedding"
    )
    batch = e.filter(F.col("vec_id") % 5 == 0).unionByName(clones)
    planted = {r.vec_id for r in clones.select("vec_id").collect()}
    if not planted:
        raise AssertionError("no clones planted — gate is vacuous")
    tmp = tempfile.mkdtemp(prefix="ccpd_sem_round_")
    t = _PhaseTimer("emb_semantic_ingest_round")
    try:
        idx = f"{tmp}/ivf"
        SIM.write_ivf_index(corpus, idx, n_clusters=16, seed=42)
        t.lap("index_build")
        rep = SIM.semantic_ingest_round(batch, idx, threshold=0.9, n_probe=16)
        for step, s in rep["secs"].items():
            t.secs[f"round_{step}"] = s
        t.lap("round_total")
        surv = rep["survivors"].select("vec_id")
        rows = surv.collect()
        leaked = sorted({r.vec_id for r in rows} & planted)
        if leaked:
            raise AssertionError(f"planted clones survived the round: {leaked}")
        if rep["n_cross_pairs"] < len(planted):
            raise AssertionError(
                f"only {rep['n_cross_pairs']} cross pairs for {len(planted)} "
                "planted clones — the corpus probe missed plants"
            )
        if rep["n_survivors"] == 0:
            raise AssertionError("round dropped everything — gate is vacuous")
        t.lap("survivor_collect_and_asserts")
        # the index vanishes with the scratch dir — return data
        return spark.createDataFrame(rows, surv.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
