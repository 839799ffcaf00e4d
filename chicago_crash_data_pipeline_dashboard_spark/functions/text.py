"""Text-analysis column builders for large-scale document pipelines.

All pure Spark column expressions (split/transform/filter/aggregate
higher-order functions) — JVM-side, codegen-friendly, no Python UDFs.
These are the training-data-pipeline operators the driver mandates
beyond the reference's own surface (BASELINE.json north_star): token
counting, quality scoring, language-ID heuristics, fingerprinting,
shingling for MinHash/Jaccard dedup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword-hit
# language-ID heuristic. Deterministic, tiny, embedding-free.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "von"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不"],
}
LANG_ORDER = ["en", "fr", "es", "de", "zh"]  # deterministic tie-break

PUNCT_CLASS = "[.,;:!?]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased, trimmed text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text → 0."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(tokens(text))).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish sub-word proxy: split on whitespace AND on letter/digit
    boundaries; ~chars/4 fallback intuition without a vocab file."""
    pieces = F.split(F.trim(F.lower(text)), r"[\s]+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])")
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(pieces)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - stripped).cast("double") / n)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    sw = STOPWORDS[lang]

    def body(toks: Column) -> Column:
        hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
        total = F.size(toks)
        return F.when(total <= 0, F.lit(0.0)).otherwise(hits.cast("double") / total)

    return _let(tokens(text), body)


def mean_token_length(text: Column) -> Column:
    def body(toks: Column) -> Column:
        total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        return F.when(F.size(toks) <= 0, F.lit(0.0)).otherwise(
            total_len.cast("double") / F.size(toks)
        )

    return _let(tokens(text), body)


def quality_score(text: Column) -> Column:
    """Deterministic document-quality heuristic in [0,1]:
    rewards moderate length, penalizes punctuation soup and
    stopword-free (non-natural) text. The exact formula is arbitrary
    but fixed — it exists to rank/filter training data."""
    tc = token_count(text).cast("double")
    length_term = F.least(tc / 100.0, F.lit(1.0))
    punct_term = 1.0 - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    sw_term = F.least(stopword_ratio(text, "en") * 4.0, F.lit(1.0))
    return F.round((0.5 * length_term + 0.25 * punct_term + 0.25 * sw_term), 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per language over the token set."""
    toks = tokens(text)

    # NB: the closure factory matters — a default-arg lambda
    # (lambda t, sw=sw: ...) changes the arity pyspark inspects and the
    # HOF is called as (element, index).
    def _hits(sw: list[str]):
        return lambda t: t.isin(sw)

    return {lang: F.size(F.filter(toks, _hits(sw))) for lang, sw in STOPWORDS.items()}


def lang_id(text: Column) -> Column:
    """Argmax language by stopword hits, ties broken by LANG_ORDER;
    zero hits everywhere → 'und' (undetermined). The token array is
    let-bound: one tokenize per row, not one per (language × reference)."""

    def _hits(sw: list[str]):
        return lambda t: t.isin(sw)

    def body(toks: Column) -> Column:
        scores = {
            lang: F.size(F.filter(toks, _hits(sw))) for lang, sw in STOPWORDS.items()
        }
        best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
        expr = F.when(best <= 0, F.lit("und"))
        for lang in LANG_ORDER:
            expr = expr.when(scores[lang] == best, F.lit(lang))
        return expr.otherwise(F.lit("und"))

    return _let(tokens(text), body)


def text_profile(text: Column) -> Column:
    """Every per-document text statistic from ONE tokenization pass, as
    ``struct(n_tokens, punct_ratio, mean_tok_len, sw_ratio, en_hits,
    quality)``.

    The standalone builders (token_count / punct_ratio / stopword_ratio
    / quality_score) each re-tokenize; a query selecting several of
    them pays the regex split per column. This fuses them behind two
    nested ``_let`` bindings (token array, punct ratio), so the split
    and the punctuation regex run once per row; consuming queries
    select multiple fields of the one struct and codegen's
    subexpression elimination evaluates it once. Field formulas are
    bit-identical to the standalone builders (same oracle SQL applies).
    """
    prc = punct_ratio(text)

    def outer(prv: Column) -> Column:
        def body(toks: Column) -> Column:
            sz = F.size(toks)
            n_tok = F.when(F.trim(text) == "", F.lit(0)).otherwise(sz).cast("long")
            total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            mean_len = F.when(sz <= 0, F.lit(0.0)).otherwise(total_len.cast("double") / sz)
            en = STOPWORDS["en"]
            en_hits = F.size(F.filter(toks, lambda t: t.isin(en)))
            sw_ratio = F.when(sz <= 0, F.lit(0.0)).otherwise(en_hits.cast("double") / sz)
            quality = F.round(
                0.5 * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
                + 0.25 * (1.0 - F.least(prv * 5.0, F.lit(1.0)))
                + 0.25 * F.least(sw_ratio * 4.0, F.lit(1.0)),
                6,
            )
            return F.struct(
                n_tok.alias("n_tokens"),
                prv.alias("punct_ratio"),
                mean_len.alias("mean_tok_len"),
                sw_ratio.alias("sw_ratio"),
                en_hits.cast("long").alias("en_hits"),
                quality.alias("quality"),
            )

        return _let(tokens(text), body)

    return _let(prc, outer)


def fingerprint(text: Column) -> Column:
    """Whole-document content fingerprint: md5 of normalized text."""
    return F.md5(F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "))


WINNOW_MOD = (1 << 31) - 1
WINNOW_BASE = 257


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS scheme): polynomial k-gram hashes over normalized characters,
    the min hash of each w-window selected, distinct survivors kept.
    Guarantees any shared substring of length ≥ k + w − 1 contributes a
    shared fingerprint — the local-similarity complement of the global
    MinHash/SimHash signatures.

    The hash of the k-gram at i is ``Σ_j code[i+j]·B^(k−1−j) mod M`` —
    exactly what the classic rolling recurrence computes; the
    recurrence itself only saves a constant factor of k, and Catalyst
    higher-order functions can't carry cross-element state, so the
    unrolled k-term form (k multiply-adds per position, JVM-side,
    per-term mod keeps every intermediate < 2^41) is the right
    engine-native shape — a stateful mapInPandas rolling version would
    pay the Arrow transfer for a constant-factor win. Positions past
    the end pad with 0 (both engines agree); docs shorter than k hash
    their whole text as one gram."""
    M, pw = WINNOW_MOD, [pow(WINNOW_BASE, j, WINNOW_MOD) for j in range(k)]

    def outer(s: Column) -> Column:
        # split('') emits a trailing zero-width match on some regex
        # engines — filter keeps only real single-char tokens
        codes = F.transform(
            F.filter(F.split(s, ""), lambda c: c != F.lit("")),
            lambda c: F.ascii(c).cast("long"),
        )

        def with_codes(cs: Column) -> Column:
            def kgram_hash(i: Column) -> Column:
                acc = None
                for j in range(k):
                    t = (
                        F.coalesce(F.try_element_at(cs, i + F.lit(j)), F.lit(0))
                        * F.lit(pw[k - 1 - j])
                    ) % F.lit(M)
                    acc = t if acc is None else acc + t
                return acc % F.lit(M)

            hashes = F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(cs) - k + 1, F.lit(1))),
                kgram_hash,
            )

            def window_mins(hs: Column) -> Column:
                return F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.size(hs) - w + 1, F.lit(1))),
                        lambda j2: F.array_min(F.slice(hs, j2, w)),
                    )
                )

            return _let(hashes, window_mins)

        return _let(codes, with_codes)

    return _let(F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "), outer)


def hash60(s: Column) -> Column:
    """Engine-portable 60-bit string hash: first 15 hex chars of md5 as
    an integer (fits int64 in every engine). Used to shrink shuffle
    keys — joining on an 8-byte long instead of a shingle string —
    while an oracle reproduces it exactly."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash32(s: Column) -> Column:
    """Engine-portable 32-bit string hash: first 8 hex chars of md5 as
    an integer. Matches DuckDB ``('0x'||substr(md5(s),1,8))::BIGINT``
    bit-for-bit — used by the md5 hash_mode of MinHash/SimHash so the
    differential oracle can reproduce signatures exactly."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _let(value: Column, body) -> Column:
    """Bind ``value`` once per row and pass it to ``body`` as a lambda
    variable: ``transform(array(value), v -> body(v))[0]``.

    Catalyst has no let-binding and inlines sub-expressions into
    higher-order lambdas, re-evaluating them PER ELEMENT — e.g. a
    tokenizing regex split inside a 100-element shingle transform runs
    100× per row. Routing the value through a 1-element array pins one
    evaluation; lambda-variable references are lookups, not recompute.
    """
    return F.transform(F.array(value), body)[0]


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (the MinHash/Jaccard unit). Documents
    shorter than n tokens yield their whole text as one shingle."""

    def body(toks: Column) -> Column:
        k = F.size(toks)
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(k - n + 1, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )

    return _let(tokens(text), body)


def word_ngram_list(text: Column, n: int = 2) -> Column:
    """NON-distinct, in-order n-word grams. Repetition signals need
    frequencies, unlike the distinct shingle set of ``word_shingles``.
    Documents shorter than n tokens yield their whole text as one gram."""

    def body(toks: Column) -> Column:
        k = F.size(toks)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(k - n + 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )

    return _let(tokens(text), body)


def line_dup_ratio(text: Column) -> Column:
    """Gopher-style duplicate-line fraction: (lines − distinct lines) /
    lines over NON-BLANK lines; 0 for ≤1 line. High values mark
    boilerplate/templated pages a curation pipeline should drop."""

    def body(lines: Column) -> Column:
        k = F.size(lines)
        return (
            F.when(k <= 1, F.lit(0.0))
            .otherwise((k - F.size(F.array_distinct(lines))).cast("double") / k)
        )

    return _let(
        F.filter(F.split(text, "\n"), lambda line: F.trim(line) != ""), body
    )


def min_shingle_fingerprint(text: Column, n: int = 3) -> Column:
    """MinHash-with-one-permutation: lexicographic min of md5(shingle).
    A cheap, engine-portable near-dup fingerprint."""
    return F.array_min(F.transform(word_shingles(text, n), lambda s: F.md5(s)))


# --------------------------------------------------------------------------
# PII scrubbing (C4/RefinedWeb-style redaction pass)
# --------------------------------------------------------------------------
#
# Patterns are deliberately restricted to syntax with IDENTICAL meaning
# in Java regex (Spark) and RE2 (DuckDB oracle): character classes,
# bounded repetition, and ASCII word boundaries — no lookaround, no
# backreferences. Keys are ordered dict insertion order; scrub_pii
# applies replacements in that order (email → ipv4 → phone), and
# pii_counts counts each pattern independently on the ORIGINAL text.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def pii_counts(text: Column) -> Column:
    """``struct(email, ipv4, phone)`` match counts per document — a
    narrow JVM-side map (regexp_count), no UDF. Counts are computed on
    the unmodified input, so overlapping patterns each count their own
    matches."""
    return F.struct(
        *[
            F.regexp_count(text, F.lit(pat)).cast("long").alias(kind)
            for kind, pat in PII_PATTERNS.items()
        ]
    )


def scrub_pii(text: Column, token: str = "<PII>") -> Column:
    """Redact every PII match with ``token``, applying PII_PATTERNS in
    insertion order (email first, so an address is consumed before its
    domain-less remnants could feed later patterns). Idempotent as long
    as ``token`` itself matches no pattern."""
    out = text
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out
