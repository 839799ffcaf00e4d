"""Corpus-curation operators a production training-data pipeline runs
between dedup and packing: per-source caps and boilerplate stripping.

Both are single-digit-shuffle column plans (no UDFs):

- ``cap_per_key``: at most K rows per key, deterministic priority —
  the crawl-pipeline "domain cap" that stops one source from dominating
  a mixture (one window shuffle on the key);
- ``strip_boilerplate_lines``: drop lines that repeat across a large
  fraction of a source's documents (headers/footers/nav chrome — the
  CCNet-style per-domain boilerplate trim). One explode + one
  doc-frequency groupBy; the resulting boilerplate set is tiny and
  broadcasts back against the exploded lines.

Both are driver-gated (``doc_cap_per_source``, ``doc_strip_boilerplate``
— green since round 5) on top of the unit tests pinning semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _guard_reserved(df: DataFrame, *names: str) -> None:
    """Internal temp columns must not silently shadow user columns —
    a caller whose frame already has ``_rn``/``_pos``/... would get
    that column dropped or rewritten without any error."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with reserved internal names; "
            "rename them before calling"
        )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    order_by: list[Column],
    salts: int | None = None,
) -> DataFrame:
    """At most ``k`` rows per key; ``order_by`` is the REQUIRED explicit
    priority (e.g. quality desc, id asc) deciding which rows survive.
    It must be a total order within each key (end with a unique
    tiebreaker like the id) — anything weaker makes the survivors
    partition-layout-dependent on a cluster, the silent
    nondeterminism this signature exists to prevent.

    One shuffle (the window partition); pass ``salts`` for the
    two-phase skew-safe variant (same results, proven by test): a hot
    key's rows first reduce to top-k per content-hash salt bucket, so
    no single task ever windows the key's full population — at 100 TB
    one dominant domain would otherwise serialize onto one core.
    Output per key is capped at k either way, so downstream stages see
    at most k·n_keys rows."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not order_by:
        raise ValueError("order_by must name an explicit, total per-key priority")
    _guard_reserved(df, "_rn")
    if salts is not None:
        if salts <= 1:
            raise ValueError(f"salts must be > 1, got {salts}")
        # Two-phase (skew-safe) cap: stage 1 keeps top-k per
        # (key, salt) — for ANY row partitioning, the union of
        # per-group top-ks under one total order is a superset of the
        # global top-k, so stage 2's exact window sees at most
        # k·salts rows per key instead of the key's full population.
        # The salt hashes the ROW CONTENT (all columns), not a random
        # or monotonic id: a recomputed task re-derives identical
        # salts, so shuffle retries can't produce a different stage-1
        # survivor set (the classic nondeterministic-repartition
        # corruption).
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))
        w1 = Window.partitionBy(F.col(key_col), salt).orderBy(*order_by)
        df = (
            df.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    w = Window.partitionBy(key_col).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str,
    group_col: str,
    min_docs: int = 3,
    frac: float = 0.5,
) -> DataFrame:
    """(group, line) pairs that qualify as boilerplate: the non-blank
    line appears in ≥ ``frac`` of the group's documents and the group
    has ≥ ``min_docs`` documents. Counted once per document
    (array_distinct before the explode), so a line repeated inside one
    doc doesn't inflate its document frequency."""
    if not 0.0 < frac <= 1.0:
        # frac=0 would flag EVERY line as boilerplate
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    lines = df.select(
        F.col(group_col).alias("_grp"),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != "")
            )
        ).alias("_line"),
    )
    grp_sizes = df.groupBy(F.col(group_col).alias("_grp")).agg(
        F.count(F.lit(1)).alias("_n_docs")
    )
    return (
        lines.groupBy("_grp", "_line")
        .agg(F.count(F.lit(1)).alias("_df"))
        .join(grp_sizes, "_grp")
        .filter(
            (F.col("_n_docs") >= min_docs)
            & (F.col("_df") >= F.col("_n_docs") * F.lit(frac))
        )
        .select("_grp", "_line")
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_docs: int = 3,
    frac: float = 0.5,
) -> DataFrame:
    """Rewrite ``text_col`` with the group's boilerplate lines removed
    (original line order preserved; blank lines kept — they're
    formatting, not boilerplate). All other columns pass through.
    NULL texts stay NULL (a missing document is not an empty one);
    ``id_col`` must be unique — colliding ids would merge two
    documents' lines in the regroup.

    Plan: posexplode keeps each line's position; the boilerplate set
    joins back as a broadcast left_anti (it's per-group tiny by
    construction — a group has few lines above a 50% doc-frequency);
    one groupBy on the id reassembles survivors in position order. The
    explode→regroup round trip is one shuffle on the id, and the text
    never moves twice: only lines travel."""
    _guard_reserved(df, "_id", "_grp", "_pos", "_line", "_clean_text")
    boiler = boilerplate_lines(df, text_col, group_col, min_docs, frac)
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_grp"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )
    kept = exploded.join(F.broadcast(boiler), ["_grp", "_line"], "left_anti")
    rebuilt = (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("_clean_text")
        )
    )
    # missing rebuilt text means every line was boilerplate → "", but a
    # NULL input text stays NULL (a missing document is not an empty one)
    stripped = F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(
        F.coalesce(F.col("_clean_text"), F.lit(""))
    )
    out = df.join(rebuilt, df[id_col] == rebuilt["_id"], "left").select(
        *[stripped.alias(text_col) if c == text_col else F.col(c) for c in df.columns]
    )
    return out
