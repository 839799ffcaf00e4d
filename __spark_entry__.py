"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in
``chicago_crash_data_pipeline_dashboard_spark``; this module only
adapts the query registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chicago_crash_data_pipeline_dashboard_spark.plans import QUERIES  # noqa: E402
from chicago_crash_data_pipeline_dashboard_spark.plans import analytics  # noqa: F401,E402
from chicago_crash_data_pipeline_dashboard_spark.plans import crash_ops  # noqa: F401,E402
from chicago_crash_data_pipeline_dashboard_spark.plans import jobspec_ops  # noqa: F401,E402
from chicago_crash_data_pipeline_dashboard_spark.plans import llm_ops  # noqa: F401,E402
from chicago_crash_data_pipeline_dashboard_spark.plans import ml_ops  # noqa: F401,E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver records correctness rows for the first 50 queries in
# registration order, but more are registered than fit — so ordering
# is a COVERAGE decision, tracked in COVERAGE.md §"Driver-sample
# rotation". _ordered_names guards the invariant that matters: every
# query NOT in _ROTATION_BENCHED must land inside the 50-row sample
# (a registration without a matching benched entry raises).
#
# Sampled first: queries that have never had a driver correctness row
# (r1-r3) or were displaced from the r3 sample. Sampled last (i.e.
# rotated out this round): queries green in BOTH r2 and r3 with
# unchanged code — they rotate back in next round.
_VERIFY_FIRST = [
    "crash_model_eval",  # never driver-sampled r1-r3 (the MLlib scoring path)
    "emb_ivf_topk",  # never driver-sampled
    "media_frame_plan",  # never driver-sampled
    "event_windowed_counts_stream",  # new in r4
    "jobspec_extract",  # new in r4 (P1/P2/W1/ST4 gate)
    "silver_catalog_validate",  # new in r4 (S12/S13/S14 gate)
    "skew_salted_join_agg",  # new in r4 (skew toolkit gate)
    "doc_repetition_stats",  # new in r4 (Gopher repetition signals)
    "promo_part_star",  # new in r4 (part/supplier star join)
    "compact_small_files",  # new in r4 (compaction maintenance gate)
    "event_error_click_window_stream",  # new in r4 (stream-stream join gate)
    "doc_winnow_fp",  # new in r4 (winnowing rolling-hash fingerprints)
    "doc_decontaminate",  # new in r4 (eval-set n-gram-overlap scrub)
    "emb_quantize_error",  # new in r4 (int8 quantization error gate)
    "doc_stratified_sample",  # new in r4 (mixing-weight sampling gate)
    "doc_pack_bins",  # new in r4 (sequence-packing accounting)
    "doc_quality_buckets",  # new in r4 (CCNet head/middle/tail terciles)
    "doc_pii_scrub",  # new in r4 (PII redaction gate, injected fixtures)
    "orc_roundtrip_stats",  # new in r4 (ORC source/sink breadth)
    "emb_pq_topk",  # new in r4 (product-quantization ANN + exact refine)
    "bucketed_join_agg",  # new in r4 (co-located bucketed join gate)
    "doc_chunk_overlap",  # new in r4 (sliding-window chunking)
    "sql_adhoc_query",  # new in r4 (verbatim SQL pass-through, one text two engines)
    "event_props_json",  # new in r4 (schema-on-read JSON extraction)
    "schema_evolution_merge",  # new in r4 (mergeSchema backfill gate)
    "json_malformed_ingest",  # new in r4 (PERMISSIVE corrupt-record gate)
    "partition_overwrite_dynamic",  # new in r4 (partition-scoped backfill)
    "incremental_agg_merge",  # new in r4 (partial-agg merge = IVM combine)
    "event_funnel_steps",  # new in r4 (ordered conversion funnel)
    "user_retention_cohorts",  # new in r4 (weekly retention triangle)
    "event_dedup_watermark_stream",  # new in r4 (bounded-state stream dedup)
    "doc_quality_regression",  # new in r4 (exact-moment per-source OLS)
    "binary_file_ingest",  # new in r4 (binaryFile source → header decode)
    "crash_rule_eval",  # green r2, fell out of the r3 sample
    "doc_training_pipeline",  # green r2, fell out of the r3 sample
]
_ROTATION_BENCHED = [
    "eda_day_labels",
    "run_history",
    "value_counts_topk",
    "whitelist_recode",
    "unpivot_daily_events",
    "hash_sample_stats",
    "dedup_keep_first",  # green r2+r3, benched r4
    "price_bins",  # green r2+r3, benched r4
    "order_key_setops",  # green r2+r3, benched r4
    "semi_join_discounted",  # green r2+r3, benched r4
    "time_features",  # green r2+r3, benched r4
    "null_profile",  # green r2+r3, benched r4
    "corr_stats",  # green r2+r3, benched r4
    "crash_hit_run_rate_by_weather",  # green r2+r3, benched r4
    "doc_lang_confusion",  # green r2+r3, benched r4
    "doc_text_stats",  # green r2+r3, benched r4
    "doc_min_shingle_fp",  # green r2+r3, benched r4
    "doc_exact_dup_stats",  # green r2+r3, benched r4
    "doc_dedup_exact_by_source",  # green r2+r3, benched r4
    "doc_simhash",  # green r2+r3, benched r4
    "emb_knn_brute",  # green r2+r3, benched r4
    "pivot_hour_dow",  # green r2+r3, benched r4
    "rate_by_priority",  # green r2+r3, benched r4
    "running_customer_revenue",  # green r2+r3, benched r4
    "sliding_event_counts",  # green r2+r3, benched r4
    "event_error_click_window",  # green r2+r3, benched r4
    "event_asof_last_click",  # green r2+r3, benched r4
    "event_sessions",  # green r2+r3, benched r4
    "event_zorder_keys",  # green r2+r3, benched r4
    "anti_join_new_keys",  # green r2+r3, benched r4
    "topk_orders_by_revenue",  # green r2+r3, benched r4
    "quantiles",  # green r2+r3, benched r4
    "revenue_rollup",  # green r2+r3, benched r4
    "approx_sketch_stats",  # green r2+r3, benched r4
    "customer_orders_wide",  # green r2+r3, benched r4
]


_DRIVER_SAMPLE_ROWS = 50


def _ordered_names() -> list[str]:
    missing = [n for n in _VERIFY_FIRST + _ROTATION_BENCHED if n not in QUERIES]
    if missing:  # fail loudly on a rename, not silently mis-sample
        raise KeyError(f"rotation lists reference unregistered queries: {missing}")
    middle = [
        n for n in QUERIES if n not in _VERIFY_FIRST and n not in _ROTATION_BENCHED
    ]
    # fail loudly on COUNT drift too: a query registered without a
    # matching _ROTATION_BENCHED entry would otherwise silently push
    # the last un-benched query out of the driver's sample
    unsampled = len(_VERIFY_FIRST) + len(middle) - _DRIVER_SAMPLE_ROWS
    if unsampled > 0:
        raise ValueError(
            f"{unsampled} non-benched quer{'y' if unsampled == 1 else 'ies'} "
            f"fall outside the driver's {_DRIVER_SAMPLE_ROWS}-row sample — "
            "bench that many stable queries in _ROTATION_BENCHED (and record "
            "the rotation in COVERAGE.md)"
        )
    return [*_VERIFY_FIRST, *middle, *_ROTATION_BENCHED]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
