#!/usr/bin/env python
"""Interleaved A/B for the r16 query rewrites: the r15 form (copied
verbatim from git 1ec171e) vs the current registry fn, alternated
old,new,new,old per pair within ONE session so host drift hits both
forms equally. Keep-on-win-or-tie in every pair (r15 discipline).

Usage: AB_PAIRS=4 AB_ONLY=quantiles python scripts/ab_r16_queries.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from chicago_crash_data_pipeline_dashboard_spark.plans import (  # noqa: F401
    QUERIES,
    analytics,
    crash_ops,
    jobspec_ops,
    llm_ops,
    ml_ops,
)
from chicago_crash_data_pipeline_dashboard_spark.plans.registry import load
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark


# ---- r15 forms, verbatim from git 1ec171e ---------------------------------


def old_quantiles(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    qty = li.agg(F.expr("percentile(l_quantity, array(0.5, 0.95))").alias("q"))
    v = li.select(F.col("l_extendedprice").alias("v")).where(F.col("v").isNotNull())
    ranked = v.select(
        "v",
        F.row_number().over(W.orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    keeps, aggs = [], []
    for i, p in enumerate((0.5, 0.95)):
        pos = (F.col("n") - 1) * F.lit(p)
        lo, hi = F.floor(pos) + 1, F.ceil(pos) + 1
        keeps.append((F.col("rn") == lo) | (F.col("rn") == hi))
        vlo = F.max(F.when(F.col("rn") == lo, F.col("v")))
        vhi = F.max(F.when(F.col("rn") == hi, F.col("v")))
        posv = F.max(pos)
        aggs.append((vlo + (vhi - vlo) * (posv - F.floor(posv))).alias(f"p{i}"))
    price = ranked.where(keeps[0] | keeps[1]).agg(*aggs)
    return qty.crossJoin(price).select(
        F.round(F.col("q")[0], 6).alias("median_qty"),
        F.round(F.col("q")[1], 6).alias("p95_qty"),
        F.round(F.col("p0"), 6).alias("median_price"),
        F.round(F.col("p1"), 6).alias("p95_price"),
    )


def old_crash_model_eval(spark, sf_dir):
    from chicago_crash_data_pipeline_dashboard_spark.ml import pipeline as MLP
    from chicago_crash_data_pipeline_dashboard_spark.operators.clean import clean_crashes
    from chicago_crash_data_pipeline_dashboard_spark.plans.crash_ops import synth_bronze_spark
    from chicago_crash_data_pipeline_dashboard_spark.plans.ml_ops import _metrics_df

    cleaned = (
        clean_crashes(synth_bronze_spark(spark, sf_dir))
        .select(
            "crash_record_id",
            MLP.LABEL,
            *MLP.FEATURES_NUMERIC,
            *MLP.FEATURES_CATEGORICAL,
        )
        .persist()
    )
    n_cleaned = cleaned.count()
    target = max(1, min(spark.sparkContext.defaultParallelism, n_cleaned // 20_000))
    key = F.substring("crash_record_id", 3, 8).cast("int")
    train_df = cleaned.filter(key % 5 != 0)
    test_df = cleaned.filter(key % 5 == 0)
    if train_df.rdd.getNumPartitions() < target:
        train_df = train_df.repartition(target)
    model = MLP.train(train_df, max_iter=3, max_depth=3)
    scored = MLP.score(model, test_df, threshold=MLP.DEFAULT_THRESHOLD)
    y, p = F.col("hit_and_run_i"), F.col("hit_run_pred")
    metrics = _metrics_df(
        scored.agg(
            F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
            F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
            F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
            F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
        )
    )
    counts = train_df.agg(F.count(F.lit(1)).alias("n_train")).crossJoin(
        test_df.agg(F.count(F.lit(1)).alias("n_test"))
    )
    in01 = lambda c: (F.col(c) >= 0.0) & (F.col(c) <= 1.0)  # noqa: E731
    out = metrics.crossJoin(counts).select(
        "n_train",
        "n_test",
        (
            (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")) == F.col("n_test")
        ).alias("counts_consistent"),
        (
            in01("accuracy") & in01("precision") & in01("recall") & in01("f1")
        ).alias("metrics_in_range"),
    )
    row = out.first()
    cleaned.unpersist()
    return spark.createDataFrame([row], out.schema)


OLD = {"quantiles": old_quantiles, "crash_model_eval": old_crash_model_eval}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pairs = int(os.environ.get("AB_PAIRS", "4"))
    only = os.environ.get("AB_ONLY")
    spark = get_spark(app_name="ab_r16_queries")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    print(f"loadavg start {[round(v, 2) for v in os.getloadavg()]}")

    def run(fn):
        t0 = time.perf_counter()
        j0 = sc._jsc.sc().dagScheduler().nextJobId()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        j1 = sc._jsc.sc().dagScheduler().nextJobId()
        return time.perf_counter() - t0, j1 - j0

    for name, old_fn in OLD.items():
        if only and only not in name:
            continue
        res = {"old": [], "new": []}
        jobs = {"old": 0, "new": 0}
        for i in range(pairs):
            for mode in ("old", "new") if i % 2 == 0 else ("new", "old"):
                dt, nj = run(old_fn if mode == "old" else QUERIES[name].fn)
                res[mode].append(dt)
                jobs[mode] = nj
        wins = sum(1 for o, n in zip(res["old"], res["new"]) if n <= o * 1.02)
        print(
            f"{name}: old={[round(v, 3) for v in res['old']]} "
            f"new={[round(v, 3) for v in res['new']]} "
            f"median old={statistics.median(res['old']):.3f} "
            f"new={statistics.median(res['new']):.3f} "
            f"jobs old={jobs['old']} new={jobs['new']} "
            f"new win-or-tie {wins}/{pairs} pairs",
            flush=True,
        )
    print(f"loadavg end {[round(v, 2) for v in os.getloadavg()]}")
    spark.stop()


if __name__ == "__main__":
    main()
