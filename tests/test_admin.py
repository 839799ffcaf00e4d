"""M5 — destructive admin ops (operators/admin.py): prefix preview +
delete, store wipe preserving the root, gold drop + recreate-on-write.
Reference parity: streamlit_frontend.py:355-412, 468-483."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from chicago_crash_data_pipeline_dashboard_spark.operators import admin
from chicago_crash_data_pipeline_dashboard_spark.operators.gold import GoldTable
from chicago_crash_data_pipeline_dashboard_spark.sources.bronze import write_bronze


def _seed_bronze(spark, base):
    df = spark.createDataFrame(
        [("CR1", "2021-01-01"), ("CR2", "2022-02-02")],
        "crash_record_id string, crash_date string",
    )
    write_bronze(df, base, "crashes", corr="runA", fmt="json")
    write_bronze(df, base, "crashes", corr="runB", fmt="json")


def test_list_and_remove_prefix(spark, tmp_path):
    base = str(tmp_path / "bronze")
    _seed_bronze(spark, base)
    run_a = f"{base}/crashes/year=2021/corr=runA"
    preview = admin.list_prefix(spark, run_a)
    assert preview and all("corr=runA" in p for p in preview)

    # confirm gate: nothing is touched without confirm=True
    with pytest.raises(ValueError, match="confirm=True"):
        admin.remove_prefix(spark, run_a)
    assert admin.list_prefix(spark, run_a) == preview

    assert admin.remove_prefix(spark, run_a, confirm=True) == len(preview)
    assert admin.list_prefix(spark, run_a) == []
    # the sibling run's partition survives
    assert admin.list_prefix(spark, f"{base}/crashes/year=2021/corr=runB")
    # deleting a missing prefix reports 0, no error
    assert admin.remove_prefix(spark, run_a, confirm=True) == 0


def test_wipe_store_preserves_root(spark, tmp_path):
    base = str(tmp_path / "bronze")
    _seed_bronze(spark, base)
    n_before = len(admin.list_prefix(spark, base))
    assert n_before > 0
    with pytest.raises(ValueError, match="confirm=True"):
        admin.wipe_store(spark, base)
    assert admin.wipe_store(spark, base, confirm=True) == n_before
    # reference: "Bucket structure is preserved (recreated on next write)"
    assert os.path.isdir(base)
    assert admin.list_prefix(spark, base) == []
    _seed_bronze(spark, base)  # next write recreates the layout
    assert len(admin.list_prefix(spark, base)) == n_before


def test_drop_gold_and_recreate(spark, tmp_path):
    path = str(tmp_path / "gold")
    gold = GoldTable(spark, path)
    df = spark.createDataFrame(
        [("CR1", dt.date(2021, 1, 1))], "crash_record_id string, crash_date date"
    )
    assert gold.upsert(df, corr_id="r1")["inserted"] == 1
    assert gold.exists()
    with pytest.raises(ValueError, match="confirm=True"):
        admin.drop_gold(spark, path)
    assert admin.drop_gold(spark, path, confirm=True) is True
    assert not gold.exists()
    # reference: "Database will be recreated on next cleaner run"
    assert gold.upsert(df, corr_id="r2")["inserted"] == 1
    assert gold.read().count() == 1
    # dropping a missing table warns-by-return, not by error
    admin.drop_gold(spark, path, confirm=True)
    assert admin.drop_gold(spark, path, confirm=True) is False
