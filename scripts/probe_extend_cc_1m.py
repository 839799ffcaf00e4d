"""r11 scale probe: incremental connected components at 1M nodes —
the iteration is O(affected), but the WRITE rewrites every partition a
touched comp hashes into (~ touched x corpus/parts rows), so the probe
measures BOTH regimes of the sizing rule the docstring states:

- well-sized (100-edge batch, parts=4096): touched comps hit a few
  percent of the partitions; extend beats the full star recompute;
- adversarial (1k-edge batch, parts=256): 1k+ touched comps hit ~all
  256 partitions and extend degenerates toward a full rewrite — the
  documented degradation, kept here as the sizing counterexample
  (this exact configuration also caught the foreign-partition
  overwrite bug the fix for which test_graph now pins);
- gate (both regimes): extend == full star recompute on every node.

Run: python scripts/probe_extend_cc_1m.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chicago_crash_data_pipeline_dashboard_spark.operators.graph import (  # noqa: E402
    connected_components,
    extend_components_at_rest,
    read_components,
    write_components,
)
from chicago_crash_data_pipeline_dashboard_spark.session import get_spark  # noqa: E402

N = 1_000_000
COMP_SIZE = 10
REGIMES = [  # (label, parts, n_merge, n_chain, n_attach)
    ("well_sized", 4096, 50, 25, 25),
    ("adversarial", 256, 500, 250, 250),
]


def run_regime(spark, work, label, parts, n_merge, n_chain, n_attach):
    path = f"{work}/cc_{label}"

    # 1M nodes, 100k components of 10 (comp = floor(node/10)*10)
    assignments = spark.range(N).select(
        F.col("id").alias("node"),
        (F.floor(F.col("id") / COMP_SIZE) * COMP_SIZE).alias("comp"),
    )
    t0 = time.perf_counter()
    write_components(assignments, path, parts=parts)
    print(f"[{label}] write={time.perf_counter() - t0:.1f}s parts={parts}", flush=True)

    import numpy as np

    rng = np.random.RandomState(7)
    merge = [
        (int(a) * COMP_SIZE + int(rng.randint(COMP_SIZE)),
         int(b) * COMP_SIZE + int(rng.randint(COMP_SIZE)))
        for a, b in rng.randint(0, N // COMP_SIZE, size=(n_merge, 2))
    ]
    chain = [(N + i, N + i + 1) for i in range(0, 2 * n_chain, 2)]
    attach = [
        (int(rng.randint(N)), N + 10_000_000 + i) for i in range(n_attach)
    ]
    edges = spark.createDataFrame(merge + chain + attach, "src long, dst long")

    t0 = time.perf_counter()
    stats = extend_components_at_rest(spark, path, edges)
    extend_s = time.perf_counter() - t0
    print(
        f"[{label}] extend={extend_s:.1f}s touched_comps={stats['touched_comps']} "
        f"rewritten_parts={stats['rewritten_parts']}/{parts} "
        f"rows_rewritten={stats['n_updated']}",
        flush=True,
    )

    # the alternative: full star recompute over all 1M rows + batch
    star = assignments.select(F.col("node").alias("src"), F.col("comp").alias("dst"))
    t0 = time.perf_counter()
    full = connected_components(star.unionByName(edges)).persist()
    n_full = full.count()
    full_s = time.perf_counter() - t0
    print(
        f"[{label}] full_recompute={full_s:.1f}s nodes={n_full} "
        f"(compute only — the in-place alternative is recompute + the "
        f"full-table rewrite measured by this regime's write= line)",
        flush=True,
    )

    # agreement on every node either path could have moved
    at_rest = read_components(spark, path)
    diff = (
        at_rest.withColumnRenamed("comp", "c1")
        .join(full.withColumnRenamed("comp", "c2"), "node", "full")
        .filter(
            F.col("c1").isNull() | F.col("c2").isNull() | (F.col("c1") != F.col("c2"))
        )
        .count()
    )
    full.unpersist()
    assert diff == 0, f"[{label}] {diff} nodes disagree with the full recompute"
    print(f"[{label}] agreement: extend == full recompute on all nodes", flush=True)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="ccpd_extcc1m_")
    spark = get_spark(app_name="extend_cc_1m_probe")
    for regime in REGIMES:
        run_regime(spark, work, *regime)
    print(f"workdir kept: {work}", flush=True)


if __name__ == "__main__":
    main()
