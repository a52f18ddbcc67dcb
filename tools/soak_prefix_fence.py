"""Adversarial soak for with_grouped_global_prefix_sum at the
max_groups fence (round-10 VERDICT item 2).

The operator's interesting regime is G near the fence with heavily
skewed group sizes: G <= max_groups must take the fast path (range
exchange + Arrow grouped-cumsum merge), G = max_groups+1 must degrade
to the plain partitioned window, and BOTH must agree with the naive
window bit-for-bit. The skew group holds 50% of all rows and therefore
spans many range partitions — the exact shape where a wrong
(pid, group) offset would corrupt every row after the first partition
boundary.

Usage: python tools/soak_prefix_fence.py [n_rows]   (default 2_000_000)
Writes tools/soak_prefix_fence.json; tools/plan_report.py embeds it
into PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent / "soak_prefix_fence.json"
FENCE = 10_000  # the operator's default max_groups


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.ranking import (
        with_grouped_global_prefix_sum,
    )
    from data_ingestion_tool_spark.session import get_spark

    spark = get_spark(app_name="soak-prefix-fence")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for g_total in (FENCE - 1, FENCE, FENCE + 1):
        # skew: even ids all land in group 0 (50% of rows); odd ids
        # spread uniformly over the remaining g_total-1 groups (via
        # id DIV 2 — raw odd id mod an even base only hits odd
        # residues and would silently halve G)
        df = (
            spark.range(n_rows)
            .select(
                F.when(F.col("id") % 2 == 0, F.lit(0))
                .otherwise((F.col("id") / 2).cast("bigint") % (g_total - 1) + 1)
                .cast("bigint")
                .alias("g"),
                F.col("id").alias("o"),
                (F.col("id") % 7 + 1).alias("v"),
            )
            .persist()
        )
        df.count()
        t0 = time.perf_counter()
        got = with_grouped_global_prefix_sum(
            df, ["g"], ["o"], "v", cum="c", n_col="n", max_groups=FENCE
        ).persist()
        got.count()
        op_secs = round(time.perf_counter() - t0, 2)
        plan = got._jdf.queryExecution().executedPlan().toString()
        fast_path = "Window" not in plan

        w = Window.partitionBy("g").orderBy("o").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        t0 = time.perf_counter()
        ref = df.select(
            "o",
            F.sum("v").over(w).cast("bigint").alias("rc"),
            F.sum("v")
            .over(Window.partitionBy("g"))
            .cast("bigint")
            .alias("rn"),
        ).persist()
        ref.count()
        ref_secs = round(time.perf_counter() - t0, 2)

        mismatches = (
            got.select("o", "c", "n")
            .join(ref, "o")
            .where((F.col("c") != F.col("rc")) | (F.col("n") != F.col("rn")))
            .count()
        )
        rows.append(
            {
                "g_total": g_total,
                "n_rows": n_rows,
                "skew_share": 0.5,
                "fast_path": fast_path,
                "expected_fast": g_total <= FENCE,
                "op_secs": op_secs,
                "naive_window_secs": ref_secs,
                "mismatches": mismatches,
            }
        )
        print(
            f"G={g_total}: fast_path={fast_path} op={op_secs}s "
            f"naive={ref_secs}s mismatches={mismatches}",
            file=sys.stderr,
        )
        got.unpersist()
        ref.unpersist()
        df.unpersist()
        assert fast_path == (g_total <= FENCE), "fence did not trigger as designed"
        assert mismatches == 0, "output diverged from the naive window"

    OUT.write_text(
        json.dumps({"max_groups": FENCE, "rows": rows}, indent=1) + "\n"
    )
    print(json.dumps({"max_groups": FENCE, "rows": rows}))


if __name__ == "__main__":
    main()
