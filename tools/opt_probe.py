"""Round-13 optimization probe — per-query solo timing + plan capture.

Usage:
    python tools/opt_probe.py q1 q2 ...            # time (median of N)
    python tools/opt_probe.py --plan before q1 ... # also write
                                                   # plans/r13/<q>_<tag>.txt
    python tools/opt_probe.py --reps 5 q1

Methodology matches bench.py (guide §1.4): one warm-up run, then the
median of ``--reps`` (default 3) timed runs forced through the ``noop``
sink so the measurement covers the computation, not the sink or driver
row deserialization. Jobs are labelled via setJobDescription (guide
§1.5). Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
master local[$SPARK_GRAFT_CPUS] via the shared session factory.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--plan",
        default=None,
        metavar="TAG",
        help="write plans/<round>/<query>_<TAG>.txt (round from $SPARK_GRAFT_ROUND, default r14) with explain('formatted')",
    )
    ap.add_argument("--no-time", action="store_true", help="plan capture only")
    args = ap.parse_args()

    from data_ingestion_tool_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(app_name="opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / os.environ.get("SPARK_GRAFT_ROUND", "r14")
    plans_dir.mkdir(parents=True, exist_ok=True)

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in args.names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY", file=sys.stderr)
            continue
        fn = qs[name]
        if args.plan:
            df = fn(spark, SF_DIR)
            plan_txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = plans_dir / f"{name}_{args.plan}.txt"
            out.write_text(plan_txt)
            n_ex = plan_txt.count("Exchange")
            joins = [
                t
                for t in (
                    "BroadcastHashJoin",
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin",
                    "CartesianProduct",
                )
                if t in plan_txt
            ]
            pyn = [
                t
                for t in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                          "MapInArrow", "FlatMapGroupsInPandas")
                if t in plan_txt
            ]
            print(
                f"{name}: plan -> {out.name}  Exchange={n_ex} "
                f"joins={','.join(joins) or '-'} py={','.join(pyn) or '-'}"
            )
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"opt-probe:{name}")
        try:
            run_once(fn)  # warm-up
            vals = [run_once(fn) for _ in range(args.reps)]
            med = statistics.median(vals)
            print(
                f"{name}: {med:.3f}s  (runs: "
                + ", ".join(f"{v:.3f}" for v in vals)
                + ")"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        finally:
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
