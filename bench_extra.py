"""Round-6 optimization instrumentation (bench.py is FROZEN — this
file holds the extra measurements the optimization round needs).

Modes:
  python bench_extra.py plans <outdir> [names...]   -> dump explain("formatted")
  python bench_extra.py time [reps] [names...]      -> per-query noop-sink times
  python bench_extra.py jobs [names...]             -> Spark job count per query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from bench import BENCH_QUERIES, SF_DIR  # noqa: E402
from news_crawler_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _spark():
    spark = get_spark("bench-extra", cpus=CPUS, shuffle_partitions=CPUS)
    # warm-up identical to bench.py
    _force(spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000))
    return spark


def dump_plans(outdir: str, names: list[str]) -> None:
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}")
    spark.stop()


def time_queries(reps: int, names: list[str]) -> None:
    spark = _spark()
    qs = entry_mod.queries()
    out: dict[str, list[float]] = {}
    for r in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            out.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    best = {k: min(v) for k, v in out.items()}
    print(json.dumps({"samples": out, "best": best,
                      "total_best": round(sum(best.values()), 3)}))


def count_jobs(names: list[str]) -> None:
    spark = _spark()
    qs = entry_mod.queries()
    out = {}
    for name in names:
        n0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        _force(qs[name](spark, SF_DIR))
        n1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        out[name] = {"jobs": n1 - n0,
                     "sec": round(time.perf_counter() - t0, 3)}
    print(json.dumps(out, indent=1))
    spark.stop()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "plans":
        outdir = sys.argv[2]
        names = sys.argv[3:] or BENCH_QUERIES
        dump_plans(outdir, names)
    elif mode == "jobs":
        names = sys.argv[2:] or BENCH_QUERIES
        count_jobs(names)
    else:
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
        names = sys.argv[3:] or BENCH_QUERIES
        time_queries(reps, names)


if __name__ == "__main__":
    main()
