"""Round-6 optimization harness (guide §1): isolates each declared query
with the noop sink, times best-of-N after an untimed warmup, records the
host CPU calibration from bench.py alongside every run, and optionally
captures `.explain("formatted")` plans into plans/r06/.

This file is SEPARATE from bench.py (which is frozen for measurement).

Usage:
  python bench_extra.py                      # time every bench query
  python bench_extra.py span_dedup_documents # one query
  python bench_extra.py --plans [names...]   # also write plans/r06/<q>_<tag>.txt
  MDV_PLAN_TAG=before|after                  # plan filename suffix
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = (
    "row_orders",
    "unique_lineitem_orderkey",
    "group_profile_lineitem",
    "text_profile_documents",
    "minhash_pairs_documents",
    "topk_embeddings",
    "quality_spec_documents",
    "gopher_gate_documents",
    "pack_documents",
    "dedup_survivors_documents",
    "association_drift_lineitem",
    "concentration_gate_documents",
    "reconcile_fp_orders",
    "chunk_documents",
    "sessions_events",
    "zipf_documents",
    "span_dedup_documents",
)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("MDV_BENCH_TRIALS", "3"))
    plan_tag = os.environ.get("MDV_PLAN_TAG", "")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_plans = "--plans" in sys.argv[1:]

    import __spark_entry__ as entry_mod
    from bench import _host_calibration
    from mdvalidate_spark.session import get_spark

    spark = get_spark(
        app_name="mdv-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    names = args or [n for n in BENCH_QUERIES if n in qs]
    times: dict[str, float] = {}
    raw: dict[str, list] = {}
    for name in names:
        if want_plans and plan_tag:
            os.makedirs("plans/r06", exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{plan_tag}.txt", "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"warmup {name}")
        _noop(qs[name](spark, sf_dir))
        for t in range(trials):
            spark.sparkContext.setJobDescription(f"{name} trial {t}")
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            dt = time.time() - t0
            raw.setdefault(name, []).append(round(dt, 3))
            times[name] = min(times.get(name, float("inf")), dt)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: best {times[name]:.3f}s of {raw[name]}", flush=True)

    out = {
        "queries_best": {k: round(v, 3) for k, v in times.items()},
        "trials_raw": raw,
        "trials": trials,
        "sf_dir": sf_dir,
        "cpus": cpus,
        **_host_calibration(cpus),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
