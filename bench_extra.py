#!/usr/bin/env python3
"""Per-query isolation bench (guide §1.4): noop-sink timing + plan
capture for any subset of the declared queries, independent of the
FROZEN bench.py. Usage:

    python bench_extra.py --queries simhash,doc_fingerprint \
        --sf-dir /root/testdata/sf1.0 --passes 3 --plans plans/r06 \
        --suffix _before

Prints one JSON line {"queries": {name: best_sec}, "samples": {...}}.
Pass 1 is a warm-up (python workers, codegen) and is excluded when
passes > 1, mirroring bench.py's methodology.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="headline")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to dump explain('formatted') into")
    ap.add_argument("--suffix", default="",
                    help="suffix for plan files, e.g. _before/_after")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import __spark_entry__ as entry
    from adscraper_spark.session import build_session

    q = entry.queries()
    if args.queries == "all":
        names = sorted(q)
    elif args.queries == "headline":
        import bench
        names = bench.HEADLINE
    else:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in q]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = build_session(app="bench_extra", cpus=args.cpus,
                          shuffle_partitions=max(8, args.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = q[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for p in range(args.passes):
        for name in names:
            spark.sparkContext.setJobDescription(
                f"bench_extra:{name} pass{p}")
            t0 = time.time()
            (q[name](spark, args.sf_dir)
             .write.format("noop").mode("overwrite").save())
            dt = round(time.time() - t0, 3)
            if p > 0 or args.passes == 1:
                samples[name].append(dt)
            spark.sparkContext.setJobDescription(None)
    best = {n: min(v) for n, v in samples.items()}
    print(json.dumps({"sf_dir": args.sf_dir, "queries": best,
                      "samples": samples}))


if __name__ == "__main__":
    main()
