"""Dump .explain("formatted") for named queries to
plans/$SPARK_GRAFT_PLANS_ROUND/<q>_<tag>.txt (round defaults to r12).

Usage: python scripts/dump_plan.py <tag> <query> [<query> ...]
       python scripts/dump_plan.py <tag> --top N   (slowest N from BENCH_DETAIL.json)
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from confluent_kafka_streams_examples_spark.queries import QUERIES
from confluent_kafka_streams_examples_spark.session import get_spark, release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names and names[0] == "--top":
        n = int(names[1])
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            qs = json.load(fh)["queries"]
        names = [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:n]]
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        release_caches(spark)
        print(name)


if __name__ == "__main__":
    main()
