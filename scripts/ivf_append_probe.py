"""Incremental-IVF maintenance probe: APPEND vs REBUILD at corpus
scale (VERDICT r9 #4's cost claim, measured).

The claim the incremental path makes: absorbing a day batch costs
O(batch) — assign the new vectors to the frozen codebook and append
their files into the existing ``list_id=`` partition directories —
while the alternative a naive pipeline runs daily is a full rebuild,
O(index).  This probe measures both on the scale_probe's replicated
embeddings corpus and asserts the append didn't break partition
pruning (the probe query still reads only probed list directories).

Phases timed, each starting from a cold artifact root:

  codebook   train the corpus codebook artifact (once per corpus)
  build      assign the 90% corpus split + write partitioned index
  append     assign the 10% day batch + append into the partitions
  probe      similarity_ivf_append end-to-end (DPP-pruned scan)

Usage (repo root):
    python scripts/ivf_append_probe.py [replicas ...]   # default: 1 100

Prints one JSON line per corpus plus a markdown row for SCALE.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from confluent_kafka_streams_examples_spark.session import get_spark  # noqa: E402


def main() -> None:
    replicas = [int(a) for a in sys.argv[1:]] or [1, 100]
    from scripts.scale_probe import build_corpus

    import confluent_kafka_streams_examples_spark.queries_extra as qx
    from confluent_kafka_streams_examples_spark import artifacts

    results = []
    for r in replicas:
        sf_dir = (
            "/root/testdata/sf0.1" if r == 1
            else build_corpus(r, tables={"embeddings"})
        )
        spark = get_spark(f"ckse-ivf-append-x{r}")
        spark.sparkContext.setLogLevel("ERROR")

        # cold start: retire any prior artifacts for this corpus
        shutil.rmtree(artifacts.artifact_root(), ignore_errors=True)

        t0 = time.perf_counter()
        qx._ivf_codebook_corpus_table(spark, sf_dir).count()
        t_codebook = time.perf_counter() - t0

        t0 = time.perf_counter()
        path = qx._ivf_index_base_table(spark, sf_dir)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        idx = qx._ivf_index_appended_table(spark, sf_dir)
        t_append = time.perf_counter() - t0
        n_total = idx.count()
        n_new = idx.filter("vec_id % 10 = 0").count()

        t0 = time.perf_counter()
        from confluent_kafka_streams_examples_spark.plans.describe import (
            explain_str,
        )

        out = qx.similarity_ivf_append(spark, sf_dir)
        plan = explain_str(out, "formatted")
        rows = out.count()
        t_probe = time.perf_counter() - t0
        pruned = any(
            "list_id" in ln and "dynamicpruning" in ln
            for ln in plan.splitlines()
            if "PartitionFilters" in ln
        )
        n_lists = len(glob.glob(os.path.join(path, "list_id=*")))
        spark.stop()

        rec = {
            "replicas": r,
            "n_vectors": n_total,
            "n_appended": n_new,
            "n_lists": n_lists,
            "codebook_s": round(t_codebook, 2),
            "build_s": round(t_build, 2),
            "append_s": round(t_append, 2),
            "append_over_build": round(t_append / t_build, 3),
            "probe_s": round(t_probe, 2),
            "probe_rows": rows,
            "probe_pruned": pruned,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n| corpus | vectors | appended | build s | append s | append/build | probe s (pruned) |")
    print("|---|---|---|---|---|---|---|")
    for x in results:
        print(
            f"| x{x['replicas']} | {x['n_vectors']:,} | {x['n_appended']:,} "
            f"| {x['build_s']} | {x['append_s']} | {x['append_over_build']} "
            f"| {x['probe_s']} ({x['probe_pruned']}) |"
        )


if __name__ == "__main__":
    main()
