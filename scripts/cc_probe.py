"""Instrumented runner for the er_cc_clusters query: splits edge-build vs
CC-loop wall and counts driver jobs per phase (VERDICT r4 #1 bisect tool).

Usage: python scripts/cc_probe.py [sf_dir] [reps]
Prints one JSON line per rep: {"edge_build_sec", "cc_sec", "collect_sec",
"jobs_edge", "jobs_cc", "rows"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from belb_spark.session import get_spark  # noqa: E402
from belb_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402
from belb_spark.operators.clustering import connected_components  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="cc_probe")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select(F.col("doc_id").cast("long"), "text")
        .repartition(32)
    )
    docs.write.mode("overwrite").format("noop").save()

    for _ in range(reps):
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        edges = ngram_jaccard_pairs(docs, "doc_id", "text", 5, 0.3).select(
            F.col("id_a").alias("uid_a"), F.col("id_b").alias("uid_b")
        )
        # materialize the edge set once so the CC phase is cleanly separable
        edges = edges.localCheckpoint(eager=True)
        n_edges = edges.count()
        t1 = time.time()
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        nodes = docs.select(F.col("doc_id").alias("uid"))
        out = connected_components(edges, nodes)
        t2 = time.time()
        j2 = len(tracker.getJobIdsForGroup(None) or [])
        rows = out.count()
        t3 = time.time()
        j3 = len(tracker.getJobIdsForGroup(None) or [])
        print(
            json.dumps(
                {
                    "edge_build_sec": round(t1 - t0, 3),
                    "cc_sec": round(t2 - t1, 3),
                    "collect_sec": round(t3 - t2, 3),
                    "jobs_edge": j1 - j0,
                    "jobs_cc": j2 - j1,
                    "jobs_collect": j3 - j2,
                    "n_edges": n_edges,
                    "rows": rows,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
