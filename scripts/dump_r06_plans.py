#!/usr/bin/env python
"""Dump .explain('formatted') for the r6-touched bench queries.

Usage: python scripts/dump_r06_plans.py <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt for each touched query. Run from the
round-start tree with suffix=before and from the final tree with
suffix=after; the judge checks plan claims in OPTIMIZATION_r06.md against
these files.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_srp_buckets",
    "ann_srp_topk",
    "ann_ivf_topk",
    "er_cc_clusters",
]


def main() -> int:
    outdir = pathlib.Path(sys.argv[1])
    suffix = sys.argv[2]
    outdir.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as entrymod
    from belb_spark.plans import plan_string
    from belb_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("plans_r06", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        s = plan_string(df, "formatted")
        (outdir / f"{name}_{suffix}.txt").write_text(s)
        print(f"wrote {name}_{suffix}.txt ({len(s)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
