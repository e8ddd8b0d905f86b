"""Dedup-flagship scaling: extend the 5k/20k/100k table one decade to
1M unique synthetic docs (VERDICT r04 next-round #6), reporting the
signatures-stage vs candidate-stage wall split plus the lineage
side-table's per-stage row counts.

Protocol matches BENCH/BASELINE.md round 3/4: UNIQUE synthetic documents
(synth_pages text — no duplicate cliques, so wall measures the engine,
not output blowup), local[32], best of N subprocess-free runs, cached
input. Stage split: t_sig = materialize minhash_signatures alone;
t_full = minhash_lsh_pairs(verify=False); candidate stage = t_full -
t_sig (the signature stage is recomputed inside the full run, so the
subtraction is conservative for the candidate stage).

Usage: python scripts/dedup_scale_evidence.py [--sizes 100000 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", type=int,
                    default=[100_000, 1_000_000])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from geotiff_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_signatures,
    )
    from geotiff_spark.plans.lineage import StageMetrics
    from geotiff_spark.session import get_spark
    from geotiff_spark.sources.pages import synth_pages

    spark = get_spark("dedup-scale", master=f"local[{args.cores}]",
                      extra={"spark.sql.shuffle.partitions":
                             str(args.cores * 2)})
    spark.sparkContext.setLogLevel("ERROR")
    # warm the Python worker pool
    spark.range(10_000, numPartitions=args.cores).mapInPandas(
        lambda it: it, schema="id long").count()

    results = []
    for n in args.sizes:
        path = f"/tmp/geotiff_spark_bench/dedup_docs_{n}"
        if not os.path.exists(f"{path}/_SUCCESS"):
            (synth_pages(spark, n)
             .select(F.xxhash64("url").alias("doc_id"), "text")
             .write.mode("overwrite").parquet(path))
        docs = spark.read.parquet(path).cache()
        docs.count()

        def timed(fn):
            best = None
            for _ in range(args.runs):
                t0 = time.time()
                out = fn()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            return best, out

        t_sig, n_sigs = timed(lambda: minhash_signatures(docs).count())
        t_full, n_cand = timed(
            lambda: minhash_lsh_pairs(docs, verify=False).count())

        # one instrumented pass for the lineage side-table row counts
        sm = StageMetrics(spark)
        sm.instrument(
            minhash_lsh_pairs(docs, verify=False), "candidates"
        ).count()
        sm.instrument(minhash_signatures(docs), "signatures").count()
        snap = sm.snapshot()
        per_stage = {}
        for row in snap:
            per_stage.setdefault(row["stage"], {"rows": 0, "parts": 0})
            per_stage[row["stage"]]["rows"] += row["rows"]
            per_stage[row["stage"]]["parts"] += 1
        sm.flush(f"/tmp/geotiff_spark_bench/dedup_lineage_{n}")

        rec = {
            "docs": n,
            "signatures_sec": round(t_sig, 2),
            "full_sec": round(t_full, 2),
            "candidate_stage_sec": round(t_full - t_sig, 2),
            "candidates": n_cand,
            "docs_per_sec": round(n / t_full, 1),
            "lineage": per_stage,
        }
        results.append(rec)
        print(json.dumps(rec))
        docs.unpersist()

    spark.stop()
    print(json.dumps({"all": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
