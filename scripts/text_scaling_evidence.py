"""Scaling-efficiency evidence for the round-5 TEXT pipeline operators
(BASELINE.json north rule, same protocol as scripts/scaling_evidence.py):
run the same shuffle-bearing jobs at local[2] vs local[8] (N vs 4N
stand-in inside the host's 16 physical cores) on identical input and
report throughput at both plus efficiency.

Jobs (both with a REAL exchange, unlike the map-only pages e2e):
- chunk_dedup: 10-token chunking + first-occurrence-wins
  groupBy(digest).agg(min(struct)) + doc reassembly — the partial-
  aggregatable shuffle the round-5 skew fix installed.
- rep_signals: Gopher repetition signals — row-local n-grams + one
  (doc, gram) aggregation.

Efficiency = (T_small / T_big) / (cores_big / cores_small); >= 0.8
required. Best-of-n subprocess runs per arm (co-tenant noise is 3-8x).

Appends/replaces its section between TEXT-SCALING markers in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, '__REPO__')
from pyspark.sql import functions as F
from geotiff_spark.session import get_spark
from geotiff_spark.operators.bpe import bpe_encode_counts, load_merges
from geotiff_spark.operators.dedup import exact_substring_dedup
from geotiff_spark.queries_textdata import chunk_dedup_frame, rep_signals_frame

cores = int(sys.argv[1])
pages_path = sys.argv[2]
spark = get_spark('text-scaling', master='local[%d]' % cores,
                  extra={'spark.sql.shuffle.partitions': str(cores * 2)})
spark.sparkContext.setLogLevel('ERROR')
spark.range(10000, numPartitions=cores).mapInPandas(
    lambda it: it, schema='id long').count()

pages = spark.read.parquet(pages_path).select(
    F.xxhash64('url').alias('doc_id'), 'text').cache()
n = pages.count()

def force_all(df):
    # bare .count() lets Catalyst eliminate the expensive branch (the
    # per-doc join / value aggregates) — sum an xxhash64 over every
    # column so the whole operator is observable (same as bench.py)
    return df.select(
        F.count(F.lit(1)).alias('n'),
        F.expr('bit_xor(xxhash64(' +
               ', '.join('`%s`' % c for c in df.columns) +
               '))').alias('cks'),
    ).collect()[0]['n']

def timed(fn, warm=1, runs=2):
    for _ in range(warm):
        fn()
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best

t_chunk = timed(lambda: force_all(chunk_dedup_frame(pages)))
t_rep = timed(lambda: force_all(rep_signals_frame(pages)))
t_sub = timed(lambda: force_all(exact_substring_dedup(pages, k=20, winnow=5)))
merges = load_merges('__REPO__/geotiff_spark/data/bpe_merges_web8k.json')
t_bpe = timed(lambda: force_all(
    bpe_encode_counts(pages, merges=merges, byte_level=True)))
print(json.dumps({"cores": cores, "n_pages": n,
                  "chunk_dedup_sec": round(t_chunk, 3),
                  "rep_signals_sec": round(t_rep, 3),
                  "substring_winnow_sec": round(t_sub, 3),
                  "bpe_web8k_sec": round(t_bpe, 3)}))
spark.stop()
"""


def run_at(cores: int, pages_path: str) -> dict:
    script = RUNNER.replace("__REPO__", REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), pages_path],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cores={cores}:\n{out.stdout}\n{out.stderr}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--big", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    n_pages = int(os.environ.get("SPARK_TEXT_SCALING_PAGES", "500000"))
    pages_path = f"/tmp/geotiff_spark_bench/pages_scaling_text_{n_pages}"
    if not os.path.exists(f"{pages_path}/_SUCCESS"):
        gen = (
            "import sys; sys.path.insert(0, {repo!r});"
            "from geotiff_spark.session import get_spark;"
            "from geotiff_spark.sources.pages import synth_pages;"
            "s = get_spark('gen', master='local[32]');"
            "synth_pages(s, {n}).write.mode('overwrite').parquet({path!r});"
            "s.stop()"
        ).format(repo=REPO, n=n_pages, path=pages_path)
        subprocess.run([sys.executable, "-c", gen], cwd=REPO, timeout=900,
                       check=True)

    results = {}
    for cores in (args.small, args.big):
        best = None
        for _ in range(args.runs):
            r = run_at(cores, pages_path)
            if best is None:
                best = r
            else:
                for k in ("chunk_dedup_sec", "rep_signals_sec",
                          "substring_winnow_sec", "bpe_web8k_sec"):
                    best[k] = min(best[k], r[k])
        results[cores] = best
        print(json.dumps(best))

    small, big = results[args.small], results[args.big]
    ratio = args.big / args.small
    eff = {
        k: (small[k] / big[k]) / ratio
        for k in ("chunk_dedup_sec", "rep_signals_sec",
                  "substring_winnow_sec", "bpe_web8k_sec")
    }
    n = small["n_pages"]

    section = f"""## Text-op scaling evidence (rounds 5-7 text ops)

Same N-vs-4N protocol as the headline table (local[{args.small}] vs
local[{args.big}], identical {n:,}-page input, warmed workers, cached
input, per-op best over {args.runs} subprocess runs x2 timed executions).
These two jobs carry REAL exchanges — the pages-e2e headline is map-only
— so they evidence shuffle scaling, not just map scaling:

| job | local[{args.small}] (N) | local[{args.big}] (4N) | pages/s at N -> 4N | efficiency |
|---|---|---|---|---|
| chunk_dedup (int-only decision shuffles: digest min + per-doc pos agg; text moves once in the final doc join) | {small['chunk_dedup_sec']} s | {big['chunk_dedup_sec']} s | {n/small['chunk_dedup_sec']:,.0f} -> {n/big['chunk_dedup_sec']:,.0f} | **{eff['chunk_dedup_sec']:.2f}** |
| rep_signals (fully row-local: array n-grams + sorted-run-length top gram, zero shuffle) | {small['rep_signals_sec']} s | {big['rep_signals_sec']} s | {n/small['rep_signals_sec']:,.0f} -> {n/big['rep_signals_sec']:,.0f} | **{eff['rep_signals_sec']:.2f}** |
| winnowed ExactSubstr k=20 w=5 (round 7: one digest-partition window count + per-doc agg + final doc join) | {small['substring_winnow_sec']} s | {big['substring_winnow_sec']} s | {n/small['substring_winnow_sec']:,.0f} -> {n/big['substring_winnow_sec']:,.0f} | **{eff['substring_winnow_sec']:.2f}** |
| BPE encode, web8k trained table (round 7: zero-shuffle Arrow merge loop, per-batch word memoization) | {small['bpe_web8k_sec']} s | {big['bpe_web8k_sec']} s | {n/small['bpe_web8k_sec']:,.0f} -> {n/big['bpe_web8k_sec']:,.0f} | **{eff['bpe_web8k_sec']:.2f}** |
"""
    path = f"{REPO}/BENCH/BASELINE.md"
    BEGIN, END = "<!-- TEXT-SCALING:BEGIN -->", "<!-- TEXT-SCALING:END -->"
    block = f"{BEGIN}\n{section}\n{END}"
    cur = open(path).read()
    if BEGIN in cur and END in cur:
        pre, rest = cur.split(BEGIN, 1)
        _mid, post = rest.split(END, 1)
        cur = pre + block + post
    else:
        cur = cur.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as fh:
        fh.write(cur)
    print(json.dumps({"efficiency": {k.replace('_sec', ''): round(v, 3)
                                     for k, v in eff.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
