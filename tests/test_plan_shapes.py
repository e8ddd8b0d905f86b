"""Physical-plan shape pins: the scale properties PLANS.md claims must
hold in the actual executed plans, not just in prose — no shuffle where
the operator is row-local, broadcast where the dim is small, pushdown
reaching the scan."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_minhash_signatures_plan_has_no_exchange(spark):
    """On well-partitioned input the signature stage is a pure map (zero
    exchanges added); on a degenerate 1-row-group scan exactly one
    parallelism-restoring repartition fires (dedup._ensure_map_parallelism)
    and nothing else."""
    from geotiff_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # well-partitioned input: the only Exchange is the input's own
    # repartition — the signature stage adds none
    wide = docs.repartition(64)
    assert _plan(minhash_signatures(wide)).count("Exchange") == 1
    # degenerate 1-row-group scan: at most the one adaptive repartition
    assert _plan(minhash_signatures(docs)).count("Exchange") <= 1
    # round 4: the NULL-drop filter must not re-plan the UDF — a
    # deterministic UDF gets alias-inlined into the filter and extracted
    # into a SECOND ArrowEvalPython (the whole chain evaluated twice,
    # measured ~2x stage wall); exactly one Python stage allowed
    assert _plan(minhash_signatures(docs)).count("ArrowEvalPython") == 1
    assert _plan(minhash_signatures(wide)).count("ArrowEvalPython") == 1


def test_simhash_signatures_plan_has_no_exchange(spark):
    from geotiff_spark.operators.dedup import simhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    wide = docs.repartition(64)
    assert _plan(simhash_signatures(wide)).count("Exchange") == 1
    assert _plan(simhash_signatures(docs)).count("Exchange") <= 1
    assert _plan(simhash_signatures(docs)).count("ArrowEvalPython") == 1


def test_pip_join_broadcasts_polygon_index(spark):
    from geotiff_spark.pipeline import doc_pip_join

    plan = _plan(doc_pip_join(spark, SF, res=7))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    # the big (pages/documents) side must not be exchanged before the join
    assert "SortMergeJoin" not in plan, plan


def test_filter_project_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") < 10.0).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "LessThan(l_quantity,10.0)" in plan, plan
    # column pruning: the scan must not read all 16 lineitem columns
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_comment" not in read_schema, read_schema


def test_fused_pages_pip_single_python_stage(spark):
    from geotiff_spark.operators.spatial_join import fused_pages_pip
    from geotiff_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 100, partitions=2)
    hits = fused_pages_pip(spark, pages, 7)
    agg = hits.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(agg)
    # exactly two Python stages total: the pages generator + the fused
    # kernel — decode/extract/geotag/cell/join/refine never split apart
    assert plan.count("MapInPandas") == 2, plan
    # the only exchange is the final tiny per-polygon aggregate
    assert plan.count("Exchange") == 1, plan


def test_focal_stats_single_exchange_on_tile_key(spark):
    """Halo exchange = exactly ONE shuffle, keyed by tile coords — never
    a pixel-level self-join (PLANS.md §6)."""
    from geotiff_spark.operators.tiling import focal_stats, raster_to_tiles
    from geotiff_spark.oracle_raster import CORPUS_DIRS
    from geotiff_spark.sources.rasters import read_rasters

    df = focal_stats(raster_to_tiles(read_rasters(spark, CORPUS_DIRS)))
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(raster_id" in plan, plan
    assert "Join" not in plan, plan


def test_compact_cells_no_cartesian_and_broadcast_anti_join(spark):
    """The single parent anti-join of the closed-form compaction is a
    broadcast join; no cartesian anywhere."""
    import pandas as pd

    from geotiff_spark.operators.compact import compact_cells

    grid = spark.createDataFrame(
        pd.DataFrame({"ix": [0, 1, 2], "iy": [0, 1, 2]})
    )
    plan = _plan(compact_cells(grid, res=4))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_chunk_dedup_first_occurrence_is_partial_aggregatable(spark):
    """Round-5 skew fix (VERDICT r04 'What's wrong' #2): first-occurrence
    -wins must be a partial-aggregatable min over (doc_id, pos, chunk) —
    a `partial_min` combine BEFORE the digest-keyed Exchange — never a
    row_number() window that routes every occurrence of a hot chunk to
    one task's sort."""
    from geotiff_spark.queries_textdata import q_chunk_dedup

    plan = _plan(q_chunk_dedup(spark, SF))
    assert "partial_min(struct(doc_id" in plan, plan
    assert "Window" not in plan and "row_number" not in plan, plan
    # the partial agg must sit below (after in toString order) the
    # digest exchange: find the digest exchange line and check a
    # partial_min appears later (deeper) in the tree string
    lines = plan.splitlines()
    digest_exchanges = [i for i, l in enumerate(lines)
                        if "Exchange hashpartitioning(digest" in l
                        or "Exchange hashpartitioning(_groupingexpression" in l]
    assert digest_exchanges, plan
    assert any("partial_min" in l for l in lines[digest_exchanges[0]:]), plan
    # round-5 decision/data-plane split: the first-occurrence min must
    # aggregate (doc_id, pos) ONLY — chunk text never rides the digest
    # exchange (it moves once, in the final doc_id join)
    for l in lines:
        if "partial_min" in l:
            assert "chunk" not in l, l


def test_embedding_verify_stage_single_python_eval(spark):
    """Round-8 bucket-local verify shape: normal buckets verify inside
    their group (ONE FlatMapGroupsInPandas — vectors cross the Arrow
    boundary once per table, never twice per candidate pair), and the
    big-bucket fallback arm carries exactly ONE ArrowEvalPython
    (cosine_batch_udf stays asNondeterministic so the threshold filter
    + round projection cannot re-plan it twice — VERDICT r04 #5). No
    full-width candidate distinct: dedup happens on survivors only
    (partial_min below the pair-keyed exchange)."""
    from geotiff_spark.operators.similarity import lsh_near_dup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(lsh_near_dup_pairs(emb, threshold=0.4))
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert "partial_min" in plan, plan
    # no bucket exceeds the cap on this corpus, so the big-bucket
    # fallback arm must be pruned from the plan entirely
    assert plan.count("ArrowEvalPython") == 0, plan
    # force the fallback arm with a tiny cap: exactly one einsum verify
    forced = _plan(lsh_near_dup_pairs(emb, threshold=0.4,
                                      max_local_bucket=2))
    assert forced.count("ArrowEvalPython") == 1, forced
    assert forced.count("FlatMapGroupsInPandas") == 1, forced


def test_rep_signals_plan_is_pure_scan(spark):
    """Round-5 rewrite: every repetition signal (gram counts, distinct
    fractions, AND the most-frequent-bigram count) is computed inside
    the doc's own row via array expressions — the plan must contain no
    Exchange, no Join and no Generate (the pre-rewrite explode →
    groupBy(doc,gram) → groupBy(doc) → join form cost ~290 s at 2M
    pages once measurement pruning was fixed; the row-local form costs
    ~12 s — BENCH/BASELINE.md round-5 measurement fix)."""
    from geotiff_spark.queries_textdata import rep_signals_frame

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # force every output column observable, as bench.py force_all does —
    # an unforced plan could hide work behind the very pruning the
    # rewrite removed
    out = rep_signals_frame(docs.select("doc_id", "text")).select(
        F.expr("bit_xor(xxhash64(doc_id, dup_2gram_frac, "
               "dup_3gram_frac, top_2gram_frac))")
    )
    plan = _plan(out)
    # the forcing bit_xor adds its own SinglePartition gather; the pin
    # is that no DATA exchange (hash partitioning) exists anywhere
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan


def test_rep_signals_top_gram_run_length_semantics(spark):
    """Hand-checked top-gram counts through the sorted-run-length
    aggregate: 'a b a b a' has bigrams [a b, b a, a b, b a] → top 2;
    a one-token doc has zero bigrams → top frac 0 and dup frac 1.0
    (the registry formula 1 - d/greatest(n,1) with d=n=0 — pinned by
    the DuckDB oracle since round 4); a doc of one
    repeated token is pure duplication → dup fracs 1 - 1/n, top frac
    (n-1)/(n-1) = 1."""
    import pandas as pd

    from geotiff_spark.queries_textdata import rep_signals_frame

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b a b a", "solo", "x x x x x x"],
    }))
    got = {r["doc_id"]: r for r in rep_signals_frame(docs).collect()}
    assert got[0]["top_2gram_frac"] == 0.5  # 2 of 4 bigrams
    assert got[0]["dup_2gram_frac"] == 0.5  # 2 distinct of 4
    assert got[1]["top_2gram_frac"] == 0.0
    assert got[1]["dup_2gram_frac"] == 1.0
    assert got[2]["top_2gram_frac"] == 1.0  # 'x x' × 5
    assert got[2]["dup_2gram_frac"] == 0.8  # 1 distinct of 5


def test_url_canonical_dedup_single_exchange(spark):
    """Canonicalization is row-local codegen; the only data exchange is
    the canonical-keyed aggregation (partial-aggregatable, so hot
    resources collapse map-side before the wire)."""
    from geotiff_spark.queries_textdata import q_url_canonical_dedup

    plan = _plan(q_url_canonical_dedup(spark, SF))
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "partial_count" in plan or "partial_min" in plan, plan


def test_bpe_encode_plan_is_pure_map(spark):
    """BPE apply is a map: whitespace split JVM-side, one ArrowEvalPython
    for the merge loop, zero Exchange — at 10^12 docs this is a scan."""
    from geotiff_spark.operators.bpe import bpe_encode_counts

    docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(8)
    plan = _plan(bpe_encode_counts(docs))
    assert plan.count("ArrowEvalPython") == 1, plan
    # the only exchange is the input's own repartition
    assert plan.count("Exchange") == 1, plan


def test_repeated_ngrams_partial_agg_and_take_ordered(spark):
    """The gram aggregation must partial-aggregate map-side (digest
    exchange sits above a partial_count — each map task ships one row
    per distinct gram, never one per occurrence) and the top-N must be
    TakeOrdered, not a global sort."""
    from geotiff_spark.operators.dedup import repeated_ngram_mine

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(repeated_ngram_mine(docs, n=13, min_count=2, top_n=50))
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan, plan
    # no Python anywhere: gram extraction is JVM codegen
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_bloom_sharded_probe_plan_has_no_shuffle(spark):
    """The segmented-broadcast probe keeps the packed path's shape:
    one ArrowEvalPython over JVM-computed positions, zero Exchange."""
    from geotiff_spark.operators import dedup

    hist = spark.range(50).select(
        F.concat(F.lit("h"), F.col("id")).alias("text"))
    new = spark.range(50).select(
        F.concat(F.lit("n"), F.col("id")).alias("text"))
    bits = dedup.bloom_bit_set(hist, "text", m=256, k=4)
    packed = dedup.bloom_pack(bits, m=256, k=4)
    out = dedup.bloom_membership_packed(
        new, packed, "text", m=256, k=4, n_segments=3)
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan


def test_bloom_words_probe_shuffles_integers_only(spark):
    """The m-unbounded word-table probe may shuffle, but only the
    integer decision plane: no text column appears in any exchange."""
    from geotiff_spark.operators import dedup

    hist = spark.range(50).select(
        F.concat(F.lit("h"), F.col("id")).alias("text"))
    new = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("n"), F.col("id")).alias("text"))
    bits = dedup.bloom_bit_set(hist, "text", m=256, k=4)
    words = dedup.bloom_word_table(bits)
    out = dedup.bloom_membership_words(
        new, words, ["doc_id"], "text", m=256, k=4)
    import re
    plan = _plan(out)
    for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in args, f"text shuffled on ({args}):\n{plan}"


def test_exact_substring_dedup_single_digest_scan(spark):
    """ExactSubstr's fingerprint pass must run ONCE and be map-only
    (r06 VERDICT: the old groupBy+join shape computed and exchanged it
    twice): exhaustive mode is one Generate / zero Exchange, winnowed
    mode one MapInPandas / zero Generate / zero Exchange. Round 8:
    duplicate detection over the once-materialized fingerprints must be
    the partial-aggregatable groupBy(d).count + left-semi join — never
    a count-over-Window, which has no map-side combine and lands every
    copy of a hot digest on one task (r07 VERDICT #1)."""
    from geotiff_spark.operators import dedup

    df = spark.createDataFrame(
        [(0, "a" * 120), (1, "b" * 120)], ["doc_id", "text"])
    for kw, node in (({}, "Generate"), ({"winnow": 5}, "MapInPandas")):
        fpplan = _plan(dedup.substring_fingerprints(df, k=50, **kw))
        assert fpplan.count(node) == 1, f"{kw}\n{fpplan}"
        assert "Exchange" not in fpplan, fpplan
        plan = _plan(dedup.exact_substring_dedup(df, k=50, **kw))
        # fingerprints are localCheckpointed: exactly one scan, and the
        # downstream plan reads the materialized RDD, not a re-explode
        assert "Generate" not in plan and "MapInPandas" not in plan, plan
        assert "Window" not in plan, plan
        assert "partial_count" in plan, plan
        assert "LeftSemi" in plan, plan


def test_exact_substring_dedup_hot_digest_drill(spark):
    """Boilerplate storm (r07 VERDICT #1 drill): one shared k-window
    repeated across MANY docs must still excise correctly — the digest
    count collapses the hot digest map-side (partial_count pinned
    above), and the semi-join back is AQE-skew-splittable. 3000 docs
    all carrying the same 20-char header + unique tails: the header
    span is removed from every doc, tails survive."""
    import pandas as pd

    from geotiff_spark.operators import dedup

    k, w = 20, 5
    header = "HOT-BOILERPLATE-HDR!"  # exactly k chars
    assert len(header) == k
    n = 3000
    docs = pd.DataFrame({
        "doc_id": range(n),
        "text": [header + format(i, "08d") + format(i * 7, "08d")
                 for i in range(n)],
    })
    df = spark.createDataFrame(docs)
    out = {r["doc_id"]: r for r in
           dedup.exact_substring_dedup(df, k=k, winnow=w).collect()}
    assert len(out) == n
    # every doc loses at least the shared header; the unique tail's
    # windows straddle header+tail or tail-only content and are unique
    # to the doc, so removal never reaches the final 8 chars
    for i in (0, 1, n // 2, n - 1):
        assert out[i]["n_removed"] >= k, out[i]
        assert out[i]["cleaned_len"] > 0, out[i]
