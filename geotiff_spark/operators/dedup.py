"""Deduplication operators for web-scale corpora.

Scale design notes:
- exact_dedup: one hash-shuffle on the digest, not on the full text.
- token_jaccard_pairs: exact set-similarity via token self-join — the
  small-scale oracle; quadratic in the worst case, used only as the
  correctness baseline for the LSH path.
- minhash_lsh_pairs: the 100 TB path. Signatures are computed entirely
  JVM-side (xxhash64 + min aggregations — no Python in the hot loop);
  candidates come from banded-signature equi-joins (shuffle keyed on
  (band, band_hash) — bounded by collisions, not n²); final exact verify
  by token jaccard on candidates only.
- simhash_pairs: 64-bit simhash with segment-bucketed Hamming search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf


def exact_dedup(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) groupBy; keeper = min key.

    Shuffles 16-byte digests + keys, never the documents themselves.
    """
    return (
        df.select(F.col(key), F.md5(F.col(text)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(key).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def tokens_df(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """(key, token) distinct pairs — whitespace tokenization, JVM-side."""
    return (
        df.select(
            F.col(key),
            F.explode(F.array_distinct(F.split(F.col(text), r"\s+"))).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def token_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Exact n-gram(word) Jaccard pairs ≥ threshold, key_a < key_b.

    inter via token self-join, union = |A|+|B|−inter. All built-ins.
    """
    toks = tokens_df(df, text, key).cache()
    sizes = toks.groupBy(key).agg(F.count(F.lit(1)).alias("n_tok"))
    a = toks.withColumnRenamed(key, "id_a")
    b = toks.withColumnRenamed(key, "id_b")
    inter = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnRenamed(key, "id_a").withColumnRenamed("n_tok", "n_a")
    sb = sizes.withColumnRenamed(key, "id_b").withColumnRenamed("n_tok", "n_b")
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def shingles_df(
    df: DataFrame, n: int = 3, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """(key, shingle) distinct pairs: n-token shingles, JVM-side
    (split → sequence → slice → concat_ws). Shingling is what makes
    MinHash banding discriminative on small-vocabulary text."""
    toks = F.filter(F.split(F.col(text), r"\s+"), lambda t: t != "")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return df.select(
        F.col(key), F.explode(F.array_distinct(sh)).alias("token")
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    text: str = "text",
    key: str = "doc_id",
    shingle: int = 3,
) -> DataFrame:
    """MinHash signature columns sig_0..sig_{k-1}, entirely JVM-side:
    sig_i = MIN over shingles of xxhash64(shingle, 'i'). One shuffle."""
    toks = (
        shingles_df(df, shingle, text, key)
        if shingle > 1
        else tokens_df(df, text, key)
    )
    aggs = [
        F.min(F.xxhash64(F.col("token"), F.lit(str(i)))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return toks.groupBy(key).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    text: str = "text",
    key: str = "doc_id",
    verify: bool = True,
    shingle: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash over n-token shingles,
    optionally verified with exact token jaccard (verification only
    touches candidates)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, text, key, shingle)
    band_cols = [
        F.xxhash64(
            *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select(F.col(key), *band_cols)
    stacked = banded.select(
        F.col(key),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"), F.col(f"band_{b}").alias("h"))
                for b in range(bands)
            ])
        ).alias("band"),
    ).select(key, "band.band_id", "band.h")

    a = stacked.withColumnRenamed(key, "id_a")
    b = stacked.withColumnRenamed(key, "id_b")
    cand = (
        a.join(b, ["band_id", "h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if not verify:
        return cand
    # exact verify on CANDIDATES ONLY, in the same unit the signatures
    # hash (n-token shingles): join the shingle arrays back and compute
    # jaccard with JVM array ops — cost is O(|candidates|), never the
    # all-pairs self-join
    if shingle > 1:
        toks_col = F.filter(F.split(F.col(text), r"\s+"), lambda t: t != "")
        set_col = F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(toks_col) - F.lit(shingle - 1), F.lit(1)),
                ),
                lambda i: F.concat_ws(" ", F.slice(toks_col, i, shingle)),
            )
        )
    else:
        set_col = F.array_distinct(
            F.filter(F.split(F.col(text), r"\s+"), lambda t: t != "")
        )
    arrs = df.select(F.col(key), set_col.alias("toks"))
    a = arrs.select(F.col(key).alias("id_a"), F.col("toks").alias("toks_a"))
    b = arrs.select(F.col(key).alias("id_b"), F.col("toks").alias("toks_b"))
    n_inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            n_inter
            / (F.size("toks_a") + F.size("toks_b") - n_inter),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_signatures(
    df: DataFrame, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document. Token hashes are computed JVM-side
    (xxhash64); the bit-vote fold runs in one Arrow-batched pandas UDF."""
    toks = tokens_df(df, text, key).withColumn(
        "th", F.xxhash64(F.col("token"))
    )
    hashed = toks.groupBy(key).agg(F.collect_list("th").alias("hashes"))

    @pandas_udf("long")
    def fold(hashes: pd.Series) -> pd.Series:
        out = np.empty(len(hashes), dtype=np.int64)
        for i, hs in enumerate(hashes):
            arr = np.asarray(hs, dtype=np.int64).view(np.uint64)
            bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sig = np.uint64(0)
            for bit_idx in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(bit_idx)
            out[i] = sig.astype(np.int64).item() if hasattr(sig, 'astype') else int(sig)
        return pd.Series(out)

    return hashed.select(F.col(key), fold(F.col("hashes")).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, found by the
    pigeonhole trick: split 64 bits into (max_hamming+1) segments — any
    pair within distance shares at least one exact segment → equi-join on
    (segment_id, segment_bits), then exact popcount filter."""
    return simhash_pairs_from_sigs(
        simhash_signatures(df, text, key), max_hamming, key
    )


def simhash_pairs_from_sigs(
    sigs: DataFrame,
    max_hamming: int = 3,
    key: str = "doc_id",
) -> DataFrame:
    """Pigeonhole Hamming search over a precomputed (key, simhash) table —
    the bucketing core of simhash_pairs, testable with crafted signatures."""
    segs = max_hamming + 1
    width = 64 // segs
    # mask, not `%`: Spark's % keeps the dividend's sign, so negative
    # simhashes would bucket differently from positives with identical
    # low bits, silently breaking the pigeonhole exact-recall guarantee.
    # The last segment absorbs the remainder bits so the segments tile
    # all 64 bits (otherwise diffs in uncovered high bits escape the
    # pigeonhole argument when 64 % segs != 0).
    def _seg_width(i: int) -> int:
        return 64 - i * width if i == segs - 1 else width

    seg_cols = [
        (
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit(2 ** _seg_width(i) - 1))
        ).alias(f"seg_{i}")
        for i in range(segs)
    ]
    t = sigs.select(F.col(key), F.col("simhash"), *seg_cols)
    stacked = t.select(
        key,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("seg_id"), F.col(f"seg_{i}").alias("seg"))
                for i in range(segs)
            ])
        ).alias("s"),
    ).select(key, "simhash", "s.seg_id", "s.seg")
    a = stacked.select(
        F.col(key).alias("id_a"), F.col("simhash").alias("sh_a"), "seg_id", "seg"
    )
    b = stacked.select(
        F.col(key).alias("id_b"), F.col("simhash").alias("sh_b"), "seg_id", "seg"
    )
    return (
        a.join(b, ["seg_id", "seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
