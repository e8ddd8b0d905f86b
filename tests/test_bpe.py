"""BPE tokenizer: hand-computed training merges, greedy-apply
semantics (leftmost lowest-rank, cascades, priority interplay), and the
Spark encode path. The sf0.01 driver oracle replays the full merge loop
in SQL; these pin the pieces on crafted inputs."""

import pandas as pd

from geotiff_spark.operators import bpe


def test_bpe_train_hand_computed():
    """Weighted pair counts decide merges; ties break lexicographically.
    Corpus: low*5, lower*2, newest*6, widest*3 (Sennrich-style).
    Pair counts round 1: (e,s) 9, (s,t) 9, (w,e) 8 ... tie (e,s)/(s,t)
    -> (e,s) first, then (es,t) 9."""
    merges = bpe.bpe_train(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4
    )
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # round 3: l+o appears in low(5)+lower(2)=7 > w+est in 6 -> (l,o)
    assert merges[2] == ("l", "o")
    assert merges[3] == ("lo", "w")


def test_bpe_train_stops_when_no_pair_repeats():
    merges = bpe.bpe_train({"ab": 1, "cd": 1}, 10)
    assert merges == []  # every pair occurs once — nothing to learn


def test_bpe_apply_leftmost_lowest_rank():
    ranks = {p: i for i, p in enumerate(bpe.DEFAULT_MERGES)}
    # full cascade: t+a -> ta+b -> tab+le (after l+e)
    assert bpe.bpe_apply("table", ranks) == ["table"]
    # priority: (a,s) rank 6 beats later merges inside 'hash'
    assert bpe.bpe_apply("hash", ranks) == ["h", "as", "h"]
    # leftmost: 'erer' merges rank-0 (e,r) at position 0 first
    assert bpe.bpe_apply("erer", ranks) == ["er", "er"]
    # merged-token pairs: window -> w+ind -> wind+ow
    assert bpe.bpe_apply("window", ranks) == ["window"]
    # unknown chars pass through untouched
    assert bpe.bpe_apply("xyz", ranks) == ["x", "y", "z"]
    assert bpe.bpe_apply("a", ranks) == ["a"]


def test_bpe_apply_one_at_a_time_equals_all_occurrences():
    """For a trained table, merging one occurrence per step must land on
    the same tokenization as the merge-all-per-step formulation (the
    validity argument in the module docstring), across every word of a
    trained vocabulary."""
    corpus = {"banana": 4, "bandana": 2, "ananas": 3, "cabana": 1}
    merges = bpe.bpe_train(corpus, 6)
    ranks = {p: i for i, p in enumerate(merges)}

    def apply_all_per_step(word):
        toks = list(word)
        while len(toks) > 1:
            present = {
                (toks[i], toks[i + 1])
                for i in range(len(toks) - 1)
            } & set(ranks)
            if not present:
                break
            best = min(present, key=ranks.get)
            out, i = [], 0
            while i < len(toks):
                if (i + 1 < len(toks)
                        and (toks[i], toks[i + 1]) == best):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    for w in list(corpus) + ["ban", "nan", "aaaa", "banan"]:
        assert bpe.bpe_apply(w, ranks) == apply_all_per_step(w), w


def test_bpe_train_frame_and_encode_counts(spark, tmp_path):
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["low low lower", "newest widest", ""],
    })
    df = spark.createDataFrame(docs)
    merges = bpe.bpe_train_frame(df, n_merges=4)
    assert merges[0] == ("l", "o")  # l+o: 3 occurrences tops this corpus
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe.bpe_encode_counts(df, merges).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    exp0 = 2 * len(bpe.bpe_apply("low", ranks)) + len(
        bpe.bpe_apply("lower", ranks))
    exp1 = len(bpe.bpe_apply("newest", ranks)) + len(
        bpe.bpe_apply("widest", ranks))
    assert out[0] == (3, exp0)
    assert out[1] == (2, exp1)
    assert out[2] == (0, 0)  # empty text: zero words, zero tokens


def test_bpe_train_fast_equals_naive():
    """The heap-based incremental trainer must reproduce bpe_train's
    output exactly — tie-breaks (lexicographically smaller pair at
    equal count) included — over randomized vocabularies."""
    import random

    rng = random.Random(101)
    for _ in range(30):
        vocab = {}
        for _ in range(rng.randint(3, 80)):
            w = "".join(rng.choice("abcd012") for _ in range(rng.randint(1, 10)))
            vocab[w] = vocab.get(w, 0) + rng.randint(1, 7)
        for n in (1, 7, 50, 400):
            assert bpe.bpe_train(dict(vocab), n) == \
                bpe.bpe_train_fast(dict(vocab), n), (vocab, n)


def test_byte_level_no_oov_and_roundtrip():
    """Byte-level mode decomposes ANY input into single-byte symbols:
    token concatenation reproduces the (latin-1-mapped) word, and
    unmerged exotic input tokenizes to exactly its UTF-8 byte count."""
    merges = bpe.bpe_train_fast(
        {bpe.byte_word(w): c for w, c in
         {"café": 9, "caff": 5, "日本": 4}.items()}, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("café", "日本", "caff", "смесь", "\x00\xff", "plain"):
        toks = bpe.bpe_apply(bpe.byte_word(w), ranks)
        assert "".join(toks) == bpe.byte_word(w)
        assert 1 <= len(toks) <= len(w.encode("utf-8"))
    # no merges at all: token count == byte count (full coverage)
    assert len(bpe.bpe_apply(bpe.byte_word("日本語"), {})) == \
        len("日本語".encode("utf-8"))


def test_committed_web8k_table_is_well_formed():
    """The committed production table: >= 8192 merges, every merge's
    sides derivable from single latin-1 byte symbols or earlier merges
    (closure — the apply loop can always reach every merged token), and
    a spot-check that applying it to corpus-shaped words terminates and
    round-trips."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "geotiff_spark",
                        "data", "bpe_merges_web8k.json")
    merges = bpe.load_merges(path)
    assert len(merges) >= 8192
    known = set()
    for left, right in merges:
        for side in (left, right):
            assert len(side) == 1 or side in known, (left, right)
        known.add(left + right)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("geo:", "12.34567,-107.65432", "shuffle", "unseen-word!"):
        toks = bpe.bpe_apply(bpe.byte_word(w), ranks)
        assert "".join(toks) == bpe.byte_word(w)
        assert len(toks) < len(w.encode("utf-8")) or len(w) <= 2 \
            or w == "unseen-word!"
