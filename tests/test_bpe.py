"""Distributed BPE trainer tests.

The reference implementation below is an INDEPENDENT pure-Python BPE
(the textbook dict-and-list recipe) — agreement proves the relational
gaps-and-islands formulation computes real BPE, not merely something
self-consistent.
"""

from __future__ import annotations

from collections import Counter

from stock_streaming_data_pipeline_spark.operators import bpe


def _py_bpe(texts: list[str], k: int):
    """Textbook BPE: word counts -> k rounds of (pair count, argmax with
    (count desc, pair asc) tie-break, greedy left-to-right merge)."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    seqs = {w: [*w, bpe.EOW] for w in words}
    merges = []
    for r in range(k):
        pairs: Counter = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((r, a, b, cnt, a + b))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def _spark_merges(spark, texts: list[str], k: int):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = bpe.bpe_train(df, text_col="text", k=k).orderBy("merge_round").collect()
    return [
        (r["merge_round"], r["left_sym"], r["right_sym"], r["pair_count"], r["merged"])
        for r in rows
    ]


def test_bpe_matches_reference_implementation(spark):
    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "that hat is flat",
        "rats chat with bats on mats",
    ]
    expect, _ = _py_bpe(texts, 10)
    got = _spark_merges(spark, texts, 10)
    assert got == expect


def test_bpe_greedy_merge_on_identical_symbol_runs(spark):
    """'aaaa' with pair (a,a): greedy keeps merges at even run offsets —
    the only case where match positions conflict."""
    texts = ["aaaa aaa"]
    expect, _ = _py_bpe(texts, 3)
    got = _spark_merges(spark, texts, 3)
    assert got == expect
    # sanity on the reference itself: first merge (a,a) applied greedily
    _, seqs1 = _py_bpe(texts, 1)
    assert expect[0][1:3] == ("a", "a")
    assert seqs1["aaaa"] == ["aa", "aa", bpe.EOW]
    assert seqs1["aaa"] == ["aa", "a", bpe.EOW]


def test_bpe_exhaustion_truncates_identically(spark):
    """A corpus whose symbol space exhausts before k merges yields fewer
    than k rows (never a crash, never a phantom rule)."""
    texts = ["ab ab"]
    expect, _ = _py_bpe(texts, 8)
    got = _spark_merges(spark, texts, 8)
    assert got == expect
    assert len(got) < 8


def test_bpe_segment_counts(spark):
    """Applying the learned rules re-tokenizes the corpus: token counts
    match the reference segmentation lengths."""
    texts = ["the cat sat", "the mat"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.bpe_train(df, text_col="text", k=5)
    out = {
        r["doc"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe.bpe_segment(df, merges, id_col="doc_id", text_col="text").collect()
    }
    _, seqs = _py_bpe(texts, 5)
    for i, t in enumerate(texts):
        words = t.lower().split()
        want_tokens = sum(len(seqs[w]) for w in words)
        assert out[i] == (len(words), want_tokens)


# --- unigram-LM tokenizer (operators/unigram.py) ---


def _ref_viterbi(word, logp_micro, max_piece=4):
    """Independent textbook Viterbi (float-free: micro-int scores),
    tie-break (score desc, predecessor pos asc)."""
    n = len(word)
    best = {0: (0, [])}
    for i in range(1, n + 1):
        cands = []
        for j in range(max(0, i - max_piece), i):
            if j not in best:
                continue
            piece = word[j:i]
            if piece in logp_micro:
                sc = best[j][0] + logp_micro[piece]
                cands.append((sc, j, best[j][1] + [piece]))
        if cands:
            cands.sort(key=lambda t: (-t[0], t[1]))
            sc, j, seq = cands[0]
            best[i] = (sc, seq)
    return best.get(n, (None, None))[1]


def test_unigram_train_matches_reference_viterbi(spark):
    """The trained vocab's counts must equal what an independent Python
    Viterbi produces when segmenting the same words under the same seed
    scores — pinning the relational DP against a textbook one."""
    from stock_streaming_data_pipeline_spark.operators import unigram as ug

    rows = [(i, "spark parks spar park s p a r k") for i in range(10)] + [
        (100 + i, "parks spark") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r["piece"]: r
        for r in ug.unigram_train(df, text_col="text", rounds=1).collect()
    }

    # rebuild the seed vocab + round-1 counts independently
    import math
    from collections import Counter

    words = Counter()
    for _, t in rows:
        for w in t.lower().split():
            if len(w) <= ug.MAX_WORD_LEN:
                words[w] += 1
    subs = Counter()
    for w, wc in words.items():
        for s in range(len(w)):
            for l in range(1, min(ug.MAX_PIECE_LEN, len(w) - s) + 1):
                subs[w[s : s + l]] += wc
    seed = {
        p: c
        for p, c in subs.items()
        if c >= ug.MIN_SEED_COUNT or len(p) == 1
    }
    total = sum(seed.values())

    def micro(x):
        r = round(x, 6)
        return int(math.copysign(math.floor(abs(r) * 1e6 + 0.5), r))

    lp = {p: micro(math.log(c / total)) for p, c in seed.items()}
    counts = Counter()
    for w, wc in words.items():
        for piece in _ref_viterbi(w, lp, ug.MAX_PIECE_LEN):
            counts[piece] += wc
    assert set(out) == set(seed)
    for p in seed:
        assert out[p]["cnt"] == counts.get(p, 0), p
    # smoothed M-step scores
    t, v = sum(counts.get(p, 0) for p in seed), len(seed)
    for p in seed:
        want = micro(math.log((counts.get(p, 0) + 1) / (t + v))) / 1e6
        assert out[p]["logp"] == round(want, 6), p


def test_unigram_segment_properties(spark):
    """Frequent whole words become single pieces (compression beats
    char-splitting); per-doc token counts are consistent; results are
    partitioning-invariant."""
    from stock_streaming_data_pipeline_spark.operators import unigram as ug

    rows = [(i, "data data data data lake") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seg = {r["doc"]: r for r in ug.unigram_segment(
        df, id_col="doc_id", text_col="text", rounds=2
    ).collect()}
    assert len(seg) == 20
    for r in seg.values():
        assert r["n_words"] == 5
        # 'data' dominates: must segment to one piece per occurrence;
        # 'lake' at worst splits into 4 chars: total <= 4*1 + 4
        assert r["n_unigram_tokens"] <= 8
    seg2 = {r["doc"]: r["n_unigram_tokens"] for r in ug.unigram_segment(
        df.repartition(7), id_col="doc_id", text_col="text", rounds=2
    ).collect()}
    assert {d: r["n_unigram_tokens"] for d, r in seg.items()} == seg2


def test_unigram_prune_shrinks_and_covers(spark):
    """Shrink keeps (top-N by usage) ∪ single chars, never loses
    coverage: every word still segments, and multi-char pieces below the
    cut disappear."""
    from stock_streaming_data_pipeline_spark.operators import unigram as ug

    rows = [(i, "spark spark spark lake lake pond") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = ug.unigram_train(df, text_col="text", rounds=1).collect()
    pruned = ug.unigram_train_pruned(
        df, text_col="text", rounds=1, prune_to=3
    ).collect()
    n_multi_full = sum(1 for r in full if len(r["piece"]) > 1)
    n_multi_pruned = sum(1 for r in pruned if len(r["piece"]) > 1)
    assert n_multi_pruned <= 3 < n_multi_full
    singles = {r["piece"] for r in pruned if len(r["piece"]) == 1}
    assert set("sparklepond") <= singles  # coverage floor intact
    # a smaller vocabulary can only segment FINER: total piece usages
    # grow (or stay) when pieces are pruned, and never vanish
    assert sum(r["cnt"] for r in pruned) >= sum(r["cnt"] for r in full) > 0


def test_wordpiece_greedy_longest_match(spark):
    """Longest-match-first over a corpus where 'abcd' is frequent: the
    word 'abcdef' must segment as [abcd, ##ef-or-chars], never char-by-
    char; continuation pieces carry ##; every word fully consumes."""
    from stock_streaming_data_pipeline_spark.operators import wordpiece as wp

    rows = [("abcd",)] * 6 + [("abcdef",)] * 6 + [("xy",)] * 6
    df = spark.createDataFrame(rows, "text string")
    out = {r["w"]: r for r in wp.wordpiece_segment(df, text_col="text").collect()}
    assert set(out) == {"abcd", "abcdef", "xy"}
    assert out["abcd"]["wordpieces"] == "abcd"
    assert out["abcd"]["n_pieces"] == 1
    # 'abcd' (count 12 >= 5) wins the first greedy step; the suffix 'ef'
    # is a frequent continuation substring (count 6) so it stays whole
    assert out["abcdef"]["wordpieces"] == "abcd ##ef"
    assert out["abcdef"]["n_pieces"] == 2
    assert out["xy"]["wordpieces"] == "xy"
    # piece accounting: n_pieces == piece list length, words reconstruct
    for r in out.values():
        pieces = r["wordpieces"].split(" ")
        assert len(pieces) == r["n_pieces"]
        assert "".join(p.removeprefix("##") for p in pieces) == r["w"]


def test_wordpiece_rare_word_falls_to_characters(spark):
    """A word sharing no frequent substrings segments into single-char
    pieces (the coverage guarantee) rather than erroring."""
    from stock_streaming_data_pipeline_spark.operators import wordpiece as wp

    rows = [("hello",)] * 6 + [("zq",)]
    df = spark.createDataFrame(rows, "text string")
    out = {r["w"]: r for r in wp.wordpiece_segment(df, text_col="text").collect()}
    assert out["zq"]["wordpieces"] == "z ##q"
    assert out["zq"]["n_pieces"] == 2
