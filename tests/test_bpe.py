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
