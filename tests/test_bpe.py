"""BPE merge induction vs a pure-Python reference implementation —
the same external-reference strategy as simhash's HOF-fold check
(rows-only operators get a non-Spark ground truth instead of a DuckDB
oracle)."""

from __future__ import annotations

import re
from collections import Counter

from mapreduceinfrastructure_spark.operators.text_analysis import (
    BPE_MIN_PAIR,
    BPE_NUM_MERGES,
    bpe_merges,
)


def _reference_bpe(texts: list[str], k: int) -> list[tuple[int, str, str, int]]:
    """Textbook BPE trainer (Sennrich et al. 2016, word-frequency form):
    same tokenizer, same tie-break (count desc, left asc, right asc),
    same leftmost-first non-overlapping merge."""
    freq: Counter[str] = Counter()
    for t in texts:
        for w in re.split(r"[ ,.\"']", t or ""):
            if w:
                freq[w] += 1
    vocab: Counter[tuple[str, ...]] = Counter()
    for w, c in freq.items():
        vocab[tuple(w)] += c
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(k):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < BPE_MIN_PAIR:
            break
        merges.append((rank, left, right, cnt))
        new_vocab: Counter[tuple[str, ...]] = Counter()
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


def test_bpe_merges_match_reference(spark, sf_dir):
    import pyarrow.parquet as pq

    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges(spark, sf_dir).collect()
    ]
    texts = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    want = _reference_bpe(texts, BPE_NUM_MERGES)
    assert got == want
    # the corpus is rich enough that all K merges are learned
    assert len(got) == BPE_NUM_MERGES
