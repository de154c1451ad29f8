"""Byte-pair-encoding subword tokenizer — the token-budget accountant of
an LLM training-data pipeline (what "how many tokens is this corpus?"
actually means once a real tokenizer replaces whitespace counting).

The reference engine tokenizes words only; this is a training-data
extension (like dedup / quality filtering), built the way BPE is
actually trained and applied at corpus scale:

- **train** (Sennrich et al. 2016): BPE learns merges from the WORD
  FREQUENCY TABLE, not the corpus stream — so the distributed part is
  ONE key-bounded groupBy producing (word, count), capped at ``top_v``
  rows by frequency (SentencePiece's samples/caps play the same role).
  The merge loop itself runs on the driver over that bounded table;
  ties break (count desc, pair lexicographic) so training is
  deterministic in the word counts alone.
- **apply**: segmentation cost is per DISTINCT word, not per occurrence
  — the vocabulary is Zipf-bounded while the corpus is not.  The merge
  list broadcasts; an Arrow-batched pandas UDF segments each distinct
  word once; a broadcast join maps every corpus token to its subword
  count.  No per-row Python ever touches corpus-sized data.
- **verification**: training is deterministic, so the driver gate
  (plans/registry_quality.py:bpe_token_count) embeds the trained
  vocabulary's per-word subword counts as SQL literals and recomputes
  the per-doc totals relationally in DuckDB — the IVF/classifier
  literal-embedding pattern.  Merge-by-merge behavior is pytest-gated
  against hand-worked examples (tests/test_bpe.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from websearchengine_spark.operators.corpus_stats import (
    _toks_clean as _words_col,  # the ONE shared gate tokenizer
)

BPE_MERGES = 40
BPE_TOP_V = 65536


def word_counts(docs: DataFrame, top_v: int = BPE_TOP_V) -> DataFrame:
    """(word, cnt) — the training table: one explode + one key-bounded
    groupBy, truncated to the ``top_v`` most frequent words (ties: word
    asc) so the driver-side merge loop is bounded regardless of corpus
    size."""
    return (
        docs.select(F.explode(_words_col()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(top_v)
    )


def _apply_merge(seq: list[str], a: str, b: str) -> list[str]:
    """Replace every non-overlapping adjacent (a, b) with a+b — the ONE
    merge applier shared by training and segmentation, so the sequences
    training evolves are by construction the ones apply-time produces."""
    j, out = 0, []
    while j < len(seq):
        if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
            out.append(a + b)
            j += 2
        else:
            out.append(seq[j])
            j += 1
    return out


def train_merges_local(
    wc: list[tuple[str, int]], n_merges: int = BPE_MERGES
) -> list[tuple[str, str]]:
    """Driver-side BPE merge learning over a (word, count) table.

    Standard Sennrich procedure: start from character sequences, count
    adjacent symbol pairs weighted by word frequency, merge the most
    frequent pair, repeat.  Deterministic: ties break on the pair itself
    (lexicographic), and learning stops early when no pair occurs twice."""
    seqs: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in wc if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, cnt in seqs:
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        seqs = [(_apply_merge(seq, a, b), cnt) for seq, cnt in seqs]
    return merges


def train_merges(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    top_v: int = BPE_TOP_V,
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge learning.  The only
    driver traffic is the <= top_v-row frequency table."""
    wc = [
        (r["word"], r["cnt"])
        for r in word_counts(docs, top_v).collect()
    ]
    # collect() order is plan-dependent; training must see the canonical
    # (cnt desc, word asc) order the limit was computed under
    wc.sort(key=lambda t: (-t[1], t[0]))
    return train_merges_local(wc, n_merges)


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the merge list in learned order to one word."""
    seq = list(word)
    for a, b in merges:
        seq = _apply_merge(seq, a, b)
    return seq


def segment_vocab(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, subwords array<string>, n_subwords) for each DISTINCT word
    — the Arrow-batched segmentation pass, costed by vocabulary size."""
    mlist = list(merges)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg_udf(w: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        out = []
        for word in w:
            if word not in memo:
                memo[word] = segment_word(word, mlist)
            out.append(memo[word])
        return pd.Series(out, dtype=object)

    return words.select(
        "word", seg_udf(F.col("word")).alias("subwords")
    ).select(
        "word",
        "subwords",
        F.size("subwords").cast("long").alias("n_subwords"),
    )


def bpe_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, n_words, n_subwords) — per-doc BPE token budget.

    The corpus-sized side is pure relational: explode tokens, broadcast
    join the vocabulary's segmentation (distinct words only — the UDF
    never sees corpus-scale data), one doc-keyed groupBy."""
    tok = docs.select("doc_id", F.explode(_words_col()).alias("word"))
    vocab = segment_vocab(tok.select("word").distinct(), merges)
    return (
        tok.join(
            F.broadcast(vocab.select("word", "n_subwords")), "word"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_subwords").cast("long").alias("n_subwords"),
        )
    )
