"""BPE subword tokenizer: merge learning on hand-worked examples,
segmentation round-trips, and distributed == local lockstep."""

import duckdb
import pytest
from pyspark.sql import functions as F

from websearchengine_spark.operators import bpe

SF001 = "/root/testdata/sf0.001/documents.parquet"


def test_merge_learning_classic_example():
    # Sennrich et al. (2016) fig. 1 vocabulary
    wc = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = bpe.train_merges_local(wc, n_merges=4)
    # ('e','s') appears 9 times (newest+widest) — the first merge;
    # ('es','t') then also 9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert ("l", "o") in merges  # low+lower = 7 occurrences


def test_merge_tiebreak_is_lexicographic():
    # "abcd" x2: pairs ab/bc/cd all count 2 -> lexicographically first wins
    merges = bpe.train_merges_local([("abcd", 2)], n_merges=1)
    assert merges == [("a", "b")]


def test_learning_stops_when_no_pair_repeats():
    merges = bpe.train_merges_local([("abc", 1), ("xyz", 1)], n_merges=10)
    assert merges == []


def test_segment_roundtrip_and_order():
    wc = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = bpe.train_merges_local(wc, n_merges=10)
    for w in ["newest", "lowest", "wider", "new", "zq"]:
        seg = bpe.segment_word(w, merges)
        assert "".join(seg) == w
        assert all(seg)
    # learned merges compress the training words
    assert len(bpe.segment_word("newest", merges)) < len("newest")


def test_distributed_train_matches_local_twin(spark):
    docs = spark.read.parquet(SF001)
    merges = bpe.train_merges(docs, n_merges=20)
    con = duckdb.connect()
    wc = con.execute(
        f"""WITH tok AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text),
         '[^a-z0-9]+',' ','g')),' ')) AS word
  FROM read_parquet('{SF001}')
)
SELECT word, count(*)::BIGINT FROM tok WHERE word <> ''
GROUP BY word ORDER BY 2 DESC, word ASC LIMIT {bpe.BPE_TOP_V}"""
    ).fetchall()
    con.close()
    assert merges == bpe.train_merges_local(list(wc), 20)
    assert merges == bpe.train_merges(docs, n_merges=20)  # deterministic


def test_token_counts_match_hand_segmentation(spark):
    df = spark.createDataFrame(
        [(0, "newest newest low"), (1, "lower widest")],
        "doc_id long, text string",
    )
    wc = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = bpe.train_merges_local(wc, n_merges=6)
    out = {
        r["doc_id"]: r
        for r in bpe.bpe_token_counts(df, merges).collect()
    }
    seg = lambda w: len(bpe.segment_word(w, merges))
    assert out[0]["n_words"] == 3
    assert out[0]["n_subwords"] == 2 * seg("newest") + seg("low")
    assert out[1]["n_words"] == 2
    assert out[1]["n_subwords"] == seg("lower") + seg("widest")


def test_vocab_udf_costed_by_distinct_words(spark):
    # the segmentation input is the distinct-word table, not the corpus
    df = spark.createDataFrame(
        [(i, "same words every doc") for i in range(50)],
        "doc_id long, text string",
    )
    merges = bpe.train_merges(df, n_merges=5)
    vocab = bpe.segment_vocab(
        df.select(F.explode(bpe._words_col()).alias("word")).distinct(),
        merges,
    )
    assert vocab.count() == 4
