"""Vectorized Arrow UDFs — the ONLY Python that runs on executors.

Everything else in the engine is Catalyst-native DataFrame code; these UDFs
cover exactly the four jobs Spark's built-ins can't express (SURVEY.md §2.8):

- ``extract_text_udf``  S2: html -> visible text (frozen, byte-identity gate)
- ``tokenize_udf``      T1-T5 fused: (title, text) -> kept-token array whose
                        list index IS the position (posexplode recovers it)
- ``phrase_count_udf``  Q4/Q5: adjacency count over per-word position arrays
- codec UDFs            A8/A9: delta-gap+varint encode/decode (in
                        operators/indexer.py via applyInPandas)

All are pandas UDFs (Arrow-batched); no per-row Python anywhere
(BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from websearchengine_spark.functions.textnorm import (
    extract_text,
    tokenize_document,
)


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """S2 — IndexerInvertedCompressed.java:114-116 semantics (frozen)."""
    return html.map(extract_text)


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(title: pd.Series, text: pd.Series) -> pd.Series:
    """T1-T5 fused (IndexerInvertedCompressed.java:160-253): the returned
    array holds kept index terms in position order; ``posexplode`` yields
    (pos, term) with the reference's 0-based kept-token positions.  A
    per-batch memo stems each unique raw token once."""
    memo: dict = {}
    return pd.Series(
        [tokenize_document(t, x, memo) for t, x in zip(title, text)],
        dtype=object,
    )


@pandas_udf(T.IntegerType())
def phrase_count_udf(position_lists: pd.Series) -> pd.Series:
    """Q5 — count adjacent runs: positions of word k must contain
    pos(word 0)+k for every k (IndexerInvertedCompressed.java:520-564).

    Input: array<array<int>> — per-doc position lists for the phrase words,
    in phrase order (guaranteed non-null by the conjunctive pre-join)."""

    def count_runs(lists) -> int:
        sets = [set(l) for l in lists[1:]]
        n = 0
        for p0 in lists[0]:
            if all((p0 + k + 1) in s for k, s in enumerate(sets)):
                n += 1
        return n

    return position_lists.map(count_runs).astype("int32")


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Attach/replace the visible-text column from raw html."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
