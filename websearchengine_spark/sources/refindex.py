"""Readers for the reference's SHIPPED hw3 index files (S8 text format).

The reference checkout ships ~9 MB of its real inverted index (22 per-first-
character ``<c>.idx`` text files, 119,867 terms, 1.1M posting lists, 2.55M
term occurrences of the 10,229-doc Wikipedia crawl) plus full per-document
metadata.  Parsing it is the only route to running queries over REAL
reference data — corpus.tsv and the HTML crawl are stripped from the
checkout — so this module turns those files into the engine's standard
``postings(term, doc_id, tf, positions, dl)`` relation.

Format (all cited from the reference):
- ``<c>.idx`` line = ``term:docid,pos,pos,...;docid,pos,...;...;`` —
  writeFile at IndexerInvertedCompressed.java:267-299; the load side
  (readAll :319-359, findTerm :752-796) splits on ':' taking segment 0 as
  the term and the LAST segment as the data, then ';'-groups where element
  0 is the docid and the rest are ABSOLUTE token positions (title tokens
  first, then body; stopworded stems skipped without consuming a position
  — readTerms :191-253).
- ``docURL`` = JSON map url -> docid with sentinels ``_numDocs`` /
  ``_totalTermFrequency`` (IndexerInvertedCompressed.java:146-147).
- ``documents`` = JSON array of per-doc metadata: ``docID``, ``totalTerms``
  (the real kept-token doc length), ``_url``/``_title``, ``_pageRank``,
  ``_numViews`` (loadIndex :364-390 reads it back verbatim).

Scale note: each .idx line is one term's complete posting list, so the
parse is a shuffle-free project + explode over ``spark.read.text`` —
string splits all run in whole-stage codegen.  The ``dl`` join against the
10k-row documents table is a broadcast.  Spark's file index treats paths
starting with '.' as hidden, which would silently drop ``..idx`` (terms
whose first char is '.'; in this checkout a single crawl artifact
``.ds_store:8,0;``) — those files are tiny by construction (one leading
character's worth of terms) and are parsed driver-side and unioned in.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

REF_INDEX_DIR = "/root/reference/hw3/data/index"

_POSTING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
    ]
)


def _idx_files(index_dir: str) -> tuple[list[str], list[str]]:
    """(visible, hidden) absolute paths of every ``*.idx`` file — mirrors
    Java's ``listFiles()`` + ``endsWith(".idx")`` (mergeAll :301-317),
    which does NOT skip dot-files."""
    names = sorted(n for n in os.listdir(index_dir) if n.endswith(".idx"))
    vis = [os.path.join(index_dir, n) for n in names if not n.startswith((".", "_"))]
    hid = [os.path.join(index_dir, n) for n in names if n.startswith((".", "_"))]
    return vis, hid


def _parse_line(line: str):
    """readAll semantics (:319-359): term = before FIRST ':', data = after
    LAST ':'; empty ','/';' fragments skipped.  Driver-side twin of the
    column-expression parse, used only for hidden dot-files."""
    if ":" not in line:
        return
    parts = line.split(":")
    term, data = parts[0], parts[-1]
    for grp in data.split(";"):
        if not grp:
            continue
        nums = [int(x) for x in grp.split(",") if x]
        if len(nums) > 1:  # tf > 0, matching the column-path filter
            yield term, nums[0], len(nums) - 1, nums[1:]


def ref_postings(spark: SparkSession, index_dir: str = REF_INDEX_DIR) -> DataFrame:
    """All shipped .idx files -> (term, doc_id, tf, positions).

    Pure-JVM parse: substring_index for the term/data split, regex-free
    ';' / ',' splits, higher-order array functions for the cast — no
    Python in the per-posting path."""
    vis, hid = _idx_files(index_dir)
    lines = spark.read.text(vis)
    parsed = lines.where(F.instr("value", ":") > 0).select(
        F.substring_index("value", ":", 1).alias("term"),
        F.substring_index("value", ":", -1).alias("data"),
    )
    grp = parsed.select(
        "term", F.explode(F.split("data", ";")).alias("grp")
    ).where(F.length("grp") > 0)
    nums = F.transform(
        F.filter(F.split("grp", ","), lambda x: x != F.lit("")),
        lambda x: x.cast("int"),
    )
    out = (
        grp.withColumn("nums", nums)
        .select(
            "term",
            F.element_at("nums", 1).cast("long").alias("doc_id"),
            (F.size("nums") - 1).cast("int").alias("tf"),
            F.slice("nums", 2, F.greatest(F.size("nums") - 1, F.lit(0))).alias(
                "positions"
            ),
        )
        .where(F.col("tf") > 0)
    )
    if hid:
        rows = []
        for path in hid:
            with open(path, encoding="utf-8", errors="replace") as fh:
                for line in fh:
                    rows.extend(_parse_line(line.rstrip("\n")))
        if rows:
            out = out.unionByName(spark.createDataFrame(rows, _POSTING_SCHEMA))
    return out


def ref_documents(spark: SparkSession, index_dir: str = REF_INDEX_DIR) -> DataFrame:
    """``documents`` JSON array -> (doc_id, url, title, doc_len, page_rank,
    num_views).  ``doc_len`` is the reference's real kept-token count
    (``totalTerms``, processDocument :176); page_rank/num_views feed the R7
    cascade with the reference's actual mined values."""
    docs = spark.read.json(os.path.join(index_dir, "documents"), multiLine=True)
    return docs.select(
        F.col("docID").cast("long").alias("doc_id"),
        F.col("_url").alias("url"),
        F.col("_title").alias("title"),
        F.col("totalTerms").cast("int").alias("doc_len"),
        F.col("_pageRank").cast("double").alias("page_rank"),
        F.col("_numViews").cast("long").alias("num_views"),
    )


def ref_sentinels(index_dir: str = REF_INDEX_DIR) -> tuple[int, int]:
    """(num_docs, total_term_frequency) from docURL's sentinel entries
    (:146-147; loadIndex :381-385).  Driver-side: this is O(corpus
    metadata), not O(postings)."""
    with open(os.path.join(index_dir, "docURL"), encoding="utf-8") as fh:
        m = json.load(fh)
    return int(m["_numDocs"]), int(m["_totalTermFrequency"])


def ref_index_tables(
    spark: SparkSession, index_dir: str = REF_INDEX_DIR
) -> tuple[DataFrame, DataFrame, int, int]:
    """(postings_with_dl, docs, num_docs, total_terms) — the standard
    engine contract: postings carry ``dl`` so scoring never joins the doc
    table again.  The 10k-row doc-length side is broadcast."""
    num_docs, total_terms = ref_sentinels(index_dir)
    docs = ref_documents(spark, index_dir)
    postings = ref_postings(spark, index_dir).join(
        F.broadcast(docs.select("doc_id", F.col("doc_len").alias("dl"))),
        "doc_id",
    )
    return postings, docs, num_docs, total_terms
