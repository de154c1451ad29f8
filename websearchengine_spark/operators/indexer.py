"""Index-build operators (SURVEY.md §2.3, A1-A10).

Scale design (the part the reference solves with spill/merge under a 512 MB
heap, IndexerInvertedCompressed.java:124-143, :301-359):

- **doc_id assignment** is a deterministic global rank over ``url`` computed
  WITHOUT a single-partition sort: range-repartition by url, sort within
  partitions, then add per-partition offsets (two-pass; the offsets table is
  #partitions rows).  The rank is partitioning-independent, so the same
  corpus yields the same doc_ids at any cluster size — required for
  rank-identical results (SURVEY.md §1.2 docid contract).
- **posting generation is map-side only**: the tokenizer UDF aggregates
  (term -> tf, positions) WITHIN each document, so building the
  ``postings(term, doc_id, tf, positions, dl)`` relation needs NO shuffle at
  all — doc-locality makes the per-(term,doc) groupBy free.  The reference's
  equivalent is readTerms' in-memory charMap (:191-253).
- **segment assembly** groups by ``(term, chunk)`` where
  ``chunk = doc_id // chunk_docs``: a heavy-hitter term appearing in every
  document still never concentrates more than ``chunk_docs`` postings in one
  task.  This IS the frequency-aware salting / two-phase merge the
  north_star requires, with doc_id-range salts so chunks concatenate in
  doc-order without a second merge pass (chunks are disjoint, ordered).
  The reference's analogues: first-char file partitioning (:267-270) and
  hot-list pinning (AdsIndex.java:321-323).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from websearchengine_spark.functions import codec
from websearchengine_spark.functions.textnorm import tokenize_document

DEFAULT_CHUNK_DOCS = 1 << 16  # salt-range width for segment grouping
N_TERM_BUCKETS = 64  # storage partition: bucket(term) for scan pruning


# --------------------------------------------------------------------------
# doc_id assignment
# --------------------------------------------------------------------------


def assign_doc_ids(corpus: DataFrame, n_parts: int | None = None) -> DataFrame:
    """0-based dense rank over url, computed scalably.

    Equivalent to ``row_number() over (order by url)`` - 1, but avoids the
    single-partition window: range-partition by url, count rows per
    partition (tiny driver-side pass), then offset local row numbers.
    """
    spark = corpus.sparkSession
    if n_parts is None:
        # defaultParallelism, NOT corpus.rdd.getNumPartitions(): touching
        # .rdd forces a DataFrame->RDD conversion of the whole scan plan
        # just to read a number
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
    parted = corpus.repartitionByRange(n_parts, "url").sortWithinPartitions("url")

    counts_schema = T.StructType(
        [
            T.StructField("pid", T.IntegerType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def _count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        pid = -1
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for b in batches:
            n += len(b)
        yield pd.DataFrame({"pid": [pid], "n": [n]})

    counts = sorted(
        parted.select("url").mapInPandas(_count, counts_schema).collect(),
        key=lambda r: r.pid,
    )
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r.pid] = acc
        acc += r.n
    boff = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        corpus.schema.fields + [T.StructField("doc_id", T.LongType(), False)]
    )

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = boff.value.get(pid, 0)
        seen = 0
        for b in batches:
            b = b.copy()
            b["doc_id"] = range(base + seen, base + seen + len(b))
            seen += len(b)
            yield b

    return parted.mapInPandas(_assign, out_schema)


# --------------------------------------------------------------------------
# map-side posting generation (A1-A3 fused, zero shuffle)
# --------------------------------------------------------------------------

POSTING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)

POSTING_BYTES_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("pos_bytes", T.BinaryType(), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)


def build_postings(
    corpus_with_ids: DataFrame, positions_as: str = "array"
) -> DataFrame:
    """(url, text, doc_id) -> postings(term, doc_id, tf, positions|pos_bytes, dl).

    The per-(term,doc) aggregation happens inside the Arrow UDF (document
    locality), so this stage is shuffle-free; ``dl`` (kept-token doc length,
    IndexerInvertedCompressed.java:178) rides along so downstream scoring
    never needs a doc-side join.

    ``positions_as="bytes"`` applies the delta-gap + varint position codec
    MAP-SIDE (A8), so the segment shuffle moves compact binary instead of
    Arrow int lists — at scale the positions dominate shuffle bytes, and
    per-doc varint streams concatenate into the segment payload without
    re-encoding (varint framing is per-value, so
    ``concat(encode(doc_i gaps))`` == ``encode(concat(doc gaps))``)."""
    as_bytes = positions_as == "bytes"
    import numpy as np

    MEMO_CAP = 1 << 20  # bound the per-task cache on high-cardinality text

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}  # per-task raw-token -> normalized cache (Zipf)
        for b in batches:
            if len(memo) > MEMO_CAP:
                memo.clear()
            terms, dids, tfs, poss, dls = [], [], [], [], []
            flat_pos: list[int] = []  # bytes mode: all positions, in order
            for url, text, did in zip(b["url"], b["text"], b["doc_id"]):
                toks = tokenize_document(url, text, memo)
                dl = len(toks)
                by_term: dict[str, list[int]] = {}
                for pos, t in enumerate(toks):
                    by_term.setdefault(t, []).append(pos)
                for t, plist in by_term.items():
                    terms.append(t)
                    dids.append(did)
                    tfs.append(len(plist))
                    if as_bytes:
                        flat_pos.extend(plist)
                    else:
                        poss.append(plist)
                    dls.append(dl)
            if as_bytes:
                # ONE vectorized delta+varint pass over every posting in
                # the batch, sliced back per posting (byte-identical to
                # per-posting encoding; the per-call numpy overhead on
                # tiny arrays was 93% of kernel time)
                lens = np.asarray(tfs, dtype=np.int64)
                flat = np.asarray(flat_pos, dtype=np.int64)
                seg_starts = np.concatenate(
                    ([0], np.cumsum(lens)[:-1])
                ) if lens.size else np.empty(0, dtype=np.int64)
                poss = codec.encode_varints_segmented(
                    codec.delta_encode_segmented(flat, seg_starts), lens
                )
            yield pd.DataFrame(
                {
                    "term": terms,
                    "doc_id": dids,
                    "tf": pd.array(tfs, dtype="int32"),
                    ("pos_bytes" if as_bytes else "positions"): pd.Series(
                        poss, dtype=object
                    ),
                    "dl": pd.array(dls, dtype="int32"),
                }
            )

    return corpus_with_ids.select("url", "text", "doc_id").mapInPandas(
        _gen, POSTING_BYTES_SCHEMA if as_bytes else POSTING_SCHEMA
    )


def with_term_bucket(postings: DataFrame, n_buckets: int = N_TERM_BUCKETS) -> DataFrame:
    """Storage partition key: bucket(term).  Queries prune scans to the
    buckets of their terms — the Spark analogue of the reference's
    ``grep -w term <firstChar>.idx`` (IndexerInvertedCompressed.java:752-796)
    with a proper hash instead of first-char skew."""
    return postings.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    )


def term_bucket_of(term: str, spark, n_buckets: int = N_TERM_BUCKETS) -> int:
    """Driver-side bucket computation for scan pruning on lookups."""
    row = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(term)), F.lit(n_buckets)).cast("int").alias("b")
    ).head()
    return row.b


# --------------------------------------------------------------------------
# stats (A3-A6)
# --------------------------------------------------------------------------


def docs_table(corpus_with_ids: DataFrame, postings: DataFrame) -> DataFrame:
    """docs(doc_id, url, doc_len) — doc_len = kept tokens (A3); docs whose
    tokens were all filtered keep doc_len 0."""
    dl = postings.groupBy("doc_id").agg(F.first("dl").alias("doc_len"))
    return (
        corpus_with_ids.select("doc_id", "url")
        .join(dl, "doc_id", "left")
        .fillna({"doc_len": 0})
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """term_stats(term, df, ctf) (A5/A6)."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").cast("long").alias("ctf")
    )


def collection_stats(docs: DataFrame) -> DataFrame:
    """1-row (num_docs, total_terms, avgdl) (A4; sentinels semantics
    IndexerInvertedCompressed.java:146-147)."""
    return docs.agg(
        F.count(F.lit(1)).alias("num_docs"),
        F.sum("doc_len").cast("long").alias("total_terms"),
        F.avg("doc_len").alias("avgdl"),
    )


# --------------------------------------------------------------------------
# compressed segments (A7-A10)
# --------------------------------------------------------------------------

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("chunk", T.LongType(), False),
        T.StructField("block_seq", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("doc_gap_bytes", T.BinaryType(), False),
        T.StructField("tf_bytes", T.BinaryType(), False),
        T.StructField("dl_bytes", T.BinaryType(), False),
        T.StructField("pos_bytes", T.BinaryType(), False),
        T.StructField("block_max_tf", T.IntegerType(), False),
        T.StructField("block_max_weight", T.DoubleType(), False),
        T.StructField("sum_tf", T.LongType(), False),
    ]
)

BM25_K1 = 1.2
BM25_B = 0.75


def build_segments(
    postings: DataFrame,
    avgdl: float,
    chunk_docs: int = DEFAULT_CHUNK_DOCS,
    block_docs: int = codec.BLOCK_DOCS,
    with_positions: bool = True,
    n_parts: int | None = None,
) -> DataFrame:
    """postings -> delta-gap+varint block segments with block-max metadata.

    Grouping key (term, doc_id // chunk_docs) bounds every task at
    chunk_docs postings regardless of term frequency (heavy-hitter safe);
    blocks of ``block_docs`` postings carry ``block_max_weight`` =
    max over block of the BM25 tf-part, enabling block-max WAND pruning
    (score upper bound = idf * (k1+1) * block_max_weight).

    Physical shape: ``repartition(term, chunk)`` + sort-within-partitions
    + ONE streaming mapInPandas that walks group boundaries with numpy and
    emits one Arrow batch per input batch.  An applyInPandas-per-group
    formulation is ~10x slower here: inverted-index groups are tiny (a few
    postings) and per-group pandas materialization dominates; this shape
    keeps per-group cost at numpy-slice level.  Groups straddling Arrow
    batch boundaries are carried over inside the partition iterator."""
    import numpy as np

    k1, b = BM25_K1, BM25_B
    spark = postings.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # positions either as int arrays (encode here) or as per-doc varint
    # streams already encoded map-side (concatenate — framing is per value)
    bytes_mode = "pos_bytes" in postings.columns
    pos_col = "pos_bytes" if bytes_mode else "positions"

    def _encode_groups_batch(
        terms,
        chunks,
        doc_ids,
        tfs,
        dls,
        poss,
        group_starts,
        group_ends,
        out: dict,
    ) -> None:
        """Encode EVERY block of every (term, chunk) group in the batch
        with a handful of vectorized passes (reduceat for the block-max
        metadata, one segmented delta+varint per payload column) instead
        of per-block numpy calls — the same batching that tripled the
        posting kernel."""
        # block boundaries tile the batch: each group splits into runs of
        # <= block_docs postings
        blk_starts = np.concatenate(
            [
                np.arange(lo, hi, block_docs)
                for lo, hi in zip(group_starts, group_ends)
            ]
        )
        n_blocks_per_group = np.array(
            [
                (hi - lo + block_docs - 1) // block_docs
                for lo, hi in zip(group_starts, group_ends)
            ],
            dtype=np.int64,
        )
        total = int(group_ends[-1]) if len(group_ends) else 0
        # slice to the processed span: reduceat's last segment runs to the
        # end of the ARRAY, which may include the held-back pending group
        doc_ids = doc_ids[:total]
        tfs = tfs[:total]
        dls = dls[:total]
        if poss is not None:
            poss = poss[:total]
        blk_ends = np.concatenate((blk_starts[1:], [total]))
        blk_lens = blk_ends - blk_starts
        n_blk = blk_starts.size

        out["term"].extend(terms[blk_starts].tolist())
        out["chunk"].extend(chunks[blk_starts].tolist())
        out["block_seq"].extend(
            np.concatenate(
                [np.arange(nb) for nb in n_blocks_per_group]
            ).tolist()
        )
        out["n_docs"].extend(blk_lens.tolist())
        out["first_doc_id"].extend(doc_ids[blk_starts].tolist())
        out["last_doc_id"].extend(doc_ids[blk_ends - 1].tolist())
        out["doc_gap_bytes"].extend(
            codec.encode_varints_segmented(
                codec.delta_encode_segmented(doc_ids, blk_starts), blk_lens
            )
        )
        out["tf_bytes"].extend(codec.encode_varints_segmented(tfs, blk_lens))
        out["dl_bytes"].extend(codec.encode_varints_segmented(dls, blk_lens))
        out["block_max_tf"].extend(
            np.maximum.reduceat(tfs, blk_starts).tolist()
        )
        out["sum_tf"].extend(np.add.reduceat(tfs, blk_starts).tolist())
        w = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        out["block_max_weight"].extend(
            np.maximum.reduceat(w, blk_starts).tolist()
        )
        if poss is None:
            out["pos_bytes"].extend([b""] * n_blk)
        elif bytes_mode:
            # per-doc varint streams concatenate per block (framing is
            # per value, so no re-encoding)
            out["pos_bytes"].extend(
                b"".join(bytes(x) for x in poss[lo:hi])
                for lo, hi in zip(blk_starts, blk_ends)
            )
        else:
            # flatten every posting's positions once; delta restarts per
            # POSTING, byte segments group per BLOCK
            from itertools import chain

            pos_counts = tfs
            flat = np.fromiter(
                chain.from_iterable(poss),
                dtype=np.int64,
                count=int(pos_counts.sum()),
            )
            posting_starts = np.concatenate(
                ([0], np.cumsum(pos_counts)[:-1])
            )
            block_pos_lens = np.add.reduceat(pos_counts, blk_starts)
            out["pos_bytes"].extend(
                codec.encode_varints_segmented(
                    codec.delta_encode_segmented(flat, posting_starts),
                    block_pos_lens,
                )
            )

    def _fresh_out() -> dict:
        return {f.name: [] for f in SEGMENT_SCHEMA.fields}

    def _to_pdf(out: dict) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "term": out["term"],
                "chunk": pd.array(out["chunk"], dtype="int64"),
                "block_seq": pd.array(out["block_seq"], dtype="int32"),
                "n_docs": pd.array(out["n_docs"], dtype="int32"),
                "first_doc_id": pd.array(out["first_doc_id"], dtype="int64"),
                "last_doc_id": pd.array(out["last_doc_id"], dtype="int64"),
                "doc_gap_bytes": pd.Series(out["doc_gap_bytes"], dtype=object),
                "tf_bytes": pd.Series(out["tf_bytes"], dtype=object),
                "dl_bytes": pd.Series(out["dl_bytes"], dtype=object),
                "pos_bytes": pd.Series(out["pos_bytes"], dtype=object),
                "block_max_tf": pd.array(out["block_max_tf"], dtype="int32"),
                "block_max_weight": pd.array(
                    out["block_max_weight"], dtype="float64"
                ),
                "sum_tf": pd.array(out["sum_tf"], dtype="int64"),
            }
        )

    def _gen(batches) -> "pd.DataFrame":
        pend: pd.DataFrame | None = None
        for bdf in batches:
            if pend is not None and len(pend):
                bdf = pd.concat([pend, bdf], ignore_index=True)
                pend = None
            if not len(bdf):
                continue
            terms = bdf["term"].to_numpy()
            chunks = bdf["chunk"].to_numpy()
            change = (
                np.flatnonzero(
                    (terms[1:] != terms[:-1]) | (chunks[1:] != chunks[:-1])
                )
                + 1
            )
            starts = np.concatenate(([0], change))
            if len(starts) == 1:
                pend = bdf  # single (possibly incomplete) group
                continue
            # hold the last group back: it may continue in the next batch
            last = int(starts[-1])
            pend = bdf.iloc[last:]
            doc_ids = bdf["doc_id"].to_numpy(dtype=np.int64)
            tfs = bdf["tf"].to_numpy(dtype=np.int64)
            dls = bdf["dl"].to_numpy(dtype=np.int64)
            poss = bdf[pos_col].to_list() if with_positions else None
            out = _fresh_out()
            _encode_groups_batch(
                terms, chunks, doc_ids, tfs, dls, poss,
                starts[:-1], starts[1:], out,
            )
            yield _to_pdf(out)
        if pend is not None and len(pend):
            out = _fresh_out()
            terms = pend["term"].to_numpy()
            chunks = pend["chunk"].to_numpy()
            change = (
                np.flatnonzero(
                    (terms[1:] != terms[:-1]) | (chunks[1:] != chunks[:-1])
                )
                + 1
            )
            starts = np.concatenate(([0], change, [len(pend)]))
            doc_ids = pend["doc_id"].to_numpy(dtype=np.int64)
            tfs = pend["tf"].to_numpy(dtype=np.int64)
            dls = pend["dl"].to_numpy(dtype=np.int64)
            poss = pend[pos_col].to_list() if with_positions else None
            _encode_groups_batch(
                terms, chunks, doc_ids, tfs, dls, poss,
                starts[:-1], starts[1:], out,
            )
            yield _to_pdf(out)

    keyed = postings.withColumn(
        "chunk", (F.col("doc_id") / F.lit(chunk_docs)).cast("long")
    )
    cols = ["term", "chunk", "doc_id", "tf", "dl"] + (
        [pos_col] if with_positions else []
    )
    parted = (
        keyed.select(*cols)
        .repartition(n_parts, "term", "chunk")
        .sortWithinPartitions("term", "chunk", "doc_id")
    )
    return parted.mapInPandas(_gen, SEGMENT_SCHEMA)


def decode_segments(segments: DataFrame, with_positions: bool = False) -> DataFrame:
    """segments -> postings(term, doc_id, tf, dl[, positions]) — the A9
    prefix-sum decode as a streaming mapInPandas (no shuffle)."""
    import numpy as np

    fields = [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
    if with_positions:
        fields.append(
            T.StructField("positions", T.ArrayType(T.IntegerType()), False)
        )
    schema = T.StructType(fields)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for bdf in batches:
            out = {"term": [], "doc_id": [], "tf": [], "dl": []}
            pos_col = [] if with_positions else None
            # zip over column arrays, not iterrows(): one Python iteration
            # per 128-posting segment row, without pandas row-object
            # construction in the hottest decode path
            pos_bytes_col = (
                bdf["pos_bytes"] if with_positions else [None] * len(bdf)
            )
            for term, gaps, tfb, dlb, posb in zip(
                bdf["term"], bdf["doc_gap_bytes"], bdf["tf_bytes"],
                bdf["dl_bytes"], pos_bytes_col,
            ):
                doc_ids = codec.delta_decode(codec.decode_varints(gaps))
                tfs = codec.decode_varints(tfb)
                dls = codec.decode_varints(dlb)
                out["term"].extend([term] * len(doc_ids))
                out["doc_id"].extend(doc_ids.tolist())
                out["tf"].extend(tfs.tolist())
                out["dl"].extend(dls.tolist())
                if with_positions:
                    pos_col.extend(
                        [p.tolist() for p in codec.decode_positions(posb, tfs)]
                    )
            pdf = pd.DataFrame(
                {
                    "term": out["term"],
                    "doc_id": pd.array(out["doc_id"], dtype="int64"),
                    "tf": pd.array(out["tf"], dtype="int32"),
                    "dl": pd.array(out["dl"], dtype="int32"),
                }
            )
            if with_positions:
                pdf["positions"] = pd.Series(pos_col, dtype=object)
            yield pdf

    cols = ["term", "doc_gap_bytes", "tf_bytes", "dl_bytes"] + (
        ["pos_bytes"] if with_positions else []
    )
    return segments.select(*cols).mapInPandas(_decode, schema)
