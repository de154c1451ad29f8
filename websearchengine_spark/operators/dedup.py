"""Deduplication operators for the training-data pipeline.

Exact (hash-groupBy), MinHash+LSH band-bucket candidate generation,
SimHash fingerprints, n-gram Jaccard verification, and embedding-cosine
near-duplicate pairs with label/bucket blocking.

All hashes are md5-derived 60-bit integers so the DuckDB oracle computes
bit-identical values (Spark ``conv(substring(md5(x),1,15),16,10)`` ==
DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT``); no engine-specific hash
(xxhash64/murmur) appears in any gated result.

Scale notes:
- shingle/minhash generation is **map-side only** (array transforms over
  the per-doc token array — no explode-shuffle until the band groupBy);
- LSH candidate pairs come from a single ``groupBy(band_id, band_hash)``;
  bucket sizes are bounded in practice, and a ``max_bucket`` guard drops
  degenerate buckets (all-identical boilerplate) the way heavy-hitter
  salting bounds skew in the index build (SURVEY.md §2.3 A10);
- pairwise verification (Jaccard / cosine) only runs on candidates, never
  all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_MINHASH = 8
N_BANDS = 4  # rows per band = N_MINHASH // N_BANDS
SHINGLE_K = 3


MERSENNE_61 = (1 << 61) - 1


def _derive(seed: int):
    """Universal-hash derivation from the 56-bit md5 base (single-arg
    lambda — a 2-arg callable would make F.transform pass the array
    index)."""
    a = seed + 2
    b = seed * 1000003 + 12289
    return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_61)


def md5_60(col) -> F.Column:
    """60-bit integer hash from the md5 hex prefix — cross-engine stable."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def tokens_col(text_col="text") -> F.Column:
    """The SQL-expressible gate tokenization (lower + non-alnum split)."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")),
        " ",
    )


def _estimated_scan_splits(df: DataFrame) -> int:
    """Estimate how many scan tasks the source will produce, from plan
    metadata only (no job, no ``df.rdd`` — converting the scan plan to an
    RDD is exactly the cost indexer.assign_doc_ids avoids).  File count
    alone is only a LOWER bound: one large multi-row-group parquet file
    still splits into ``ceil(bytes / maxPartitionBytes)`` tasks, so when
    the files are statable we size by bytes and take the max of the two.
    Non-statable schemes (object stores) fall back to the file count."""
    files = df.inputFiles()
    if not files:
        return 0
    try:
        import os
        from urllib.parse import unquote, urlparse

        total = 0
        for f in files:
            p = urlparse(f)
            if p.scheme not in ("", "file"):
                raise OSError(f"non-local scheme {p.scheme}")
            total += os.path.getsize(unquote(p.path))
        raw = df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728b"
        )
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
        low = raw.strip().lower().removesuffix("b")
        mpb = (
            int(low[:-1]) * mult[low[-1]]
            if low and low[-1] in mult
            else int(low)
        )
        return max(len(files), -(-total // max(mpb, 1)))
    except (OSError, ValueError):
        return len(files)


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small test files arrive as 1-2 splits, which would serialize the
    map-side hashing below onto one core; widen to the session's default
    parallelism.  At real scale the source scan is already many splits
    wide and this is a no-op; non-file sources (in-memory test frames)
    report zero files and widen."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if _estimated_scan_splits(df) < max(2, target // 2):
        return df.repartition(target)
    return df


def with_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingles array<string>) — k-token shingles via a map-side
    array transform (no shuffle)."""
    toks = tokens_col()
    # explode(array(toks)) is a Generate barrier: without it,
    # CollapseProject inlines the full-text regexp+split expression into
    # EVERY element_at reference inside the transform (~3·|shingles|
    # re-evaluations of the tokenizer per doc — measured 10x slowdown)
    base = docs.select(
        "doc_id", F.explode(F.array(toks)).alias("toks")
    )
    return base.select(
        "doc_id",
        F.when(
            F.size("toks") >= k,
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - k),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.element_at(F.col("toks"), (i + j + 1).cast("int"))
                        for j in range(k)
                    ],
                ),
            ),
        )
        .otherwise(F.array())
        .alias("shingles"),
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = N_MINHASH, k: int = SHINGLE_K
) -> DataFrame:
    """(doc_id, seed, minhash) — seed-th minhash = min over shingles of
    md5_60(seed || ':' || shingle).  Computed map-side per doc (array_min
    over a transformed array), then exploded: the only wide op downstream
    is the band groupBy."""
    sh = with_shingles(docs, k)

    # ONE md5 per shingle (56-bit int), then n_hashes universal-hash
    # derivations h_s = ((s+2)·h + s·1000003 + 12289) mod (2^61−1) taken
    # as MIN AGGREGATES over exploded shingle rows.  Two earlier shapes
    # were each ~8x slower: hashing per (seed, shingle) costs 8 md5+conv
    # per shingle, and computing a base-hash column consumed by 8
    # array-transforms gets the md5 inlined into every consumer by
    # CollapseProject — duplicating it 8x anyway.  With aggregates the
    # projection evaluates md5 once per row and the partial aggregation
    # keeps the doc_id shuffle at 8 longs per doc.
    # no size filter needed: exploding an empty array emits no rows, and
    # the filter would double-evaluate the shingle transform
    hs = (
        _ensure_parallelism(sh)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .select(
            "doc_id",
            F.conv(
                F.substring(F.md5(F.col("shingle").cast("binary")), 1, 14),
                16,
                10,
            ).cast("long").alias("h"),
        )
    )
    wide = hs.groupBy("doc_id").agg(
        *[
            F.min(_derive(s)(F.col("h"))).alias(f"mh{s}")
            for s in range(n_hashes)
        ]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(s).alias("seed"), F.col(f"mh{s}").alias("minhash"))
            for s in range(n_hashes)
        ]
    )
    return wide.select("doc_id", F.explode(pairs).alias("e")).select(
        "doc_id", F.col("e.seed").alias("seed"), F.col("e.minhash").alias("minhash")
    )


def lsh_bands(
    signatures: DataFrame, n_bands: int = N_BANDS, n_hashes: int = N_MINHASH
) -> DataFrame:
    """(doc_id, band_id, band_hash) — concatenate the band's minhashes in
    seed order and re-hash."""
    rows = n_hashes // n_bands
    banded = signatures.withColumn(
        "band_id", (F.col("seed") / F.lit(rows)).cast("int")
    )
    concat = banded.groupBy("doc_id", "band_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                lambda s: s.getField("minhash").cast("string"),
            ),
            ",",
        ).alias("band_key")
    )
    return concat.select(
        "doc_id", "band_id", md5_60(F.col("band_key")).alias("band_hash")
    )


def minhash_candidate_pairs(
    bands: DataFrame, max_bucket: int = 64
) -> DataFrame:
    """(doc_a, doc_b, n_shared_bands) with doc_a < doc_b — docs sharing at
    least one LSH band bucket.  Buckets larger than ``max_bucket`` are
    dropped (degenerate boilerplate clusters would otherwise explode
    quadratically — the skew guard).

    Shape: ONE groupBy collects each bucket's doc list, then pairs are
    generated in-bucket with an array-combinations expression — no
    self-join (a self-join would recompute the whole signature pipeline
    on both sides) and the bucket bound caps per-row fan-out at
    max_bucket²/2."""
    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= max_bucket))
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), "
                "y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame, k: int = SHINGLE_K
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact k-gram Jaccard verification over the
    candidate pairs only (distinct-shingle sets)."""
    sh = (
        with_shingles(docs, k)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.select("doc_a", "doc_b")
        .join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        pairs.select("doc_a", "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .fillna({"n_inter": 0})
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, n_bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — tf-weighted sign aggregation of per-term hash
    bits.  n_bits kept small (16) so the oracle SQL stays readable; the
    engine path generalizes by changing the constant."""
    toks = tokens_col()
    tf = (
        _ensure_parallelism(docs).select("doc_id", F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h = md5_60(F.col("term"))
    withbits = tf.withColumn("h", h)
    bit_sums = withbits.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"s{b}")
            for b in range(n_bits)
        ]
    )
    out = F.lit(0).cast("long")
    for b in range(n_bits):
        out = out + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0).cast("long")
    return bit_sums.select("doc_id", out.alias("simhash"))


def connected_components(
    edges: DataFrame,
    max_rounds: int = 25,
    rounds_out: list | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges`` —
    component = the smallest node id reachable (transitive closure).

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round is two
    groupBy-min + join passes over the edge relation and the edge set
    converges to a star forest (every node pointing at its component
    min) in O(log^2 n) rounds worst case, ~log n observed — NOT the
    O(diameter) of naive label propagation, which a web-graph chain
    would turn into thousands of shuffles.  Scale shape: neighborhoods
    are never materialized as arrays (hot nodes stay inside partial
    aggregation), nothing reaches the driver except one convergence
    scalar per round, and each round's edge set is
    ``localCheckpoint``-ed: iterative plans grow ~4x per round (two
    joins + unions + distinct over the previous round's tree), so a
    cache alone leaves the analyzer re-walking an exponentially deep
    plan — the checkpoint SEVERS lineage, keeping every round's plan
    one round deep (old round blocks are freed by the context cleaner
    once the reference drops).  ``rounds_out``: optional list; the
    round count is appended (test / telemetry hook)."""
    cu, cv = edges.columns[0], edges.columns[1]
    cur = (
        edges.select(
            F.col(cu).cast("long").alias("u"),
            F.col(cv).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_chk = None
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # large-star over the undirected view: node u attaches each
        # strictly-larger neighbor to min(N(u) + {u}); emitted edges keep
        # the (first > second) invariant
        eb = cur.union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = eb.groupBy("u").agg(F.min("v").alias("mn"))
        ls = (
            eb.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("u"), F.col("mn")).alias("v"),
            )
            .distinct()
        )
        # small-star over (u > v) edges: all of u's smaller neighbors —
        # and u itself — attach to min(N(u))
        mins2 = ls.groupBy("u").agg(F.min("v").alias("mn"))
        nxt = (
            ls.join(mins2, "u")
            .where(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .union(mins2.select(F.col("u"), F.col("mn").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # set-identity convergence check: count + order-insensitive hash
        row = nxt.select(F.xxhash64("u", "v").alias("h")).agg(
            F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x")
        ).head()
        chk = (int(row.n), int(row.x or 0))
        cur = nxt
        if chk == prev_chk:
            break
        prev_chk = chk
    if rounds_out is not None:
        rounds_out.append(rounds)
    # converged star forest: non-roots point at the component min
    labels = cur.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    )
    roots = (
        cur.select(F.col("v").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )
    return (
        labels.union(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.7,
    max_bucket: int = 64,
    k: int = SHINGLE_K,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, is_kept) for EVERY doc — the
    complete near-dup dedup decision: MinHash signatures -> LSH band
    candidates -> exact k-gram Jaccard verify (>= threshold) ->
    connected components -> canonical representative = cluster min.

    Pairs alone don't dedup a corpus: transitive chains (A~B, B~C
    without A~C over the threshold) must collapse into ONE cluster or
    near-dups survive the keep-filter.  ``is_kept`` marks the canonical
    doc (min doc_id); ``cluster_size`` feeds downstream sampling /
    weighting.  Singletons keep their own id via the left join — docs
    never pass through the component machinery unless they are in a
    verified pair, so the iterative stage only sees the (tiny) duplicate
    subgraph, not the corpus."""
    sig = minhash_signatures(docs)
    pairs = minhash_candidate_pairs(lsh_bands(sig), max_bucket)
    verified = ngram_jaccard(docs, pairs, k).where(
        F.col("jaccard") >= threshold
    )
    comp = connected_components(verified.select("doc_a", "doc_b"))
    base = (
        docs.select("doc_id")
        .join(
            comp.select(F.col("node").alias("doc_id"), "component"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").cast("long").alias("cluster_id"),
        )
    )
    sizes = base.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return base.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_kept"),
    )


def exact_fp_col(text_col: str = "text") -> F.Column:
    """md5 over the normalized token stream — the exact-dedup key."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    )
    return F.md5(norm.cast("binary"))


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(fp, canonical_doc_id, n_docs) — exact dedup over the normalized
    token stream."""
    return (
        docs.select("doc_id", exact_fp_col().alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )
