import pytest


@pytest.fixture(scope="session")
def spark():
    from websearchengine_spark.session import get_spark

    s = get_spark("local[4]", app_name="wse-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus():
    """120-doc fixture, en-filtered, with the oracle index built once."""
    from websearchengine_spark.oracle import engine as oracle
    from websearchengine_spark.sources import fixture

    rows = [r for r in fixture.synth_corpus(120) if r.lang == "en"]
    return rows, oracle.build_index(rows)


@pytest.fixture(scope="session")
def spark_index(spark, small_corpus):
    """Spark-side index over the same corpus: corpus_ids, postings (cached),
    docs, stats scalars."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators import indexer
    from websearchengine_spark.sources import fixture

    rows, _ = small_corpus
    df = fixture.corpus_df(spark, 120).where(F.col("lang") == "en")
    ids = indexer.assign_doc_ids(df, n_parts=4)
    postings = indexer.build_postings(ids).cache()
    docs = indexer.docs_table(ids, postings).cache()
    stats = indexer.collection_stats(docs).head()
    return {
        "corpus_ids": ids,
        "postings": postings,
        "docs": docs,
        "num_docs": stats.num_docs,
        "total_terms": stats.total_terms,
        "avgdl": stats.avgdl,
    }
