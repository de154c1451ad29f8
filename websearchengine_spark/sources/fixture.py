"""Deterministic synthetic webtext corpus (FIXTURES.md §1-5).

Generates Common-Crawl-style pages ``(url, warc_ts, html, text, lang)`` per
BASELINE.json's input_hint, at any document count, from a fixed seed — no
external data.  The ``text`` column is constructed FIRST and the HTML is
wrapped around it such that ``functions.textnorm.extract_text(html) == text``
byte-identically (that round trip is a test gate).

Content recipe (FIXTURES.md): ~2k-term zipf vocabulary with heavy hitters,
pre-stem surface variants (cats/cated/searching/company), reference stopwords,
planted phrase runs ("data mining", "web search", "new york city"), in-corpus
``<a href>`` links, ``<script>``/``<style>`` blocks that must not leak, the
Wikipedia boilerplate prefix on a subset of docs, and a few non-``en`` rows.
"""

from __future__ import annotations

import datetime as _dt
import random
from dataclasses import dataclass

from websearchengine_spark.functions.textnorm import BOILERPLATE_SUFFIX

SEED = 42

# Base vocabulary: deterministic pseudo-words + reference-relevant words.
_SPECIAL_WORDS = [
    # reference query set (hw1/instructor/data/queries.tsv)
    "bing", "data", "mining", "google", "salsa", "web", "search",
    # phrase plant for "new york city"
    "new", "york", "city",
    # pre-stem surface variants (Stemming.java behaviors)
    "cats", "cated", "searching", "company", "companies", "classes",
    "boxes", "churches", "miss", "Bing", "CATS", "engines", "engine",
    # stopwords that must vanish from the index
    "the", "and", "of", "to", "is", "a", "i",
]


def _vocab(rng: random.Random, size: int = 2000) -> list[str]:
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    words = list(_SPECIAL_WORDS)
    seen = set(words)
    while len(words) < size:
        n = rng.randint(2, 4)
        w = "".join(
            rng.choice(consonants) + rng.choice(vowels) for _ in range(n)
        )
        if rng.random() < 0.2:
            w += rng.choice(["s", "ed", "ing", "y", "es"])
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


_PHRASES = [
    ["data", "mining"],
    ["web", "search"],
    ["new", "york", "city"],
    ["web", "search", "engine"],
]


@dataclass
class CorpusRow:
    url: str
    warc_ts: _dt.datetime
    html: bytes
    text: str
    lang: str


def synth_corpus(n_docs: int, seed: int = SEED) -> list[CorpusRow]:
    """Deterministic corpus of ``n_docs`` pages; stable for a given
    (n_docs, seed)."""
    rng = random.Random(seed)
    vocab = _vocab(rng)
    # zipf-ish weights: heavy hitters up front
    weights = [1.0 / (i + 1) ** 0.9 for i in range(len(vocab))]

    # urls are filename-like (reference: filename = title = url), fixed width
    # so lexicographic order == generation order (doc_id contract)
    urls = [f"Doc_{i:06d}_{rng.choice(vocab).capitalize()}" for i in range(n_docs)]

    rows: list[CorpusRow] = []
    epoch = _dt.datetime(2024, 1, 1, 0, 0, 0)
    for i, url in enumerate(urls):
        lang = "en" if rng.random() > 0.03 else rng.choice(["de", "fr", "zh"])
        n_words = rng.randint(40, 400)
        words = rng.choices(vocab, weights=weights, k=n_words)
        # plant phrase runs so phrase queries hit (FIXTURES.md recipe)
        for ph in _PHRASES:
            if rng.random() < 0.25 and len(words) > len(ph):
                at = rng.randrange(0, len(words) - len(ph))
                words[at : at + len(ph)] = ph
        # a few links to other docs (link-graph fixture); anchor text is a
        # vocab word and the href target is an in-corpus url
        n_links = rng.randint(0, 4)
        link_targets = [urls[rng.randrange(0, n_docs)] for _ in range(n_links)]

        body_text = " ".join(words)
        if rng.random() < 0.3:  # boilerplate subset
            body_text = url + BOILERPLATE_SUFFIX.rstrip() + " " + body_text
        anchor_bits = " ".join(rng.choice(vocab) for _ in link_targets)
        text = (body_text + (" " + anchor_bits if anchor_bits else "")).strip()

        # wrap html so extract_text(html) == text byte-identically
        anchors = "".join(
            f'<a href="{t}">{w}</a> '
            for t, w in zip(link_targets, anchor_bits.split())
        )
        html = (
            "<html><head><title>{u}</title>"
            "<script>var hidden = 'must not leak {j}';</script>"
            "<style>.x{{color:red}}</style></head>"
            "<body>\n<!-- comment noise -->\n<p>{body}</p>\n{anchors}"
            "<script>console.log('tail noise');</script></body></html>"
        ).format(u=url, j=i, body=body_text, anchors=anchors)
        rows.append(
            CorpusRow(
                url=url,
                warc_ts=epoch + _dt.timedelta(seconds=i * 137),
                html=html.encode("utf-8"),
                text=text,
                lang=lang,
            )
        )
    return rows


def corpus_df(spark, n_docs: int, seed: int = SEED):
    """Materialize the fixture as a Spark DataFrame with the input_hint
    schema (url string, warc_ts timestamp, html binary, text string,
    lang string)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    data = [
        (r.url, r.warc_ts, r.html, r.text, r.lang)
        for r in synth_corpus(n_docs, seed)
    ]
    return spark.createDataFrame(data, schema)


# ---- reference-style side fixtures (queries / qrels / view log / ads) -----

REFERENCE_QUERIES = [
    # hw1/instructor/data/queries.tsv + phrase forms (FIXTURES.md §2)
    (1, "bing", "conjunctive"),
    (2, "data mining", "conjunctive"),
    (3, "google", "conjunctive"),
    (4, "salsa", "conjunctive"),
    (5, "web search", "conjunctive"),
    (6, '"data mining"', "conjunctive"),
    (7, '"new york city"', "conjunctive"),
    (8, 'history "web search" engine', "disjunctive"),
]


def synth_view_log(urls: list[str], seed: int = SEED) -> list[str]:
    """Pageview log lines ``lang article views`` with URL-encoded article and
    some malformed rows (LogMinerNumviews.java:68-104 filter semantics)."""
    import urllib.parse

    rng = random.Random(seed + 1)
    lines = []
    for u in urls:
        if rng.random() < 0.9:
            lines.append(f"en {urllib.parse.quote(u)} {rng.randint(0, 100000)}")
        if rng.random() < 0.05:  # malformed: non-numeric views
            lines.append(f"en {urllib.parse.quote(u)} NaNviews")
        if rng.random() < 0.05:  # malformed: wrong field count
            lines.append(f"en {urllib.parse.quote(u)}")
    rng.shuffle(lines)
    return lines


def synth_ads(seed: int = SEED) -> list[tuple[str, str, str]]:
    """(company_ads, title, body) rows after project/data/ads/
    advertisement.tsv; company_ads = company + "_" + ad_id
    (AdsIndex.java:101,149-180)."""
    rng = random.Random(seed + 2)
    companies = ["acme", "globex", "initech", "umbrella", "hooli"]
    kws = ["web", "search", "data", "mining", "cloud", "salsa", "engine"]
    out = []
    ad_id = 0
    for c in companies:
        for _ in range(rng.randint(2, 4)):
            ad_id += 1
            title = " ".join(rng.choices(kws, k=3))
            body = " ".join(rng.choices(kws, k=12))
            out.append((f"{c}_{ad_id}", title, body))
    return out
