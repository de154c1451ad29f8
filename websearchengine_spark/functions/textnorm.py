"""Text normalization with the reference engine's exact semantics.

Pure Python, no Spark imports — this module is the single source of truth
for tokenization, used both inside the vectorized pandas UDFs
(``functions.udfs``) and by the pure-Python test oracle
(``oracle.engine``).  Reference citations point into /root/reference.

Semantics reproduced exactly:

- 3-step stemmer (``Stemming.java:9-54``): plural strip, ed/ing strip,
  trailing y->i.  Applied to the raw token BEFORE lowercasing
  (``IndexerInvertedCompressed.java:195-196``), so ``Bing -> Bing -> bing``
  but ``CATS -> CAT -> cat``.
- 130-word stopword list incl. single letters and digits
  (``StopWord.java:9-12``); checked AFTER lowercasing; stopwords are dropped
  from postings AND from the document-length counter
  (``IndexerInvertedCompressed.java:197-199``, position counter ``:248``).
- Whitespace tokenization (java.util.Scanner default), title tokens first
  then body, one shared 0-based position counter that advances only on kept
  tokens (``IndexerInvertedCompressed.java:160-188``, ``:191-253``).
- HTML visible-text extraction modelled on Jsoup ``body().text()``
  (``IndexerInvertedCompressed.java:114-119``): drop script/style, strip
  tags, decode basic entities, collapse whitespace.  The extractor is FROZEN
  — tests assert byte-identical output per url against the fixture's ``text``
  column (BASELINE.json input_hint).
- Boilerplate strip + non-alphanumeric -> space performed on the body only
  (``IndexerInvertedCompressed.java:117-119``).
"""

from __future__ import annotations

import re

# --- stopwords: StopWord.java:9-12, verbatim (the Java list repeats "i";
# --- a set dedupes it, as HashSet does in the reference) ------------------
STOPWORDS: frozenset[str] = frozenset(
    [
        "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
        "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
        "1", "2", "3", "4", "5", "6", "7", "8", "9", "0",
        "able", "about", "across", "after", "all", "almost", "also", "am",
        "among", "an", "and", "any", "are", "as", "at", "be", "because",
        "been", "but", "by", "can", "cannot", "could", "dear", "did", "do",
        "does", "either", "else", "ever", "every", "for", "from", "get",
        "got", "had", "has", "have", "he", "her", "hers", "him", "his",
        "how", "however", "if", "in", "into", "is", "it", "its", "just",
        "least", "let", "like", "likely", "may", "me", "might", "most",
        "must", "my", "neither", "no", "nor", "not", "of", "off", "often",
        "on", "only", "or", "other", "our", "own", "rather", "said", "say",
        "says", "she", "should", "since", "so", "some", "than", "that",
        "the", "their", "them", "then", "there", "these", "they", "this",
        "tis", "to", "too", "was", "us", "we", "were", "what", "when",
        "where", "which", "while", "who", "whom", "why", "will", "with",
        "would", "yet", "you", "your", "www", "http", "com", ".",
    ]
)

# Wikipedia boilerplate literal stripped from body text
# (IndexerInvertedCompressed.java:117-118); the stripped string is
# title + BOILERPLATE_SUFFIX.
BOILERPLATE_SUFFIX = (
    " From Wikipedia, the free encyclopedia Jump to: navigation, search "
)


def stem(token: str) -> str:
    """The reference's 3-step stemmer (Stemming.java:9-54).

    NOT Porter.  Step order: plural strip -> ed/ing strip -> y->i.
    Must be applied to the raw (pre-lowercase) token.
    """
    # step 1: plurals (Stemming.java:14-33)
    if len(token) > 1 and token.endswith("s"):
        if token[-2] == "s":
            pass  # -ss: keep
        elif (
            token[-2] == "e"
            and len(token) > 3
            and (token[-3] in ("x", "s") or token[-4:-2] == "ch")
        ):
            token = token[:-2]  # -xes/-ses/-ches: drop "es"
        else:
            token = token[:-1]  # plain plural: drop "s"
    # step 2: ed/edly/ing/ingly, first match wins in this order
    # (Stemming.java:35-47)
    if token.endswith("ed"):
        token = token[:-2]
    elif token.endswith("edly"):
        token = token[:-4]
    elif token.endswith("ing"):
        token = token[:-3]
    elif token.endswith("ingly"):
        token = token[:-5]
    # step 3: trailing y -> i (Stemming.java:50-55)
    if token.endswith("y"):
        token = token[:-1] + "i"
    return token


def normalize_token(raw: str) -> str | None:
    """stem -> lowercase -> stopword/empty filter.

    Returns the index term, or None if the token is dropped
    (IndexerInvertedCompressed.java:193-199).
    """
    s = stem(raw).lower()
    if s in STOPWORDS or len(s) == 0:
        return None
    return s


def tokenize_document(title: str, text: str) -> list[str]:
    """Full document tokenization: title tokens then body tokens, each
    stemmed/lowercased/stopword-filtered; list index == position
    (IndexerInvertedCompressed.java:160-188).

    ``text`` is the extracted visible text; the boilerplate strip and
    non-alphanumeric scrub are applied here to the body only
    (IndexerInvertedCompressed.java:117-119 applies them before readTerms).
    """
    body = body_for_indexing(title, text)
    out: list[str] = []
    for raw in title.split():  # Scanner default == str.split() on whitespace
        t = normalize_token(raw)
        if t is not None:
            out.append(t)
    for raw in body.split():
        t = normalize_token(raw)
        if t is not None:
            out.append(t)
    return out


_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]")


def body_for_indexing(title: str, text: str) -> str:
    """Boilerplate strip + non-alphanumeric -> single space (no collapsing),
    exactly IndexerInvertedCompressed.java:117-119 (Java String.replace
    replaces ALL literal occurrences; replaceAll substitutes each
    non-alphanumeric CHARACTER with one space)."""
    body = text.replace(title + BOILERPLATE_SUFFIX, " ")
    return _NON_ALNUM.sub(" ", body)


# --------------------------------------------------------------------------
# HTML -> visible text (S2).  FROZEN extractor; byte-identity is a test gate.
# --------------------------------------------------------------------------

_SCRIPT_RE = re.compile(r"(?is)<script\b.*?</script\s*>")
_STYLE_RE = re.compile(r"(?is)<style\b.*?</style\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_HEAD_RE = re.compile(r"(?is)<head\b.*?</head\s*>")
_BODY_RE = re.compile(r"(?is)<body\b[^>]*>(.*?)</body\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n\f\v ]+")

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))


def extract_text(html: bytes | str) -> str:
    """HTML -> visible body text (Jsoup ``body().text()`` model,
    IndexerInvertedCompressed.java:114-116).

    Deterministic and frozen: decode UTF-8 -> drop comments/script/style ->
    take <body> content (else drop <head>) -> tags -> space -> decode basic
    entities -> collapse whitespace runs to one space -> strip.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", html)
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    m = _BODY_RE.search(s)
    if m is not None:
        s = m.group(1)
    else:
        s = _HEAD_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENTITY_RE.sub(lambda mm: _ENTITIES[mm.group(0)], s)
    s = _WS_RE.sub(" ", s)
    return s.strip()


# --------------------------------------------------------------------------
# Query parsing (T6): QueryPhrase.java:18-66
# --------------------------------------------------------------------------


def parse_query(query: str) -> list[str]:
    """Raw query -> token list; the FIRST quoted span becomes one
    multi-word token (words space-joined), every word stemmed but NOT
    lowercased and NOT stopword-filtered (QueryPhrase.java:18-66 — the
    serving handler lowercases the URI first, QueryHandler.java:443-445;
    our API does the same before calling this)."""
    tokens: list[str] = []
    open_q = query.find('"')
    close_q = query.find('"', open_q + 1) if open_q != -1 else -1
    if open_q != -1 and close_q != -1:
        start, phrase, last = (
            query[:open_q].strip(),
            query[open_q + 1 : close_q],
            query[close_q + 1 :].strip(),
        )
        tokens.extend(stem(w) for w in start.split())
        if phrase:
            tokens.append(" ".join(stem(w) for w in phrase.split()))
        tokens.extend(stem(w) for w in last.split())
    else:
        tokens.extend(stem(w) for w in query.split())
    return tokens


LINK_RE = re.compile(r'<[aA][^>]*?href="([^ /#"]*)"')


def extract_links(html: bytes | str) -> list[str]:
    """In-corpus link targets: first capture of the reference's regex
    ``<[a|A].*?href="([^ /#]*)".*?>`` per anchor (CorpusAnalyzer.java:36-37).
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    return LINK_RE.findall(html)
