"""PII detection + redaction for web-scale training corpora.

Standard pre-training scrub (emails / IPv4 addresses / international
phone numbers -> typed placeholder tokens), the same filter family as
C4 / RefinedWeb / Dolma's `pii` stage.  Everything is a pure Catalyst
column expression — `regexp_extract_all` for counts, chained
`regexp_replace` for the scrub — so the whole operator is map-side,
whole-stage-codegen, zero shuffle, and scales as an embarrassingly
parallel scan at any corpus size.

Pattern dialect: the patterns below are deliberately restricted to the
intersection of Java `java.util.regex` (Spark) and RE2 (DuckDB, the
oracle engine): no lookaround, no backreferences, no POSIX classes —
character classes, bounded repetition and `\\b` word boundaries only.
For these constructs Java's leftmost-greedy and RE2's leftmost-first
semantics produce identical matches, which is what lets the DuckDB gate
hash-compare redacted text byte-for-byte.

Replacement order is fixed (email -> ipv4 -> phone) and the three
placeholder tokens contain no digits or '@'/'+', so a replacement can
never create a new match for a later pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One pattern string per PII class, shared VERBATIM with the DuckDB
# oracle (plans/registry_traindata.py interpolates these constants into
# the gate SQL).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,3}-[0-9]{2,4}-[0-9]{3,4}(?:-[0-9]{3,4})?"

# (pattern, placeholder) in application order.
PII_RULES: list[tuple[str, str]] = [
    (PII_EMAIL, "<EMAIL>"),
    (PII_IPV4, "<IP>"),
    (PII_PHONE, "<PHONE>"),
]


def _count(col: F.Column, pattern: str) -> F.Column:
    return F.size(
        F.regexp_extract_all(col, F.lit(pattern), F.lit(0))
    ).cast("long")


def redacted_col(text: F.Column) -> F.Column:
    """`text` with every PII match replaced by its placeholder —
    chained regexp_replace, pure codegen."""
    out = text
    for pattern, token in PII_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII counts + redacted text.

    Returns (doc_id, n_email, n_ip, n_phone, n_pii, redacted).  Counts
    are taken on the ORIGINAL text per pattern (order-independent);
    redaction applies the rules in PII_RULES order.  One projection,
    no shuffle — at 10^12 docs this runs at scan speed and the only
    cost is the regex automata, which Java compiles once per task.
    """
    t = F.col(text_col)
    n_email = _count(t, PII_EMAIL)
    n_ip = _count(t, PII_IPV4)
    n_phone = _count(t, PII_PHONE)
    return docs.select(
        "doc_id",
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
        (n_email + n_ip + n_phone).alias("n_pii"),
        redacted_col(t).alias("redacted"),
    )
