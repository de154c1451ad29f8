"""PII redaction: hand-case semantics + the dialect invariants the gate
relies on (counts on original text, fixed replacement order, placeholders
that cannot re-trigger later patterns)."""

import pytest


@pytest.fixture(scope="module")
def out_rows(spark):
    from websearchengine_spark.operators import pii

    rows = [
        (0, "write to alice.smith+spam@sub.example.co.uk today"),
        (1, "server 192.168.0.1 then 10.0.0.255, done"),
        (2, "call +44-20-7946-0958 or +1-555-1234 now"),
        (3, "no pii here at all"),
        (4, "bob@x.io met 8.8.8.8 at +1-555-0000"),
        (5, "not-an-ip 1234.5.6.7 and half@domain stays"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in pii.pii_redact(df).collect()}


def test_email_greedy_tld(out_rows):
    r = out_rows[0]
    assert (r.n_email, r.n_ip, r.n_phone) == (1, 0, 0)
    assert r.redacted == "write to <EMAIL> today"


def test_ipv4_word_boundaries(out_rows):
    r = out_rows[1]
    assert (r.n_email, r.n_ip, r.n_phone) == (0, 2, 0)
    assert r.redacted == "server <IP> then <IP>, done"


def test_phone_optional_fourth_group(out_rows):
    r = out_rows[2]
    assert r.n_phone == 2
    assert r.redacted == "call <PHONE> or <PHONE> now"


def test_no_pii_passthrough(out_rows):
    r = out_rows[3]
    assert r.n_pii == 0
    assert r.redacted == "no pii here at all"


def test_all_three_classes(out_rows):
    r = out_rows[4]
    assert (r.n_email, r.n_ip, r.n_phone, r.n_pii) == (1, 1, 1, 3)
    assert r.redacted == "<EMAIL> met <IP> at <PHONE>"


def test_four_digit_octet_not_an_ip(out_rows):
    # \b makes 1234.5.6.7 unmatchable as a dotted quad from its start,
    # and no later suffix forms one either; half@domain lacks a TLD dot.
    r = out_rows[5]
    assert (r.n_email, r.n_ip, r.n_phone) == (0, 0, 0)
    assert r.redacted == "not-an-ip 1234.5.6.7 and half@domain stays"


def test_placeholders_never_cascade():
    """Placeholder tokens contain no '@', '+' or digits, so an earlier
    replacement can never create a later match."""
    from websearchengine_spark.operators import pii

    for _, token in pii.PII_RULES:
        assert not any(c.isdigit() or c in "@+" for c in token)
