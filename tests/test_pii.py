"""PII detection + redaction semantics."""

import pytest

from jsonschema_spark.operators import pii

pytestmark = pytest.mark.usefixtures("spark")


ROWS = [
    (1, "mail me at jane.doe+spam@sub.example.co.uk thanks"),
    (2, "server at 192.168.1.254 and also 10.0.0.1 replied"),
    (3, "call +49 30 901820 or +1 555-0100 now"),
    (4, "account 12345678901 card 4111111111111111"),
    (5, "clean text with short 123 and 1.2 numbers"),
    (6, "a@b.io x"),
    (7, ""),
]


@pytest.fixture(scope="module")
def report(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return {r["doc_id"]: r for r in pii.pii_report(df).collect()}


def test_counts(report):
    assert report[1]["emails"] == 1
    assert report[2]["ipv4s"] == 2
    assert report[3]["phones"] == 2
    assert report[4]["digit_runs"] == 2
    assert report[5]["pii_total"] == 0
    assert report[6]["emails"] == 1
    assert report[7]["pii_total"] == 0


def test_redaction_replaces_all_spans(report):
    assert report[1]["redacted"] == "mail me at <EMAIL> thanks"
    assert report[2]["redacted"] == "server at <IP> and also <IP> replied"
    assert report[3]["redacted"] == "call <PHONE> or <PHONE> now"
    assert report[4]["redacted"] == "account <NUM> card <NUM>"
    assert report[5]["redacted"] == ROWS[4][1]  # untouched


def test_scrub_preserves_schema(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    out = pii.scrub(df)
    assert out.columns == df.columns
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[1] == "mail me at <EMAIL> thanks"


def test_short_numbers_not_flagged(report):
    # 8 digits is below the digit-run floor; bare decimals are not IPs
    assert report[5]["digit_runs"] == 0
    assert report[5]["ipv4s"] == 0
