"""PII redaction: typed placeholders, ordering (email before phone), and hit-count telemetry."""

from __future__ import annotations


def test_redact_pii_and_counts(spark):
    from pyspark.sql import functions as F

    from py_mongo_sync_spark.functions.text import pii_hit_counts, redact_pii

    rows = [
        ("write to alice.smith+x@sub.example.org today",
         "write to [EMAIL] today"),
        ("server 192.168.001.1 and 8.8.8.8 up", "server [IP] and [IP] up"),
        ("call +44-555-1234-5678 or 555 123 4567", "call [PHONE] or 555 123 4567"),
        ("ssn 123-45-6789.", "ssn [SSN]."),
        ("no pii here at all", "no pii here at all"),
        # email whose local part looks phone-ish: email pattern wins (order)
        ("reach 555-123-4567@mail.com now", "reach [EMAIL] now"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r[0] for r in df.select(redact_pii(F.col("text"))).collect()]
    assert got == [w for _, w in rows]
    counts = df.select(pii_hit_counts(F.col("text")).alias("c")).collect()
    assert dict(counts[1]["c"])["[IP]"] == 2
    assert dict(counts[4]["c"]) == {"[EMAIL]": 0, "[IP]": 0, "[PHONE]": 0, "[SSN]": 0}


def test_repetition_ratio(spark):
    from pyspark.sql import functions as F

    from py_mongo_sync_spark.functions.text import repetition_ratio

    rows = [
        ("a b c d e f g h",),              # all 3-grams distinct → 0
        ("spam spam spam spam spam spam",),  # one distinct 3-gram
        ("xy",),                            # single word → 0 by definition
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r[0] for r in df.select(repetition_ratio(F.col("text"), 3)).collect()]
    assert got[0] == 0.0
    assert got[1] == 0.75     # 4 grams, 1 distinct → 1 - 1/4
    assert got[2] == 0.0
