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


def test_normalize_text(spark):
    from pyspark.sql import functions as F

    from py_mongo_sync_spark.functions.text import normalize_text

    rows = [
        ("<p>Hello   <b>World</b></p>\t\n ok", "hello world ok"),
        ("  Already clean  ", "already clean"),
        ("a<br/>b", "a b"),
        ("MiXeD\x01CaSe\x1f!", "mixed case !"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r[0] for r in df.select(normalize_text(F.col("text"))).collect()]
    assert got == [w for _, w in rows]
    # strip_html=False keeps markup but still canonicalizes whitespace/case
    raw = df.select(normalize_text(F.col("text"), strip_html=False)).collect()
    assert raw[0][0] == "<p>hello <b>world</b></p> ok"


def test_hash_split_deterministic_and_corpus_independent(spark):
    import hashlib

    from pyspark.sql import functions as F

    from py_mongo_sync_spark.functions.text import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = df.select("doc_id", hash_split(F.col("doc_id")).alias("split"))
    got = {r["doc_id"]: r["split"] for r in out.collect()}

    def expect(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 90 else ("val" if b < 95 else "test")

    assert got == {i: expect(i) for i in range(2000)}
    # assignment is per-row: a subset of the corpus splits identically
    sub = df.where("doc_id % 7 = 0").select(
        "doc_id", hash_split(F.col("doc_id")).alias("split")
    )
    assert {r["doc_id"]: r["split"] for r in sub.collect()} == {
        i: got[i] for i in range(0, 2000, 7)
    }
    # rough proportions at n=2000 (md5 is uniform; wide tolerance)
    from collections import Counter

    c = Counter(got.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert c["train"] + c["val"] + c["test"] == 2000
    # custom split points
    half = df.select(hash_split(F.col("doc_id"), 50, 25).alias("s"))
    ch = Counter(r["s"] for r in half.collect())
    assert 0.45 < ch["train"] / 2000 < 0.55
    assert 0.2 < ch["val"] / 2000 < 0.3


def test_canonicalize_url(spark):
    from pyspark.sql import functions as F

    from py_mongo_sync_spark.functions.text import canonicalize_url

    rows = [
        # host case + www + default port + tracking params + fragment
        ("HTTPS://WWW.Example.COM:443/Page/3?utm_source=x&utm_medium=y#frag",
         "https://example.com/Page/3"),
        # trailing slash + single tracking param leaves an empty query
        ("https://example.com/page/3/?ref=tw", "https://example.com/page/3"),
        # tracking param sandwiched between real params
        ("http://a.com/p?a=1&ref=2&b=3", "http://a.com/p?a=1&b=3"),
        # 'referrer' is not 'ref' — kept; non-default port kept
        ("http://a.com:8080/p?referrer=x", "http://a.com:8080/p?referrer=x"),
        # path case preserved; root slash stripped
        ("https://A.com/", "https://a.com"),
        # no scheme: pass through trimmed, untouched
        ("  not a url at all  ", "not a url at all"),
        # adjacent tracking params collapse cleanly
        ("https://b.io/x?utm_a=1&utm_b=2&q=ok", "https://b.io/x?q=ok"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [w for _, w in rows]


def test_boilerplate_profile_cross_doc(spark):
    from py_mongo_sync_spark.functions.text import boilerplate_profile

    tpl = "this reply was generated by the support desk bot system"  # 10 words
    docs = spark.createDataFrame(
        [
            (1, tpl + " unique tail alpha beta gamma delta epsilon zeta eta theta"),
            (2, tpl + " other words entirely here that no one else repeats at all"),
            (3, "wholly original content with ten or more words and no shared runs"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           boilerplate_profile(docs, n=10, min_docs=2).collect()}
    # docs 1 and 2 share exactly the template gram; their unique grams differ
    assert out[1]["n_boilerplate"] == 1 and out[2]["n_boilerplate"] == 1
    assert 0 < out[1]["boilerplate_frac"] < 1
    assert out[3]["n_boilerplate"] == 0 and out[3]["boilerplate_frac"] == 0.0
    # < n words: no grams, zero row survives the left join
    assert out[4]["n_grams"] == 0 and out[4]["boilerplate_frac"] == 0.0
    # at min_docs=3 the pairwise-shared template no longer counts
    out3 = {r["doc_id"]: r for r in
            boilerplate_profile(docs, n=10, min_docs=3).collect()}
    assert out3[1]["n_boilerplate"] == 0
