"""Text-analysis operators for training-data curation — language ID,
quality scoring, token counting, fingerprinting. All JVM column
expressions (codegen'd); nothing per-row."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "a"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
    "es": ["el", "de", "y", "los", "las", "en", "una"],
    "de": ["der", "und", "die", "das", "ein", "zu", "mit"],
}


def token_count(text: Column) -> Column:
    """Whitespace tokenization count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish sub-token estimate: words + digit runs + punctuation marks,
    via one regex split (the cheap proxy for tokenizer-budget accounting)."""
    return F.size(F.split(text, r"(?=[\.,!\?;:\s])|(?<=[\.,!\?;:\s])")) - F.size(
        F.split(text, r"\s+")
    ) + token_count(text)


def bpe_token_estimate(text: Column) -> Column:
    """Sub-token estimate without regex lookarounds (RE2-compatible, so a
    DuckDB oracle can replicate it exactly): whitespace tokens + one extra
    token per punctuation mark."""
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[\.,!\?;:]", ""))
    return token_count(text) + punct


def punct_ratio(text: Column) -> Column:
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[\.,!\?;:'\"]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def stopword_hits(text: Column, lang: str) -> Column:
    words = F.split(F.lower(text), r"\s+")
    return F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in _STOPWORDS[lang]])))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_hits(text, lang) / F.greatest(token_count(text), F.lit(1))


def lang_id_heuristic(text: Column) -> Column:
    """N-gram/stopword language ID: CJK codepoints dominate → zh; otherwise
    argmax of per-language stopword hits, 'en' on ties/zero (heuristic, not
    a model — deterministic and shuffle-free)."""
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    scores = {lang: stopword_hits(text, lang) for lang in _STOPWORDS}
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ("fr", "es", "de"):
        best = F.when(scores[lang] > best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, scores[lang])
    return F.when(cjk > 0, F.lit("zh")).otherwise(best)


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + punctuation sanity +
    stopword presence (the classic cheap pre-filter before model scoring)."""
    n = token_count(text)
    len_ok = F.when((n >= 5) & (n <= 5000), 1.0).otherwise(0.3)
    punct_ok = F.when(punct_ratio(text) < 0.2, 1.0).otherwise(0.5)
    stop_ok = F.when(stopword_ratio(text) > 0.02, 1.0).otherwise(0.6)
    return F.round((len_ok + punct_ok + stop_ok) / 3.0, 4)


def rolling_fingerprint(text: Column, window: int = 16) -> Column:
    """Document fingerprint: min of rolling-window substring hashes
    (winnowing-style) — robust to small appends, all JVM-side."""
    c = F.lower(text)
    n = F.greatest(F.length(c) - (window - 1), F.lit(1))
    return F.array_min(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.xxhash64(c.substr(i, F.lit(window))))
    )


#: PII patterns kept to regex constructs shared by Java and RE2-style
#: engines (character classes, bounded repetition — no lookaround), so a
#: SQL oracle applies the IDENTICAL patterns. Order matters: emails are
#: redacted before phone numbers so a phone-looking local-part can't be
#: half-eaten first.
PII_PATTERNS = [
    ("[EMAIL]", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("[IP]", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("[PHONE]", r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{4}"),
    ("[SSN]", r"\b\d{3}-\d{2}-\d{4}\b"),
]


def redact_pii(text: Column) -> Column:
    """Scrub emails / IPv4s / phone numbers / SSN-shaped ids to typed
    placeholder tokens — the standard pre-training hygiene pass. Pure
    chained ``regexp_replace`` (JVM-side, whole-stage codegen, no UDF);
    deterministic, so redaction is reproducible and oracle-checkable."""
    out = text
    for token, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_hit_counts(text: Column) -> Column:
    """Map of pattern-name → occurrences (redaction telemetry: how much
    PII a corpus slice carried, without storing any of it)."""
    return F.map_from_arrays(
        F.array(*[F.lit(t) for t, _ in PII_PATTERNS]),
        F.array(*[
            F.size(F.regexp_extract_all(text, F.lit(p), F.lit(0)))
            for _, p in PII_PATTERNS
        ]),
    )


def normalize_text(text: Column, strip_html: bool = True) -> Column:
    """Canonicalize raw scraped text before dedup/quality scoring: strip
    HTML-ish tags, drop ASCII control characters, collapse runs of
    whitespace to single spaces, trim, lowercase. Pure chained JVM
    ``regexp_replace`` + ``lower`` (whole-stage codegen, no UDF), and the
    patterns are Java∩RE2-safe so a SQL oracle applies them verbatim.
    Normalizing BEFORE shingling is what makes near-dup detection robust
    to markup/whitespace-only differences between crawls of one page."""
    out = text
    if strip_html:
        out = F.regexp_replace(out, r"<[^>]*>", " ")
    out = F.regexp_replace(out, r"[\x00-\x1f]", " ")
    out = F.regexp_replace(out, r"  +", " ")
    return F.lower(F.trim(out))


def hash_split(
    id_col: Column, train_pct: int = 90, val_pct: int = 5
) -> Column:
    """'train' / 'val' / 'test' label from md5_32(id) % 100 — the
    deterministic holdout split: a document's assignment never depends on
    the rest of the corpus (stable under re-runs, appends, re-shards —
    the property that keeps eval sets uncontaminated as the corpus
    grows), and the expression is a pure per-row filter any engine
    reproduces bit-for-bit (same md5 parity as ``hash_rate_sample``)."""
    from py_mongo_sync_spark.functions.similarity import md5_long

    b = F.pmod(md5_long(id_col.cast("string"), 8), F.lit(100))
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


#: Query parameters that never change page content — analytics/click
#: tracking only. Stripping them is what makes the canonical URL a usable
#: crawl-dedup key (the same article arrives once per ad campaign
#: otherwise). Exact names anchored by the '=' that follows, so e.g.
#: 'referrer=' is NOT matched by 'ref'.
_TRACKING_PARAMS = r"utm_[A-Za-z0-9_]*|fbclid|gclid|igshid|ref|mc_cid|mc_eid"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for crawl-level dedup — the key under which
    two fetches of the same page collapse: lowercase scheme and host,
    strip a leading ``www.`` and explicit default ports (:80/:443), drop
    the fragment, remove tracking query params (see ``_TRACKING_PARAMS``),
    repair the separators their removal leaves behind, and strip one
    trailing slash. Path and non-tracking query values keep their case
    (paths are case-sensitive). Strings without a ``scheme://`` prefix
    pass through trimmed and unchanged.

    Pure chained JVM ``regexp_extract``/``regexp_replace`` (whole-stage
    codegen, zero shuffle — a per-row key like ``hash_split``); patterns
    are Java∩RE2 constructs so a SQL oracle reproduces the string
    bit-for-bit (Java spells the backreference ``$1``, RE2 ``\\1`` —
    replacement syntax differs, the semantics are identical)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":(80|443)$", ""
    )
    rest = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    rest = F.regexp_replace(
        rest, r"([?&])(" + _TRACKING_PARAMS + r")=[^&#]*", "$1"
    )
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Intra-document repetition: 1 - distinct/total word n-grams — the
    cheap degenerate-text detector (boilerplate, keyboard mash, model
    loops score high; healthy prose near 0). Whole-JVM array expressions;
    single-n-gram docs score 0 by definition."""
    words = F.split(F.trim(text), r" ")
    m = F.greatest(F.size(words) - (n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams).cast("double"),
        4,
    )


def boilerplate_profile(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    min_docs: int = 3,
):
    """Cross-document boilerplate profile — the corpus-level sibling of
    ``repetition_ratio`` (which is within-doc): a sliding word n-gram is
    BOILERPLATE when it occurs in >= ``min_docs`` DISTINCT documents
    (headers, footers, licence blocks, templated replies — the C4-style
    "repeated line" rule generalized to unstructured text). Returns one
    row per doc: (doc_id, n_grams, n_boilerplate, boilerplate_frac);
    callers gate on the fraction.

    Spark-first cost: explode to (doc, gram-hash) ONCE — grams travel as
    md5-derived 60-bit longs, not strings, so the two aggregations
    shuffle fixed-width keys; doc counts per gram come from a distinct +
    groupBy (exact, no count-distinct state); everything else is one join
    back on the hash. Linear in corpus tokens, no pair space. At 10^10
    docs the gram-doc-count table is itself large but partial-aggregates
    map-side; a count-min sketch would trade exactness for one pass —
    not taken here, exactness keeps the oracle."""
    from py_mongo_sync_spark.operators.sampling import md5_long

    ws = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # persisted: the doc-count aggregate AND the join back both consume the
    # exploded gram rows; unpinned, the gram explode + md5 ran twice (the
    # exprId/ReuseExchange trap documented in operators/neardup.py::_pin)
    dg = (
        df.select(F.col(id_col).alias("_id"), F.explode(grams).alias("_g"))
        .select("_id", md5_long(F.col("_g"), 15).alias("_h"))
        .distinct()
        .persist()
    )
    counts = dg.groupBy("_h").agg(F.count(F.lit(1)).alias("_ndocs"))
    per_doc = (
        dg.join(counts, "_h")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_ndocs") >= min_docs).cast("long"))
            .alias("n_boilerplate"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, F.col("doc_id") == per_doc["_id"], "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_boilerplate", F.lit(0)).alias("n_boilerplate"),
            # frac in BASIS POINTS via pure bigint division — exact on any
            # engine. The double sibling below is the ergonomic gate value;
            # hash-compared outputs should use frac_bp (cross-engine float
            # round ties / int-vs-float dtype drift can't touch a bigint).
            F.expr(
                "CAST(coalesce(n_boilerplate, 0) * 10000 AS BIGINT) DIV "
                "CAST(greatest(coalesce(n_grams, 0), 1) AS BIGINT)"
            ).alias("frac_bp"),
            F.round(
                F.coalesce("n_boilerplate", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)),
                4,
            ).alias("boilerplate_frac"),
        )
    )


def remove_boilerplate_lines(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = ". ",
    min_docs: int = 4,
    min_chars: int = 20,
):
    """APPLY the C4 repeated-line rule (``boilerplate_profile`` detects,
    this removes): split each doc into sentence-ish lines on ``sep``, drop
    every line of >= ``min_chars`` chars that occurs in >= ``min_docs``
    DISTINCT documents (headers, footers, licence blocks, templated
    boilerplate), and reassemble the survivors in original order. Short
    lines are exempt — common short sentences are language, not template.
    Returns one row per doc: (doc_id, text_clean, n_lines, n_removed);
    a fully-boilerplate doc comes back as the empty string (callers drop
    on ``n_lines = n_removed``).

    Spark-first cost profile mirrors ``boilerplate_profile``: one
    posexplode, one exact distinct+groupBy doc count per line, one join
    back, one per-doc ordered reassembly (``array_sort`` of (pos, line)
    structs inside the collected array — no global sort). Linear in
    corpus lines; reassembly is lossless because the split separator is a
    fixed string re-inserted verbatim."""
    import re as _re

    from py_mongo_sync_spark.operators.sampling import md5_long

    # persisted: three consumers below (the doc-frequency count, the
    # anti-join's probe side, and the per-doc line-count aggregate) — see
    # operators/neardup.py::_pin for the re-execution trap
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "_pos", "_l"
        ),
    ).persist()
    # the df count and the anti-join key on md5_long(_l) — a fixed-width
    # 60-bit long — instead of the raw line string, mirroring
    # boilerplate_profile's gram-hash design: at corpus scale the shuffle
    # carries 8-byte keys, not line-width text. The line STRING never
    # shuffles for the count; it only rides the per-doc reassembly, whose
    # key is the doc id.
    lh = md5_long(F.col("_l"), 15)
    counts = (
        lines.where(F.length("_l") >= min_chars)
        .select("_id", lh.alias("_lh"))
        .distinct()
        .groupBy("_lh")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
        .where(F.col("_ndocs") >= min_docs)
        .select("_lh")
    )
    kept = lines.withColumn("_lh", lh).join(counts, "_lh", "left_anti").drop("_lh")
    agg = (
        lines.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .join(
            kept.groupBy("_id").agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("_pos", "_l"))),
                        lambda s: s["_l"],
                    ),
                    sep,
                ).alias("text_clean"),
                F.count(F.lit(1)).alias("_nkept"),
            ),
            "_id",
            "left",
        )
    )
    return agg.select(
        F.col("_id").alias("doc_id"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        F.col("n_lines").cast("long").alias("n_lines"),
        (F.col("n_lines") - F.coalesce("_nkept", F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )
