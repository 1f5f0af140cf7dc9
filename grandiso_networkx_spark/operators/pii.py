"""PII detection and redaction over a document corpus — a standard
pre-training curation pass (emails, IPv4 addresses, phone-like
numbers) the reference has no analogue for (it is a motif matcher;
see SURVEY.md §2.7 for why these ops are in scope).

Everything is JVM-side ``regexp_count`` / ``regexp_replace`` over the
text column — no Python in the hot path, so the scan pipelines into
whole-stage codegen and the pass is embarrassingly parallel (no
shuffle at all for the per-document signals).  At 100 TB this is a
pure map over the parquet scan with column pruning down to
``(doc_id, text)``.

The patterns deliberately use the conservative common subset of the
Java (Spark) and RE2-ish (DuckDB) regex dialects — character classes,
bounded repetition, alternation; no backreferences or lookaround — so
the driver's DuckDB oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Conservative, dialect-portable patterns.  Word-ish boundaries are
# approximated with explicit character classes instead of \b (identical
# semantics in Java and RE2 for these shapes).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,6}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_RE = r"\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"

PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "ipv4": IPV4_RE,
    "phone": PHONE_RE,
}


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts ``(doc_id, n_email, n_ipv4,
    n_phone, has_pii)``.

    One codegen'd projection over the scan — zero shuffles; the
    aggregate corpus rate is a follow-up ``agg`` the caller composes.
    """
    t = F.col(text_col)
    out = docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phone"),
    )
    return out.withColumn(
        "has_pii",
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone") > 0).cast(
            "int"
        ),
    )


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """Replace every PII span with a typed placeholder token
    (``<EMAIL>`` / ``<IP>`` / ``<PHONE>``), appended as ``out_col``.

    Order matters: emails first (an email body can contain digit runs
    a phone pattern would bite into), then IPs, then phones — the same
    fixed order is used by the SQL oracle.  Still a single
    zero-shuffle projection.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return docs.withColumn(out_col, red)
