"""PII detection / redaction — beyond-reference curation op.

Training-data pipelines scrub emails, IP addresses, and phone numbers before
release. The reference has no PII stage; this is pure Catalyst regex
(JVM-side, whole-stage codegen — no Python in the hot path), so it rides the
scan like the other curation gates (extras/curate.py).

Patterns are deliberately RE2-compatible (no backreferences/lookaround) so
the DuckDB oracle can run the identical expressions. Replacement order is
fixed (email -> IPv4 -> phone) and each count is taken on the text as it
stood BEFORE that pattern's own replacement — sequential semantics both
sides reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def _count(c: Column, pattern: str) -> Column:
    return F.regexp_count(c, F.lit(pattern)).cast("long")


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted_text"
) -> DataFrame:
    """Add n_emails / n_ips / n_phones counts and a redacted text column.

    Emails -> <EMAIL>, dotted-quad IPv4 -> <IP>, NNN-NNN-NNNN phones ->
    <PHONE>. Counts are long; detection-only callers can drop out_col.
    """
    c = F.col(text_col)
    n_emails = _count(c, EMAIL_RE)
    after_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    n_ips = _count(after_email, IPV4_RE)
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    n_phones = _count(after_ip, PHONE_RE)
    redacted = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", n_emails)
        .withColumn("n_ips", n_ips)
        .withColumn("n_phones", n_phones)
        .withColumn(out_col, redacted)
    )


def has_pii(df: DataFrame, text_col: str = "text", flag_col: str = "has_pii") -> DataFrame:
    """Boolean gate for filter-only pipelines (no rewrite of the text)."""
    c = F.col(text_col)
    return df.withColumn(
        flag_col,
        c.rlike(EMAIL_RE) | c.rlike(IPV4_RE) | c.rlike(PHONE_RE),
    )
