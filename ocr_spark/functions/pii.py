"""PII detection / redaction expressions — the scrubbing pass every
training-data pipeline runs before a corpus ships (emails, IPv4 addresses,
long account-ish digit runs → typed placeholder tokens).

Pure Catalyst: ``regexp_count`` + chained ``regexp_replace`` — JVM-side,
whole-stage-codegen'd, one narrow projection, no shuffle, linear in bytes.
The patterns are deliberately restricted to the regex subset on which
Java's engine (Spark) and RE2 (DuckDB) agree byte-for-byte — character
classes, bounded/unbounded counted repetition, ``\\b`` ASCII word
boundaries; no lookaround, no backreferences — so every query built on
these has an exact DuckDB oracle twin (DuckDB side must pass the ``'g'``
flag: Java replaces all matches by default, RE2 only the first).

Scrub order is load-bearing: emails first (they contain dots and digit
runs), then IPv4 (dotted digit runs), then bare long digit runs — each
later pattern sees the earlier placeholders, never the raw text they
replaced.  Counts are computed on the ORIGINAL text, before any
replacement, in both engines.

The reference has no PII surface (it OCRs public court documents); this is
"beyond the reference" training-data-pipeline scope (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java/RE2-agreeing patterns (see module docstring).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
LONGNUM_RE = r"\b[0-9]{7,}\b"

# (pattern, placeholder) in scrub order.
PII_RULES: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (LONGNUM_RE, "<NUM>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts on the raw text:
    ``{"n_emails": ..., "n_ips": ..., "n_longnums": ...}``."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(text, F.lit(IPV4_RE)),
        "n_longnums": F.regexp_count(text, F.lit(LONGNUM_RE)),
    }


def scrub_pii(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder, applied
    in PII_RULES order."""
    out = text
    for pattern, placeholder in PII_RULES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out
