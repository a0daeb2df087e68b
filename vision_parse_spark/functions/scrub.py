"""PII scrubbing for training-data pipelines — narrow Catalyst
regexp_replace chains (JVM-side, codegen; no UDF).

Redacts the machine-recognizable PII classes a pretraining pipeline
must not leak: email addresses, IPv4 addresses, long digit runs
(phone/card shaped), and bearer-token-shaped secrets.  Patterns stick
to constructs with IDENTICAL semantics in Java regex (Spark) and RE2
(DuckDB/others): character classes, bounded repetition, \\b word
boundaries — no lookarounds, no backreferences — so the transform is
replayable anywhere.

Order matters: emails before digit runs (an email's local part may
contain digits), tokens before generic digits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) in application order
PII_RULES: list[tuple[str, str]] = [
    # email
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # bearer/API-token shaped: 24+ chars of base64-ish after a key hint
    (r"\b(sk|pk|key|token|bearer)[-_][A-Za-z0-9_\-]{16,}\b", "<TOKEN>"),
    # IPv4
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # phone/card-shaped digit runs (7+ digits, optional separators);
    # \b sits between the optional '+' and the first digit — a \b
    # BEFORE '+' never matches (space and '+' are both non-word)
    (r"\+?\b[0-9][0-9 ()\-]{5,}[0-9]\b", "<NUMBER>"),
]


def scrub_col(col: Column | str) -> Column:
    """Apply the PII rule chain to a string column."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, repl in PII_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Scrubbed copy of ``text_col`` (in place by default).  Narrow:
    the whole chain fuses into one codegen'd Project."""
    return df.withColumn(out_col or text_col, scrub_col(text_col))
