"""PII redaction for web-text training corpora.

A standard pre-training scrub pass: emails, IPv4 addresses, and phone-like
number runs are replaced with typed placeholder tokens so models don't
memorize contact details. Pure ``regexp_replace`` Column expressions —
JVM-side, whole-stage-codegen friendly, no Python on the hot path — and the
patterns avoid lookarounds/backreferences so an RE2-based engine (the
DuckDB correctness oracle) applies them identically.

Order matters and is fixed: emails first (an email contains digit runs a
phone pattern could eat), then IPv4 (dotted digit runs), then phones.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pattern, replacement — applied in order
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # international-ish phone: leading digit or +, then ≥7 phone chars,
    # ending in a digit (won't eat years or small ids)
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails / IPv4 / phone-like runs with placeholder tokens."""
    out = col
    for pat, rep in PII_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_rules_sql(expr: str) -> str:
    """The same redaction as a nested DuckDB ``regexp_replace`` expression
    (global flag), for SQL oracles — single definition of the rule chain."""
    out = expr
    for pat, rep in PII_RULES:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{rep}', 'g')"
    return out
