"""PII detection / redaction for training-data pipelines (engine extension).

Not present in the reference (the collector's `redaction` processor —
processor/README listing in SURVEY §2 — masks attribute VALUES by key
allowlist; this is the corpus-side analogue over free text).  Standard
pre-training scrub (Dolma / BigScience ROOTS style): regex families for
emails, IPv4 addresses, SSN-shaped ids and US phone numbers, each replaced
with a typed sentinel so token counts stay stable and the redaction is
auditable.

Everything is chained ``regexp_replace`` / ``regexp_count`` — pure codegen,
zero UDFs, zero shuffles: at 100 TB this is a map-only projection that
rides the scan.  The patterns are RE2-compatible (no backrefs, no
lookaround) so the DuckDB oracle runs the IDENTICAL pattern strings.

Order matters and is part of the contract: emails first (their local part
can contain digits and dots that would otherwise half-match the numeric
families), then SSN before phone (both are digit-dash shapes), then IPv4
last (after emails are gone, dotted quads are unambiguous).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# (kind, pattern, replacement) — applied strictly in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts on the RAW text (before any replacement).

    Counts are independent per family — a token that matches two families
    (impossible by construction for these four, but true for extensions)
    counts in both; ``redact_pii`` resolves overlap by its fixed order.
    """
    return {
        kind: F.regexp_count(text, F.lit(pat)) for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its typed sentinel, in contract order.

    ``kinds`` restricts to a subset of families (still applied in the
    canonical order, so a subset never changes relative semantics).
    """
    out = text
    for kind, pat, repl in PII_PATTERNS:
        if kinds is None or kind in kinds:
            out = F.regexp_replace(out, pat, repl)
    return out
