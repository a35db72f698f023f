"""PII scanning and redaction for training corpora.

Regex-only, JVM-side (``regexp_count`` / ``regexp_replace`` are codegen'd
string expressions): a narrow projection over the scan with zero shuffles
and zero Python — the only shape that survives scrubbing 100 TB of text.
The reference's closest construct is ``Stream.map`` with an opaque
callable (/root/reference/streamable/stream.py:372-392); a per-row Python
regex pass would be ~100x slower here.

Patterns are deliberately restricted to syntax RE2 and Java regex agree
on (character classes, bounded repeats, ``\\b``) so the DuckDB oracle can
run the *same* patterns — no lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["PII_PATTERNS", "pii_scan", "redact", "kanon_risk"]

#: pattern name -> (regex, replacement token), applied in this order.
#: Emails first (their local part may contain digit runs), then IPv4
#: (dots break long-digit runs), then bare 13-16 digit ids (card/account
#: shaped). All three parse identically under Java regex and RE2.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\b\d{13,16}\b", "<ID>"),
)


def redact(text: Column) -> Column:
    """Replace every PII match with its placeholder token (all patterns,
    in declaration order)."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scan(text: Column) -> dict[str, Column]:
    """Per-pattern match counts plus the fully-redacted text.

    Returns ``{"n_<name>": Column, ..., "redacted": Column}`` — callers
    select what they need; everything is a single-pass string expression.
    """
    cols: dict[str, Column] = {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }
    cols["redacted"] = redact(text)
    return cols


def kanon_risk(df, quasi_cols, k: int = 5):
    """k-anonymity audit over quasi-identifier columns: every equivalence
    class (distinct quasi-identifier combination) with fewer than ``k``
    members, plus its size — rows in these classes are re-identifiable by
    joining the quasi-identifiers against an external dataset, the
    standard release-readiness check (Sweeney 2002) run before publishing
    a corpus or its metadata. Returns (quasi_cols..., class_n) for
    classes with ``class_n < k``; an empty result certifies k-anonymity.

    One keyed groupBy with map-side combine over the quasi-identifier
    tuple — the class table is bounded by the quasi-identifier domain,
    not the corpus, and nothing else shuffles. Generalize-and-repeat
    (bucket a column coarser, re-run) is the standard remediation loop;
    the operator is cheap enough to sit inside it."""
    qc = list(quasi_cols)
    return (
        df.groupBy(*qc)
        .agg(F.count(F.lit(1)).cast("long").alias("class_n"))
        .where(F.col("class_n") < k)
    )
