"""PII redaction: rewrite text with sensitive spans masked.

The redacting counterpart of the ``pii_scrub_stats`` audit query — where
that query only *counts* what a scrub pass would touch, :func:`scrub_pii`
emits the scrubbed text itself, the transform an LLM training pipeline
actually ships. Replaces the reference pipeline's row-by-row pandas
string cleanup with a chain of JVM-side ``regexp_replace`` expressions:
map-side, no UDF, no shuffle — at 100 TB the scrub runs at scan speed
inside whole-stage codegen.

The pattern list is shared with :func:`scrub_pii_sql` (the DuckDB oracle
form) so the Spark plan and the oracle can never drift: both chains apply
the same patterns in the same order, which makes the output deterministic
even where patterns overlap (an email containing a long digit run is
masked by the email rule first on both engines).

Patterns are deliberately RE2-compatible (no lookaround, no
backreferences): they run unchanged under Java regex (Spark), RE2
(DuckDB), and Hyperscan-style scanners a production scrubber might use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement token) in application order. Order matters and is
#: part of the contract: SSN/IP run before the bare long-digit rule so a
#: dashed or dotted number is labeled by its specific type, not eaten as
#: ``<NUM>``.
DEFAULT_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\d{9,}", "<NUM>"),
)


def _check_tokens(patterns: tuple[tuple[str, str], ...]) -> None:
    """Reject replacement tokens Spark and DuckDB would interpret
    differently: ``$`` is a Java group reference and ``\\`` an escape in
    Spark's regexp_replace, but literal in DuckDB — a chain containing one
    would silently break the engines-agree contract (or throw executor-side
    on a dangling group reference)."""
    for _, token in patterns:
        if "$" in token or "\\" in token:
            raise ValueError(
                f"replacement token {token!r} contains $ or backslash, which "
                f"Spark (Java replaceAll) and DuckDB interpret differently"
            )


def scrub_expr(
    col: Column | str, patterns: tuple[tuple[str, str], ...] = DEFAULT_PII_PATTERNS
) -> Column:
    """The redacted-text expression: ``regexp_replace`` chain over ``col``.

    NULL text stays NULL (the transform never invents content)."""
    _check_tokens(patterns)
    expr = F.col(col) if isinstance(col, str) else col
    for pattern, token in patterns:
        expr = F.regexp_replace(expr, pattern, token)
    return expr


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: tuple[tuple[str, str], ...] = DEFAULT_PII_PATTERNS,
) -> DataFrame:
    """Return ``df`` with ``text_col`` redacted (in place by default, or
    into ``out_col`` to keep the original alongside for audit diffs)."""
    target = out_col or text_col
    return df.withColumn(target, scrub_expr(text_col, patterns))


def scrub_pii_sql(
    expr: str, patterns: tuple[tuple[str, str], ...] = DEFAULT_PII_PATTERNS
) -> str:
    """DuckDB SQL form of the same chain, for oracle queries. Single quotes
    in patterns are not supported (none of the defaults contain any), and
    replacement tokens may not contain ``$`` or ``\\``: Spark's
    regexp_replace treats those as Java group references / escapes while
    DuckDB inserts them literally, which would silently break the
    engines-agree contract this module exists to guarantee."""
    _check_tokens(patterns)
    out = expr
    for pattern, token in patterns:
        if "'" in pattern or "'" in token:
            # interpolated unquoted-safe only; a quote would emit broken
            # (or crafted) SQL whose error surfaces far from the cause
            raise ValueError(f"single quotes not supported in patterns: {pattern!r} -> {token!r}")
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out
