"""PII redaction over a text column — emails, IPv4 literals, phone-shaped
digit runs rewritten to typed placeholder tokens.

The standard pre-training scrub step (C4 and friends strip emails/IPs
before training).  Scale shape: a pure per-row ``map_batches`` transform
— no shuffle, no state, no driver data; each pattern is one Arrow RE2
kernel over the whole batch (`count_substring_regex` then
`replace_substring_regex`), so the stage is vectorized end-to-end and
streams at read speed.

Patterns are applied IN ORDER (emails first, so phone-shaped digit runs
inside an address never fire) and counts are taken on the text as it
stands before that pattern's rewrite — :func:`redact_pii_sql` builds the
DuckDB twin with the identical op order, and both engines run RE2, so
the outputs agree byte-for-byte (pinned by the driver's
``redact_pii_docs`` query and unit tests).

Replacement tokens must not themselves match a later pattern (all three
defaults are angle-bracket uppercase words — no ``@``, no digit runs).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied in order; keep patterns
# single-quote-free (they are inlined into the SQL twin as '...' literals)
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\b\d[\d\- ]{6,14}\d\b", "<PHONE>"),
]


def redact_pii_batch(batch: pa.Table, *, text_col: str = "text",
                     out_col: str = "text_redacted",
                     count_col: str = "n_redactions",
                     patterns=None) -> pa.Table:
    """Append ``out_col`` (redacted text) and ``count_col`` (total matches
    across all patterns, counted in application order) to the batch."""
    pats = PII_PATTERNS if patterns is None else patterns
    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    total = None
    for _name, pat, repl in pats:
        n = pc.count_substring_regex(arr, pat)
        total = n if total is None else pc.add(total, n)
        arr = pc.replace_substring_regex(arr, pat, repl)
    out = batch.append_column(out_col, arr)
    return out.append_column(count_col, pc.cast(total, pa.int64()))


def redact_pii(ds, *, text_col: str = "text",
               out_col: str = "text_redacted",
               count_col: str = "n_redactions", patterns=None):
    """Dataset form: streaming stateless ``map_batches`` (pyarrow)."""
    return ds.map_batches(
        redact_pii_batch, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "out_col": out_col,
                   "count_col": count_col, "patterns": patterns})


def redact_pii_expr(text_expr: str, patterns=None) -> "tuple[str, str]":
    """(redacted_expr, count_expr) DuckDB SQL fragments applying the same
    patterns in the same order to ``text_expr`` — DuckDB's regex engine
    is RE2, like Arrow's, so semantics match exactly."""
    pats = PII_PATTERNS if patterns is None else patterns
    expr = text_expr
    counts = []
    for _name, pat, repl in pats:
        assert "'" not in pat and "'" not in repl, "quote-free patterns only"
        counts.append(f"len(regexp_extract_all({expr}, '{pat}'))")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr, "CAST(" + " + ".join(counts) + " AS BIGINT)"


def redact_pii_sql(table: str, *, id_col: str = "doc_id",
                   text_col: str = "text", patterns=None) -> str:
    """DuckDB twin of :func:`redact_pii` projected to
    ``(id_col, text_redacted, n_redactions)``."""
    expr, cnt = redact_pii_expr(text_col, patterns)
    return (f"SELECT {id_col}, {expr} AS text_redacted, "
            f"{cnt} AS n_redactions FROM {table}")
