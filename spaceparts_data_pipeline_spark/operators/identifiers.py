"""Identifier sanitization (SURVEY.md §1.4).

Re-implements, from the documented semantics, the reference's column/table
name cleaning (bronze_processor.py:108-150; bronze_full_load.ipynb:1
cell 25 `clean_identifier` / `build_column_mapping_from_df`):

- Unicode-normalize (NFKD) and drop combining marks (accent stripping).
- Replace every non-alphanumeric character with ``_``; collapse runs.
- Lowercase; strip leading/trailing underscores.
- Prefix names starting with a digit with ``c_``.
- Suffix SQL reserved words with ``_col`` (source column ``Group`` →
  ``group_col``, observed joined as ``dt.group_col`` in Gold_full_load).
- Resolve collisions by suffixing ``_2``, ``_3``, …
- Cap length (128 for Delta/Parquet engines).

Pure driver-side Python: identifier cleaning happens once per schema, not
per row, so it costs nothing at 100 TB scale. Applied to a DataFrame with
a single ``toDF(*names)`` (one projection node, no shuffle).
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import DataFrame

#: ANSI reserved words the reference guards against. Deliberately does
#: NOT include common business-column words like month/date/year/key:
#: the reference keeps `month` as-is (fact_budget) while renaming
#: `Group` → `group_col` (dim_invoice_doctype) — see FIXTURES.md.
RESERVED_WORDS = {
    "all", "alter", "and", "any", "as", "asc", "between", "by", "case", "cast",
    "check", "column", "constraint", "create", "cross", "default", "delete",
    "desc", "distinct", "drop", "else", "end", "exists", "false", "for",
    "foreign", "from", "full", "grant", "group", "having", "in", "inner",
    "insert", "intersect", "into", "is", "join", "left", "like", "limit",
    "natural", "not", "null", "on", "or", "order", "outer", "primary",
    "references", "right", "select", "set", "table", "then", "to", "true",
    "union", "unique", "update", "user", "using", "values", "view", "when",
    "where", "with",
}

MAX_IDENTIFIER_LENGTH = 128


def clean_identifier(name: str, max_length: int = MAX_IDENTIFIER_LENGTH) -> str:
    """Sanitize a single identifier per the rules above."""
    # Accent stripping: NFKD then drop combining marks.
    normalized = unicodedata.normalize("NFKD", name)
    stripped = "".join(ch for ch in normalized if not unicodedata.combining(ch))
    # Forbidden chars → underscore, collapse runs, trim, lowercase.
    cleaned = re.sub(r"[^0-9a-zA-Z]+", "_", stripped).strip("_").lower()
    if not cleaned:
        cleaned = "col"
    if cleaned[0].isdigit():
        cleaned = f"c_{cleaned}"
    if cleaned in RESERVED_WORDS:
        cleaned = f"{cleaned}_col"
    return cleaned[:max_length]


def build_column_mapping(names: list[str], max_length: int = MAX_IDENTIFIER_LENGTH) -> dict[str, str]:
    """Map original → cleaned names, resolving collisions with _2, _3, …"""
    mapping: dict[str, str] = {}
    used: set[str] = set()
    for name in names:
        base = clean_identifier(name, max_length)
        candidate, i = base, 1
        while candidate in used:
            i += 1
            suffix = f"_{i}"
            candidate = base[: max_length - len(suffix)] + suffix
        mapping[name] = candidate
        used.add(candidate)
    return mapping


def clean_columns(df: DataFrame) -> DataFrame:
    """Rename every column of ``df`` to its sanitized form (single projection)."""
    mapping = build_column_mapping(df.columns)
    return df.toDF(*[mapping[c] for c in df.columns])
