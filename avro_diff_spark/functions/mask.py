"""Deterministic column pseudonymization — the governance step before a
table leaves its trust boundary (vendor export, cross-team share,
training-corpus join keys).

``mask_token`` replaces a value with ``prefix + hex(sha256(salt + ':' +
value))[:length]``: the SAME value under the SAME salt always maps to
the SAME token, so masked tables still join/group/dedup correctly,
while recovering the original requires the salt (keep it out of the
exported data). NULL stays NULL (a masked unknown is still unknown).
The default 16 hex chars carry 64 bits — collision-negligible below
~10^9 distinct values per column; raise ``length`` for bigger domains.

Everything is a pure Column expression (``sha2`` is JVM-side,
whole-stage codegen) — masking 100 TB is map-only with zero Python.
The DuckDB oracle mirrors with ``sha256()`` (both engines emit
lowercase hex).

No reference parity: yuana97/Avro_Diff has no governance surface;
beyond-reference tier (the dedup.py precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def mask_token(
    col: Column, *, salt: str, prefix: str = "tok_", length: int = 16
) -> Column:
    """The pseudonymization token of one value (module docstring)."""
    digest = F.sha2(F.concat(F.lit(salt + ":"), col.cast("string")), 256)
    return F.when(
        col.isNotNull(), F.concat(F.lit(prefix), F.substring(digest, 1, length))
    )


def mask_token_sql(expr: str, *, salt: str, prefix: str = "tok_", length: int = 16) -> str:
    """DuckDB twin of :func:`mask_token` (oracle builder). ``salt`` and
    ``prefix`` are DATA and get SQL-escaped (``'`` doubles — a salt
    containing a quote must still build valid, non-injectable SQL);
    ``expr`` is caller-supplied SQL text by contract, like every other
    oracle builder's column argument."""
    salt_lit = salt.replace("'", "''")
    prefix_lit = prefix.replace("'", "''")
    return (
        f"CASE WHEN {expr} IS NOT NULL THEN '{prefix_lit}' || "
        f"substr(sha256('{salt_lit}:' || CAST({expr} AS VARCHAR)), 1, {length}) END"
    )


def mask_columns(
    df: DataFrame,
    cols: list[str],
    *,
    salt: str,
    prefix: str = "tok_",
    length: int = 16,
) -> DataFrame:
    """``df`` with every column in ``cols`` replaced by its token (same
    schema positions, other columns untouched)."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"mask_columns: no such columns {missing}")
    out = [
        mask_token(F.col(c), salt=salt, prefix=prefix, length=length).alias(c)
        if c in cols
        else F.col(c)
        for c in df.columns
    ]
    return df.select(*out)
