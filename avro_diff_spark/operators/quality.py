"""Declarative data-quality expectation suite (the Deequ /
Great-Expectations shape): rules in, one small report DataFrame out —
(rule, violations, n_checked), one row per rule.

Three rule classes, each mapped to its cheapest distributed form:

- **scan rules** (not-null, range, accepted set, regex, any row
  predicate): ALL of them fold into ONE conditional-aggregation pass
  over the table — ``sum(when(violation, 1))`` per rule inside a single
  map-side-combined aggregate. Adding a rule adds a column to the agg,
  never a scan. This is the class you run on every batch at 100 TB.
- **uniqueness rules**: ``count(*) - count(distinct keys)`` — rides the
  same single aggregate (Spark plans the distinct via a partial expand,
  still one pass over the data).
- **referential rules** (FK containment): one LEFT join against the
  referenced side's key projection, counted. The referenced key must be
  unique (it's the PK side) so the join preserves cardinality and
  violations + n_checked come out of ONE aggregate — an anti-join would
  need a second counting job, and joining two 1-row aggregates
  constant-folds to the nested-loop shape the plan gate bans.

Violations are counted, not failed-fast, so the report is also the
monitoring time series (commit it to a versioned table per batch).
CHECK-constraint enforcement at write time is the complementary
fail-fast half (sources/versioned.py add_constraint).

No counterpart in the reference (yuana97/Avro_Diff validates nothing
about its inputs); beyond-reference tier — the data-quality slot the
training-pipeline brief implies (bad rows poison a corpus silently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def expectation_report(
    df: DataFrame,
    *,
    violations: dict[str, Column] | None = None,
    unique: dict[str, list[str]] | None = None,
    fk: dict[str, tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Evaluate expectations over ``df`` and return the report frame
    ``(rule string, violations long, n_checked long)``.

    ``violations`` maps rule name → a Column predicate that is TRUE for
    a row VIOLATING the expectation (express the expectation's negation
    so null-handling is explicit: ``~col.isin(...)`` counts NULL as a
    violation only if you add ``| col.isNull()``).
    ``unique`` maps rule name → the key column list that must be unique.
    ``fk`` maps rule name → (referenced_df, local_col, referenced_col);
    ``referenced_col`` must be unique in ``referenced_df``.
    """
    violations = dict(violations or {})
    unique = dict(unique or {})
    fk = dict(fk or {})
    if not violations and not unique and not fk:
        raise ValueError("no rules given")
    overlap = (set(violations) & set(unique)) | (set(violations) & set(fk)) | (
        set(unique) & set(fk)
    )
    if overlap:
        raise ValueError(f"duplicate rule names: {sorted(overlap)}")
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")]
    names: list[str] = []
    for name, cond in violations.items():
        # coalesce: sum over a ZERO-ROW table is NULL, and an empty
        # input has zero violations, not an unknown count
        aggs.append(
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).alias(name)
        )
        names.append(name)
    for name, keys in unique.items():
        aggs.append((n - F.count_distinct(F.struct(*keys))).alias(name))
        names.append(name)
    report = None
    if names:
        scan = df.agg(*aggs)
        report = scan.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("rule"),
                            F.col(name).cast("long").alias("violations"),
                            F.col("__n").cast("long").alias("n_checked"),
                        )
                        for name in names
                    ]
                )
            ).alias("e")
        ).select("e.rule", "e.violations", "e.n_checked")
    for name, (ref_df, local_col, ref_col) in fk.items():
        hit = ref_df.select(
            F.col(ref_col).alias("__ref_key"), F.lit(1).alias("__hit")
        )
        # SQL FK semantics: a NULL local key is not a violation (pair
        # with a not-null scan rule if it should be)
        one = (
            df.join(hit, df[local_col] == hit["__ref_key"], "left")
            .agg(
                F.coalesce(
                    F.sum(
                        F.when(
                            df[local_col].isNotNull() & F.col("__hit").isNull(), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("violations"),
                n.cast("long").alias("n_checked"),
            )
            .select(F.lit(name).alias("rule"), "violations", "n_checked")
        )
        report = one if report is None else report.unionByName(one)
    return report
