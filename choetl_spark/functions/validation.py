"""Validation + error-mode surface (reference §2.3):

ChoETL's per-field validation/error modes (ErrorMode ThrowAndStop /
Ignore / Report, DataAnnotations checks — reference
src/ChoETL/ETLCommon/ChoETLRecordHelper.cs:438-650) re-expressed as
declarative column rules: ``try_cast`` + fallback for conversion errors,
rule predicates compiled into one pass, and the three error modes as
filter/fail/split plans.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class Rule:
    name: str
    predicate: Column  # True = valid


def try_cast_with_fallback(col: Column, dtype: str, fallback=None) -> Column:
    """ChoETL DefaultValue/FallbackValue-on-conversion-error analog."""
    cast = col.try_cast(dtype)
    if fallback is None:
        return cast
    return F.coalesce(cast, F.lit(fallback).cast(dtype))


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Attach a `_violations` array column naming every failed rule."""
    # NULL predicate (e.g. comparison against a failed try_cast) counts
    # as INVALID — SQL three-valued logic would silently pass it
    viol = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(r.predicate, F.lit(False)), F.lit(r.name)
                ).otherwise(F.lit(None).cast("string"))
                for r in rules
            ]
        )
    )
    return df.withColumn("_violations", viol)


def validate_ignore(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """ErrorMode=IgnoreAndContinue: silently drop invalid rows."""
    out = check(df, rules)
    return out.filter(F.size("_violations") == 0).drop("_violations")


def validate_split(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """ErrorMode=ReportAndContinue: (valid rows, invalid rows + reasons)."""
    out = check(df, rules)
    good = out.filter(F.size("_violations") == 0).drop("_violations")
    bad = out.filter(F.size("_violations") > 0)
    return good, bad


def validate_or_fail(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """ErrorMode=ThrowAndStop: raise_error on first invalid row (checked
    lazily at execution, like the reference's streaming writer).

    The guard lives in a FILTER predicate, which Catalyst cannot prune
    away no matter which columns the action reads — even a bare
    ``count()`` evaluates it for every row (a guard woven into an
    output column, the previous form, was skipped by column pruning on
    zero-column actions)."""
    out = check(df, rules)
    guard = F.when(
        F.size("_violations") > 0,
        F.raise_error(
            F.concat(
                F.lit("validation failed: "), F.array_join("_violations", ",")
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    return out.filter(guard).drop("_violations")
