"""Scalar function surface mirroring ChoETL's converter/format-spec layer
(SURVEY.md §2.9) as Column expressions — Catalyst codegen is the
"compiler" that replaces ChoETL's runtime-compiled converters."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRUE_TOKENS = ["Y", "y", "1", "T", "t", "true", "True", "TRUE", "yes", "YES"]
_FALSE_TOKENS = ["N", "n", "0", "F", "f", "false", "False", "FALSE", "no", "NO"]


def parse_bool(col: Column) -> Column:
    """ChoBooleanFormatSpec (Y/N, 1/0, T/F) parsing
    (reference src/ChoETL/Common/Converters/ChoTypeConverterFormatSpec.cs:11-20)."""
    return (
        F.when(F.trim(col).isin(_TRUE_TOKENS), F.lit(True))
        .when(F.trim(col).isin(_FALSE_TOKENS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def parse_currency(col: Column, scale: int = 4) -> Column:
    """ChoCurrency parsing (strip symbols/thousands separators → decimal)
    (reference src/ChoETL/Common/ChoCurrency.cs)."""
    cleaned = F.regexp_replace(F.trim(col), r"[^0-9.\-]", "")
    return cleaned.cast(f"decimal(38,{scale})")


def parse_datetime(col: Column, fmt: str) -> Column:
    """TryParseExact analog — to_timestamp with explicit format; invalid
    values become null (ErrorMode=Ignore semantics)."""
    return F.try_to_timestamp(col, F.lit(fmt))


def iif(cond: Column, a, b) -> Column:
    """The dynamic-LINQ iif(cond, a, b)
    (reference src/ChoETL/Common/Dynamic/ChoDynamicQueryable.cs:652-654)."""
    return F.when(cond, a).otherwise(b)


def mask(col: Column, keep_last: int = 4, mask_char: str = "*") -> Column:
    """String masking (ChoStringEx masking helpers)."""
    n = F.length(col)
    masked_len = F.greatest(n - keep_last, F.lit(0))
    return F.concat(
        F.repeat(F.lit(mask_char), masked_len.cast("int")),
        F.substring(col, -keep_last, keep_last),
    )


def left(col: Column, n: int) -> Column:
    return F.substring(col, 1, n)


def right(col: Column, n: int) -> Column:
    return F.substring(col, -n, n)


def to_camel_case(col: Column) -> Column:
    """ToCamelCase analog: lower first char, TitleCase subsequent words."""
    return F.concat(F.lower(F.substring(col, 1, 1)), _camel_rest(col))


def _camel_rest(col: Column) -> Column:
    words = F.split(F.regexp_replace(F.trim(col), r"[_\s]+", " "), " ")
    rest = F.transform(
        F.slice(words, 2, 1 << 20),
        lambda w: F.concat(
            F.upper(F.substring(w, 1, 1)), F.substring(w, 2, 1 << 20)
        ),
    )
    first_rest = F.substring(F.element_at(words, 1), 2, 1 << 20)
    return F.concat(first_rest, F.concat_ws("", rest))


def is_number(col: Column) -> Column:
    return col.rlike(r"^-?\d+(\.\d+)?$")


def json_field(col: Column, path: str) -> Column:
    """JSONPath-style field extraction (ChoJSONReader.WithJSONPath analog)."""
    return F.get_json_object(col, path)


def seq_no() -> Column:
    """ChoSeqNoGenerator analog — unique (not dense) ids, distributed."""
    return F.monotonically_increasing_id()
