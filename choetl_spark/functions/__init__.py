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

# ---------------------------------------------------------------------------
# recursive JSONPath (the $..x / wildcard subset get_json_object lacks)
# ---------------------------------------------------------------------------

def _parse_jsonpath(path: str) -> list[tuple[str, str]]:
    """Tokenize a JSONPath subset: $, .name, ..name, [*], [n], .*
    (the node-selection shapes of ChoJSONReader.WithJSONPath, reference
    src/ChoETL.JSON/ChoJSONReader.cs:827-834, e.g. ``$..books[*]``)."""
    import re

    if not path.startswith("$"):
        raise ValueError("JSONPath must start with $")
    tokens: list[tuple[str, str]] = []
    rest = path[1:]
    pat = re.compile(
        r"(\.\.[A-Za-z_][\w\-]*)|(\.[A-Za-z_][\w\-]*)|(\[\*\])|(\[\d+\])|(\.\*)"
    )
    pos = 0
    while pos < len(rest):
        m = pat.match(rest, pos)
        if not m:
            raise ValueError(f"unsupported JSONPath at ...{rest[pos:]}")
        if m.group(1):
            tokens.append(("recurse", m.group(1)[2:]))
        elif m.group(2):
            tokens.append(("key", m.group(2)[1:]))
        elif m.group(3):
            tokens.append(("wild_idx", ""))
        elif m.group(4):
            tokens.append(("idx", m.group(4)[1:-1]))
        else:
            tokens.append(("wild_key", ""))
        pos = m.end()
    return tokens


def _jsonpath_matches(obj, tokens):
    if not tokens:
        yield obj
        return
    op, arg = tokens[0]
    rest = tokens[1:]
    if op == "key":
        if isinstance(obj, dict) and arg in obj:
            yield from _jsonpath_matches(obj[arg], rest)
    elif op == "idx":
        i = int(arg)
        if isinstance(obj, list) and i < len(obj):
            yield from _jsonpath_matches(obj[i], rest)
    elif op == "wild_idx":
        if isinstance(obj, list):
            for v in obj:
                yield from _jsonpath_matches(v, rest)
    elif op == "wild_key":
        if isinstance(obj, dict):
            for v in obj.values():
                yield from _jsonpath_matches(v, rest)
    elif op == "recurse":
        # descend depth-first; at every node, a dict key == arg matches
        def walk(node):
            if isinstance(node, dict):
                if arg in node:
                    yield from _jsonpath_matches(node[arg], rest)
                for v in node.values():
                    yield from walk(v)
            elif isinstance(node, list):
                for v in node:
                    yield from walk(v)

        yield from walk(obj)


def json_path_extract(df, col: str, path: str, out_col: str = "matches"):
    """Recursive JSONPath extraction (``$..books[*]`` etc.) over a JSON
    string column -> array<string> of matches (scalars as-is, subtrees
    re-serialized as JSON). ``get_json_object`` covers simple paths
    JVM-side (:func:`json_field`); this covers the recursive/wildcard
    subset it cannot, as an Arrow-batched kernel (per-row json parse is
    unavoidable for recursive descent — same shape as the reference's
    JObject SelectTokens, src/ChoETL.JSON/ChoJSONReader.cs:827-834)."""
    import json as _json

    import pyarrow as pa

    tokens = _parse_jsonpath(path)
    sig = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{out_col}` array<string>"
    idx = df.columns.index(col)

    def kernel(batches):
        for batch in batches:
            vals = batch.column(idx).to_pylist()
            out = []
            for v in vals:
                if v is None:
                    out.append(None)
                    continue
                try:
                    obj = _json.loads(v)
                except ValueError:
                    out.append(None)
                    continue
                matches = [
                    m if isinstance(m, str) else _json.dumps(m)
                    for m in _jsonpath_matches(obj, tokens)
                ]
                out.append(matches)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [pa.array(out, type=pa.list_(pa.string()))],
                names=list(batch.schema.names) + [out_col],
            )

    return df.mapInArrow(kernel, sig)


def encrypt_col(col: Column, key: str) -> Column:
    """Per-field crypto converter (the reference's ChoDESCryptoConverter,
    src/ChoETL/Common/Converters/ChoDESCryptoConverter.cs:10-39, mapped
    to Spark-native AES-GCM — DES is obsolete; aes_encrypt is the
    JVM-side modern equivalent). Key must be 16/24/32 bytes."""
    return F.base64(
        F.aes_encrypt(col.cast("string").cast("binary"), F.lit(key))
    )


def decrypt_col(col: Column, key: str) -> Column:
    """Inverse of :func:`encrypt_col` -> string."""
    return F.aes_decrypt(F.unbase64(col), F.lit(key)).cast("string")
