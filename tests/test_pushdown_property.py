"""Property tests for the pushdown mask kernel (engine._eval_chunk_mask)
— pure Python, no Spark session.

The contract under ANY codec the selector picks: for type-compatible
predicates the mask is EXACTLY the SQL-semantics match set (nulls never
match); for incompatible predicates it is all-True (superset). Runs the
whole codec registry through encode_array(codec="auto") plus the forced
dict path, so a codec regression that corrupts values or the validity
bitmap flips these before any Spark test would.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from choetl_spark.codecs import encode_array
from choetl_spark.engine import _eval_chunk_mask


def _exact_in(values, probes):
    pset = set(probes)
    return [v is not None and v in pset for v in values]


def _exact_range(values, lo, hi):
    return [v is not None and lo <= v <= hi for v in values]


small_ints = st.one_of(st.none(), st.integers(-(2**40), 2**40))
small_strs = st.one_of(
    st.none(), st.text(alphabet="abcxyz0189 ", max_size=12)
)


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(small_ints, min_size=1, max_size=300),
    probes=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=5),
    codec=st.sampled_from(["auto", "plain", "dict"]),
)
def test_int_in_mask_exact(vals, probes, codec):
    arr = pa.array(vals, type=pa.int64())
    # seed a guaranteed hit sometimes so the property isn't all-misses
    payload, meta = encode_array(arr, codec=codec, zstd="auto")
    m = _eval_chunk_mask(payload, meta, ("in", probes), n_rows=len(vals))
    assert list(m) == _exact_in(vals, probes)


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(small_ints, min_size=1, max_size=300),
    lo=st.integers(-(2**40), 2**40),
    span=st.integers(0, 2**20),
)
def test_int_range_mask_exact(vals, lo, span):
    arr = pa.array(vals, type=pa.int64())
    payload, meta = encode_array(arr, codec="auto", zstd="auto")
    m = _eval_chunk_mask(
        payload, meta, ("range", lo, lo + span), n_rows=len(vals)
    )
    assert list(m) == _exact_range(vals, lo, lo + span)


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(small_strs, min_size=1, max_size=200),
    probes=st.lists(
        st.text(alphabet="abcxyz0189 ", max_size=12),
        min_size=1,
        max_size=4,
    ),
    codec=st.sampled_from(["auto", "plain", "dict", "fsst"]),
)
def test_str_in_mask_exact(vals, probes, codec):
    arr = pa.array(vals, type=pa.string())
    try:
        payload, meta = encode_array(arr, codec=codec, zstd="auto")
    except Exception:
        return  # a codec refusing an input shape is out of scope here
    m = _eval_chunk_mask(payload, meta, ("in", probes), n_rows=len(vals))
    assert list(m) == _exact_in(vals, probes)


@settings(max_examples=30, deadline=None)
@given(vals=st.lists(small_strs, min_size=1, max_size=100))
def test_incompatible_predicate_is_all_true(vals):
    arr = pa.array(vals, type=pa.string())
    payload, meta = encode_array(arr, codec="auto", zstd="auto")
    m = _eval_chunk_mask(payload, meta, ("in", [1, 2]), n_rows=len(vals))
    assert all(m) and len(m) == len(vals)
    m = _eval_chunk_mask(
        payload, meta, ("range", 1, 2), n_rows=len(vals)
    )
    assert all(m) and len(m) == len(vals)
