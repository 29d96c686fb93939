"""ALP float codec: bit-exact round-trips, exception handling, and
selector integration (decimal columns pick it; random reals do not)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from choetl_spark.codecs import decode_array, encode_array
from choetl_spark.codecs.alp import decode_alp, encode_alp
from choetl_spark.selector import choose_codec


def _bits(arr: pa.Array) -> list:
    item = np.float32 if pa.types.is_float32(arr.type) else np.float64
    width = np.uint32 if item is np.float32 else np.uint64
    vals = np.asarray(arr.to_numpy(zero_copy_only=False), item)
    return vals.view(width).tolist()


def _roundtrip_bit_identical(arr: pa.Array):
    payload, meta = encode_alp(arr)
    out = decode_alp(payload, meta)
    assert _bits(out) == _bits(arr)
    return meta


def test_alp_prices_pack_tightly():
    prices = pa.array(
        [round(19.99 + 0.01 * i, 2) for i in range(4096)], pa.float64()
    )
    meta = _roundtrip_bit_identical(prices)
    assert meta["e"] == 2 and meta["n_exc"] == 0
    # 4096 increasing cents span 4096 -> 12-bit packing, ~6KB not 32KB
    assert meta["width"] <= 13
    payload, _ = encode_alp(prices)
    assert len(payload) < 4096 * 8 / 4


def test_alp_exceptions_and_specials():
    vals = [1.5, math.pi, float("nan"), float("inf"), -0.0, 2.25, None]
    arr = pa.array(vals, pa.float64())
    payload, meta = encode_array(arr, codec="alp", zstd="off")
    out = decode_array(payload, meta)
    got = out.to_pylist()
    assert got[0] == 1.5 and got[1] == math.pi and got[5] == 2.25
    assert math.isnan(got[2]) and got[3] == float("inf")
    assert got[6] is None
    # -0.0 survives with its sign bit (the int hop would lose it)
    assert math.copysign(1.0, got[4]) == -1.0


def test_alp_float32():
    arr = pa.array(
        [float(np.float32(x / 10)) for x in range(-500, 500)],
        pa.float32(),
    )
    meta = _roundtrip_bit_identical(arr)
    assert meta["dtype"] == "float32"


def test_alp_empty_and_constant():
    _roundtrip_bit_identical(pa.array([], pa.float64()))
    meta = _roundtrip_bit_identical(
        pa.array([7.25] * 1000, pa.float64())
    )
    assert meta["width"] == 0  # constant decimal packs to nothing


def test_selector_picks_alp_for_decimals_not_for_reals():
    decimals = pa.array(
        [round((i * 37 % 1000) / 100, 2) + 3 for i in range(4096)],
        pa.float64(),
    )
    name, _ = choose_codec(decimals)
    assert name == "alp"
    rng = np.random.default_rng(7)
    reals = pa.array(rng.standard_normal(4096), pa.float64())
    name2, _ = choose_codec(reals)
    assert name2 != "alp"  # every value an exception -> worse than plain


@settings(deadline=None, max_examples=30)
@given(
    st.lists(
        st.one_of(
            st.decimals(
                min_value=-10**6, max_value=10**6, places=3
            ).map(float),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        max_size=300,
    )
)
def test_alp_property_bit_exact(vals):
    arr = pa.array(vals, pa.float64())
    _roundtrip_bit_identical(arr)


def test_selector_rejects_decimal_head_random_tail():
    """The applicability probe is STRIDED: a chunk whose head is
    decimal but whose tail is random reals must not pick alp (head-only
    sampling would estimate frac~1.0 and blow the payload up with
    exceptions)."""
    rng = np.random.default_rng(3)
    vals = [round(i / 100, 2) for i in range(512)] + list(
        rng.standard_normal(3584)
    )
    name, _ = choose_codec(pa.array(vals, pa.float64()))
    assert name != "alp"


def test_exception_placeholder_keeps_packing_tight():
    """One NaN in a high-offset decimal column must not drag the
    frame-of-reference min to 0 (the placeholder is an in-range exact
    value, not 0)."""
    base = [round(1.7e9 + i / 100, 2) for i in range(1000)]
    clean_payload, clean_meta = encode_alp(
        pa.array(base, pa.float64())
    )
    dirty = base[:500] + [float("nan")] + base[500:]
    dirty_payload, dirty_meta = encode_alp(
        pa.array(dirty, pa.float64())
    )
    assert dirty_meta["width"] == clean_meta["width"]
    assert len(dirty_payload) <= len(clean_payload) + 16
    out = decode_alp(dirty_payload, dirty_meta).to_pylist()
    assert math.isnan(out[500]) and out[0] == base[0]
