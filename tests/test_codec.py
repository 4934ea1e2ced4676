"""VByte codec: exact bytes + round-trips (FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_indexing_spark.codec import (
    delta_decode,
    delta_encode,
    vbyte_decode,
    vbyte_encode,
)


def test_known_bytes():
    assert vbyte_encode([1]) == b"\x01"
    assert vbyte_encode([127]) == b"\x7f"
    assert vbyte_encode([128]) == b"\x80\x01"
    assert vbyte_encode([300]) == b"\xac\x02"  # protobuf varint example
    assert vbyte_encode([16384]) == b"\x80\x80\x01"
    assert vbyte_encode([0]) == b"\x00"
    assert vbyte_encode([]) == b""


def test_round_trip_edges():
    vals = [0, 1, 127, 128, 16383, 16384, 2**32, 2**63 - 1, 2**64 - 1]
    enc = vbyte_encode(vals)
    assert list(vbyte_decode(enc)) == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_round_trip_property(vals):
    assert list(vbyte_decode(vbyte_encode(vals))) == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200
    )
)
def test_delta_round_trip(raw):
    ids = np.unique(np.asarray(raw, dtype=np.int64))
    first, buf = delta_encode(ids)
    out = delta_decode(first, buf, len(ids))
    assert list(out) == list(ids)
