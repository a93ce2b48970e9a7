"""Property tests for the round-7 byte-level work: the AVI container
codec (encoder vs independent RIFF-walker decoder) and the Jet 2.0
derived-layout rows with SMALLINT/REAL fixed kinds and multi-byte
(reversed) null bitmaps."""

from __future__ import annotations

import struct
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from hhek2sqlite_spark.operators import multimodal as mm
from hhek2sqlite_spark.sources.jet2 import HHEK_SCHEMAS, _decode_row, _encode_row

_PIXEL = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 6),
    n=st.integers(1, 5),
    data=st.data(),
)
def test_avi_roundtrip_any_dims(w, h, n, data):
    frames = [
        [[data.draw(_PIXEL) for _ in range(w)] for _ in range(h)]
        for _ in range(n)
    ]
    blob = mm.avi_encode(frames)
    rw, rh, back = mm.avi_decode(blob)
    assert (rw, rh) == (w, h)
    assert back == frames
    # the raw demux sees the same frame count in the same order
    chunks = mm._avi_frame_chunks(blob)
    assert len(chunks) == n


@settings(max_examples=100, deadline=None)
@given(
    months=st.lists(
        st.one_of(
            st.none(),
            st.decimals(
                min_value=Decimal("-99999.9999"),
                max_value=Decimal("99999.9999"),
                places=4,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=12,
        max_size=12,
    ),
    hurofta=st.one_of(st.none(), st.integers(-(2**15), 2**15 - 1)),
    kontrollnr=st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
    lopnr=st.integers(0, 2**31 - 1),
    texts=st.lists(
        st.text(
            alphabet=st.characters(codec="cp1252", exclude_characters="\x00"),
            max_size=15,
        ),
        min_size=3,
        max_size=3,
    ),
)
def test_jet2_budget_row_roundtrip(months, hurofta, kontrollnr, lopnr, texts):
    """Budget is the 15-fixed-column table whose 2-byte null bitmap is
    stored byte-reversed — every NULL pattern must survive the
    encode/decode pair."""
    schema = HHEK_SCHEMAS["Budget"]
    names = ("Jan", "Feb", "Mar", "Apr", "Maj", "Jun",
             "Jul", "Aug", "Sep", "Okt", "Nov", "Dec")
    row = dict(zip(names, months))
    row |= {"HurOfta": hurofta, "Kontrollnr": kontrollnr, "Löpnr": lopnr}
    row |= dict(zip(("Typ", "Inkomst", "StartMånad"), texts))
    assert _decode_row(_encode_row(schema, row), schema) == row


@settings(max_examples=100, deadline=None)
@given(
    fast=st.floats(width=32, allow_nan=False, allow_infinity=False),
    rorlig=st.floats(width=32, allow_nan=False, allow_infinity=False),
)
def test_jet2_lan_single_columns_roundtrip(fast, rorlig):
    """REAL (float32) fixed columns in the LÅN layout roundtrip exactly
    for every float32-representable value."""
    schema = HHEK_SCHEMAS["LÅN"]
    row = {name: None for name, _ in schema.fixed}
    row |= {name: "" for name in schema.var}
    row |= {"FastRanta": fast, "RorligRanta": rorlig, "Löpnr": 1}
    got = _decode_row(_encode_row(schema, row), schema)
    assert got["FastRanta"] == struct.unpack("<f", struct.pack("<f", fast))[0]
    assert got["RorligRanta"] == struct.unpack("<f", struct.pack("<f", rorlig))[0]
