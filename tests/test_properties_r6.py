"""Property tests for the round-6 byte-level codecs: Jet 2.0 row
encode/decode and the image containers. Deterministic hypothesis
profiles (no flaky CI), bounded examples (each costs microseconds)."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from hhek2sqlite_spark.operators import multimodal as mm
from hhek2sqlite_spark.sources.jet2 import (
    HHEK_SCHEMAS,
    TableSchema,
    _decode_row,
    _encode_row,
)

# cp1252-encodable text: latin-1 block minus the 5 holes cp1252 leaves
# (0x81 0x8D 0x8F 0x90 0x9D), plus the euro sign that lives at 0x80
_CP1252 = st.text(
    alphabet=st.characters(
        codec="cp1252", exclude_characters="\x00"
    ),
    max_size=20,
)

_CURRENCY = st.one_of(
    st.none(),
    st.decimals(
        min_value=Decimal("-99999.9999"),
        max_value=Decimal("99999.9999"),
        places=4,
        allow_nan=False,
        allow_infinity=False,
    ),
)


@settings(max_examples=200, deadline=None)
@given(
    belopp=_CURRENCY,
    lopnr=st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
    saldo=_CURRENCY,
    fast=st.booleans(),
    texts=st.lists(_CP1252, min_size=7, max_size=7),
)
def test_jet2_row_roundtrip_transaktioner(belopp, lopnr, saldo, fast, texts):
    schema = HHEK_SCHEMAS["Transaktioner"]
    row = {
        "Belopp": belopp,
        "Löpnr": lopnr,
        "Saldo": saldo,
        "Fastöverföring": fast,
    }
    row.update(dict(zip(schema.var, texts)))
    try:
        buf = _encode_row(schema, row)
    except ValueError:
        # documented u8-offset limit: only legitimate for long rows
        assert sum(len(t.encode("cp1252")) for t in texts) + 24 + 14 > 255
        return
    back = _decode_row(buf, schema)
    # None text columns encode as empty string (Jet has no var-null here)
    want = dict(row)
    assert back == want


@settings(max_examples=100, deadline=None)
@given(
    n_fixed=st.integers(0, 3),
    texts=st.lists(_CP1252, min_size=0, max_size=4),
    longs=st.lists(st.one_of(st.none(), st.integers(-100, 100)), min_size=3, max_size=3),
)
def test_jet2_row_roundtrip_arbitrary_schema(n_fixed, texts, longs):
    schema = TableSchema(
        [(f"c{i}", "long") for i in range(n_fixed)],
        [f"v{i}" for i in range(len(texts))],
    )
    row = {f"c{i}": longs[i] for i in range(n_fixed)}
    row.update({f"v{i}": t for i, t in enumerate(texts)})
    try:
        buf = _encode_row(schema, row)
    except ValueError:
        return
    assert _decode_row(buf, schema) == row


_PIXEL = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 6),
    data=st.data(),
    ft=st.integers(0, 4),
)
def test_image_codecs_roundtrip_any_pixels(w, h, data, ft):
    rows = [
        [data.draw(_PIXEL) for _ in range(w)] for _ in range(h)
    ]
    assert mm.bmp_decode(mm.bmp_encode(rows)) == (w, h, rows)
    assert mm.ppm_decode(mm.ppm_encode(rows)) == (w, h, rows)
    assert mm.png_decode(mm.png_encode(rows, filter_type=ft)) == (w, h, rows)


@settings(max_examples=60, deadline=None)
@given(
    nch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    samples=st.lists(
        st.integers(-32768, 32767), min_size=1, max_size=64
    ),
)
def test_wav_roundtrip_any_samples(nch, rate, samples):
    frames = [
        tuple(samples[(i + c) % len(samples)] for c in range(nch))
        for i in range(len(samples))
    ]
    data = mm.wav_encode(frames, sample_rate=rate)
    assert mm.wav_decode(data) == (nch, rate, frames)
