"""Hypothesis property tests over the pure kernels (no Ray) —
mirrors the reference's unit-test layer but with generated inputs:
codec roundtrips, grid containment, hash consistency, merge-order
invariance of the latest-wins comparator key."""

import numpy as np
from hypothesis import given, settings, strategies as st

from oluray.functions import geo, mediacodec as mc
from oluray.functions import xmlcodec as xc
from oluray.sources import osc
from oluray.stages import dedup
from oluray.stages.text import token_hashes_many

SETTINGS = dict(max_examples=60, deadline=None)


@settings(**SETTINGS)
@given(st.text(max_size=200))
def test_xml_encode_decode_roundtrip(s):
    assert xc.xml_decode(xc.xml_encode(s)) == s


@settings(**SETTINGS)
@given(st.text(max_size=120))
def test_sanitize_idempotent(s):
    once = xc.sanitize(s)
    assert xc.sanitize(once) == once


@settings(**SETTINGS)
@given(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
)
def test_wkt_point_roundtrip_7dp(lon, lat):
    lon7, lat7 = round(lon, 7), round(lat, 7)
    wkt = xc.wkt_point(lon7, lat7)
    glon, glat = xc.parse_wkt_point(wkt)
    assert abs(glon - lon7) < 5e-8 and abs(glat - lat7) < 5e-8


@settings(**SETTINGS)
@given(
    st.floats(min_value=-179.999, max_value=179.999, allow_nan=False),
    st.floats(min_value=-89.999, max_value=89.999, allow_nan=False),
    st.integers(min_value=1, max_value=14),
)
def test_cell_encode_decode_contains_point(lon, lat, res):
    cell = geo.cell_encode(np.array([lon]), np.array([lat]), res)
    r, x, y = geo.cell_decode(cell)
    assert int(r[0]) == res
    n = 1 << res
    assert 0 <= x[0] < n and 0 <= y[0] < n
    # the decoded cell's bbox contains the point
    lon0 = -180.0 + 360.0 * x[0] / n
    lat0 = -90.0 + 180.0 * y[0] / n
    assert lon0 - 1e-9 <= lon <= lon0 + 360.0 / n + 1e-9
    assert lat0 - 1e-9 <= lat <= lat0 + 180.0 / n + 1e-9


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), max_size=400),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(samples, rate):
    s = np.array(samples, dtype=np.int16)
    r, out = mc.decode_wav(mc.encode_wav(s, rate))
    assert r == rate
    np.testing.assert_array_equal(out, s)


@settings(**SETTINGS)
@given(st.lists(st.binary(max_size=50), max_size=12), st.integers(1, 120))
def test_fvid_roundtrip(frames, fps):
    buf = mc.encode_fakevideo(frames, fps)
    n, got_fps, offs = mc.probe_fakevideo(buf)
    assert n == len(frames) and got_fps == fps
    assert all(mc.extract_frame(buf, i) == f for i, f in enumerate(frames))


@settings(**SETTINGS)
@given(st.integers(min_value=0, max_value=999_999_999))
def test_seq_path_reversible(seq):
    p = osc.seq_path(seq)
    assert len(p) == 11 and p.count("/") == 2
    assert int(p.replace("/", "")) == seq


@settings(**SETTINGS)
@given(st.lists(st.text(alphabet=st.characters(codec="utf-8"), max_size=40), min_size=1, max_size=8))
def test_token_hashes_many_matches_single(texts):
    flat, counts = token_hashes_many(texts)
    assert counts.sum() == len(flat)
    pos = 0
    for t, c in zip(texts, counts):
        single, _ = token_hashes_many([t])
        np.testing.assert_array_equal(flat[pos : pos + c], single)
        pos += c


@settings(**SETTINGS)
@given(st.text(min_size=0, max_size=100), st.text(min_size=0, max_size=100))
def test_jaccard_symmetric_bounded(a, b):
    sa, sb = dedup.char_shingles(a), dedup.char_shingles(b)
    j1, j2 = dedup.jaccard(sa, sb), dedup.jaccard(sb, sa)
    assert j1 == j2
    assert 0.0 <= j1 <= 1.0
    assert dedup.jaccard(sa, sa) == 1.0


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.booleans()),
        min_size=1, max_size=30,
    )
)
def test_latest_wins_comparator_order_free(rows):
    """The winner under the (version, deleted, ts) comparator must not
    depend on input order (the reference sorts then unique_copies —
    `src/osm/OsmUpdater.cpp:120-135`)."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "version": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] * 1000_000 for r in rows], unit="ms"),
            "deleted": [r[2] for r in rows],
        }
    )
    def winner(frame):
        f = frame.sort_values(
            ["version", "deleted", "ts"], ascending=[False, False, False],
            kind="mergesort",
        )
        return tuple(f.iloc[0][["version", "deleted", "ts"]])

    assert winner(df) == winner(df.iloc[::-1])


def test_token_hashes_long_token_matches_reference():
    """>64-byte tokens take the per-token path; result must equal the
    canonical per-byte FNV-1a for every length across the boundary."""
    from oluray.stages.text import _FP_BASE, _FP_OFFSET

    def ref_fnv(data: bytes) -> int:
        h = int(_FP_OFFSET)
        for b in data:
            h = ((h ^ b) * int(_FP_BASE)) & ((1 << 64) - 1)
        return h

    toks = ["x" * n for n in (1, 63, 64, 65, 200, 5000)]
    text = " ".join(toks)
    flat, counts = token_hashes_many([text])
    assert counts[0] == len(toks)
    for t, h in zip(toks, flat):
        assert int(h) == ref_fnv(t.encode())
