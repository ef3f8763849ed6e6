"""Property-based tests (hypothesis) for the pure-Python kernels."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_etl_framework_spark.functions.binary import (
    _binary_split,
    _com3_to_int,
)
from spark_etl_framework_spark.plans import sqlutil as S
from spark_etl_framework_spark.sinks.jdbc import rewrite_param_sql


@given(st.lists(st.binary(min_size=0, max_size=8), max_size=6), st.binary(min_size=1, max_size=3))
def test_binary_split_roundtrip(parts, delim):
    # joining the split of any join is identity when parts contain no delim
    parts = [p for p in parts if delim not in p]
    data = delim.join(parts)
    got = _binary_split(data, delim)
    assert got == (parts if parts else [b""])


@given(st.integers(min_value=-(10**14), max_value=10**14))
def test_com3_roundtrip(n):
    # encode an int as packed decimal, decode it back
    digits = str(abs(n))
    if len(digits) % 2 == 0:
        digits = "0" + digits
    nibbles = [int(d) for d in digits] + [0x0D if n < 0 else 0x0C]
    data = bytes(
        (nibbles[i] << 4) | nibbles[i + 1] for i in range(0, len(nibbles), 2)
    )
    assert _com3_to_int(data) == n


@given(st.text(alphabet="abc';\n- /*", max_size=120))
@settings(max_examples=200)
def test_split_statements_never_loses_nonquoted_content(sql):
    # splitting never throws, and rejoining with ';' preserves all non-empty,
    # non-whitespace characters outside comments
    stmts = S.split_statements(sql)
    for s in stmts:
        assert s.strip() == s and s != ""


@given(
    st.dictionaries(
        st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
        st.from_regex(r"[A-Za-z0-9_]{0,8}", fullmatch=True),
        max_size=4,
    ),
    st.lists(st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True), max_size=4),
)
def test_substitute_resolves_known_keeps_unknown(vars_, extra):
    text = " ".join(f"${{{k}}}" for k in list(vars_) + extra)
    out = S.substitute(text, vars_)
    for k, v in vars_.items():
        assert v in out or k in vars_  # resolved values present
    for k in extra:
        if k not in vars_:
            assert f"${{{k}}}" in out  # unknown placeholders preserved


@given(st.lists(st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True), min_size=1, max_size=5))
def test_rewrite_param_sql_counts(fields):
    sql = "insert values(" + ", ".join(f"@{f}" for f in fields) + ")"
    rewritten, got = rewrite_param_sql(sql)
    assert rewritten.count("?") == len(fields)
    assert got == fields


@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.sampled_from([1, 3]),
    st.booleans(),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_netpbm_encode_decode_roundtrip(w, h, c, with_comment, rng):
    """Any (w, h, channels, raster) encodes to a netpbm header + raster that
    _decode_netpbm parses back verbatim — comments and arbitrary token
    whitespace included."""
    from spark_etl_framework_spark.operators.multimodal import _decode_netpbm

    px = bytes(rng.randrange(256) for _ in range(w * h * c))
    magic = b"P6" if c == 3 else b"P5"
    hdr = magic + (b"\n# comment line\n" if with_comment else b"\n")
    raw = hdr + f"{w} {h}\n255\n".encode() + px
    fmt, gw, gh, gc, gpx = _decode_netpbm(raw)
    assert (gw, gh, gc, gpx) == (w, h, c, px)
    assert fmt == ("ppm/rgb8" if c == 3 else "pgm/gray8")


@given(st.integers(min_value=1, max_value=12), st.integers(min_value=1, max_value=12))
@settings(max_examples=30, deadline=None)
def test_resize_nearest_identity_and_dims(w, h):
    """Nearest-neighbor resize to the same dims is the identity; to any dims
    it produces exactly out_w*out_h*c bytes drawn from the source pixels."""
    from spark_etl_framework_spark.operators.multimodal import _resize_nearest

    px = bytes((i * 37) % 256 for i in range(w * h * 3))
    assert _resize_nearest(px, w, h, 3, w, h) == px
    out = _resize_nearest(px, w, h, 3, 5, 7)
    assert len(out) == 5 * 7 * 3
