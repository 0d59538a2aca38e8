"""Property-based suites for round-5 pure-python cores (no Spark session):
the winnowing candidate-completeness guarantee, the suffix-automaton
matching statistics, the PNG decode/encode round trip, and the type-widening
lattice used by CDF epochs and the streaming gate."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------- winnowing

@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="ab ", min_size=0, max_size=120),
    st.text(alphabet="ab ", min_size=0, max_size=120),
    st.text(alphabet="cd", min_size=20, max_size=40),
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=0, max_value=100),
)
def test_winnowing_guarantee(prefix_a, prefix_b, shared, cut_a, cut_b):
    """MOSS guarantee: two docs sharing ANY substring of length
    >= k_g + w - 1 share at least one winnowed fingerprint — candidate
    generation is exhaustive for qualifying spans. The shared chunk uses a
    disjoint alphabet so it IS a genuine shared substring regardless of
    the random paddings."""
    from delta_sharing_spark.operators.dedup import _winnow_fingerprints

    min_len = 20
    k_g = min_len // 2
    w = min_len - k_g + 1
    a = prefix_a[:cut_a] + shared + prefix_a[cut_a:]
    b = prefix_b[:cut_b] + shared + prefix_b[cut_b:]
    fa = set(_winnow_fingerprints(a, k_g, w))
    fb = set(_winnow_fingerprints(b, k_g, w))
    assert fa & fb, "winnowing missed a guaranteed shared fingerprint"


# --------------------------------------------------------- suffix automaton

@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc", max_size=60),
       st.text(alphabet="abc", max_size=60),
       st.integers(min_value=1, max_value=6))
def test_sam_coverage_equals_bruteforce(a, b, min_len):
    """Matching-statistics coverage == brute-force: position j of b is
    covered iff some substring of length >= min_len containing j occurs
    in a."""
    from delta_sharing_spark.operators.dedup import (
        _match_coverage, _sam_build)

    grams_a = {a[i:i + min_len] for i in range(len(a) - min_len + 1)}
    expected = set()
    for j in range(len(b) - min_len + 1):
        if b[j:j + min_len] in grams_a:
            expected.update(range(j, j + min_len))
    got = set()
    for s, e in _match_coverage(_sam_build(a), b, min_len):
        got.update(range(s, e))
    assert got == expected


# --------------------------------------------------------------------- png

@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.sampled_from([1, 2, 3, 4]),
    st.data(),
)
def test_png_roundtrip_random_images(w, h, channels, data):
    from delta_sharing_spark.operators.png import decode_png, encode_png

    rows = [bytes(data.draw(st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=w * channels, max_size=w * channels)))
        for _ in range(h)]
    out_w, out_h, out_c, out_rows = decode_png(
        encode_png(w, h, channels, rows))
    assert (out_w, out_h, out_c) == (w, h, channels)
    assert [bytes(r) for r in out_rows] == rows


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_png_garbage_never_crashes(blob):
    from delta_sharing_spark.operators.png import png_decode_meta

    assert png_decode_meta(blob) is None or isinstance(
        png_decode_meta(blob), tuple)


# ------------------------------------------------------------ widening lattice

def _types():
    from pyspark.sql import types as T

    return [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
            T.FloatType(), T.DoubleType(), T.StringType(),
            T.DecimalType(10, 2), T.DecimalType(12, 2),
            T.DecimalType(12, 4), T.BooleanType(), T.DateType()]


def test_widenable_is_a_partial_order():
    """Reflexive, antisymmetric (no two distinct types widen into each
    other), transitive — and never crosses families (int chain never
    widens into string/bool/date). Both copies of the lattice (cdf and
    streaming.schema) agree on every pair."""
    from delta_sharing_spark.cdf import _widenable as w_cdf
    from delta_sharing_spark.streaming.schema import _widenable as w_str

    ts = _types()
    for a in ts:
        assert w_cdf(a, a)
        for b in ts:
            assert w_cdf(a, b) == w_str(a, b)
            if a != b and w_cdf(a, b):
                assert not w_cdf(b, a), (a, b)
            for c in ts:
                if w_cdf(a, b) and w_cdf(b, c):
                    assert w_cdf(a, c), (a, b, c)
    from pyspark.sql import types as T

    assert w_cdf(T.IntegerType(), T.LongType())
    assert not w_cdf(T.LongType(), T.IntegerType())
    assert not w_cdf(T.IntegerType(), T.StringType())
    assert not w_cdf(T.StringType(), T.LongType())
    assert w_cdf(T.FloatType(), T.DoubleType())
    assert w_cdf(T.DecimalType(10, 2), T.DecimalType(12, 2))
    assert not w_cdf(T.DecimalType(12, 2), T.DecimalType(10, 2))
    # scale growth must keep integer headroom: (12,4) has 8 integer digits
    # == (10,2)'s 8 -> admissible; the reverse loses fractional digits
    assert w_cdf(T.DecimalType(10, 2), T.DecimalType(12, 4))
    assert not w_cdf(T.DecimalType(12, 4), T.DecimalType(10, 2))
