"""Property-based tests (hypothesis) for the pure-python kernels —
fast, no Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tabata_spark.core.naming import byunits, get_colname, nameunit
from tabata_spark.operators.indicator import indicator_np
from tabata_spark.operators.savgol import savgol_filter_np

name_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")), min_size=1, max_size=8
)
unit_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll")), min_size=0, max_size=5
)


@given(name_st, unit_st)
def test_nameunit_roundtrip(name, unit):
    col = f"{name}[{unit}]"
    n, u = nameunit(col)
    assert n == name and u == unit


@given(st.lists(name_st, min_size=1, max_size=10, unique=True))
def test_get_colname_exact_always_resolves(names):
    cols = [f"{n}[u]" for n in names]
    for c in cols:
        assert get_colname(cols, c) == c


@given(st.lists(st.tuples(name_st, unit_st), min_size=1, max_size=10))
def test_byunits_partitions_columns(pairs):
    cols = [f"{n}[{u}]" for n, u in pairs]
    groups = byunits(cols)
    flat = [c for g in groups.values() for c in g]
    assert sorted(flat) == sorted(cols)  # partition: every column exactly once


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=2, max_value=10),  # half-width
    st.integers(min_value=0, max_value=2),  # deriv
    st.floats(min_value=-100, max_value=100, allow_nan=False),
    st.floats(min_value=-10, max_value=10, allow_nan=False),
)
def test_savgol_linearity_on_lines(l, deriv, a, b):
    """SG of an affine signal is exact for any width/deriv<=order."""
    w = 2 * l + 1
    n = 4 * w
    x = np.arange(n, dtype=float)
    y = a + b * x
    out = savgol_filter_np(y, w, 2, deriv)
    want = {0: y, 1: np.full(n, b), 2: np.zeros(n)}[deriv]
    scale = max(abs(a), abs(b), 1.0)
    np.testing.assert_allclose(out, want, atol=1e-6 * scale)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=30, max_size=120))
def test_savgol_is_linear_operator(ys):
    y = np.asarray(ys)
    a = savgol_filter_np(y, 11, 2, 0)
    b = savgol_filter_np(2 * y, 11, 2, 0)
    np.testing.assert_allclose(b, 2 * a, atol=1e-6 * max(1.0, np.abs(y).max()))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(-10, 10, allow_nan=False, allow_infinity=False), min_size=25, max_size=200),
    st.floats(min_value=0.1, max_value=5.0),
)
def test_indicator_ramp_invariants(ys, sigma):
    """Reference-semantics invariants (instants.py:45-93): nondecreasing
    everywhere, zero when no crossing, bounded by crossing count + 1."""
    y = np.asarray(ys)
    z = indicator_np(y, 11, 1, sigma)
    assert len(z) == len(y)
    assert np.all(np.diff(z) >= -1e-12)
    # z[0] = base (0 rising / 1 falling) + 1 if a crossing sits at
    # diff-index 0 (empty first segment, reference instants.py:88-92)
    assert z[0] in (0.0, 1.0, 2.0)
    x = savgol_filter_np(y, 11, 2, 1)
    crossings = np.diff((x > sigma).astype(int))
    n_cross = int(np.count_nonzero(crossings))
    if n_cross == 0:
        np.testing.assert_array_equal(z, np.zeros(len(y)))
    else:
        assert z[-1] <= n_cross + 2  # base starts <=1, +1 per segment


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=5, max_size=50))
def test_decode_stub_deterministic(vals):
    from tabata_spark.operators.multimodal import decode_stub

    blob = np.asarray(vals).tobytes()
    assert decode_stub(blob, 8) == decode_stub(blob, 8)
    assert len(decode_stub(blob, 8)) == 8
    assert all(0 <= v <= 1 for v in decode_stub(blob, 8))


# ---------------------------------------------------------------------------
# round-5 session-2 operators
# ---------------------------------------------------------------------------

words_st = st.lists(
    st.sampled_from(["a", "b", "c", "d", "ee", "ff"]), min_size=0, max_size=30
)


@settings(max_examples=10, deadline=None)
@given(st.lists(words_st, min_size=1, max_size=12), st.integers(2, 4))
def test_span_stats_invariants(spark, corpora, n):
    """covered <= n_tokens; dup_starts <= n-gram count; strip removal
    accounting matches coverage accounting on every random corpus."""
    from tabata_spark.operators.dedup import duplicate_span_stats, strip_duplicate_spans

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpora)], "doc_id long, text string"
    )
    stats = {r["doc_id"]: r for r in duplicate_span_stats(docs, n=n).collect()}
    for i, ws in enumerate(corpora):
        ntok = len(" ".join(ws).split(" "))  # '' splits to ['']
        r = stats[i]
        assert r["n_tokens"] == ntok
        assert 0 <= r["covered_tokens"] <= ntok
        assert r["dup_starts"] <= max(0, ntok - n + 1)
        assert (r["covered_tokens"] == 0) == (r["dup_starts"] == 0)
    stripped = {r["doc_id"]: r for r in strip_duplicate_spans(docs, n=n).collect()}
    for i in stats:
        s = stripped[i]
        assert s["n_removed"] <= stats[i]["covered_tokens"]
        if s["n_removed"] == s["n_tokens"]:
            # everything removed: the string encoding of an empty
            # token list is '' (indistinguishable from one empty
            # token — the counts disambiguate)
            assert s["kept_text"] == ""
        else:
            # engine convention: '' is one (empty-string) token —
            # ''.split mirrors split(text, ' ') exactly
            assert len(s["kept_text"].split(" ")) == s["n_tokens"] - s["n_removed"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 500), st.integers(0, 3)), min_size=1, max_size=60),
    st.integers(1, 5),
    st.integers(2, 8),
)
def test_domain_cap_sharded_equals_plain_property(spark, rows, cap, shards):
    from tabata_spark.operators.sampling import domain_cap

    uniq = {i: d for i, d in rows}
    df = spark.createDataFrame(
        [(i, f"d{d}") for i, d in uniq.items()], "doc_id long, source string"
    )
    plain = {r["doc_id"] for r in domain_cap(df, cap=cap, salt="p").collect()}
    sharded = {
        r["doc_id"] for r in domain_cap(df, cap=cap, salt="p", shards=shards).collect()
    }
    assert plain == sharded


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 15), min_size=4, max_size=4), st.integers(2, 6))
def test_pq_pack_roundtrip_property(spark, codes, _unused):
    from pyspark.sql import functions as F

    from tabata_spark.operators.similarity import pq_pack, pq_unpack

    df = spark.createDataFrame([tuple([0] + codes)], "vec_id long, c0 int, c1 int, c2 int, c3 int")
    packed = pq_pack(df, m=4, ksub=16)
    back = pq_unpack(packed.drop("c0", "c1", "c2", "c3"), m=4, ksub=16)
    got = back.select("c0", "c1", "c2", "c3").collect()[0]
    assert [got["c0"], got["c1"], got["c2"], got["c3"]] == codes
