"""Property-based tests (hypothesis): scalar functions vs Python oracles.

Each property evaluates a whole generated batch in ONE Spark job (collect
per example would be prohibitively slow)."""

from fractions import Fraction

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.hex import (
    hex_to_dec_native,
    split_to_words,
    word_to_address,
)
from ethereum_etl_spark.functions.text import text_fingerprint, token_count
from ethereum_etl_spark.operators.lending import round_half_even_div

HEX = "0123456789abcdefABCDEF"

hex_strings = st.one_of(
    st.text(alphabet=HEX, min_size=0, max_size=40),
    st.text(alphabet=HEX, min_size=0, max_size=40).map(lambda s: "0x" + s),
    st.text(alphabet=HEX + "xzg", min_size=0, max_size=12),  # some invalid
)


def _py_hex_oracle(s):
    bare = s[2:] if s.lower().startswith("0x") else s
    if not bare:
        return None
    try:
        v = int(bare, 16)
    except ValueError:
        return None
    return v if v < 16**31 else None


@settings(max_examples=5, deadline=None)
@given(st.lists(hex_strings, min_size=1, max_size=60))
def test_hex_decode_matches_python(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "h string")
    got = [r["v"] for r in df.select(hex_to_dec_native(F.col("h")).alias("v")).collect()]
    want = [_py_hex_oracle(x) for x in xs]
    assert [None if g is None else int(g) for g in got] == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="0123456789abcdef", min_size=64, max_size=64),
                min_size=1, max_size=8))
def test_split_to_words_roundtrip(spark, words):
    payload = "0x" + "".join(words)
    df = spark.createDataFrame([(payload,)], "d string")
    got = df.select(split_to_words(F.col("d")).alias("w")).first()["w"]
    assert got == ["0x" + w for w in words]
    addr = df.select(word_to_address(F.lit("0x" + words[0])).alias("a")).first()["a"]
    assert addr == "0x" + words[0][-40:]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet=" \t\nabcXYZ.,!", max_size=50), min_size=1, max_size=40))
def test_token_count_matches_python_split(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["n"] for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert got == [len(t.split()) for t in texts]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="abc xyz", min_size=1, max_size=30), min_size=1, max_size=20))
def test_fingerprint_whitespace_case_punct_invariant(spark, texts):
    variants = [(t, t.upper() + " .,", "  " + t.replace(" ", "   ")) for t in texts]
    df = spark.createDataFrame(variants, "a string, b string, c string")
    out = df.select(
        text_fingerprint(F.col("a")).alias("fa"),
        text_fingerprint(F.col("b")).alias("fb"),
        text_fingerprint(F.col("c")).alias("fc"),
    ).collect()
    for r in out:
        assert r["fa"] == r["fb"] == r["fc"]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10**30), st.integers(1, 10**20)),
                min_size=1, max_size=50))
def test_round_half_even_div_matches_fraction(spark, pairs):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal(n), Decimal(d)) for n, d in pairs], "n decimal(38,0), d decimal(38,0)"
    )
    got = [int(r["q"]) for r in
           df.select(round_half_even_div(F.col("n"), F.col("d")).alias("q")).collect()]
    assert got == [round(Fraction(n, d)) for n, d in pairs]
