"""Text-analysis scalar functions + multimodal mapInPandas plumbing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.text import (
    bpe_ish_token_count,
    clean_content,
    quality_score,
    round_timestamp_to_date,
    simple_lang_id,
    text_fingerprint,
    token_count,
    zero_pad,
)
from ethereum_etl_spark.operators.multimodal import (
    extract_image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


def test_text_functions_golden(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of to in", 1),
            ("der hund und die katze ist nicht", 2),
            ("xyz", 3),
            ("  spaced   out\ttokens \n here ", 4),
            ("", 5),
        ],
        "text string, id long",
    )
    out = {r["id"]: r for r in df.select(
        "id",
        token_count(F.col("text")).alias("toks"),
        simple_lang_id(F.col("text")).alias("lang"),
        text_fingerprint(F.col("text")).alias("fp"),
        quality_score(F.col("text")).alias("q"),
    ).collect()}
    assert out[1]["lang"] == "en" and out[2]["lang"] == "de" and out[3]["lang"] == "und"
    assert out[1]["toks"] == 8 and out[4]["toks"] == 4 and out[5]["toks"] == 0
    assert out[1]["fp"] == hashlib.md5(b"the cat and the dog of to in").hexdigest()
    assert 0.0 <= out[3]["q"] <= 1.0


def test_clean_zero_pad_date(spark):
    df = spark.createDataFrame([("a\x00b", 7, 86400 * 3 + 5)], "s string, n long, ts long")
    r = df.select(
        clean_content(F.col("s")).alias("c"),
        zero_pad(F.col("n")).alias("z"),
        round_timestamp_to_date(F.col("ts")).alias("d"),
        bpe_ish_token_count(F.lit("foo_bar123 baz!")).alias("bpe"),
    ).first()
    assert r["c"] == "ab" and r["z"] == "00000007" and r["d"] == 86400 * 3
    assert r["bpe"] >= 5  # foo, _, bar, 123, baz, !


def test_media_features_plumbing(spark):
    media = synthesize_media(spark, 30)
    feats = extract_image_features(media, feat_dim=16).collect()
    assert len(feats) == 10  # a third are images
    assert all(len(r["features"]) == 16 and r["decode_ok"] for r in feats)
    # deterministic: same payload → same features
    again = extract_image_features(synthesize_media(spark, 30), feat_dim=16).collect()
    assert {r["media_id"]: r["features"] for r in feats} == {r["media_id"]: r["features"] for r in again}


def test_media_frame_sampling(spark):
    media = synthesize_media(spark, 30)
    frames = sample_frames(media, every_ms=1000)
    per_media = {r["media_id"]: r["n"] for r in
                 frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durations = {r["media_id"]: r["duration_ms"] for r in
                 media.filter(F.col("kind") == "video").collect()}
    assert per_media.keys() == durations.keys()
    for mid, n in per_media.items():
        assert n == max(durations[mid] // 1000, 1)


def test_media_resize_and_real_backend_stub(spark):
    media = synthesize_media(spark, 9)
    out = resize_images(media, 32, 32).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        extract_image_features(media, backend="real").collect()
