"""Unit tests for text-analysis operators (normalization, n-grams,
language-ID tie-breaking, fingerprints)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_data_pipeline_spark.operators.text_analysis import (
    fingerprint64,
    fingerprint128,
    language_id,
    ngrams,
    normalize_text,
    top_ngrams,
    word_tokens,
)


def one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def val(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


def test_normalize_collapses_and_lowers(spark):
    df = one(spark, "  Hello\t  WORLD \n x ")
    assert val(df, normalize_text(F.col("text"))) == "hello world x"


def test_ngrams_shapes(spark):
    df = one(spark, "a b c d")
    assert val(df, ngrams(F.col("text"), 1)) == ["a", "b", "c", "d"]
    assert val(df, ngrams(F.col("text"), 2)) == ["a b", "b c", "c d"]
    assert val(df, ngrams(F.col("text"), 3)) == ["a b c", "b c d"]
    # degenerate: fewer tokens than n → empty array
    short = one(spark, "only two")
    assert val(short, ngrams(F.col("text"), 3)) == []


def test_word_tokens_bpe_ish(spark):
    df = one(spark, "It's 42 degrees!")
    assert val(df, word_tokens(F.col("text"))) == [
        "it", "'", "s", "42", "degrees", "!",
    ]


def test_language_id_priority_and_und(spark):
    assert val(one(spark, "the cat and the hat"), language_id(F.col("text"))) == "en"
    assert val(one(spark, "der hund ist nicht da"), language_id(F.col("text"))) == "de"
    # 'la' hits french; 'es'-only words hit spanish; tie goes to the
    # earlier-priority language
    assert val(one(spark, "zzz qqq"), language_id(F.col("text"))) == "und"
    # en and de tie at 1 hit each → en wins (priority order)
    assert val(one(spark, "the und"), language_id(F.col("text"))) == "en"


def test_fingerprints_invariant_under_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different",)], "text string"
    )
    fps = [r["fp"] for r in df.select(fingerprint128(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]
    fps64 = [r["fp"] for r in df.select(fingerprint64(F.col("text")).alias("fp")).collect()]
    assert fps64[0] == fps64[1] != fps64[2]
    assert isinstance(fps64[0], int)


def test_top_ngrams_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("b a",), ("a b",), ("c d",)], "text string"
    )
    rows = top_ngrams(df, "text", n=2, k=10).collect()
    # all three bigrams occur once; tie broken by ngram string ascending
    assert [(r["ngram"], r["n_occurrences"]) for r in rows] == [
        ("a b", 1), ("b a", 1), ("c d", 1),
    ]


def test_with_text_stats_appends_stat_columns(spark):
    from ehr_data_pipeline_spark.operators.text_analysis import with_text_stats

    df = spark.createDataFrame([(1, "Hello world 42",)], ["doc_id", "text"])
    out = with_text_stats(df)
    row = out.collect()[0]
    assert row["doc_id"] == 1  # original columns preserved
    added = set(out.columns) - {"doc_id", "text"}
    assert {"n_chars", "n_tokens"} <= added
    assert row["n_tokens"] == 3
