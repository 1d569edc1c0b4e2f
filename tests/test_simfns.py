import math

import pandas as pd
import pytest

from belb_spark.functions import simfns


def test_jaro_winkler_known_values():
    # classic textbook values (same as rapidfuzz/textdistance)
    assert simfns.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
    assert simfns.jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
    assert simfns.jaro_winkler("abc", "abc") == 1.0
    assert simfns.jaro_winkler("abc", "xyz") == 0.0
    assert simfns.jaro_winkler("", "") == 1.0


def test_levenshtein_norm():
    assert simfns.levenshtein_norm("kitten", "sitting") == pytest.approx(1 - 3 / 7)
    assert simfns.levenshtein_norm(["a", "b", "c"], ["a", "x", "c"]) == pytest.approx(2 / 3)
    assert simfns.levenshtein_norm("", "abc") == 0.0
    assert simfns.levenshtein_norm("same", "same") == 1.0


def test_char_ngram_cosine():
    assert simfns.char_ngram_cosine("abcdef", "abcdef") == 1.0
    assert simfns.char_ngram_cosine("abcdef", "uvwxyz") == 0.0
    mid = simfns.char_ngram_cosine("abcdefgh", "abcdxfgh")
    assert 0.0 < mid < 1.0


def test_rich_score_batch_bounds():
    a = pd.Series(["alpha beta gamma", "one two three", "same text"])
    b = pd.Series(["alpha beta gamma", "four five six", "same text"])
    s = simfns.rich_score_batch(a, b, 0.25, 0.35, 0.40, 600)
    assert s[0] == pytest.approx(1.0)
    assert s[2] == pytest.approx(1.0)
    assert 0.0 <= s[1] < 0.5


def test_token_jaccard_spark(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"]), (["a"], ["a"])], "ta array<string>, tb array<string>"
    )
    out = df.select(simfns.token_jaccard("ta", "tb").alias("j")).collect()
    assert out[0]["j"] == pytest.approx(2 / 4)
    assert out[1]["j"] == pytest.approx(1.0)
