"""Text-analysis expression tests (training-data-pipeline extensions)."""

from pyspark.sql import functions as F

from educational_vector_database_spark.functions import text as T


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "text: string").select(expr.alias("v")).head().v


def test_token_count(spark):
    assert _one(spark, "a b  c", T.token_count("text")) == 3
    assert _one(spark, "", T.token_count("text")) == 0
    assert _one(spark, "   ", T.token_count("text")) == 0


def test_bpe_ish_token_count(spark):
    assert _one(spark, "hello, world42!", T.bpe_ish_token_count("text")) == 5


def test_alpha_ratio(spark):
    assert _one(spark, "abcd", T.alpha_ratio("text")) == 1.0
    assert _one(spark, "ab12", T.alpha_ratio("text")) == 0.5
    assert _one(spark, "", T.alpha_ratio("text")) == 0.0


def test_stopword_and_quality(spark):
    assert _one(spark, "the cat", T.stopword_ratio("text")) == 0.5
    q = _one(spark, "the quick brown fox jumps over the lazy dog " * 3, T.quality_score("text"))
    assert 0.0 < q <= 1.0


def test_lang_id(spark):
    assert _one(spark, "the cat and the hat is here", T.lang_id("text")) == "en"
    assert _one(spark, "el perro y la casa es grande que", T.lang_id("text")) == "es"
    assert _one(spark, "zzz qqq xxx", T.lang_id("text")) == "und"


def test_fingerprint_stable_and_distinct(spark):
    df = spark.createDataFrame([("aaa",), ("aaa",), ("bbb",)], "text: string")
    vals = [r.v for r in df.select(T.fingerprint64("text").alias("v")).collect()]
    assert vals[0] == vals[1] != vals[2]
    assert all(isinstance(v, int) for v in vals)


def test_shingles_and_ngrams(spark):
    sh = _one(spark, "Hello, World", T.char_shingles("text", 5))
    assert "hello" in sh and all(len(s) == 5 for s in sh if len(s) == 5)
    ng = _one(spark, "a b c d", T.word_ngrams("text", 2))
    assert ng == ["a b", "b c", "c d"]


def test_word_ngrams_all_keeps_multiplicities(spark):
    # the repetition-quality signals need every occurrence; the set variant
    # would collapse "a b" to one entry and hide the repetition
    ng = _one(spark, "a b a b a", T.word_ngrams_all("text", 2))
    assert ng == ["a b", "b a", "a b", "b a"]
    assert sorted(set(ng)) == _one(spark, "a b a b a", T.word_ngrams("text", 2))


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id: long, text: string",
    )
    vals = {r.doc_id: r.v for r in
            df.select("doc_id", T.rolling_fingerprint("text").alias("v")).collect()}
    assert vals[1] == vals[3]          # deterministic
    assert vals[1] != vals[2]          # ORDER matters (set fingerprint would tie)
    assert 0 <= vals[1] < T.ROLLING_P


def test_rolling_fingerprint_matches_python_model(spark):
    import hashlib

    text = "The quick Brown fox!"
    norm = "the quick brown fox"
    acc = 0
    for tok in norm.split(" "):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % (1 << 30)
        acc = (acc * T.ROLLING_B + h) % T.ROLLING_P
    got = _one(spark, text, T.rolling_fingerprint("text"))
    assert got == acc
