from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from avro_diff_spark.functions import text as TX


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_norm_and_tokens(spark):
    df = spark.createDataFrame([("  Hello   WORLD \t x ",)], "t string")
    r = df.select(
        TX.norm_text(F.col("t")).alias("n"),
        TX.tokens_ws(F.col("t")).alias("tok"),
        TX.token_count_bpe(F.col("t")).alias("bpe"),
    ).collect()[0]
    assert r["n"] == "hello world x"
    assert r["tok"] == ["hello", "world", "x"]
    assert r["bpe"] == 3


def test_char_shingles_short_string_empty(spark):
    df = spark.createDataFrame([("abc",), ("abcdef",)], "t string")
    rows = df.select(TX.char_shingles(F.col("t"), 5).alias("sh")).collect()
    assert rows[0]["sh"] == []  # len 3 < k=5 → empty, NOT a descending-sequence artifact
    assert rows[1]["sh"] == ["abcde", "bcdef"]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    assert df.select(TX.word_shingles(F.col("t"), 3).alias("s")).collect()[0]["s"] == [
        "a b c",
        "b c d",
    ]


def test_hash32_matches_python_md5(spark):
    df = spark.createDataFrame([("hello",)], "t string")
    got = df.select(TX.hash32(F.col("t")).alias("h")).collect()[0]["h"]
    exp = int(hashlib.md5(b"hello").hexdigest()[:8], 16)
    assert got == exp


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),
            ("der hund und die katze ist nicht da",),
            ("el perro y la casa de la madre",),
            ("zzz qqq www",),
        ],
        "t string",
    )
    got = [r["l"] for r in df.select(TX.lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "es", "und"]


def test_quality_score_bounds_and_monotonicity(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qs = d.select(TX.quality_score(F.col("text")).alias("q"))
    lo, hi = qs.agg(F.min("q"), F.max("q")).collect()[0]
    assert 0.0 <= lo <= hi <= 1.0
    junk = spark.createDataFrame([("!!! ### $$$ %%% ^^^ &&& *** ((( )))",)], "t string")
    prose = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog and runs into the green field again",)],
        "t string",
    )
    qj = junk.select(TX.quality_score(F.col("t")).alias("q")).collect()[0]["q"]
    qp = prose.select(TX.quality_score(F.col("t")).alias("q")).collect()[0]["q"]
    assert qp > qj


def test_rolling_hash_known_value(spark):
    from avro_diff_spark.functions.text import rolling_hash
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("abc",), ("",)], "t string")
    got = [r["h"] for r in df.select(rolling_hash(F.col("t")).alias("h")).collect()]
    # ((0*31+97)*31+98)*31+99 = 96354; empty text folds to the init 0
    assert got == [96354, 0]


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing guarantee: docs sharing a substring of length >= w+k-1
    share at least one selected fingerprint (k=5, w=8 -> 12 chars)."""
    from pyspark.sql import functions as F

    shared = "abcdefghijklmnop"  # 16 chars > 12
    rows = [
        (1, "xxxx " + shared + " yyyy"),
        (2, "zz " + shared + " qqqq rrrr"),
        (3, "completely different words here entirely"),
        (4, "abc"),  # shorter than k: no k-grams, no fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    staged = df.select(
        "doc_id", TX.char_codes(F.col("text")).alias("c")
    ).select("doc_id", TX.winnow_hashes(F.col("c"), k=5, w=8).alias("fps"))
    fps = {r.doc_id: set(r.fps) for r in staged.collect()}
    assert fps[1] & fps[2], "shared 16-char substring must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert fps[4] == set()
    # selection is a subsample: strictly fewer fingerprints than k-grams
    n_grams_1 = len(rows[0][1]) - 4
    assert 0 < len(fps[1]) < n_grams_1


def test_winnow_short_doc_one_window(spark):
    """Docs with >=1 k-gram but fewer than w of them still fingerprint
    (single window over all grams)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "abcdefg")], "doc_id: long, text: string")  # 3 5-grams
    out = df.select(TX.char_codes(F.col("text")).alias("c")).select(
        TX.winnow_hashes(F.col("c"), k=5, w=8).alias("fps")
    ).first()
    assert len(out.fps) == 1


def test_nfc_merges_composed_and_decomposed(spark):
    from avro_diff_spark.functions.text import fingerprint_md5_nfc, nfc

    composed = "café señor"
    decomposed = "café señor"
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, "plain ascii"), (4, None)],
        "i long, t string",
    )
    rows = {r.i: (r.n, r.fp) for r in df.select(
        "i", nfc(F.col("t")).alias("n"), fingerprint_md5_nfc(F.col("t")).alias("fp")
    ).collect()}
    assert rows[1][0] == rows[2][0] == composed   # both normalize to composed
    assert rows[1][1] == rows[2][1]               # fingerprints merge
    assert rows[3][0] == "plain ascii"            # ASCII fast path: unchanged
    assert rows[4] == (None, None)                # NULL passes through


def test_nfc_matches_duckdb_utf8proc(spark):
    """CPython unicodedata and DuckDB utf8proc implement the same UCD
    tables — pin them equal over a spread of scripts and edge forms."""
    import duckdb

    from avro_diff_spark.functions.text import nfc

    samples = [
        "café", "café", "Ångström", "Å",  # Å forms
        "가", "가",  # Hangul syllable vs jamo
        "nöel", "ﬁsh",  # ö, fi-ligature (NFC keeps ligature)
        "ascii only", "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = sorted(r.n for r in df.select(nfc(F.col("t")).alias("n")).collect())
    want = sorted(
        r[0]
        for r in duckdb.connect().execute(
            "SELECT nfc_normalize(t) FROM (VALUES "
            + ", ".join("(?)" for _ in samples)
            + ") AS v(t)",
            samples,
        ).fetchall()
    )
    assert got == want


def test_dedup_paragraphs_keeps_first_occurrence_order(spark):
    from avro_diff_spark.functions.text import dedup_paragraphs

    cases = [
        ("a\n\nb\n\na\n\nc\n\nb", "a\n\nb\n\nc"),
        ("x", "x"),
        ("a\n\na\n\na", "a"),
        ("", ""),
        ("p\n\n\n\np", "p\n\n"),  # empty paragraph survives once
    ]
    df = spark.createDataFrame(cases, "t string, want string")
    rows = df.select("want", dedup_paragraphs(F.col("t")).alias("got")).collect()
    assert all(r.got == r.want for r in rows), [
        (r.want, r.got) for r in rows if r.got != r.want
    ]
