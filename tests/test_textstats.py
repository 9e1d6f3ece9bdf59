"""Text-analysis operator semantics on crafted docs with known statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.functions.text import EN_STOPWORDS, tokens


def test_token_count_and_empties(spark):
    df = spark.createDataFrame(
        [(0, "one two  three"), (1, "   "), (2, ""), (3, "single")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", F.size(tokens(F.col("text"))).alias("n")).collect()}
    assert got == {0: 3, 1: 0, 2: 0, 3: 1}


def test_stopword_ratio(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog"), (1, "cat dog bird"), (2, "")], ["doc_id", "text"]
    )
    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks)
    r = F.size(F.filter(toks, lambda w: F.array_contains(sw, F.lower(w))))
    got = {
        row["doc_id"]: row["ratio"]
        for row in df.select(
            "doc_id",
            F.when(n > 0, r.cast("double") / n).otherwise(F.lit(0.0)).alias("ratio"),
        ).collect()
    }
    assert got[0] == 3 / 5  # the, and, the
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_lang_id_heuristic_on_real_english(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog in the morning"),
            (1, "zork blarg quux flimflam jabberwock vorpal snicker snack"),
        ],
        ["doc_id", "text"],
    )
    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks)
    ratio = F.size(F.filter(toks, lambda w: F.array_contains(sw, F.lower(w)))).cast("double") / n
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id",
            F.when((n > 0) & (ratio >= 0.05), F.lit("en")).otherwise(F.lit("und")).alias("lang"),
        ).collect()
    }
    assert got == {0: "en", 1: "und"}


def test_fingerprint_identical_for_identical_content(spark):
    from streamds_spark.functions.hashing import md5_int60
    from streamds_spark.functions.text import shingles_expr

    df = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "a b c d e f g"), (2, "h i j k l m n")], ["doc_id", "text"]
    )
    fp = (
        df.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(shingles_expr("toks", 4)).alias("g"))
        .groupBy("doc_id")
        .agg(F.min(md5_int60(F.col("g"))).alias("fp"))
        .collect()
    )
    fps = {r["doc_id"]: r["fp"] for r in fp}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_registered_textstats_queries_run(spark):
    from streamds_spark.registry import load_all

    specs = load_all()
    sf = "/root/testdata/sf0.001"
    assert specs["text_token_count"].fn(spark, sf).count() == 500
    q = specs["text_quality_score"].fn(spark, sf)
    rows = q.collect()
    assert all(0.0 <= r["stopword_ratio"] <= 1.0 for r in rows)
    langs = {r["detected_lang"] for r in specs["text_lang_id"].fn(spark, sf).collect()}
    assert langs <= {"en", "und"}


def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing theorem (Schleimer et al. §2): two documents sharing a
    substring of at least w+k-1 tokens MUST share at least one fingerprint,
    while fully-disjoint vocabularies share none."""
    from streamds_spark.queries.llmdata.textstats import WINNOW_K, WINNOW_W
    from pyspark.sql import Window, functions as F
    from streamds_spark.functions.text import tokens

    shared = "orange banana cherry mango papaya kiwi lemon lime guava plum"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"zeta eta theta {shared} iota"),
            (3, "one two three four five six seven eight nine ten eleven twelve"),
        ],
        ["doc_id", "text"],
    )
    k, w = WINNOW_K, WINNOW_W
    sh = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(tokens(F.col("text"))) - k + 1),
                lambda i: F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                " ",
                                F.element_at(tokens(F.col("text")), i),
                                F.element_at(tokens(F.col("text")), i + 1),
                            )
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("bigint"),
            )
        ).alias("pos", "hv"),
    )
    byname = Window.partitionBy("doc_id")
    sliding = byname.orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    fps = (
        sh.withColumn("n", F.max("pos").over(byname))
        .withColumn("fp", F.min("hv").over(sliding))
        .filter(F.col("pos") <= F.col("n") - w + 1)
        .select("doc_id", "fp")
        .collect()
    )
    sets = {}
    for r in fps:
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    assert sets[1] & sets[2], "docs sharing a 10-token substring must share a fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
