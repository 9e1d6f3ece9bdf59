r"""CCNet-style perplexity filtering: an interpolated Kneser-Ney bigram LM
trained on a trusted reference slice of the corpus, scoring every document.

Wenzek et al. 2020 (CCNet) rank web documents by perplexity under a KenLM
trained on Wikipedia and keep the low-perplexity head/middle; here the
"trusted" slice is the corpus's alphabetically-first source (deterministic in
both engines) and the model is the interpolated-KN bigram from
operators/ngram_lm.py — the same train-on-reference / score-everything shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.operators.ngram_lm import (
    doc_bigrams,
    doc_trigrams,
    kn3_doc_nll,
    kn3_score_trigrams,
    kn_bigram_model,
    kn_doc_nll,
    kn_score_bigrams,
    kn_trigram_model,
)
from streamds_spark.registry import query


@query(
    "kn_perplexity_filter",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    big AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
               unnest(list_transform(range(2, len(t) + 1), i -> t[i])) AS w2
        FROM toks WHERE len(t) >= 2
    ),
    pair AS (
        SELECT w1 AS b1, w2 AS b2, count(*) AS c2 FROM big
        WHERE source = (SELECT min(source) FROM documents)
        GROUP BY w1, w2
    ),
    lft AS (
        SELECT b1 AS u1, CAST(sum(c2) AS DOUBLE) AS c1,
               CAST(count(*) AS DOUBLE) AS n1f
        FROM pair GROUP BY b1
    ),
    rgt AS (
        SELECT b2 AS v2, CAST(count(*) AS DOUBLE) AS n1b FROM pair GROUP BY b2
    ),
    tot AS (SELECT CAST(sum(n1b) AS DOUBLE) AS bt FROM rgt),
    sc AS (
        SELECT doc_id,
               greatest(
                   CASE WHEN c1 IS NOT NULL THEN
                       greatest(CAST(COALESCE(c2, 0) AS DOUBLE)
                                - CAST(0.75 AS DOUBLE), 0.0) / c1
                       + CAST(0.75 AS DOUBLE) * n1f / c1
                         * (COALESCE(n1b, 0.0) / bt)
                   ELSE COALESCE(n1b, 0.0) / bt END,
                   1e-10) AS p
        FROM big
        LEFT JOIN pair ON w1 = b1 AND w2 = b2
        LEFT JOIN lft ON w1 = u1
        LEFT JOIN rgt ON w2 = v2
        CROSS JOIN tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-avg(ln(p)), 4) + 0.0 AS avg_nll
    FROM sc GROUP BY doc_id
    """,
)
def kn_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-likelihood under an interpolated
    Kneser-Ney bigram LM trained on the alphabetically-first source
    (doc_id, n_bigrams, avg_nll); rank/threshold on avg_nll to filter.

    Plan: one bigram explode shared by train and score branches; training is
    two vocabulary-sized partial aggs of the pair-count table; scoring is
    three left joins shuffling on w1/w2 (Zipf skew AQE-splittable; model
    tables deliberately NOT broadcast — web-scale bigram vocabs are too big)
    plus a broadcast 1-row N1+(**) total. The reference-source selector is a
    broadcast 1-row min(source) join, not a collect. No UDFs; docs with <2
    tokens are absent from the output by contract."""
    docs = load_table(spark, sf_dir, "documents")
    big = doc_bigrams(docs, keep=("doc_id", "source"))
    ref = docs.agg(F.min("source").alias("ref_src"))
    train = big.crossJoin(F.broadcast(ref)).filter(
        F.col("source") == F.col("ref_src")
    )
    model = kn_bigram_model(train.select("w1", "w2"))
    scored = kn_score_bigrams(big.select("doc_id", "w1", "w2"), model)
    # round(.,4)+0.0 lives HERE (oracle-parity normalization), not in the
    # operator — kn_doc_nll keeps full precision for real ranking use
    return kn_doc_nll(scored).withColumn(
        "avg_nll", F.round("avg_nll", 4) + F.lit(0.0)
    )


@query(
    "kn3_perplexity_filter",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    tri AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(t) - 1), i -> t[i])) AS w1,
               unnest(list_transform(range(2, len(t)), i -> t[i])) AS w2,
               unnest(list_transform(range(3, len(t) + 1), i -> t[i])) AS w3
        FROM toks WHERE len(t) >= 3
    ),
    tcnt AS (
        SELECT w1 AS a1, w2 AS a2, w3 AS a3, count(*) AS c3 FROM tri
        WHERE source = (SELECT min(source) FROM documents)
        GROUP BY w1, w2, w3
    ),
    ctx AS (
        SELECT a1 AS x1, a2 AS x2, CAST(sum(c3) AS DOUBLE) AS cx,
               CAST(count(*) AS DOUBLE) AS n3f
        FROM tcnt GROUP BY a1, a2
    ),
    cont2 AS (
        SELECT a2 AS y2, a3 AS y3, CAST(count(*) AS DOUBLE) AS cc2
        FROM tcnt GROUP BY a2, a3
    ),
    ctx2 AS (
        SELECT y2 AS z2, CAST(sum(cc2) AS DOUBLE) AS ccz,
               CAST(count(*) AS DOUBLE) AS n2f
        FROM cont2 GROUP BY y2
    ),
    cont1 AS (
        SELECT y3 AS v3, CAST(count(*) AS DOUBLE) AS n1b FROM cont2 GROUP BY y3
    ),
    tot AS (SELECT CAST(sum(n1b) AS DOUBLE) AS bt FROM cont1),
    joined AS (
        SELECT doc_id, c3, cx, n3f, cc2, ccz, n2f, n1b, bt
        FROM tri
        LEFT JOIN tcnt ON w1 = a1 AND w2 = a2 AND w3 = a3
        LEFT JOIN ctx ON w1 = x1 AND w2 = x2
        LEFT JOIN cont2 ON w2 = y2 AND w3 = y3
        LEFT JOIN ctx2 ON w2 = z2
        LEFT JOIN cont1 ON w3 = v3
        CROSS JOIN tot
    ),
    sp1 AS (SELECT *, COALESCE(n1b, 0.0) / bt AS p1 FROM joined),
    sp2 AS (
        SELECT *, CASE WHEN ccz IS NOT NULL THEN
                   greatest(COALESCE(cc2, 0.0) - CAST(0.75 AS DOUBLE), 0.0)
                       / ccz
                   + CAST(0.75 AS DOUBLE) * n2f / ccz * p1
               ELSE p1 END AS p2
        FROM sp1
    ),
    sc AS (
        SELECT doc_id, greatest(
            CASE WHEN cx IS NOT NULL THEN
                greatest(CAST(COALESCE(c3, 0) AS DOUBLE)
                         - CAST(0.75 AS DOUBLE), 0.0) / cx
                + CAST(0.75 AS DOUBLE) * n3f / cx * p2
            ELSE p2 END,
            1e-10) AS p
        FROM sp2
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
           round(-avg(ln(p)), 4) + 0.0 AS avg_nll
    FROM sc GROUP BY doc_id
    """,
)
def kn3_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bigram filter upgraded to interpolated Kneser-Ney TRIGRAMS with
    bigram→unigram continuation backoff (real CCNet-style filters run 5-gram
    KenLM; each extra order is one more count-table rollup of this exact
    shape). (doc_id, n_trigrams, avg_nll); docs with <3 tokens absent.

    Plan: one trigram explode shared by train and score branches; training is
    FOUR vocabulary-sized rollups chained off the trigram-type table (two
    lazy-localCheckpointed fan-out points: tri feeds ctx/cont2/score, cont2
    feeds ctx2/cont1/score); scoring is five left equi-joins shuffling on
    word keys — model tables deliberately NOT broadcast — plus the broadcast
    1-row total. No UDFs anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    tri = doc_trigrams(docs, keep=("doc_id", "source"))
    ref = docs.agg(F.min("source").alias("ref_src"))
    train = tri.crossJoin(F.broadcast(ref)).filter(
        F.col("source") == F.col("ref_src")
    )
    model = kn_trigram_model(train.select("w1", "w2", "w3"))
    scored = kn3_score_trigrams(tri.select("doc_id", "w1", "w2", "w3"), model)
    return kn3_doc_nll(scored).withColumn(
        "avg_nll", F.round("avg_nll", 4) + F.lit(0.0)
    )


@query(
    "kn_ppl_buckets",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    big AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
               unnest(list_transform(range(2, len(t) + 1), i -> t[i])) AS w2
        FROM toks WHERE len(t) >= 2
    ),
    pair AS (
        SELECT w1 AS b1, w2 AS b2, count(*) AS c2 FROM big
        WHERE source = (SELECT min(source) FROM documents)
        GROUP BY w1, w2
    ),
    lft AS (
        SELECT b1 AS u1, CAST(sum(c2) AS DOUBLE) AS c1,
               CAST(count(*) AS DOUBLE) AS n1f
        FROM pair GROUP BY b1
    ),
    rgt AS (
        SELECT b2 AS v2, CAST(count(*) AS DOUBLE) AS n1b FROM pair GROUP BY b2
    ),
    tot AS (SELECT CAST(sum(n1b) AS DOUBLE) AS bt FROM rgt),
    sc AS (
        SELECT doc_id, source,
               greatest(
                   CASE WHEN c1 IS NOT NULL THEN
                       greatest(CAST(COALESCE(c2, 0) AS DOUBLE)
                                - CAST(0.75 AS DOUBLE), 0.0) / c1
                       + CAST(0.75 AS DOUBLE) * n1f / c1
                         * (COALESCE(n1b, 0.0) / bt)
                   ELSE COALESCE(n1b, 0.0) / bt END,
                   1e-10) AS p
        FROM big
        LEFT JOIN pair ON w1 = b1 AND w2 = b2
        LEFT JOIN lft ON w1 = u1
        LEFT JOIN rgt ON w2 = v2
        CROSS JOIN tot
    ),
    perdoc AS (
        SELECT doc_id, source, round(-avg(ln(p)), 4) + 0.0 AS avg_nll
        FROM sc GROUP BY doc_id, source
    ),
    lab AS (
        SELECT source, avg_nll,
               ntile(3) OVER (PARTITION BY source ORDER BY avg_nll, doc_id)
                   AS bucket
        FROM perdoc
    )
    SELECT source, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(avg_nll), 4) + 0.0 AS min_nll,
           round(max(avg_nll), 4) + 0.0 AS max_nll
    FROM lab GROUP BY source, bucket
    """,
)
def kn_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's published output shape: per source, split documents into
    head/middle/tail terciles of KN perplexity (bucket 1 = head = lowest
    NLL = most reference-like) and summarize each bucket
    (source, bucket, n_docs, min_nll, max_nll) — the dial a corpus curator
    reads to pick a per-source keep fraction.

    Plan: the same train+score pipeline as kn_perplexity_filter, then a
    SOURCE-partitioned ntile (the repo's accepted window shape — never a
    global window; CCNet itself buckets per language) over the ROUNDED
    per-doc score so both engines sort identical keys, and a ≤3·n_sources
    row summary. At 100 TB the per-source window is the one sort that
    matters; a production curator would swap it for sampled tercile
    thresholds, which changes no other stage."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    big = doc_bigrams(docs, keep=("doc_id", "source"))
    ref = docs.agg(F.min("source").alias("ref_src"))
    train = big.crossJoin(F.broadcast(ref)).filter(
        F.col("source") == F.col("ref_src")
    )
    model = kn_bigram_model(train.select("w1", "w2"))
    scored = kn_score_bigrams(big.select("doc_id", "source", "w1", "w2"), model)
    perdoc = scored.groupBy("doc_id", "source").agg(
        (F.round(-F.avg(F.log("p")), 4) + F.lit(0.0)).alias("avg_nll")
    )
    w = W.partitionBy("source").orderBy("avg_nll", "doc_id")
    lab = perdoc.select("source", "avg_nll", F.ntile(3).over(w).alias("bucket"))
    return lab.groupBy("source", "bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.round(F.min("avg_nll"), 4) + F.lit(0.0)).alias("min_nll"),
        (F.round(F.max("avg_nll"), 4) + F.lit(0.0)).alias("max_nll"),
    )


def _kn_ngram_oracle(order: int, discount: float = 0.75) -> str:
    """Generate the DuckDB twin of the generic order-n KN pipeline — the
    same CTE chain the hand-written bigram/trigram oracles above instantiate,
    emitted for any order (the Spark side is kn_ngram_model/kn_ngram_score,
    proven bit-identical to the hand-written models at orders 2 and 3 by
    tests/test_ngram_lm.py)."""
    n = order
    d = f"CAST({discount} AS DOUBLE)"
    grams = ",\n               ".join(
        f"unnest(list_transform(range({k}, len(t) + {k - n + 1}), i -> t[i])) AS w{k}"
        for k in range(1, n + 1)
    )
    parts = [
        r"""WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    )""",
        f"""gram AS (
        SELECT doc_id, source,
               {grams}
        FROM toks WHERE len(t) >= {n}
    )""",
    ]
    top_keys = ", ".join(f"w{i} AS g{n}_{i}" for i in range(1, n + 1))
    parts.append(
        f"""lvl{n} AS (
        SELECT {top_keys}, count(*) AS c{n} FROM gram
        WHERE source = (SELECT min(source) FROM documents)
        GROUP BY {", ".join(f"w{i}" for i in range(1, n + 1))}
    )"""
    )
    for k in range(n - 1, 0, -1):
        keys = ", ".join(f"g{k + 1}_{i + 2} AS g{k}_{i + 1}" for i in range(k))
        grp = ", ".join(f"g{k + 1}_{i + 2}" for i in range(k))
        parts.append(
            f"""lvl{k} AS (
        SELECT {keys}, CAST(count(*) AS DOUBLE) AS c{k}
        FROM lvl{k + 1} GROUP BY {grp}
    )"""
        )
    for k in range(n, 1, -1):
        keys = ", ".join(f"g{k}_{i + 1} AS x{k}_{i + 1}" for i in range(k - 1))
        grp = ", ".join(f"g{k}_{i + 1}" for i in range(k - 1))
        parts.append(
            f"""ctx{k} AS (
        SELECT {keys}, CAST(sum(c{k}) AS DOUBLE) AS t{k},
               CAST(count(*) AS DOUBLE) AS y{k}
        FROM lvl{k} GROUP BY {grp}
    )"""
        )
    parts.append(f"tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS bt FROM lvl1)")
    joins = []
    for k in range(n, 0, -1):
        on = " AND ".join(
            f"w{n - k + i + 1} = g{k}_{i + 1}" for i in range(k)
        )
        joins.append(f"LEFT JOIN lvl{k} ON {on}")
    for k in range(n, 1, -1):
        on = " AND ".join(
            f"w{n - k + i + 1} = x{k}_{i + 1}" for i in range(k - 1)
        )
        joins.append(f"LEFT JOIN ctx{k} ON {on}")
    cols = ", ".join(
        [f"CAST(c{n} AS DOUBLE) AS c{n}"]
        + [f"c{k}" for k in range(n - 1, 0, -1)]
        + [f"t{k}, y{k}" for k in range(n, 1, -1)]
    )
    parts.append(
        f"""joined AS (
        SELECT doc_id, {cols}, bt
        FROM gram
        {chr(10).join("        " + j for j in joins)}
        CROSS JOIN tot
    )"""
    )
    parts.append("sp1 AS (SELECT *, COALESCE(c1, 0.0) / bt AS p1 FROM joined)")
    for k in range(2, n + 1):
        parts.append(
            f"""sp{k} AS (
        SELECT *, CASE WHEN t{k} IS NOT NULL THEN
                   greatest(COALESCE(c{k}, 0.0) - {d}, 0.0) / t{k}
                   + {d} * y{k} / t{k} * p{k - 1}
               ELSE p{k - 1} END AS p{k}
        FROM sp{k - 1}
    )"""
        )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
           round(-avg(ln(greatest(p{n}, 1e-10))), 4) + 0.0 AS avg_nll
    FROM sp{n} GROUP BY doc_id
    """
    )


@query("kn5_perplexity_filter", oracle=_kn_ngram_oracle(5))
def kn5_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full CCNet dial: 5-gram interpolated Kneser-Ney (what production
    KenLM filters actually run), built by the GENERIC order-n construction
    (operators/ngram_lm.kn_ngram_model — one recursion replacing the
    hand-written bigram/trigram models, proven bit-identical to them at
    orders 2/3). (doc_id, n_ngrams, avg_nll); docs with <5 tokens absent.

    Plan: one 5-gram explode shared by train/score; training is EIGHT
    vocabulary-sized rollups (lvl5→lvl1 continuation chain + ctx5..ctx2),
    each lazily checkpointed at its fan-out; scoring is nine left
    equi-joins shuffled on word keys (no model broadcast) + the 1-row
    total. The DuckDB twin is GENERATED by the same recursion
    (_kn_ngram_oracle), so Spark and oracle stay structurally in lockstep
    at any order. No UDFs anywhere."""
    from streamds_spark.operators.ngram_lm import (
        doc_ngrams,
        kn_ngram_doc_nll,
        kn_ngram_model,
        kn_ngram_score,
    )

    order = 5
    docs = load_table(spark, sf_dir, "documents")
    grams = doc_ngrams(docs, order, keep=("doc_id", "source"))
    ref = docs.agg(F.min("source").alias("ref_src"))
    train = grams.crossJoin(F.broadcast(ref)).filter(
        F.col("source") == F.col("ref_src")
    )
    model = kn_ngram_model(
        train.select(*[f"w{i}" for i in range(1, order + 1)]), order
    )
    scored = kn_ngram_score(
        grams.select("doc_id", *[f"w{i}" for i in range(1, order + 1)]),
        model,
        order,
    )
    return kn_ngram_doc_nll(scored).withColumn(
        "avg_nll", F.round("avg_nll", 4) + F.lit(0.0)
    )
