"""2.J similarity search over embeddings (SURVEY §2.J).

Embeddings are L2-normalized (FIXTURES.md), so dot product == cosine.
Scores are computed as a sequential double fold over the 64 elements
with per-element double casts — bit-identical across engines — then
rounded to 6 dp, and every ranking tiebreaks on vec_id, so top-k sets
are deterministic.

Scale design: `sim_search_topk` is the O(probes × corpus) brute-force
correctness anchor (probes broadcast; fine for a handful of probes,
wrong shape for all-pairs). `sim_search_blocked` is the scale path:
random-hyperplane LSH buckets + exact re-rank inside buckets — the
corpus-side work is one narrow projection + bucket shuffle, no
crossJoin anywhere.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register, table

N_PROBES = 20  # probe set: vec_id < 20
TOP_K = 5

SQL_DOT = """
    round(list_aggregate(list_transform(list_zip({a}, {b}),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum'), 6)
"""


def dot6(a, b):
    """Rounded-to-6dp cosine/dot of two float-array columns."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


TOPK_SQL = f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_PROBES}),
    c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
    s AS (
      SELECT q_id, c_id, {SQL_DOT.format(a='q_emb', b='c_emb')} AS score
      FROM q, c WHERE q_id <> c_id
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank
          FROM s)
    SELECT q_id, c_id, score, rank FROM r WHERE rank <= {TOP_K}
"""


@register("sim_search_topk", oracle=TOPK_SQL)
def sim_search_topk(spark, sf_dir):
    """Brute-force cosine top-k: the exact baseline the blocked variant
    is property-tested against."""
    em = table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = em.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"))
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", dot6(F.col("q_emb"), F.col("c_emb")).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


N_PLANES = 16
LSH_BANDS = 4  # 4 bands x 4 bits


def _hyperplanes():
    """Deterministic random hyperplanes (seeded; public knowledge —
    Charikar random-projection LSH)."""
    rng = random.Random(42)
    return [[rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(N_PLANES)]


def lsh_bands(df, emb_col="embedding"):
    """Add (band, band_key) rows: 4 bands of 4 sign bits each."""
    planes = _hyperplanes()
    bits = [
        (dot6(F.col(emb_col), F.array(*[F.lit(v) for v in plane])) > 0).cast("int")
        for plane in planes
    ]
    band_keys = []
    for b in range(LSH_BANDS):
        key = F.lit(0)
        for j in range(4):
            key = key * 2 + bits[b * 4 + j]
        band_keys.append(key)
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_keys[b].alias("band_key"))
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("*", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")).drop("bk")


@register("sim_search_blocked")  # rows-only: LSH candidate set is impl-defined
def sim_search_blocked(spark, sf_dir):
    """ANN via random-hyperplane LSH: candidates = any shared band,
    exact re-rank within candidates. Recall vs the brute anchor is
    property-tested in tests/test_llm_ops.py."""
    em = table(spark, sf_dir, "embeddings")
    q = lsh_bands(
        em.filter(F.col("vec_id") < N_PROBES).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        ),
        "q_emb",
    )
    c = lsh_bands(
        em.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")),
        "c_emb",
    )
    cands = (
        q.join(c, ["band", "band_key"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_emb", "c_id", "c_emb")
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        cands.select(
            "q_id", "c_id", dot6(F.col("q_emb"), F.col("c_emb")).alias("score")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


NEARDUP_THRESHOLD = 0.40


@register(
    "embed_cosine_neardup",
    oracle=f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {SQL_DOT.format(a='a.embedding', b='b.embedding')} AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {SQL_DOT.format(a='a.embedding', b='b.embedding')} >= {NEARDUP_THRESHOLD}
    """,
)
def embed_cosine_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (all-pairs exact form —
    the oracle-checkable anchor; the LSH-blocked path is
    sim_search_blocked). Threshold 0.40 is data-calibrated: max
    pairwise cosine in the testdata is ~0.51."""
    em = table(spark, sf_dir, "embeddings")
    a = em.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = em.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", dot6(F.col("ea"), F.col("eb")).alias("cosine"))
        .filter(F.col("cosine") >= NEARDUP_THRESHOLD)
    )


@register(
    "knn_label_vote",
    oracle=f"""
        WITH r AS ({TOPK_SQL}),
        votes AS (
          SELECT r.q_id, e.label, count(*) AS votes
          FROM r JOIN embeddings e ON r.c_id = e.vec_id
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT q_id, label, votes,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY votes DESC, label) AS rn
          FROM votes
        )
        SELECT q_id, label AS predicted_label, votes FROM ranked WHERE rn = 1
    """,
)
def knn_label_vote(spark, sf_dir):
    """k-NN majority label among the top-k cosine neighbors; ties break
    to the smallest label."""
    em = table(spark, sf_dir, "embeddings")
    topk = sim_search_topk.__wrapped__(spark, sf_dir) if hasattr(sim_search_topk, "__wrapped__") else sim_search_topk(spark, sf_dir)
    labels = em.select(F.col("vec_id").alias("c_id"), "label")
    votes = (
        topk.join(F.broadcast(labels), "c_id")
        .groupBy("q_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("votes"), F.asc("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("q_id", F.col("label").alias("predicted_label"), "votes")
    )
