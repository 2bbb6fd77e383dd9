"""Model-eval metrics and embedding diagnostics (SURVEY §2.L).

Split out of similarity.py (round 7, the same zero-behavior-change
discipline as the round-6 aggregates split): the ml_* evaluation
metrics (confusion/AUC/calibration/lift/CV/ranking/agreement/drift)
and the embedding-quality diagnostics (procrustes, isotropy, norm
outliers, dim variance, matryoshka recall). Shared ANN anchors
(sim_search_topk, knn_label_vote) and their SQL fragments import from
.similarity.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolved by pandas_udf type-hint inspection

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register, table
from .similarity import N_PROBES, TOPK_SQL, TOP_K, knn_label_vote, sim_search_topk

@register(
    "ml_confusion_matrix",
    oracle=f"""
        WITH r AS ({TOPK_SQL}),
        votes AS (
          SELECT r.q_id, e.label, count(*) AS votes
          FROM r JOIN embeddings e ON r.c_id = e.vec_id
          GROUP BY 1, 2
        ),
        pred AS (
          SELECT q_id, label AS predicted FROM (
            SELECT q_id, label,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY votes DESC, label) AS rn
            FROM votes
          ) WHERE rn = 1
        ),
        pairs AS (
          SELECT p.q_id, p.predicted, e.label AS truth
          FROM pred p JOIN embeddings e ON p.q_id = e.vec_id
        ),
        labs AS (
          SELECT DISTINCT predicted AS label FROM pairs
          UNION SELECT DISTINCT truth FROM pairs
        ),
        m AS (
          SELECT l.label,
                 CAST(count(*) FILTER (WHERE truth = l.label
                                         AND predicted = l.label) AS BIGINT) AS tp,
                 CAST(count(*) FILTER (WHERE predicted = l.label
                                         AND truth <> l.label) AS BIGINT) AS fp,
                 CAST(count(*) FILTER (WHERE truth = l.label
                                         AND predicted <> l.label) AS BIGINT) AS fn
          FROM labs l, pairs GROUP BY l.label
        )
        SELECT label, tp, fp, fn,
               CASE WHEN tp + fp = 0 THEN NULL
                    ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
               CASE WHEN tp + fn = 0 THEN NULL
                    ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
               CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                    ELSE round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6)
               END AS f1
        FROM m
    """,
)
def ml_confusion_matrix(spark, sf_dir):
    """Classifier evaluation over the k-NN predictor: per-label
    confusion counts (tp / fp / fn) and precision / recall / F1 —
    the ML-eval surface that turns the registered predictor into a
    measured one. Counts come from ONE conditional aggregate over the
    (probe, truth, predicted) pairs crossed with the (tiny) label
    universe; the three metrics are single identical-structure double
    expressions over exact integers, NULL-guarded for empty
    denominators the same way in both engines.

    Scale: the pair table is probe-sized (the predictor's output),
    the label universe is a broadcast dim, so evaluation cost is
    O(predictions), never O(corpus) — the standard eval-tier shape."""
    em = table(spark, sf_dir, "embeddings")
    pred = knn_label_vote(spark, sf_dir).select(
        "q_id", F.col("predicted_label").alias("predicted")
    )
    truth = em.select(F.col("vec_id").alias("q_id"), F.col("label").alias("truth"))
    # pairs is PROBE-sized and feeds three consumers (two label
    # projections + the cross join) — materialize it once so the whole
    # k-NN predictor subtree isn't planned and executed three times
    # (guide §3.3: truncate repeated big subtrees; optimization r13)
    pairs = pred.join(truth, "q_id").localCheckpoint(eager=True)
    labs = (
        pairs.select(F.col("predicted").alias("label"))
        .union(pairs.select(F.col("truth").alias("label")))
        .distinct()
    )
    m = (
        labs.crossJoin(pairs)
        .groupBy("label")
        .agg(
            F.count_if(
                (F.col("truth") == F.col("label"))
                & (F.col("predicted") == F.col("label"))
            ).alias("tp"),
            F.count_if(
                (F.col("predicted") == F.col("label"))
                & (F.col("truth") != F.col("label"))
            ).alias("fp"),
            F.count_if(
                (F.col("truth") == F.col("label"))
                & (F.col("predicted") != F.col("label"))
            ).alias("fn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return m.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.when(tp + fp == 0, F.lit(None))
        .otherwise(F.round(tp.cast("double") / (tp + fp), 6))
        .alias("precision"),
        F.when(tp + fn == 0, F.lit(None))
        .otherwise(F.round(tp.cast("double") / (tp + fn), 6))
        .alias("recall"),
        F.when(2 * tp + fp + fn == 0, F.lit(None))
        .otherwise(F.round((2 * tp).cast("double") / (2 * tp + fp + fn), 6))
        .alias("f1"),
    )


@register("embed_procrustes_align")  # rows-only: SVD basis signs are impl-defined
def embed_procrustes_align(spark, sf_dir):
    """Orthogonal Procrustes alignment of two embedding spaces — the
    standard recipe for reconciling embeddings from two model
    versions (or languages): given X and a target space Y (here a
    deterministic coordinate roll + sign-flip of X, so ground truth
    exists), recover R = argmin‖XR − Y‖F over orthogonal R via
    SVD(XᵀY) → R = UVᵀ. The d×d cross-Gram is accumulated
    DISTRIBUTED — one mapInPandas pass emits per-batch partial outer
    products (64×64 ≈ 32 KB each, the ml_logreg/pca partial-state
    shape), summed by a tiny keyed aggregate; only the 64×64 SVD runs
    on the driver (model-sized, the declared centroid/Gram
    precedent). Output: n_vectors and Frobenius alignment error
    before/after in 1e-6 units — after ≈ 0 proves the rotation was
    recovered. tests/test_llm_ops.py pins recovery and double-run
    determinism.

    Scale: one corpus scan, fixed d² state per task — alignment cost
    is independent of corpus size; at 100 TB you'd subsample anyway
    (Gram concentrates), which this shape makes trivial."""
    import numpy as np
    import pandas as pd

    em = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def partials(batches):
        for pdf in batches:
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            if len(X) == 0:
                continue
            # target space: roll coordinates by 7, flip sign of odd dims
            Y = np.roll(X, 7, axis=1)
            Y[:, 1::2] *= -1.0
            G = X.T @ Y  # d x d cross-Gram partial
            n = np.int64(len(X))
            bxx = float(np.sum(X * X))
            byy = float(np.sum(Y * Y))
            yield pd.DataFrame(
                {
                    "k": [0],
                    "n": [n],
                    "gram": [G.ravel().tolist()],
                    "xx": [bxx],
                    "yy": [byy],
                }
            )

    agg = (
        em.mapInPandas(
            partials, "k int, n long, gram array<double>, xx double, yy double"
        )
        .groupBy("k")
        .agg(
            F.sum("n").alias("n"),
            F.aggregate(
                F.collect_list("gram"),
                F.array_repeat(F.lit(0.0), 64 * 64),
                lambda acc, g: F.zip_with(acc, g, lambda a, b: a + b),
            ).alias("gram"),
            F.sum("xx").alias("xx"),
            F.sum("yy").alias("yy"),
        )
        .collect()[0]
    )
    import numpy as np

    G = np.array(agg["gram"]).reshape(64, 64)
    U, s, Vt = np.linalg.svd(G)
    R = U @ Vt
    # residual identity: ||XR - Y||^2 = ||X||^2 + ||Y||^2 - 2*tr(R^T G)
    before = agg["xx"] + agg["yy"] - 2.0 * float(np.trace(G))
    after = agg["xx"] + agg["yy"] - 2.0 * float(np.trace(R.T @ G))
    out = [
        (
            int(agg["n"]),
            int(round(1e6 * max(before, 0.0))),
            int(round(1e6 * max(after, 0.0))),
        )
    ]
    return table(spark, sf_dir, "embeddings").sparkSession.createDataFrame(
        out, "n_vectors long, frob2_before_u long, frob2_after_u long"
    )


@register(
    "ml_auc_roc",
    oracle="""
        WITH s AS (
          SELECT list_extract(embedding, 1) AS s,
                 CAST(label < 5 AS BIGINT) AS pos
          FROM embeddings
        ),
        g AS (
          SELECT s, count(*) AS n_g, CAST(sum(pos) AS BIGINT) AS np_g
          FROM s GROUP BY s
        ),
        c AS (
          SELECT n_g, np_g,
                 CAST(coalesce(sum(n_g) OVER (
                   ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS cum_b
          FROM g
        ),
        t AS (
          SELECT CAST(sum(np_g * (2 * cum_b + n_g + 1)) AS BIGINT) AS r2,
                 CAST(sum(np_g) AS BIGINT) AS np,
                 CAST(sum(n_g) AS BIGINT) AS n
          FROM c
        )
        SELECT np AS n_pos, n - np AS n_neg,
               r2 - np * (np + 1) AS u2_stat,
               CAST(r2 - np * (np + 1) AS DOUBLE)
                 / (2.0 * np * (n - np)) AS auc
        FROM t
    """,
)
def ml_auc_roc(spark, sf_dir):
    """Exact ROC-AUC of a scalar score (embedding dim-0) for the binary
    task ``label < 5`` via the Mann-Whitney rank statistic — the
    feature-screening / model-eval primitive. Average-rank tie handling
    is kept EXACT by working in 2x rank units: with per-distinct-score
    group sizes ``n_g`` and positive counts ``np_g``,
    ``2*R_pos = sum(np_g * (2*cum_before + n_g + 1))`` is an integer,
    and ``AUC = (2*R_pos - n_pos*(n_pos+1)) / (2*n_pos*n_neg)`` is ONE
    double division over exact int64s — bit-identical cross-engine.

    Scale: the only ordered pass is a prefix sum over the
    DISTINCT-SCORE table, not the corpus — production scores are
    quantized model outputs, so that spine is bins-sized; everything
    upstream is a map-side-combinable groupBy. No row-level global
    sort, no Python."""
    em = table(spark, sf_dir, "embeddings")
    s = em.select(
        F.element_at("embedding", 1).alias("s"),
        (F.col("label") < 5).cast("long").alias("pos"),
    )
    g = s.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("pos").alias("np_g")
    )
    w = (
        Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.select(
        "n_g",
        "np_g",
        F.coalesce(F.sum("n_g").over(w), F.lit(0)).alias("cum_b"),
    )
    t = c.agg(
        F.sum(
            F.col("np_g") * (2 * F.col("cum_b") + F.col("n_g") + 1)
        ).alias("r2"),
        F.sum("np_g").alias("np"),
        F.sum("n_g").alias("n"),
    )
    np_, n_ = F.col("np"), F.col("n")
    u2 = F.col("r2") - np_ * (np_ + 1)
    return t.select(
        np_.alias("n_pos"),
        (n_ - np_).alias("n_neg"),
        u2.alias("u2_stat"),
        (u2.cast("double") / (2.0 * np_ * (n_ - np_))).alias("auc"),
    )


@register(
    "ml_calibration_bins",
    oracle="""
        WITH s AS (
          SELECT CAST(list_extract(embedding, 1) AS DOUBLE) AS x,
                 CAST(label < 5 AS BIGINT) AS pos
          FROM embeddings
        ),
        mm AS (SELECT min(x) AS lo, max(x) AS hi FROM s),
        b AS (
          SELECT least(9, CAST(floor((x - lo) / (hi - lo) * 10)
                               AS BIGINT)) AS bin,
                 pos,
                 (x - lo) / (hi - lo) AS norm
          FROM s, mm
        )
        SELECT bin,
               count(*) AS n,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(pos) AS DOUBLE) / count(*) AS frac_pos,
               CAST(sum(CAST(round(norm * 1000000) AS BIGINT)) AS BIGINT)
                 AS sum_norm_u
        FROM b
        GROUP BY bin
    """,
)
def ml_calibration_bins(spark, sf_dir):
    """Reliability-diagram bins for a scalar score against the binary
    task ``label < 5``: min-max-normalize the score to [0,1], bucket
    into 10 fixed-width bins, report per-bin count, positive count,
    positive fraction, and the micro-quantized normalized-score sum
    (the calibration curve's x coordinate, kept as an exact int so the
    hash is shuffle-order-proof). Normalization is forced to DOUBLE in
    both engines before any arithmetic so the bin edges and the
    rounding are computed on identical bit patterns.

    Scale: two passes — a scalar min/max agg broadcast into a map-only
    binning pass, then one map-side-combinable groupBy over 10 keys.
    No window, no Python, no sort."""
    em = table(spark, sf_dir, "embeddings")
    s = em.select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        (F.col("label") < 5).cast("long").alias("pos"),
    )
    mm = s.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    norm = (F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    b = s.crossJoin(F.broadcast(mm)).select(
        F.least(F.lit(9), F.floor(norm * 10).cast("long")).alias("bin"),
        "pos",
        norm.alias("norm"),
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").alias("n_pos"),
        (F.sum("pos").cast("double") / F.count(F.lit(1))).alias("frac_pos"),
        F.sum(F.round(F.col("norm") * 1000000).cast("long")).alias(
            "sum_norm_u"
        ),
    )


@register(
    "ml_silhouette_by_label",
    oracle="""
        WITH ex AS (
          SELECT vec_id, label, CAST(i AS INT) AS pos,
                 CAST(list_extract(embedding, i) AS DOUBLE) AS val
          FROM embeddings, range(1, 65) AS t(i)
        ),
        cent AS (
          SELECT label AS c_label, pos,
                 (CAST(CAST(sum(CAST(round(val * 1000000) AS BIGINT))
                            AS BIGINT) AS DOUBLE) / count(*)) / 1000000.0
                   AS c
          FROM ex GROUP BY label, pos
        ),
        d AS (
          SELECT ex.vec_id, ex.label, cent.c_label,
                 CAST(sum(CAST(round((ex.val - cent.c) * (ex.val - cent.c)
                                     * 1000000000) AS BIGINT))
                      AS BIGINT) AS d2_nano
          FROM ex JOIN cent ON ex.pos = cent.pos
          GROUP BY ex.vec_id, ex.label, cent.c_label
        ),
        ab AS (
          SELECT vec_id, label,
                 CAST(max(CASE WHEN label = c_label THEN d2_nano END)
                      AS BIGINT) AS a,
                 CAST(min(CASE WHEN label <> c_label THEN d2_nano END)
                      AS BIGINT) AS b
          FROM d GROUP BY vec_id, label
        ),
        s AS (
          SELECT label,
                 CASE WHEN greatest(a, b) = 0 THEN 0.0
                      ELSE CAST(b - a AS DOUBLE) / greatest(a, b)
                 END AS sil
          FROM ab
        )
        SELECT label,
               count(*) AS n_vectors,
               CAST(sum(CAST(round(sil * 1000000) AS BIGINT)) AS BIGINT)
                 AS sum_sil_micro,
               (CAST(CAST(sum(CAST(round(sil * 1000000) AS BIGINT))
                          AS BIGINT) AS DOUBLE) / count(*)) / 1000000.0
                 AS mean_sil
        FROM s GROUP BY label
    """,
)
def ml_silhouette_by_label(spark, sf_dir):
    """Centroid-form silhouette score per label — the clustering/label
    quality metric: a = squared distance to the OWN label centroid,
    b = min squared distance to any OTHER label centroid,
    sil = (b-a)/max(a,b). The true pairwise silhouette is O(N^2); the
    centroid form is the O(N*d*k) evaluation production pipelines run,
    and here it is EXACT cross-engine: centroids come from
    micro-quantized integer dimension sums (one division at the end),
    per-(vector,centroid) distances are nano-quantized int64 term sums
    (shuffle-order-proof), and sil is one identical double expression
    over those ints.

    Scale: dims are exploded to (vec, pos, val) rows, centroids are a
    k*d=640-row broadcast dim, and every aggregation is
    map-side-combinable — no pairwise join, no Python, no global
    sort."""
    em = table(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "val_raw"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val_raw").cast("double").alias("val"),
    )
    cent = ex.groupBy(F.col("label").alias("c_label"), "pos").agg(
        (
            (
                F.sum(F.round(F.col("val") * 1000000).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            )
            / 1000000.0
        ).alias("c")
    )
    diff = F.col("val") - F.col("c")
    d = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.sum(
                F.round(diff * diff * 1000000000).cast("long")
            ).alias("d2_nano")
        )
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("label") == F.col("c_label"), F.col("d2_nano"))
        ).alias("a"),
        F.min(
            F.when(F.col("label") != F.col("c_label"), F.col("d2_nano"))
        ).alias("b"),
    )
    sil = F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
        (F.col("b") - F.col("a")).cast("double") / F.greatest("a", "b")
    )
    s = ab.select("label", sil.alias("sil"))
    sum_micro = F.sum(F.round(F.col("sil") * 1000000).cast("long"))
    return s.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        sum_micro.alias("sum_sil_micro"),
        ((sum_micro.cast("double") / F.count(F.lit(1))) / 1000000.0).alias(
            "mean_sil"
        ),
    )


@register(
    "ml_gains_lift_deciles",
    oracle="""
        WITH s AS (
          SELECT list_extract(embedding, 1) AS s,
                 CAST(label < 5 AS BIGINT) AS pos
          FROM embeddings
        ),
        g AS (
          SELECT s, count(*) AS n_g, CAST(sum(pos) AS BIGINT) AS np_g
          FROM s GROUP BY s
        ),
        c AS (
          SELECT n_g, np_g,
                 CAST(coalesce(sum(n_g) OVER (
                   ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS cum_b
          FROM g
        ),
        tot AS (
          SELECT CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(np_g) AS BIGINT) AS np
          FROM g
        ),
        dec AS (
          SELECT CAST(10 * cum_b // tot.n AS BIGINT) AS decile,
                 n_g, np_g
          FROM c, tot
        ),
        d AS (
          SELECT decile,
                 CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(np_g) AS BIGINT) AS n_pos
          FROM dec GROUP BY decile
        ),
        r AS (
          SELECT decile, n, n_pos,
                 CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
                 CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT)
                   AS cum_pos
          FROM d
        )
        SELECT r.decile, r.n, r.n_pos, r.cum_n, r.cum_pos,
               round(CAST(r.cum_pos AS DOUBLE) / tot.np, 6) AS gain,
               round(CAST(r.cum_pos * tot.n AS DOUBLE)
                     / (r.cum_n * tot.np), 6) AS lift
        FROM r, tot
    """,
)
def ml_gains_lift_deciles(spark, sf_dir):
    """Cumulative gains / lift table by score decile — the targeting
    curve behind "contact the top 10% by model score": rank the
    corpus by score descending, cut into 10 deciles, and report how
    much of the positive class each cumulative prefix captures (gain)
    and its precision relative to the base rate (lift). Decile
    assignment is GROUP-granular on the distinct-score spine
    (decile = floor(10 * cum_before / N), every tied score lands in
    one decile — deterministic and identical in both engines); all
    counts are exact int64 prefix sums, gains/lift one identical
    double expression each.

    Scale: same shape as ml_auc_roc — map-side-combinable groupBy to
    the distinct-score spine, ordered prefix sums only on that
    bins-sized spine, never a corpus-wide sort."""
    em = table(spark, sf_dir, "embeddings")
    s = em.select(
        F.element_at("embedding", 1).alias("s"),
        (F.col("label") < 5).cast("long").alias("pos"),
    )
    g = s.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("pos").alias("np_g")
    )
    wdesc = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = g.select(
        "n_g",
        "np_g",
        F.coalesce(F.sum("n_g").over(wdesc), F.lit(0)).alias("cum_b"),
    )
    tot = g.agg(
        F.sum("n_g").alias("n_tot"), F.sum("np_g").alias("np_tot")
    )
    dec = c.crossJoin(F.broadcast(tot)).select(
        (10 * F.col("cum_b") / F.col("n_tot")).cast("long").alias("decile"),
        "n_g",
        "np_g",
    )
    d = dec.groupBy("decile").agg(
        F.sum("n_g").alias("n"), F.sum("np_g").alias("n_pos")
    )
    wcum = Window.orderBy("decile")
    r = d.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(wcum).alias("cum_n"),
        F.sum("n_pos").over(wcum).alias("cum_pos"),
    )
    return r.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        F.round(
            F.col("cum_pos").cast("double") / F.col("np_tot"), 6
        ).alias("gain"),
        F.round(
            (F.col("cum_pos") * F.col("n_tot")).cast("double")
            / (F.col("cum_n") * F.col("np_tot")),
            6,
        ).alias("lift"),
    )


@register(
    "ml_kfold_cv_centroid",
    oracle="""
        WITH ex AS (
          SELECT vec_id, label, vec_id % 5 AS fold, CAST(i AS INT) AS pos,
                 CAST(list_extract(embedding, i) AS DOUBLE) AS val
          FROM embeddings, range(1, 65) AS t(i)
        ),
        tot AS (
          SELECT label, pos,
                 CAST(sum(CAST(round(val * 1000000) AS BIGINT))
                      AS BIGINT) AS st,
                 count(*) AS nt
          FROM ex GROUP BY 1, 2
        ),
        fsum AS (
          SELECT fold, label, pos,
                 CAST(sum(CAST(round(val * 1000000) AS BIGINT))
                      AS BIGINT) AS sf,
                 count(*) AS nf
          FROM ex GROUP BY 1, 2, 3
        ),
        folds AS (SELECT DISTINCT fold FROM ex),
        cent AS (
          SELECT folds.fold, tot.label AS c_label, tot.pos,
                 (CAST(tot.st - coalesce(fsum.sf, 0) AS DOUBLE)
                  / (tot.nt - coalesce(fsum.nf, 0))) / 1000000.0 AS c
          FROM folds
          JOIN tot ON true
          LEFT JOIN fsum ON fsum.fold = folds.fold
                        AND fsum.label = tot.label
                        AND fsum.pos = tot.pos
        ),
        d AS (
          SELECT ex.vec_id, ex.label, ex.fold, cent.c_label,
                 CAST(sum(CAST(round((ex.val - cent.c) * (ex.val - cent.c)
                                     * 1000000000) AS BIGINT))
                      AS BIGINT) AS d2_nano
          FROM ex JOIN cent ON cent.pos = ex.pos AND cent.fold = ex.fold
          GROUP BY 1, 2, 3, 4
        ),
        pred AS (
          SELECT vec_id, label, fold, c_label AS predicted
          FROM (
            SELECT *, row_number() OVER (
                     PARTITION BY vec_id ORDER BY d2_nano, c_label
                   ) AS rn
            FROM d
          ) WHERE rn = 1
        )
        SELECT fold AS test_fold,
               count(*) AS n_test,
               CAST(count(*) FILTER (WHERE predicted = label) AS BIGINT)
                 AS n_correct,
               round(CAST(count(*) FILTER (WHERE predicted = label)
                          AS DOUBLE) / count(*), 6) AS accuracy
        FROM pred GROUP BY 1
    """,
)
def ml_kfold_cv_centroid(spark, sf_dir):
    """5-fold cross-validated nearest-centroid classifier — the
    model-selection primitive, made EXACT and one-pass: instead of
    training 5 models, the leave-fold-out centroids come from sum
    algebra (total per-(label,dim) integer sums MINUS the held-out
    fold's sums, one division at the end), so every fold's "training
    run" is a broadcast-sized subtraction. Test vectors score against
    their own fold's centroids via nano-quantized integer distance
    sums; argmin ties break on smaller label via an explicit
    row_number, and per-fold accuracy is exact.

    Scale: two map-side-combinable sum passes over the exploded
    (vec, dim) rows, a k*labels*d = 3200-row broadcast centroid dim,
    and one scoring aggregation — O(N*d*k) total, no per-fold
    retraining scans, the pattern that makes CV affordable on a
    100 TB corpus."""
    em = table(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id",
        "label",
        (F.col("vec_id") % 5).alias("fold"),
        F.posexplode("embedding").alias("pos0", "val_raw"),
    ).select(
        "vec_id",
        "label",
        "fold",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val_raw").cast("double").alias("val"),
    )
    micro = F.sum(F.round(F.col("val") * 1000000).cast("long"))
    tot = ex.groupBy("label", "pos").agg(
        micro.alias("st"), F.count(F.lit(1)).alias("nt")
    )
    fsum = ex.groupBy("fold", "label", "pos").agg(
        micro.alias("sf"), F.count(F.lit(1)).alias("nf")
    )
    folds = ex.select("fold").distinct()
    cent = (
        folds.crossJoin(tot)
        .join(
            fsum.withColumnsRenamed(
                {"fold": "f2", "label": "l2", "pos": "p2"}
            ),
            (F.col("f2") == F.col("fold"))
            & (F.col("l2") == F.col("label"))
            & (F.col("p2") == F.col("pos")),
            "left",
        )
        .select(
            "fold",
            F.col("label").alias("c_label"),
            "pos",
            (
                (
                    (F.col("st") - F.coalesce(F.col("sf"), F.lit(0))).cast(
                        "double"
                    )
                    / (F.col("nt") - F.coalesce(F.col("nf"), F.lit(0)))
                )
                / 1000000.0
            ).alias("c"),
        )
    )
    diff = F.col("val") - F.col("c")
    d = (
        ex.join(F.broadcast(cent), ["pos", "fold"])
        .groupBy("vec_id", "label", "fold", "c_label")
        .agg(
            F.sum(
                F.round(diff * diff * 1000000000).cast("long")
            ).alias("d2_nano")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2_nano", "c_label")
    pred = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "fold", F.col("c_label").alias("predicted"))
    )
    correct = F.count_if(F.col("predicted") == F.col("label"))
    return pred.groupBy(F.col("fold").alias("test_fold")).agg(
        F.count(F.lit(1)).alias("n_test"),
        correct.alias("n_correct"),
        F.round(
            correct.cast("double") / F.count(F.lit(1)), 6
        ).alias("accuracy"),
    )


@register(
    "ml_average_precision",
    oracle="""
        WITH s AS (
          SELECT list_extract(embedding, 1) AS s,
                 CAST(label < 5 AS BIGINT) AS pos
          FROM embeddings
        ),
        g AS (
          SELECT s, count(*) AS n_g, CAST(sum(pos) AS BIGINT) AS np_g
          FROM s GROUP BY s
        ),
        c AS (
          SELECT np_g,
                 CAST(sum(n_g) OVER (
                   ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum_n,
                 CAST(sum(np_g) OVER (
                   ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum_pos
          FROM g
        ),
        t AS (
          SELECT CAST(sum(CAST(round(
                   1000000.0 * np_g * cum_pos / cum_n
                 ) AS BIGINT)) AS BIGINT) AS ap_num_u,
                 CAST(sum(np_g) AS BIGINT) AS np
          FROM c
        )
        SELECT np AS n_pos, ap_num_u,
               round(CAST(ap_num_u AS DOUBLE) / np / 1000000.0, 6)
                 AS average_precision
        FROM t
    """,
)
def ml_average_precision(spark, sf_dir):
    """Average precision (area under the precision-recall curve, step
    interpolation) for the score/task pair shared with ml_auc_roc:
    AP = sum over descending-score groups of
    (recall increment) * (precision at that cut)
       = (1/P) * sum( np_g * cum_pos/cum_n ).
    Each group's term is micro-quantized to int64 BEFORE the
    cross-group sum, so the accumulation is shuffle-order-proof; the
    final AP is one double division. PR-AUC complements ROC-AUC where
    positives are rare — the usual case in retrieval and safety
    filtering.

    Scale: identical shape to ml_auc_roc — spine-sized ordered prefix
    sums after a map-side-combinable groupBy; no corpus sort."""
    em = table(spark, sf_dir, "embeddings")
    s = em.select(
        F.element_at("embedding", 1).alias("s"),
        (F.col("label") < 5).cast("long").alias("pos"),
    )
    g = s.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("pos").alias("np_g")
    )
    w = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = g.select(
        "np_g",
        F.sum("n_g").over(w).alias("cum_n"),
        F.sum("np_g").over(w).alias("cum_pos"),
    )
    term = F.round(
        1000000.0 * F.col("np_g") * F.col("cum_pos") / F.col("cum_n")
    ).cast("long")
    t = c.agg(
        F.sum(term).alias("ap_num_u"), F.sum("np_g").alias("np")
    )
    return t.select(
        F.col("np").alias("n_pos"),
        "ap_num_u",
        F.round(
            F.col("ap_num_u").cast("double") / F.col("np") / 1000000.0, 6
        ).alias("average_precision"),
    )


@register(
    "ml_mcc_threshold",
    oracle="""
        WITH s AS (
          SELECT list_extract(embedding, 1) AS s,
                 CAST(label < 5 AS BIGINT) AS pos
          FROM embeddings
        ),
        g AS (SELECT s, count(*) AS n_g FROM s GROUP BY s),
        c AS (
          SELECT s,
                 CAST(sum(n_g) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cumn
          FROM g
        ),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
        thr AS (
          SELECT min(c.s) AS thr FROM c, t WHERE 2 * c.cumn >= t.n
        ),
        m AS (
          SELECT
            CAST(count(*) FILTER (WHERE s.s > thr.thr AND pos = 1)
                 AS BIGINT) AS tp,
            CAST(count(*) FILTER (WHERE s.s > thr.thr AND pos = 0)
                 AS BIGINT) AS fp,
            CAST(count(*) FILTER (WHERE s.s <= thr.thr AND pos = 1)
                 AS BIGINT) AS fn,
            CAST(count(*) FILTER (WHERE s.s <= thr.thr AND pos = 0)
                 AS BIGINT) AS tn
          FROM s, thr
        )
        SELECT tp, fp, fn, tn,
               CASE WHEN (tp+fp)*(tp+fn)*(tn+fp)*(tn+fn) = 0 THEN NULL
                    ELSE round(
                      CAST(tp*tn - fp*fn AS DOUBLE)
                      / sqrt(CAST((tp+fp)*(tp+fn) AS DOUBLE)
                             * CAST((tn+fp)*(tn+fn) AS DOUBLE)), 6)
               END AS mcc
        FROM m
    """,
)
def ml_mcc_threshold(spark, sf_dir):
    """Matthews correlation coefficient of the thresholded scalar
    score on the shared binary task, at the EXACT median-score
    threshold (smallest score whose doubled cumulative count reaches
    N — the integer midpoint test, same discipline as
    agg_weighted_median). Confusion counts are one conditional
    aggregate; MCC is a single double expression with the variance
    product split into two exact int64 factors before the sqrt (the
    four-factor product can overflow int64 at corpus scale — the
    split keeps each factor N^2-bounded), NULL-guarded for degenerate
    margins. MCC is the balanced single-number summary P/R/F1 miss
    when classes are skewed.

    Scale: a spine prefix-sum for the threshold + one
    map-side-combinable conditional aggregate — two scan-bound
    passes."""
    em = table(spark, sf_dir, "embeddings")
    s = em.select(
        F.element_at("embedding", 1).alias("s"),
        (F.col("label") < 5).cast("long").alias("pos"),
    )
    g = s.groupBy("s").agg(F.count(F.lit(1)).alias("n_g"))
    wc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select("s", F.sum("n_g").over(wc).alias("cumn"))
    t = s.agg(F.count(F.lit(1)).alias("n"))
    thr = (
        c.crossJoin(F.broadcast(t))
        .filter(2 * F.col("cumn") >= F.col("n"))
        .agg(F.min("s").alias("thr"))
    )
    m = s.crossJoin(F.broadcast(thr)).agg(
        F.count_if((F.col("s") > F.col("thr")) & (F.col("pos") == 1)).alias(
            "tp"
        ),
        F.count_if((F.col("s") > F.col("thr")) & (F.col("pos") == 0)).alias(
            "fp"
        ),
        F.count_if((F.col("s") <= F.col("thr")) & (F.col("pos") == 1)).alias(
            "fn"
        ),
        F.count_if((F.col("s") <= F.col("thr")) & (F.col("pos") == 0)).alias(
            "tn"
        ),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    denom_zero = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) == 0
    mcc = F.when(denom_zero, F.lit(None).cast("double")).otherwise(
        F.round(
            (tp * tn - fp * fn).cast("double")
            / F.sqrt(
                ((tp + fp) * (tp + fn)).cast("double")
                * ((tn + fp) * (tn + fn)).cast("double")
            ),
            6,
        )
    )
    return m.select("tp", "fp", "fn", "tn", mcc.alias("mcc"))


@register(
    "ml_ndcg_at_k",
    oracle=f"""
        WITH r AS ({{TOPK}}),
        lab AS (SELECT vec_id, label FROM embeddings),
        rel AS (
          SELECT r.q_id, r.rank,
                 CAST(lq.label = lc.label AS BIGINT) AS rel
          FROM r
          JOIN lab lq ON r.q_id = lq.vec_id
          JOIN lab lc ON r.c_id = lc.vec_id
        ),
        wt AS (
          SELECT CAST(i AS BIGINT) AS rank,
                 CAST(round(1000000.0 * ln(2) / ln(i + 1.0)) AS BIGINT)
                   AS w
          FROM range(1, {TOP_K} + 1) t(i)
        ),
        dcg AS (
          SELECT q_id,
                 CAST(sum(rel * wt.w) AS BIGINT) AS dcg_u,
                 CAST(sum(rel) AS BIGINT) AS n_rel
          FROM rel JOIN wt ON rel.rank = wt.rank GROUP BY 1
        ),
        idcg AS (
          SELECT d.q_id, CAST(sum(wt.w) AS BIGINT) AS idcg_u
          FROM dcg d JOIN wt ON wt.rank <= d.n_rel GROUP BY 1
        )
        SELECT d.q_id, d.n_rel, d.dcg_u,
               coalesce(i.idcg_u, 0) AS idcg_u,
               CASE WHEN d.n_rel = 0 THEN NULL
                    ELSE round(CAST(d.dcg_u AS DOUBLE) / i.idcg_u, 6)
               END AS ndcg
        FROM dcg d LEFT JOIN idcg i ON d.q_id = i.q_id
    """.replace("{TOPK}", TOPK_SQL),
)
def ml_ndcg_at_k(spark, sf_dir):
    """NDCG@k of the exact top-k retrieval against same-label
    relevance — the ranking-quality metric that rewards putting
    relevant neighbors EARLY, which recall@k cannot see. Both DCG and
    the ideal DCG use the SAME micro-quantized int64 discount table
    (w_rank = round(1e6 * ln2/ln(rank+1)), so rank 1 is exactly 1e6),
    making numerator and denominator exact integer sums; NDCG is one
    double division, NULL when a probe has no relevant neighbor in
    the top k.

    Scale: rides the registered top-k output (O(probes * k) rows)
    plus a k-row broadcast discount table — evaluation cost is
    O(retrieval output), never O(corpus)."""
    em = table(spark, sf_dir, "embeddings")
    lab = em.select("vec_id", "label")
    r = sim_search_topk(spark, sf_dir)
    rel = (
        r.join(
            lab.withColumnsRenamed({"vec_id": "q_id", "label": "q_lab"}),
            "q_id",
        )
        .join(
            lab.withColumnsRenamed({"vec_id": "c_id", "label": "c_lab"}),
            "c_id",
        )
        .select(
            "q_id",
            "rank",
            (F.col("q_lab") == F.col("c_lab")).cast("long").alias("rel"),
        )
    )
    wt = spark.range(1, TOP_K + 1).select(
        F.col("id").alias("rank"),
        F.round(1000000.0 * F.log(F.lit(2.0)) / F.log(F.col("id") + 1.0))
        .cast("long")
        .alias("w"),
    )
    dcg = (
        rel.join(F.broadcast(wt), "rank")
        .groupBy("q_id")
        .agg(
            F.sum(F.col("rel") * F.col("w")).alias("dcg_u"),
            F.sum("rel").alias("n_rel"),
        )
    )
    idcg = (
        dcg.join(F.broadcast(wt), wt.rank <= dcg.n_rel)
        .groupBy("q_id")
        .agg(F.sum("w").alias("idcg_u"))
    )
    out = dcg.join(idcg, "q_id", "left")
    return out.select(
        "q_id",
        "n_rel",
        "dcg_u",
        F.coalesce(F.col("idcg_u"), F.lit(0)).alias("idcg_u"),
        F.when(F.col("n_rel") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("dcg_u").cast("double") / F.col("idcg_u"), 6)
        )
        .alias("ndcg"),
    )


@register(
    "ml_brier_decomposition",
    oracle="""
        WITH s0 AS (
          SELECT CAST(list_extract(embedding, 1) AS DOUBLE) AS x,
                 CAST(label < 5 AS BIGINT) AS y
          FROM embeddings
        ),
        mm AS (SELECT min(x) AS lo, max(x) AS hi FROM s0),
        s AS (
          SELECT (x - lo) / (hi - lo) AS sc, y,
                 least(9, CAST(floor((x - lo) / (hi - lo) * 10)
                               AS BIGINT)) AS bin
          FROM s0, mm
        ),
        t AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS np,
                 CAST(sum(CAST(round(1000000.0 * (sc - y) * (sc - y))
                               AS BIGINT)) AS BIGINT) AS brier_u
          FROM s
        ),
        b AS (
          SELECT bin, count(*) AS nk,
                 CAST(sum(y) AS BIGINT) AS npk,
                 CAST(sum(CAST(round(sc * 1000000) AS BIGINT)) AS BIGINT)
                   AS ssum_u
          FROM s GROUP BY bin
        ),
        d AS (
          SELECT
            CAST(sum(CAST(round(1000000.0 * nk
              * ((CAST(ssum_u AS DOUBLE) / nk / 1000000.0)
                 - (CAST(npk AS DOUBLE) / nk))
              * ((CAST(ssum_u AS DOUBLE) / nk / 1000000.0)
                 - (CAST(npk AS DOUBLE) / nk))) AS BIGINT))
              AS BIGINT) AS rel_u,
            CAST(sum(CAST(round(1000000.0 * nk
              * ((CAST(npk AS DOUBLE) / nk)
                 - (CAST(t.np AS DOUBLE) / t.n))
              * ((CAST(npk AS DOUBLE) / nk)
                 - (CAST(t.np AS DOUBLE) / t.n))) AS BIGINT))
              AS BIGINT) AS res_u
          FROM b, t
          GROUP BY t.n, t.np
        )
        SELECT t.n AS n_rows,
               round(CAST(t.brier_u AS DOUBLE) / t.n / 1000000.0, 6)
                 AS brier,
               round(CAST(d.rel_u AS DOUBLE) / t.n / 1000000.0, 6)
                 AS reliability,
               round(CAST(d.res_u AS DOUBLE) / t.n / 1000000.0, 6)
                 AS resolution,
               round((CAST(t.np AS DOUBLE) / t.n)
                     * (1.0 - CAST(t.np AS DOUBLE) / t.n), 6)
                 AS uncertainty
        FROM t, d
    """,
)
def ml_brier_decomposition(spark, sf_dir):
    """Brier score with the Murphy decomposition
    (reliability − resolution + uncertainty) over the same normalized
    score, task, and 10-bin cut as ml_calibration_bins — the proper
    scoring rule that says WHY a probability forecast is bad
    (miscalibrated vs uninformative). Every squared-error and per-bin
    term is micro-quantized to int64 before its cross-row/cross-bin
    sum; bin means are derived from exact integer sums so both
    engines square identical doubles.

    Scale: one pass for the global terms, one 10-key map-side rollup
    for the bins — scan-bound like the other eval ops."""
    em = table(spark, sf_dir, "embeddings")
    s0 = em.select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        (F.col("label") < 5).cast("long").alias("y"),
    )
    mm = s0.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    sc = (F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    s = s0.crossJoin(F.broadcast(mm)).select(
        sc.alias("sc"),
        "y",
        F.least(F.lit(9), F.floor(sc * 10).cast("long")).alias("bin"),
    )
    t = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("np"),
        F.sum(
            F.round(
                1000000.0 * (F.col("sc") - F.col("y"))
                * (F.col("sc") - F.col("y"))
            ).cast("long")
        ).alias("brier_u"),
    )
    b = s.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum("y").alias("npk"),
        F.sum(F.round(F.col("sc") * 1000000).cast("long")).alias("ssum_u"),
    )
    sbar = F.col("ssum_u").cast("double") / F.col("nk") / 1000000.0
    ybar_k = F.col("npk").cast("double") / F.col("nk")
    ybar = F.col("np").cast("double") / F.col("n")
    d = (
        b.crossJoin(F.broadcast(t))
        .groupBy("n", "np", "brier_u")
        .agg(
            F.sum(
                F.round(
                    1000000.0 * F.col("nk") * (sbar - ybar_k) * (sbar - ybar_k)
                ).cast("long")
            ).alias("rel_u"),
            F.sum(
                F.round(
                    1000000.0 * F.col("nk") * (ybar_k - ybar) * (ybar_k - ybar)
                ).cast("long")
            ).alias("res_u"),
        )
    )
    return d.select(
        F.col("n").alias("n_rows"),
        F.round(
            F.col("brier_u").cast("double") / F.col("n") / 1000000.0, 6
        ).alias("brier"),
        F.round(
            F.col("rel_u").cast("double") / F.col("n") / 1000000.0, 6
        ).alias("reliability"),
        F.round(
            F.col("res_u").cast("double") / F.col("n") / 1000000.0, 6
        ).alias("resolution"),
        F.round(ybar * (1.0 - ybar), 6).alias("uncertainty"),
    )


@register(
    "ml_cohens_kappa",
    oracle=f"""
        WITH r AS ({{TOPK}}),
        votes AS (
          SELECT r.q_id, e.label, count(*) AS votes
          FROM r JOIN embeddings e ON r.c_id = e.vec_id
          GROUP BY 1, 2
        ),
        preda AS (
          SELECT q_id, label AS pa FROM (
            SELECT q_id, label,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY votes DESC, label) AS rn
            FROM votes
          ) WHERE rn = 1
        ),
        ex AS (
          SELECT vec_id, label, CAST(i AS INT) AS pos,
                 CAST(list_extract(embedding, i) AS DOUBLE) AS val
          FROM embeddings, range(1, 65) AS t(i)
        ),
        cent AS (
          SELECT label AS c_label, pos,
                 (CAST(CAST(sum(CAST(round(val * 1000000) AS BIGINT))
                            AS BIGINT) AS DOUBLE) / count(*)) / 1000000.0
                   AS c
          FROM ex GROUP BY 1, 2
        ),
        q AS (SELECT * FROM ex WHERE vec_id < {N_PROBES}),
        dist AS (
          SELECT q.vec_id, cent.c_label,
                 CAST(sum(CAST(round((q.val - cent.c) * (q.val - cent.c)
                                     * 1000000000) AS BIGINT))
                      AS BIGINT) AS d2
          FROM q JOIN cent ON q.pos = cent.pos
          GROUP BY 1, 2
        ),
        predb AS (
          SELECT vec_id, c_label AS pb FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d2, c_label) AS rn
            FROM dist
          ) WHERE rn = 1
        ),
        pairs AS (
          SELECT a.q_id, a.pa, b.pb
          FROM preda a JOIN predb b ON a.q_id = b.vec_id
        ),
        t AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(*) FILTER (WHERE pa = pb) AS BIGINT) AS agree
          FROM pairs
        ),
        ma AS (SELECT pa AS lab, count(*) AS na FROM pairs GROUP BY 1),
        mb AS (SELECT pb AS lab, count(*) AS nb FROM pairs GROUP BY 1),
        pe AS (
          SELECT CAST(coalesce(sum(ma.na * mb.nb), 0) AS BIGINT)
                   AS pe_num
          FROM ma JOIN mb ON ma.lab = mb.lab
        )
        SELECT t.n, t.agree, pe.pe_num,
               CASE WHEN t.n * t.n = pe.pe_num THEN NULL
                    ELSE round(CAST(t.agree * t.n - pe.pe_num AS DOUBLE)
                               / (t.n * t.n - pe.pe_num), 6)
               END AS kappa
        FROM t, pe
    """.replace("{TOPK}", TOPK_SQL),
)
def ml_cohens_kappa(spark, sf_dir):
    """Cohen's kappa agreement between the engine's TWO registered
    deterministic classifiers on the probe set — the k-NN majority
    vote (knn_label_vote) and the nearest-whole-data-centroid
    assignment — correcting raw agreement for chance:
    kappa = (agree*n − Σ_c nA_c*nB_c) / (n² − Σ_c nA_c*nB_c), which
    stays an EXACT integer ratio until one final double division.
    The inter-rater-reliability measure for comparing labelers or
    model generations, NULL-guarded for the degenerate both-constant
    case.

    Scale: rides the registered top-k output plus a broadcast
    centroid dim; the kappa fold is marginal-counts-sized."""
    em = table(spark, sf_dir, "embeddings")
    preda = knn_label_vote(spark, sf_dir).select(
        "q_id", F.col("predicted_label").alias("pa")
    )
    ex = em.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "val_raw"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val_raw").cast("double").alias("val"),
    )
    cent = ex.groupBy(F.col("label").alias("c_label"), "pos").agg(
        (
            (
                F.sum(F.round(F.col("val") * 1000000).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            )
            / 1000000.0
        ).alias("c")
    )
    qx = ex.filter(F.col("vec_id") < N_PROBES)
    diff = F.col("val") - F.col("c")
    dist = (
        qx.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "c_label")
        .agg(
            F.sum(
                F.round(diff * diff * 1000000000).cast("long")
            ).alias("d2")
        )
    )
    wmin = Window.partitionBy("vec_id").orderBy("d2", "c_label")
    predb = (
        dist.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("q_id"), F.col("c_label").alias("pb"))
    )
    # pairs is PROBE-sized and feeds three marginal aggregations —
    # materialize once so the two predictor subtrees (k-NN + centroid)
    # aren't planned and executed three times each (guide §3.3)
    pairs = preda.join(predb, "q_id").localCheckpoint(eager=True)
    t = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("pa") == F.col("pb")).alias("agree"),
    )
    ma = pairs.groupBy(F.col("pa").alias("lab")).agg(
        F.count(F.lit(1)).alias("na")
    )
    mb = pairs.groupBy(F.col("pb").alias("lab")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    pe = (
        ma.join(mb, "lab")
        .agg(
            F.coalesce(
                F.sum(F.col("na") * F.col("nb")), F.lit(0)
            ).alias("pe_num")
        )
    )
    out = t.crossJoin(F.broadcast(pe))
    n, agree, pen = F.col("n"), F.col("agree"), F.col("pe_num")
    kappa = F.when(n * n == pen, F.lit(None).cast("double")).otherwise(
        F.round((agree * n - pen).cast("double") / (n * n - pen), 6)
    )
    return out.select("n", "agree", "pe_num", kappa.alias("kappa"))


@register(
    "ml_psi_score_drift",
    oracle="""
        WITH s0 AS (
          SELECT CAST(list_extract(embedding, 1) AS DOUBLE) AS x,
                 CAST(vec_id % 5 = 0 AS BIGINT) AS is_test
          FROM embeddings
        ),
        mm AS (SELECT min(x) AS lo, max(x) AS hi FROM s0),
        b AS (
          SELECT least(9, CAST(floor((x - lo) / (hi - lo) * 10)
                               AS BIGINT)) AS bin,
                 is_test
          FROM s0, mm
        ),
        cnt AS (
          SELECT bin,
                 CAST(count(*) FILTER (WHERE is_test = 0) AS BIGINT)
                   AS n_train,
                 CAST(count(*) FILTER (WHERE is_test = 1) AS BIGINT)
                   AS n_test
          FROM b GROUP BY bin
        ),
        t AS (
          SELECT CAST(sum(n_train) AS BIGINT) AS nt,
                 CAST(sum(n_test) AS BIGINT) AS ns
          FROM cnt
        ),
        terms AS (
          SELECT bin, n_train, n_test,
                 CAST(round(1000000.0
                   * ((CAST(n_train AS DOUBLE) + 0.5) / (t.nt + 5.0)
                      - (CAST(n_test AS DOUBLE) + 0.5) / (t.ns + 5.0))
                   * ln(((CAST(n_train AS DOUBLE) + 0.5) / (t.nt + 5.0))
                        / ((CAST(n_test AS DOUBLE) + 0.5)
                           / (t.ns + 5.0)))) AS BIGINT) AS u
          FROM cnt, t
        )
        SELECT CAST(sum(n_train) AS BIGINT) AS n_train,
               CAST(sum(n_test) AS BIGINT) AS n_test,
               round(CAST(sum(u) AS DOUBLE) / 1000000.0, 6) AS psi
        FROM terms
    """,
)
def ml_psi_score_drift(spark, sf_dir):
    """Population Stability Index between the train and held-out score
    distributions (split = vec_id % 5, the same hash-split family the
    CV op uses): PSI = sum over bins of (p_i − q_i) ln(p_i/q_i) with
    additive (+0.5 per bin) smoothing so empty bins stay finite — the
    model-monitoring drift alarm (rule of thumb: PSI > 0.2 means the
    scoring population has shifted). Bin terms are micro-nat-quantized
    to int64 before the sum; smoothing constants are identical
    literals in both engines.

    Scale: one global min/max, one 10-key conditional rollup, one
    10-row fold — scan-bound."""
    em = table(spark, sf_dir, "embeddings")
    s0 = em.select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        (F.col("vec_id") % 5 == 0).cast("long").alias("is_test"),
    )
    mm = s0.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    norm = (F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    b = s0.crossJoin(F.broadcast(mm)).select(
        F.least(F.lit(9), F.floor(norm * 10).cast("long")).alias("bin"),
        "is_test",
    )
    cnt = b.groupBy("bin").agg(
        F.count_if(F.col("is_test") == 0).alias("n_train"),
        F.count_if(F.col("is_test") == 1).alias("n_test"),
    )
    t = cnt.agg(
        F.sum("n_train").alias("nt"), F.sum("n_test").alias("ns")
    )
    p = (F.col("n_train").cast("double") + 0.5) / (F.col("nt") + 5.0)
    q = (F.col("n_test").cast("double") + 0.5) / (F.col("ns") + 5.0)
    terms = cnt.crossJoin(F.broadcast(t)).select(
        "n_train",
        "n_test",
        F.round(1000000.0 * (p - q) * F.log(p / q)).cast("long").alias("u"),
    )
    return terms.agg(
        F.sum("n_train").alias("n_train"),
        F.sum("n_test").alias("n_test"),
        F.round(F.sum("u").cast("double") / 1000000.0, 6).alias("psi"),
    )


@register(
    "ml_learning_curve_subsample",
    oracle="""
        WITH ex AS (
          SELECT vec_id, label, vec_id % 5 AS fold, CAST(i AS INT) AS pos,
                 CAST(list_extract(embedding, i) AS DOUBLE) AS val
          FROM embeddings, range(1, 65) AS t(i)
        ),
        ks AS (SELECT CAST(k AS BIGINT) AS k FROM range(1, 5) t(k)),
        fsum AS (
          SELECT fold, label, pos,
                 CAST(sum(CAST(round(val * 1000000) AS BIGINT))
                      AS BIGINT) AS sf,
                 count(*) AS nf
          FROM ex GROUP BY 1, 2, 3
        ),
        cent AS (
          SELECT ks.k, fsum.label AS c_label, fsum.pos,
                 (CAST(CAST(sum(sf) AS BIGINT) AS DOUBLE)
                  / CAST(sum(nf) AS BIGINT)) / 1000000.0 AS c,
                 CAST(sum(nf) AS BIGINT) AS n_dim_rows
          FROM ks JOIN fsum ON fsum.fold < ks.k
          GROUP BY 1, 2, 3
        ),
        q AS (SELECT * FROM ex WHERE fold = 4),
        d AS (
          SELECT cent.k, q.vec_id, q.label, cent.c_label,
                 CAST(sum(CAST(round((q.val - cent.c) * (q.val - cent.c)
                                     * 1000000000) AS BIGINT))
                      AS BIGINT) AS d2
          FROM q JOIN cent ON cent.pos = q.pos
          GROUP BY 1, 2, 3, 4
        ),
        pred AS (
          SELECT k, vec_id, label, c_label AS predicted FROM (
            SELECT *, row_number() OVER (PARTITION BY k, vec_id
                                         ORDER BY d2, c_label) AS rn
            FROM d
          ) WHERE rn = 1
        ),
        tr AS (
          SELECT ks.k, CAST(count(DISTINCT e.vec_id) AS BIGINT)
                   AS n_train
          FROM ks JOIN (SELECT DISTINCT vec_id, fold FROM ex) e
            ON e.fold < ks.k
          GROUP BY 1
        )
        SELECT pred.k AS k_folds_train, tr.n_train,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(count(*) FILTER (WHERE predicted = label) AS BIGINT)
                 AS n_correct,
               round(CAST(count(*) FILTER (WHERE predicted = label)
                          AS DOUBLE) / count(*), 6) AS accuracy
        FROM pred JOIN tr ON pred.k = tr.k
        GROUP BY 1, 2
    """,
)
def ml_learning_curve_subsample(spark, sf_dir):
    """Learning curve for the nearest-centroid classifier: train on a
    growing prefix of folds (k = 1..4 of the vec_id %% 5 split),
    always evaluate on the held-out fold 4, and report accuracy vs
    training-set size — the "do we need more data?" diagnostic. As
    with the CV op, no model is retrained per point: centroids for
    every k come from ONE fold-level integer sum table aggregated
    cumulatively (fold < k), so the whole curve costs two
    map-side-combinable passes plus a broadcast-dim scoring join.

    Scale: O(N*d) for the sums + O(|test|*d*k*points) scoring — the
    curve is nearly free relative to a single training epoch."""
    em = table(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id",
        "label",
        (F.col("vec_id") % 5).alias("fold"),
        F.posexplode("embedding").alias("pos0", "val_raw"),
    ).select(
        "vec_id",
        "label",
        "fold",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val_raw").cast("double").alias("val"),
    )
    ks = spark.range(1, 5).select(F.col("id").alias("k"))
    fsum = ex.groupBy("fold", "label", "pos").agg(
        F.sum(F.round(F.col("val") * 1000000).cast("long")).alias("sf"),
        F.count(F.lit(1)).alias("nf"),
    )
    cent = (
        F.broadcast(ks)
        .join(fsum, fsum.fold < ks.k)
        .groupBy("k", F.col("label").alias("c_label"), "pos")
        .agg(
            (
                (F.sum("sf").cast("double") / F.sum("nf")) / 1000000.0
            ).alias("c")
        )
    )
    q = ex.filter(F.col("fold") == 4)
    diff = F.col("val") - F.col("c")
    d = (
        q.join(F.broadcast(cent), "pos")
        .groupBy("k", "vec_id", "label", "c_label")
        .agg(
            F.sum(
                F.round(diff * diff * 1000000000).cast("long")
            ).alias("d2")
        )
    )
    w = Window.partitionBy("k", "vec_id").orderBy("d2", "c_label")
    pred = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "vec_id", "label", F.col("c_label").alias("predicted"))
    )
    # fold membership needs no explode and no distinct: vec_id is
    # unique and fold is derived from it (optimization r13 — this was
    # a third full explode of the embeddings + a dedup shuffle)
    folds = em.select("vec_id", (F.col("vec_id") % 5).alias("fold"))
    tr = (
        F.broadcast(ks.withColumnsRenamed({"k": "k2"}))
        .join(folds, folds.fold < F.col("k2"))
        .groupBy(F.col("k2").alias("k"))
        .agg(F.countDistinct("vec_id").alias("n_train"))
    )
    correct = F.count_if(F.col("predicted") == F.col("label"))
    return (
        pred.join(tr, "k")
        .groupBy(F.col("k").alias("k_folds_train"), "n_train")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            correct.alias("n_correct"),
            F.round(
                correct.cast("double") / F.count(F.lit(1)), 6
            ).alias("accuracy"),
        )
    )


@register(
    "ml_mrr_at_k",
    oracle=f"""
        WITH r AS ({{TOPK}}),
        lab AS (SELECT vec_id, label FROM embeddings),
        rel AS (
          SELECT r.q_id, r.rank
          FROM r
          JOIN lab lq ON r.q_id = lq.vec_id
          JOIN lab lc ON r.c_id = lc.vec_id
          WHERE lq.label = lc.label
        ),
        fr AS (
          SELECT q_id, CAST(min(rank) AS BIGINT) AS first_rank
          FROM rel GROUP BY 1
        ),
        allq AS (SELECT DISTINCT q_id FROM r)
        SELECT CAST(count(*) AS BIGINT) AS n_probes,
               CAST(count(fr.first_rank) AS BIGINT) AS n_hit,
               round(CAST(sum(CASE WHEN fr.first_rank IS NULL THEN 0
                          ELSE CAST(round(1000000.0 / fr.first_rank)
                                    AS BIGINT) END) AS DOUBLE)
                     / count(*) / 1000000.0, 6) AS mrr
        FROM allq LEFT JOIN fr ON allq.q_id = fr.q_id
    """.replace("{TOPK}", TOPK_SQL),
)
def ml_mrr_at_k(spark, sf_dir):
    """Mean reciprocal rank @ k of the exact retrieval against
    same-label relevance — the metric for "how far down is the FIRST
    right answer", the standard for known-item search and RAG
    retrieval. Reciprocal ranks are micro-quantized to int64 before
    the mean (k is tiny so 1/rank has few distinct values; quantizing
    keeps the sum shuffle-order-proof), probes with no relevant
    neighbor in the top k contribute 0, and every probe stays in the
    denominator via the probe-spine LEFT join.

    Scale: O(retrieval output) like the other rank metrics."""
    em = table(spark, sf_dir, "embeddings")
    lab = em.select("vec_id", "label")
    r = sim_search_topk(spark, sf_dir)
    rel = (
        r.join(
            lab.withColumnsRenamed({"vec_id": "q_id", "label": "q_lab"}),
            "q_id",
        )
        .join(
            lab.withColumnsRenamed({"vec_id": "c_id", "label": "c_lab"}),
            "c_id",
        )
        .filter(F.col("q_lab") == F.col("c_lab"))
        .select("q_id", "rank")
    )
    fr = rel.groupBy("q_id").agg(F.min("rank").alias("first_rank"))
    allq = r.select("q_id").distinct()
    j = allq.join(fr, "q_id", "left")
    rr_u = F.when(F.col("first_rank").isNull(), F.lit(0)).otherwise(
        F.round(1000000.0 / F.col("first_rank")).cast("long")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.count("first_rank").alias("n_hit"),
        F.round(
            F.sum(rr_u).cast("double") / F.count(F.lit(1)) / 1000000.0, 6
        ).alias("mrr"),
    )


@register(
    "ml_target_encoding_loo",
    oracle="""
        WITH x AS (
          SELECT o_orderpriority AS prio,
                 CAST(round(o_totalprice) AS BIGINT) AS v
          FROM orders
        ),
        g AS (
          SELECT prio, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS s
          FROM x GROUP BY prio
        ),
        enc AS (
          SELECT x.prio, g.n,
                 CAST(round(1000000.0 * (g.s - x.v) / (g.n - 1))
                      AS BIGINT) AS loo_u
          FROM x JOIN g ON x.prio = g.prio
        )
        SELECT prio, max(n) AS n,
               CAST(sum(loo_u) AS BIGINT) AS sum_loo_u,
               round(CAST(sum(loo_u) AS DOUBLE) / max(n) / 1000000.0, 6)
                 AS mean_loo
        FROM enc GROUP BY prio
    """,
)
def ml_target_encoding_loo(spark, sf_dir):
    """Leave-one-out target encoding — the categorical feature
    engineering that replaces a category with the mean target of the
    OTHER rows in its category, preventing the self-leakage naive
    mean encoding has: per row, (group_sum − own_value)/(group_n − 1)
    derived from a broadcast of per-category exact int64 sums (no
    per-row recomputation). Each row's encoding is micro-quantized to
    int64 and the per-category sums/means of the encodings are
    reported, so every per-row value participates in the hash.

    Scale: one map-side-combinable group sum + a broadcast join back
    — two scan-bound passes; the per-row arithmetic is codegen'd."""
    o = table(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice")).cast("long").alias("v"),
    )
    g = x.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    enc = x.join(F.broadcast(g), "prio").select(
        "prio",
        "n",
        F.round(
            1000000.0 * (F.col("s") - F.col("v")) / (F.col("n") - 1)
        )
        .cast("long")
        .alias("loo_u"),
    )
    return enc.groupBy("prio").agg(
        F.max("n").alias("n"),
        F.sum("loo_u").alias("sum_loo_u"),
        F.round(
            F.sum("loo_u").cast("double") / F.max("n") / 1000000.0, 6
        ).alias("mean_loo"),
    )


@register(
    "embed_norm_outlier_screen",
    oracle="""
        WITH ex AS (
          SELECT vec_id,
                 CAST(list_extract(embedding, i) AS DOUBLE) AS val
          FROM embeddings, range(1, 65) AS t(i)
        ),
        nrm AS (
          SELECT vec_id,
                 CAST(sum(CAST(round(val * val * 1000000000) AS BIGINT))
                      AS BIGINT) AS n2
          FROM ex GROUP BY 1
        ),
        g1 AS (SELECT n2, count(*) AS c FROM nrm GROUP BY 1),
        c1 AS (SELECT n2, CAST(sum(c) OVER (ORDER BY n2
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumn FROM g1),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nrm),
        med AS (SELECT CAST(min(n2) AS BIGINT) AS m
                FROM c1, t WHERE 2 * cumn >= t.n),
        dev AS (SELECT nrm.vec_id, abs(nrm.n2 - med.m) AS d
                FROM nrm, med),
        g2 AS (SELECT d, count(*) AS c FROM dev GROUP BY 1),
        c2 AS (SELECT d, CAST(sum(c) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumn FROM g2),
        mad AS (SELECT CAST(min(d) AS BIGINT) AS mad
                FROM c2, t WHERE 2 * cumn >= t.n)
        SELECT t.n AS n_vectors, med.m AS median_norm2_nano,
               mad.mad AS mad_nano,
               CAST((SELECT count(*) FROM dev, mad
                     WHERE dev.d > 5 * mad.mad) AS BIGINT) AS n_outliers
        FROM t, med, mad
    """,
)
def embed_norm_outlier_screen(spark, sf_dir):
    """Embedding-norm outlier screen — the cheap bad-vector detector
    every embedding pipeline runs before indexing (collapsed or
    exploded norms signal truncated inputs, NaN-ish upstream bugs, or
    adversarial rows): per-vector squared norms are nano-quantized
    int64 sums, the median and the MAD come from integer midpoint
    tests on the distinct-value spines, and the 5-MAD fence count is
    an exact integer comparison — no float anywhere after the
    per-dimension quantization.

    Scale: one exploded-sum pass, two spine prefix-sums, one
    broadcast-scalar filter — all scan-bound."""
    em = table(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id",
        F.explode("embedding").alias("val_raw"),
    ).select("vec_id", F.col("val_raw").cast("double").alias("val"))
    nrm = ex.groupBy("vec_id").agg(
        F.sum(
            F.round(F.col("val") * F.col("val") * 1000000000).cast("long")
        ).alias("n2")
    )
    t = nrm.agg(F.count(F.lit(1)).alias("n"))

    def spine_median(df, col):
        g = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        c = g.select(col, F.sum("c").over(w).alias("cumn"))
        return (
            c.crossJoin(F.broadcast(t))
            .filter(2 * F.col("cumn") >= F.col("n"))
            .agg(F.min(col).alias("m"))
        )

    med = spine_median(nrm, "n2")
    dev = nrm.crossJoin(F.broadcast(med)).select(
        "vec_id", F.abs(F.col("n2") - F.col("m")).alias("d")
    )
    mad = spine_median(dev, "d").withColumnsRenamed({"m": "mad"})
    out = (
        dev.crossJoin(F.broadcast(mad))
        .agg(
            F.count_if(F.col("d") > 5 * F.col("mad")).alias("n_outliers"),
            F.first("mad").alias("mad_nano"),
        )
    )
    return (
        t.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(out))
        .select(
            F.col("n").alias("n_vectors"),
            F.col("m").alias("median_norm2_nano"),
            "mad_nano",
            "n_outliers",
        )
    )


@register("ml_cka_alignment")  # rows-only: float Gram partial merge order
def ml_cka_alignment(spark, sf_dir):
    """Linear Centered Kernel Alignment (CKA) between the full 64-dim
    embedding space and its 16-dim Matryoshka truncation — the
    representation-similarity score (Kornblith et al.) used to ask
    "how much of the geometry survives truncation / a model swap?":
    CKA = ||Xc'Yc||F² / (||Xc'Xc||F · ||Yc'Yc||F) over column-centered
    features. Feature means and the three small Grams (64×16, 64×64,
    16×16) are accumulated in ONE distributed mapInPandas pass as
    fixed-size partials (the procrustes/logreg/pca state shape);
    centering is applied algebraically at the driver
    (Xc'Yc = X'Y − n·mx·my'), so no second scan. Rows-only (float
    partial merge order); tests pin CKA(X,X)=1, the (0,1] range, and
    double-run determinism.

    Scale: one scan, ≤ (64·64+64·16+16·16+80)·8 B ≈ 42 KB of state
    per task — corpus-size-independent alignment cost."""
    import numpy as np
    import pandas as pd

    em = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    D, K = 64, 16

    def partials(batches):
        for pdf in batches:
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            if len(X) == 0:
                continue
            Y = X[:, :K]
            yield pd.DataFrame(
                {
                    "k": [0],
                    "n": [np.int64(len(X))],
                    "bmin": [np.int64(pdf["vec_id"].min())],
                    "sx": [X.sum(axis=0).tolist()],
                    "sy": [Y.sum(axis=0).tolist()],
                    "gxy": [(X.T @ Y).ravel().tolist()],
                    "gxx": [(X.T @ X).ravel().tolist()],
                    "gyy": [(Y.T @ Y).ravel().tolist()],
                }
            )

    pdf = (
        em.mapInPandas(
            partials,
            "k int, n long, bmin long, sx array<double>, sy array<double>, "
            "gxy array<double>, gxx array<double>, gyy array<double>",
        )
        .toPandas()
        .sort_values("bmin")  # deterministic partial merge order
    )
    import numpy as np

    n = int(pdf["n"].sum())
    sx = np.sum(np.stack(pdf["sx"].map(np.asarray)), axis=0)
    sy = np.sum(np.stack(pdf["sy"].map(np.asarray)), axis=0)
    gxy = np.sum(np.stack(pdf["gxy"].map(np.asarray)), axis=0).reshape(D, K)
    gxx = np.sum(np.stack(pdf["gxx"].map(np.asarray)), axis=0).reshape(D, D)
    gyy = np.sum(np.stack(pdf["gyy"].map(np.asarray)), axis=0).reshape(K, K)
    mx, my = sx / n, sy / n
    cxy = gxy - n * np.outer(mx, my)
    cxx = gxx - n * np.outer(mx, mx)
    cyy = gyy - n * np.outer(my, my)
    num = float(np.sum(cxy * cxy))
    den = float(np.sqrt(np.sum(cxx * cxx)) * np.sqrt(np.sum(cyy * cyy)))
    cka = num / den if den > 0 else float("nan")
    out = [(n, K, int(round(1e6 * cka)))]
    return em.sparkSession.createDataFrame(
        out, "n_vectors long, k_dims long, cka_micro long"
    )


@register(
    "ml_precision_recall_curve",
    oracle="""
        WITH s AS (
          SELECT list_extract(embedding, 1) AS s,
                 CAST(label < 5 AS BIGINT) AS pos
          FROM embeddings
        ),
        g AS (
          SELECT s, count(*) AS n_g, CAST(sum(pos) AS BIGINT) AS np_g
          FROM s GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(np_g) AS BIGINT) AS np FROM g),
        c AS (
          SELECT CAST(row_number() OVER (ORDER BY s DESC) AS BIGINT)
                   AS thr_rank,
                 CAST(round(1000000 * CAST(s AS DOUBLE)) AS BIGINT)
                   AS score_micro,
                 CAST(sum(n_g) OVER (ORDER BY s DESC) AS BIGINT)
                   AS cum_n,
                 CAST(sum(np_g) OVER (ORDER BY s DESC) AS BIGINT)
                   AS cum_pos
          FROM g
        )
        SELECT thr_rank, score_micro, cum_n, cum_pos,
               round(CAST(cum_pos AS DOUBLE) / cum_n, 6) AS precision,
               round(CAST(cum_pos AS DOUBLE) / tot.np, 6) AS recall,
               round(2.0 * cum_pos / (cum_n + tot.np), 6) AS f1
        FROM c, tot
    """,
)
def ml_precision_recall_curve(spark, sf_dir):
    """Full precision/recall curve at every distinct score threshold —
    the imbalanced-class companion to ml_auc_roc (ROC flatters
    skewed-positive problems; PR curves do not). Ties are merged on
    the distinct-score spine first, so both engines see identical
    threshold steps; cum counts are exact int64 prefix sums and
    precision/recall/F1 are identical double expressions (F1 uses the
    integer identity 2·TP/(pred_pos + actual_pos) — no intermediate
    P·R rounding). Scores surface as micro-quantized ints, never raw
    floats, keeping the hash comparison byte-stable.

    Scale: map-side-combinable groupBy to the distinct-score spine;
    prefix sums only on that spine. For a 100 TB score table the
    spine is bucketed to a fixed grid first (same move as
    ml_calibration_bins) — the curve consumer never needs more than
    ~1e4 threshold points."""
    em = table(spark, sf_dir, "embeddings")
    s = em.select(
        F.element_at("embedding", 1).alias("s"),
        (F.col("label") < 5).cast("long").alias("pos"),
    )
    g = s.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("pos").alias("np_g")
    )
    tot = g.agg(F.sum("np_g").alias("np"))
    wdesc = Window.orderBy(F.desc("s"))
    c = g.select(
        F.row_number().over(wdesc).cast("long").alias("thr_rank"),
        F.round(1000000 * F.col("s").cast("double"))
        .cast("long")
        .alias("score_micro"),
        F.sum("n_g")
        .over(wdesc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_n"),
        F.sum("np_g")
        .over(wdesc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_pos"),
    )
    return c.crossJoin(F.broadcast(tot)).select(
        "thr_rank",
        "score_micro",
        "cum_n",
        "cum_pos",
        F.round(F.col("cum_pos").cast("double") / F.col("cum_n"), 6).alias(
            "precision"
        ),
        F.round(F.col("cum_pos").cast("double") / F.col("np"), 6).alias(
            "recall"
        ),
        F.round(
            2.0 * F.col("cum_pos") / (F.col("cum_n") + F.col("np")), 6
        ).alias("f1"),
    )


@register(
    "ml_threshold_youden_j",
    oracle="""
        WITH s AS (
          SELECT list_extract(embedding, 1) AS s,
                 CAST(label < 5 AS BIGINT) AS pos
          FROM embeddings
        ),
        g AS (
          SELECT s, count(*) AS n_g, CAST(sum(pos) AS BIGINT) AS np_g
          FROM s GROUP BY 1
        ),
        tot AS (
          SELECT CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(np_g) AS BIGINT) AS np
          FROM g
        ),
        c AS (
          SELECT CAST(round(1000000 * CAST(s AS DOUBLE)) AS BIGINT)
                   AS score_micro,
                 CAST(sum(np_g) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
                 CAST(sum(n_g - np_g) OVER (ORDER BY s DESC) AS BIGINT)
                   AS fp
          FROM g
        ),
        j AS (
          SELECT score_micro, tp, fp,
                 round(CAST(tp AS DOUBLE) / tot.np, 6) AS tpr,
                 round(CAST(fp AS DOUBLE) / (tot.n - tot.np), 6) AS fpr,
                 tp * (tot.n - tot.np) - fp * tot.np AS j_scaled
          FROM c, tot
        ),
        best AS (SELECT max(j_scaled) AS bj FROM j)
        SELECT score_micro, tp, fp, tpr, fpr,
               round(tpr - fpr, 6) AS youden_j,
               CAST(j_scaled = best.bj AS BIGINT) AS is_best
        FROM j, best
    """,
)
def ml_threshold_youden_j(spark, sf_dir):
    """Youden's J threshold selection — the standard way to pick a
    classifier's operating point from the ROC spine: J = TPR − FPR
    per distinct-score threshold, with the argmax flagged. The argmax
    comparison runs on the INTEGER cross-multiplied form
    tp·N_neg − fp·N_pos (exactly monotone in J), so tie-breaking and
    the best-row flag are pure int64 equality — no double compare
    anywhere near the decision; TPR/FPR/J surface as rounded doubles.

    Scale: identical contract to ml_precision_recall_curve — one
    map-side-combinable pass to the distinct-score spine, prefix sums
    and the scalar max on the spine only."""
    em = table(spark, sf_dir, "embeddings")
    s = em.select(
        F.element_at("embedding", 1).alias("s"),
        (F.col("label") < 5).cast("long").alias("pos"),
    )
    g = s.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("pos").alias("np_g")
    )
    tot = g.agg(F.sum("n_g").alias("n"), F.sum("np_g").alias("np"))
    wcum = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = g.select(
        F.round(1000000 * F.col("s").cast("double"))
        .cast("long")
        .alias("score_micro"),
        F.sum("np_g").over(wcum).alias("tp"),
        F.sum(F.col("n_g") - F.col("np_g")).over(wcum).alias("fp"),
    )
    j = c.crossJoin(F.broadcast(tot)).select(
        "score_micro",
        "tp",
        "fp",
        F.round(F.col("tp").cast("double") / F.col("np"), 6).alias("tpr"),
        F.round(
            F.col("fp").cast("double") / (F.col("n") - F.col("np")), 6
        ).alias("fpr"),
        (
            F.col("tp") * (F.col("n") - F.col("np"))
            - F.col("fp") * F.col("np")
        ).alias("j_scaled"),
    )
    best = j.agg(F.max("j_scaled").alias("bj"))
    return j.crossJoin(F.broadcast(best)).select(
        "score_micro",
        "tp",
        "fp",
        "tpr",
        "fpr",
        F.round(F.col("tpr") - F.col("fpr"), 6).alias("youden_j"),
        (F.col("j_scaled") == F.col("bj")).cast("long").alias("is_best"),
    )


@register(
    "embed_isotropy_score",
    oracle="""
        WITH ex AS (
          SELECT vec_id, CAST(i AS INT) AS pos,
                 CAST(round(1000000 * CAST(list_extract(embedding, i)
                      AS DOUBLE)) AS BIGINT) AS u
          FROM embeddings, range(1, 65) AS t(i)
        ),
        dims AS (
          SELECT pos, CAST(sum(u) AS BIGINT) AS s FROM ex GROUP BY 1
        ),
        top AS (
          SELECT CAST(sum(CAST(round(CAST(s AS DOUBLE) * s / 1000000.0)
                   AS BIGINT)) AS BIGINT) AS t_mega
          FROM dims
        ),
        rw AS (
          SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n,
                 CAST(sum(u * u) AS BIGINT) AS ss
          FROM ex
        )
        SELECT rw.n AS n_vectors,
               round(CAST(rw.ss AS DOUBLE) / rw.n / 1e12, 6)
                 AS mean_norm_sq,
               round((CAST(top.t_mega AS DOUBLE) * 1000000.0 - rw.ss)
                     / (CAST(rw.n AS DOUBLE) * (rw.n - 1)) / 1e12, 6)
                 AS mean_pairwise_cosine
        FROM rw, top
    """,
)
def embed_isotropy_score(spark, sf_dir):
    """Embedding-space isotropy score — the representation-collapse
    screen (Ethayarajh-style): the mean pairwise cosine over ALL n²
    vector pairs, computed WITHOUT any pair join via the exact
    identity Σ_{i≠j} v_i·v_j = ||Σv||² − Σ||v_i||². Near 0 = isotropic
    (healthy spread); near 1 = collapsed embeddings that wreck every
    downstream cosine ranking. Components quantize to integer
    micro-units first, so the per-dimension sums and the Σ||u||² total
    are exact int64; each dimension's squared sum is mega-quantized
    before the 64-term fold (shuffle-order-proof), and the final
    expression is one identical double in both engines. The fixture's
    vectors are pre-normalized (embed_normalize proves it), so dot is
    cosine.

    Scale: ONE map-side-combinable pass — the shuffle carries 64
    dimension sums plus two scalars, never a pair. The O(n²)
    semantics at O(n) cost is the whole trick; contrast with the
    declared-brute embed_cosine_neardup anchor."""
    em = table(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(1000000 * x.cast("double")).cast("long"),
            )
        ).alias("pos", "u"),
    )
    dims = ex.groupBy("pos").agg(F.sum("u").alias("s"))
    top = dims.agg(
        F.sum(
            F.round(F.col("s").cast("double") * F.col("s") / 1000000.0)
            .cast("long")
        ).alias("t_mega")
    )
    rw = ex.agg(
        F.countDistinct("vec_id").alias("n"),
        F.sum(F.col("u") * F.col("u")).alias("ss"),
    )
    return rw.crossJoin(F.broadcast(top)).select(
        F.col("n").alias("n_vectors"),
        F.round(
            F.col("ss").cast("double") / F.col("n") / 1e12, 6
        ).alias("mean_norm_sq"),
        F.round(
            (F.col("t_mega").cast("double") * 1000000.0 - F.col("ss"))
            / (F.col("n").cast("double") * (F.col("n") - 1))
            / 1e12,
            6,
        ).alias("mean_pairwise_cosine"),
    )


@register(
    "ml_log_loss",
    oracle="""
        WITH s AS (
          SELECT 1.0 / (1.0 + exp(-4.0 * CAST(list_extract(embedding, 1)
                   AS DOUBLE))) AS p,
                 CAST(label < 5 AS BIGINT) AS y
          FROM embeddings
        ),
        q AS (
          SELECT y,
                 CAST(round(-1000000.0 *
                   (y * ln(p) + (1 - y) * ln(1.0 - p))) AS BIGINT)
                   AS loss_micro
          FROM s
        )
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum(loss_micro) AS BIGINT) AS sum_loss_micro,
               round(CAST(sum(loss_micro) AS DOUBLE) / count(*)
                     / 1000000.0, 6) AS mean_log_loss
        FROM q
    """,
)
def ml_log_loss(spark, sf_dir):
    """Cross-entropy (log loss) of a sigmoid-calibrated score — the
    proper scoring rule that punishes CONFIDENT wrong predictions
    where accuracy and even Brier stay polite; the metric gradient-
    trained classifiers actually optimize, evaluated here the
    distributed way: the raw score is squashed through a fixed
    sigmoid p = σ(4s), each row's −[y·ln p + (1−y)·ln(1−p)] is an
    identical double expression quantized to integer micro-nats
    BEFORE the fold, so the corpus sum is exact int64 and
    shuffle-order-proof; the mean divides once at the end.

    Scale: map-only per-row math feeding one map-side-combinable
    aggregate — scan-bound, no spine, no join; the same shape at
    100 TB with the per-partition partial sums doing all the work."""
    em = table(spark, sf_dir, "embeddings")
    p = 1.0 / (
        1.0 + F.exp(-4.0 * F.element_at("embedding", 1).cast("double"))
    )
    y = (F.col("label") < 5).cast("long")
    s = em.select(p.alias("p"), y.alias("y"))
    q = s.select(
        "y",
        F.round(
            -1000000.0
            * (
                F.col("y") * F.log(F.col("p"))
                + (1 - F.col("y")) * F.log(1.0 - F.col("p"))
            )
        )
        .cast("long")
        .alias("loss_micro"),
    )
    return q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum("loss_micro").alias("sum_loss_micro"),
        F.round(
            F.sum("loss_micro").cast("double")
            / F.count(F.lit(1))
            / 1000000.0,
            6,
        ).alias("mean_log_loss"),
    )


@register(
    "ml_calibration_ece",
    oracle="""
        WITH s AS (
          SELECT CAST(list_extract(embedding, 1) AS DOUBLE) AS x,
                 CAST(label < 5 AS BIGINT) AS pos
          FROM embeddings
        ),
        mm AS (SELECT min(x) AS lo, max(x) AS hi FROM s),
        b AS (
          SELECT least(9, CAST(floor((x - lo) / (hi - lo) * 10)
                               AS BIGINT)) AS bin,
                 pos,
                 CAST(round((x - lo) / (hi - lo) * 1000000) AS BIGINT)
                   AS conf_u
          FROM s, mm
        ),
        g AS (
          SELECT bin, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(pos) AS BIGINT) AS n_pos,
                 CAST(sum(conf_u) AS BIGINT) AS sum_conf_u
          FROM b GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g)
        SELECT CAST(count(*) AS BIGINT) AS n_bins,
               max(tot.nt) AS n_scored,
               round(sum(
                 (CAST(n AS DOUBLE) / tot.nt)
                 * abs(CAST(n_pos AS DOUBLE) / n
                       - CAST(sum_conf_u AS DOUBLE) / n / 1000000.0)
               ), 6) AS ece,
               round(max(
                 abs(CAST(n_pos AS DOUBLE) / n
                     - CAST(sum_conf_u AS DOUBLE) / n / 1000000.0)
               ), 6) AS mce
        FROM g, tot
    """,
)
def ml_calibration_ece(spark, sf_dir):
    """Expected / Maximum Calibration Error — the scalar verdict on
    ml_calibration_bins' reliability diagram: per bin, |empirical
    positive rate − mean predicted confidence|, weighted by bin mass
    (ECE) and taken at worst (MCE) — the acceptance gate before
    anyone treats a model score as a probability. Confidences are the
    same min-max-normalized micro-quantized ints as the bins op, so
    every per-bin statistic is exact int64 and the error terms are
    identical double expressions; the ≤10-term final fold runs on the
    bin spine where ordering cannot bite (sum of ≤10 identical
    doubles after a groupBy on a 10-row relation in one partition).

    Scale: identical contract to ml_calibration_bins — scalar min/max
    broadcast, one combinable pass to 10 bins, constant-size fold."""
    em = table(spark, sf_dir, "embeddings")
    s = em.select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        (F.col("label") < 5).cast("long").alias("pos"),
    )
    mm = s.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    norm = (F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    b = s.crossJoin(F.broadcast(mm)).select(
        F.least(F.lit(9), F.floor(norm * 10).cast("long")).alias("bin"),
        "pos",
        F.round(norm * 1000000).cast("long").alias("conf_u"),
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").alias("n_pos"),
        F.sum("conf_u").alias("sum_conf_u"),
    ).coalesce(1)
    tot = g.agg(F.sum("n").alias("nt"))
    gap = F.abs(
        F.col("n_pos").cast("double") / F.col("n")
        - F.col("sum_conf_u").cast("double") / F.col("n") / 1000000.0
    )
    return g.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.max("nt").alias("n_scored"),
        F.round(
            F.sum((F.col("n").cast("double") / F.col("nt")) * gap), 6
        ).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
    )


@register(
    "embed_dim_variance_rank",
    oracle="""
        WITH ex AS (
          SELECT CAST(i AS INT) AS dim,
                 CAST(round(1000000 * CAST(list_extract(embedding, i)
                      AS DOUBLE)) AS BIGINT) AS u
          FROM embeddings, range(1, 65) AS t(i)
        ),
        d AS (
          SELECT dim, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(u) AS BIGINT) AS s,
                 CAST(sum(u * u) AS BIGINT) AS s2
          FROM ex GROUP BY 1
        ),
        v AS (
          SELECT dim, n,
                 (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (n - 1) / 1e12 AS var
          FROM d
        )
        SELECT CAST(dim AS BIGINT) AS dim,
               round(var, 6) AS variance,
               CAST(rank() OVER (ORDER BY var DESC, dim) AS BIGINT)
                 AS var_rank,
               CAST(rank() OVER (ORDER BY var DESC, dim) <= 16 AS BIGINT)
                 AS in_top16
        FROM v
    """,
)
def embed_dim_variance_rank(spark, sf_dir):
    """Per-dimension variance ranking of the embedding space — the
    feature-selection screen behind Matryoshka-style truncation
    (embed_matryoshka_recall assumes the FIRST 16 dims carry the
    signal; this op measures which dims actually do): sample variance
    per dimension from micro-quantized exact int64 moments, ranked
    descending with a top-16 membership flag. A healthy trained
    embedding concentrates variance in leading dims; uniform variance
    says truncation will cost recall.

    Scale: one map-only explode to (dim, component) feeding a
    64-group combinable aggregate; the ranking window runs on the
    64-row dim spine."""
    em = table(spark, sf_dir, "embeddings")
    ex = em.select(
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(1000000 * x.cast("double")).cast("long"),
            )
        ).alias("dim0", "u")
    ).select((F.col("dim0") + 1).alias("dim"), "u")
    d = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("s"),
        F.sum(F.col("u") * F.col("u")).alias("s2"),
    )
    var = (
        (
            F.col("s2").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
        / 1e12
    )
    v = d.select("dim", var.alias("var"))
    w = Window.orderBy(F.desc("var"), F.asc("dim"))
    return v.select(
        F.col("dim").cast("long").alias("dim"),
        F.round("var", 6).alias("variance"),
        F.rank().over(w).cast("long").alias("var_rank"),
        (F.rank().over(w) <= 16).cast("long").alias("in_top16"),
    )


BT_ITERS = 5


def _bt_oracle_sql():
    """Fully-unrolled Zermelo/MM Bradley-Terry fit: one MATERIALIZED
    CTE pair (ordered-fold denominator, normalized micro update) per
    iteration, restating the engine's driver-side loop term for term —
    every double operation is spelled in the same order (list_reduce
    over ORDER BY partner ≡ Python's sorted accumulation), so the
    trajectory is bit-identical and the final scores value-hash."""
    head = f"""
    WITH tot AS MATERIALIZED (
      SELECT user_id, event_type,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    duel AS MATERIALIZED (
      SELECT CASE WHEN a.cents > b.cents THEN a.event_type
                  ELSE b.event_type END AS winner,
             CASE WHEN a.cents > b.cents THEN b.event_type
                  ELSE a.event_type END AS loser
      FROM tot a JOIN tot b ON a.user_id = b.user_id
                           AND a.event_type < b.event_type
      WHERE a.cents <> b.cents),
    ndir AS MATERIALIZED (
      SELECT winner, loser, CAST(count(*) AS BIGINT) AS n
      FROM duel GROUP BY 1, 2),
    items AS MATERIALIZED (
      SELECT winner AS item FROM ndir
      UNION SELECT loser FROM ndir),
    ntot AS MATERIALIZED (
      SELECT i, j, CAST(sum(n) AS BIGINT) AS n FROM (
        SELECT winner AS i, loser AS j, n FROM ndir
        UNION ALL SELECT loser AS i, winner AS j, n FROM ndir)
      GROUP BY 1, 2),
    wtot AS MATERIALIZED (
      SELECT it.item, CAST(coalesce(sum(d.n), 0) AS BIGINT) AS w
      FROM items it LEFT JOIN ndir d ON d.winner = it.item GROUP BY 1),
    kk AS (SELECT count(*) AS k FROM items),
    w0 AS MATERIALIZED (
      SELECT item, CAST(floor(1000000.0 / kk.k + 0.5) AS BIGINT) AS wm
      FROM items, kk)"""
    steps = []
    for t in range(BT_ITERS):
        steps.append(f"""
    d{t} AS MATERIALIZED (
      SELECT s.i AS item,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(s.n / (wi.wm / 1000000.0 + wj.wm / 1000000.0)
                    ORDER BY s.j)),
               (a, b) -> a + b) AS denom
      FROM ntot s
      JOIN w{t} wi ON wi.item = s.i
      JOIN w{t} wj ON wj.item = s.j
      GROUP BY s.i),
    r{t} AS MATERIALIZED (
      SELECT it.item,
             CASE WHEN d.denom > 0 THEN wt.w / d.denom ELSE 0.0 END AS wraw
      FROM items it
      JOIN wtot wt ON wt.item = it.item
      LEFT JOIN d{t} d ON d.item = it.item),
    s{t} AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(wraw ORDER BY item)), (a, b) -> a + b) AS s
      FROM r{t}),
    w{t + 1} AS MATERIALIZED (
      SELECT item, CAST(floor(1000000.0 * (wraw / s{t}.s) + 0.5) AS BIGINT)
               AS wm
      FROM r{t}, s{t})""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT w.item AS event_type, wt.w AS n_wins,
           (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM ntot
            WHERE i = w.item) AS n_comparisons,
           w.wm AS bt_score_micro,
           CAST(row_number() OVER (ORDER BY w.wm DESC, w.item) AS BIGINT)
             AS bt_rank
    FROM w{BT_ITERS} w JOIN wtot wt ON wt.item = w.item
    ORDER BY bt_rank"""
    )


@register("ml_bradley_terry_rank", oracle=_bt_oracle_sql())
def ml_bradley_terry_rank(spark, sf_dir):
    """Bradley-Terry preference fit — the model behind RLHF reward
    aggregation, chess/LLM leaderboards, and pairwise human-eval
    dashboards: items (event types) accrue pairwise duels (per user,
    of two types the one with the larger exact-cents value total
    wins; ties abstain), and BT strengths are fit with
    {BT_ITERS} Zermelo/MM iterations
    w_i ← W_i / Σ_j n_ij/(w_i+w_j), normalized and
    micro-quantized per iteration so the whole trajectory is
    engine-exact (the unrolled-CTE discipline of kmeans/pagerank).

    The DISTRIBUTED part is the duel construction and counting (one
    user-keyed join + one combinable groupBy — at 100 TB the duel
    table is the big object); the fit itself runs driver-side over
    the k×k count matrix (k = item cardinality, bounded tiny — the
    d×d Gram / k-centroid precedent) and the oracle unrolls the same
    arithmetic, ordered fold for ordered fold, in SQL. Output:
    strength scores (micro), win/comparison counts, and the final
    leaderboard rank."""
    import math

    e = table(spark, sf_dir, "events")
    tot = e.groupBy("user_id", "event_type").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    a, b = tot.alias("a"), tot.alias("b")
    duel = (
        a.join(b, "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .filter(F.col("a.cents") != F.col("b.cents"))
        .select(
            F.when(
                F.col("a.cents") > F.col("b.cents"), F.col("a.event_type")
            )
            .otherwise(F.col("b.event_type"))
            .alias("winner"),
            F.when(
                F.col("a.cents") > F.col("b.cents"), F.col("b.event_type")
            )
            .otherwise(F.col("a.event_type"))
            .alias("loser"),
        )
    )
    ndir = {
        (r["winner"], r["loser"]): r["n"]
        for r in duel.groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    items = sorted({x for pair in ndir for x in pair})
    k = len(items)
    wins = {i: sum(c for (w, l), c in ndir.items() if w == i) for i in items}
    ntot: dict = {}
    for (w, l), c in ndir.items():
        ntot[(w, l)] = ntot.get((w, l), 0) + c
        ntot[(l, w)] = ntot.get((l, w), 0) + c
    wm = {i: int(math.floor(1000000.0 / k + 0.5)) for i in items}
    for _t in range(BT_ITERS):
        wraw = {}
        for i in items:
            denom = 0.0
            for j in items:  # sorted — matches the oracle's ORDER BY fold
                if j == i or (i, j) not in ntot:
                    continue
                denom += ntot[(i, j)] / (wm[i] / 1000000.0 + wm[j] / 1000000.0)
            wraw[i] = wins[i] / denom if denom > 0 else 0.0
        s = 0.0
        for i in items:
            s += wraw[i]
        wm = {
            i: int(math.floor(1000000.0 * (wraw[i] / s) + 0.5)) for i in items
        }
    ranked = sorted(items, key=lambda i: (-wm[i], i))
    rows = [
        (
            i,
            wins[i],
            sum(c for (x, _j), c in ntot.items() if x == i),
            wm[i],
            ranked.index(i) + 1,
        )
        for i in items
    ]
    return spark.createDataFrame(
        rows,
        "event_type string, n_wins long, n_comparisons long,"
        " bt_score_micro long, bt_rank long",
    ).orderBy("bt_rank")
