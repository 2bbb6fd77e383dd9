"""2.L corpus intake-pipeline STREAMS: the gate+dedup composite as
one checkpointed stream, its capped production form, the full index
lifecycle (compaction + GC), and takedown propagation through the
composite.

Split out of textops.py (round 9, the repo's 4k-line module
discipline) with zero behavior change; every op keeps its registered
id, oracle, and plan shape. The DSIR gate primitives (features,
frozen model, ROUTER_SQL) stay in textops and are imported here; the
dedup/stream primitives come from dedup_stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register, table
from .textops import (
    ROUTER_SQL,
    _dsir_features,
    _dsir_frozen_gate,
)

def _intake_pipeline_sql(capped=False, takedown=False):
    """ROUTER_SQL (frozen gate + calibrated threshold, nested WITH)
    composed with the minhash first-partner dedup RESTRICTED to the
    kept set: the shared minhash CTEs re-sourced from `kept` the same
    way the recall audit re-sources them from its skewed corpus.
    ``capped=True`` additionally splices the arrival-prefix
    cumulative-bucket rule (dedup_stream.CAND_CTE_CAPPED) over the
    kept set's bands — batch ids still come from the FULL corpus's id
    range (the engine derives them from arrival order, which the gate
    does not change). ``takedown=True`` restricts the kept set to the
    REDUCED corpus (the takedown cohort that arrived by the boundary
    removed) — the router itself is NOT restated: the frozen gate
    model and threshold are batch-0 aggregates published before any
    takedown, retained like the ANN codebook."""
    from .dedup import _MH_COMMON_CTES, JACCARD_THRESHOLD, N_INC_BATCHES
    from .dedup_stream import (
        CAND_CTE_CAPPED,
        CAND_CTE_PLAIN,
        TD_AFTER,
        TD_MOD,
        TD_RES,
    )

    td_cond = (
        f"""
          AND NOT (d.doc_id % {TD_MOD} = {TD_RES}
              AND ({N_INC_BATCHES} * d.doc_id) //
                  ((SELECT max(doc_id) FROM documents) + 1)
                  <= {TD_AFTER})"""
        if takedown
        else ""
    )
    old = (
        "WITH t AS (SELECT doc_id, string_split(text, ' ')"
        " AS toks FROM documents),"
    )
    new = f"""WITH router AS MATERIALIZED ({ROUTER_SQL}),
    kept AS MATERIALIZED (
        SELECT d.doc_id, d.text FROM documents d
        JOIN router r ON r.doc_id = d.doc_id
        WHERE r.route = 'kept'{td_cond}),
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM kept),"""
    assert old in _MH_COMMON_CTES
    ctes = _MH_COMMON_CTES.replace(old, new)
    if capped:
        assert CAND_CTE_PLAIN in ctes
        ctes = ctes.replace(CAND_CTE_PLAIN, CAND_CTE_CAPPED)
    return f"""{ctes},
    common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
               FROM cand c
               JOIN sh x ON x.doc_id = c.doc_a
               JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
               GROUP BY 1, 2),
    near AS MATERIALIZED (
        SELECT doc_a, doc_b, n_common / (sa.n + sb.n - n_common) AS jaccard
        FROM common
        JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
        WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}),
    ranked AS (
        SELECT doc_b AS doc_id, doc_a, jaccard,
               row_number() OVER (PARTITION BY doc_b ORDER BY doc_a) AS rn
        FROM near)
    SELECT r.doc_id, r.batch_id, r.dsir_weight_micro,
           CASE WHEN r.route = 'rejected' THEN 'rejected'
                WHEN k.doc_a IS NOT NULL THEN 'kept_dup'
                ELSE 'kept' END AS route,
           CAST(coalesce(k.doc_a, -1) AS BIGINT) AS dup_of,
           CAST(coalesce(CAST(floor(k.jaccard * 1000000 + 0.5) AS BIGINT),
                         -1) AS BIGINT) AS jaccard_micro
    FROM router r
    LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) k
           ON k.doc_id = r.doc_id
"""


@register("stream_corpus_prep_e2e", oracle=_intake_pipeline_sql())
def stream_corpus_prep_e2e(spark, sf_dir):
    """The corpus INTAKE PIPELINE as one checkpointed stream — the
    quality gate and the dedup index COMPOSED, the way they actually
    run in front of a 100 TB corpus store: per arriving increment,
    documents are scored against the batch-0-frozen DSIR gate
    (broadcast model join, calibrated median threshold — the exact
    `_dsir_frozen_gate` the router op ships), and only the KEPT
    documents are shingled, banded, and run through the incremental
    LSH core (`_inc_lsh_dedupe_batch`) against a persisted index that
    accumulates ONLY kept documents. One sink row per document:
    rejected / kept / kept_dup with the duplicate's first partner and
    micro-quantized jaccard.

    The composed oracle is the composition of the two proven
    statements: ROUTER_SQL's kept set feeding the minhash
    first-partner dedup re-sourced from `kept` — valid because the
    composition is order-insensitive end to end (the gate is frozen
    before any routed batch, keeping decisions are per-document, and
    the first-partner rule is lowest-id, so slicing into increments
    cannot change any output row). The value hash therefore proves
    gate, dedup, their interaction (rejected docs NEVER enter the
    index — asserted structurally by construction: only kept rows are
    banded), and the streaming machinery at once.
    Kill/restart across a torn batch is covered by
    tests/test_streaming.py::test_corpus_prep_stream_restart.

    Scale shape: per increment one map-only feature hash + broadcast
    model join (O(batch)·1), then the dedup core's O(batch) banding
    and band-key equi-join against the kept-only index — strictly
    cheaper than dedup-then-gate, which would band documents the gate
    was about to drop; the index holds only documents that survive
    intake, which is also the governance-correct retention set."""
    from ..registry import scratch_dir

    base = scratch_dir("stream_corpus_prep_e2e")
    return run_corpus_prep_stream(spark, sf_dir, base)


@register(
    "stream_corpus_prep_capped_e2e", oracle=_intake_pipeline_sql(capped=True)
)
def stream_corpus_prep_capped_e2e(spark, sf_dir):
    """The composed intake pipeline WITH the stop-bucket guard — the
    form that actually fronts a 100 TB corpus store (round-8 verdict
    item 2: stream_corpus_prep_e2e composed the gate and the dedup
    index but called the dedup core uncapped, re-opening the exact
    megabucket fan-out dedup_incremental_lsh_capped closed). Identical
    rig; ``bucket_cap`` threads through to `_inc_lsh_dedupe_batch`, so
    per-(band, band_key) counts persist as ``counts/gen=N`` inside the
    same replay unit and a key whose accumulated KEPT-set size exceeds
    the cap emits no pairs from that batch on — arrival-prefix
    semantics over the kept stream.

    The oracle is the composed statement with the cumulative-bucket
    CTE spliced over the kept set's bands (batch ids from the full
    corpus's id ranges — the gate drops documents but does not renumber
    arrivals). Capped ⊆ uncapped on the composite and the torn-state
    restart are covered in tests/test_streaming.py.

    Scale: the composed per-increment cost gains one combinable counts
    aggregate and one broadcastable allowed-key semi-join; in exchange
    a boilerplate megabucket inside the KEPT stream — the gate screens
    for quality, not redundancy, so boilerplate sails through it —
    can no longer quadratically blow up the index join."""
    from .dedup import LSH_BUCKET_CAP
    from ..registry import scratch_dir

    base = scratch_dir("stream_corpus_prep_capped_e2e")
    return run_corpus_prep_stream(
        spark, sf_dir, base, bucket_cap=LSH_BUCKET_CAP
    )


@register(
    "stream_corpus_prep_lifecycle_e2e",
    oracle=_intake_pipeline_sql(capped=True),
)
def stream_corpus_prep_lifecycle_e2e(spark, sf_dir):
    """The composed intake pipeline's FULL index lifecycle — the
    capped gate+dedup composite WITH mid-stream compaction and
    commit-watermark GC of its kept-set index, i.e. the shape the one
    pipeline actually holds in front of a 100 TB corpus store year
    over year: frozen gate → capped incremental dedup of kept docs →
    after the boundary increment, the kept-set index's generations
    (bands, shingles, AND the cap's counts folded into one cumulative
    counts_c) compact behind the write-last marker → dead generations
    GC'd once the commit watermark passes → restart on the gutted
    index re-serves rows that still value-hash against the capped
    composed statement.

    In-op proofs from the recorded read paths: the post-boundary
    increment resolved its bucket sizes from exactly ONE compacted
    counts artifact and deduped against bands_c — never a
    compacted-away generation. Everything here is the discipline the
    dedicated dedup stream proved (`_compact_index_generations`,
    `_marker_gated_reader`, `_gc_index_generations`), composed into
    the intake rig — one mechanism, every pipeline.

    Scale: the composite's per-increment cost is unchanged until the
    boundary; after it the index join reads COMPACT_FILES bucket-
    shaped files and the cap lookup one artifact — the intake pipeline
    no longer slows down with stream age."""
    import os

    from ..registry import scratch_dir
    from .dedup import LSH_BUCKET_CAP, N_INC_BATCHES
    from .dedup_stream import _gc_index_generations

    base = scratch_dir("stream_corpus_prep_lifecycle_e2e")
    boundary = N_INC_BATCHES - 2
    clog, rlog = [], []
    run_corpus_prep_stream(
        spark, sf_dir, base, bucket_cap=LSH_BUCKET_CAP,
        compact_after=boundary, counts_paths_log=clog,
        read_paths_log=rlog,
    )
    post_c = [(b, p) for (b, p) in clog if b > boundary]
    post_r = [(b, p) for (b, p) in rlog if b > boundary]
    if not post_c or not post_r:
        raise AssertionError("no post-compaction increment was processed")
    for b, paths in post_c:
        n_art = sum(1 for p in paths if p.endswith("/counts_c"))
        stale = [
            p
            for p in paths
            if "/counts/gen=" in p
            and int(p.rsplit("=", 1)[1]) <= boundary
        ]
        if n_art != 1 or stale:
            raise AssertionError(
                f"increment {b} read {n_art} counts artifacts plus"
                f" compacted-away generations {stale}"
            )
    for b, paths in post_r:
        if not any(p.endswith("/bands_c") for p in paths):
            raise AssertionError(
                f"increment {b} did not dedupe against the compacted"
                " index"
            )
    idx, ckpt = f"{base}/index", f"{base}/ckpt"
    removed = _gc_index_generations(ckpt, idx)
    if len(removed) != 3 * (boundary + 1):
        raise AssertionError(
            f"GC removed {removed}, expected bands+shingles+counts for"
            f" generations 0..{boundary}"
        )
    for g in range(boundary + 1, N_INC_BATCHES):
        if not os.path.exists(f"{idx}/bands/gen={g}"):
            raise AssertionError(
                f"GC overreached: post-boundary generation {g} deleted"
            )
    return run_corpus_prep_stream(
        spark, sf_dir, base, bucket_cap=LSH_BUCKET_CAP,
        compact_after=boundary,
    )


def _intake_delete_sql():
    """Two-regime restatement of takedown through the COMPOSED intake
    (the delete twin of _delete_e2e_sql, over the composite): rows up
    to the boundary are the full composed statement minus the cohort's
    own rows; rows past it are the composed statement with the kept
    set restricted to the reduced corpus. The frozen gate model and
    threshold are batch-0 aggregates published before the takedown and
    are retained (the ANN-codebook argument), so the router CTE is
    identical in both regimes."""
    from .dedup_stream import TD_AFTER, TD_MOD, TD_RES

    cols = "doc_id, batch_id, dsir_weight_micro, route, dup_of, jaccard_micro"
    return f"""WITH pre AS MATERIALIZED ({_intake_pipeline_sql()}),
    post AS MATERIALIZED ({_intake_pipeline_sql(takedown=True)})
    SELECT {cols} FROM pre
    WHERE batch_id <= {TD_AFTER} AND doc_id % {TD_MOD} != {TD_RES}
    UNION ALL
    SELECT {cols} FROM post WHERE batch_id > {TD_AFTER}
"""


@register("stream_corpus_prep_delete_e2e", oracle=_intake_delete_sql())
def stream_corpus_prep_delete_e2e(spark, sf_dir):
    """Document DELETE propagated through the COMPOSED intake pipeline
    — takedown meeting the gate+dedup composite, completing the
    delete-propagation suite (dedup stream, ANN batch, ANN stream, and
    now the one pipeline): after the boundary increment commits, the
    cohort's rows are purged from every kept-set index generation
    (purged twins + tombstones + write-last marker, the exact
    `_apply_takedown` the dedup stream uses), the served sink
    partitions drop the cohort's own route rows, and LATER increments
    dedupe against the purged index — a kept doc whose first partner
    was taken down re-matches to its next surviving kept partner. The
    frozen gate model and threshold are retained (batch-0 aggregates
    published pre-takedown — the codebook argument; retraining is a
    separate governance decision), so rejected/kept decisions for
    surviving docs never change.

    In-op proofs: the post-boundary increment read ONLY purged twins
    for the covered prefix (recorded paths), no surviving index shard
    holds a tombstoned id (fs completeness audit after the originals
    GC under the marker-AND-commit-watermark rule), and the restarted
    stream on the gutted index re-serves rows that value-hash against
    the two-regime composed statement. The torn state across the
    boundary is pinned by
    tests/test_streaming.py::test_corpus_prep_takedown_restart.

    Scale shape: identical to the dedup stream's delete — filter-
    rewrites riding partition-pruned scans, driver-side GC, one
    broadcast-tombstone audit scan; intake throughput unchanged."""
    import os

    from ..registry import scratch_dir
    from .dedup import N_INC_BATCHES
    from .dedup_stream import (
        TD_AFTER,
        _gc_generations,
    )

    base = scratch_dir("stream_corpus_prep_delete_e2e")
    rlog = []
    run_corpus_prep_stream(
        spark, sf_dir, base, delete_after=TD_AFTER, read_paths_log=rlog
    )
    post = [(b, p) for (b, p) in rlog if b > TD_AFTER]
    if not post:
        raise AssertionError("no post-takedown increment was processed")
    for b, paths in post:
        covered = [p for p in paths if "/bands_p/gen=" in p]
        stale = [
            p
            for p in paths
            if "/bands/gen=" in p
            and int(p.rsplit("=", 1)[1]) <= TD_AFTER
        ]
        if len(covered) != TD_AFTER + 1 or stale:
            raise AssertionError(
                f"increment {b} served {paths}; expected purged twins"
                " for the covered prefix only"
            )
    idx, ckpt = f"{base}/index", f"{base}/ckpt"
    removed = _gc_generations(
        ckpt, idx, ("bands", "shingles"), marker_name="takedown_upto"
    )
    if len(removed) != 2 * (TD_AFTER + 1):
        raise AssertionError(
            f"takedown GC removed {removed}, expected bands+shingles"
            f" originals for generations 0..{TD_AFTER}"
        )
    # completeness: no surviving kept-set index shard — and no
    # arrival copy in the staged feed (`_purge_feed`, safe here
    # because the GC just proved the covered batches can never
    # replay) — holds a tombstoned id
    from .dedup_stream import (
        _audit_no_tombstoned,
        _audit_roots_no_tombstoned,
        _purge_feed,
    )

    _purge_feed(spark, base, f"{base}/src", TD_AFTER, ckpt=ckpt)
    _audit_no_tombstoned(
        spark, idx, ("bands", "shingles", "bands_p", "shingles_p")
    )
    tomb = spark.read.parquet(f"{idx}/tombstones")
    _audit_roots_no_tombstoned(
        spark, tomb, (f"{base}/src", f"{base}/sink", f"{base}/stage")
    )
    return run_corpus_prep_stream(
        spark, sf_dir, base, delete_after=TD_AFTER
    )


# Frozen-gate cache: the four intake ops (and each op's restart run)
# previously re-fit the identical batch-0 DSIR model + threshold per
# rig call (round-9 verdict item 5 — share what the proofs don't
# need isolated). The model is frozen BY DEFINITION (batch-0
# aggregates published before any routed batch), so caching its
# model-sized rows per corpus fingerprint changes nothing a proof
# depends on; each call rebuilds a fresh broadcastable frame from the
# cached rows so persist/unpersist lifecycles stay per-run.
_GATE_CACHE: dict = {}


def _frozen_gate_cached(spark, sf_dir, d, batch_of):
    from .dedup_stream import _feed_key

    # app-scoped like _EDGE_CACHE: within-invocation sharing only
    key = (spark.sparkContext.applicationId, _feed_key(sf_dir, "gate"))
    if key not in _GATE_CACHE:
        lr0, t0 = _dsir_frozen_gate(d.filter(batch_of == 0))
        rows = [(r["bucket"], r["lr_micro"]) for r in lr0.collect()]
        lr0.unpersist()
        _GATE_CACHE[key] = (rows, t0)
    rows, t0 = _GATE_CACHE[key]
    lr0 = spark.createDataFrame(
        rows, "bucket bigint, lr_micro bigint"
    ).persist()
    lr0.count()
    return lr0, t0


def run_corpus_prep_stream(
    spark, sf_dir, base, fail_at_batch=None, bucket_cap=None,
    compact_after=None, counts_paths_log=None, read_paths_log=None,
    delete_after=None, fail_phase="pre_sink",
):
    """The checkpointed rig behind stream_corpus_prep_e2e and its
    capped/lifecycle production forms, factored so the restart test
    can kill it in the torn state (index generation written, sink row
    batch absent) and restart it on the same checkpoint. Batch id from
    the data (id range); every write a deterministic overwrite.
    ``bucket_cap`` threads the stop-bucket guard into the composed
    pipeline's dedup core (round-8 verdict item 2 — previously the
    most production-shaped op was the one op still exposed to the
    megabucket fan-out the dedicated capped path closed).
    ``compact_after=k`` compacts the kept-set index generations 0..k
    (bands, shingles, and — on the capped path — the counts folded
    into counts_c) at the end of increment k, exactly the
    `_compact_index_generations` + marker-gated-reader discipline the
    dedup stream uses; later increments serve from the compacted
    layout."""
    import os

    from .dedup import N_INC_BATCHES, _lsh_band_rows, _shingle_array, _tokens
    from .dedup_stream import (
        _apply_takedown,
        _batch_fan,
        _compact_index_generations,
        _feed_key,
        _inc_lsh_dedupe_batch,
        _marker_gated_reader,
        _purge_sink,
        _stage_feed,
    )

    if compact_after is not None and delete_after is not None:
        raise ValueError("rig supports one maintenance mode per stream")

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    mx = d.agg(F.max("doc_id")).collect()[0][0]
    batch_of = F.expr(f"({N_INC_BATCHES} * doc_id) div {mx + 1}")
    lr0, t0 = _frozen_gate_cached(spark, sf_dir, d, batch_of)

    src, sink, ckpt = f"{base}/src", f"{base}/sink", f"{base}/ckpt"
    idx = f"{base}/index"
    _stage_feed(
        d, base, src,
        [(b, batch_of == b) for b in range(N_INC_BATCHES)],
        # takedown rigs stage privately: arrival copies must sit
        # inside the purge/audit perimeter (round-10 review finding)
        feed_key=_feed_key(sf_dir, "prep")
        if delete_after is None
        else None,
    )

    def process(batch_df, epoch_id):
        mn = batch_df.agg(F.min("doc_id")).collect()[0][0]
        if mn is None:
            return  # one action derives emptiness AND the batch id
        b = mn * N_INC_BATCHES // (mx + 1)
        scored = (
            batch_df.select("doc_id")
            .join(
                _dsir_features(batch_df)
                .join(F.broadcast(lr0), "bucket")
                .groupBy("doc_id")
                .agg(
                    F.sum("lr_micro").cast("long").alias(
                        "dsir_weight_micro"
                    )
                ),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                F.coalesce("dsir_weight_micro", F.lit(0))
                .cast("long")
                .alias("dsir_weight_micro"),
            )
            .persist()
        )
        try:
            kept_docs = batch_df.join(
                scored.filter(F.col("dsir_weight_micro") >= t0).select(
                    "doc_id"
                ),
                "doc_id",
            )
            doc_sh = (
                kept_docs.repartition(_batch_fan(batch_df), "doc_id")
                .select("doc_id", _shingle_array(_tokens()).alias("sh"))
                .persist()
            )
            try:
                dups = _inc_lsh_dedupe_batch(
                    spark, doc_sh, _lsh_band_rows(doc_sh), idx, b,
                    materialize=False, bucket_cap=bucket_cap,
                    read_index=_marker_gated_reader(
                        idx,
                        read_paths_log,
                        mode="delete"
                        if delete_after is not None
                        else "compact",
                    )
                    if (compact_after is not None or delete_after is not None)
                    else None,
                    counts_paths_log=counts_paths_log,
                ).select(
                    "doc_id",
                    F.col("dup_of"),
                    F.floor(F.col("jaccard_first") * 1_000_000 + F.lit(0.5))
                    .cast("long")
                    .alias("jaccard_micro"),
                )
                if (
                    fail_at_batch is not None
                    and b == fail_at_batch
                    and fail_phase == "pre_sink"
                ):
                    raise RuntimeError(
                        f"injected failure: increment {b} after index"
                        " write, before sink write"
                    )
                out = (
                    scored.withColumn(
                        "kept", F.col("dsir_weight_micro") >= t0
                    )
                    .join(dups, "doc_id", "left")
                    .select(
                        "doc_id",
                        "dsir_weight_micro",
                        F.when(~F.col("kept"), F.lit("rejected"))
                        .when(
                            F.col("dup_of").isNotNull(), F.lit("kept_dup")
                        )
                        .otherwise(F.lit("kept"))
                        .alias("route"),
                        F.coalesce("dup_of", F.lit(-1))
                        .cast("long")
                        .alias("dup_of"),
                        F.coalesce("jaccard_micro", F.lit(-1))
                        .cast("long")
                        .alias("jaccard_micro"),
                    )
                )
                out.coalesce(1).write.mode("overwrite").parquet(
                    f"{sink}/batch_id={b}"
                )
                if compact_after is not None and b == compact_after:
                    _compact_index_generations(spark, idx, b)
                if delete_after is not None and b == delete_after:
                    _apply_takedown(
                        spark, idx, b,
                        purge_counts=bucket_cap is not None,
                    )
                    _purge_sink(spark, sink, b)
                    if (
                        fail_at_batch is not None
                        and b == fail_at_batch
                        and fail_phase == "post_takedown"
                    ):
                        raise RuntimeError(
                            f"injected failure: increment {b} after"
                            " takedown marker, before checkpoint commit"
                        )
            finally:
                doc_sh.unpersist()
        finally:
            scored.unpersist()

    # try/finally so a failed or killed stream (the restart test's
    # injected torn state) does not leak the persisted model cache
    # for the session (the ADVICE-r7 leak class)
    try:
        q = (
            spark.readStream.schema(
                "doc_id bigint, lang string, text string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError(
                "stream_corpus_prep_e2e: availableNow query exceeded 600s"
            )
    finally:
        lr0.unpersist()
    import os

    paths = [
        f"{sink}/batch_id={b}"
        for b in range(N_INC_BATCHES)
        if os.path.exists(f"{sink}/batch_id={b}")
    ]
    return spark.read.option("basePath", sink).parquet(*paths).select(
        "doc_id",
        F.col("batch_id").cast("long").alias("batch_id"),
        "dsir_weight_micro",
        "route",
        "dup_of",
        "jaccard_micro",
    )


def _intake_capped_delete_sql():
    """Two-regime restatement of takedown through the CAPPED composed
    intake — _intake_delete_sql with the arrival-prefix cumulative-
    bucket rule spliced into both regimes: pre is the capped composed
    statement over the full corpus minus the cohort's own rows, post
    the capped composed statement with the kept set restricted to the
    reduced corpus (whose kept-set cumulative bucket sizes are exactly
    what the purged counts twins serve)."""
    from .dedup_stream import TD_AFTER, TD_MOD, TD_RES

    cols = "doc_id, batch_id, dsir_weight_micro, route, dup_of, jaccard_micro"
    return f"""WITH pre AS MATERIALIZED ({_intake_pipeline_sql(capped=True)}),
    post AS MATERIALIZED (
        {_intake_pipeline_sql(capped=True, takedown=True)})
    SELECT {cols} FROM pre
    WHERE batch_id <= {TD_AFTER} AND doc_id % {TD_MOD} != {TD_RES}
    UNION ALL
    SELECT {cols} FROM post WHERE batch_id > {TD_AFTER}
"""


@register(
    "stream_corpus_prep_capped_delete_e2e",
    oracle=_intake_capped_delete_sql(),
)
def stream_corpus_prep_capped_delete_e2e(spark, sf_dir):
    """Takedown on the CAPPED composed intake pipeline — the last
    refused rig combination: the production front door (frozen gate +
    capped incremental dedup of kept docs) taking a delete mid-stream.
    The takedown purges the kept-set index's bands/shingles AND its
    stop-bucket counts into marker-gated twins
    (`_apply_takedown(purge_counts=True)` — the dedicated dedup
    stream's machinery, composed), so post-boundary kept docs are
    capped against bucket sizes that no longer count deleted members,
    and dedupe against the purged index.

    The oracle is the two-regime COMPOSED capped statement: pre =
    capped gate+dedup over the full corpus minus the cohort's own
    rows; post = the same statement with the kept set restricted to
    the reduced corpus — whose kept-set cumulative bucket sizes are
    exactly what the purged counts twins serve. In-op proofs: every
    post-boundary increment sized buckets from purged counts twins
    only and deduped against purged band twins only (recorded paths);
    GC covers bands+shingles+counts under the takedown marker; the
    unified root audit walks feed and sink.

    Scale shape: the composed per-increment cost is the capped intake
    pipeline's; the takedown adds the per-generation filter-rewrites
    and one counts re-aggregate per covered generation — all riding
    partition-pruned scans."""
    import os

    from ..registry import scratch_dir
    from .dedup import LSH_BUCKET_CAP, N_INC_BATCHES
    from .dedup_stream import (
        TD_AFTER,
        _audit_no_tombstoned,
        _audit_roots_no_tombstoned,
        _gc_generations,
        _purge_feed,
    )

    base = scratch_dir("stream_corpus_prep_capped_delete_e2e")
    clog, rlog = [], []
    run_corpus_prep_stream(
        spark, sf_dir, base, bucket_cap=LSH_BUCKET_CAP,
        delete_after=TD_AFTER, counts_paths_log=clog,
        read_paths_log=rlog,
    )
    post_c = [(b, p) for (b, p) in clog if b > TD_AFTER]
    post_r = [(b, p) for (b, p) in rlog if b > TD_AFTER]
    if not post_c or not post_r:
        raise AssertionError("no post-takedown increment was processed")
    for b, paths in post_c:
        covered = [p for p in paths if "/counts_p/gen=" in p]
        stale = [
            p
            for p in paths
            if "/counts/gen=" in p
            and int(p.rsplit("=", 1)[1]) <= TD_AFTER
        ]
        if len(covered) != TD_AFTER + 1 or stale:
            raise AssertionError(
                f"increment {b} sized buckets from {paths}; expected"
                " purged counts twins for the covered prefix only"
            )
    for b, paths in post_r:
        covered = [p for p in paths if "/bands_p/gen=" in p]
        if len(covered) != TD_AFTER + 1:
            raise AssertionError(
                f"increment {b} deduped against {paths}; expected"
                " purged band twins for the covered prefix"
            )
    idx, ckpt = f"{base}/index", f"{base}/ckpt"
    removed = _gc_generations(
        ckpt, idx, ("bands", "shingles", "counts"),
        marker_name="takedown_upto",
    )
    if len(removed) != 3 * (TD_AFTER + 1):
        raise AssertionError(
            f"takedown GC removed {removed}, expected"
            " bands+shingles+counts originals"
        )
    _purge_feed(spark, base, f"{base}/src", TD_AFTER, ckpt=ckpt)
    _audit_no_tombstoned(
        spark, idx, ("bands", "shingles", "bands_p", "shingles_p")
    )
    tomb = spark.read.parquet(f"{idx}/tombstones")
    _audit_roots_no_tombstoned(
        spark, tomb, (f"{base}/src", f"{base}/sink", f"{base}/stage")
    )
    return run_corpus_prep_stream(
        spark, sf_dir, base, bucket_cap=LSH_BUCKET_CAP,
        delete_after=TD_AFTER,
    )
