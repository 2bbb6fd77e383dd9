"""2.H — scalar functions: string / date / math / array / map / json /
conditional / cast (SURVEY §2.H).

All expressions stay JVM-side (whole-stage codegen; no Python UDFs).
Transcendental results (ln/exp/pow) are rounded to 6 dp in BOTH
engines — libm vs java.lang.Math differ in the last ulp. sqrt is
IEEE-correctly-rounded, so it needs no rounding.

Integer-returning Spark functions (length, year, ceil, …) are cast to
long to match DuckDB's BIGINT outputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register, table


@register(
    "str_basic",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS name_up,
               lower(p_type) AS type_low,
               CAST(length(p_name) AS BIGINT) AS name_len,
               trim(concat(' ', p_name, ' ')) AS name_trim,
               substr(p_name, 1, 5) AS name_pre,
               concat(p_brand, '-', p_type) AS brand_type
        FROM part
    """,
)
def str_basic(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.lower("p_type").alias("type_low"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
    )


@register(
    "str_regex",
    oracle=r"""
        SELECT p_partkey,
               CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
               regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
               regexp_matches(p_name, '^(red|blue)') AS is_colored
        FROM part
    """,
)
def str_regex(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_name").rlike("^(red|blue)").alias("is_colored"),
    )


@register(
    "str_split_explode",
    oracle="""
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    """,
)
def str_split_explode(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@register(
    "date_parts",
    oracle="""
        SELECT event_id,
               year(ts)      AS y,
               month(ts)     AS mo,
               day(ts)       AS d,
               hour(ts)      AS h,
               minute(ts)    AS mi,
               second(ts)    AS s
        FROM events
    """,
)
def date_parts(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.second("ts").cast("long").alias("s"),
    )


@register(
    "date_trunc_diff_add",
    oracle="""
        SELECT o_orderkey,
               date_trunc('month', o_orderdate) AS month_start,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
               o_orderdate + INTERVAL 30 DAY AS plus_30
        FROM orders
    """,
)
def date_trunc_diff_add(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz"))
        .cast("long")
        .alias("days_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus_30"),
    )


@register(
    "math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice / 7.0, 2) AS price_div,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               sqrt(l_quantity) AS qty_sqrt,
               round(ln(l_extendedprice), 6) AS price_ln,
               round(exp(l_discount), 6) AS disc_exp,
               round(pow(l_quantity, 2), 6) AS qty_sq,
               l_orderkey % 7 AS key_mod
        FROM lineitem
    """,
)
def math_funcs(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7.0, 2).alias("price_div"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "cond_case_coalesce",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 250000.0 THEN 'big'
                    WHEN o_totalprice > 100000.0 THEN 'mid'
                    ELSE 'small' END AS size_band,
               coalesce(nullif(o_orderstatus, 'P'), 'none') AS status_or_none,
               greatest(o_totalprice, 150000.0) AS at_least,
               least(o_totalprice, 150000.0) AS at_most
        FROM orders
    """,
)
def cond_case_coalesce(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 250000.0, "big")
        .when(F.col("o_totalprice") > 100000.0, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("none")).alias(
            "status_or_none"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("at_least"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("at_most"),
    )


@register(
    "cast_ops",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey AS VARCHAR) AS key_str,
               CAST(o_orderkey AS DOUBLE) AS key_dbl,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
               CAST(round(o_totalprice) AS BIGINT) AS price_long,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num
        FROM orders
    """,
)
def cast_ops(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        # raw DATE output avoided: pandas date-vs-midnight-timestamp
        # rendering differs across engines; the cast itself is exercised
        # via the string round-trip below.
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.round("o_totalprice").cast("long").alias("price_long"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("prio_num"),
    )


@register(
    "arr_funcs",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
               COALESCE(array_to_string(list_slice(string_split(text, ' '), 1, 3), ' '), '')
                 AS first3,
               list_contains(string_split(text, ' '), 'join') AS has_join,
               COALESCE(array_to_string(list_sort(list_slice(string_split(text, ' '), 1, 5)), ' '), '')
                 AS sorted5
        FROM documents
    """,
)
def arr_funcs(spark, sf_dir):
    """Array slice/contains/sort surface; arrays serialize to joined
    strings at the comparison boundary (driver hashes scalars only)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.array_contains(toks, "join").alias("has_join"),
        F.array_join(F.sort_array(F.slice(toks, 1, 5)), " ").alias("sorted5"),
    )


@register(
    "arr_higher_order",
    oracle="""
        SELECT vec_id,
               round(sqrt(list_aggregate(
                 list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 'sum')), 6) AS l2_norm,
               array_to_string(
                 list_transform(list_slice(embedding, 1, 4),
                                x -> CAST(round(CAST(x AS DOUBLE) * 2 * 1000000) AS BIGINT)),
                 ',') AS first4_x2_e6
        FROM embeddings
    """,
)
def arr_higher_order(spark, sf_dir):
    """Element-wise transform + fold, entirely in Catalyst HOFs.

    Elements are cast to double BEFORE multiplying in both engines so
    the per-element squares are bit-identical; the fold is sequential
    in list order on both sides.
    """
    em = table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    return em.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.round(x.cast("double") * 2 * 1000000).cast("long").cast("string"),
            ),
            ",",
        ).alias("first4_x2_e6"),
    )


@register(
    "map_ops",
    oracle="""
        SELECT doc_id,
               CAST(json_object('lang', lang, 'src', source) AS VARCHAR) AS meta,
               'lang,src' AS meta_keys,
               lang AS lang_from_map
        FROM documents
    """,
)
def map_ops(spark, sf_dir):
    """MAP construction + key/value access. Upgraded from rows-only to
    a full value-hash oracle once the boundary became deterministic
    strings: to_json renders str_to_map in insertion order, and the
    key list is sorted — so DuckDB can state the exact rendering."""
    d = table(spark, sf_dir, "documents")
    kv = F.concat(F.lit("lang="), F.col("lang"), F.lit(",src="), F.col("source"))
    m = F.str_to_map(kv, F.lit(","), F.lit("="))
    return d.select(
        "doc_id",
        F.to_json(m).alias("meta"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("meta_keys"),
        F.element_at(m, "lang").alias("lang_from_map"),
    )


@register(
    "json_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               json_extract_string(props, '$.k') AS k_str
        FROM events
    """,
)
def json_extract(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@register(
    "cast_try_safe",
    oracle="""
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
               TRY_CAST(event_type AS BIGINT) AS type_num,
               TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) / 7
                 AS k_seventh
        FROM events
    """,
)
def cast_try_safe(spark, sf_dir):
    """Error-safe casts: try_cast yields NULL instead of an ANSI
    runtime error on non-numeric input (event_type never parses, k
    always does) — the ingestion-hardening counterpart to PERMISSIVE
    parsing.

    Perf note (round 4): the never-parses column pays the JVM
    exception-per-row failure path inside try_cast (~14 µs/row
    measured), and the toy parquet reads as ONE split — so the whole
    worst case ran on a single core (1.4 s for 100k rows). The
    repartition spreads the exception-heavy parse across all cores;
    at 100 TB the scan has thousands of natural splits and the same
    parallelism is free."""
    e = table(spark, sf_dir, "events").repartition(32)
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.try_cast("bigint").alias("k_num"),
        F.col("event_type").try_cast("bigint").alias("type_num"),
        (k.try_cast("double") / 7).alias("k_seventh"),
    )


@register(
    "str_pad_translate",
    oracle="""
        SELECT p_partkey,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
               translate(p_name, 'aeiou', '_____') AS devoweled,
               reverse(p_brand) AS brand_rev,
               repeat('*', p_size % 5) AS stars
        FROM part
    """,
)
def str_pad_translate(spark, sf_dir):
    """Second string batch: lpad / translate / reverse / repeat."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.translate("p_name", "aeiou", "_____").alias("devoweled"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), F.pmod("p_size", F.lit(5))).alias("stars"),
    )


@register(
    "date_make_construct",
    oracle="""
        SELECT event_id,
               CAST(make_date(CAST(year(ts) AS INT), CAST(month(ts) AS INT),
                         CAST(day(ts) AS INT)) AS VARCHAR) AS d,
               CAST(make_timestamp(CAST(year(ts) AS BIGINT), CAST(month(ts) AS BIGINT),
                              CAST(day(ts) AS BIGINT), CAST(hour(ts) AS BIGINT),
                              CAST(minute(ts) AS BIGINT), 0.0) AS TIMESTAMP) AS t0
        FROM events
    """,
)
def date_make_construct(spark, sf_dir):
    """Date/timestamp constructors from parts (make_date /
    make_timestamp) — the inverse of date_parts extraction."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.make_date(F.year("ts"), F.month("ts"), F.dayofmonth("ts"))
        .cast("string")
        .alias("d"),
        F.expr(
            "make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), minute(ts), 0)"
        ).alias("t0"),
    )


@register(
    "arr_explode_outer",
    oracle="""
        SELECT d.doc_id, u.tok
        FROM documents d
        LEFT JOIN LATERAL (
          SELECT unnest(list_filter(string_split(d.text, ' '),
                                    t -> t = 'join')) AS tok
        ) u ON true
    """,
)
def arr_explode_outer(spark, sf_dir):
    """explode_outer: unnesting that KEEPS rows whose array is empty
    (as a NULL row) — the left-join flavor of explode, essential when
    the fan-out must not drop parents."""
    d = table(spark, sf_dir, "documents")
    hits = F.filter(F.split("text", " "), lambda t: t == "join")
    return d.select("doc_id", F.explode_outer(hits).alias("tok"))


@register(
    "str_hash_encode",
    oracle="""
        SELECT doc_id,
               md5(text) AS text_md5,
               sha256(text) AS text_sha256,
               to_base64(CAST(substr(text, 1, 12) AS BLOB)) AS prefix_b64,
               lower(hex(substr(text, 1, 4))) AS prefix_hex
        FROM documents
    """,
)
def str_hash_encode(spark, sf_dir):
    """Hashing/encoding batch: md5 / sha256 / base64 / hex — content
    addressing and wire encoding for dedup keys and payload framing."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("prefix_b64"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias(
            "prefix_hex"
        ),
    )


@register(
    "num_format_printf",
    oracle="""
        SELECT event_id,
               printf('%08d', CAST(user_id AS INT)) AS uid_padded,
               printf('%.3f', value) AS value_3dp
        FROM events
    """,
)
def num_format_printf(spark, sf_dir):
    """printf-style formatting (fixed-width ids, fixed-precision
    rendering) — the stable-text serialization surface."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.format_string("%08d", F.col("user_id").cast("int")).alias("uid_padded"),
        F.format_string("%.3f", "value").alias("value_3dp"),
    )


@register(
    "date_tz_shift",
    oracle="""
        SELECT event_id, ts,
               ts + INTERVAL 330 MINUTE AS ts_ist,
               ts - INTERVAL 8 HOUR AS ts_pst
        FROM events
    """,
)
def date_tz_shift(spark, sf_dir):
    """Fixed-offset timezone shifts via from_utc_timestamp — rendered
    as interval arithmetic in the oracle (fixed offsets avoid tzdata
    version skew between engines)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "ts",
        F.from_utc_timestamp(F.col("ts").cast("timestamp"), "+05:30")
        .cast("timestamp_ntz")
        .alias("ts_ist"),
        F.from_utc_timestamp(F.col("ts").cast("timestamp"), "-08:00")
        .cast("timestamp_ntz")
        .alias("ts_pst"),
    )


@register(
    "json_variant_ops",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
               json_extract_string(props, '$.k') AS k_str
        FROM events
    """,
)
def json_variant_ops(spark, sf_dir):
    """Semi-structured VARIANT type (Spark 4): parse_json once into a
    binary variant, then typed variant_get extractions — the
    open-schema path that avoids re-parsing JSON text per field at
    scale. Output is the extracted primitives (the variant itself has
    no cross-engine twin)."""
    e = table(spark, sf_dir, "events")
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_typed"),
        F.variant_get("v", "$.k", "string").alias("k_str"),
    )


@register(
    "str_regex_extract_all",
    oracle="""
        SELECT p_partkey,
               COALESCE(array_to_string(regexp_extract_all(p_name, '[a-z]+ed'), ' '), '')
                 AS ed_words,
               len(regexp_extract_all(p_name, '[a-z]+ed')) AS n_ed
        FROM part
        ORDER BY p_partkey
    """,
)
def str_regex_extract_all(spark, sf_dir):
    """regexp_extract_all: every match, not just the first — match
    order is positional so the joined-string form is deterministic.
    RE2∩Java common-subset pattern discipline."""
    p = table(spark, sf_dir, "part")
    ed = F.regexp_extract_all("p_name", F.lit("[a-z]+ed"), 0)
    return p.select(
        "p_partkey",
        F.array_join(ed, " ").alias("ed_words"),
        F.size(ed).alias("n_ed"),
    ).orderBy("p_partkey")


@register(
    "date_week_parts",
    oracle="""
        SELECT o_orderkey,
               CAST(week(o_orderdate) AS BIGINT) AS iso_week,
               CAST(isodow(o_orderdate) - 1 AS BIGINT) AS weekday_mon0,
               CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
               CAST(CAST(last_day(o_orderdate) AS DATE) AS VARCHAR) AS month_end,
               CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
        FROM orders
        ORDER BY o_orderkey
        LIMIT 1000
    """,
)
def date_week_parts(spark, sf_dir):
    """Calendar-part extraction beyond year/month/day: ISO week
    number, Monday-0 weekday, quarter, month-end, day-of-year.
    weekofyear/week are both ISO-8601 (weeks belong to the year
    containing their Thursday) so the year-boundary dates in
    orders (1995–2001) hash identically; Spark's weekday() is
    already Monday=0 while DuckDB's isodow is Monday=1, mapped
    explicitly. All pure column expressions — codegen, no shuffle
    beyond the ordered limit."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
            F.weekday("o_orderdate").cast("long").alias("weekday_mon0"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.last_day("o_orderdate").cast("string").alias("month_end"),
            F.dayofyear("o_orderdate").cast("long").alias("doy"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@register(
    "str_url_parse",
    oracle="""
        SELECT doc_id,
               source || '.example.com' AS host,
               '/docs/' || CAST(doc_id AS VARCHAR) AS path,
               'lang=' || lang AS query,
               lang AS lang_param
        FROM documents
        ORDER BY doc_id
    """,
)
def str_url_parse(spark, sf_dir):
    """URL structural parsing via parse_url (HOST / PATH / QUERY /
    single query parameter) over a URL synthesized from document
    columns — the oracle states the decomposition directly, so the
    check proves parse_url inverts the construction exactly. Common
    in web-corpus pipelines (canonicalization, per-host grouping
    before politeness-limited fetch or per-domain dedup)."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return (
        d.select(
            "doc_id",
            F.parse_url(url, F.lit("HOST")).alias("host"),
            F.parse_url(url, F.lit("PATH")).alias("path"),
            F.parse_url(url, F.lit("QUERY")).alias("query"),
            F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        )
        .orderBy("doc_id")
    )


@register(
    "json_tuple_multi",
    oracle="""
        SELECT event_id,
               CAST(user_id AS VARCHAR) AS uid_s,
               event_type AS type_s,
               CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR) AS cents_s
        FROM events
        ORDER BY event_id
        LIMIT 2000
    """,
)
def json_tuple_multi(spark, sf_dir):
    """Multi-key JSON extraction in one pass: a JSON document is
    rendered with to_json(struct(...)) and json_tuple pulls three
    keys as one generator (single parse per row, vs three
    get_json_object re-parses). The oracle states the round-trip
    identity from the base columns. Integer-cents encoding keeps
    the float out of the JSON text (to_json double formatting is
    engine-specific)."""
    e = table(spark, sf_dir, "events")
    j = F.to_json(
        F.struct(
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("type"),
            F.round(F.col("value") * 100.0).cast("long").alias("cents"),
        )
    )
    return (
        e.select("event_id", j.alias("j"))
        .select(
            "event_id",
            F.json_tuple(F.col("j"), "uid", "type", "cents").alias(
                "uid_s", "type_s", "cents_s"
            ),
        )
        .orderBy("event_id")
        .limit(2000)
    )


@register(
    "arr_set_operations",
    oracle="""
        WITH h AS (
          SELECT doc_id,
                 string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM documents
        ), ab AS (
          SELECT doc_id,
                 toks[1 : n//2] AS a,
                 toks[n//2 + 1 : n] AS b
          FROM h
        )
        SELECT doc_id,
               COALESCE(array_to_string(list_sort(list_distinct(list_filter(a,
                 x -> list_contains(b, x)))), ' '), '') AS common,
               COALESCE(array_to_string(list_sort(list_distinct(list_filter(a,
                 x -> NOT list_contains(b, x)))), ' '), '') AS only_first,
               CAST(len(list_distinct(a || b)) AS INTEGER) AS n_union
        FROM ab
        ORDER BY doc_id
    """,
)
def arr_set_operations(spark, sf_dir):
    """Array set algebra (intersect / except / union-cardinality)
    between the first and second half of each document's token
    sequence — a per-row (no shuffle!) vocabulary-overlap profile,
    the cheap precursor to pairwise Jaccard. Spark's
    array_intersect/except order is first-occurrence (engine-
    specific), so results are canonicalized through
    sort_array(array_distinct(...)) to a deterministic set form on
    both engines. slice() is 1-based in Spark like DuckDB's list
    slicing; whole thing is codegen'd per-row expression work that
    scales embarrassingly."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    h = d.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n"),
    )
    half = (F.col("n") / 2).cast("int")
    ab = h.select(
        "doc_id",
        F.slice(F.col("toks"), 1, half).alias("a"),
        F.slice(
            F.col("toks"), half + 1, F.col("n") - half
        ).alias("b"),
    )
    return ab.select(
        "doc_id",
        F.array_join(
            F.sort_array(F.array_distinct(F.array_intersect("a", "b"))), " "
        ).alias("common"),
        F.array_join(
            F.sort_array(F.array_distinct(F.array_except("a", "b"))), " "
        ).alias("only_first"),
        F.size(F.array_distinct(F.concat("a", "b"))).alias("n_union"),
    ).orderBy("doc_id")


@register(
    "map_hof_ops",
    oracle="""
        SELECT doc_id,
               upper(lang) AS lang_up,
               CASE WHEN length(source) > 4 THEN source END AS src_if_long,
               lang || '/' || source AS zipped
        FROM documents
    """,
)
def map_hof_ops(spark, sf_dir):
    """Map higher-order functions — transform_values, map_filter,
    map_zip_with — all Catalyst expressions (no shuffle, no Python).
    The oracle restates each extraction's value derivation directly
    (DuckDB's MAP surface has no HOF twins); the Spark side genuinely
    routes through the map ops and extracts scalars at the boundary."""
    d = table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("src"), F.col("source")
    )
    m_swap = F.create_map(
        F.lit("lang"), F.col("source"), F.lit("src"), F.col("lang")
    )
    mv = F.transform_values(m, lambda k, v: F.upper(v))
    mf = F.map_filter(m, lambda k, v: F.length(v) > 4)
    mz = F.map_zip_with(m, m_swap, lambda k, v1, v2: F.concat_ws("/", v1, v2))
    return d.select(
        "doc_id",
        F.element_at(mv, "lang").alias("lang_up"),
        F.element_at(mf, "src").alias("src_if_long"),
        F.element_at(mz, "lang").alias("zipped"),
    )


@register(
    "str_regex_count_substr",
    oracle="""
        SELECT p_partkey,
               CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT)
                 AS n_vowels,
               nullif(regexp_extract(p_name, '[a-z]+ed'), '') AS first_ed
        FROM part
    """,
)
def str_regex_count_substr(spark, sf_dir):
    """Spark 4 regexp_count / regexp_substr scalar surface. DuckDB
    twins: len(regexp_extract_all) and nullif('' → NULL), since its
    regexp_extract returns '' where Spark's regexp_substr is NULL."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_count("p_name", F.lit("[aeiou]")).cast("long").alias("n_vowels"),
        F.regexp_substr("p_name", F.lit("[a-z]+ed")).alias("first_ed"),
    )


@register(
    "str_collation_ci",
    oracle="""
        WITH segs AS (
          SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                      ELSE upper(substr(c_mktsegment, 1, 1))
                           || lower(substr(c_mktsegment, 2)) END AS seg
          FROM customer
        )
        SELECT count(DISTINCT seg) AS n_raw,
               count(DISTINCT lower(seg)) AS n_ci,
               CAST(sum(CASE WHEN lower(seg) = 'building' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_building_ci
        FROM segs
    """,
)
def str_collation_ci(spark, sf_dir):
    """Spark 4 COLLATIONS: comparisons, DISTINCT, and equality under
    ``collate(col, 'UTF8_LCASE')`` are case-insensitive AT THE ENGINE
    level — the collation travels with the string type through every
    operator (joins, aggs, sorts) instead of being re-spelled as
    lower() at each use site, and unlike lower() it preserves the
    original bytes. The demo manufactures a mixed-case segment column
    (half lowercase, half initcap), then counts distinct segments
    under binary vs UTF8_LCASE collation (10 vs 5) and filters with a
    collated equality. The oracle restates the semantics with lower()
    — legal here because ASCII lowercasing and UTF8_LCASE agree on
    this data; the Spark side exercises the real collation surface."""
    c = table(spark, sf_dir, "customer").select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment")
        )
        .otherwise(F.initcap("c_mktsegment"))
        .alias("seg")
    )
    ci = F.collate(F.col("seg"), "UTF8_LCASE")
    return c.agg(
        F.countDistinct("seg").alias("n_raw"),
        F.countDistinct(ci).alias("n_ci"),
        F.sum((ci == F.lit("building")).cast("long")).alias("n_building_ci"),
    )


@register(
    "struct_field_surgery",
    oracle="""
        SELECT o_orderkey,
               o_custkey AS cust,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(round(o_totalprice * 100) AS BIGINT) / 10 AS tax_cents,
               o_orderpriority AS priority
        FROM orders
    """,
)
def struct_field_surgery(spark, sf_dir):
    """Nested-struct column surgery — Column.withField / dropFields
    (Spark 3.1+ surface the other scalar ops don't touch): build a
    nested order struct, ADD a derived nested field (tax), REPLACE an
    existing one in place, DROP a stale one, then star-expand. All of
    it is Catalyst expression rewriting (UpdateFields) — zero shuffle,
    zero Python — and the optimizer collapses the add/replace/drop
    chain into a single named_struct projection, so the surgery is
    free at any scale. The oracle restates the surviving fields flat.
    """
    o = table(spark, sf_dir, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.struct(
                F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
                F.lit("USD").alias("currency"),
            ).alias("money"),
            F.col("o_orderstatus").alias("stale_status"),
            F.col("o_orderpriority").alias("priority"),
        ).alias("ord"),
    )
    surgered = (
        nested.withColumn(
            "ord",
            F.col("ord").withField(
                "money.tax_cents", F.col("ord.money.cents") / 10
            ),
        )
        .withColumn(
            "ord",
            F.col("ord").withField(
                "money.currency", F.upper(F.col("ord.money.currency"))
            ),
        )
        .withColumn("ord", F.col("ord").dropFields("stale_status"))
    )
    return surgered.select(
        "o_orderkey",
        "ord.cust",
        "ord.money.cents",
        "ord.money.tax_cents",
        "ord.priority",
    )


BUSDAY_EPOCH = "1994-12-26"  # a Monday <= every fixture date


@register(
    "date_business_days",
    oracle=f"""
        WITH lt AS (
          SELECT o.o_orderpriority AS prio,
                 CAST(CAST(l.l_shipdate AS DATE)
                      - CAST(o.o_orderdate AS DATE) AS BIGINT) AS cal_days,
                 CAST(CAST(l.l_shipdate AS DATE)
                      - DATE '{BUSDAY_EPOCH}' AS BIGINT) AS nb,
                 CAST(CAST(o.o_orderdate AS DATE)
                      - DATE '{BUSDAY_EPOCH}' AS BIGINT) AS na
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ),
        b AS (
          SELECT prio, cal_days,
                 (5 * (nb // 7) + least(nb % 7, 5))
                 - (5 * (na // 7) + least(na % 7, 5)) AS bus_days
          FROM lt
        )
        SELECT prio, CAST(count(*) AS BIGINT) AS n_lines,
               round(CAST(sum(cal_days) AS DOUBLE) / count(*), 6)
                 AS avg_cal_days,
               round(CAST(sum(bus_days) AS DOUBLE) / count(*), 6)
                 AS avg_bus_days,
               round(CAST(sum(bus_days) AS DOUBLE) / sum(cal_days), 6)
                 AS bus_ratio
        FROM b GROUP BY 1
    """,
)
def date_business_days(spark, sf_dir):
    """Business-day (Mon–Fri) arithmetic without exploding calendars:
    weekdays-before-date is the closed form g(x) = 5·(n/7) + min(n%7,5)
    with n = days since a fixed MONDAY epoch, so business days between
    two dates is just g(b) − g(a) — pure integer math per row, exact
    at any distance, no holiday-table join (the docstring's production
    variant subtracts a broadcast holiday count). Reported per
    priority next to calendar days, giving the ship-SLA view that
    matches how contracts are actually written (5 business days ≠ 5
    days).

    Scale: the order×lineitem join is key-partitioned; everything
    else is per-row integer arithmetic folded by one
    map-side-combinable rollup. The Monday-anchored epoch keeps n
    non-negative so / and % agree across engines (no negative
    floor-division divergence)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    epoch = F.lit(BUSDAY_EPOCH).cast("date")

    def g(n):
        return 5 * F.floor(n / 7) + F.least(n % 7, F.lit(5))

    lt = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).cast("long").alias("cal_days"),
        F.datediff(F.col("l_shipdate").cast("date"), epoch)
        .cast("long")
        .alias("nb"),
        F.datediff(F.col("o_orderdate").cast("date"), epoch)
        .cast("long")
        .alias("na"),
    )
    b = lt.select(
        "prio",
        "cal_days",
        (g(F.col("nb")) - g(F.col("na"))).alias("bus_days"),
    )
    return b.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum("cal_days").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_cal_days"),
        F.round(
            F.sum("bus_days").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_bus_days"),
        F.round(
            F.sum("bus_days").cast("double") / F.sum("cal_days"), 6
        ).alias("bus_ratio"),
    )


@register(
    "date_fiscal_quarter_rollup",
    oracle="""
        WITH f AS (
          SELECT CASE WHEN month(o_orderdate) >= 2
                      THEN year(o_orderdate) + 1
                      ELSE year(o_orderdate) END AS fy,
                 ((month(o_orderdate) + 10) % 12) // 3 + 1 AS fq,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        g AS (
          SELECT fy, fq, CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(cents) AS BIGINT) AS rev_cents
          FROM f GROUP BY 1, 2
        ),
        y AS (SELECT fy, CAST(sum(rev_cents) AS BIGINT) AS fy_cents
              FROM g GROUP BY 1)
        SELECT CAST(g.fy AS BIGINT) AS fiscal_year,
               CAST(g.fq AS BIGINT) AS fiscal_quarter,
               g.n_orders, g.rev_cents,
               round(CAST(g.rev_cents AS DOUBLE) / y.fy_cents, 6)
                 AS share_of_fy
        FROM g JOIN y USING (fy)
    """,
)
def date_fiscal_quarter_rollup(spark, sf_dir):
    """Fiscal-calendar rollup for a February-start fiscal year (the
    retail/AWS-style FY): FY = calendar year + 1 once February
    starts, FQ = ((month+10) mod 12)/3 + 1, so Feb–Apr is Q1. Every
    BI stack trips on this mapping at least once — here it is pure
    integer month arithmetic, identical in both engines, with exact
    cent sums and each quarter's share of its fiscal year.

    Scale: map-only fiscal tagging into one combinable rollup; the
    FY spine join broadcasts."""
    o = table(spark, sf_dir, "orders")
    mo = F.month("o_orderdate")
    f = o.select(
        F.when(mo >= 2, F.year("o_orderdate") + 1)
        .otherwise(F.year("o_orderdate"))
        .alias("fy"),
        (F.floor(((mo + 10) % 12) / 3) + 1).alias("fq"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = f.groupBy("fy", "fq").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("rev_cents"),
    )
    y = g.groupBy("fy").agg(F.sum("rev_cents").alias("fy_cents"))
    return g.join(F.broadcast(y), "fy").select(
        F.col("fy").cast("long").alias("fiscal_year"),
        F.col("fq").cast("long").alias("fiscal_quarter"),
        "n_orders",
        "rev_cents",
        F.round(
            F.col("rev_cents").cast("double") / F.col("fy_cents"), 6
        ).alias("share_of_fy"),
    )


@register(
    "str_slugify",
    oracle="""
        SELECT p_partkey,
               p_name,
               trim(regexp_replace(regexp_replace(lower(p_name),
                    '[^a-z0-9]+', '-', 'g'), '(^-+)|(-+$)', '', 'g'))
                 AS slug,
               length(trim(regexp_replace(regexp_replace(lower(p_name),
                    '[^a-z0-9]+', '-', 'g'), '(^-+)|(-+$)', '', 'g')))
                 AS slug_len
        FROM part
    """,
)
def str_slugify(spark, sf_dir):
    """URL-slug normalization of part names — the ETL string
    canonicalization every catalog/CMS pipeline runs: lowercase,
    collapse every non-alphanumeric run to one dash, strip edge
    dashes. Spelled as two codegen'd regexp_replace passes (never a
    per-row UDF); DuckDB's 'g' flag mirrors Spark's replace-all
    default, and the edge-strip uses an alternation anchored at both
    ends so a single pass suffices in both engines.

    Scale: map-only string kernels inside whole-stage codegen —
    scan-bound."""
    p = table(spark, sf_dir, "part")
    slug = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("p_name"), "[^a-z0-9]+", "-"),
            "(^-+)|(-+$)",
            "",
        )
    )
    return p.select(
        "p_partkey",
        "p_name",
        slug.alias("slug"),
        F.length(slug).alias("slug_len"),
    )
