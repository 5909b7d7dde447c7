"""Category H — scalar functions (SURVEY §2.H).

Field-mapping surface of a CMDB sync [SN-API]: string normalization,
ARN parsing, date bucketing on `sys_updated_on`-style timestamps, type
coercion at ingest, choice-field mapping (CASE/coalesce), AWS tag maps,
nested JSON payloads, content hashing for delta detection.

All native `pyspark.sql.functions` — whole-stage codegen end-to-end,
no Python UDFs (§2 engine policy). Cross-engine typing notes inline:
Spark's length/year/ceil return INT/LONG where DuckDB returns BIGINT/
DOUBLE, so every such output is cast explicitly on both sides.

100 TB notes (whole category): scalar expressions are map-side,
shuffle-free and codegen-fused — they add zero exchanges to any plan
they appear in and scale embarrassingly with partition count. The only
scale hazards in this family are per-ROW quadratics (regex
backtracking, per-position substring) — bounded by the r8b --pathdocs
contracts (quantifier bounds, chunked substring idioms) documented at
the affected operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import scan


@query(
    "h1_string",
    oracle="""
    SELECT c_custkey,
           concat_ws('|', c_name, c_mktsegment) AS tagged,
           upper(c_mktsegment) AS seg_up,
           lower(c_name) AS name_lo,
           substring(c_name, 1, 8) AS prefix8,
           CAST(length(c_name) AS BIGINT) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_pad,
           replace(c_name, 'Customer#', 'CI-') AS ci_name,
           string_split(c_name, '#')[1] AS name_head,
           trim(concat(' ', c_name, ' ')) AS name_trim
    FROM customer
    """,
)
def h1_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (h1): CI-name normalization toolkit."""
    c = scan(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("tagged"),
        F.upper("c_mktsegment").alias("seg_up"),
        F.lower("c_name").alias("name_lo"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_pad"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("CI-")).alias("ci_name"),
        F.split("c_name", "#").getItem(0).alias("name_head"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
    )


@query(
    "h2_regex_fn",
    oracle=r"""
    SELECT s_suppkey, arn,
           regexp_extract(arn, 'arn:aws:ec2:[a-z0-9-]+:(\d{12}):', 1) AS account_id,
           regexp_replace(arn, '^arn:aws:ec2:[a-z0-9-]+:', '') AS resource_part
    FROM (
        SELECT s_suppkey,
               'arn:aws:ec2:us-east-1:' || lpad(CAST(s_suppkey AS VARCHAR), 12, '0')
                 || ':instance/i-' || lower(s_name) AS arn
        FROM supplier
    )
    """,
)
def h2_regex_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract/replace (h2): pull the account id out of ARN-like
    strings (the AWS-side identifier-mapping pattern)."""
    s = scan(spark, sf_dir, "supplier")
    arn = F.concat(
        F.lit("arn:aws:ec2:us-east-1:"),
        F.lpad(F.col("s_suppkey").cast("string"), 12, "0"),
        F.lit(":instance/i-"),
        F.lower("s_name"),
    )
    return s.select("s_suppkey", arn.alias("arn")).select(
        "s_suppkey",
        "arn",
        F.regexp_extract("arn", r"arn:aws:ec2:[a-z0-9-]+:(\d{12}):", 1).alias(
            "account_id"
        ),
        F.regexp_replace("arn", r"^arn:aws:ec2:[a-z0-9-]+:", "").alias(
            "resource_part"
        ),
    )


@query(
    "h3_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_epoch_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           -- FLOOR seconds-since-epoch, integer-exact (r9 --datewarp):
           -- on a fractional PRE-1970 timestamp Spark's unix_timestamp
           -- truncates toward zero while duckdb's epoch() rounds — the
           -- positive-mod floor form agrees everywhere (r8 idiom)
           CAST((epoch_us(o_orderdate)
                 - ((epoch_us(o_orderdate) % 1000000) + 1000000) % 1000000)
                // 1000000 AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def h3_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions (h3): watermark & date-bucketing toolkit."""
    o = scan(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        F.last_day("o_orderdate").alias("month_end"),
        # floor-of-seconds via positive-mod on exact integer micros —
        # unix_timestamp truncates toward zero below 1970 (see oracle)
        # NTZ→TIMESTAMP cast is exact under the pinned-UTC session
        F.expr(
            "(unix_micros(cast(o_orderdate as timestamp))"
            " - pmod(unix_micros(cast(o_orderdate as timestamp)),"
            " 1000000)) div 1000000"
        ).alias("epoch_s"),
    )


@query(
    "h4_math",
    oracle="""
    SELECT p_partkey,
           CAST(round(CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(1.1 AS DECIMAL(2,1)), 1) AS DOUBLE) AS bumped,
           abs(p_retailprice - 950.0) AS dist950,
           CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
           CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
           sqrt(p_size) AS sqrt_size,
           pow(p_size, 2) AS size_sq,
           round(ln(p_size), 9) AS ln_size,
           CAST(mod(p_size, 7) AS BIGINT) AS size_mod7
    FROM part
    """,
)
def h4_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (h4). `bumped` rounds an exact decimal product
    (half-up both engines); transcendentals (ln) verified bit-equal on
    this platform's libm/JDK pair by the parity gate."""
    p = scan(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(
            F.col("p_retailprice").cast("decimal(12,2)")
            * F.lit("1.1").cast("decimal(2,1)"),
            1,
        )
        .cast("double")
        .alias("bumped"),
        F.abs(F.col("p_retailprice") - 950.0).alias("dist950"),
        F.ceil("p_retailprice").cast("bigint").alias("ceil_price"),
        F.floor("p_retailprice").cast("bigint").alias("floor_price"),
        F.sqrt("p_size").alias("sqrt_size"),
        F.pow("p_size", F.lit(2)).alias("size_sq"),
        # JVM Math.log and C libm differ by 1 ulp on some inputs; round
        # to 9dp (error 4e-16 ≪ 5e-10 boundary) for cross-engine parity.
        F.round(F.log(F.col("p_size").cast("double")), 9).alias("ln_size"),
        F.pmod("p_size", F.lit(7)).cast("bigint").alias("size_mod7"),
    )


@query(
    "h5_cond",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'delinquent'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_mapped,
           least(c_acctbal, 1000.0) AS bal_capped,
           greatest(c_acctbal, 0.0) AS bal_floor
    FROM customer
    """,
)
def h5_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals (h5): choice-field mapping / IRE source precedence
    (CASE WHEN, coalesce, nullif, least/greatest)."""
    c = scan(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "delinquent")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
        .alias("seg_mapped"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_capped"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
    )


@query(
    "h6_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
           CAST(o_orderkey AS DOUBLE) AS key_dbl,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip
    FROM orders
    """,
)
def h6_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type coercion (h6): the string↔number↔date mapping layer at the
    ingest boundary (CMDB fields arrive as display strings)."""
    o = scan(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
    )


@query(
    "h7_array",
    oracle="""
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           array_to_string(words[1:3], ' ') AS first3,
           array_to_string(list_sort(list_distinct(words)), ' ') AS vocab,
           CAST(len(list_distinct(words)) AS BIGINT) AS n_vocab,
           list_contains(words, 'db') AS has_db
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    """,
)
def h7_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions (h7): tokenized text as array column — size,
    slice, distinct, sort, membership. Array results are serialized
    with ``array_join`` (driver harnesses canonicalize via pandas sort,
    which cannot hash top-level array cells; tokens are space-split so
    a space join is lossless)."""
    d = scan(spark, sf_dir, "documents").withColumn(
        "words", F.split("text", " ")
    )
    return d.select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.array_join(F.slice("words", 1, 3), " ").alias("first3"),
        F.array_join(F.sort_array(F.array_distinct("words")), " ").alias("vocab"),
        F.size(F.array_distinct("words")).cast("bigint").alias("n_vocab"),
        F.array_contains("words", "db").alias("has_db"),
    )


@query(
    "h8_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(pos AS BIGINT) AS pos,
           CAST(embedding[pos] AS DOUBLE) * 2.0 AS doubled_val,
           CAST(embedding[pos] AS DOUBLE) + CAST(embedding[pos] AS DOUBLE)
             AS self_sum_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_sum(list_transform(
                 list_filter(embedding, x -> x IS NOT NULL),
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS energy
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos)
    """,
)
def h8_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (h8): transform/filter/aggregate/
    zip_with — element-wise vector math with NO Python UDF.

    The transformed/zipped arrays are built with the HOFs, then
    posexploded to scalar rows for the driver compare (top-level array
    columns break pandas canonicalization). `2·x` and `a+a` on binary
    floats are exact, so no rounding is needed on the per-element
    columns.

    NULL-component policy (sprung by the r10 12-amplifier chain via
    the vec-extremes NULL-component cases): `energy` is the sum of
    squares over the NON-NULL components — SQL aggregate semantics.
    A bare fold (acc + x·x) would 3VL-propagate one NULL component
    into a NULL energy where DuckDB's list_sum skips it, so BOTH
    engines filter NULLs out first; a vector with NO non-null
    components yields NULL energy in both (list_sum of an empty list
    is NULL in DuckDB — the engine guards with size()>0). The
    per-element columns (doubled/self_sum) keep NULL→NULL: that IS
    the element-wise semantics, identical in both engines."""
    e = scan(spark, sf_dir, "embeddings")
    x_d = lambda x: x.cast("double")  # noqa: E731
    nn = F.filter("embedding", lambda x: x.isNotNull())
    arrs = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x_d(x) * 2.0).alias("doubled"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.when(
            F.size(nn) > 0,
            F.round(
                F.aggregate(
                    nn,
                    F.lit(0.0),
                    lambda acc, x: acc + x_d(x) * x_d(x),
                ),
                6,
            ),
        ).alias("energy"),
        F.zip_with("embedding", "embedding", lambda a, b: x_d(a) + x_d(b)).alias(
            "self_sum"
        ),
    )
    ex = arrs.select(
        "vec_id",
        "n_pos",
        "energy",
        "self_sum",
        F.posexplode("doubled").alias("pos0", "doubled_val"),
    )
    return ex.select(
        "vec_id",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        "doubled_val",
        F.element_at("self_sum", F.col("pos0") + 1).alias("self_sum_val"),
        "n_pos",
        "energy",
    )


@query(
    "h9_map",
    oracle="""
    SELECT event_id,
           array_to_string(map_keys(m), ',') AS tag_keys,
           CAST(len(map_keys(m)) AS BIGINT) AS n_tags,
           m['source'][1] AS source_tag,
           m['kind'][1] AS kind_tag
    FROM (
        SELECT event_id,
               MAP {'source': 'servicenow', 'kind': event_type} AS m
        FROM events
    )
    """,
)
def h9_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions (h9): the AWS-tag-map pattern — build a map column,
    list keys, extract values."""
    e = scan(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("source"), F.lit("servicenow"), F.lit("kind"), F.col("event_type")
    )
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("tag_keys"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_tags"),
        F.element_at(m, "source").alias("source_tag"),
        F.element_at(m, "kind").alias("kind_tag"),
    )


@query(
    "h10_json",
    oracle="""
    -- json_valid gate + TRY_CAST (r9 --props sweep): duckdb's json
    -- functions THROW on malformed input where get_json_object
    -- returns NULL, and CAST throws on a wrong-typed field where the
    -- engine's try_cast nulls — row-local permissiveness both sides
    WITH e AS (SELECT event_id,
                      CASE WHEN json_valid(props) THEN props END AS p
               FROM events)
    SELECT event_id,
           json_extract_string(p, '$.k') AS k_str,
           TRY_CAST(json_extract_string(p, '$.k') AS INTEGER) AS k_int,
           json_extract_string(p, '$.k') IS NOT NULL AS has_k,
           json_extract_string(p, '$.missing') AS missing_attr
    FROM e
    """,
)
def h10_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions (h10): `events.props` extraction — the AWS Config
    payload boundary. get_json_object for ad-hoc paths (a3 covers
    from_json with a declared schema)."""
    e = scan(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        # try_cast: a wrong-typed field ('{"k": "abc"}') is a NULL,
        # not an ANSI job-kill — one bad payload row must never abort
        # a 100 TB scan (r9 --props sweep)
        k.try_cast("int").alias("k_int"),
        k.isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").alias("missing_attr"),
    )


@query(
    "h11_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(lower(trim(text))) AS norm_md5
    FROM documents
    """,
)
def h11_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing (h11): dedup/delta fingerprints. xxhash64 (used
    internally by j2's MinHash) has no DuckDB twin, so the oracle covers
    md5/sha256; xxhash64 determinism is pinned in unit tests."""
    d = scan(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.lower(F.trim("text"))).alias("norm_md5"),
    )


@query(
    "h15_variant",
    oracle="""
    -- json_valid gate + TRY_CAST: the try_parse_json/try_variant_get
    -- row-local null semantics, mirrored (r9 --props sweep)
    WITH e AS (SELECT event_id,
                      CASE WHEN json_valid(props) THEN props END AS p
               FROM events)
    SELECT event_id,
           TRY_CAST(json_extract_string(p, '$.k') AS INTEGER) AS k_int,
           TRY_CAST(json_extract_string(p, '$.k') AS INTEGER)
             * TRY_CAST(json_extract_string(p, '$.k') AS INTEGER) AS k_sq,
           TRY_CAST(json_extract_string(p, '$.k') AS INTEGER) > 50 AS k_big,
           TRY_CAST(json_extract_string(p, '$.missing') AS INTEGER)
             AS missing_attr
    FROM e
    """,
)
def h15_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (h15): `events.props` parsed ONCE
    into Spark 4's binary-encoded VARIANT, then typed extractions with
    `try_variant_get` — the modern replacement for per-path
    get_json_object string re-parsing (h10): one parse, many typed
    reads, shreddable at the storage layer. The parse is `try_` too:
    a malformed payload row becomes NULL instead of failing the whole
    100 TB ingest job (ANSI-mode `parse_json` throws) — the oracle's
    CAST-of-extract has the same row-local null semantics.

    100 TB notes: h10's get_json_object re-parses the JSON string per
    extraction expression; VARIANT parses once per row into a binary
    form whose field reads are O(log fields) offset lookups — on wide
    payloads (AWS Config snapshots are KBs of JSON) that's the
    difference between N full parses and one. All expressions here are
    codegen'd JVM-side, zero shuffles, and the missing-path read is
    `try_` (null, not error) exactly like the oracle's CAST of an
    absent extract."""
    e = scan(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return e.select(
        "event_id",
        k.alias("k_int"),
        (k * k).alias("k_sq"),
        (k > 50).alias("k_big"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_attr"),
    )


@query(
    "h16_try_functions",
    oracle="""
    WITH e AS (
        SELECT event_id, event_type, props,
               -- duckdb 1.0 bug: TRY_CAST(NaN AS DECIMAL) still errors
               -- (Inf correctly yields NULL) — NaN needs its own guard
               -- widen before *100: duckdb does not grow the product type
               -- and a legit 1e15 value overflows DECIMAL(18)
               CAST(CAST(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END
                                  AS DECIMAL(18,2)) AS DECIMAL(24,2))
                    * 100 AS BIGINT) AS cents
        FROM events
    )
    SELECT event_id,
           cents / NULLIF(cents % 7, 0) AS safe_div,
           TRY_CAST(substr(props, 7, 2) AS INTEGER) AS k_try,
           string_split(event_type, 'u')[2] AS after_u
    FROM e
    """,
)
def h16_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe function family (h16): `try_divide`,
    `try_cast`, `try_element_at` — under ANSI mode (this engine's
    default, like the reference domain's strict typing) a division by
    zero, bad cast, or out-of-range index THROWS and kills the 100 TB
    job; the try_ family turns exactly those rows into NULL while
    every other row keeps full-error semantics. The oracle mirrors
    each with DuckDB's native null-safe form (NULLIF guard, TRY_CAST,
    OOB list index) — same rows null, same values elsewhere.

    100 TB notes: all map-side codegen, zero shuffles; the point is
    operational — row-local fault tolerance beats job-level retries
    when one poison row hides in a petabyte."""
    e = scan(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "props",
        # try_cast (the id's own theme): a NaN/Inf metric is exactly the
        # poison row the try_ family exists for — NULL cents, job lives
        (F.col("value").try_cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return e.select(
        "event_id",
        F.try_divide(F.col("cents"), F.col("cents") % 7).alias("safe_div"),
        F.substring("props", 7, 2).try_cast("int").alias("k_try"),
        F.try_element_at(F.split("event_type", "u"), F.lit(2)).alias("after_u"),
    )


@query(
    "h17_url_parse",
    oracle=r"""
    WITH u AS (
        SELECT s_suppkey,
               'https://cmdb-' || CAST(s_nationkey AS VARCHAR)
                 || '.example.com/api/now/table/cmdb_ci_server?sys_id='
                 || lpad(CAST(s_suppkey AS VARCHAR), 8, '0')
                 || chr(38) || 'limit=100' AS url
        FROM supplier
    )
    SELECT s_suppkey, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]sys_id=([^&]*)', 1) AS sys_id
    FROM u
    """,
)
def h17_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (h17): `parse_url` over instance-API URLs — host,
    path, and one query parameter; the log-enrichment / endpoint-
    normalization step of any integration audit trail. Spark's
    dedicated parser (java.net.URI-backed) vs the oracle's regexes:
    value-identical on well-formed URLs, and the engine side stays a
    single codegen'd map (the parse is an expression, not a UDF).

    100 TB notes: zero shuffles; at log scale the parsed host/path
    become the partition/bucket keys downstream — parse once at
    ingest, never re-regex per query."""
    s = scan(spark, sf_dir, "supplier")
    url = F.concat(
        F.lit("https://cmdb-"),
        F.col("s_nationkey").cast("string"),
        F.lit(".example.com/api/now/table/cmdb_ci_server?sys_id="),
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0"),
        F.lit("&limit=100"),
    )
    return s.select("s_suppkey", url.alias("url")).select(
        "s_suppkey",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("sys_id")).alias("sys_id"),
    )
