"""Category K — UDF / UDAF / UDTF surface (SURVEY §2.K).

The escape hatch, proven but fenced off: engine policy (§2) keeps all
B–H and J operators in native expressions; these five demonstrate each
Python-extension shape with the Arrow path. Where the function is
re-expressible in SQL the oracle checks it (k1, k2, k5); the pandas
group shapes (k3, k4) are rows-only (float summation order inside
pandas differs from SQL engines by design).

100 TB notes: k2–k5 are Arrow-batched (one JVM↔Python hop per ~10k-row
batch); k1 is the row-at-a-time anti-pattern kept only as the contrast
case. Grouped shapes (k3/k4) shuffle once on the group key and stream
groups through the Python worker.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from .numeric import FIN, METRIC_BOUND
from ..registry import query
from ..sources.tables import scan


@query(
    "k1_udf_scalar",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal IS NULL THEN NULL
                WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier
    FROM customer
    """,
)
def k1_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Python UDF (k1) — discouraged escape hatch; the oracle
    checks the re-expressed SQL (SURVEY §2 K note). NULL in → NULL out
    on both sides (a bare CASE would silently tier NULL as 'high', and
    `None < 0` raises in Python — the r7 null-amplifier finding)."""

    @udf("string")
    def tier(bal: float) -> str:
        if bal is None:
            return None
        if bal < 0:
            return "neg"
        if bal < 5000:
            return "mid"
        return "high"

    c = scan(spark, sf_dir, "customer")
    return c.select("c_custkey", tier("c_acctbal").alias("tier"))


@query(
    "k2_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
)
def k2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) scalar pandas UDF (k2): columnar revenue —
    numpy evaluates the same IEEE expression, so values are
    bit-identical to the SQL oracle."""

    @pandas_udf("double")
    def revenue(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = scan(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue("l_extendedprice", "l_discount").alias("revenue"),
    )


@query(
    "k3_grouped_map",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CASE WHEN coalesce(stddev_samp(c_acctbal)
                              OVER (PARTITION BY c_nationkey), 0) > 0
                THEN ROUND((c_acctbal
                            - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
                           / stddev_samp(c_acctbal)
                             OVER (PARTITION BY c_nationkey), 6)
                ELSE 0.0 END AS z_acctbal
    FROM customer
    """,
)
def k3_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (k3): per-nation z-score of customer
    balances — each group arrives as one pandas DataFrame.

    Oracle-parity notes: the group is sorted by c_custkey before the
    moment computations so the float accumulation order is fixed (the
    shuffle delivers group rows in nondeterministic order), and the
    z-score rounds to 6dp on both sides — pandas' pairwise summation
    and DuckDB's streaming sum agree far below that precision.

    100 TB notes: per-task memory is THE GROUP — 25 nation keys means
    each group is ~corpus/25 materialized as one pandas frame, which
    OOMs a task long before 100 TB. This id demonstrates the
    grouped-map SURFACE; the scalable form of this exact computation
    is d21_zscore_outliers (two-pass: partial-agg moments, broadcast
    join-back, per-row expression — one bounded exchange, no
    corpus-sized group ever materializes). Same contrast k8's
    docstring draws against d22."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("c_custkey")
        std = pdf["c_acctbal"].std(ddof=1)
        mean = pdf["c_acctbal"].mean()
        z = (
            ((pdf["c_acctbal"] - mean) / std).round(6)
            if std and std > 0
            else 0.0
        )
        return pd.DataFrame(
            {
                "c_nationkey": pdf["c_nationkey"],
                "c_custkey": pdf["c_custkey"],
                "z_acctbal": z,
            }
        )

    c = scan(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        zscore, "c_nationkey int, c_custkey long, z_acctbal double"
    )


@query(
    "k4_pandas_udaf",
    oracle=f"""
    WITH ev AS (SELECT event_type,
                       -- finite gate (numeric.finite_metric policy):
                       -- NaN sorts ABOVE Inf in duckdb but pandas
                       -- quantile skips it — gated, both engines see
                       -- the same finite order statistics (r8
                       -- --extremes sweep)
                       {FIN} AS value
                FROM events),
    r AS (SELECT event_type, value,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY value) - 1 AS rk,
                      COUNT(*) OVER (PARTITION BY event_type) AS n
               -- NULLs carry no order statistic: pandas quantile skips
               -- NaN, so the bound indices count non-null values only
               -- (r7 null sweep)
               FROM ev WHERE value IS NOT NULL),
    b AS (SELECT event_type,
                 MAX(CASE WHEN rk = CAST(floor((n-1)*0.1) AS BIGINT)
                          THEN value END) AS lo,
                 MAX(CASE WHEN rk = CAST(ceil((n-1)*0.9) AS BIGINT)
                          THEN value END) AS hi
          FROM r GROUP BY event_type)
    SELECT e.event_type, ROUND(AVG(e.value), 6) AS trimmed_mean_value
    -- null-SAFE join (r10 extended --nullkeys finding): the engine's
    -- groupBy and this oracle's own window/GROUP BY CTEs all keep the
    -- NULL-type group, but a plain USING join silently dropped it at
    -- the last step. Policy (the j39/j54 own-group rule): untyped
    -- events form a legitimate bucket — their trimmed mean is a real
    -- data-quality metric, so both engines keep it.
    FROM ev e JOIN b ON e.event_type IS NOT DISTINCT FROM b.event_type
    WHERE e.value >= b.lo AND e.value <= b.hi
    GROUP BY e.event_type
    """,
)
def k4_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (k4): per-event-type trimmed mean
    (drop top/bottom 10%) — a UDAF Spark has no builtin for.

    Oracle-parity notes: values sort before the mean (fixes float
    accumulation order under nondeterministic shuffle arrival) and the
    result rounds to 6dp on both sides. The trim bounds are exact ORDER
    STATISTICS — v[floor((n−1)·0.1)] and v[ceil((n−1)·0.9)] — NOT
    interpolated quantiles: two engines interpolating the same quantile
    evaluate different floating expressions (v[f]+(v[c]−v[f])·t vs a
    fused lerp), and on a tie-heavy corpus the last-ulp difference in
    the bound flips a whole duplicate cluster in or out of the trim
    window (caught by the 4x duplicated-corpus differential sweep, r7).
    An exact data element is bit-identical in any engine.

    100 TB notes: a grouped-AGGREGATE pandas UDF ships each group's
    full value series to one Python worker — with a handful of
    event_type keys that is a corpus-sized Series per task. The
    surface is the point here; at scale the same trimmed mean is the
    oracle's own two-phase shape: approx_percentile/t-digest bounds
    per key (d17's mergeable-sketch partial agg), broadcast the tiny
    bounds table, then a plain filtered avg — every stage
    partial-aggregates, nothing group-sized crosses to Python."""

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        import numpy as np

        # finite gate (oracle's ev CTE): NaN/±Inf/garbage magnitudes
        # carry no order statistic and would poison the mean
        v = v[np.isfinite(v) & (v.abs() <= METRIC_BOUND)]
        v = v.sort_values()
        # exact order statistics ('lower'/'higher' = v[floor((n-1)q)] /
        # v[ceil((n-1)q)]) — see the docstring's oracle-parity note
        lo = v.quantile(0.1, interpolation="lower")
        hi = v.quantile(0.9, interpolation="higher")
        inner = v[(v >= lo) & (v <= hi)]
        # a group whose values are ALL filtered out (non-finite/NULL)
        # carries no trimmed mean: return None so the engine row is
        # dropped below, matching the oracle (its b CTE has no row for
        # such a group, so the join eliminates it) — r10 ADVICE
        return round(float(inner.mean()), 6) if len(inner) else None

    e = scan(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(trimmed_mean("value").alias("trimmed_mean_value"))
        .where(F.col("trimmed_mean_value").isNotNull())
    )


@query(
    "k5_udtf",
    oracle="""
    SELECT doc_id, tok AS token
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE doc_id < 50)
    """,
)
def k5_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (k5): table function exploding text into tokens
    (1 row in → N rows out), lateral-joined per input row. Deterministic
    → SQL oracle applies."""

    @udtf(returnType="token: string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:  # NULL text → no tokens (unnest(NULL) ≡ 0 rows)
                return
            for tok in text.split(" "):
                yield (tok,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    scan(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "k5_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, t.token FROM k5_docs d, LATERAL tokenize_udtf(d.text) t"
    )


@query(
    "k7_pandas_iter_udf",
    oracle="""
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE) / 1000.0 - 0.5))),
                 6) AS model_score
    FROM documents
    """,
)
def k7_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-series pandas UDF (k7) — the model-inference batching
    pattern for LLM-pipeline scoring: expensive per-worker setup (model
    load) happens ONCE per partition, then Arrow batches stream through
    it. The stand-in "model" is a deterministic logistic over doc
    length (real checkpoints don't ship in this sandbox); the Spark
    plumbing — one-time init, per-batch inference, Arrow transfer — is
    exactly the production shape. numpy evaluates the same IEEE
    expression as the SQL oracle, so scores are bit-identical pre-round."""
    # functionType is explicit because this module uses postponed
    # annotation evaluation (PEP 563), which hides the
    # Iterator[pd.Series] signature from pandas_udf's inference.
    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("double", PandasUDFType.SCALAR_ITER)
    def model_score(batches):
        # once per python worker: the "model load"
        import numpy as np

        weight, bias = 1.0 / 1000.0, -0.5
        for n_chars in batches:
            z = n_chars.astype("float64") * weight + bias
            yield pd.Series(1.0 / (1.0 + np.exp(-z)))

    d = scan(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.round(model_score("n_chars"), 6).alias("model_score")
    )


@query(
    "k8_arrow_grouped",
    oracle="""
    SELECT doc_id, lang,
           round(n_chars
                 - CAST(SUM(n_chars) OVER (PARTITION BY lang) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY lang),
                 6) AS demeaned_chars
    FROM documents
    """,
)
def k8_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInArrow (k8): per-language demeaned document
    length, with each group arriving as a pyarrow.Table — Spark 4's
    zero-copy grouped-map surface (k3's applyInPandas minus the
    pandas materialization: no index, no object boxing, the Arrow
    batch IS the working set; the right escape hatch when the group
    fn is itself Arrow/numpy-native).

    Parity without sorting: the group mean comes from pa.compute.sum
    over int64 (EXACT, order-free — unlike k3's float moments which
    need the in-UDF sort) divided once in double; the per-row
    subtraction is then bit-identical to the oracle's window form at
    any row order. 6dp rounding is belt-and-braces.

    100 TB notes: one lang-keyed exchange; each group crosses the
    JVM->Python boundary once as Arrow record batches (no
    per-row pickling); per-task memory is the group, so a skewed
    mega-language at corpus scale would move this to the d22
    moment-broadcast form — the UDF here demonstrates the surface."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def demean(tbl: pa.Table) -> pa.Table:
        n_chars = tbl.column("n_chars")
        total = pc.sum(n_chars).as_py()  # int64: exact, order-free
        mean = total / tbl.num_rows
        dem = pc.round(
            pc.subtract(n_chars.cast(pa.float64()), pa.scalar(mean)),
            ndigits=6,
        )
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "lang": tbl.column("lang"),
                "demeaned_chars": dem,
            }
        )

    d = scan(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInArrow(
        demean, "doc_id long, lang string, demeaned_chars double"
    )


@query(
    "k10_sql_udf",
    oracle="""
    SELECT c_custkey,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'std'
                ELSE 'prem' END AS tier
    FROM customer
    """,
)
def k10_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (k10): Spark 4's `CREATE FUNCTION
    ... RETURNS ... RETURN <expr>` — the user-extension point that,
    unlike every Python UDF in this module, costs NOTHING at scale:
    the body is INLINED into the Catalyst plan at resolution, so it
    codegens with the surrounding expressions, pushes down, and never
    crosses a process boundary. The right way to centralize business
    logic (the cents policy, the tier ladder) across a 100-query
    workload: one definition, zero runtime penalty.
    tests/test_plans.py pins the inlining (no BatchEvalPython /
    ArrowEvalPython node in the plan).

    Parity: the oracle is the UDF bodies inlined by hand — if Spark's
    inliner changed semantics, the value hash would catch it."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sqlv_cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sqlv_tier(b DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN b < 0 THEN 'neg' "
        "WHEN b < 5000 THEN 'std' ELSE 'prem' END"
    )
    scan(spark, sf_dir, "customer").createOrReplaceTempView("sqlv_customer")
    return spark.sql(
        """
        SELECT c_custkey,
               sqlv_cents(c_acctbal) AS bal_cents,
               sqlv_tier(c_acctbal) AS tier
        FROM sqlv_customer
        """
    )
