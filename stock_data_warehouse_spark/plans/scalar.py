"""Scalar-layer queries — OP-P1…P18 exercised over the driver tables
(SURVEY.md §2.2, §2.7). All native Column expressions inside
whole-stage codegen; the reference's interpreted pandas kernels become
JVM-side vectorized expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import round_half_up, sql_round_half_up
from ..sources.tables import load_table, values_df
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "p_string_pack",
    oracle="""
    SELECT p_partkey,
           UPPER(TRIM(p_name)) AS name_u,
           REPLACE(p_name, ' ', '-') AS name_norm,
           p_brand || '=X' AS fx_pair,
           SUBSTRING(p_type, 1, 4) AS type_prefix,
           LENGTH(p_name) AS name_len,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           SPLIT_PART(p_name, ' ', 1) AS first_word
    FROM part
    WHERE p_name LIKE '%widget%'
    """,
)
def p_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P1/P2/P14 + §2.7 string surface: normalization (F:130),
    canonicalize (F:294), template concat (F:43)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    return p.select(
        "p_partkey",
        F.upper(F.trim("p_name")).alias("name_u"),
        F.translate("p_name", " ", "-").alias("name_norm"),
        F.concat(F.col("p_brand"), F.lit("=X")).alias("fx_pair"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
    )


@register(
    "p3_p4_coalesce_validity",
    oracle="""
    SELECT event_id,
           ROUND(COALESCE(
             CASE WHEN value > 100 THEN value END,
             CASE WHEN value > 50 THEN value * 2 END,
             1.0), 2) AS effective_value
    FROM events
    """,
)
def p3_p4_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P3/P4 — the price coalesce cascade with validity guards
    (F:142-165): first valid candidate wins, literal default last."""
    e = _t(spark, sf_dir, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(F.coalesce(
            F.when(v > 100, v),
            F.when(v > 50, v * 2),
            F.lit(1.0)), 2).alias("effective_value"),
    )


@register(
    "p5_p6_guarded_ratio_cascade",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_totalprice IS NOT NULL AND o_custkey IS NOT NULL
                       AND o_custkey > 0
                  THEN o_totalprice / o_custkey ELSE 0.0 END AS implied
      FROM orders
    )
    SELECT o_orderkey,
           {sql_round_half_up('''CASE WHEN implied <> 0 THEN implied
                ELSE COALESCE(o_totalprice * 0.01, 3.0) END''', 2)}
             AS derived_rate
    FROM base
    """,
)
def p5_p6_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P5/P6 — guarded division (pe/peg, F:84-89) + fallback cascade
    (F:91-96), shapes reused from functions.scalars. Floor-based
    half-up rounding for cross-engine tie parity (hard-part 1)."""
    from ..functions.scalars import guarded_ratio, fallback_cascade, round_money
    o = _t(spark, sf_dir, "orders")
    implied = guarded_ratio(F.col("o_totalprice"), F.col("o_custkey"))
    return o.select(
        "o_orderkey",
        round_money(fallback_cascade(implied, F.col("o_totalprice") * 0.01))
         .alias("derived_rate"),
    )


@register(
    "p7_p9_p10_arith_pack",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 30000) AS abs_dev,
           {sql_round_half_up('l_discount * 100', 2)} AS discount_pct,
           {sql_round_half_up('l_extendedprice * (1 + l_tax)', 2)} AS gross
    FROM lineitem
    """,
)
def p7_p9_p10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P7 (abs, F:182), OP-P9 (×100 scaling, F:94,241,243 — incl. the
    dividend-yield double-scaling quirk replicated verbatim), OP-P10
    (round 2, F:108). Floor-based half-up on both sides so half-cent
    ties break identically (SURVEY.md §7 hard-part 1)."""
    from ..functions.scalars import round_money
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000).alias("abs_dev"),
        round_money(F.col("l_discount") * 100).alias("discount_pct"),
        round_money(F.col("l_extendedprice") * (1 + F.col("l_tax")))
         .alias("gross"),
    )


@register(
    "p11_clamp_growth_style",
    oracle="""
    WITH cfg(segment, max_v, min_v, cyclical) AS (VALUES
      ('BUILDING',   8000.0, 500.0, TRUE),
      ('AUTOMOBILE', 6000.0, 0.0,   FALSE),
      ('MACHINERY',  7000.0, 250.0, TRUE)),
    joined AS (
      SELECT c.c_custkey, c.c_acctbal,
             COALESCE(g.max_v, 5000.0) AS max_v,
             COALESCE(g.min_v, 100.0) AS min_v,
             COALESCE(g.cyclical, FALSE) AS cyclical
      FROM customer c LEFT JOIN cfg g ON c.c_mktsegment = g.segment
    )
    SELECT c_custkey,
           ROUND(CASE WHEN c_acctbal < min_v THEN
                        CASE WHEN cyclical THEN 300.0 ELSE min_v END
                      WHEN c_acctbal > max_v THEN max_v
                      ELSE c_acctbal END, 2) AS clamped_bal
    FROM joined
    """,
)
def p11_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P11 + OP-J4 — per-group config clamp with cyclical override
    (F:98-106) and default-config fallback (F:82), as a broadcast config
    join + when-chain."""
    c = _t(spark, sf_dir, "customer")
    cfg = values_df(
        spark,
        [("BUILDING", 8000.0, 500.0, True),
         ("AUTOMOBILE", 6000.0, 0.0, False),
         ("MACHINERY", 7000.0, 250.0, True)],
        "segment string, max_v double, min_v double, cyclical boolean")
    j = (c.join(F.broadcast(cfg), c.c_mktsegment == cfg.segment, "left")
         .select(
             "c_custkey", "c_acctbal",
             F.coalesce("max_v", F.lit(5000.0)).alias("max_v"),
             F.coalesce("min_v", F.lit(100.0)).alias("min_v"),
             F.coalesce("cyclical", F.lit(False)).alias("cyclical")))
    bal, mn, mx = F.col("c_acctbal"), F.col("min_v"), F.col("max_v")
    clamped = (F.when(bal < mn, F.when(F.col("cyclical"), 300.0).otherwise(mn))
               .when(bal > mx, mx)
               .otherwise(bal))
    return j.select("c_custkey", F.round(clamped, 2).alias("clamped_bal"))


@register(
    "p12_tiered_clamp_beta_style",
    oracle="""
    SELECT s_suppkey,
           CASE
             WHEN s_acctbal IS NULL THEN 1.0
             WHEN s_acctbal < 500 THEN
               CASE WHEN s_nationkey IN (1, 2, 3) THEN 1.2 ELSE 0.8 END
             WHEN s_suppkey > 7 AND s_acctbal > 4000 THEN 4000.0
             WHEN s_suppkey > 3 AND s_suppkey <= 7 AND s_acctbal > 4500
               THEN 4500.0
             WHEN s_acctbal > 4800 THEN 4800.0
             ELSE ROUND(s_acctbal, 2)
           END AS sane_bal
    FROM supplier
    """,
)
def p12_tiered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P12 — the sanitize_beta tier ladder (F:110-124) shape: null
    default, low-band override by category, tier caps, global cap."""
    s = _t(spark, sf_dir, "supplier")
    bal, key = F.col("s_acctbal"), F.col("s_suppkey")
    sane = (
        F.when(bal.isNull(), F.lit(1.0))
        .when(bal < 500,
              F.when(F.col("s_nationkey").isin(1, 2, 3), 1.2).otherwise(0.8))
        .when((key > 7) & (bal > 4000), F.lit(4000.0))
        .when((key > 3) & (key <= 7) & (bal > 4500), F.lit(4500.0))
        .when(bal > 4800, F.lit(4800.0))
        .otherwise(F.round(bal, 2))
    )
    return s.select("s_suppkey", sane.alias("sane_bal"))


@register(
    "p13_rule_classifier",
    oracle="""
    SELECT p_partkey,
           CASE
             WHEN p_type LIKE '%ECONOMY%' OR p_name LIKE '%cheap%'
               THEN 'Value'
             WHEN p_type LIKE '%PREMIUM%' THEN 'Premium'
             WHEN p_name LIKE '%widget%' AND p_size > 30 THEN 'BigWidget'
             WHEN p_brand LIKE '%Brand#1%' THEN 'House'
             ELSE 'General'
           END AS category
    FROM part
    """,
)
def p13_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P13 — ordered substring classifier with precedence + 'General'
    default (determine_sector, F:53-66): first match wins."""
    p = _t(spark, sf_dir, "part")
    cat = (
        F.when(F.col("p_type").contains("ECONOMY")
               | F.col("p_name").contains("cheap"), "Value")
        .when(F.col("p_type").contains("PREMIUM"), "Premium")
        .when(F.col("p_name").contains("widget") & (F.col("p_size") > 30),
              "BigWidget")
        .when(F.col("p_brand").contains("Brand#1"), "House")
        .otherwise("General")
    )
    return p.select("p_partkey", cat.alias("category"))


@register(
    "p17_json_extraction",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def p17_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P17 — JSON-in-string field extraction (events.props), the
    semi-structured ``info.get`` pattern (F:137) made relational."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (e.withColumn("k", k)
            .filter(F.col("k").isNotNull())
            .groupBy("event_type")
            .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n")))


@register(
    "p18_date_math_pack",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
                AS INT) AS days_to_eoy,
           CAST(DATE_TRUNC('day', o_orderdate) AS TIMESTAMP) AS order_date,
           CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k,
           CAST(CEIL(o_totalprice / 1000) AS BIGINT) AS price_k_up,
           ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
           ROUND(LN(o_totalprice + 1), 6) AS price_ln,
           ROUND(POW(o_totalprice, 0.5) + GREATEST(o_totalprice, 100000.0)
                 - LEAST(o_totalprice, 100000.0), 6) AS mixed
    FROM orders
    """,
)
def p18_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P18 — date/math scalar pack (§2.7 surface; anchors F:105,108,
    272). Everything stays in whole-stage codegen."""
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.datediff(F.lit("1998-12-31").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_eoy"),
        F.date_trunc("day", "o_orderdate").alias("order_date"),
        F.floor(price / 1000).alias("price_k"),
        F.ceil(price / 1000).alias("price_k_up"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price + 1), 6).alias("price_ln"),
        F.round(F.pow(price, 0.5) + F.greatest(price, F.lit(100000.0))
                - F.least(price, F.lit(100000.0)), 6).alias("mixed"),
    )


# ---------------------------------------------------------------------------
# §2.7 collection surface — arrays + higher-order functions
# ---------------------------------------------------------------------------

def _arr6(col) -> F.Column:
    """array<double> → one canonical scalar string cell ("v1,v2,…").

    Every element goes through the floor-based half-up kernel at 6 dp
    (``floor(|x|·10⁶ + 0.5)`` on the raw IEEE double — see
    ``functions.scalars.round_half_up`` for why the old DECIMAL route
    was falsified cross-engine), then the exact scaled integer is
    rendered at fixed 6-dp scale via an exact decimal multiply, so the
    digits can't depend on either engine's double-formatting. Result
    columns must stay scalar: the driver's canonicalizer sorts raw
    pandas cells and crashes on list cells (CORRECTNESS_r02:
    unhashable type 'list'). Domain: |x| ≲ 9.2e12 (scaled value must
    fit a BIGINT; property-tested at ±1e9)."""
    def cell(x):
        n = F.floor(F.abs(x) * F.lit(1000000.0) + F.lit(0.5))  # LONG
        n_s = F.when(x < 0, -n).otherwise(n)
        return (n_s.cast("decimal(20,0)")
                * F.lit("0.000001").cast("decimal(7,6)")) \
            .cast("decimal(28,6)").cast("string")
    return F.concat_ws(",", F.transform(col, cell))


def _sql_arr6(expr: str) -> str:
    """DuckDB twin of :func:`_arr6` — identical element pipeline
    (IEEE floor-scale, BIGINT, exact decimal render). COALESCE aligns
    the empty/NULL-array edge: DuckDB's array_to_string is
    string_agg-shaped (empty → NULL) where Spark's concat_ws yields ''
    (property-tested in test_property_kernels)."""
    n = "CAST(FLOOR(ABS(x) * 1000000.0 + 0.5) AS BIGINT)"
    cell = (f"CAST(CAST(CASE WHEN x < 0 THEN -{n} ELSE {n} END"
            " AS DECIMAL(20,0)) * CAST('0.000001' AS DECIMAL(7,6))"
            " AS DECIMAL(28,6))")
    return ("COALESCE(array_to_string(list_transform(" + expr + ", x -> "
            f"CAST({cell} AS VARCHAR)), ','), '')")


@register(
    "p_collection_pack",
    oracle=f"""
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
             [l_quantity, l_extendedprice * (1 - l_discount),
              l_tax * 100] AS arr
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           {_sql_arr6('arr')} AS arr,
           {_sql_arr6('list_transform(arr, y -> y * 2)')} AS doubled,
           len(list_filter(arr, x -> x > 10)) AS n_big,
           {sql_round_half_up('''list_reduce(list_prepend(0.0, arr),
                             (acc, x) -> acc + x)''', 4)} AS total,
           {_sql_arr6('list_sort(arr)')} AS sorted_arr,
           {_sql_arr6('arr[1:2]')} AS first_two,
           list_contains(arr, 0.0) AS has_zero
    FROM base
    """,
)
def p_collection_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — the array/higher-order surface (array, transform, filter,
    aggregate, sort_array, slice, array_contains) in one projection.
    All JVM-side expression evaluation over the scan — zero shuffles,
    zero UDFs; the fold mirrors DuckDB's sequential list_reduce
    bit-exactly (same operand order). Array-valued outputs are
    serialized through :func:`_arr6` so every result cell is a scalar
    the driver's pandas canonicalizer can hash (VERDICT r2 item 1);
    the higher-order ops still run on the native array<double>."""
    l = _t(spark, sf_dir, "lineitem")
    arr = F.array(
        F.col("l_quantity"),
        F.col("l_extendedprice") * (1 - F.col("l_discount")),
        F.col("l_tax") * 100)
    base = l.select("l_orderkey", "l_linenumber", arr.alias("arr"))
    a = F.col("arr")
    return base.select(
        "l_orderkey", "l_linenumber",
        _arr6(a).alias("arr"),
        _arr6(F.transform(a, lambda x: x * 2)).alias("doubled"),
        F.size(F.filter(a, lambda x: x > 10)).alias("n_big"),
        round_half_up(
            F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x), 4)
         .alias("total"),
        _arr6(F.sort_array(a)).alias("sorted_arr"),
        _arr6(F.slice(a, 1, 2)).alias("first_two"),
        F.array_contains(a, 0.0).alias("has_zero"))


@register(
    "p_map_json_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           len(json_keys(props)) AS n_keys,
           list_contains(json_keys(props), 'k') AS has_k,
           CAST(json_extract_string(props, '$.missing') AS BIGINT)
             AS missing_val
    FROM events
    """,
)
def p_map_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — the map/json surface: ``from_json`` with an explicit map
    schema, ``map_keys``/``element_at``/``array_contains``, absent-key
    null semantics. The JSON parse happens once per row inside the
    projection (no UDF); DuckDB's json_* functions are the oracle's
    denotation."""
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_contains(F.map_keys(m), "k").alias("has_k"),
        F.element_at(m, "missing").alias("missing_val"))


@register(
    "p19_format_datetime_pack",
    oracle=f"""
    SELECT o_orderkey,
           'ORD-' || printf('%07d', o_orderkey) AS order_tag,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')
             AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(CASE WHEN o_totalprice > 150000 THEN 1
                     WHEN o_totalprice < 150000 THEN -1
                     ELSE 0 END AS INT) AS price_sign,
           {_sql_arr6(f'''[o_totalprice,
            {sql_round_half_up('o_totalprice * 0.1', 2)}]''')} AS charge_vals,
           'STRUCT<k: BIGINT>' AS props_shape
    FROM orders
    """,
)
def p19_format_datetime_pack(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """§2.7 remainder pack — the declared scalar functions no other
    query exercises: ``format_string`` (printf-style key formatting —
    the reference's f-string idiom F:43 generalized), ``date_add`` /
    ``unix_timestamp`` (SLA due dates, epoch export), ``signum``,
    ``create_map``+``map_values`` (record-to-array reshaping), and
    ``schema_of_json`` (schema inference on a sample literal — its
    output is a constant the oracle states verbatim). All JVM Column
    expressions inside one projection — zero shuffles, scan-composable.
    """
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("ORD-%07d", "o_orderkey").alias("order_tag"),
        F.date_format(
            F.date_add(F.col("o_orderdate").cast("date"), 30),
            "yyyy-MM-dd").alias("due_date"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
         .alias("epoch_s"),
        F.signum(F.col("o_totalprice") - 150000).cast("int")
         .alias("price_sign"),
        _arr6(F.map_values(F.create_map(
            F.lit("total"), F.col("o_totalprice"),
            F.lit("tax"),
            round_half_up(F.col("o_totalprice") * 0.1, 2))))
         .alias("charge_vals"),
        F.schema_of_json(F.lit('{"k": 1}')).alias("props_shape"))


@register(
    "p20_variant_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           CAST(json_extract_string(props, '$.missing') AS BIGINT)
             AS missing_typed,
           'OBJECT<k: BIGINT>' AS variant_shape,
           json_extract_string(props, '$.k') IS NULL AS k_absent
    FROM events
    """,
)
def p20_variant_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 (Spark-4 surface) — the VARIANT semi-structured type:
    ``parse_json`` binds the props JSON once into Spark's binary
    variant encoding, then ``try_variant_get`` extracts typed paths
    (present and absent) and ``schema_of_variant`` introspects the
    value's shape — the modern engine-native alternative to the
    ``from_json``-with-declared-schema pack (p_map_json_pack), for
    feeds whose schema drifts. The oracle states the same denotation
    through DuckDB's json functions; the shape column is a constant
    for this corpus (every props row is {"k": <int>}), which the
    oracle pins verbatim. Pure projection — scan-composable at any
    scale, no shuffles, and the variant parse happens exactly once
    per row."""
    e = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.try_variant_get(v, "$.missing", "bigint")
         .alias("missing_typed"),
        F.schema_of_variant(v).alias("variant_shape"),
        F.try_variant_get(v, "$.k", "bigint").isNull()
         .alias("k_absent"))


@register(
    "p21_try_arith_pack",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 1.0 THEN NULL
                ELSE l_extendedprice / (l_quantity - 1.0)
           END AS unit_excl,
           TRY_CAST(l_returnflag AS BIGINT) AS flag_as_int,
           TRY_CAST(l_shipdate::VARCHAR AS BIGINT) AS date_as_int,
           CASE WHEN l_orderkey > 0 THEN NULL
                ELSE l_orderkey + 9223372036854775807
           END AS overflow_add,
           CASE WHEN l_linenumber >= 1 AND l_linenumber <= 2
                THEN ['a', 'b'][l_linenumber] ELSE NULL
           END AS elem_or_null
    FROM lineitem
    """,
)
def p21_try_arith_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 / OP-E3 (ANSI-safe scalar surface) — the ``try_*`` family:
    error conditions become NULL instead of task failures, the per-
    expression form of the reference's default-on-failure semantics
    (fetch_data.py:136-140 catches per ticker; ``try_*`` catches per
    VALUE, which is what survives at 100 TB where one poisoned row
    must not kill a stage). Covered: ``try_divide`` (÷0 over doubles),
    ``try_cast`` on unparseable strings, ``try_add`` at bigint
    overflow, ``try_element_at`` past array bounds. The oracle states
    each NULL condition explicitly (DuckDB raises where Spark nulls,
    so the replay is the CASE-guarded denotation — same contract as
    the guarded-division kernel, scalars.py::guarded_ratio). Pure
    projection: no shuffle, whole-stage codegen, scan-composable."""
    li = _t(spark, sf_dir, "lineitem")
    long_max = 9223372036854775807
    return li.select(
        "l_orderkey", "l_linenumber",
        F.try_divide(F.col("l_extendedprice"),
                     F.col("l_quantity") - 1.0).alias("unit_excl"),
        F.col("l_returnflag").try_cast("bigint").alias("flag_as_int"),
        F.col("l_shipdate").cast("string").try_cast("bigint")
         .alias("date_as_int"),
        F.try_add(F.col("l_orderkey"), F.lit(long_max))
         .alias("overflow_add"),
        F.try_element_at(F.array(F.lit("a"), F.lit("b")),
                         F.col("l_linenumber")).alias("elem_or_null"))


# ---------------------------------------------------------------------------
# OP-P22 — URL canonicalization + canonical-URL dedup (web-corpus
# curation: the first pass every crawl-derived training set runs)
# ---------------------------------------------------------------------------

@register(
    "p22_url_canonicalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://WWW.' || UPPER(source) || '.Example.COM:443/Path/'
             || CAST(doc_id % 3 AS VARCHAR) || '/?utm_source=feed&b='
             || CAST(doc_id % 2 AS VARCHAR) || '&a=1'
             || CASE WHEN doc_id % 2 = 0
                     THEN '&utm_campaign=promo' ELSE '' END
             || '#sec' AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, url,
             lower(split_part(split_part(url, '#', 1), '://', 1))
               AS scheme,
             split_part(split_part(url, '#', 1), '://', 2) AS rest
      FROM raw
    ),
    hp AS (
      SELECT *, split_part(rest, '/', 1) AS hostport,
             substr(rest, length(split_part(rest, '/', 1)) + 1)
               AS pathq
      FROM parts
    ),
    comp AS (
      SELECT doc_id, url, scheme,
             CASE WHEN lower(split_part(hostport, ':', 1))
                       LIKE 'www.%'
                  THEN substr(lower(split_part(hostport, ':', 1)), 5)
                  ELSE lower(split_part(hostport, ':', 1)) END AS host,
             split_part(hostport, ':', 2) AS port,
             split_part(pathq, '?', 1) AS path,
             split_part(pathq, '?', 2) AS query
      FROM hp
    ),
    norm AS (
      SELECT doc_id, url,
             scheme || '://'
             || CASE WHEN port = ''
                       OR (scheme = 'https' AND port = '443')
                       OR (scheme = 'http' AND port = '80')
                     THEN host ELSE host || ':' || port END
             || CASE WHEN path = '/' THEN path
                     ELSE trim(TRAILING '/' FROM path) END
             || CASE WHEN array_to_string(list_sort(list_filter(
                         string_split(query, '&'),
                         p -> p <> '' AND NOT starts_with(p, 'utm_'))),
                         '&') <> ''
                     THEN '?' || array_to_string(list_sort(list_filter(
                         string_split(query, '&'),
                         p -> p <> '' AND NOT starts_with(p, 'utm_'))),
                         '&')
                     ELSE '' END AS url_norm
      FROM comp
    )
    SELECT doc_id, url AS url_raw, url_norm,
           (doc_id = MIN(doc_id) OVER (PARTITION BY url_norm))
             AS is_keeper
    FROM norm
    """,
)
def p22_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-P22 — URL canonicalization, the first dedup pass of every
    crawl-derived corpus (Common Crawl WAT/CDX curation): lowercase
    scheme and host (path case is PRESERVED — it is significant),
    strip the fragment, drop the scheme's default port, strip a
    leading ``www.``, remove tracking parameters (``utm_*``), SORT the
    surviving query parameters (param order is non-semantic), and trim
    the trailing path slash — then exact-dedup on the canonical form,
    keeping the lowest doc_id per group (total-order tiebreak).

    The raw URLs are synthesized deterministically from doc columns
    (the corpus ships no URL field — the synthesis is scaffolding, the
    NORMALIZER is the operator; production swaps in the real column).
    Everything is pure string algebra shared between engines —
    ``split_part``/``substring_index``, ``trim(TRAILING ...)``,
    split→filter→sort→join for the params (binary collation on both
    sides, so the sort is identical) — no regex, no UDF: at 100 TB
    this is a scan-side projection plus ONE shuffle for the keeper
    window on the canonical key (or a min-aggregate join, x1's exact-
    dedup shape). Distinct canonical cardinality is bounded by
    (source × path × param) combinatorics here; in production the
    window partitions on the full canonical-URL key — unbounded
    cardinality is exactly what hash partitioning wants."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."), F.upper("source"),
        F.lit(".Example.COM:443/Path/"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("/?utm_source=feed&b="),
        (F.col("doc_id") % 2).cast("string"), F.lit("&a=1"),
        F.when(F.col("doc_id") % 2 == 0,
               F.lit("&utm_campaign=promo")).otherwise(F.lit("")),
        F.lit("#sec"))
    c = (d.select("doc_id", url.alias("url_raw"))
          .withColumn("nofrag",
                      F.substring_index(F.col("url_raw"), "#", 1))
          .withColumn("scheme",
                      F.lower(F.substring_index("nofrag", "://", 1)))
          .withColumn("rest", F.substring_index("nofrag", "://", -1))
          .withColumn("hostport", F.substring_index("rest", "/", 1))
          .withColumn("pathq",
                      F.expr("substr(rest, length(hostport) + 1)"))
          .withColumn("host0",
                      F.lower(F.substring_index("hostport", ":", 1)))
          .withColumn("host",
                      F.when(F.col("host0").startswith("www."),
                             F.expr("substr(host0, 5)"))
                       .otherwise(F.col("host0")))
          .withColumn("port",
                      F.when(F.col("hostport").contains(":"),
                             F.substring_index("hostport", ":", -1))
                       .otherwise(F.lit("")))
          .withColumn("path", F.substring_index("pathq", "?", 1))
          .withColumn("query",
                      F.when(F.col("pathq").contains("?"),
                             F.substring_index("pathq", "?", -1))
                       .otherwise(F.lit("")))
          .withColumn("params", F.array_join(
              F.array_sort(F.filter(
                  F.split(F.col("query"), "&", -1),
                  lambda p: (p != "") & ~p.startswith("utm_"))), "&")))
    hostport_norm = F.when(
        (F.col("port") == "")
        | ((F.col("scheme") == "https") & (F.col("port") == "443"))
        | ((F.col("scheme") == "http") & (F.col("port") == "80")),
        F.col("host")).otherwise(
        F.concat(F.col("host"), F.lit(":"), F.col("port")))
    path_norm = F.when(F.col("path") == "/", F.col("path")) \
                 .otherwise(F.expr("trim(TRAILING '/' FROM path)"))
    url_norm = F.concat(
        F.col("scheme"), F.lit("://"), hostport_norm, path_norm,
        F.when(F.col("params") != "",
               F.concat(F.lit("?"), F.col("params")))
         .otherwise(F.lit("")))
    n = c.withColumn("url_norm", url_norm)
    w = Window.partitionBy("url_norm")
    return n.select(
        "doc_id", "url_raw", "url_norm",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_keeper"))
