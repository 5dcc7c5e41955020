"""Scalar-function surface coverage (SURVEY.md §2.7) — string / math / temporal /
conditional / regex / JSON / collection suites, each oracle-checked.

Flink declares these in FlinkSqlOperatorTable.java (1054 LoC) with runtime
impls in SqlFunctionUtils.java:62 and SqlDateTimeUtils.java; here every function
is either a Spark built-in or a flink_1_12_0_src_spark.functions helper
(JVM-expression composition — no Python UDFs).

Oracle dialect notes: DuckDB lacks INITCAP/OVERLAY (emulated in the oracle),
rounds double→int (we avoid it), treats SIMILAR TO as a raw regex (we translate
the SQL pattern on both sides with the same helper), and its dayofweek is
0-based (oracle adds 1). Transcendentals (exp/ln/sin/…) are rounded to 6
decimals on both sides — libm results may differ in the last ULP across
engines; everything else matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_1_12_0_src_spark.catalog import table
from flink_1_12_0_src_spark.functions import (
    is_alpha,
    is_decimal,
    is_digit,
    is_json_object,
    is_json_scalar,
    is_json_value,
    similar_to,
    similar_to_regex,
    split_index,
    truncate_num,
)
from flink_1_12_0_src_spark.queries import register

SIMILAR_PAT = "%(red|blue)%"
SIMILAR_RE = similar_to_regex(SIMILAR_PAT)  # same translation feeds both engines


@register(
    "fn_string_suite",
    oracle="""
SELECT p_partkey,
       length(p_name) AS name_len,
       upper(p_name) AS up,
       lower(p_brand) AS lo,
       substring(p_name, 2, 5) AS sub,
       replace(p_name, ' ', '_') AS repl,
       reverse(p_name) AS rev,
       lpad(p_type, 10, '*') AS lpadded,
       rpad(p_type, 10, '*') AS rpadded,
       concat(p_brand, '-', p_type) AS cat,
       concat_ws('/', p_brand, p_type, p_name) AS catws,
       strpos(p_name, 'a') AS pos_a,
       left(p_name, 3) AS l3,
       right(p_name, 3) AS r3,
       trim('  ' || p_name || ' ') AS trimmed,
       repeat(left(p_brand, 2), 3) AS rep2,
       ascii(p_name) AS first_ascii,
       array_to_string(list_transform(string_split(p_name, ' '),
                                      w -> upper(left(w, 1)) || lower(substring(w, 2))), ' ') AS initcapped,
       substring(p_name, 1, 1) || 'XX' || substring(p_name, 4) AS overlaid,
       split_part(p_name, ' ', 2) AS second_word,
       md5(p_name) AS name_md5,
       sha256(p_name) AS name_sha256,
       to_base64(encode(p_brand)) AS brand_b64,
       lower(hex(encode(left(p_name, 4)))) AS name_hex,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up
FROM part WHERE p_partkey <= 300 ORDER BY p_partkey
""",
    tags=("batch", "functions", "string"),
    doc="String function family (Flink: CHAR_LENGTH/UPPER/LOWER/SUBSTRING/REPLACE/"
    "REVERSE/LPAD/RPAD/CONCAT(_WS)/POSITION/LEFT/RIGHT/TRIM/REPEAT/ASCII/INITCAP/"
    "OVERLAY/SPLIT_INDEX/MD5/SHA256/TO_BASE64/HEX/TRANSLATE — SqlFunctionUtils.java).",
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 2, 5).alias("sub"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("repl"),
        F.reverse("p_name").alias("rev"),
        F.lpad("p_type", 10, "*").alias("lpadded"),
        F.rpad("p_type", 10, "*").alias("rpadded"),
        F.concat("p_brand", F.lit("-"), "p_type").alias("cat"),
        F.concat_ws("/", "p_brand", "p_type", "p_name").alias("catws"),
        F.instr("p_name", "a").alias("pos_a"),
        F.left("p_name", F.lit(3)).alias("l3"),
        F.right("p_name", F.lit(3)).alias("r3"),
        F.trim(F.concat(F.lit("  "), "p_name", F.lit(" "))).alias("trimmed"),
        F.repeat(F.left("p_brand", F.lit(2)), 3).alias("rep2"),
        F.ascii("p_name").alias("first_ascii"),
        F.initcap("p_name").alias("initcapped"),
        F.overlay("p_name", F.lit("XX"), 2).alias("overlaid"),
        split_index("p_name", " ", 1).alias("second_word"),
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name").cast("binary"), 256).alias("name_sha256"),
        F.base64(F.encode("p_brand", "UTF-8")).alias("brand_b64"),
        F.lower(F.hex(F.encode(F.left("p_name", F.lit(4)), "UTF-8"))).alias("name_hex"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
    ).orderBy("p_partkey")


@register(
    "fn_flink_parity",
    oracle=f"""
SELECT p_partkey,
       string_split(p_name, ' ')[2] AS word1,
       string_split(p_name, ' ')[9] AS word8_null,
       regexp_full_match(CAST(p_size AS VARCHAR), '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$') AS size_is_decimal,
       regexp_full_match(p_name, '^[0-9]+$') AS name_is_digit,
       regexp_full_match(replace(p_name, ' ', ''), '^[a-zA-Z]+$') AS squashed_is_alpha,
       regexp_matches(p_name, '{SIMILAR_RE}') AS name_similar,
       CASE WHEN p_size >= least(3, 7) AND p_size <= greatest(3, 7) THEN TRUE ELSE FALSE END AS size_between_sym,
       trunc(CAST(p_retailprice AS DOUBLE) * 10) / 10 AS price_trunc1
FROM part WHERE p_partkey <= 300 AND p_retailprice >= 0 ORDER BY p_partkey
""",
    tags=("batch", "functions", "flink_parity"),
    doc="Flink-only functions re-implemented as JVM expression compositions "
    "(functions/scalar.py): SPLIT_INDEX (0-based, NULL OOB), IS_DECIMAL/IS_DIGIT/"
    "IS_ALPHA, SIMILAR TO (SQL-pattern→regex translation shared with the oracle), "
    "BETWEEN SYMMETRIC, TRUNCATE(n, d).",
)
def fn_flink_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_partkey") <= 300) & (F.col("p_retailprice") >= 0)
    )
    from flink_1_12_0_src_spark.functions import between_symmetric

    return p.select(
        "p_partkey",
        split_index("p_name", " ", 1).alias("word1"),
        split_index("p_name", " ", 8).alias("word8_null"),
        is_decimal(F.col("p_size").cast("string")).alias("size_is_decimal"),
        is_digit("p_name").alias("name_is_digit"),
        is_alpha(F.replace(F.col("p_name"), F.lit(" "), F.lit(""))).alias("squashed_is_alpha"),
        similar_to("p_name", SIMILAR_PAT).alias("name_similar"),
        between_symmetric("p_size", 3, 7).alias("size_between_sym"),
        truncate_num(F.col("p_retailprice").cast("double"), 1).alias("price_trunc1"),
    ).orderBy("p_partkey")


@register(
    "fn_math_suite",
    oracle="""
SELECT q,
       abs(q - 25.0) AS abs_dev,
       CAST(ceil(q / 7.0) AS DOUBLE) AS ceiled,
       CAST(floor(q / 7.0) AS DOUBLE) AS floored,
       round(q / 7.0, 2) AS rounded2,
       sqrt(q) AS sq,
       CAST(q AS INTEGER) % 7 AS mod7,
       power(q, 2) AS squared,
       CAST(sign(q - 25.0) AS DOUBLE) AS sgn,
       round(exp(q / 50.0), 6) AS e_x,
       round(ln(q), 6) AS ln_q,
       round(log10(q), 6) AS log10_q,
       round(log2(q), 6) AS log2_q,
       round(sin(q), 6) AS sin_q,
       round(cos(q), 6) AS cos_q,
       round(tan(q / 100.0), 6) AS tan_q,
       round(cot(q / 100.0 + 0.5), 6) AS cot_q,
       round(atan2(q, 10.0), 6) AS atan2_q,
       round(degrees(q / 10.0), 6) AS deg,
       round(radians(q), 6) AS rad,
       round(pi(), 6) AS pi_val
FROM (SELECT DISTINCT l_quantity AS q FROM lineitem) ORDER BY q
""",
    tags=("batch", "functions", "math"),
    doc="Math function family (Flink ABS/CEIL/FLOOR/ROUND/SQRT/MOD/POWER/SIGN/EXP/"
    "LN/LOG10/LOG2/SIN/COS/TAN/COT/ATAN2/DEGREES/RADIANS/PI — FlinkSqlOperatorTable). "
    "Transcendentals rounded to 6dp for cross-engine libm stability.",
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = table(spark, sf_dir, "lineitem").select(F.col("l_quantity").alias("q")).distinct()
    qc = F.col("q")
    return q.select(
        "q",
        F.abs(qc - 25.0).alias("abs_dev"),
        F.ceil(qc / 7.0).cast("double").alias("ceiled"),
        F.floor(qc / 7.0).cast("double").alias("floored"),
        F.round(qc / 7.0, 2).alias("rounded2"),
        F.sqrt(qc).alias("sq"),
        (qc.cast("int") % 7).alias("mod7"),
        F.pow(qc, 2).alias("squared"),
        F.signum(qc - 25.0).alias("sgn"),
        F.round(F.exp(qc / 50.0), 6).alias("e_x"),
        F.round(F.log(qc), 6).alias("ln_q"),
        F.round(F.log10(qc), 6).alias("log10_q"),
        F.round(F.log2(qc), 6).alias("log2_q"),
        F.round(F.sin(qc), 6).alias("sin_q"),
        F.round(F.cos(qc), 6).alias("cos_q"),
        F.round(F.tan(qc / 100.0), 6).alias("tan_q"),
        F.round(F.cot(qc / 100.0 + 0.5), 6).alias("cot_q"),
        F.round(F.atan2(qc, F.lit(10.0)), 6).alias("atan2_q"),
        F.round(F.degrees(qc / 10.0), 6).alias("deg"),
        F.round(F.radians(qc), 6).alias("rad"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_val"),
    ).orderBy("q")


@register(
    "fn_temporal_suite",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qtr,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mon,
       CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       o_orderdate + INTERVAL 30 DAY AS plus_30d,
       o_orderdate - INTERVAL 2 HOUR AS minus_2h,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
       strftime(o_orderdate, '%Y-%m-%d') AS fmt_date,
       CAST(o_orderdate AS DATE) AS as_date
FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey
""",
    tags=("batch", "functions", "temporal"),
    doc="Temporal function family (Flink EXTRACT/YEAR…DAYOFWEEK/FLOOR-to-unit/"
    "LAST_DAY/UNIX_TIMESTAMP/interval arithmetic/DATEDIFF/DATE_FORMAT/TO_DATE — "
    "SqlDateTimeUtils.java). DOW normalized to Spark's 1=Sunday convention.",
)
def fn_temporal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("woy"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.unix_timestamp(d).alias("epoch_s"),
        (d + F.expr("INTERVAL 30 DAY")).alias("plus_30d"),
        (d - F.expr("INTERVAL 2 HOUR")).alias("minus_2h"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_format(d, "yyyy-MM-dd").alias("fmt_date"),
        d.cast("date").alias("as_date"),
    ).orderBy("o_orderkey")


@register(
    "fn_conditional_suite",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 2500 THEN 'low' ELSE 'high' END AS tier,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       CASE WHEN c_acctbal > 5000 THEN 'vip' ELSE 'std' END AS vip,
       CAST(greatest(c_acctbal, 0.0) AS DOUBLE) AS nonneg_bal,
       CAST(least(c_acctbal, 1000.0) AS DOUBLE) AS capped_bal,
       c_mktsegment IS NOT DISTINCT FROM 'MACHINERY' AS is_machinery,
       c_acctbal IS NULL AS bal_missing
FROM customer WHERE c_custkey <= 800 ORDER BY c_custkey
""",
    tags=("batch", "functions", "conditional"),
    doc="Conditional family (Flink CASE/NULLIF/COALESCE/IF/GREATEST/LEAST/"
    "IS [NOT] DISTINCT FROM — FlinkSqlOperatorTable). Spark `<=>` = IS NOT DISTINCT FROM.",
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 800)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 2500, "low").otherwise("high").alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.expr("IF(c_acctbal > 5000, 'vip', 'std')").alias("vip"),
        F.greatest(bal, F.lit(0.0)).cast("double").alias("nonneg_bal"),
        F.least(bal, F.lit(1000.0)).cast("double").alias("capped_bal"),
        F.col("c_mktsegment").eqNullSafe("MACHINERY").alias("is_machinery"),
        bal.isNull().alias("bal_missing"),
    ).orderBy("c_custkey")


@register(
    "fn_regex_like",
    oracle="""
SELECT doc_id,
       text LIKE '%data%' AS has_data,
       text NOT LIKE '%spark%' AS no_spark,
       regexp_matches(text, '(fast|slow)') AS has_speed,
       regexp_extract(text, '([a-z]+) (join|scan)', 1) AS word_before_op,
       regexp_replace(text, '[aeiou]', '.', 'g') AS devoweled,
       len(regexp_extract_all(text, 'table')) AS table_mentions
FROM documents WHERE doc_id <= 100 ORDER BY doc_id
""",
    tags=("batch", "functions", "regex"),
    doc="LIKE / REGEXP / REGEXP_EXTRACT / REGEXP_REPLACE / regexp-count family "
    "(Flink …REGEXP* in SqlFunctionUtils.java). DuckDB regexp_replace needs the "
    "'g' flag to match Spark's replace-all semantics.",
)
def fn_regex_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    t = F.col("text")
    return d.select(
        "doc_id",
        t.like("%data%").alias("has_data"),
        (~t.like("%spark%")).alias("no_spark"),
        t.rlike("(fast|slow)").alias("has_speed"),
        F.regexp_extract(t, r"([a-z]+) (join|scan)", 1).alias("word_before_op"),
        F.regexp_replace(t, "[aeiou]", ".").alias("devoweled"),
        F.size(F.regexp_extract_all(t, F.lit("table"), 0)).alias("table_mentions"),
    ).orderBy("doc_id")


@register(
    "fn_json_suite",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       json_valid(props) AS valid_json,
       json_valid(props) AND regexp_matches(ltrim(props), '^\\{') AS is_obj,
       json_valid(props) AND NOT regexp_matches(ltrim(props), '^[\\{\\[]') AS is_scalar
FROM events WHERE event_id <= 2000 ORDER BY event_id
""",
    tags=("batch", "functions", "json"),
    doc="JSON surface: value extraction (Flink JSON_VALUE analog via "
    "get_json_object) + SQL:2016 IS JSON predicates (functions/scalar.py over "
    "Spark-4 try_parse_json).",
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        is_json_value("props").alias("valid_json"),
        is_json_object("props").alias("is_obj"),
        is_json_scalar("props").alias("is_scalar"),
    ).orderBy("event_id")


@register(
    "fn_collection_suite",
    oracle="""
SELECT n_nationkey,
       [n_nationkey, n_regionkey, 99][1] AS first_elem,
       len([n_nationkey, n_regionkey, 99]) AS arr_len,
       list_contains([n_nationkey, n_regionkey], 0) AS has_zero,
       array_to_string(list_sort([n_regionkey, n_nationkey, 99]), ',') AS sorted_join,
       array_to_string(flatten([[n_nationkey], [n_regionkey, 99]]), ',') AS flat_join,
       map(['key'], [n_name])['key'][1] AS from_map,
       struct_pack(k := n_nationkey, r := n_regionkey).k AS struct_field
FROM nation ORDER BY n_nationkey
""",
    tags=("batch", "functions", "collection"),
    doc="Collection constructors/accessors (Flink ARRAY/MAP/ROW, CARDINALITY, "
    "ELEMENT/ITEM, FLATTEN — …/types/logical/ArrayType.java etc.). Scalar-only "
    "outputs so the cross-engine hash is well-defined.",
)
def fn_collection_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    arr = F.array(F.col("n_nationkey"), F.col("n_regionkey"), F.lit(99))
    return n.select(
        "n_nationkey",
        F.element_at(arr, 1).alias("first_elem"),
        F.size(arr).alias("arr_len"),
        F.array_contains(F.array("n_nationkey", "n_regionkey"), 0).alias("has_zero"),
        F.array_join(
            F.array_sort(F.array(F.col("n_regionkey"), F.col("n_nationkey"), F.lit(99))), ","
        ).alias("sorted_join"),
        F.array_join(
            F.flatten(F.array(F.array("n_nationkey"), F.array(F.col("n_regionkey"), F.lit(99)))),
            ",",
        ).alias("flat_join"),
        F.element_at(F.create_map(F.lit("key"), F.col("n_name")), "key").alias("from_map"),
        F.struct(F.col("n_nationkey").alias("k"), F.col("n_regionkey").alias("r"))["k"].alias(
            "struct_field"
        ),
    ).orderBy("n_nationkey")


_DECIMAL_EXPRS = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(a + b AS DECIMAL(14,2)) AS DOUBLE)        AS dec_add,
       CAST(CAST(a - b AS DECIMAL(14,2)) AS DOUBLE)        AS dec_sub,
       CAST(CAST(a * d AS DECIMAL(26,4)) AS DOUBLE)        AS dec_mul,
       CAST(CAST(a / 8 AS DECIMAL(18,5)) AS DOUBLE)        AS dec_div8,
       CAST(CAST(round(a, 1)  AS DECIMAL(12,1)) AS DOUBLE) AS dec_round1,
       CAST(CAST(round(a, 0)  AS DECIMAL(12,0)) AS DOUBLE) AS dec_round0,
       CAST(CAST(round(a, -1) AS DECIMAL(12,0)) AS DOUBLE) AS dec_round_neg1,
       CAST(ceil(a)  AS BIGINT)           AS dec_ceil,
       CAST(floor(a) AS BIGINT)           AS dec_floor,
       CAST(CAST(abs(a - b) AS DECIMAL(14,2)) AS DOUBLE)   AS dec_abs,
       CAST(sign(a - 1000) AS INT)        AS dec_sign,
       CAST(CAST(floor(a) AS BIGINT) % 7 AS INT) AS dec_mod7
FROM (
  SELECT l_orderkey, l_linenumber,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS a,
         CAST(l_quantity      AS DECIMAL(12,2)) AS b,
         CAST(l_discount      AS DECIMAL(12,2)) AS d
  FROM lineitem WHERE l_orderkey < 300
) t
ORDER BY l_orderkey, l_linenumber
"""


@register(
    "fn_decimal_suite",
    oracle=_DECIMAL_EXPRS,
    tags=("batch", "functions", "decimal"),
    doc="DECIMAL(p,s) arithmetic parity (DecimalType — …/types/logical/"
    "DecimalType.java; planner DecimalITCase): +,-,* with exact scale growth, "
    "exact division (scale-bounded divisor), ROUND at positive/zero/negative "
    "digits on decimals, CEIL/FLOOR/ABS/SIGN/MOD — arithmetic stays in an "
    "explicit DECIMAL(p,s) so Spark and DuckDB must agree digit-for-digit, "
    "then every output is CAST to DOUBLE for the gate's rendering-sensitive "
    "value hash (SURVEY §1.2 type-mapping row).",
)
def fn_decimal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_dec")
    return spark.sql(_DECIMAL_EXPRS.replace("FROM lineitem", "FROM lineitem_dec"))


@register(
    "fn_time_misc_suite",
    oracle="""
SELECT event_id,
       CAST((epoch_us(ts) % 86400000000) // 1000 AS INTEGER) AS time_of_day_ms,
       ts + INTERVAL 2 MONTH AS plus_2mo,
       ts + INTERVAL 90 MINUTE AS plus_90min,
       CAST(date_diff('minute', date_trunc('minute', TIMESTAMP '2024-01-10 00:00:00'),
                      date_trunc('minute', ts)) AS BIGINT) AS min_since_jan10,
       (ts < TIMESTAMP '2024-01-16 00:00:00'
        AND TIMESTAMP '2024-01-15 00:00:00' < ts + INTERVAL 1 HOUR) AS overlaps_jan15
FROM events WHERE event_id < 500 ORDER BY event_id
""",
    tags=("batch", "functions", "temporal"),
    doc="TIME-attribute and interval-function shims (SURVEY §1.2 TIME(p) → "
    "millis-of-day INT; FlinkSqlOperatorTable TIMESTAMPADD/TIMESTAMPDIFF/"
    "OVERLAPS): time-of-day extraction, calendar-aware month add, minute "
    "add/diff on minute-aligned stamps, and the OVERLAPS period predicate "
    "(functions/scalar.py overlaps()).",
)
def fn_time_misc_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_12_0_src_spark.functions import overlaps

    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    ts = F.col("ts")
    jan15 = F.lit("2024-01-15 00:00:00").cast("timestamp")
    jan16 = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return e.select(
        "event_id",
        F.expr("CAST((unix_micros(ts) % 86400000000) DIV 1000 AS INT)").alias(
            "time_of_day_ms"
        ),
        F.timestamp_add("MONTH", F.lit(2), ts).alias("plus_2mo"),
        F.timestamp_add("MINUTE", F.lit(90), ts).alias("plus_90min"),
        F.expr(
            "timestampdiff(MINUTE, TIMESTAMP '2024-01-10 00:00:00', date_trunc('minute', ts))"
        ).cast("long").alias("min_since_jan10"),
        overlaps(ts, ts + F.expr("INTERVAL 1 HOUR"), jan15, jan16).alias(
            "overlaps_jan15"
        ),
    ).orderBy("event_id")


@register(
    "fn_url_map_suite",
    oracle="""
SELECT p_partkey,
       'example.com' AS host,
       '/catalog/' || CAST(p_partkey AS VARCHAR) AS path,
       replace(p_brand, '#', '') AS q_brand,
       CAST(p_size AS VARCHAR) AS q_size,
       replace(p_brand, '#', '') AS brand_key
FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
""",
    tags=("batch", "functions", "string"),
    doc="PARSE_URL and STR_TO_MAP (FlinkSqlOperatorTable string family; "
    "runtime SqlFunctionUtils.java): a synthetic URL per part row is parsed "
    "back into HOST/PATH/QUERY components and the query string is exploded "
    "via str_to_map — the oracle reconstructs every component in closed form "
    "from the source columns.",
)
def fn_url_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    brand_key = F.replace(F.col("p_brand"), F.lit("#"), F.lit(""))
    url = F.concat(
        F.lit("https://example.com/catalog/"),
        F.col("p_partkey").cast("string"),
        F.lit("?brand="),
        brand_key,
        F.lit("&size="),
        F.col("p_size").cast("string"),
    )
    qmap = F.str_to_map(F.parse_url(url, F.lit("QUERY")), F.lit("&"), F.lit("="))
    return p.select(
        "p_partkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        qmap.getItem("brand").alias("q_brand"),
        qmap.getItem("size").alias("q_size"),
        brand_key.alias("brand_key"),
    ).orderBy("p_partkey")


@register(
    "fn_misc_suite",
    oracle="""
SELECT event_id,
       bin(CAST(event_id AS BIGINT)) AS id_bin,
       chr(CAST(65 + event_id % 26 AS INTEGER)) AS id_chr,
       round((exp(CAST(event_id % 5 AS DOUBLE)) - exp(-CAST(event_id % 5 AS DOUBLE))) / 2, 6) AS v_sinh,
       round((exp(CAST(event_id % 5 AS DOUBLE)) + exp(-CAST(event_id % 5 AS DOUBLE))) / 2, 6) AS v_cosh,
       round((exp(2 * CAST(event_id % 5 AS DOUBLE)) - 1) / (exp(2 * CAST(event_id % 5 AS DOUBLE)) + 1), 6) AS v_tanh,
       to_base64(encode(event_type)) AS etype_b64,
       decode(from_base64(to_base64(encode(event_type)))) AS etype_rt,
       strftime(to_timestamp(1700000000 + event_id), '%Y-%m-%d %H:%M:%S')
         AS from_unix,
       CAST(instr(event_type, 'r') AS INTEGER) AS locate_r,
       CAST(strptime('2024-03-0' || CAST(1 + event_id % 9 AS VARCHAR)
                     || ' 12:30:45', '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)
         AS to_ts,
       ts + INTERVAL 8 HOUR AS tz_shanghai
FROM events WHERE event_id < 300 ORDER BY event_id
""",
    tags=("batch", "functions", "misc"),
    doc="The remaining FlinkSqlOperatorTable scalar stragglers (BIN, CHR, "
    "SINH/COSH/TANH, TO_BASE64/FROM_BASE64, ENCODE/DECODE round trip, "
    "FROM_UNIXTIME, LOCATE, TO_TIMESTAMP, CONVERT_TZ): each maps to the "
    "Spark built-in of the same semantics (CONVERT_TZ from UTC to a fixed "
    "offset = from_utc_timestamp, mirrored as interval arithmetic in the "
    "oracle; hyperbolic results rounded to 6dp for cross-libm safety). "
    "NOW()/UUID() are nondeterministic by design (Flink marks them dynamic) "
    "and PRINT is a sink — excluded from value comparison.",
)
def fn_misc_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    et = F.col("event_type")
    return e.select(
        "event_id",
        F.bin(F.col("event_id")).alias("id_bin"),
        F.char(F.lit(65) + F.col("event_id") % 26).alias("id_chr"),
        F.round(F.sinh((F.col("event_id") % 5).cast("double")), 6).alias("v_sinh"),
        F.round(F.cosh((F.col("event_id") % 5).cast("double")), 6).alias("v_cosh"),
        F.round(F.tanh((F.col("event_id") % 5).cast("double")), 6).alias("v_tanh"),
        F.base64(F.encode(et, "utf-8")).alias("etype_b64"),
        F.decode(F.unbase64(F.base64(F.encode(et, "utf-8"))), "utf-8").alias(
            "etype_rt"
        ),
        F.from_unixtime(F.lit(1700000000) + F.col("event_id")).alias("from_unix"),
        F.locate("r", et).cast("int").alias("locate_r"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-03-0"),
                (F.lit(1) + F.col("event_id") % 9).cast("string"),
                F.lit(" 12:30:45"),
            )
        ).alias("to_ts"),
        F.from_utc_timestamp(F.col("ts"), "+08:00").alias("tz_shanghai"),
    ).orderBy("event_id")
