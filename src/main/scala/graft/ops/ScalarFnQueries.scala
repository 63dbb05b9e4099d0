package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** SURVEY §2.2 Q38–Q44: scalar function classes (string, date/time, math,
  * array, map, json, conversion/null). All codegen'd built-ins — no UDFs in
  * this file (the UDF surface is Q54–Q56 in FlowQueries).
  *
  * Cross-engine notes baked into the oracle SQL:
  *   - DuckDB `dayofweek` is Sunday=0, Spark is Sunday=1 → `+1` in oracle;
  *   - DuckDB `date_trunc` returns DATE, Spark returns TIMESTAMP → CAST;
  *   - DuckDB `regexp_replace` is first-match unless the 'g' flag is set;
  *   - DuckDB `floor`/`length`/`year` return DOUBLE/BIGINT where Spark
  *     returns BIGINT/INT → CAST to Spark's type;
  *   - DuckDB `^` is exponentiation → `xor()` for bitwise xor.
  */
object ScalarFnQueries {

  def defs: Seq[Q] = Seq(
    // Q38: string functions (substring/concat_ws/split/case/trim/regexp/like).
    Q("q38_string_fns",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        size(split(col("p_name"), " ")).as("n_words"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        col("p_name").like("%al%").as("has_al"),
        col("p_name").startsWith("a").as("starts_a"),
        trim(col("p_name")).as("trimmed")),
      Some("""SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
        CAST(length(p_name) AS INTEGER) AS name_len, substr(p_type, 1, 5) AS type5,
        concat_ws('|', p_brand, p_type) AS brand_type,
        CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
        regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
        p_name LIKE '%al%' AS has_al, starts_with(p_name, 'a') AS starts_a,
        trim(p_name) AS trimmed FROM part""".stripMargin)),

    // Q39: date/time functions over order dates.
    Q("q39_datetime_fns",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType)).as("days_since"),
        date_add(col("o_orderdate"), 30).as("plus30")),
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INTEGER) AS yr,
        CAST(month(o_orderdate) AS INTEGER) AS mo,
        CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        epoch_us(o_orderdate) // 1000000 AS epoch_s,
        CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
        CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30 FROM orders""".stripMargin)),

    // Q40: math + bit ops (tcp_flags mask shape, `main.go:71`).
    Q("q40_math_fns",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        abs(col("o_totalprice") - 100000.0).as("abs_diff"),
        round(col("o_totalprice")).cast(LongType).as("price_round"),
        floor(col("o_totalprice")).as("price_floor"),
        ceil(col("o_totalprice")).as("price_ceil"),
        pow(lit(2.0), (col("o_orderkey") % 10).cast(DoubleType)).as("pow2"),
        round(log(col("o_totalprice")), 8).as("ln_price"),
        pmod(col("o_orderkey") * 7 - 50, lit(13)).as("pm13"),
        greatest(col("o_orderkey") % 7, col("o_orderkey") % 5, lit(3L)).as("gr"),
        least(col("o_orderkey") % 7, col("o_orderkey") % 5, lit(3L)).as("ls"),
        (col("o_orderkey").bitwiseAND(255L)).as("band"),
        shiftleft(col("o_orderkey") % 16, 3).as("shl"),
        (col("o_orderkey").bitwiseXOR(170L)).as("bxor")),
      Some("""SELECT o_orderkey,
        abs(o_totalprice - 100000.0) AS abs_diff,
        CAST(round(o_totalprice) AS BIGINT) AS price_round,
        CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        pow(2.0, CAST(o_orderkey % 10 AS DOUBLE)) AS pow2,
        round(ln(o_totalprice), 8) AS ln_price,
        ((o_orderkey * 7 - 50) % 13 + 13) % 13 AS pm13,
        greatest(o_orderkey % 7, o_orderkey % 5, 3) AS gr,
        least(o_orderkey % 7, o_orderkey % 5, 3) AS ls,
        o_orderkey & 255 AS band,
        (o_orderkey % 16) << 3 AS shl,
        xor(o_orderkey, 170) AS bxor FROM orders""".stripMargin)),

    // Q41: array functions incl. higher-order (transform/filter/aggregate)
    // over tokenized documents; arrays rendered scalar for the oracle.
    Q("q41_array_fns",
      (s, d) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, d).select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          array_contains(toks, "spark").as("has_spark"),
          concat_ws(" ", slice(toks, 1, 3)).as("first3"),
          array_max(transform(toks, t => length(t))).as("max_tok_len"),
          size(filter(toks, t => length(t) > 4)).as("n_long"),
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("total_chars"),
          element_at(sort_array(toks), 1).as("first_sorted"))
      },
      Some("""SELECT doc_id,
        CAST(len(toks) AS INTEGER) AS n_tokens,
        CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        list_contains(toks, 'spark') AS has_spark,
        array_to_string(toks[1:3], ' ') AS first3,
        CAST(list_max(list_transform(toks, t -> length(t))) AS INTEGER) AS max_tok_len,
        CAST(len(list_filter(toks, t -> length(t) > 4)) AS INTEGER) AS n_long,
        CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_chars,
        list_sort(toks)[1] AS first_sorted
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)""".stripMargin)),

    // Q41b: generator — explode to token frequencies (UDTF shape, see also
    // Q56 sequence+explode in FlowQueries).
    Q("q41b_explode",
      (s, d) => Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .filter(col("n") > 50),
      Some("SELECT token, count(*) AS n FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) GROUP BY token HAVING count(*) > 50")),

    // Q42: map functions (construction, lookup, keys/values, cardinality).
    Q("q42_map_fns",
      (s, d) => {
        val m = map_from_arrays(
          array(lit("et"), lit("uid")),
          array(col("event_type"), col("user_id").cast(StringType)))
        Tables.events(s, d).select(
          col("event_id"),
          element_at(m, "et").as("et"),
          element_at(m, "uid").as("uid"),
          size(m).as("m_size"),
          concat_ws(",", sort_array(map_keys(m))).as("keys_sorted"),
          concat_ws(",", sort_array(map_values(m))).as("vals_sorted"))
      },
      Some("""SELECT event_id,
        m['et'][1] AS et, m['uid'][1] AS uid,
        CAST(cardinality(m) AS INTEGER) AS m_size,
        array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
        array_to_string(list_sort(map_values(m)), ',') AS vals_sorted
        FROM (SELECT event_id, map(['et','uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m FROM events)""".stripMargin)),

    // Q43: JSON functions over events.props (`{"k": <int>}`).
    Q("q43_json_fns",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k_int"),
        to_json(struct(
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k"))).as("rt")),
      Some("""SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INTEGER)))::VARCHAR AS rt
        FROM events""".stripMargin)),

    // Q44: conversion / null handling (+ hex↔int round trip, etype idiom
    // `main.go:63`).
    Q("q44_conv_null",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_filled"),
        isnull(nullif(col("o_orderstatus"), lit("O"))).as("was_open"),
        conv(hex(col("o_orderkey") % 4096), 16, 10).as("hex_roundtrip"),
        col("o_orderkey").cast(StringType).as("key_str"),
        col("o_totalprice").cast(IntegerType).as("price_int")),
      Some("""SELECT o_orderkey,
        nullif(o_orderstatus, 'O') AS status_or_null,
        coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
        nullif(o_orderstatus, 'O') IS NULL AS was_open,
        CAST(o_orderkey % 4096 AS VARCHAR) AS hex_roundtrip,
        CAST(o_orderkey AS VARCHAR) AS key_str,
        CAST(trunc(o_totalprice) AS INTEGER) AS price_int FROM orders""".stripMargin))
  )
}
