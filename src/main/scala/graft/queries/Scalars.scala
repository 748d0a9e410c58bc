package graft.queries

import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.3): string, base64, array/split,
  * date, math, json, conditional — everything the reference's Lambda touches,
  * as codegen'd built-ins (no UDFs on the hot path).
  */
object Scalars {

  val defs: Seq[QueryDef] = Seq(

    // String family: case, substring, length, replace, concat, trim.
    QueryDef.sql(
      "q23_string_funcs",
      """SELECT p_partkey,
        |       upper(p_name)              AS uname,
        |       substr(p_name, 1, 8)       AS prefix,
        |       length(p_name)             AS name_len,
        |       replace(p_brand, '#', '_') AS brand_u,
        |       concat(p_brand, ':', p_type) AS brand_type,
        |       trim('  ' || p_brand || ' ') AS trimmed
        |FROM part
        |WHERE p_size >= 48
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part")
        .filter(col("p_size") >= 48)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 8).as("prefix"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_brand"), "#", "_").as("brand_u"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          trim(concat(lit("  "), col("p_brand"), lit(" "))).as("trimmed"))
        .orderBy("p_partkey")
    },

    // base64 encode/decode — the reference's envelope codec (O1/O3/O18,
    // hello.py:66-68,197) exercised as pure column functions, including the
    // re-encode == original identity its isBase64 classifier relies on (O4).
    QueryDef.sql(
      "q24_base64",
      """SELECT doc_id,
        |       to_base64(encode(substr(text, 1, 24))) AS b64,
        |       decode(from_base64(to_base64(encode(text)))) = text AS roundtrip
        |FROM documents
        |WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          base64(substring(col("text"), 1, 24).cast("binary")).as("b64"),
          (unbase64(base64(col("text").cast("binary"))).cast("string") === col("text"))
            .as("roundtrip"))
        .orderBy("doc_id")
    },

    // Array via split + positional extraction — the NMEA sentence pattern
    // (O7/O8, hello.py:81-84): split on delimiter, 1-based element access.
    QueryDef.sql(
      "q25_split_array",
      """SELECT p_partkey,
        |       string_split(p_type, ' ')[1] AS w1,
        |       string_split(p_type, ' ')[2] AS w2,
        |       len(string_split(p_type, ' ')) AS n_words,
        |       string_split(p_name, ' ')[1] AS first_name_word
        |FROM part
        |WHERE p_partkey <= 500
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part")
        .filter(col("p_partkey") <= 500)
        .select(col("p_partkey"),
          try_element_at(split(col("p_type"), " "), lit(1)).as("w1"),
          try_element_at(split(col("p_type"), " "), lit(2)).as("w2"),
          size(split(col("p_type"), " ")).as("n_words"),
          element_at(split(col("p_name"), " "), 1).as("first_name_word"))
        .orderBy("p_partkey")
    },

    // Date family incl. the reference's partition-key derivation (O15,
    // stack.py:233 — zero-padded strftime strings from event time).
    QueryDef.sql(
      "q26_date_funcs",
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y') AS year,
        |       strftime(o_orderdate, '%m') AS month,
        |       strftime(o_orderdate, '%d') AS day,
        |       year(o_orderdate)  AS y_int,
        |       month(o_orderdate) AS m_int,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        |FROM orders
        |WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy").as("year"),
          date_format(col("o_orderdate"), "MM").as("month"),
          date_format(col("o_orderdate"), "dd").as("day"),
          year(col("o_orderdate")).as("y_int"),
          month(col("o_orderdate")).as("m_int"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .orderBy("o_orderkey")
    },

    // Math family: abs/negate (the hemisphere sign fix O9), floor/ceil,
    // IEEE-exact sqrt, modulo, sign.
    QueryDef.sql(
      "q27_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05)   AS abs_v,
        |       -l_quantity              AS neg_qty,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |       CAST(ceil(l_extendedprice) AS BIGINT)  AS ceil_p,
        |       sqrt(l_quantity)         AS sqrt_q,
        |       CAST(l_partkey % 7 AS BIGINT) AS mod7,
        |       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn
        |FROM lineitem
        |WHERE l_orderkey <= 600
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") <= 600)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_v"),
          negate(col("l_quantity")).as("neg_qty"),
          floor(col("l_extendedprice")).as("floor_p"),
          ceil(col("l_extendedprice")).as("ceil_p"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          (col("l_partkey") % 7).cast("long").as("mod7"),
          signum(col("l_discount") - 0.05).as("sgn"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // JSON extraction — the reference's envelope parse + JQ partition-key
    // extraction (O2/O15) over the events.props JSON column.
    QueryDef.sql(
      "q28_json_funcs",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    },

    // Map-typed surface: props parsed as map<string,bigint>, then the
    // generic map operators (size/keys/values/lookup/value-fold) — the
    // schema-dynamic path for payloads whose keys are NOT declared up
    // front (the stage contract's opposite). Scalar facets only in the
    // output; the oracle recomputes them from DuckDB's JSON functions.
    // The parsed single-key map is widened with two computed entries
    // (map_concat) so the generic operators are exercised on REAL
    // multi-key maps — the value fold must sum three entries, not echo
    // one. The oracle recomputes every facet from the scalar inputs.
    QueryDef.sql(
      "q81_map_funcs",
      """SELECT event_id,
        |       CAST(3 AS BIGINT) AS n_keys,
        |       'e,k,u' AS keys_sorted,
        |       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        |       CAST(json_extract(props, '$.k') AS BIGINT)
        |         + user_id + (event_id % 7) AS values_total
        |FROM events
        |WHERE event_id <= 500
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val parsed = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))
      val m = map_concat(parsed,
        map(lit("u"), col("user_id"), lit("e"), col("event_id") % 7))
      t(s, d, "events")
        .filter(col("event_id") <= 500)
        .select(col("event_id"), m.as("m"))
        .select(col("event_id"),
          size(col("m")).cast("long").as("n_keys"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys_sorted"),
          element_at(col("m"), "k").as("k_val"),
          aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v)
            .as("values_total"))
        .orderBy("event_id")
    },

    // Conditional family: CASE WHEN (the three-way router O6), coalesce,
    // nullif — over the event stream.
    QueryDef.sql(
      "q29_conditional",
      """SELECT CASE WHEN value >= 90 THEN 'high'
        |            WHEN value >= 50 THEN 'mid'
        |            ELSE 'low' END AS bucket,
        |       count(*) AS n,
        |       count(nullif(event_type, 'error')) AS n_ok
        |FROM events
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(
          when(col("value") >= 90, "high")
            .when(col("value") >= 50, "mid")
            .otherwise("low").as("bucket"),
          col("event_type"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          count(nullif(col("event_type"), lit("error"))).as("n_ok"))
        .orderBy("bucket")
    },

    // Spark 4 VARIANT: parse the JSON payload ONCE into the binary variant
    // encoding, then typed `variant_get` paths — the semi-structured scale
    // path (q28's get_json_object re-parses the string per extraction; a
    // variant parses once and every field access is a binary probe, which
    // is also what makes shredded-variant columnar storage possible).
    // Oracle recomputes the same facets with DuckDB's JSON functions.
    QueryDef.sql(
      "q97_variant_json",
      """SELECT event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
        |         AS k_decile,
        |       count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS sum_k
        |FROM events
        |GROUP BY event_type, k_decile
        |ORDER BY event_type, k_decile""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy(col("event_type"), expr("k div 10").as("k_decile"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("event_type", "k_decile")
    }
  )
}
