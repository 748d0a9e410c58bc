package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window functions: ranking, frames, offsets, distribution.
  *
  * Reference status: delegated to Athena (SURVEY.md §2.5 — e.g. "latest
  * heartbeat per device" is row_number over deviceid/date_time). Each window
  * here partitions on a key with bounded per-key cardinality, so state stays
  * in-memory per task at any input scale; the shuffle is the partitionBy key.
  *
  * Determinism: every window ORDER BY carries a unique tiebreaker column, and
  * running float sums go through the exact-decimal cast (DuckDB computes
  * windowed sums with a segment tree — a different float association than
  * Spark's sequential frame accumulation).
  */
object Windows {

  val defs: Seq[QueryDef] = Seq(

    // Top-3 orders per customer: the "latest heartbeat per device" pattern.
    QueryDef.sql(
      "q14_window_rank",
      """SELECT o_custkey, rn, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },

    // Running total per customer — explicit ROWS frame, exact-decimal sum.
    QueryDef.sql(
      "q15_window_frame",
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(28,4)))
        |            OVER (PARTITION BY o_custkey
        |                  ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(28, 4))).over(w)
            .cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Offset functions over an event stream: previous value / next type per
    // user in time order (pure column passthrough + IEEE subtraction — no
    // float reassociation).
    QueryDef.sql(
      "q16_lag_lead",
      """SELECT user_id, event_id, value,
        |       lag(value)      OVER w AS prev_value,
        |       lead(event_type) OVER w AS next_type,
        |       value - lag(value) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy("user_id", "event_id")
    },

    // Distribution functions — quartiles and relative position by balance,
    // partitioned by segment (a global ORDER BY window would serialize to one
    // task at scale; per-segment keeps it shuffle-parallel).
    QueryDef.sql(
      "q17_distribution",
      """SELECT c_custkey,
        |       ntile(4)       OVER w AS quartile,
        |       round(percent_rank() OVER w, 9) AS pct_rank,
        |       round(cume_dist()    OVER w, 9) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 9).as("pct_rank"),
          round(cume_dist().over(w), 9).as("cume"))
        .orderBy("c_custkey")
    }
  )
}
