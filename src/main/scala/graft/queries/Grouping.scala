package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-dimensional aggregation: rollup / cube / grouping sets.
  *
  * Delegated-to-Athena capability in the reference (SURVEY.md §2.5); here
  * Spark's `rollup`/`cube` expand to a single Expand+Aggregate — one shuffle
  * regardless of how many grouping sets, which is the scale-correct plan.
  * Rolled-up keys are labeled via coalesce so no null sort keys reach the
  * oracle compare (Spark and DuckDB disagree on default null ordering).
  */
object Grouping {

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q11_rollup",
      """SELECT coalesce(r_name, '(all)') AS region_name,
        |       coalesce(n_name, '(all)') AS nation_name,
        |       count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin) { (s, d) =>
      // Through the SQL front end: the Dataset API's rollup + post-agg select
      // trips the ambiguous-self-join detector on Expand's duplicated grouping
      // attributes; the SQL analyzer resolves the same plan cleanly. The
      // physical plan is identical (Expand + single-shuffle Aggregate with
      // both dims broadcast).
      Tables.registerAll(s, d)
      s.sql(
        """SELECT coalesce(r_name, '(all)') AS region_name,
          |       coalesce(n_name, '(all)') AS nation_name,
          |       count(*) AS n_cust,
          |       CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_bal
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY region_name, nation_name""".stripMargin)
    },

    QueryDef.sql(
      "q12_cube",
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"), msum(col("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n_rows"), col("sum_qty"))
        .orderBy("rf", "ls")
    },

    // GROUPING SETS through the SQL front end — the engine's spark.sql entry
    // point over the registered catalog (SURVEY.md §3.3).
    QueryDef.sql(
      "q13_grouping_sets",
      """SELECT coalesce(o_orderstatus, '(all)')   AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(
        """SELECT coalesce(o_orderstatus, '(all)')   AS status,
          |       coalesce(o_orderpriority, '(all)') AS priority,
          |       count(*) AS n_orders,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
    },

    // Collection aggregates made deterministic: collect_set/collect_list
    // accumulate in partition order, so every collected value is sorted
    // before surfacing, and (driver-compare constraint) arrays leave the
    // query as canonical joined strings. The per-(user, type) pre-count
    // keeps the second collect small — the standard two-level rollup of a
    // categorical profile.
    QueryDef.sql(
      "q111_collect_funcs",
      """WITH tc AS (SELECT user_id, event_type, count(*) AS n
        |            FROM events WHERE user_id < 50
        |            GROUP BY user_id, event_type)
        |SELECT user_id,
        |       CAST(count(*) AS BIGINT) AS n_types,
        |       array_to_string(list_sort(list(event_type)), ',') AS types,
        |       array_to_string(list_sort(list(event_type || ':' || CAST(n AS VARCHAR))),
        |                       ',') AS type_counts
        |FROM tc GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events").filter(col("user_id") < 50)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_types"),
          array_join(sort_array(collect_list(col("event_type"))), ",")
            .as("types"),
          array_join(sort_array(collect_list(
              concat(col("event_type"), lit(":"), col("n").cast("string")))), ",")
            .as("type_counts"))
        .orderBy("user_id")
    }
  )
}
