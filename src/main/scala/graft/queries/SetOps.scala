package graft.queries

import org.apache.spark.sql.functions._

/** Set operations: union all / union distinct / intersect / except.
  *
  * Reference status: delegated to Athena (SURVEY.md §2.5). UNION ALL is a
  * zero-shuffle concatenation in Spark; the distinct variants add one
  * hash-aggregate shuffle on the full row — the minimal plan for the
  * semantics.
  */
object SetOps {

  val defs: Seq[QueryDef] = Seq(

    // Zero-shuffle concatenation of two pruned scans.
    QueryDef.sql(
      "q18_union_all",
      """SELECT * FROM (
        |  SELECT c_custkey AS id, c_name AS name, 'customer' AS src
        |  FROM customer WHERE c_acctbal > 9900
        |  UNION ALL
        |  SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src
        |  FROM supplier WHERE s_acctbal > 9900)
        |ORDER BY src, id""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer").filter(col("c_acctbal") > 9900)
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          lit("customer").as("src"))
      val sup = t(s, d, "supplier").filter(col("s_acctbal") > 9900)
        .select(col("s_suppkey").as("id"), col("s_name").as("name"),
          lit("supplier").as("src"))
      c.unionByName(sup).orderBy("src", "id")
    },

    // UNION (distinct): nations that appear on either side.
    QueryDef.sql(
      "q19_union_distinct",
      """SELECT n_key FROM (
        |  SELECT c_nationkey AS n_key FROM customer
        |  UNION
        |  SELECT s_nationkey AS n_key FROM supplier)
        |ORDER BY n_key""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("n_key"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("n_key")))
        .distinct()
        .orderBy("n_key")
    },

    // INTERSECT: nation keys present in both customer and supplier bases.
    QueryDef.sql(
      "q20_intersect",
      """SELECT c_nationkey AS n_key FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY n_key""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("n_key"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("n_key")))
        .orderBy("n_key")
    },

    // EXCEPT: order-date months with 'F' orders but no 'O' orders.
    QueryDef.sql(
      "q21_except",
      """SELECT m FROM (
        |  SELECT date_trunc('month', o_orderdate) AS m FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT date_trunc('month', o_orderdate) AS m FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY m""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F")
        .select(date_trunc("month", col("o_orderdate")).as("m"))
        .except(o.filter(col("o_orderstatus") === "O")
          .select(date_trunc("month", col("o_orderdate")).as("m")))
        .orderBy("m")
    },

    // Sort + limit (top-k): global top-100 by price. Spark plans this as
    // TakeOrderedAndProject — per-partition heaps + driver merge, no global
    // sort shuffle; the k rows are tie-broken deterministically.
    QueryDef.sql(
      "q22_sort_limit",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }
  )
}
