package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Pivot / unpivot and subquery families — Athena-delegated capabilities in
  * the reference (SURVEY.md §2.5, §4 P9), expressed with portable oracles
  * (conditional aggregation mirrors pivot; ANSI subqueries run unchanged in
  * DuckDB).
  */
object PivotQueries {

  val defs: Seq[QueryDef] = Seq(

    // Pivot: event counts per month × type. Spark's relational pivot expands
    // to one Expand+Aggregate (single shuffle); the oracle is the portable
    // CASE-sum formulation with identical output columns.
    QueryDef.sql(
      "q46_pivot",
      """SELECT strftime(ts, '%Y-%m') AS ym,
        |  CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS "view"
        |FROM events
        |GROUP BY 1
        |ORDER BY ym""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(date_format(col("ts"), "yyyy-MM").as("ym"), col("event_type"))
        .groupBy("ym")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L) // missing (ym, type) cells surface as null post-Expand
        .orderBy("ym")
    },

    // Unpivot (wide→long): melt the per-part numeric columns into
    // (attribute, value) rows — Spark's unpivot vs the portable UNION ALL.
    QueryDef.sql(
      "q47_unpivot",
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice', p_retailprice FROM part)
        |WHERE p_partkey <= 200
        |ORDER BY p_partkey, attr""".stripMargin) { (s, d) =>
      t(s, d, "part")
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retailprice")), "attr", "val")
        .orderBy("p_partkey", "attr")
    },

    // Uncorrelated scalar subquery: customers above the global mean balance
    // (rewritten by Catalyst into a broadcast of the single-row aggregate).
    QueryDef.sql(
      "q48_scalar_subquery",
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) + 3000 FROM customer)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(
        """SELECT c_custkey, c_acctbal
          |FROM customer
          |WHERE c_acctbal > (SELECT avg(c_acctbal) + 3000 FROM customer)
          |ORDER BY c_custkey""".stripMargin)
    },

    // Correlated subquery (decorrelated by Catalyst into a join): each
    // customer's orders above their own average order value.
    QueryDef.sql(
      "q49_correlated_subquery",
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
        |                          FROM orders o2
        |                          WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(
        """SELECT o_custkey, o_orderkey, o_totalprice
          |FROM orders o
          |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
          |                          FROM orders o2
          |                          WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_custkey, o_orderkey""".stripMargin)
    },

    // Recursive CTE (Spark 4's UnionLoop): ancestor-chain walk over the
    // acyclic "next doc in the same language" edge set — each doc's chain
    // head and depth. UNION ALL recursion terminates because every edge
    // strictly decreases doc_id and in-degree is 1 (unique paths, no
    // re-derivation blowup). The identical text runs on DuckDB as the
    // oracle. At scale each UnionLoop step is one equi-join over the
    // frontier — the same per-round shape as Dedup.connectedComponents,
    // with the loop driven by the engine instead of driver code.
    QueryDef.sql(
      "q91_recursive_cte",
      """WITH RECURSIVE
        |  e AS (SELECT a.doc_id AS u, b.doc_id AS v
        |        FROM documents a JOIN documents b
        |          ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang),
        |  reach AS (
        |    SELECT doc_id AS node, doc_id AS anc FROM documents
        |    UNION ALL
        |    SELECT r.node, e.u FROM reach r JOIN e ON e.v = r.anc)
        |SELECT node AS doc_id, min(anc) AS chain_head, count(*) AS depth
        |FROM reach GROUP BY node
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      // UnionLoop re-executes the recursion step's whole subtree every
      // round: with `e` as an inline CTE that was TWO documents scans plus a
      // self-join per round × chain depth. Materialize the (tiny) edge list
      // once and let each round's frontier join hit the in-memory view —
      // the per-round cost drops to one broadcast-join over the frontier.
      // Same result set; only the recursion's inner plan changes.
      s.sql(
        """SELECT a.doc_id AS u, b.doc_id AS v
          |FROM documents a JOIN documents b
          |  ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang""".stripMargin)
        .localCheckpoint(true)
        .createOrReplaceTempView("q91_edges")
      s.sql(
        """WITH RECURSIVE
          |  reach AS (
          |    SELECT doc_id AS node, doc_id AS anc FROM documents
          |    UNION ALL
          |    SELECT r.node, e.u
          |    FROM reach r JOIN q91_edges e ON e.v = r.anc)
          |SELECT node AS doc_id, min(anc) AS chain_head, count(*) AS depth
          |FROM reach GROUP BY node
          |ORDER BY doc_id""".stripMargin)
    },

    // Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 orders per
    // customer) — the per-row table expression SQL users reach for before
    // learning window functions. Spark decorrelates it into a join +
    // per-key window plan (no per-row re-execution), which is exactly the
    // at-scale shape the equivalent row_number() query would produce.
    QueryDef.sql(
      "q112_lateral_join",
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey < 200
        |ORDER BY c_custkey, o_orderkey""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM customer c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |WHERE c.c_custkey < 200
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    }
  )
}
