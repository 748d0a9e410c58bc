package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * For a join key with pathological hot values, AQE's skew-join split handles
  * sort-merge cases at runtime; explicit salting is the declarative fallback
  * that also works for shuffled-hash and pre-AQE plans. The probe side gets a
  * deterministic salt in [0, n); the build side is replicated n× with every
  * salt value, and the join key becomes (key, salt) — hot keys spread over n
  * tasks, results identical to the unsalted join.
  */
object Salting {

  /** Deterministic per-row salt (hash of the whole probe row modulo n —
    * stable across retries, unlike rand()). */
  private def salt(cols: Seq[Column], n: Int): Column =
    pmod(hash(cols: _*), lit(n))

  /** `left ⋈ right ON leftKey = rightKey`, salted n ways. Right side is the
    * replicated (smaller) side. Sides are aliased so identically named key
    * columns resolve unambiguously. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, n: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      salt(left.columns.toSeq.map(col), n)).as("__l")
    val saltedRight = right.withColumn("__salt2",
      explode(sequence(lit(0), lit(n - 1)))).as("__r")
    saltedLeft.join(saltedRight,
        col(s"__l.$leftKey") === col(s"__r.$rightKey") &&
          col("__l.__salt") === col("__r.__salt2"),
        "inner")
      .drop("__salt", "__salt2")
  }

  /** Judge-facing skew-mitigation query: the salted join must be *exactly*
    * result-equivalent to the plain join, so the oracle is the unsalted SQL.
    * The 8-way salt spreads any hot o_custkey over 8 shuffle tasks; the
    * replicated side grows 8× but stays the small side. Money sums go
    * through the exact-decimal recipe (package.scala) so the parity is
    * bit-for-bit. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q95_salted_agg",
      """SELECT c.c_nationkey,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
        |         AS sum_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""".stripMargin) { (s, d) =>
      saltedJoin(t(s, d, "orders"), t(s, d, "customer"),
          "o_custkey", "c_custkey", n = 8)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          msum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy("c_nationkey")
    },

    // Join-key skew diagnostic — the report a planner (or an engineer
    // deciding q95's salt factor) reads BEFORE the big join: per-key
    // counts (map-side-combined groupBy, the only corpus-wide pass), the
    // top-10 hottest keys with their share and multiple-of-average, and a
    // recommended salt factor = the key's share of a 32-task shuffle,
    // clamped to [1, 32]. All math is exact integer division plus one
    // rounded exact-double ratio per row, so both engines agree
    // bit-for-bit. At 100 TB this is one skinny aggregate + a top-k —
    // the diagnostic never materializes anything key-cardinality-sized
    // beyond the count frame itself.
    QueryDef.sql(
      "q178_skew_hotkeys",
      """WITH c AS (SELECT l_suppkey AS key, count(*) AS cnt
        |           FROM lineitem GROUP BY 1),
        |     s AS (SELECT count(*) AS nk, CAST(sum(cnt) AS BIGINT) AS n
        |           FROM c),
        |     r AS (SELECT key, cnt,
        |                  row_number() OVER (ORDER BY cnt DESC, key) AS rank
        |           FROM c)
        |SELECT rank, key, cnt,
        |       round(CAST(cnt AS DOUBLE) / s.n, 6) AS share,
        |       round(CAST(cnt AS DOUBLE) * s.nk / s.n, 4) AS x_avg,
        |       CAST(least(32, greatest(1,
        |         CAST(ceil(cnt * 32.0 / s.n) AS BIGINT))) AS BIGINT)
        |         AS rec_salt
        |FROM r, s WHERE rank <= 10
        |ORDER BY rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val c = t(s, d, "lineitem")
        .groupBy(col("l_suppkey").as("key"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val stats = c.agg(count(lit(1)).as("nk"), sum("cnt").as("n"))
      val top = c.orderBy(col("cnt").desc, col("key")).limit(10)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("cnt").desc, col("key"))))
        .localCheckpoint(true) // <=10-row frame; window never sees the key table
      top.crossJoin(broadcast(stats))
        .select(col("rank"), col("key"), col("cnt"),
          round(col("cnt").cast("double") / col("n"), 6).as("share"),
          round(col("cnt").cast("double") * col("nk") / col("n"), 4)
            .as("x_avg"),
          least(lit(32L), greatest(lit(1L),
            ceil(col("cnt") * lit(32.0) / col("n")))).as("rec_salt"))
        .orderBy("rank")
    },

    // Runtime-filter (sideways-information-passing) join: the selective
    // dimension filter is compressed into a bloom filter and pushed into
    // the FACT SCAN as a pure narrow predicate, so most fact rows die
    // before the shuffle the join would otherwise pay — the manual form
    // of Spark's own InjectRuntimeFilter, exercising graftx's bloom
    // expressions on relational keys. One-sided error: the bloom can only
    // over-keep (false positives), never drop a true match, so the exact
    // join AFTER the pre-filter is result-identical to the unfiltered
    // join — which is exactly what the oracle recomputes. Audit flags:
    // prune_ok pins that the pre-filter actually bit (>=50% of fact rows
    // pruned; the ~2.6% date filter keeps ~2.6% of orders, so surviving
    // fact rows sit near that fraction too - a broken or oversaturated
    // bloom keeping everything fails),
    // fp_ok pins the bloom's FP overhead (survivors <= 3x the true match
    // count). Both deterministic: the bloom is seed-fixed.
    QueryDef.sql(
      "q179_bloom_join",
      """WITH dim AS (SELECT o_orderkey, o_orderpriority FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '2001-06-01'),
        |     j AS (SELECT d.o_orderpriority, l.l_quantity
        |           FROM lineitem l JOIN dim d ON l.l_orderkey = d.o_orderkey)
        |SELECT o_orderpriority,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
        |         AS sum_qty,
        |       TRUE AS prune_ok, TRUE AS fp_ok
        |FROM j GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val dim = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
        .select("o_orderkey", "o_orderpriority")
        .localCheckpoint(true) // feeds the bloom build AND the exact join
      val bf = dim.agg(org.apache.spark.sql.graftx.BloomFilterFunctions
          .bloomAgg(col("o_orderkey").cast("string"),
            expectedItems = 100000L, numBits = 1000000L).as("bf"))
        .head().getAs[Array[Byte]](0)
      val fact = t(s, d, "lineitem").select("l_orderkey", "l_quantity")
      val survivors = fact.filter(
          org.apache.spark.sql.graftx.BloomFilterFunctions
            .mightContain(bf, col("l_orderkey").cast("string")))
      val joined = survivors
        .join(dim, col("l_orderkey") === col("o_orderkey"))
      // The whole audit costs ONE extra aggregate over fact (n_fact and
      // n_surv from the same scan — the bloom predicate is deterministic,
      // so counting it conditionally equals counting the survivors frame)
      // plus a sum over the ≤5-row grouped result for n_join.
      val cnt = fact.agg(count(lit(1)).as("n_fact"),
          count(when(org.apache.spark.sql.graftx.BloomFilterFunctions
            .mightContain(bf, col("l_orderkey").cast("string")), 1))
            .as("n_surv")).head()
      val (nFact, nSurv) = (cnt.getLong(0), cnt.getLong(1))
      val grouped = joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          msum(col("l_quantity"), 2).as("sum_qty"))
        .localCheckpoint(true) // ≤ #priorities rows
      val nJoin = grouped.agg(coalesce(sum("n_items"), lit(0L)))
        .head().getLong(0)
      val flags = broadcast(dim.sparkSession.range(1)
        .select((lit(nSurv) * 2 <= lit(nFact)).as("prune_ok"),
          (lit(nSurv) <= lit(nJoin) * 3).as("fp_ok")))
      grouped.crossJoin(flags)
        .orderBy("o_orderpriority")
    },

    // Exact join-cardinality forecast — the other pre-join diagnostic
    // (q178 profiles one side's skew; this one predicts the OUTPUT):
    // |A ⋈ B| = Σ_k cntA(k)·cntB(k), computed from the two per-key count
    // frames, never the join itself. At 100 TB the equi-join runs over
    // |keys|-sized aggregates, not |rows|-sized tables — this is how a
    // planner decides a join would explode before paying for it. Output:
    // the 5 largest output keys plus the totals every row carries
    // (join_rows, max_key_rows), all exact integers.
    QueryDef.sql(
      "q183_join_cardinality",
      """WITH cl AS (SELECT l_orderkey AS k, count(*) AS cl
        |            FROM lineitem GROUP BY 1),
        |     co AS (SELECT o_orderkey AS k, count(*) AS co
        |            FROM orders GROUP BY 1),
        |     j AS (SELECT cl.k, cl.cl * co.co AS out_rows
        |           FROM cl JOIN co ON cl.k = co.k),
        |     t2 AS (SELECT CAST(sum(out_rows) AS BIGINT) AS join_rows,
        |                   CAST(max(out_rows) AS BIGINT) AS max_key_rows
        |            FROM j),
        |     r AS (SELECT k, out_rows,
        |                  row_number() OVER (ORDER BY out_rows DESC, k)
        |                    AS rank
        |           FROM j)
        |SELECT rank, k AS key, CAST(out_rows AS BIGINT) AS out_rows,
        |       t2.join_rows, t2.max_key_rows
        |FROM r, t2 WHERE rank <= 5
        |ORDER BY rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cl = t(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cl"))
      val co = t(s, d, "orders")
        .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("co"))
      val j = cl.join(co, "k")
        .select(col("k"), (col("cl") * col("co")).as("out_rows"))
        .localCheckpoint(true) // feeds the totals AND the top-5
      val totals = j.agg(sum("out_rows").cast("long").as("join_rows"),
        max("out_rows").as("max_key_rows"))
      val top = j.orderBy(col("out_rows").desc, col("k")).limit(5)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("out_rows").desc, col("k"))))
        .localCheckpoint(true) // <=5-row frame; window never sees the key table
      top.crossJoin(broadcast(totals))
        .select(col("rank"), col("k").as("key"), col("out_rows"),
          col("join_rows"), col("max_key_rows"))
        .orderBy("rank")
    }
  )
}
