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
    }
  )
}
