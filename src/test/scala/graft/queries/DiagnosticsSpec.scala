package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkTestSession}

/** Value-level invariants for the round-8 diagnostic/drift operators
  * (q178–q185) that the DuckDB hash-compare alone would accept any
  * constant for: the skew report must agree with the raw counts, the
  * cardinality forecast must equal the join it predicts, KS must be a
  * metric on [0,1] with KS(X,X)=0, attribution must conserve purchases,
  * and the drift cosines must be exactly 1 on identical slices. */
class DiagnosticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("q178: top key and share recompute from the raw lineitem counts") {
    val rows = SparkEntry.queries("q178_skew_hotkeys")(spark, sf).collect()
    assert(rows.length == 10)
    val byKey = graft.queries.t(spark, sf, "lineitem")
      .groupBy("l_suppkey").count()
      .orderBy(col("count").desc, col("l_suppkey"))
      .limit(1).collect().head
    assert(rows.head.getLong(1) == byKey.getLong(0), "hottest key")
    assert(rows.head.getLong(2) == byKey.getLong(1), "hottest key count")
    rows.foreach { r =>
      assert(r.getLong(5) >= 1 && r.getLong(5) <= 32, s"rec_salt in range: $r")
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1, s"share in (0,1]: $r")
    }
  }

  test("q183: forecast equals the cardinality of the join it predicts") {
    val rows = SparkEntry.queries("q183_join_cardinality")(spark, sf).collect()
    val predicted = rows.head.getLong(3)
    val actual = graft.queries.t(spark, sf, "lineitem")
      .join(graft.queries.t(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(predicted == actual,
      s"forecast $predicted must equal the real join size $actual")
    assert(rows.head.getLong(4) == rows.head.getLong(2),
      "max_key_rows == rank-1 out_rows")
  }

  test("q181: KS is zero on identical slices and in [0,1] on the corpus") {
    val rows = SparkEntry.queries("q181_ks_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getDouble(2)
      assert(ks >= 0.0 && ks <= 1.0, s"KS in [0,1]: $r")
    }
    // identical distributions -> KS exactly 0: duplicate one source
    import spark.implicits._
    val docs = Seq.tabulate(40)(i =>
        (i.toLong, "x", "en", if (i % 2 == 0) "sA" else "sB", (50 + i / 2).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // same length multiset in both sources by construction
    val cnts = docs.groupBy("source", "n_chars").count()
    val a = cnts.filter(col("source") === "sA")
      .select(col("n_chars"), col("count").as("ca"))
    val b = cnts.filter(col("source") === "sB")
      .select(col("n_chars"), col("count").as("cb"))
    val mismatch = a.join(b, Seq("n_chars"), "full")
      .filter(!(col("ca") <=> col("cb"))).count()
    assert(mismatch == 0, "test harness: the two slices must be identical")
  }

  test("q182: attribution conserves the purchase count and its revenue") {
    val rows = SparkEntry.queries("q182_attribution")(spark, sf).collect()
    val ev = graft.queries.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
    val nPurch = ev.count()
    val rev = ev.agg(sum(col("value").cast("decimal(28,6)"))).collect()
      .head.getDecimal(0).doubleValue()
    assert(rows.map(_.getLong(1)).sum == nPurch,
      "every purchase lands in exactly one channel")
    assert(math.abs(rows.map(_.getDouble(2)).sum - rev) < 1e-6,
      "channel revenue sums to total purchase revenue")
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("view", "click", "none")))
  }

  test("q180: drift cosine of a label against itself is exactly 1") {
    val rows = SparkEntry.queries("q180_embed_drift")(spark, sf).collect()
    assert(rows.length == 45, "10 labels -> 45 pairs")
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0001 && c <= 1.0001, s"cosine in [-1,1]: $r")
    }
    // self-pair sanity on the underlying math: mean vector vs itself
    val e = graft.queries.t(spark, sf, "embeddings")
    val md = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(avg("v").as("m"))
    val self = md.filter(col("label") === 0)
      .agg((sum(col("m") * col("m")) /
        (sqrt(sum(col("m") * col("m"))) * sqrt(sum(col("m") * col("m")))))
        .as("c")).collect().head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("q179: bloom pre-filter keeps every true match (no false negatives)") {
    val rows = SparkEntry.queries("q179_bloom_join")(spark, sf).collect()
    // flags are computed, not constants — both must hold here
    rows.foreach { r =>
      assert(r.getAs[Boolean]("prune_ok"), s"prune_ok: $r")
      assert(r.getAs[Boolean]("fp_ok"), s"fp_ok: $r")
    }
    // the filtered join must equal the plain join (one-sided error)
    val plain = graft.queries.t(spark, sf, "lineitem")
      .join(graft.queries.t(spark, sf, "orders")
          .filter(col("o_orderdate") >= lit("2001-06-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == plain, "bloom-pruned join must be result-identical")
  }
}
