package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.VectorFunctions

/** Focused q122 scaling probe (round-11 verdict #3): min-of-2 wall time at
  * sf0.1 and the real-sf1 corpus, plus per-stage timings and candidate
  * counts that tell WHERE the growth is (prefix-join fan-out vs verify). */
object Q122Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.sessionBuilder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def stages(dir: String): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val docs = graft.Tables.documents(spark, dir)
        .filter(col("source") === "src0").select(col("doc_id"), col("text"))
      val d2 = docs.unionByName(docs.select(
        (col("doc_id") + 1099511627776L).as("doc_id"),
        concat(upper(col("text")), lit(" !!")).as("text")))
      var t0 = System.nanoTime()
      val toks = d2.select(col("doc_id"),
        explode(Dedup.charNgrams(lower(col("text")))).as("tok"))
      val dfs = toks.groupBy("tok").agg(count(lit(1)).as("df"))
        .withColumn("bk", floor(log2(col("df"))).cast("long"))
      val wIn = Window.partitionBy("bk").orderBy(col("df"), col("tok"))
      val wOff = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
      val offsets = dfs.groupBy("bk").agg(count(lit(1)).as("nb"))
        .withColumn("off", coalesce(sum("nb").over(wOff), lit(0L)))
        .select("bk", "off")
      val ranked = dfs.withColumn("rk", row_number().over(wIn))
        .join(broadcast(offsets), "bk")
        .select(col("tok"), (col("off") + col("rk")).cast("long").as("tid"))
      val docSets = toks.join(ranked, "tok")
        .groupBy("doc_id").agg(sort_array(collect_list(col("tid"))).as("tids"))
        .withColumn("n", size(col("tids")))
        .localCheckpoint(true)
      val nDocs = docSets.count()
      println(f"  docSets build: ${(System.nanoTime() - t0) / 1e9}%.2f s ($nDocs docs)")
      val prefLen =
        col("n") - floor((col("n").cast("double") * 4 + 4) / 5).cast("int") + 1
      val idxLen =
        col("n") - floor((col("n").cast("double") * 8 + 8) / 9).cast("int") + 1
      def window(len: org.apache.spark.sql.Column) =
        docSets.select(col("doc_id"), col("n"),
          posexplode(slice(col("tids"), lit(1), len)).as(Seq("p0", "ptid")))
          .select(col("doc_id"), col("n"), (col("p0") + 1).as("pp"),
            col("ptid"))
      // length-band join key: band(n) = floor(ln n / ln 1.25); the length
      // filter 0.8*na <= nb <= na confines the partner to bands
      // {b(na)-1, b(na)} — probe emits both, index emits its own
      val band = floor(log(col("n").cast("double")) / math.log(1.25))
        .cast("long")
      val prefProbe = window(prefLen)
        .withColumn("tb", explode(array(band, band - 1)))
        .withColumn("bk", col("ptid") * 256 + col("tb"))
        .localCheckpoint(true)
      val prefIdx = window(idxLen)
        .withColumn("bk", col("ptid") * 256 + band)
        .localCheckpoint(true)
      val raw = prefProbe.select(col("doc_id").as("id_a"),
          col("n").as("pna"), col("pp").as("pa"), col("bk"))
        .join(prefIdx.select(col("doc_id").as("id_b"), col("n").as("pnb"),
          col("pp").as("pb"), col("bk")), Seq("bk"))
      t0 = System.nanoTime()
      val nRaw = raw.count()
      println(f"  raw banded join: ${(System.nanoTime() - t0) / 1e9}%.2f s ($nRaw rows)")
      val hits = raw.filter((col("pna") > col("pnb") ||
          (col("pna") === col("pnb") && col("id_a") > col("id_b"))) &&
        col("pna") * 4 <= col("pnb") * 5 &&
        lit(9) * (lit(1) +
          least(col("pna") - col("pa"), col("pnb") - col("pb"))) >=
          lit(4) * (col("pna") + col("pnb")))
      t0 = System.nanoTime()
      val nHits = hits.count()
      println(f"  join hits: ${(System.nanoTime() - t0) / 1e9}%.2f s ($nHits rows)")
      t0 = System.nanoTime()
      val nPacked = hits
        .select((col("id_a") * 4294967296L + col("id_b")).as("pkey"))
        .distinct().count()
      println(f"  packed distinct: ${(System.nanoTime() - t0) / 1e9}%.2f s ($nPacked pairs)")
      t0 = System.nanoTime()
      val cands = hits.select("id_a", "id_b").distinct()
        .localCheckpoint(true)
      val nCands = cands.count()
      println(f"  distinct cands: ${(System.nanoTime() - t0) / 1e9}%.2f s ($nCands pairs)")
      t0 = System.nanoTime()
      val alpha = (lit(4) * (col("na") + col("nb")) + lit(8)).cast("long") / 9
      val res = cands
        .join(docSets.select(col("doc_id").as("id_a"), col("tids").as("ta"),
          col("n").as("na")), Seq("id_a"))
        .join(docSets.select(col("doc_id").as("id_b"), col("tids").as("tb"),
          col("n").as("nb")), Seq("id_b"))
        .filter(VectorFunctions.sortedIntersectAtLeast(col("ta"), col("tb"),
          floor(alpha).cast("long")))
        .count()
      println(f"  verify: ${(System.nanoTime() - t0) / 1e9}%.2f s ($res survivors)")
    }

    def time(dir: String): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q122_prefix_setjoin")(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val small = "/root/testdata/sf0.1"
    val big = "/tmp/graft-sf1-real"
    time(small) // warmup
    println("== stages sf0.1 =="); stages(small)
    println("== stages sf1 =="); stages(big)
    val t1 = math.min(time(small), time(small))
    val t10 = math.min(time(big), time(big))
    println(f"[q122] sf0.1 $t1%.2f s   sf1 $t10%.2f s   " +
      f"exponent ${math.log10(t10 / t1)}%.2f")
    spark.stop()
  }
}
