package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch: replicate q271's 'click' daily frame + k=3 stats in Spark on
  * the sf1 corpus and dump the exact integers, for diffing against the
  * DuckDB oracle side. */
object DecimalProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.sessionBuilder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val daily = graft.Tables.load(spark, "/tmp/graft-sf1-real", "events")
      .filter(col("event_type") === "click")
      .groupBy(col("event_type"),
        (unix_seconds(col("ts")) / 86400).cast("long").as("day"))
      .agg(round(sum(col("value").cast(DecimalType(28, 6))) * 1000000, 0)
        .cast(DecimalType(38, 0)).as("y"))
      .orderBy("day")
    daily.collect().foreach(r => println(s"DAY ${r.get(1)} Y ${r.get(2)}"))
    spark.stop()
  }
}
