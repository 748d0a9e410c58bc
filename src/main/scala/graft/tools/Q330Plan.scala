package graft.tools
object Q330Plan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.sessionBuilder("local[4]", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q330_personalized_pagerank")(
      spark, "/root/testdata/sf0.001")
    println("=== OPTIMIZED ===")
    println(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.toString)
    spark.stop()
  }
}
