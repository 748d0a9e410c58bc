package graft.tools

/** Standalone ingest-throughput probe: the exact Bench `ingest_rps`
  * measurement (decode→classify→parse→flatten→geo→partition-keys via
  * `sohToStage`, driven through toRdd so no column prunes away) in a
  * FRESH JVM with no prior query history — separates the pipeline's
  * capable number from end-of-bench JVM state (heap/GC pressure after
  * 270+ queries). Run when the bench's ingest_rps moves unexpectedly.
  *
  * sbt "runMain graft.tools.IngestProbe [sfDir] [passes]" */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.sessionBuilder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    // optional: replicate Bench's preamble (logger override + warmup table
    // counts) to chase environment-dependent throughput differences
    if (sys.env.get("INGEST_PROBE_BENCH_PREAMBLE").contains("1")) {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.rdd.RDD", org.apache.logging.log4j.Level.ERROR)
      spark.range(1000).selectExpr("sum(id)").collect()
      graft.Tables.names.foreach { n =>
        try graft.Tables.load(spark, sfDir, n).count()
        catch { case _: Throwable => () }
      }
      val nq = graft.SparkEntry.queries.size // registry init, as Bench does
      println(s"[ingest] bench preamble replicated ($nq queries registered)")
    }
    val env = graft.queries.IngestParity.envelopeFromEvents(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRec = env.count()
    val times = (1 to passes).map { i =>
      val stage = graft.ingest.IngestTransforms
        .sohToStage(env, graft.ingest.GeoDim.empty(spark))
      val t0 = System.nanoTime()
      stage.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ingest] pass $i: $dt%.3f s  (${(nRec / dt).toLong} rec/s)")
      dt
    }
    println(s"[ingest] n=$nRec best_rps=${(nRec / times.min).toLong}")
    spark.stop()
  }
}
