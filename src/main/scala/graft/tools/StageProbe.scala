package graft.tools

import org.apache.spark.sql.functions._

/** End-to-end drive of the ingest landing + catalog + alert-push surface
  * (the streaming half has no queries() entry, so this main is its
  * Verify-style harness): build an envelope slice from the events table,
  * land it through writeBatch's five sinks, register the zone via
  * StageCatalog (CREATE + RECOVER PARTITIONS), and publish alerts through
  * the notifier hook. Prints one summary line per surface.
  * sbt "runMain graft.tools.StageProbe /root/testdata/sf0.001" */
object StageProbe {
  // Static module field: publish runs executor-side and the notifier is
  // SERIALIZED into the task — a captured local would be copied by value
  // and increments would land on the copy. Module-field access resolves to
  // the JVM-singleton, which in local mode is the one we read back.
  val published = new java.util.concurrent.atomic.AtomicLong()

  class CountingNotifier extends graft.streaming.StreamingIngest.AlertNotifier {
    def publish(alert: org.apache.spark.sql.Row): Unit =
      StageProbe.published.incrementAndGet()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.Graft.sessionBuilder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.{StageCatalog, StreamingIngest}

    val root = java.nio.file.Files.createTempDirectory("graft-stage-probe")
    val paths = StreamingIngest.Paths(root.toString)
    val env = graft.queries.IngestParity.envelopeFromEvents(spark, sfDir)

    StreamingIngest.writeBatch(env, graft.ingest.GeoDim.empty(spark), paths,
      batchId = 0L, notifier = Some(new CountingNotifier))
    val landed = StreamingIngest.stageTable(spark, paths).count()
    println(s"[stage-probe] landed stage rows: $landed")

    val reg = StageCatalog.register(spark, paths, table = "stage_probe")
    println(s"[stage-probe] registered partitions: ${reg.partitions.size}, " +
      s"drift: ${if (reg.drift.isEmpty) "none" else reg.drift.mkString("; ")}")
    val viaCatalog = spark.sql(
      "SELECT count(*) FROM stage_probe").head().getLong(0)
    println(s"[stage-probe] rows via catalog table: $viaCatalog " +
      s"(match=${viaCatalog == landed})")
    val again = StageCatalog.recoverPartitions(spark, "stage_probe")
    println(s"[stage-probe] second recover pass adds: ${again.size} (want 0)")
    println(s"[stage-probe] alerts published via notifier: ${published.get()}")
    spark.sql("DROP TABLE stage_probe")
    spark.stop()
  }
}
