package graft.tools

import graft.{Graft, SparkEntry}

/** Round-16 deliverable helper: write each named query's
  * `explain("formatted")` output to `<outDir>/<query>_<tag>.txt` in ONE
  * session (graft.Explain spends ~25 s of JVM+session startup per query —
  * fine for one plan, not for a deliverable directory of them).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <q1,q2,...> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Graft.sessionBuilder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { prefix =>
      SparkEntry.queries.keys.filter(_.startsWith(prefix)).toSeq.sorted
        .foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val out = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(out)) {
            df.explain("formatted")
          }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
            out.toByteArray)
          System.err.println(s"[plandump] $name -> ${name}_$tag.txt")
        }
    }
    spark.stop()
  }
}
