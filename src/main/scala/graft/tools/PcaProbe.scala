package graft.tools

/** One-off: measure PCA component orthogonality/norms on the real tables
  * to set q149's audit tolerances. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.sessionBuilder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = graft.Tables.load(spark, d, "embeddings")
      val m = graft.ml.Pca.fit(e, "embedding", dim = 64, k = 2)
      def dotA(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      val (c1, c2) = (m.components(0), m.components(1))
      println(f"[pca-probe] $d dot12=${dotA(c1, c2)}%.3e n1=${math.sqrt(dotA(c1, c1))}%.10f n2=${math.sqrt(dotA(c2, c2))}%.10f")
    }
    spark.stop()
  }
}
