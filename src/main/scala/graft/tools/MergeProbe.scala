package graft.tools

/** One-off probe: print the write schema Spark hands the graft_cat write
  * builder on each path (INSERT append vs MERGE ReplaceData) and dump the
  * table after each statement — pins the column-order contract the
  * MemoryRowCatalog writer must honor. */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val tbl = "graft_cat.probe_merge"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (user_id BIGINT, bal DOUBLE, n BIGINT)")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 10.5, 2), (2, 20.5, 3)")
    println("after insert:")
    spark.sql(s"SELECT * FROM $tbl ORDER BY user_id").show()
    spark.sql(
      s"""MERGE INTO $tbl t
         |USING (SELECT * FROM VALUES (2, 5.0, 1), (9, 90.0, 4)
         |       AS src(user_id, delta, n_src)) s
         |ON t.user_id = s.user_id
         |WHEN MATCHED THEN UPDATE SET bal = t.bal + s.delta, n = t.n + s.n_src
         |WHEN NOT MATCHED THEN
         |  INSERT (user_id, bal, n) VALUES (s.user_id, s.delta, s.n_src)
         |""".stripMargin)
    println("after merge:")
    spark.sql(s"SELECT * FROM $tbl ORDER BY user_id").show()
    spark.sql(s"DROP TABLE $tbl")
    spark.stop()
  }
}
