package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the judge-facing query surface.
  *
  * Determinism contract (QueryDef): every query ends with a total ordering,
  * and every floating aggregate is computed so the driver's DuckDB
  * hash-compare is stable.
  *
  * Float discipline: Spark sums doubles in partition order (non-deterministic
  * association) and its `round` rounds the shortest decimal string (HALF_UP)
  * while DuckDB rounds the binary value — so `round(sum(double), 2)` can
  * legitimately differ at halfway points. Instead:
  *   - money sums go through an exact decimal cast ([[queries.msum]]) — the
  *     input values have ≤4 decimal digits, so decimal(28,4) is exact, the sum
  *     is exact, and the result is order-independent;
  *   - averages divide that exact sum by the count in double ([[queries.mavg]])
  *     and round at 6 digits, where a halfway collision needs the true value
  *     within 1e-12 of a 5e-7 grid point — negligible;
  *   - per-row computed money is rounded only at a scale where the true value
  *     is exactly representable (price(2dp)×discount(2dp) → 4dp, ×tax → 6dp).
  */
package object queries {
  /** Load `<sfDir>/<name>.parquet` — the engine's table catalog. */
  def t(s: SparkSession, d: String, name: String): DataFrame = Tables.load(s, d, name)

  def r2(c: Column): Column = round(c, 2)
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)

  /** Exact money sum: decimal(28,scale) accumulate, surfaced as double.
    * Order-independent, hence stable under Spark's partial aggregation.
    * DuckDB oracle equivalent: `CAST(sum(CAST(x AS DECIMAL(28,s))) AS DOUBLE)`. */
  def msum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Deterministic money average: exact sum / count, rounded at 6dp.
    * DuckDB: `round(CAST(sum(CAST(x AS DECIMAL(28,s))) AS DOUBLE) / count(x), 6)`. */
  def mavg(c: Column, scale: Int = 4): Column =
    round(msum(c, scale) / count(c), 6)

  /** Text canonicalization shared by q90 (normalized dedup) and q98 (the
    * curation pipeline): lowercase, non-alphanumerics to spaces, collapse
    * runs, trim. Oracle mirror:
    * `trim(regexp_replace(regexp_replace(lower(x),'[^a-z0-9 ]',' ','g'),' +',' ','g'))`. */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Exact global 1-based ranks WITHOUT a single-partition sort — the q113
    * bucket-rank + prefix-sum decomposition, shared by q108/q110/q113. The
    * naive `row_number() OVER (ORDER BY ...)` plans Exchange SinglePartition:
    * one reducer sorts the whole table, the classic 100 TB cliff. Here:
    * (1) `bucket` — any expression monotone non-decreasing in the leading
    * sort key (so bucket boundaries respect the total order) — partitions
    * the ranking window; (2) per-bucket counts prefix-sum into exclusive
    * offsets — an unpartitioned window over ONE ROW PER BUCKET, a bounded
    * dimension frame, never the fact table; (3) offsets broadcast back.
    * Returns the input plus `gid` (1-based global rank) and `total` (row
    * count — lets callers derive exact ntile/decile assignments without a
    * second pass). WindowSweepSpec allowlists the offsets window.
    *
    * NULL bucket keys are supported (null-safe join; nulls group first, as
    * Spark's ascending sort places them) — but a caller whose oracle orders
    * the leading sort key NULLS LAST must fold that into `bucket` itself.
    */
  def globalRanks(df: DataFrame, bucket: Column, sortCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("__bucket", bucket)
    val wIn = Window.partitionBy("__bucket").orderBy(sortCols: _*)
    val wOff = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = b.groupBy("__bucket").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .withColumn("total", sum("__n").over(wTot))
      .select(col("__bucket").as("__bucket_o"), col("__off"), col("total"))
    // <=> not ===: an equi-join on __bucket would silently DROP rows whose
    // bucket expression evaluates to null, while the oracle's ntile ranks
    // them — null keys must match their (single) offsets row
    b.withColumn("__rk", row_number().over(wIn))
      .join(broadcast(offsets), col("__bucket") <=> col("__bucket_o"))
      .withColumn("gid", col("__off") + col("__rk"))
      .drop("__bucket", "__bucket_o", "__off", "__rk")
  }

  /** Per-group generalization of [[globalRanks]]: exact 1-based ranks
    * WITHIN each `groups` key, without a per-group single-partition sort.
    * The naive `row_number() OVER (PARTITION BY grp ORDER BY ...)` funnels
    * each group through ONE reducer — fine for high-cardinality groups,
    * the same 100 TB cliff as the global case when groups are few and fat
    * (5 languages over a petabyte corpus = 5 reducers). Same decomposition
    * as globalRanks, one level down: (1) `bucket` — monotone non-decreasing
    * in the leading sort key — sub-partitions the ranking window to
    * (group, bucket); (2) per-(group, bucket) counts prefix-sum into
    * offsets via a window over one row per bucket, PARTITIONED by group
    * (bounded frame, passes the WindowSweep lint structurally); (3)
    * offsets broadcast back. Adds `gid` (rank within group) and `total`
    * (group row count) — [[ntileFromRank]] composes on top for exact
    * per-group ntile parity. */
  def groupedRanks(df: DataFrame, groups: Seq[String], bucket: Column,
      sortCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("__bucket", bucket)
    val gCols = groups.map(col)
    val wIn = Window.partitionBy(gCols :+ col("__bucket"): _*).orderBy(sortCols: _*)
    val wOff = Window.partitionBy(gCols: _*).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gCols: _*).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = b.groupBy(gCols :+ col("__bucket"): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .withColumn("total", sum("__n").over(wTot))
      .select((groups.map(g => col(g).as(s"__g_$g")) ++
        Seq(col("__bucket").as("__bucket_o"), col("__off"), col("total"))): _*)
    // null-safe on every key: a null group/bucket must still meet its
    // (single) offsets row, as in globalRanks
    val cond = (groups.map(g => col(g) <=> col(s"__g_$g")) :+
      (col("__bucket") <=> col("__bucket_o"))).reduce(_ && _)
    b.withColumn("__rk", row_number().over(wIn))
      .join(broadcast(offsets), cond)
      .withColumn("gid", col("__off") + col("__rk"))
      .drop(groups.map(g => s"__g_$g") ++
        Seq("__bucket", "__bucket_o", "__off", "__rk"): _*)
  }

  /** Exact ntile(k) bucket from a [[globalRanks]] (gid, total) pair — the
    * standard SQL sizing (first `total mod k` buckets get one extra row),
    * identical in Spark and DuckDB, so a partitioned-window plan can stand
    * in for the single-partition `ntile` the oracle runs. All-integer.
    * `greatest(..,1)` guards the total<k degenerate case (the ELSE branch is
    * then never taken, but ANSI division must not see a zero). */
  def ntileFromRank(k: Int): Column = {
    val q = expr(s"total div $k")
    val rem = col("total") % k
    val cutoff = rem * (q + lit(1L))
    when(col("gid") <= cutoff,
      expr(s"(gid - 1) div (total div $k + 1) + 1"))
      .otherwise(rem + expr(
        s"(gid - (total % $k) * (total div $k + 1) - 1) div greatest(total div $k, 1) + 1"))
      .cast("long")
  }

  /** q118's freshness-fingerprint fixture discipline, shared (q208, q213):
    * a derived on-disk corpus is rewritten only when the SOURCE parquet's
    * content fingerprint (per-file FNV-1a over name|size|mtime + parquet
    * footer tail, summed) or the construction version changes; superseded
    * keys for the same base name are retired so /tmp doesn't accumulate.
    * `ready` lists the marker files that must all exist for reuse.
    * `sourceTable` names the parquet whose content stamps the key — it must
    * be the table the fixture is DERIVED from, or a change to that table
    * would silently reuse stale /tmp data (round-8 ADVICE #3). */
  def cachedFixture(sfDir: String, baseName: String, version: Long,
      ready: Seq[String], sourceTable: String = "events")
      (write: String => Unit): String = {
    val src = new java.io.File(sfDir, s"$sourceTable.parquet")
    def fileSig(f: java.io.File): Long = {
      var h = 0xcbf29ce484222325L
      def mix(b: Byte): Unit = { h ^= (b & 0xffL); h *= 0x100000001b3L }
      s"${f.getName}|${f.length}|${f.lastModified}".getBytes("UTF-8").foreach(mix)
      if (f.getName.endsWith(".parquet") && f.length > 0) {
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          val n = math.min(1024L, f.length).toInt
          raf.seek(f.length - n)
          val buf = new Array[Byte](n)
          raf.readFully(buf)
          buf.foreach(mix)
        } finally raf.close()
      }
      h
    }
    val stamp = Option(src.listFiles()).map(_.map(fileSig).sum)
      .getOrElse(src.lastModified())
    val key = java.lang.Long.toHexString(stamp ^ version)
    val base = s"graft_${baseName}_${new java.io.File(sfDir).getName}_"
    val dir = s"/tmp/$base$key"
    if (!ready.forall(m => new java.io.File(dir, m).exists())) {
      Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(base) && f.getName != s"$base$key")
        .foreach { old =>
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(); ()
          }
          rm(old)
        }
      write(dir)
    }
    dir
  }

  /** q90/q98's injected-duplicate construction: every document re-appears
    * under doc_id+2^40, upper-cased with trailing junk — copies that only
    * [[normText]] canonicalization can collapse. Preserves all other
    * columns. Oracle mirror:
    * `UNION ALL SELECT doc_id + 2^40, ..., upper(text) || ' !!'`. */
  def withNoisyCopies(docs: DataFrame): DataFrame =
    docs.unionByName(docs.select(docs.columns.toSeq.map {
      case "doc_id" => (col("doc_id") + 1099511627776L).as("doc_id")
      case "text" => concat(upper(col("text")), lit(" !!")).as("text")
      case c => col(c)
    }: _*))
}
