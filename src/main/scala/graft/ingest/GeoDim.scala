package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Schemas

/** Builder for the geo-enrichment dimension — the bounded, broadcastable
  * replacement for the reference's Amazon Location PlaceIndex
  * (stack.py:70; hello.py:28-45; FIXTURES.md §6).
  *
  * Input: a places table with `longitude`, `latitude` and the 9 enrichment
  * attributes (Place.AddressNumber … Place.TimeZone.Offset, hello.py:148-156).
  * Output: one row per 0.25° grid cell (`gh`), deterministically chosen
  * (lowest street/postalcode wins) — a MaxResults=1 nearest-place analog.
  *
  * Scale: the dim stays small (cells covering inhabited areas ≈ 10^5-10^6
  * rows) so `broadcast()` in [[IngestTransforms.geoEnrich]] is always valid;
  * the 100 TB fact stream never shuffles for enrichment.
  */
object GeoDim {

  val attrCols: Seq[String] = Schemas.geoDim.fieldNames.toSeq.filterNot(_ == "gh")

  /** Empty dimension (no geocode coverage — all geo columns null), for
    * pipelines that skip enrichment. */
  def empty(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      Schemas.geoDim)

  /** Explode each place to its own cell plus the 8 neighbors (`gh` per row):
    * the broadcast side of nearest-neighbor enrichment — a record's nearest
    * place within ±1 cell is guaranteed to share one of these keys. */
  def withNeighborCells(places: DataFrame): DataFrame = {
    val latCell = floor(col("latitude") / 0.25).cast("long")
    val lonCell = floor(col("longitude") / 0.25).cast("long")
    val offsets = array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
      struct(lit(dy).as("dy"), lit(dx).as("dx")))): _*)
    places
      .withColumn("__o", explode(offsets))
      .withColumn("gh", concat_ws(":",
        latCell + col("__o.dy"), lonCell + col("__o.dx")))
      .drop("__o")
  }

  def fromPlaces(places: DataFrame): DataFrame = {
    val keyed = places.withColumn("gh",
      IngestTransforms.gridKey(col("longitude"), col("latitude")))
    val w = Window.partitionBy("gh")
      .orderBy(col("street").asc_nulls_last, col("postalcode").asc_nulls_last)
    keyed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(("gh" +: attrCols).map(col): _*)
  }
}
