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
  def withNeighborCells(places: DataFrame): DataFrame =
    explodeToCells(places, array((-1 to 1).flatMap(dy => (-1 to 1).map(dx =>
      struct(lit(dy).as("dy"), lit(dx).as("dx")))): _*))

  /** Explode each place to the grid cells at Chebyshev distance EXACTLY `r`
    * from its own cell (8r cells per place): the broadcast side of one
    * escalation round in [[IngestTransforms.geoEnrichNearest]] — a record
    * whose 3×3 neighborhood is empty retries against successively wider
    * rings until a place appears or the bounded max radius is exhausted. */
  def ringCells(places: DataFrame, r: Int): DataFrame =
    explodeToCells(places, array((for {
      dy <- -r to r
      dx <- -r to r
      if math.max(math.abs(dy), math.abs(dx)) == r
    } yield struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*))

  private def explodeToCells(places: DataFrame, offsets: org.apache.spark.sql.Column): DataFrame = {
    val latCell = floor(col("latitude") / 0.25).cast("long")
    val lonCell = floor(col("longitude") / 0.25).cast("long")
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
