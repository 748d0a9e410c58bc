package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's judge-facing surface.
  *
  * @param name   stable key (drives `SparkEntry.queries` / `oracleSql`)
  * @param fn     (session, sfDir) => result; must be deterministic, with all
  *               double-typed outputs rounded and a total ordering applied so
  *               the driver's DuckDB hash-compare is stable
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet tables
  *               (None => driver records a weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
