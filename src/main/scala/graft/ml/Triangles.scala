package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered orientation (the
  * node-iterator++ / compact-forward algorithm).
  *
  * Each undirected edge is oriented from its lower-(degree, id) endpoint to
  * the higher one, which turns the graph into a DAG whose max out-degree is
  * O(√m) regardless of skew — the hub of a star graph receives its edges
  * instead of fanning them out, so the wedge join below never explodes on a
  * high-degree node. Every triangle {a,b,c} is then counted exactly once: at
  * its apex (the (deg,id)-minimal vertex), as one wedge closed by one
  * oriented edge. All three steps are equi-joins/aggregations — shuffles on
  * vertex ids, no nested-loop plans anywhere.
  */
object Triangles {

  /** Count triangles in an undirected simple graph given as distinct edges
    * (`u`, `v`) with u < v. Returns one row (n_nodes, n_edges, n_triangles).
    */
  def count(edges: DataFrame): DataFrame = {
    // The edge list feeds degree counting, orientation, and the edge count
    // — and the oriented frame below feeds both wedge sides plus the
    // closing semi-join. Materialize each ONCE: edges are often the
    // output of an expensive upstream (e.g. a banded pair mine), and
    // without truncation that upstream re-runs per consumer — the same
    // multi-consumer rescan q119/q91 were restructured away from.
    val e = edges.select(col("u"), col("v")).localCheckpoint(true)
    val deg = e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id")))
      .groupBy("id").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    // orient low-(deg,id) → high-(deg,id); carry the head's degree so the
    // wedge join can order its two heads by the same total order
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = withDeg.select(
      when(lowFirst, col("u")).otherwise(col("v")).as("s"),
      when(lowFirst, col("v")).otherwise(col("u")).as("t"),
      when(lowFirst, col("dv")).otherwise(col("du")).as("dt"))
      .localCheckpoint(true)
    // wedges at apex s: ordered head pairs; the closing edge, if present,
    // is oriented exactly (e1.t → e2.t) under the same (deg,id) order
    val wedges = o.as("e1").join(o.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.dt") < col("e2.dt") ||
            (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))))
      .select(col("e1.t").as("s"), col("e2.t").as("t"))
    val tri = wedges.join(o.select("s", "t"), Seq("s", "t"), "left_semi")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
    val counts = e.agg(
      org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))
    // explicit broadcast of the 1-row census aggregates: AQE broadcasts
    // them anyway at this size, but the hint makes the plan deterministic
    deg.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_nodes"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(counts))
      .crossJoin(org.apache.spark.sql.functions.broadcast(tri))
  }
}
