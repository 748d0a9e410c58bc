package graft.ingest

import org.apache.spark.sql.types.StructType

/** Schema-drift detection — the nightly Glue crawler's LOG-only role
  * (stack.py:320-335: `update_behavior: LOG`, `delete_behavior: LOG` — drift
  * is reported, never auto-applied). Compares a landed zone's observed schema
  * against the declared contract and reports differences as strings.
  */
object SchemaDrift {

  final case class Drift(kind: String, column: String, detail: String)

  /** Differences between `observed` and `declared` (partition columns and
    * engine-added columns can be excluded). Empty = no drift. */
  def check(observed: StructType, declared: StructType,
      ignore: Set[String] = Set.empty): Seq[Drift] = {
    val obs = observed.fields.filterNot(f => ignore(f.name)).map(f => f.name -> f).toMap
    val dec = declared.fields.filterNot(f => ignore(f.name)).map(f => f.name -> f).toMap
    val added = (obs.keySet -- dec.keySet).toSeq.sorted.map(n =>
      Drift("added", n, s"observed type ${obs(n).dataType.simpleString}"))
    val removed = (dec.keySet -- obs.keySet).toSeq.sorted.map(n =>
      Drift("removed", n, s"declared type ${dec(n).dataType.simpleString}"))
    val retyped = (obs.keySet & dec.keySet).toSeq.sorted.flatMap { n =>
      if (obs(n).dataType != dec(n).dataType)
        Some(Drift("retyped", n,
          s"declared ${dec(n).dataType.simpleString}, observed ${obs(n).dataType.simpleString}"))
      else None
    }
    added ++ removed ++ retyped
  }
}
