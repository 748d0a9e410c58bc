package graft.queries

/** The complete judge-facing query surface: every operator family from
  * SURVEY.md §2 plus the training-data extensions (§7.4), one named,
  * deterministic query each. */
object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ Grouping.defs ++ Windows.defs ++ SetOps.defs ++
      Scalars.defs ++ Events.defs ++ DedupQueries.defs ++
      IngestParity.defs ++ StatsQueries.defs ++ PivotQueries.defs ++ PipelineQueries.defs ++ SimilarityQueries.defs ++
      TextQueries.defs ++ TermQueries.defs ++ RetrievalQueries.defs ++
      TokenizerQueries.defs ++ SetSimilarityQueries.defs ++
      MultimodalQueries.defs ++ Salting.defs ++
      CurationQueries.defs ++ TimeSeriesQueries.defs ++
      MaintenanceQueries.defs ++ GraphQueries.defs ++ ScaleQueries.defs ++
      TrainingPrepQueries.defs ++ MlQueries.defs ++ ReportQueries.defs ++
      TrackQueries.defs ++ EvalQueries.defs ++ CorpusQueries.defs ++
      FormatQueries.defs

  /** Fail fast on accidental name collisions between modules — including
    * qNN-prefix collisions, which Bench's shortened JSON keys rely on. */
  def validated: Seq[QueryDef] = {
    val dup = all.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    val dupPrefix = all.groupBy(_.name.takeWhile(_ != '_'))
      .collect { case (p, ds) if ds.size > 1 => p }
    require(dupPrefix.isEmpty,
      s"duplicate qNN prefixes (Bench keys collide): ${dupPrefix.mkString(", ")}")
    all
  }
}
