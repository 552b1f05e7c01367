package graft

import graft.operators._

/** The single list backing SparkEntry.queries / SparkEntry.oracleSql.
  * Grown monotonically: a query is only added once it passes the local
  * DuckDB parity loop (tools/parity.py), per SURVEY.md §7's session
  * protocol. */
object Registry {
  val all: Seq[GQuery] =
    ScanQueries.all ++ FilterQueries.all ++ JoinQueries.all ++
      AggQueries.all ++ WindowQueries.all ++ SortSetQueries.all ++
      FuncQueries.all ++ DedupQueries.all ++ SimQueries.all ++
      TextQueries.all ++ MultimodalQueries.all ++ EventQueries.all ++
      ReshapeQueries.all ++ SourceQueries.all ++ SampleQueries.all ++
      MiningQueries.all ++ GraphQueries.all ++ PipelineQueries.all ++
      AnalyticsQueries.all ++ LayoutQueries.all ++ TypedQueries.all ++
      AuditQueries.all

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names in Registry")
}
