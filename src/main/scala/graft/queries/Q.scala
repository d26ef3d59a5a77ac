package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle twin the driver
  * hash-compares against (SURVEY.md §2.1). Column names must match the
  * oracle exactly — the driver sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Aggregation point for every query module; SparkEntry delegates here. */
object Registry {
  def all: Seq[Q] =
    CoreQueries.all ++
      OlapQueries.all ++
      LayoutQueries.all ++
      AnalyticsQueries.all ++
      EvalQueries.all ++
      GraphBpeQueries.all ++
      graft.identity.IdentityQueries.all ++
      graft.text.TextQueries.all ++
      graft.text.CurationQueries.all ++
      graft.text.TrainQueries.all ++
      graft.text.WebQueries.all ++
      graft.text.IndexQueries.all ++
      graft.text.MixQueries.all ++
      graft.text.AssembleQueries.all ++
      graft.dedup.DedupQueries.all ++
      graft.sim.SimQueries.all ++
      graft.sim.ClusterQueries.all ++
      graft.sim.MiningQueries.all ++
      graft.sim.ProjectionQueries.all ++
      graft.multimodal.MultimodalQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
