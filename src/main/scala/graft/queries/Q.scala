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

  /** Family name → contributing module, in registration order. The
    * family is the module that defines the query — the unit a user
    * browses the 260+-query surface by (VERDICT r09 task 7); the README
    * query index is generated from this map and RegistrySpec pins the
    * two in sync. */
  val byFamily: Seq[(String, Seq[Q])] = Seq(
    "core" -> CoreQueries.all,
    "olap" -> OlapQueries.all,
    "layout" -> LayoutQueries.all,
    "analytics" -> AnalyticsQueries.all,
    "eval" -> EvalQueries.all,
    "graph-bpe" -> GraphBpeQueries.all,
    "identity" -> graft.identity.IdentityQueries.all,
    "text" -> graft.text.TextQueries.all,
    "curation" -> graft.text.CurationQueries.all,
    "train" -> graft.text.TrainQueries.all,
    "web" -> graft.text.WebQueries.all,
    "index" -> graft.text.IndexQueries.all,
    "mix" -> graft.text.MixQueries.all,
    "assemble" -> graft.text.AssembleQueries.all,
    "dedup" -> graft.dedup.DedupQueries.all,
    "sim" -> graft.sim.SimQueries.all,
    "cluster" -> graft.sim.ClusterQueries.all,
    "mining" -> graft.sim.MiningQueries.all,
    "projection" -> graft.sim.ProjectionQueries.all,
    "multimodal" -> graft.multimodal.MultimodalQueries.all)

  def all: Seq[Q] = byFamily.flatMap(_._2)

  /** Family of a registered query name (defined for every member of
    * [[all]]). */
  def familyOf: Map[String, String] =
    byFamily.flatMap { case (f, qs) => qs.map(_.name -> f) }.toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
