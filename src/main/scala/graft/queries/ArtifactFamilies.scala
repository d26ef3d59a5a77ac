package graft.queries

import org.apache.spark.sql.SparkSession

/** The one list of session/parquet artifact families and their
  * ensure/invalidate lifecycles — shared by [[graft.Bench]] (warm mode),
  * [[graft.Verify]] (the warm correctness gate, VERDICT r09 task 4) and
  * tests, so a new family added in one place is warm-checked everywhere.
  * Keys are stable snapshot-directory names under the artifact dir.
  */
object ArtifactFamilies {

  /** (family key, load-or-build-and-persist against `artifactDir/key`);
    * each returns true when the persisted snapshot was reused. */
  def ensures(spark: SparkSession, sfDir: String, artifactDir: String)
      : Seq[(String, () => Boolean)] = Seq(
    "lsh" -> (() => graft.dedup.CandidateArtifacts
      .ensure(spark, sfDir, s"$artifactDir/lsh")),
    "graph" -> (() => graft.identity.GraphArtifacts
      .ensure(spark, sfDir, s"$artifactDir/graph")),
    "coclosure" -> (() => graft.queries.GraphBpeQueries
      .coClosureEnsure(spark, sfDir, s"$artifactDir/coclosure")),
    "cngraph" -> (() => graft.queries.GraphBpeQueries
      .cnGraphEnsure(spark, sfDir, s"$artifactDir/cngraph")),
    "text" -> (() => graft.text.TextArtifacts
      .ensure(spark, sfDir, s"$artifactDir/text")),
    "index" -> (() => graft.text.IndexArtifacts
      .ensure(spark, sfDir, s"$artifactDir/index")),
    "descent" -> (() => graft.sim.SimQueries
      .descentEnsure(spark, sfDir, s"$artifactDir/descent")),
    "base_index" -> (() => graft.sim.SimQueries
      .baseIndexEnsure(spark, sfDir, s"$artifactDir/base_index")),
    "uni_round2" -> (() => graft.queries.GraphBpeQueries
      .uniRound2Ensure(spark, sfDir, s"$artifactDir/uni_round2")),
    "centroids" -> (() => graft.sim.ClusterQueries
      .centroidsEnsure(spark, sfDir, s"$artifactDir/centroids")),
    "eval_grams" -> (() => graft.queries.EvalQueries
      .gramEnsure(spark, sfDir, s"$artifactDir/eval_grams")))

  /** Drop every family's session cache (bench passes, warm-gate second
    * passes, tests). */
  def invalidateAll(): Unit = {
    graft.dedup.CandidateArtifacts.invalidate()
    graft.identity.GraphArtifacts.invalidate()
    graft.queries.GraphBpeQueries.coClosureInvalidate()
    graft.queries.GraphBpeQueries.cnGraphInvalidate()
    graft.text.TextArtifacts.invalidate()
    graft.text.IndexArtifacts.invalidate()
    graft.text.TrainQueries.trainInvalidate()
    graft.sim.SimQueries.descentInvalidate()
    graft.queries.GraphBpeQueries.uniRound2Invalidate()
    graft.sim.ClusterQueries.centroidsInvalidate()
    graft.queries.EvalQueries.gramInvalidate()
  }
}
