package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` hop an external whole-operator extension needs:
  * turning a custom [[LogicalPlan]] node into a user-facing DataFrame.
  * `Dataset.ofRows` is `private[sql]`, so this object lives under
  * `org.apache.spark.sql` — the standard OSS pattern for Spark extensions
  * that add plan nodes (the DataSource V1 era's `SQLContext.internalCreate`
  * successors all do this). Nothing else of Spark's internals is re-exported.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
