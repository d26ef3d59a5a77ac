package graft.identity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Sanitize.Reserved

/** Identity edge derivation from a typed events frame — BOTH edge sources
  * the reference knows:
  *
  *  - alias events: (person — alias) for every non-empty `_p2`
  *    (`/root/reference/src/KissmetricsToDatabase.php:359-394`);
  *  - email updates: an `'updated email'` event contributes
  *    (person — new_email) and (new_email — previous_email), the extra
  *    edges the reference's full-table rebuild folds in
  *    (`/root/reference/src/KissmetricsToDatabase.php:401-455`, edges at
  *    `:426-436`).
  *
  * Output is a distinct (person, alias) pair frame ready for
  * [[Components.connectedComponentsString]]; self-loops and duplicates
  * are harmless there.
  */
object IdentityEdges {

  private def nonEmpty(c: Column): Column = c.isNotNull && c =!= ""

  def fromEvents(events: DataFrame): DataFrame = {
    val alias = events
      .filter(nonEmpty(col("alias")))
      .select(col("person"), col("alias"))
    val em = events
      .filter(col("name") === "updated email")
      .select(col("person"),
        col("props")(Reserved.NewEmail).as("ne"),
        col("props")(Reserved.PreviousEmail).as("pe"))
    val personToNew = em.where(nonEmpty(col("ne")))
      .select(col("person"), col("ne").as("alias"))
    val newToPrevious = em.where(nonEmpty(col("ne")) && nonEmpty(col("pe")))
      .select(col("ne").as("person"), col("pe").as("alias"))
    alias.union(personToNew).union(newToPrevious).distinct()
  }
}
