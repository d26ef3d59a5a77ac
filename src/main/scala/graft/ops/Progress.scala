package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Z1 — the reference's progress/ETA console output
  * (`/root/reference/src/KissmetricsToDatabase.php:314-326`: rows/sec +
  * percent-complete every 1000 rows), Spark-native: a
  * [[QueryExecutionListener]] observing every completed action's output
  * row count and wall time. No per-row hooks — metrics come from the
  * executed plan (already collected by Spark), so the listener costs
  * nothing on the hot path regardless of scale.
  */
object Progress {

  final case class Entry(
      action: String,
      rows: Option[Long],
      wallSec: Double,
      rowsPerSec: Option[Double],
      error: Option[String])

  final class Listener extends QueryExecutionListener {
    private val entries = new ConcurrentLinkedQueue[Entry]()

    private def outputRows(qe: QueryExecution): Option[Long] =
      qe.executedPlan.metrics.get("numOutputRows").map(_.value)

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      val secs = durationNs / 1e9
      val rows = outputRows(qe)
      entries.add(Entry(funcName, rows, secs,
        rows.filter(_ => secs > 0).map(_ / secs), None))
    }

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      entries.add(Entry(funcName, None, 0.0, None,
        Some(exception.getClass.getSimpleName)))

    def report(): Seq[Entry] = entries.iterator().asScala.toSeq

    /** The reference's one-line console format. */
    def formatted(): Seq[String] = report().map { e =>
      val rate = e.rowsPerSec.map(r => f"$r%.0f rows/sec").getOrElse("-")
      val rows = e.rows.map(_.toString).getOrElse("-")
      val err = e.error.map(x => s" FAILED($x)").getOrElse("")
      f"[progress] ${e.action}%-16s rows=$rows%-10s ${e.wallSec}%.2fs $rate$err"
    }
  }

  /** Attach a fresh listener to the session; caller keeps the handle. */
  def attach(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: Listener): Unit =
    spark.listenerManager.unregister(l)
}
