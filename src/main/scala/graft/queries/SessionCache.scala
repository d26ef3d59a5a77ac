package graft.queries

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded session-scoped artifact memoizer — the shared cache shape
  * behind every artifact family (LSH signatures, the signup/co-purchase
  * graphs, the triangle closure, word counts): one checkpointed value
  * per (session, corpus dir), built at most once.
  *
  * VERDICT r07 task 7 (ADVICE r06 #3): the per-family
  * ConcurrentHashMaps were UNBOUNDED across corpus dirs — a long-lived
  * multi-corpus session pinned one checkpointed frame set per distinct
  * dir, with block reclamation left to the GC + ContextCleaner pair.
  * This cache makes residency deterministic on both axes:
  *
  *  - **Cap**: at most [[maxDirsPerSession]] dirs resident per session;
  *    entering dir N+1 evicts the least-recently-ENTERED dir (insertion
  *    order, not access order — artifact access patterns are
  *    build-once-read-many, so insertion order is eviction order).
  *  - **Release**: eviction (cap displacement, explicit [[remove]],
  *    [[invalidate]], same-key replace via [[put]]) explicitly
  *    unpersists each evicted frame's localCheckpoint blocks via
  *    [[graft.identity.Components.unpersistCheckpoint]] instead of
  *    waiting for the ContextCleaner to notice the RDD got GC'd.
  *    Stopped sessions skip the release — their blocks died with the
  *    context.
  *
  * Eviction safety contract: an evicted frame is UNUSABLE (a local
  * checkpoint cannot recompute) — callers must not hold a cached frame
  * across an operation that can evict it. The engine's three eviction
  * points all satisfy this: cap displacement fires only when a NEW
  * corpus dir enters (queries against the displaced dir have
  * completed), invalidate() runs between bench passes, and ensure()'s
  * remove precedes the rebuild of the same key.
  *
  * Concurrency contract (inherited from CandidateArtifacts): stopped
  * -session / cap eviction mutates ONLY this cache's map and runs
  * BEFORE its computeIfAbsent — a nested build (vocab → wordCounts,
  * deg → und → fwd) runs inside another cache's mapping function, and
  * ConcurrentHashMap forbids modifying the map a mapping function is
  * computing into.
  *
  * @param frames the checkpointed DataFrames inside a cached value, for
  *   release on eviction (non-checkpointed derived frames are no-ops).
  */
final class SessionCache[V](frames: V => Seq[DataFrame],
    maxDirsPerSession: Int = SessionCache.DefaultMaxDirs) {
  require(maxDirsPerSession >= 1,
    s"maxDirsPerSession $maxDirsPerSession must be >= 1")

  import scala.jdk.CollectionConverters._

  private val cache = new ConcurrentHashMap[(SparkSession, String), (Long, V)]
  private val tick = new AtomicLong(0L)

  // Blocking unpersist (unlike Components.unpersistCheckpoint's
  // non-blocking hot-loop variant): eviction is rare and the residency
  // bound is the point — the blocks must be GONE when this returns.
  private def release(s: SparkSession, v: V): Unit =
    if (!s.sparkContext.isStopped)
      frames(v).foreach { df =>
        df.queryExecution.logical match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking = true)
          case _ => () // derived, non-checkpointed frame — nothing resident
        }
      }

  private def evictKeys(keys: Seq[(SparkSession, String)]): Unit =
    keys.foreach { k =>
      val e = cache.remove(k)
      if (e != null) release(k._1, e._2)
    }

  /** Eviction sweep run before every entry: stopped sessions always,
    * plus enough oldest-entered dirs of `s` to leave room for `dir`. */
  private def sweep(s: SparkSession, dir: String): Unit = {
    evictKeys(cache.keySet.asScala
      .filter(_._1.sparkContext.isStopped).toSeq)
    if (!cache.containsKey((s, dir))) {
      val mine = cache.entrySet().asScala
        .filter(_.getKey._1 eq s).toSeq.sortBy(_.getValue._1)
      val excess = mine.size - (maxDirsPerSession - 1)
      if (excess > 0) evictKeys(mine.take(excess).map(_.getKey))
    }
  }

  /** Memoized build: at most one `build` per (session, dir) key. */
  def getOrBuild(s: SparkSession, dir: String)(build: => V): V = {
    sweep(s, dir)
    cache.computeIfAbsent((s, dir), _ => (tick.incrementAndGet(), build))._2
  }

  /** Install a value directly (artifact loadFrom paths). A same-key
    * replace releases the superseded value's checkpoints. */
  def put(s: SparkSession, dir: String, v: V): Unit = {
    sweep(s, dir)
    val old = cache.put((s, dir), (tick.incrementAndGet(), v))
    if (old != null) release(s, old._2)
  }

  /** Drop one key, releasing its checkpoints (ensure()'s stale-snapshot
    * path). */
  def remove(s: SparkSession, dir: String): Unit =
    evictKeys(Seq((s, dir)))

  /** Drop everything, releasing checkpoints of live sessions' entries
    * (bench isolated re-measure passes, session-restarting tests). */
  def invalidate(): Unit = evictKeys(cache.keySet.asScala.toSeq)

  /** Dirs currently resident for `s` — the multi-dir bound probe. */
  def residentDirs(s: SparkSession): Int =
    cache.keySet.asScala.count(_._1 eq s)
}

object SessionCache {
  /** Two dirs per session: the bench's (warmup sf, timed sf) pair and
    * the scale audit's (sf0.001, sf0.01) pair both stay resident; a
    * third corpus displaces the oldest. */
  val DefaultMaxDirs = 2
}
