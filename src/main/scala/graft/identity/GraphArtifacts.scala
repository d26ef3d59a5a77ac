package graft.identity

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Session-scoped graph artifacts, computed ONCE per (session, corpus dir)
  * and shared by the whole graph family — the [[graft.dedup.CandidateArtifacts]]
  * discipline applied to the signup identity graph and the co-purchase
  * graph (VERDICT r05 #2: the 8 `graph_*` queries plus `identity_*` each
  * rebuilt their edge list from the fact tables; the edge derivation was
  * the family's dominant shared cost).
  *
  *  - [[fwd]] — the directed alias edge list (user_id → Offset + props.k),
  *    distinct, both endpoints non-null: consumed by `identity_components`
  *    (directly — it IS the CC input), `graph_modularity` (one-direction
  *    internal-edge count), and as the generator of [[und]];
  *  - [[und]] — the undirected (both-directions) edge list: pagerank, LPA,
  *    k-core, assortativity, degree_dist;
  *  - [[deg]] — the degree frame over [[und]]: pagerank, assortativity,
  *    degree_dist (k-core recomputes degrees per peel round by necessity);
  *  - [[coPairs]] — distinct within-order co-purchase part pairs (a < b)
  *    over full lineitem history: graph_triangles (graph_common_neighbors
  *    keeps its own 12-month-windowed pair list — a different declared
  *    graph).
  *
  * In production these are persisted parquet per corpus snapshot; the
  * session-local eager `localCheckpoint`s are the single-JVM equivalent —
  * every consumer plan reads a `LogicalRDD` scan instead of re-deriving
  * the graph from events/lineitem.
  *
  * THE OFFSET (ADVICE r05, medium): user ids and alias ids live in one
  * node-id space separated by an additive offset. 2^40 (~1.1e12), not the
  * "big enough" decimal 10^6 the family previously hardcoded — a user_id
  * of 1,000,005 collided with alias k=5 and silently merged two unrelated
  * clusters (latent at bench scale where user_id < 10^6, corrupting at any
  * realistic population; both engines shared the constant, so the oracle
  * agreed with the wrong answer). `try_cast`, not `cast`: Spark 4 runs
  * ANSI mode, where one malformed props.k would abort the query instead of
  * dropping the row; rows with a null endpoint contribute no edge on
  * either engine (the oracle mirrors with TRY_CAST + the same null
  * filter). [[graft.identity.IdentityQueries]] shares this constant.
  *
  * Concurrency: per-key memoization on ConcurrentHashMap.computeIfAbsent;
  * stopped-session entries are evicted ONLY from the cache being entered,
  * before its computeIfAbsent — a nested build (deg → und → fwd) runs
  * inside the outer cache's mapping function, and ConcurrentHashMap
  * forbids modifying the map a mapping function is computing into.
  */
object GraphArtifacts {

  /** Namespace separator between user_id and props.k alias node ids —
    * see the offset rationale in the object Scaladoc. Disjointness is
    * ENFORCED, not assumed: [[fwd]] keeps only user_id ∈ [0, Offset) and
    * k ∈ [0, [[MaxAliasKey]]), so a negative or huge numeric k can
    * neither land back in user-id space (k = -Offset+5 → dst = 5, the
    * old collision class in new clothes) nor overflow the addition
    * (which would abort the whole query under ANSI mode — the exact
    * single-bad-row failure try_cast exists to prevent). Out-of-range
    * rows are data garbage and contribute no edge on either engine. */
  val Offset: Long = 1L << 40

  /** Alias keys admitted to the graph: [0, 2^39) keeps dst strictly
    * inside [Offset, Offset + 2^39), far from BIGINT overflow. */
  val MaxAliasKey: Long = 1L << 39

  private val fwdCache = new graft.queries.SessionCache[DataFrame](Seq(_))
  private val undCache = new graft.queries.SessionCache[DataFrame](Seq(_))
  private val degCache = new graft.queries.SessionCache[DataFrame](Seq(_))
  private val coPairCache = new graft.queries.SessionCache[DataFrame](Seq(_))
  private val builds = new AtomicInteger(0)
  private val buildNs = new AtomicLong(0L)

  /** How many times any artifact has been built this JVM — pinned by
    * PlanSpec: running the whole graph family must build each once. */
  def buildCount: Int = builds.get()

  /** Cumulative wall-clock seconds spent inside artifact builds this JVM
    * — Bench reports this separately so per-query times measure marginal
    * cost (VERDICT r05 #3). */
  def buildSeconds: Double = buildNs.get() / 1e9

  /** Directed signup alias edges (src = user_id, dst = Offset + props.k):
    * distinct, non-null endpoints, checkpointed. Namespaces are disjoint
    * by the offset, so the list is self-loop-free and already canonical
    * (src < dst) — it satisfies the CC `inputDistinct` contract. */
  def fwd(s: SparkSession, dir: String): DataFrame =
    memo(fwdCache, s, dir) {
      Tables.events(s, dir)
        .filter(col("event_type") === "signup")
        .select(col("user_id").as("src"),
          expr("try_cast(get_json_object(props, '$.k') AS LONG)").as("k"))
        // range guards enforce the namespace disjointness (see Offset)
        .where(col("src").isNotNull && col("src") >= 0 && col("src") < Offset &&
          col("k").isNotNull && col("k") >= 0 && col("k") < MaxAliasKey)
        .select(col("src"), (col("k") + Offset).as("dst"))
        .distinct()
        .localCheckpoint(eager = true)
    }

  /** Undirected (both-directions) signup edge list — checkpointed, so the
    * iterative consumers (pagerank rounds, LPA votes, k-core peels) all
    * read one materialized RDD. */
  def und(s: SparkSession, dir: String): DataFrame =
    memo(undCache, s, dir) {
      val f = fwd(s, dir)
      f.union(f.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(eager = true)
    }

  /** (src, deg) over [[und]] — every node's undirected degree. */
  def deg(s: SparkSession, dir: String): DataFrame =
    memo(degCache, s, dir) {
      und(s, dir).groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true)
    }

  /** Distinct within-order co-purchase part pairs (a < b), full lineitem
    * history. Derived WITHOUT a fact self-join: one groupBy collapses each
    * order to its distinct sorted part set (TPC-H orders are ≤ 7 items, so
    * the C(k,2) explode is in-core array math riding the aggregate), then
    * one distinct over the pair stream — one exchange of lineitem instead
    * of two plus a join (measured 2.5 → 1.8 s at sf0.1). */
  def coPairs(s: SparkSession, dir: String): DataFrame =
    memo(coPairCache, s, dir) {
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), " +
            "y -> struct(x AS a, y AS b))))")).as("p"))
        .select(col("p.a"), col("p.b")).distinct()
        .localCheckpoint(eager = true)
    }

  /** Oracle CTE body for [[fwd]] — `fwd(src, dst)`. Splice as
    * `WITH $fwdOracle, ...`. Kept adjacent to the Spark builder so the
    * offset / try_cast / null-filter semantics can only change in
    * lockstep (ADVICE r05). */
  val fwdOracle: String =
    s"""fwd AS (
         SELECT DISTINCT src, $Offset + k AS dst FROM (
           SELECT user_id AS src,
             TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
           FROM events WHERE event_type = 'signup')
         WHERE src IS NOT NULL AND src >= 0 AND src < $Offset
           AND k IS NOT NULL AND k >= 0 AND k < $MaxAliasKey)"""

  /** Oracle CTE for [[und]] (requires [[fwdOracle]] spliced first). */
  val undOracle: String =
    """und AS (SELECT src, dst FROM fwd
              UNION ALL SELECT dst, src FROM fwd)"""

  /** Oracle CTE for [[deg]] (requires [[undOracle]]). */
  val degOracle: String =
    """deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
              FROM und GROUP BY src)"""

  /** Drop all cached artifacts (tests that restart sessions). */
  def invalidate(): Unit = {
    fwdCache.invalidate(); undCache.invalidate()
    degCache.invalidate(); coPairCache.invalidate()
  }

  // ---------------------------------------------------------------------
  // Parquet persistence — the CandidateArtifacts pattern for the graph
  // family: edge/degree/pair artifacts land once per corpus snapshot,
  // stamped with a fingerprint over BOTH source tables (events drives
  // the signup graph, lineitem drives the co-purchase pairs); a later
  // session loads instead of re-deriving, a changed corpus misses the
  // key and rebuilds (GraphArtifactsSpec pins both paths).
  // ---------------------------------------------------------------------

  /** Snapshot key: events fingerprint | lineitem fingerprint. */
  def graphFingerprint(s: SparkSession, corpusDir: String): String =
    graft.queries.TableFingerprint.of(s, s"$corpusDir/events.parquet") + "|" +
      graft.queries.TableFingerprint.of(s, s"$corpusDir/lineitem.parquet")

  /** Write fwd/und/deg/coPairs as parquet under `artifactDir`, stamped
    * with [[graphFingerprint]]. */
  def persistTo(s: SparkSession, corpusDir: String, artifactDir: String): Unit =
    graft.queries.ArtifactStore.writeSnapshot(s, artifactDir,
      graphFingerprint(s, corpusDir),
      Seq("fwd" -> fwd(s, corpusDir), "und" -> und(s, corpusDir),
        "deg" -> deg(s, corpusDir), "copairs" -> coPairs(s, corpusDir)))

  /** Seed the session caches from a COMPLETE persisted snapshot whose
    * key matches the CURRENT corpus fingerprint; false otherwise (stale
    * artifacts must never serve a changed corpus). */
  def loadFrom(s: SparkSession, corpusDir: String, artifactDir: String): Boolean =
    graft.queries.ArtifactStore.loadSnapshot(s, artifactDir,
      graphFingerprint(s, corpusDir),
      Seq("fwd", "und", "deg", "copairs")) match {
      case Some(m) =>
        fwdCache.put(s, corpusDir, m("fwd"))
        undCache.put(s, corpusDir, m("und"))
        degCache.put(s, corpusDir, m("deg"))
        coPairCache.put(s, corpusDir, m("copairs"))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  def ensure(s: SparkSession, corpusDir: String, artifactDir: String): Boolean = {
    val hit = loadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      // a stale snapshot must not satisfy the session cache either
      Seq(fwdCache, undCache, degCache, coPairCache)
        .foreach(_.remove(s, corpusDir))
      persistTo(s, corpusDir, artifactDir)
    }
    hit
  }

  private def memo(cache: graft.queries.SessionCache[DataFrame],
      s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    cache.getOrBuild(s, dir) {
      val t0 = System.nanoTime()
      builds.incrementAndGet()
      try build finally buildNs.addAndGet(System.nanoTime() - t0)
    }
}
