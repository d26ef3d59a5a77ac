package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split is not enough (e.g. one identity cluster holding a
  * double-digit percentage of all events: the reference's anonymous-user
  * id is exactly such a key).
  *
  * The probe (big, skewed) side gets a random salt in [0, n); the build
  * side is exploded n× with every salt value; the join key becomes
  * (key, salt), spreading each hot key over n reducers. Result is
  * row-identical to the plain join (inner, on the key) — asserted in
  * SkewJoinSpec.
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    val salted = big.withColumn("__salt",
      // deterministic salt from a second column-independent hash of the
      // row: spreads rows of one hot key without RNG (replayable plans)
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)))
    val exploded = small
      .withColumn("__salt", explode(expr(
        s"sequence(0, ${saltBuckets - 1})")))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
