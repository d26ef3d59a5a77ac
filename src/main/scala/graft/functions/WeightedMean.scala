package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The engine's UDAF surface: a typed [[Aggregator]] (weighted mean)
  * registered through `functions.udaf` — partial aggregation (map-side
  * combine) comes for free from the Aggregator contract: `reduce` runs
  * per partition, `merge` combines partial buffers at the exchange, so
  * the shuffle carries one (sum, weight) pair per group per partition
  * rather than raw rows. That is the property that matters at 100 TB;
  * a naive collect-then-average UDF would ship every row.
  */
object WeightedMean extends Aggregator[(Double, Long), (Double, Long), Double] {

  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), a: (Double, Long)): (Double, Long) =
    (b._1 + a._1 * a._2, b._2 + a._2)

  override def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)

  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) 0.0 else r._1 / r._2

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
