package graft.streaming

import org.apache.spark.sql.streaming.GroupStateTimeout

/** Shared plumbing for the `flatMapGroupsWithState` speed layers. */
object SpeedLayer {

  /** Timeout mode for an optional idle-close interval: None = NoTimeout —
    * the right mode for `Trigger.AvailableNow` drains, where pending
    * timers would keep scheduling micro-batches and the drain would never
    * terminate; Some(ms) = ProcessingTimeTimeout for continuous
    * deployments (each layer arms the duration per group after updating
    * state). One definition for the three stateful layers
    * (StatefulSessions, StreamAsOf, StreamFunnel). */
  def timeoutConf(timeoutMs: Option[Long]): GroupStateTimeout =
    timeoutMs.fold[GroupStateTimeout](GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.ProcessingTimeTimeout())
}
