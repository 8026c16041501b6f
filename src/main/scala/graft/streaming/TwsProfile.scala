package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Arbitrary stateful processing on Spark 4's `transformWithState`
  * API (the successor of `flatMapGroupsWithState`, with TYPED
  * COMPOSITE state primitives — ValueState/ListState/MapState —
  * instead of one opaque state object).
  *
  * Per-user live profile: a `MapState[event_type, (n, cents)]` holds
  * one entry per event type the user has produced; each micro-batch
  * updates only the touched entries and emits their refreshed rows
  * (update semantics). Both maintained aggregates are
  * ORDER-INDEPENDENT (count, sum), so the final row per
  * (user, event_type) is batch-split-invariant and equals the batch
  * image — the oracle states it directly. State size: one map entry
  * per (user, type) — bounded by the type vocabulary, not the
  * stream.
  */
case class TwsEvent(user_id: Long, event_type: String, cents: Long)
case class TwsProfileRow(user_id: Long, event_type: String,
    n_events: Long, cents_sum: Long)

class TwsProfileProcessor
    extends StatefulProcessor[Long, TwsEvent, TwsProfileRow] {

  @transient private var counts: MapState[String, (Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, (Long, Long)]("counts",
      Encoders.STRING,
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
      timerValues: TimerValues): Iterator[TwsProfileRow] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { e =>
      val (n, c) =
        if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
        else (0L, 0L)
      counts.updateValue(e.event_type, (n + 1L, c + e.cents))
      touched += e.event_type
    }
    touched.iterator.map { t =>
      val (n, c) = counts.getValue(t)
      TwsProfileRow(key, t, n, c)
    }
  }
}

object TwsProfile {
  /** events(user_id, event_type, cents) → live per-(user, type)
    * profile rows, update semantics.
    */
  def profile(events: Dataset[TwsEvent]): Dataset[TwsProfileRow] = {
    implicit val outEnc = Encoders.product[TwsProfileRow]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TwsProfileProcessor,
        TimeMode.None(), OutputMode.Update(), outEnc)
  }
}
