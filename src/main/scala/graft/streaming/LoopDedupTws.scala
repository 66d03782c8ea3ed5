package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.types._

/** ST1–ST3 on the modern `transformWithState` operator (Spark 4's
  * successor to flatMapGroupsWithState): keyed ValueState holding the
  * last-applied event time per change hash, with the 10-minute cleanup
  * (ST3) as an EVENT-TIME timer per key — the same watermark-driven
  * TTL semantics as the `LoopDedup` fMGWS variant, so the two are
  * drop-in interchangeable ("TTL parity", asserted in `TwsDedupSpec`).
  *
  * Event-time mode matters operationally, not just semantically: in
  * `TimeMode.ProcessingTime` the operator reports it may need another
  * batch (wall-clock TTL could fire at any moment), so an AvailableNow
  * run never terminates and `processAllAvailable` spins forever on
  * empty micro-batches (measured: ~1 batch/700ms, indefinitely). In
  * event-time mode another batch runs only when the watermark advances
  * — the query quiesces like any windowed aggregation.
  *
  * Requires the RocksDB state store provider (set by `SyncPipeline`).
  * Same contract as `LoopDedup`: emits every event tagged
  * `loop_blocked`; suppressed events do not refresh the window.
  */
object LoopDedupTws {

  private class Processor(schema: StructType, windowMs: Long, ttlMs: Long)
      extends StatefulProcessor[String, Row, Row] {
    @transient private var lastApplied: ValueState[Long] = _
    private val tsIdx = schema.fieldIndex("event_ts")

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastApplied = getHandle.getValueState[Long](
        "lastApplied", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val sorted = rows.toSeq.sortBy(_.getTimestamp(tsIdx).getTime)
      sorted.iterator.map { r =>
        val ts = r.getTimestamp(tsIdx).getTime
        val blocked = lastApplied.exists() && {
          val la = lastApplied.get()
          ts - la <= windowMs && ts >= la - windowMs
        }
        if (!blocked) {
          // one live TTL timer per key: re-arm at the new last-applied
          if (lastApplied.exists()) getHandle.deleteTimer(lastApplied.get() + ttlMs)
          lastApplied.update(ts)
          getHandle.registerTimer(ts + ttlMs)
        }
        Row.fromSeq(r.toSeq :+ blocked)
      }
    }

    /** ST3: watermark passed lastApplied + TTL → evict the key's state
      * (the fMGWS variant's event-time timeout, expressed as a timer).
      */
    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Row] = {
      if (lastApplied.exists() &&
          lastApplied.get() + ttlMs <= expiredTimerInfo.getExpiryTimeInMs)
        lastApplied.clear()
      Iterator.empty
    }
  }

  def apply(
      df: DataFrame,
      windowMs: Long = LoopDedup.windowMsDefault,
      ttlMs: Long = LoopDedup.ttlMsDefault): DataFrame = {
    val schema = df.schema
    val outSchema = schema.add(StructField("loop_blocked", BooleanType, nullable = false))
    val hashIdx = schema.fieldIndex("change_hash")
    implicit val outEnc = Encoders.row(outSchema)
    df.as(Encoders.row(schema))
      .groupByKey((r: Row) => r.getString(hashIdx))(Encoders.STRING)
      .transformWithState(
        new Processor(schema, windowMs, ttlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
