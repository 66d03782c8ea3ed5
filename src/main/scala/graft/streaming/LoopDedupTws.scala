package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.types._

/** ST1–ST3 on the modern `transformWithState` operator (Spark 4's
  * successor to flatMapGroupsWithState): keyed ValueState with built-in
  * TTL eviction — the 10-minute cleanup is declared via `TTLConfig`
  * instead of hand-managed timers. TTL here is processing-time based,
  * which matches the reference most literally: `SP_CLEANUP_HASH`
  * deletes hashes by wall-clock age before each worker pass
  * (`asis…04:67-74`). Requires the RocksDB state store provider.
  *
  * Same contract as `LoopDedup`: emits every event tagged
  * `loop_blocked`; suppressed events do not refresh the window.
  */
object LoopDedupTws {

  private class Processor(schema: StructType, windowMs: Long, ttl: java.time.Duration)
      extends StatefulProcessor[String, Row, Row] {
    @transient private var lastApplied: ValueState[Long] = _
    private val tsIdx = schema.fieldIndex("event_ts")

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastApplied = getHandle.getValueState[Long](
        "lastApplied", Encoders.scalaLong, TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val sorted = rows.toSeq.sortBy(_.getTimestamp(tsIdx).getTime)
      sorted.iterator.map { r =>
        val ts = r.getTimestamp(tsIdx).getTime
        val blocked = lastApplied.exists() && {
          val la = lastApplied.get()
          ts - la <= windowMs && ts >= la - windowMs
        }
        if (!blocked) lastApplied.update(ts)
        Row.fromSeq(r.toSeq :+ blocked)
      }
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
        new Processor(schema, windowMs, java.time.Duration.ofMillis(ttlMs)),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
