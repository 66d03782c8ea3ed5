package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** ST1–ST3: hash-window loop prevention as keyed streaming state.
  *
  * Reference semantics (`FN_IS_LOOP` + `SP_RECORD_HASH` + `SP_CLEANUP_HASH`,
  * `poc/asis-oracle/init/04_create_procedures.sql:31-74`):
  *  - an event whose post-transform hash was APPLIED within the last
  *    `windowMs` (5 min) is suppressed (`'S'` / LOOP_BLOCKED) — but still
  *    audited, which rules out plain dropDuplicatesWithinWatermark;
  *  - suppressed events do NOT refresh the window (hash is recorded only
  *    on successful apply);
  *  - state older than `ttlMs` (10 min) is evicted.
  *
  * Implementation: `flatMapGroupsWithState` keyed by change_hash with
  * event-time timeout = TTL. Every event is emitted, tagged
  * `loop_blocked`; state is one long (last applied event-time). At scale
  * the state store shards by hash across executors; state size is
  * bounded by TTL eviction exactly like the reference's cleanup job.
  */
object LoopDedup {

  val windowMsDefault: Long = 5 * 60 * 1000L  // FN_IS_LOOP 5-minute window
  val ttlMsDefault: Long = 10 * 60 * 1000L    // SP_CLEANUP_HASH 10-minute TTL

  /** @param df        streaming DataFrame with `change_hash: String` and
    *                  an event-time column `event_ts: Timestamp` (must
    *                  already carry a watermark for EventTimeTimeout)
    * @return          df + `loop_blocked: Boolean`
    */
  def apply(
      df: DataFrame,
      windowMs: Long = windowMsDefault,
      ttlMs: Long = ttlMsDefault): DataFrame = {

    val schema = df.schema
    val outSchema = schema.add(StructField("loop_blocked", BooleanType, nullable = false))
    val hashIdx = schema.fieldIndex("change_hash")
    val tsIdx = schema.fieldIndex("event_ts")
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val stateEnc = Encoders.scalaLong
    implicit val keyEnc = Encoders.STRING

    df.as(Encoders.row(schema))
      .groupByKey((r: Row) => r.getString(hashIdx))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.getTimestamp(tsIdx).getTime)
            var lastApplied: Option[Long] = state.getOption
            val out = sorted.map { r =>
              val ts = r.getTimestamp(tsIdx).getTime
              val blocked = lastApplied.exists(la => ts - la <= windowMs && ts >= la - windowMs)
              if (!blocked) lastApplied = Some(ts) // only applied events record the hash
              Row.fromSeq(r.toSeq :+ blocked)
            }
            lastApplied.foreach { la =>
              state.update(la)
              state.setTimeoutTimestamp(la + ttlMs)
            }
            out.iterator
          }
      }
  }
}
