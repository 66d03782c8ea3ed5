package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (Structured Streaming).
  *
  * `intervalJoin` is the watermarked event-time interval join: each
  * left row matches right rows with the same key whose event time lies
  * in [left.ts − lower, left.ts + upper]. The time-range predicate
  * plus both-side watermarks are exactly what lets Spark BOUND the
  * join state — rows beyond watermark + bound are evicted from the
  * state store instead of accumulating forever, which is the
  * unbounded-state failure mode of a naive stream-stream equi-join.
  * At scale this is the attribution-join shape (impression × click
  * within a window), state size O(traffic in the interval), not
  * O(stream lifetime).
  */
object StreamJoins {

  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lowerSec: Long, upperSec: Long,
      watermark: String = "10 seconds"): DataFrame =
    joined(left, right, key, leftTs, rightTs, lowerSec, upperSec,
      watermark, "inner")

  /** LEFT OUTER interval join: matched pairs emit like [[intervalJoin]];
    * a left row with NO partner emits once — null-extended — when the
    * watermark proves no partner can still arrive (right watermark past
    * left.ts + upper). That deferred emission is the semantic price of
    * outer results on unbounded streams: "no match" is only decidable
    * once the match window is provably closed, so unmatched rows
    * surface with watermark latency, not trigger latency. State stays
    * bounded exactly as in the inner form. The attribution shape:
    * impressions that never converted, emitted as soon as that is a
    * fact.
    */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lowerSec: Long, upperSec: Long,
      watermark: String = "10 seconds"): DataFrame =
    joined(left, right, key, leftTs, rightTs, lowerSec, upperSec,
      watermark, "left_outer")

  private def joined(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lowerSec: Long, upperSec: Long,
      watermark: String, joinType: String): DataFrame = {
    require(leftTs != rightTs, "left and right event-time columns must differ")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, l(key) === r(key) &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lowerSec SECONDS") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperSec SECONDS"),
      joinType)
      .drop(r(key))
  }
}
