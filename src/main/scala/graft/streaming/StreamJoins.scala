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
      watermark: String = "10 seconds"): DataFrame = {
    require(leftTs != rightTs, "left and right event-time columns must differ")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, l(key) === r(key) &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lowerSec SECONDS") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperSec SECONDS"))
      .drop(r(key))
  }
}
