package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session-conf pin registry for streaming gates that size session
  * confs to their trigger volume (shuffle width down, listing
  * threshold up). A naive save-at-start / restore-at-termination pair
  * breaks as soon as two streams share one session: stream A records
  * the pre-pin value, stream B starts and (seeing the already-pinned
  * value) records nothing, A terminates and restores — yanking the pin
  * out from under the still-running B; and the termination listener
  * bus is ASYNC, so even back-to-back restarts of one gate can have
  * run N's late restore clobber run N+1's fresh pin. This registry
  * fixes both: every interested stream REGISTERS a holder (even when
  * the session value already satisfies it), the effective value is the
  * combine (min for only-lowers pins, max for only-raises) of the
  * original and all live holders, and the ORIGINAL value is restored
  * only when the LAST holder releases.
  *
  * Sessions are keyed by the session OBJECT (SparkSession does not
  * override equals/hashCode, so map keys are reference-identity —
  * identityHashCode alone would merge two sessions on a hash
  * collision). The entry is dropped when its last holder releases, so
  * the map only retains sessions with live pins. A caller who
  * manually sets a pinned conf mid-stream is last-writer-wins until
  * the next acquire/release recomputes, same caveat as the simple
  * save/restore had.
  */
private[graft] object ConfPins {
  private final case class State(original: Long,
      holders: Map[java.util.UUID, Long])
  private val lock = new Object
  private val pins =
    scala.collection.mutable.Map[(SparkSession, String), State]()

  private def sessionKey(spark: SparkSession, key: String): (SparkSession, String) =
    (spark, key)

  /** Register `qid`'s interest in `desired` for `key`. `lower = true`
    * pins that only ever LOWER the session value (effective = min of
    * original and all holders); `false` only ever RAISE (max).
    */
  def acquire(spark: SparkSession, key: String, desired: Long,
      lower: Boolean, qid: java.util.UUID): Unit = lock.synchronized {
    val k = sessionKey(spark, key)
    val st = pins.getOrElse(k,
      State(spark.conf.get(key).toLong, Map.empty))
    val next = st.copy(holders = st.holders + (qid -> desired))
    pins(k) = next
    spark.conf.set(key, effective(next, lower).toString)
  }

  /** Drop `qid`'s hold; restore the original when it was the last. */
  def release(spark: SparkSession, key: String, lower: Boolean,
      qid: java.util.UUID): Unit = lock.synchronized {
    val k = sessionKey(spark, key)
    pins.get(k).foreach { st =>
      val rest = st.holders - qid
      if (rest.isEmpty) {
        pins.remove(k)
        spark.conf.set(key, st.original.toString)
      } else {
        val next = st.copy(holders = rest)
        pins(k) = next
        spark.conf.set(key, effective(next, lower).toString)
      }
    }
  }

  private def effective(st: State, lower: Boolean): Long =
    if (lower) (st.original +: st.holders.values.toSeq).min
    else (st.original +: st.holders.values.toSeq).max

  /** The standard trigger-sized pin pair the ingest gates share:
    * shuffle width down to `shufflePartitions` (when given), driver-
    * side file-listing threshold up to 1024. Returns the release hook
    * to run at query termination.
    */
  def acquireGatePins(spark: SparkSession,
      shufflePartitions: Option[Int],
      qid: java.util.UUID): () => Unit = {
    val shuffleKey = "spark.sql.shuffle.partitions"
    val listKey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    shufflePartitions.foreach(n =>
      acquire(spark, shuffleKey, n.toLong, lower = true, qid))
    acquire(spark, listKey, 1024L, lower = false, qid)
    () => {
      shufflePartitions.foreach(_ =>
        release(spark, shuffleKey, lower = true, qid))
      release(spark, listKey, lower = false, qid)
    }
  }
}
