package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Run a cleanup action exactly once when a streaming query terminates
  * (stop OR failure) — the lifecycle hook for resources a stream pins
  * at start: session confs it lowered, broadcast index replicas, etc.
  * Listener-based so the caller's `query.stop()` needs no wrapper and
  * an exception-path termination still cleans up.
  */
object QueryCleanup {

  /** Invoke `cleanup` once when `query` terminates. Idempotence is
    * enforced here (CAS), so the inline already-terminated check below
    * and the listener can't double-fire it. The listener unregisters
    * itself after firing.
    */
  def onTermination(spark: SparkSession, query: StreamingQuery)(
      cleanup: () => Unit): Unit = {
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    def runOnce(): Unit = if (done.compareAndSet(false, true)) cleanup()
    val qid = query.id
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          event: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          event: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          event: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (event.id == qid)
          try runOnce() finally spark.streams.removeListener(this)
    }
    spark.streams.addListener(listener)
    // the query may have terminated between start() and addListener —
    // the event already fired unobserved, so clean up inline (runOnce
    // keeps the pair single-shot if the listener DID catch it)
    if (!query.isActive) {
      try runOnce() finally spark.streams.removeListener(listener)
    }
  }

}
