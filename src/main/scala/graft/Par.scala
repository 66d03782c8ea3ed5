package graft

/** Run independent driver-side Spark actions concurrently, propagating
  * the first failure. Streaming trigger paths are DRIVER-bound:
  * Catalyst re-analyzes every per-batch plan from scratch (measured
  * ~60% of per-phase wall on the ingest gate, executed jobs the rest),
  * so two independent phases on one thread pay their analyses in
  * SEQUENCE — separate threads overlap them, and Spark supports
  * concurrent actions on one session natively. Only for actions with
  * no ordering dependency (different output roots/tables, idempotent
  * commits).
  */
object Par {
  def run(fs: (() => Unit)*): Unit = {
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val ts = fs.map { f =>
      val t = new Thread(() => {
        try f() catch { case e: Throwable => failure.compareAndSet(null, e) }
      })
      t.start(); t
    }
    ts.foreach(_.join())
    if (failure.get() != null) throw failure.get()
  }
}
