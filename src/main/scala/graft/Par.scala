package graft

import java.util.Properties
import java.util.concurrent.{Executors, FutureTask}
import java.util.concurrent.atomic.AtomicReference

/** Run independent driver-side Spark actions concurrently, propagating
  * the first failure. Streaming trigger paths are DRIVER-bound:
  * Catalyst re-analyzes every per-batch plan from scratch (measured
  * ~60% of per-phase wall on the ingest gate, executed jobs the rest),
  * so two independent phases on one thread pay their analyses in
  * SEQUENCE — separate threads overlap them, and Spark supports
  * concurrent actions on one session natively. Only for actions with
  * no ordering dependency (different output roots/tables, idempotent
  * commits).
  *
  * Failure semantics: the FIRST failure propagates; every concurrent
  * sibling failure is attached via `addSuppressed` (losing them would
  * discard diagnostic signal for exactly the crash windows the replay
  * logic reasons about — e.g. an `InterruptedException` from a stream
  * stopped mid-trigger). Once one thunk fails the remaining siblings
  * are cancelled: running ones are interrupted, unstarted ones never
  * run — the trigger is failing either way and the replay recomputes
  * everything, so finishing doomed work only delays the retry.
  *
  * Backed by one shared daemon pool (cached, so idle threads die after
  * 60 s): per-call `new Thread` was two to four thread creations per
  * ingest trigger — harmless at 5 s triggers, measurable at
  * sub-second ones. Pooling changes one thing the old per-call threads
  * got for free: `SparkContext.localProperties` is an
  * InheritableThreadLocal, cloned at THREAD CREATION — a pool thread
  * permanently carries whatever the thread that first grew the pool
  * had set (a stale execution id makes every later action count as a
  * NESTED execution; a missing job group makes `query.stop()` unable
  * to cancel in-flight jobs). So each task re-captures the CALLER's
  * properties, runs under a per-task clone (Spark mutates the object
  * in `withNewExecutionId` — sharing one clone across tasks would race
  * execution ids), and leaves the pool thread's properties empty. Same
  * mechanism as Spark's own `SQLExecution.withThreadLocalCaptured`;
  * the two accessors are `private[spark]` (public in bytecode), hence
  * the one-time reflective lookup with a no-capture fallback.
  */
object Par {
  private val pool = Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-par")
      t.setDaemon(true)
      t
    })

  private val propAccessors: Option[
      (java.lang.reflect.Method, java.lang.reflect.Method)] =
    scala.util.Try {
      val c = classOf[org.apache.spark.SparkContext]
      (c.getMethod("getLocalProperties"),
        c.getMethod("setLocalProperties", classOf[Properties]))
    }.toOption

  def run(fs: (() => Unit)*): Unit = {
    // capture on the CALLING thread: the session + its local properties
    // (execution ids, job group, scheduler pool) that per-call threads
    // used to inherit at creation
    val sc = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext)
    val captured: Option[(org.apache.spark.SparkContext, Properties,
        java.lang.reflect.Method)] =
      for { (get, set) <- propAccessors; c <- sc } yield {
        val p = new Properties()
        p.putAll(get.invoke(c).asInstanceOf[Properties])
        (c, p, set)
      }
    def withCallerProps(body: () => Unit): Unit = captured match {
      case Some((c, p, set)) =>
        val mine = new Properties() // per-task clone: Spark mutates it
        mine.putAll(p)
        set.invoke(c, mine)
        try body() finally set.invoke(c, new Properties())
      case None => body()
    }
    val failure = new AtomicReference[Throwable]()
    // build ALL tasks before submitting any: a failing task cancels its
    // siblings through `tasks`, which must be fully populated first
    lazy val tasks: Seq[FutureTask[Unit]] = fs.map { f =>
      new FutureTask[Unit](() => {
        try withCallerProps(f) catch {
          case e: Throwable =>
            if (failure.compareAndSet(null, e)) tasks.foreach(_.cancel(true))
            else failure.get().addSuppressed(e) // Throwable synchronizes
        }
      }, ())
    }
    // clear any interrupt AFTER FutureTask.run returns, not inside the
    // callable: a sibling's cancel(true) can deliver its interrupt
    // between an in-body clear and run() publishing the final state —
    // run()'s own handlePossibleCancellationInterrupt waits for that
    // delivery but deliberately leaves the FLAG set, and a flag leaked
    // to the pooled thread would fail its next (unrelated) task's first
    // blocking call. After run() returns no further cancel can
    // interrupt (state is no longer NEW), so this clear is complete.
    tasks.foreach(t => pool.execute(() => {
      try t.run() finally Thread.interrupted()
    }))
    // await ALL: get() throws CancellationException for cancelled
    // siblings and nothing for completed ones — thunk failures were
    // already captured inside the task, never thrown here. An interrupt
    // of the CALLING thread (stream stop) cancels the whole fan-out and
    // propagates — returning early with work in flight would let a
    // caller observe success for commits that never landed.
    tasks.foreach(t => try t.get() catch {
      case ie: InterruptedException =>
        tasks.foreach(_.cancel(true))
        throw ie
      case _: Exception => ()
    })
    if (failure.get() != null) throw failure.get()
  }
}
