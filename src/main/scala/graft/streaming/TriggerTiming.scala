package graft.streaming

/** Shared per-phase trigger timing, gated on `GRAFT_TRIGGER_TIMING` —
  * one definition so the per-topic and multiplexed pipelines' wall
  * diagnostics cannot drift apart.
  */
private[streaming] object TriggerTiming {
  def timed[A](tag: String, phase: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    if (sys.env.contains("GRAFT_TRIGGER_TIMING"))
      System.err.println(
        f"[$tag] ${(System.nanoTime() - t0) / 1e6}%6.0f ms  $phase")
    r
  }
}
