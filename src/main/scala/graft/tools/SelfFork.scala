package graft.tools

/** Dev-only: re-exec a profiling tool's main in a BARE child JVM —
  * the same context as the bench's forked tws probe
  * ([[graft.StreamBench.twsForked]]) — so its numbers are valid no
  * matter how the tool was launched.
  *
  * Why uniform context matters (round 15): the host these probes run
  * on swings ±2× within minutes — an sbt-wrapped session read
  * 4.1-9.7k ev/s and bare java minutes later 17.9k, which first read
  * as "the launcher halves the probe" until an INTERLEAVED A/B read
  * in-sbt 17.5k and bare 7.0k in adjacent windows: host windows, not
  * the launcher, dominate absolutes. Forking doesn't fix that (only
  * same-window matched pairs and known-band bracket runs do — see
  * COVERAGE's round-15 measurement rules); what it fixes is the
  * CONTEXT variable: every reading from these tools now comes from
  * the identical bare-JVM, stderr-discarded setup as the bench's
  * shipped number, so launcher differences can never re-enter a
  * comparison. `run / fork := true` (build.sbt) means
  * `java.class.path` IS the app classpath, so the child command is
  * reconstructible from inside any launcher.
  */
object SelfFork {
  /** Mirrors the JDK-17 opens Spark needs (kept in sync with
    * [[graft.StreamBench.twsForked]], which owns the canonical list).
    */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** If this JVM is a launcher wrapper (no `GRAFT_IN_FORK` marker),
    * spawn `mainClass` in a bare child JVM — stdout inherited so the
    * tool's report lines land where the caller looks, stderr (Spark
    * logs) discarded, exit code propagated — and return true so the
    * caller's main returns without running the probe locally. Inside
    * the child (marker set), return false: run the probe.
    */
  def reexecIfWrapped(mainClass: String, args: Array[String]): Boolean = {
    if (sys.env.contains("GRAFT_IN_FORK")) return false
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++
      addOpens ++ Seq("-Xmx8g", "-cp", System.getProperty("java.class.path"),
        mainClass) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("GRAFT_IN_FORK", "1")
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val rc = pb.start().waitFor()
    if (rc != 0) sys.error(s"$mainClass fork exited $rc")
    true
  }
}
