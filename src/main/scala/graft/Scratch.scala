package graft

/** Per-JVM-unique scratch directories under target/.
  *
  * Two Spark sessions running the SAME query concurrently (two Verify
  * JVMs over one sfDir — the concurrency contract
  * tools/concurrent_verify.sh enforces) must never share a Spark
  * writer's output dir: the second writer's commit deletes the first
  * one's `_temporary/` mid-task ("File .../_temporary/0 does not
  * exist"). Keying the path by sfDir alone is exactly that collision;
  * the JVM pid disambiguates sessions while staying STABLE within a
  * session, so a writer and its later readers (including oracle SQL
  * that embeds the path string) agree on the location.
  *
  * Deterministic identical-bytes fixture files (golden CSV, JSONL,
  * sniff fixtures) intentionally do NOT use this: they memoize via
  * lazy val and concurrent sessions write the same bytes.
  */
object Scratch {
  def dir(base: String): String =
    s"${sys.props("user.dir")}/target/${base}_pid${ProcessHandle.current().pid()}"
}
