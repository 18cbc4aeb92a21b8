package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forked end-to-end proof of the bench's wall-clock budget (round-15
  * verdict #1/#2): a real `graft.Bench` JVM run with an artificially
  * tiny budget must (a) exit 0, (b) print a clearly-marked CHECKPOINT
  * artifact line after the headline+ingest blocks — so a driver kill
  * at any later point still finds a parseable compact line in the
  * stdout tail instead of r15's parsed:null — and (c) end with a final
  * compact line whose skipped_deadline records everything that was
  * shed (complete-with-skips, never silently absent).
  *
  * Runs at sf0.001 in a temp working dir (the bench writes
  * BENCH_DETAIL.json to cwd, and the spread-trend guard reads the
  * PREVIOUS artifact from there — the repo's real artifact must stay
  * untouched). */
class BenchBudgetSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("tiny budget: headline parses, everything else sheds, rc=0") {
    val cwd = java.nio.file.Files.createTempDirectory("bench_budget_").toFile
    val outF = new java.io.File(cwd, "stdout.txt")
    val errF = new java.io.File(cwd, "stderr.txt")
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx8g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"), "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd)
    pb.redirectOutput(outF)
    pb.redirectError(errF)
    val env = pb.environment()
    env.put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // 1-second budget: the guaranteed first headline round runs, every
    // later unit (extra rounds, steady, io, ingest, scale) sheds
    env.put("SPARK_GRAFT_BENCH_BUDGET_S", "1")
    env.put("SPARK_GRAFT_CPUS", "8")
    val p = pb.start()
    val finished = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) { p.destroyForcibly(); fail("forked bench timed out") }
    val out = new String(java.nio.file.Files.readAllBytes(outF.toPath))
    val rc = p.exitValue()
    withClue(s"stdout:\n${out.takeRight(3000)}\nstderr tail:\n" +
        new String(java.nio.file.Files.readAllBytes(errF.toPath))
          .takeRight(1500)) {
      assert(rc === 0, "budget shedding must yield rc=0, not a timeout kill")
      val jsonLines = out.linesIterator.toVector
        .filter(l => l.startsWith("{\"metric\":\"total\"") && l.endsWith("}"))
      // (b) checkpoint lines: one after ingest, one per scale factor —
      // each is itself a parseable compact artifact
      val checkpoints = jsonLines.filter(_.contains("\"checkpoint\":"))
      assert(checkpoints.exists(_.contains("\"checkpoint\":\"ingest\"")),
        "a checkpoint artifact line must print after the headline+ingest blocks")
      assert(checkpoints.forall(_.contains("\"queries\":{\"q")),
        "every checkpoint line carries the headline minimums")
      // (c) the FINAL line is a non-checkpoint compact artifact with
      // the headline present and the shed work recorded
      val fin = jsonLines.last
      assert(!fin.contains("\"checkpoint\":"),
        "the final line must be the authoritative (non-checkpoint) artifact")
      assert(fin.contains("\"queries\":{\"q"), "parsed headline required")
      val skippedN = "\"skipped_n\":(\\d+)".r.findFirstMatchIn(fin)
        .map(_.group(1).toInt)
      assert(skippedN.exists(_ > 0),
        "a 1s budget must shed work and record it in skipped_n")
      assert(fin.contains("\"skipped_keys\":[\""),
        "shed units are named, never silently absent")
      assert(fin.length <= 1800, "compact line must fit the driver's tail window")
      // the detail artifact carries the full skip list + budget block
      val detail = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(cwd, "BENCH_DETAIL.json").toPath))
      assert(detail.contains("\"budget\":{\"budget_s\":1"))
      assert(detail.contains("\"skipped_deadline\":[\""))
      // shed priorities: ingest and every scale factor were recorded
      // as skipped (they come after the guaranteed headline round)
      assert(detail.contains("\"ingest\""))
      assert(detail.contains("\"x10.block\"") || detail.contains("\"x10."))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(cwd)
  }

  test("SIGTERM after the headline block still yields a parseable compact " +
      "line (the r15 driver-timeout scenario)") {
    val cwd = java.nio.file.Files.createTempDirectory("bench_kill_").toFile
    val outF = new java.io.File(cwd, "stdout.txt")
    val errF = new java.io.File(cwd, "stderr.txt")
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx8g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"), "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd)
    pb.redirectOutput(outF)
    pb.redirectError(errF)
    val env = pb.environment()
    env.put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // ingest skipped (its fixture build is minutes); budget large so
    // nothing sheds — the run is mid-scale-block when the kill lands,
    // exactly where the r15 driver's SIGTERM landed
    env.put("SPARK_GRAFT_BENCH_BUDGET_S", "3600")
    env.put("SPARK_GRAFT_SKIP_INGEST", "1")
    env.put("SPARK_GRAFT_CPUS", "8")
    val p = pb.start()
    // wait for the post-headline checkpoint to land on stdout
    val deadline = System.nanoTime() + 8L * 60 * 1000 * 1000 * 1000
    var sawCheckpoint = false
    while (!sawCheckpoint && p.isAlive && System.nanoTime() < deadline) {
      Thread.sleep(2000)
      sawCheckpoint = try new String(java.nio.file.Files.readAllBytes(
          outF.toPath)).contains("\"checkpoint\":\"ingest\"")
        catch { case _: Throwable => false }
    }
    assert(sawCheckpoint, "checkpoint line never appeared; cannot run the kill")
    p.destroy() // SIGTERM — the driver's timeout signal
    if (!p.waitFor(3, java.util.concurrent.TimeUnit.MINUTES)) {
      p.destroyForcibly(); p.waitFor()
    }
    val out = new String(java.nio.file.Files.readAllBytes(outF.toPath))
    val jsonLines = out.linesIterator.toVector
      .filter(l => l.startsWith("{\"metric\":\"total\"") && l.endsWith("}"))
    withClue(s"stdout tail:\n${out.takeRight(2000)}") {
      assert(jsonLines.nonEmpty, "a killed bench must leave a parseable line")
      // the LAST parseable line (what the driver's parser takes) is a
      // checkpoint — either the post-headline one or the shutdown
      // hook's last-resort print — and carries the headline minimums
      val last = jsonLines.last
      assert(last.contains("\"checkpoint\":"),
        "the surviving line is a marked checkpoint artifact")
      assert(last.contains("\"queries\":{\"q"),
        "the surviving line carries the headline minimums")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(cwd)
  }
}
