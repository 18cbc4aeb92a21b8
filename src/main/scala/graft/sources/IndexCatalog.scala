package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named, VERSIONED index tables — the q136 manifest/snapshot
  * discipline applied to the durable indexes (round-13 verdict #3).
  *
  * The pid-keyed durable tables (LSH q311, SRP q24, IVF q34, PageRank
  * layout q146) are session-lifetime artifacts: correct for one job,
  * but the first thing a SECOND user of the same warehouse hits is
  * "whose index is this and can I rebuild it while you probe?". This
  * catalog answers it the way every table format does:
  *
  *  - an index FAMILY is a logical name (`srp_docs`); a BUILD mints
  *    the next version and writes its parts as bucketed tables named
  *    `graft_idx_<family>_v<N>_<part>`;
  *  - a one-file MANIFEST per family (`graft_idx_<family>_manifest.txt`
  *    in the warehouse dir) names the current version and every live
  *    version's parts; it is published by temp-write + ATOMIC_MOVE, so
  *    a reader sees the old manifest or the new one, never a torn one
  *    (the GoldenFixture discipline — a crash mid-build leaves the
  *    manifest untouched and the half-written vN+1 tables unreferenced);
  *  - a PROBE pins a version (default: current at pin time) and reads
  *    only that version's parts — a build landing vN+1 mid-probe is
  *    INVISIBLE to it (the q136 snapshot-isolation law, asserted per
  *    family in IndexCatalogSpec);
  *  - VACUUM (not the liveness sweep) reclaims: it drops versions that
  *    are (a) not the current one, (b) outside the keep-window, and
  *    (c) past a grace age — the standard "no reader still holds it"
  *    heuristic when pins aren't centrally tracked (Delta VACUUM's
  *    retention check). Unreferenced tables from crashed builds age
  *    out the same way.
  *
  * Local-mode caveat, by design: Spark's in-memory catalog dies with
  * the JVM, so a LATER process sees the version tables only as
  * warehouse DIRECTORIES. [[readPart]] therefore falls back from
  * `spark.table` to a direct parquet read of the table location —
  * values identical, bucket METADATA (the shuffle-free join) lost
  * until re-registration; with a persistent metastore (the 100 TB
  * deployment) the same code keeps it. Concurrent builders in separate
  * processes can race a version number; the loser's tables are
  * unreferenced (vacuum food) and the manifest move is atomic either
  * way — a real deployment swaps the file move for the metastore's
  * conditional put.
  */
object IndexCatalog {

  /** Physical table name of one part of one version. */
  def tableName(family: String, v: Int, part: String): String = {
    require(family.matches("[a-z0-9_]+"), s"family must be [a-z0-9_]+: $family")
    s"graft_idx_${family}_v${v}_$part"
  }

  final case class Version(v: Int, parts: Seq[String], publishedMs: Long)
  final case class Manifest(current: Int, versions: Seq[Version])

  private def warehouseDir(spark: SparkSession): java.io.File =
    new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)

  private def manifestFile(spark: SparkSession, family: String): java.io.File =
    new java.io.File(warehouseDir(spark), s"graft_idx_${family}_manifest.txt")

  /** One line per version (`v=<N> ms=<epoch> parts=<a,b>`), preceded by
    * `current=<N>` — a deliberately trivial grammar so no JSON parser
    * enters the dependency surface. */
  private def render(m: Manifest): String =
    (s"current=${m.current}" +: m.versions.sortBy(_.v).map(v =>
      s"v=${v.v} ms=${v.publishedMs} parts=${v.parts.mkString(",")}"))
      .mkString("\n") + "\n"

  def readManifest(spark: SparkSession, family: String): Option[Manifest] = {
    val f = manifestFile(spark, family)
    if (!f.exists()) None
    else try {
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      import scala.jdk.CollectionConverters._
      val all = lines.asScala.map(_.trim).filter(_.nonEmpty)
      val cur = all.collectFirst { case s if s.startsWith("current=") =>
        s.stripPrefix("current=").toInt }
      val vRe = "v=(\\d+) ms=(\\d+) parts=([a-z0-9_,]+)".r
      val vs = all.collect { case vRe(v, ms, parts) =>
        Version(v.toInt, parts.split(",").toSeq, ms.toLong) }.toSeq
      cur.map(Manifest(_, vs))
    } catch { case _: Throwable => None }
  }

  def currentVersion(spark: SparkSession, family: String): Option[Int] =
    readManifest(spark, family).map(_.current)

  private def writeManifest(spark: SparkSession, family: String,
                            m: Manifest): Unit = {
    val f = manifestFile(spark, family)
    f.getParentFile.mkdirs()
    val tmp = new java.io.File(f.getParentFile,
      f.getName + s".tmp_pid${ProcessHandle.current().pid()}")
    java.nio.file.Files.write(tmp.toPath,
      render(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  // one build at a time per (JVM, family): version minting is
  // read-modify-write on the manifest
  private val mintLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Mint the next version of `family`: `build` writes the parts given
    * (version, part => full table name) and returns the part names it
    * wrote; the manifest flips to the new version ATOMICALLY after all
    * parts land — a probe pinned before or during the build never sees
    * it. Returns the new version. */
  def mint(spark: SparkSession, family: String)(
      build: (Int, String => String) => Seq[String]): Int = {
    val lock = mintLocks.computeIfAbsent(family, _ => new Object)
    lock.synchronized {
      val prev = readManifest(spark, family)
      // maxOption: a manifest whose version lines were all hand-pruned
      // (or failed the line grammar) still has a current= header — mint
      // must restart numbering, not throw on an empty max
      val v = prev.flatMap(_.versions.map(_.v).maxOption).getOrElse(0) + 1
      val parts = build(v, part => tableName(family, v, part))
      require(parts.nonEmpty, s"index build for $family wrote no parts")
      val entry = Version(v, parts, System.currentTimeMillis())
      writeManifest(spark, family,
        Manifest(v, prev.map(_.versions).getOrElse(Seq.empty) :+ entry))
      v
    }
  }

  /** Read one part of one version: `spark.table` when the catalog still
    * holds the entry (same-process — keeps bucket metadata), else the
    * table's warehouse directory as plain parquet (cross-process with
    * the in-memory catalog — values identical, bucketing metadata
    * lost; a persistent metastore keeps the first path). */
  def readPart(spark: SparkSession, family: String, v: Int,
               part: String): DataFrame = {
    val t = tableName(family, v, part)
    if (spark.catalog.tableExists(t)) spark.table(t)
    else {
      val d = new java.io.File(warehouseDir(spark),
        t.toLowerCase(java.util.Locale.ROOT))
      require(d.exists(), s"index part $t of $family@$v not found " +
        "(vacuumed, or never published?)")
      spark.read.parquet(d.getPath)
    }
  }

  /** Pin the version a probe will read: an explicit `version` if >0,
    * else the manifest's CURRENT — captured once, so everything the
    * caller derives from it stays at that snapshot. */
  def pin(spark: SparkSession, family: String, version: Int = -1): Int =
    if (version > 0) version
    else currentVersion(spark, family).getOrElse(
      throw new IllegalStateException(
        s"index family $family has no published version"))

  /** Reclaim old versions: drop every version that is NOT current, NOT
    * in the newest `keep` versions, and older than `graceMs` — plus
    * any `graft_idx_<family>_v*` table directory the manifest does not
    * reference at all (crashed builds). Returns the dropped tables. */
  def vacuum(spark: SparkSession, family: String, keep: Int = 2,
             graceMs: Long = 30L * 60 * 1000): Seq[String] = {
    val lock = mintLocks.computeIfAbsent(family, _ => new Object)
    lock.synchronized {
      val mOpt = readManifest(spark, family)
      if (mOpt.isEmpty) return Seq.empty
      val m = mOpt.get
      val cutoff = System.currentTimeMillis() - graceMs
      val keepVs = m.versions.map(_.v).sorted.takeRight(math.max(1, keep))
        .toSet + m.current
      val (dead, live) = m.versions.partition(e =>
        !keepVs.contains(e.v) && e.publishedMs < cutoff)
      val droppedTables = dead.flatMap(e => e.parts.map(p =>
        tableName(family, e.v, p)))
      // unreferenced directories (crashed builds): same grace age, by
      // dir mtime, never a version the manifest still lists
      val refd = m.versions.flatMap(e => e.parts.map(p =>
        tableName(family, e.v, p).toLowerCase(java.util.Locale.ROOT))).toSet
      val prefix = s"graft_idx_${family}_v"
      val orphans = Option(warehouseDir(spark).listFiles())
        .getOrElse(Array.empty).toSeq
        .filter(f => f.getName.startsWith(prefix) && !refd(f.getName) &&
          f.lastModified() < cutoff)
        .map(_.getName)
      (droppedTables ++ orphans).foreach { t =>
        try spark.sql(s"DROP TABLE IF EXISTS $t")
        catch { case _: Throwable => () }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
          warehouseDir(spark), t.toLowerCase(java.util.Locale.ROOT)))
      }
      if (dead.nonEmpty)
        writeManifest(spark, family, Manifest(m.current, live))
      droppedTables ++ orphans
    }
  }

  /** Drop a whole family — manifest, every referenced table, every
    * orphan dir (spec teardown / decommission). */
  def dropFamily(spark: SparkSession, family: String): Unit = {
    val lock = mintLocks.computeIfAbsent(family, _ => new Object)
    lock.synchronized {
      readManifest(spark, family).foreach(_.versions.foreach(e =>
        e.parts.foreach { p =>
          val t = tableName(family, e.v, p)
          try spark.sql(s"DROP TABLE IF EXISTS $t")
          catch { case _: Throwable => () }
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
            warehouseDir(spark), t.toLowerCase(java.util.Locale.ROOT)))
        }))
      // version dirs + manifest temps of THIS family only: a bare
      // `graft_idx_<family>_` prefix would also match a family whose
      // name extends this one (dropping `srp` must not touch
      // `srp_docs`' `graft_idx_srp_docs_v1_*` dirs), so require the
      // version marker or the manifest filename after the family name
      val exact = (s"graft_idx_${family}_v\\d+_.*|" +
        s"graft_idx_${family}_manifest\\.txt(\\.tmp_pid\\d+)?").r
      Option(warehouseDir(spark).listFiles()).getOrElse(Array.empty)
        .filter(f => exact.pattern.matcher(f.getName).matches())
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
      manifestFile(spark, family).delete()
      ()
    }
  }
}
