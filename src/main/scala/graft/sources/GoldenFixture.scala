package graft.sources

import java.io.PrintWriter
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import scala.util.Random

/** Deterministic generator for a reference-shaped CSV slice: three
  * drifting `|`-separated transactions files + a product file, with
  * every documented edge case of the reference's contract (FIXTURES.md
  * §1-2; reference `schema.sql:4-39`, `schemas_regex.py:29-57`):
  *
  *  - data2.csv lacks the `Numero_TPV` column entirely (schema drift —
  *    the reference's second export did the same);
  *  - `""` and `#NO VALUE` null tokens in string AND money columns
  *    (the reference's third file had ~2M `#NO VALUE` in CA_Net_TTC);
  *  - exact duplicate rows (dedup must NOT collapse them);
  *  - negative Quantite_Vendue / margins (returns);
  *  - dates spanning 3 calendar months so "last 2 calendar months" and
  *    "last 60 days" windows differ;
  *  - Numero_Transaction values repeated within and across stores
  *    (COUNT vs COUNT DISTINCT divergence);
  *  - one FK-orphan Modele_Couleur_Ref (outside every margin window).
  *
  * THREE of the reference's published figures are planted as exact
  * 1/1000-scale analogs, so the flagship queries have human-checkable
  * constants:
  *  - the signature margin over the last-2-calendar-months window lands
  *    EXACTLY on 49264.014260 (analog of the published 49,264,014.26,
  *    reference README.md:227-232) via one adjustment row;
  *  - EXACTLY 76 duplicate groups exist on the reference's 15-column
  *    business key (README.md:192, profiling.ipynb cell 27) — the 5
  *    whole-row duplicates plus 71 planted key-duplicates differing
  *    only in CA_Net_TTC (a non-key column);
  *  - EXACTLY 2020 `#NO VALUE` tokens sit in data3's CA_Net_TTC column
  *    (analog of the published 2,019,845 in the third export,
  *    profiling.ipynb:747, rounded at 1/1000 scale).
  *
  * Everything is seeded and pure JVM: the same bytes are produced on
  * every call, which is what lets the DuckDB oracle read the same files
  * the Spark query ingested.
  */
object GoldenFixture {

  val TargetMargin2M = BigDecimal("49264.014260")
  val TargetDupGroups = 76   // README.md:192 — groups on the 15-col key
  val TargetNoValueCa = 2020 // profiling.ipynb:747 — #NO VALUE in CA_Net_TTC

  /** The reference's 15-column duplicate-check business key
    * (profiling.ipynb cell 27), as a Tx projection. */
  def bizKey(t: Tx): Product = (t.tid, t.pdv, t.fedasNum, t.fedasLib,
    t.date, t.heure, t.typologie, t.typeVente, t.cible, t.ref, t.refLib,
    t.nps, t.qty, t.marge, t.ht)

  /** One transactions row, pre-typing (exactly what lands in the CSV). */
  final case class Tx(
      pdv: String, tpv: Option[String], tid: String, date: LocalDate,
      heure: String, typologie: String, fidelite: Option[String],
      typeVente: String, univers: Option[String], segment: Option[String],
      famille: Option[String], sousFamille: Option[String],
      fedasNum: String, fedasLib: String, cible: String,
      ref: String, refLib: String, nps: String,
      qty: Int, ht: BigDecimal, ttc: Option[BigDecimal], marge: BigDecimal)

  final case class Fixture(
      rows: Seq[Tx],                       // all rows across the 3 files
      products: Map[String, Option[Boolean]],
      dir: String) {
    def txPaths: Seq[String] =
      Seq("data1.csv", "data2.csv", "data3.csv").map(f => s"$dir/$f")
    def productPath: String = s"$dir/product.csv"
    def productXlsxPath: String = s"$dir/product.xlsx"
  }

  val DateMin: LocalDate = LocalDate.of(2022, 1, 10)
  val DateMax: LocalDate = LocalDate.of(2022, 3, 30)
  // anchor month = March -> [Feb 1, Apr 1); 60-day window = [Jan 29, Mar 30]
  val Window2MStart: LocalDate = LocalDate.of(2022, 2, 1)
  val Window2MEnd: LocalDate = LocalDate.of(2022, 4, 1)

  private def money(cents: Long): BigDecimal =
    BigDecimal(cents, 2).setScale(6)

  private def fmt(b: BigDecimal): String =
    b.setScale(6).bigDecimal.toPlainString.replace('.', ',')

  private val generated =
    new java.util.concurrent.ConcurrentHashMap[String, Fixture]()

  /** Generate (idempotently — same bytes every call) into `dir`.
    * Memoized per dir and atomic: several oracle queries (q35-q37) use
    * the fixture and Verify runs them CONCURRENTLY — two writers
    * interleaving on the same CSV would corrupt it. */
  def generate(dir: String): Fixture =
    generated.computeIfAbsent(dir, d => doGenerate(d))

  private def doGenerate(dir: String): Fixture = {
    val rnd = new Random(20260812L)
    val nProducts = 300
    val products: Map[String, Option[Boolean]] =
      (1 to nProducts).map { i =>
        val flag = if (i % 37 == 0) None else Some(i % 2 == 0)
        s"MCR$i" -> flag
      }.toMap

    val spanDays = java.time.temporal.ChronoUnit.DAYS.between(DateMin, DateMax).toInt

    def mkRow(fileNo: Int): Tx = {
      val store = rnd.nextInt(40) + 1
      val pdv = f"PDV-id-$store%04d"
      val tpv = if (fileNo == 2) None else Some(s"TPV_${rnd.nextInt(200) + 1}")
      // small per-store TID pool => repeats within a store; same pool
      // across stores => repeats across stores
      val tid = f"TID${rnd.nextInt(400)}%012d"
      val date = DateMin.plusDays(rnd.nextInt(spanDays + 1).toLong)
      val heure = f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"
      val fid = rnd.nextInt(4) match {
        case 0 => None
        case _ => Some(s"N_${rnd.nextInt(4000000)}")
      }
      val opt = (p: String) => if (rnd.nextInt(10) == 0) None else Some(s"${p}_${rnd.nextInt(50)}")
      val ref = s"MCR${rnd.nextInt(nProducts) + 1}"
      val qty = if (rnd.nextInt(20) == 0) -(rnd.nextInt(3) + 1) else rnd.nextInt(5) + 1
      val ht = money(rnd.nextInt(5000000).toLong - 500000)
      val ttc = Some(money(rnd.nextInt(6000000).toLong - 500000))
      val marge = money(rnd.nextInt(2000000).toLong - 600000)
      Tx(pdv, tpv, tid, date, heure, s"Typologie_Magasin_${rnd.nextInt(6) + 1}",
        fid, s"TV${rnd.nextInt(5) + 1}", opt("CL1"), opt("CL2"), opt("CL3"),
        opt("CL4"), s"FedasNum${rnd.nextInt(900) + 100}",
        s"FedasLib${rnd.nextInt(900) + 100}", s"CGA${rnd.nextInt(9) + 1}",
        ref, s"MCL${rnd.nextInt(9000) + 1000}", s"NPS${rnd.nextInt(4) + 1}",
        qty, ht, ttc, marge)
    }

    val d1base = Seq.fill(1200)(mkRow(1))
    val d1 = d1base ++ d1base.take(5) // exact duplicate rows
    val d2 = Seq.fill(800)(mkRow(2))
    // data3 is the big third export: 2500 base rows, of which EXACTLY
    // TargetNoValueCa carry a missing CA_Net_TTC (written as the
    // '#NO VALUE' token) — the 1/1000-scale analog of the published
    // 2,019,845 count
    val d3base = Seq.fill(2500)(mkRow(3)).zipWithIndex.map { case (t, i) =>
      if (i < TargetNoValueCa) t.copy(ttc = None) else t
    }

    // FK orphan, outside both margin windows (date before Jan 29)
    val orphan = mkRow(3).copy(ref = "MCR-ORPHAN-1",
      date = LocalDate.of(2022, 1, 12), marge = money(100))

    // Plant key-duplicates: copies of singleton-key d3 rows differing
    // ONLY in CA_Net_TTC (not part of the 15-col key), topping the
    // business-key duplicate-group count up to exactly TargetDupGroups.
    // The 5 whole-row d1 duplicates already form key-dup groups, so the
    // planted count adapts to whatever the seeded rows produced.
    val preRows = d1 ++ d2 ++ d3base :+ orphan
    val existingGroups = preRows.groupBy(bizKey).count(_._2.size > 1)
    // sort on the full key string — hash-map order is not deterministic
    // and tids repeat, so nothing weaker gives the same pick on every
    // call. Tuple.toString is NOT injective (a field containing ", "
    // can render two keys alike); ties then fall back to sortBy's
    // STABILITY over the deterministic d3base order, which keeps the
    // pick reproducible — do not swap in an unstable/parallel sort
    val singletons = d3base.groupBy(bizKey).filter(_._2.size == 1)
      .flatMap(_._2).toSeq.sortBy(t => bizKey(t).toString)
      .take(TargetDupGroups - existingGroups)
    val dupCopies = singletons.zipWithIndex.map { case (t, i) =>
      t.copy(ttc = Some(money(7000000L + i))) // outside the generated range
    }

    // adjustment row: signature product (MCR2 -> true), in-window, lands
    // the 2-calendar-month signature margin exactly on TargetMargin2M
    def eligible(t: Tx): Boolean =
      products.get(t.ref).exists(_.contains(true)) &&
        !t.date.isBefore(Window2MStart) && t.date.isBefore(Window2MEnd)
    val runningSum = (preRows ++ dupCopies)
      .filter(eligible).map(_.marge).sum
    val adj = mkRow(3).copy(ref = "MCR2", date = LocalDate.of(2022, 3, 15),
      marge = TargetMargin2M - runningSum,
      ttc = Some(money(123456)), qty = 1)
    val d3 = d3base ++ dupCopies ++ Seq(orphan, adj)

    val all = d1 ++ d2 ++ d3
    require(all.groupBy(bizKey).count(_._2.size > 1) == TargetDupGroups,
      "planted business-key duplicate groups drifted off the golden 76")
    require(d3.count(_.ttc.isEmpty) == TargetNoValueCa,
      "planted #NO VALUE count drifted off the golden 2020")

    Files.createDirectories(Paths.get(dir))
    writeTx(s"$dir/data1.csv", d1, withTpv = true)
    writeTx(s"$dir/data2.csv", d2, withTpv = false)
    writeTx(s"$dir/data3.csv", d3, withTpv = true)
    writeProducts(s"$dir/product.csv", products)
    writeProductsXlsx(s"$dir/product.xlsx", products)
    Fixture(all, products, dir)
  }

  /** The product dimension ALSO ships as .xlsx — in the reference the
    * products file IS an Excel workbook (profiling.ipynb cell 36), so
    * the fixture carries both encodings and the spec asserts
    * XlsxSource lands on the identical typed dimension. Minimal
    * spec-conformant workbook: inline-string cells, empty signature ->
    * absent cell. */
  private def writeProductsXlsx(path: String,
                                products: Map[String, Option[Boolean]]): Unit = {
    atomically(path) { f =>
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      entry("xl/sharedStrings.xml", """<?xml version="1.0"?><sst></sst>""")
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0"?><worksheet><sheetData>""")
      sb.append("""<row r="1"><c r="A1" t="inlineStr"><is><t>CODE_MODELE_COULEUR_ACTUEL</t></is></c>""")
      sb.append("""<c r="B1" t="inlineStr"><is><t>SIGNATURE_PRODUCT</t></is></c></row>""")
      products.toSeq.sortBy(_._1).zipWithIndex.foreach { case ((k, v), i) =>
        val r = i + 2
        sb.append(s"""<row r="$r"><c r="A$r" t="inlineStr"><is><t>$k</t></is></c>""")
        v.foreach(b => sb.append(s"""<c r="B$r"><v>${if (b) 1 else 0}</v></c>"""))
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      entry("xl/worksheets/sheet1.xml", sb.toString)
    } finally zos.close()
    }
  }


  /** Write via a pid-unique temp file + atomic rename into place.
    * Concurrent sessions regenerate the SAME bytes (the generator is
    * deterministic), but truncate-then-write in place let a concurrent
    * READER observe a half-written file: two concurrent Verify JVMs
    * hit this for real — session B's q35 read data3.csv mid-rewrite by
    * session A and lost rows (concurrent_verify FAILED with a
    * low-by-half total_revenue). With the rename, a reader sees either
    * the complete old bytes or the complete new bytes — identical
    * content either way. */
  private def atomically(path: String)(write: java.io.File => Unit): Unit = {
    val tmp = new java.io.File(
      path + s".tmp${ProcessHandle.current().pid()}")
    // delete the partial temp when the write or move throws (disk
    // full, interrupted JVM): a leaked .tmp<pid> would otherwise sit in
    // the fixture directory for directory-level readers and globs to
    // trip over (round-12 advice)
    var moved = false
    try {
      write(tmp)
      java.nio.file.Files.move(tmp.toPath, java.nio.file.Paths.get(path),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      moved = true
    } finally if (!moved) tmp.delete()
  }

  private def writeTx(path: String, rows: Seq[Tx], withTpv: Boolean): Unit = {
    val header = graft.model.ReferenceSchemas.transactionsCsvHeader
      .filter(h => withTpv || h != "Numero_TPV")
    atomically(path) { f =>
    val pw = new PrintWriter(f, "UTF-8")
    try {
      pw.println(header.mkString("|"))
      rows.foreach { t =>
        // each file spells missing values its own way — data1 empty,
        // data2 'na'/'-', data3 '#NO VALUE' — the raw-token zoo the
        // placeholder-mining operator (Validate.discoverPlaceholders)
        // must rediscover
        val tok =
          if (path.endsWith("data3.csv")) "#NO VALUE"
          else if (path.endsWith("data2.csv")) "na"
          else ""
        val tok2 = if (path.endsWith("data2.csv")) "-" else tok
        def s(o: Option[String]): String = o.getOrElse(tok)
        def s2(o: Option[String]): String = o.getOrElse(tok2)
        val noVal = path.endsWith("data3.csv")
        val cells = Seq(
          t.pdv) ++ (if (withTpv) Seq(s(t.tpv)) else Nil) ++ Seq(
          t.tid, t.date.toString, t.heure, t.typologie, s(t.fidelite),
          t.typeVente, s2(t.univers), s2(t.segment), s(t.famille),
          s(t.sousFamille), t.fedasNum, t.fedasLib, t.cible, t.ref,
          t.refLib, t.nps, t.qty.toString, fmt(t.ht),
          t.ttc.map(fmt).getOrElse(if (noVal) "#NO VALUE" else ""), fmt(t.marge))
        pw.println(cells.mkString("|"))
      }
    } finally pw.close()
    }
  }

  private def writeProducts(path: String, products: Map[String, Option[Boolean]]): Unit = {
    atomically(path) { f =>
    val pw = new PrintWriter(f, "UTF-8")
    try {
      pw.println("CODE_MODELE_COULEUR_ACTUEL|SIGNATURE_PRODUCT")
      products.toSeq.sortBy(_._1).foreach { case (k, v) =>
        pw.println(s"$k|${v.map(b => if (b) "1" else "0").getOrElse("")}")
      }
    } finally pw.close()
    }
  }
}
