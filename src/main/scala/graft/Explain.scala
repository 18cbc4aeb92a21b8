package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of each headline
  * query so shuffle counts, broadcast decisions, and pushed filters can
  * be reviewed (the 100 TB sanity check: is the join broadcast? is the
  * filter pushed to the scan? how many exchanges?). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    val spark = Session.get("graft-explain")
    names.foreach { n =>
      println(s"\n=================== $n ===================")
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
