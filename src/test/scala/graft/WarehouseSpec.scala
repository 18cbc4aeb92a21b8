package graft

import graft.sources.Warehouse
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("partitioned write prunes partitions on read") {
    val li = Tables.lineitem(spark, sf)
    val path = "/tmp/graft_test_wh_monthly"
    Warehouse.writeMonthlyTransactions(li, path)
    val wh = Warehouse.read(spark, path)
    assert(wh.count() === li.count())
    val pruned = wh.filter(col("sale_month") === "2001-06")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(sale_month"))
    assert(pruned.count() ===
      li.filter(date_format(col("l_shipdate"), "yyyy-MM") === "2001-06").count())
  }

  test("bucketed tables join without any shuffle (co-located join)") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val pa = Tables.part(spark, sf).select("p_partkey", "p_retailprice")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear both or CTAS refuses
    Seq("graft_li_b", "graft_pa_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft_test_warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Warehouse.writeBucketed(li, "graft_li_b", "l_partkey", 8, Some("l_partkey"))
    Warehouse.writeBucketed(pa, "graft_pa_b", "p_partkey", 8, Some("p_partkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join strategy question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_li_b")
        .join(spark.table("graft_pa_b"),
          col("l_partkey") === col("p_partkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected shuffle-free join:\n$plan")
      assert(joined.count() === li.count()) // every lineitem has its part
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
