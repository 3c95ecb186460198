package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the property q81 relies on: a join of two tables bucketed on the
  * join key runs with NO exchange on either side, and bucketing never
  * changes the data.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed join plans without any exchange and matches the plain join") {
    val base = java.nio.file.Files.createTempDirectory("graft_bspec").toString
    val orders = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderstatus")
    val lineitem = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    Bucketing.saveBucketed(orders, "bs_orders", s"$base/o", 4, Seq("o_orderkey"))
    Bucketing.saveBucketed(lineitem, "bs_lineitem", s"$base/l", 4, Seq("l_orderkey"))

    // disable broadcast so the join must be a merge join — the shape where
    // bucketing either elides the shuffle or doesn't
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val bucketed = spark.table("bs_orders")
        .join(spark.table("bs_lineitem"), col("o_orderkey") === col("l_orderkey"))
      val got = bucketed.collect()
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")

      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      assert(got.length == plain.count())
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(r.fieldIndex("o_orderkey")), r.getLong(r.fieldIndex("l_orderkey")),
          r.getString(r.fieldIndex("o_orderstatus")))
      assert(got.map(key).sorted.toSeq ==
        plain.collect().map(key).sorted.toSeq)
    } finally spark.conf.set(thresholdKey, prev)
  }

  test("bucketed single-table aggregation on the bucket key also skips the shuffle") {
    // bucketing benefits groupBy on the key too: the partitioning is already
    // what the aggregate needs
    val agg = spark.table("bs_lineitem").groupBy("l_orderkey")
      .agg(count(lit(1)).as("cnt"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed aggregation still shuffles:\n$plan")
  }

  test("q81 registry entry returns the oracle-shaped summary") {
    val df = graft.operators.RelationalQueries.defs("q81_bucketed_join")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("o_orderstatus", "cnt", "sum_qty"))
  }
}
