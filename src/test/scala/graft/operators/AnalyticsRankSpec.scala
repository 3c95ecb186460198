package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins q20's adaptive global-ranking strategies row-identical (r18
  * optimization round): the unpartitioned-window path (the small-n
  * strategy) vs the distributed range-sort + zipWithIndex path (the
  * 100 TB strategy — an unpartitioned window moves every row into one
  * task). Exercised by forcing the cap, since the distributed path only
  * runs above 5M rows in production.
  */
class AnalyticsRankSpec extends SparkSpec {

  import spark.implicits._

  private def pcOf(rows: Seq[(Long, Long)]) =
    rows.toDF("o_custkey", "cnt").repartition(4)

  private def both(rows: Seq[(Long, Long)]): (Seq[String], Seq[String]) = {
    val pc = pcOf(rows)
    def render(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("o_custkey").collect().map { r =>
        f"${r.getLong(0)}|${r.getLong(1)}|${r.getInt(2)}|${r.getDouble(3)}%.12f"
      }.toSeq
    (render(AnalyticQueries.quartileRank(pc, Long.MaxValue)), // window path
      render(AnalyticQueries.quartileRank(pc, 0L))) // distributed path
  }

  test("distributed global rank equals the window on n % 4 == 0") {
    val rows = (1L to 40L).map(i => (i, (i * 7) % 13))
    val (w, d) = both(rows)
    assert(w == d)
  }

  test("distributed global rank equals the window on uneven buckets and ties in cnt") {
    // duplicate cnt values force the o_custkey tiebreak; n = 10 → ntile
    // buckets of 3,3,2,2
    val rows = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 2L), (5L, 2L),
      (6L, 9L), (7L, 1L), (8L, 1L), (9L, 1L), (10L, 7L))
    val (w, d) = both(rows)
    assert(w == d)
  }

  test("distributed global rank handles tiny frames (n < k, n == 1)") {
    for (n <- Seq(1, 2, 3)) {
      val rows = (1L to n.toLong).map(i => (i, i * 3))
      val (w, d) = both(rows)
      assert(w == d, s"mismatch at n=$n")
    }
  }
}
