package graft.sources

import graft.SparkSpec

/** The second query front-end (SURVEY.md §3.1): plain Spark SQL over
  * registered table views — oracle SQL text runs as-is.
  */
class SqlFrontendSpec extends SparkSpec {

  test("registerAll lets oracle-dialect SQL run unchanged") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val rows = spark.sql(
      """SELECT r_name, COUNT(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).sum == spark.table("customer").count())
  }
}
