package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{AnalyticQueries, CypherQueries, GraphQueries, PipelineQueries, RelationalQueries, StreamAnalogQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator coverage map (one entry per implemented operator
  * from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 — the reference's
    * revenue-per-year shape (final/experimenting_new/notebook1.ipynb:844):
    * 1-hop graph traversal Order→LineItem with a grouped revenue aggregate.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val o = graft.sources.Tables.load(spark, dir, "orders")
    val d = DecimalType(18, 4)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(sum(col("l_extendedprice").cast(d) * (lit(BigDecimal(1)).cast(d) - col("l_discount").cast(d)))
        .cast(d).as("revenue"))
      .orderBy("order_year")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ AnalyticQueries.defs ++ GraphQueries.defs ++
      StreamAnalogQueries.defs ++ TextQueries.defs ++ PipelineQueries.defs ++
      CypherQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ AnalyticQueries.oracle ++ GraphQueries.oracle ++
      StreamAnalogQueries.oracle ++ TextQueries.oracle ++ PipelineQueries.oracle ++
      CypherQueries.oracle
}
