package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnalyticQueries, CypherQueries, GraphQueries, PipelineQueries, RelationalQueries, StreamAnalogQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator coverage map (one entry per implemented operator
  * from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 — the reference's full
    * pipeline in one call: build the property graph from the relational
    * tables, then run its revenue-per-year query shape
    * (final/experimenting_new/notebook1.ipynb:844) through the
    * Cypher-subset compiler: 1-hop Order→Part traversal, per-year grouped
    * revenue aggregate, ordered.
    */
  def entry(spark: SparkSession): DataFrame =
    Graft.fromParquet(spark, "/root/testdata/sf0.001").build().query(
      """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
        WITH year(o.o_orderdate) AS order_year,
             sum(l.l_extendedprice * l.l_quantity) AS revenue
        RETURN order_year, revenue ORDER BY order_year""")

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
