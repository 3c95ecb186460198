package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev aid: formatted physical plans + a quick plan-quality scorecard for
  * selected queries (all queries when no args given). Greps each plan for
  * the properties that matter at scale: parquet filter pushdown, column
  * pruning, broadcast joins, whole-stage codegen spans, and cartesian
  * products (which should never appear).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    val verbose = sys.env.contains("SPARK_GRAFT_EXPLAIN_FULL")
    wanted.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: UNKNOWN")
        case Some(fn) =>
          try {
            val df = fn(spark, dir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val scans = plan.linesIterator.count(_.contains("Scan parquet"))
            val pushed = plan.linesIterator.count(l =>
              l.contains("PushedFilters") && !l.contains("PushedFilters: []"))
            val bcast = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
            val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
            val cartesian = plan.linesIterator.count(l =>
              l.contains("CartesianProduct") || l.contains("BroadcastNestedLoopJoin"))
            // (whole-stage codegen spans only materialize in the executed
            // plan under AQE — not auditable statically here)
            val wideScans = plan.linesIterator.count(l =>
              l.contains("ReadSchema") && l.length > 400)
            println(f"== $name%-32s scans=$scans pushedFilterScans=$pushed bhj=$bcast smj=$smj cartesian=$cartesian wideScans=$wideScans")
            if (verbose) println(plan)
          } catch {
            case e: Exception => println(s"== $name: ERROR ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
