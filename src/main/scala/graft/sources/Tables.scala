package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet-backed table loading for the engine's test/bench datasets.
  *
  * The reference discovers tables from `sqlite_master` and re-reads per-table
  * CSVs (reference: final/sqlite_to_csv.py:25-38, final/inject_node.py:372-376).
  * Our native interchange format is Parquet (columnar, splittable, predicate
  * pushdown + column pruning reach the scan), with CSV kept as a compatible
  * source/sink in [[graft.sources.Csv]].
  */
object Tables {
  /** Core relational tables (TPC-H-ish star schema) present at every SF. */
  val core: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events")

  /** Extension tables for the LLM-data-pipeline operators. */
  val ext: Seq[String] = Seq("documents", "embeddings")

  val all: Seq[String] = core ++ ext

  /** Timestamp columns stored as INT64 TIMESTAMP(NANOS) in the testdata
    * parquet. Spark has no nanosecond timestamp type, so we read them as
    * raw nanos (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
    * microseconds — the same truncation DuckDB applies, keeping engine and
    * oracle aligned.
    */
  private val nanoTsCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts"))

  /** Load one table from `dir` (a `/root/testdata/sfX` style directory). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    nanoTsCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.schema.fieldNames.contains(c) && df.schema(c).dataType == LongType)
        df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      else df
    }
  }

  /** Register every table as a temp view so `spark.sql` queries mirror the
    * DuckDB oracle text 1:1.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")
}
