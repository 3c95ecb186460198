package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only A/B: CONTAINS pair-dedup strategies on lineitem.
  * A = status-quo max(struct) grouped aggregate (physically a
  * SortAggregate: a struct agg buffer is not UnsafeRow-mutable, so
  * HashAggregateExec refuses it and the whole payload sorts).
  * B = dedup-by-exception: find duplicated (src,dst) pairs with a
  * narrow keys-only hash count, broadcast them, anti-join the clean
  * rows through untouched and re-aggregate only the duplicated ones.
  */
object ProfileDedupAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val keys = Seq("l_orderkey", "l_partkey")
    val props = Seq("l_quantity", "l_extendedprice")
    def selected = Tables.load(spark, sfDir, "lineitem")
      .select((keys ++ props).map(col): _*)
      .na.drop("any", keys)

    def viaSortAgg = selected
      .groupBy(keys.map(col): _*)
      .agg(max(struct(props.map(col): _*)).as("__s"))
      .select(keys.map(col) ++ props.map(p => col(s"__s.$p").as(p)): _*)

    def viaException = {
      val s = selected
      val dupKeys = s.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).drop("__n")
      val clean = s.join(broadcast(dupKeys), keys, "left_anti")
      val fixed = s.join(broadcast(dupKeys), keys, "left_semi")
        .groupBy(keys.map(col): _*)
        .agg(max(struct(props.map(col): _*)).as("__s"))
        .select(keys.map(col) ++ props.map(p => col(s"__s.$p").as(p)): _*)
      clean.unionByName(fixed)
    }

    val dups = t("dup pair count") {
      selected.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
    }
    println(s"duplicated pairs: $dups")
    (1 to 3).foreach { i =>
      t(s"A sort-agg count #$i") { viaSortAgg.count() }
      t(s"B exception count #$i") { viaException.count() }
    }
    // result equivalence
    val diff = viaSortAgg.exceptAll(viaException).count() +
      viaException.exceptAll(viaSortAgg).count()
    println(s"A/B row diff: $diff")
    spark.stop()
  }
}
