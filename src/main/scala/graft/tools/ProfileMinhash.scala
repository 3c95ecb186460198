package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup
import graft.sources.Tables

/** Dev aid (r17): per-stage wall times + bucket-size distribution for the
  * MinHash LSH pipeline under an explicit band plan — the attribution tool
  * for the q47 scale work. Usage:
  *   tools/run.sh graft.tools.ProfileMinhash <sfDir> <k> <bands> [stages...]
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(64)
    val bands = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val s = System.nanoTime
      val n = f
      println(f"$name%-16s ${(System.nanoTime - s) / 1e9}%7.2f s  ($n)")
    }
    val docs = Tables.load(spark, dir, "documents")
    println(s"plan: k=$k bands=$bands rows/band=${k / bands}")
    t("read")(docs.count)
    t("signatures")(Dedup.minhashSignatures(docs, "doc_id", "text", k).count)
    t("buckets")(Dedup.lshBuckets(docs, "doc_id", "text", k, bands).count)
    t("bucket-dist") {
      val d = Dedup.lshBuckets(docs, "doc_id", "text", k, bands)
        .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("buckets"),
          max(col("n")).as("max"),
          sum(when(col("n") > 1, col("n") * (col("n") - 1) / 2)).as("pairs_uncapped"),
          sum(when(col("n") > 256, 1).otherwise(0)).as("over_cap"),
          sum(when(col("n") > 1, 1).otherwise(0)).as("multi"))
        .collect()(0)
      d.toString
    }
    t("candidates")(Dedup.minhashCandidates(docs, "doc_id", "text", k, bands).count)
    spark.stop()
  }
}
