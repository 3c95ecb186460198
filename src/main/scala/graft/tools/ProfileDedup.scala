package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup
import graft.sources.Tables

/** Dev aid: stage-by-stage wall times for the MinHash near-dup pipeline.
  * Stages run in order, so each timing includes JIT warmup only for code
  * paths the earlier stages didn't touch.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime
      val n = f
      println(f"$name%-12s ${(System.nanoTime - s) / 1e9}%6.2f s  ($n rows)")
    }
    val docs = Tables.load(spark, dir, "documents")
    t("read")(docs.count)
    t("tokens")(docs.select(explode(Dedup.tokensArr(col("text")))).count)
    t("shingles")(docs.select(explode(Dedup.shingles(col("text"), 3))).count)
    t("signatures")(Dedup.minhashSignatures(docs, "doc_id", "text", 64).count)
    t("buckets")(Dedup.lshBuckets(docs, "doc_id", "text", 64, 16).count)
    t("candidates")(Dedup.minhashCandidates(docs, "doc_id", "text").count)
    t("q47-full")(graft.operators.PipelineQueries.defs("q47_minhash_neardup")(spark, dir).count)
    t("q47-again")(graft.operators.PipelineQueries.defs("q47_minhash_neardup")(spark, dir).count)
    spark.stop()
  }
}
