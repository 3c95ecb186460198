package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup
import graft.sources.Tables

/** Dev aid: stage-by-stage wall times for the SimHash near-dup pipeline
  * (q48), mirroring [[ProfileDedup]] for the MinHash path.
  */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      println(f"$name%-16s ${(System.nanoTime - s) / 1e9}%6.2f s  ($n rows)")
    }
    val docs = Tables.load(spark, dir, "documents")
    t("read")(docs.count)
    t("sigs")(Dedup.simhashDf(docs, "doc_id", "text").count)
    val ck = Dedup.simhashDf(docs, "doc_id", "text")
    t("sigs-ckpt") { val c = ck.localCheckpoint(true); c.count }
    val sigsAll = Dedup.simhashDf(docs, "doc_id", "text").localCheckpoint(true)
    t("cands")(Dedup.simhashCandidatesFromSigs(sigsAll, maxHamming = 16).count)
    t("cands-ckpt") {
      Dedup.simhashCandidatesFromSigs(sigsAll, maxHamming = 16)
        .localCheckpoint(true).count
    }
    t("q48-full")(graft.operators.PipelineQueries.defs("q48_simhash_neardup")(spark, dir).count)
    t("q48-again")(graft.operators.PipelineQueries.defs("q48_simhash_neardup")(spark, dir).count)
    spark.stop()
  }
}
