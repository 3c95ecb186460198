package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev aid (round 12, r11 verdict directive #7): measured A/B of
  * [[graft.operators.Skew]] salting against Spark's own defenses (map-side
  * partial aggregation; AQE skew-join splitting) on a pathologically
  * Zipf-keyed fixture at sf1-class row counts.
  *
  * The fixture is generated, not read: `rows` ids map through a
  * deterministic xxhash64-derived uniform into an inverse-CDF Zipf
  * (pmf ∝ 1/k²), so the hottest key holds ~50% of all rows — far beyond
  * anything AQE's per-partition split factor sees in the TPC-H-ish
  * testdata, and reproducible without storing a fixture file.
  *
  * Measured shapes:
  *   - `agg`: groupBy(k).count + sum — decomposable, so partial
  *     aggregation should already neutralize the hot key; salting is
  *     expected to only add a shuffle's worth of overhead. Measured to
  *     DOCUMENT that, not to win.
  *   - `join`: the skewed fact against a 100k-row dim with broadcast
  *     DISABLED (modeling a dim too large to broadcast at the 100 TB
  *     tier) — sort-merge path. Three contenders: AQE skew-split on,
  *     AQE skew-split off, and [[graft.operators.Skew.saltedJoin]].
  *
  * Results → BASELINE.md round-12 skew table.
  */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "50000000").toLong
    val nKeys = 100000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // u in (0,1] from a deterministic hash; k = ceil(u^(-1/1)) capped:
    // P(k) ∝ 1/k² — k=1 takes ~50% of rows, k=2 ~17%, long 1/k² tail.
    def fact: DataFrame = spark.range(rows).select(
      least(ceil(lit(1.0) /
        ((pmod(xxhash64(col("id")), lit(1000000000L)) + 1) / lit(1.0e9))),
        lit(nKeys)).cast("long").as("k"),
      (col("id") % 997).as("v"))
    val dim = spark.range(1, nKeys + 1).select(
      col("id").as("k"), (col("id") * 31 % 1013).as("w"))

    def t(name: String)(f: => Long): Unit = {
      val s = System.nanoTime
      val n = f
      println(f"$name%-22s ${(System.nanoTime - s) / 1e9}%7.2f s  ($n rows)")
    }

    val hot = fact.groupBy("k").count().orderBy(desc("count")).limit(3)
      .collect().map(r => s"k=${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    println(s"fixture: $rows rows, $nKeys keys, top3 $hot")

    // -------------------------------------------------------------- agg
    t("agg_plain")(
      fact.groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s")).count())
    t("agg_salted")(
      graft.operators.Skew.saltedAgg(fact, Seq(col("k")), 32,
        partial = Seq(count(lit(1)).as("c"), sum(col("v")).as("s")),
        finalAgg = Seq(sum(col("c")).as("cnt"), sum(col("s")).as("sv"))).count())

    // ------------------------------------------------------------- join
    // broadcast off: the dim models one too large for the broadcast tier
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    def agg(df: DataFrame): Long =
      df.select(sum(col("v") * col("w"))).as[Option[Long]].head().getOrElse(0L)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t("join_smj_no_skewfix")(agg(fact.join(dim, "k")))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t("join_smj_aqe_skew")(agg(fact.join(dim, "k")))
    t("join_salted")(
      agg(graft.operators.Skew.saltedJoin(fact, dim, "k", 32)))
    // second round interleaved, JIT/page-cache warm
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t("join_smj_no_skewfix#2")(agg(fact.join(dim, "k")))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t("join_smj_aqe_skew#2")(agg(fact.join(dim, "k")))
    t("join_salted#2")(
      agg(graft.operators.Skew.saltedJoin(fact, dim, "k", 32)))

    spark.stop()
  }
}
