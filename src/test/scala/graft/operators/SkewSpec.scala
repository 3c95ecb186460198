package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedAgg equals plain aggregation on skewed keys") {
    // one hot key (90% of rows) + a long tail
    val rows = Seq.fill(900)(("hot", 1L)) ++ (1 to 100).map(i => (s"k$i", i.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedAgg(df, Seq(col("k")), salts = 16,
        partial = Seq(count(lit(1)).as("c"), sum(col("v")).as("s")),
        finalAgg = Seq(sum(col("c")).as("cnt"), sum(col("s")).as("total")))
      .orderBy("k").collect()
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
      .orderBy("k").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin equals plain join, spreading the hot key") {
    val big = (Seq.fill(500)(("hot", "x")) ++ (1 to 50).map(i => (s"k$i", s"v$i")))
      .toDF("k", "payload").repartition(8)
    val small = (Seq(("hot", 99L)) ++ (1 to 50).map(i => (s"k$i", i.toLong)))
      .toDF("k", "dim")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum("dim").as("s"))
      .orderBy("k").collect()
    val plain = big.join(small, "k")
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum("dim").as("s"))
      .orderBy("k").collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
