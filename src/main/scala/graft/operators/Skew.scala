package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) handling helpers — the engine-side analogue of the
  * reference's contention-aware chunking, which isolates its top-5
  * hottest keys into dedicated micro-batches (reference:
  * final/inject_relationship.py:154-337). Spark's AQE skew-join splitting
  * covers most cases; these helpers cover the extreme-hot-key cases AQE
  * can't: a single key too big for one task's aggregation state, or a
  * skewed join where the build side can be replicated (SURVEY.md §4 R2).
  */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on (key, salt) —
    * spreading one hot key over `salts` reducers — then final aggregate on
    * key. `partialAgg` must be decomposable (count/sum/min/max); the caller
    * supplies both phases explicitly so the types stay honest.
    *
    * Example — skew-proof counts:
    * {{{
    * Skew.saltedAgg(df, Seq(col("k")), 32,
    *   partial = Seq(count(lit(1)).as("c")),
    *   finalAgg = Seq(sum(col("c")).as("cnt")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salts: Int,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys: _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a small-enough right side:
    * each left row gets a random salt in [0, salts); the right side is
    * replicated once per salt value, so one hot join key spreads across
    * `salts` tasks instead of landing on one. Right side grows `salts`×,
    * so use only when `small` is broadcast-scale or salts is modest.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
