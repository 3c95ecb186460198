package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Statistics firewall for checkpointed loop frames.
  *
  * `Dataset.localCheckpoint`/`checkpoint` preserve the ORIGIN plan's
  * statistics into the resulting `LogicalRDD` (`originStats`) — the right
  * default for a user checkpointing mid-pipeline, but poison inside an
  * iterative loop: round k+1's join estimates MULTIPLY round k's
  * preserved `sizeInBytes`, so the BigInt's digit count grows
  * geometrically with the round number even though every round's plan is
  * shallow. Measured on the sf100 q33 contraction profile: levels 1-4 ran
  * in 4-14 s, level 5 took 69 s, and level 6+ pinned the driver
  * single-threaded inside `BigInteger.multiplyToomCook3` — the optimizer
  * doing thousand-digit arithmetic on meaningless size estimates. The
  * propagation loops pay the same tax at a slower exponent (their stats
  * digits grow linearly with round count), which contributed to the
  * measured 45 → 705 s per-round drift in the pointer-jump profile.
  *
  * The firewall rebuilds the checkpoint's `LogicalRDD` with explicit
  * statistics — the caller's (row count × row width) when known, else the
  * session's `defaultSizeInBytes` (what a stats-less leaf would report) —
  * so loop-frame estimates stay O(1) digits no matter how many rounds
  * compound them. Planner behavior is otherwise unchanged: the inherited
  * estimates after a few rounds were astronomically large, so both before
  * and after the firewall a loop frame never looks broadcastable unless
  * the caller supplies real row counts.
  *
  * This file lives under `org.apache.spark.sql` for `private[sql]` access
  * to `Dataset.ofRows` and the `LogicalRDD` constructor — the same bridge
  * pattern Delta Lake and other Spark libraries use for gaps the public
  * API does not cover. Pinned to the Spark 4.1 `LogicalRDD` shape
  * (curried constructor with `originStats`/`originConstraints`); a Spark
  * upgrade that changes it fails loudly at compile time, not silently.
  */
object StatsFirewall {

  /** Rebuild a just-checkpointed frame's `LogicalRDD` with bounded stats.
    * `rows < 0` means unknown — the frame reports `defaultSizeInBytes`.
    * No-op (returns the input) on any other plan shape, so callers can
    * apply it unconditionally after a cut.
    */
  def rebound(df: DataFrame, rows: Long = -1L, bytesPerRow: Int = 64): DataFrame =
    df.queryExecution.logical match {
      case l: LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[SparkSession]
        val stats =
          if (rows < 0L) Statistics(sizeInBytes = spark.sessionState.conf.defaultSizeInBytes)
          else Statistics(sizeInBytes = BigInt(math.max(rows, 1L)) * bytesPerRow,
            rowCount = Some(BigInt(rows)))
        Dataset.ofRows(spark, l.copy()(spark, Some(stats), None))
      case _ => df
    }
}
