package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** MinHash signature over a shingle-hash array, per ROW:
  * `array<long> → array<long>(k)` where
  * `out[i] = MIN over shingles h of xxhash64(i, h)` — bit-identical to
  * Spark's `min(xxhash64(lit(i), col("h")))` per-column aggregate shape
  * (seed i's remix is `XXH64.hashLong(h, XXH64.hashInt(i, 42))`, the
  * exact chain the built-in `xxhash64(int, long)` evaluates; duplicate
  * shingles can't move a MIN, and a NULL element folds the bare seed
  * remix `XXH64.hashInt(i, 42)` into the min — `xxhash64` skips a null
  * child, so the aggregate shape's `xxhash64(lit(i), null)` row
  * contributed exactly that value, never a null the `min` would drop;
  * ADVICE r17 caught the first cut of this kernel skipping nulls
  * instead, a divergence unreachable through [[ShingleHashes3]]
  * (containsNull=false) but latent for any SQL-registered caller).
  * An empty input array yields an EMPTY output array —
  * consumers filter it, matching the old explode shape where a
  * shingle-less doc simply produced no signature row.
  *
  * Why a per-row expression and not an aggregate (r17): a document's
  * shingle hashes are already adjacent inside the [[ShingleHashes3]]
  * array, so the k mins are computable where the data sits — the
  * explode + k-min-columns aggregate shape paid a 250M-row shuffle at
  * sf100 just to regroup rows that started grouped, and past k≈100 min
  * columns it fell out of whole-stage codegen entirely
  * (`spark.sql.codegen.maxFields`), degrading to the interpreted
  * MutableProjection path — measured >10 min for the k=160 signature
  * stage at sf100 vs ~19 s for the scan itself. This kernel keeps the
  * whole signature computation inside one codegen'd projection: zero
  * exchanges, O(shingles × k) tight-loop work per document, and k can
  * follow [[graft.pipeline.Dedup.bandPlan]] without a physical-plan
  * cliff. A TypedImperativeAggregate sketch was considered and rejected:
  * it still shuffles rows and ObjectHashAggregate's 128-group fallback
  * threshold degrades the partial phase to a sort at any real doc count.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"minhash signature width must be >= 1 (got $k)")

  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> shingle hashes, got ${other.catalogString}")
  }

  /** Per-seed remix seeds: `xxhash64`'s int-child chain at default seed 42. */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val x = XXH64.hashLong(h, seeds(j))
          if (x < out(j)) out(j) = x
          j += 1
        }
      } else {
        // xxhash64 skips a null child: the aggregate shape's row is the
        // bare seed remix, which participates in the min (class doc).
        var j = 0
        while (j < k) {
          if (seeds(j) < out(j)) out(j) = seeds(j)
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val unsafeArr = classOf[UnsafeArrayData].getName
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      s"""
        final int $m = $arr.numElements();
        final long[] $out = new long[$m == 0 ? 0 : $k];
        java.util.Arrays.fill($out, Long.MAX_VALUE);
        for (int $i = 0; $i < $m; $i++) {
          if (!$arr.isNullAt($i)) {
            final long $h = $arr.getLong($i);
            for (int $j = 0; $j < $k; $j++) {
              final long $x = $xxh.hashLong($h, $seedsRef[$j]);
              if ($x < $out[$j]) $out[$j] = $x;
            }
          } else {
            for (int $j = 0; $j < $k; $j++) {
              if ($seedsRef[$j] < $out[$j]) $out[$j] = $seedsRef[$j];
            }
          }
        }
        ${ev.value} = $unsafeArr.fromPrimitiveArray($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
