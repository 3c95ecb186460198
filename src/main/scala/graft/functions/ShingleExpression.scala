package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 3-gram shingle hashes over a token array, as ONE native codegen'd
  * kernel: `array<string> → array<long>` where
  * `out[j] = xxhash64(xxhash64(t[j]), xxhash64(t[j+1]), xxhash64(t[j+2]))`
  * — byte-for-byte the hash chain Spark's `xxhash64` builds (per-token
  * XXH64 over UTF-8 bytes at seed 42, then the three token hashes chained
  * long-wise), with docs shorter than 3 tokens contributing one
  * zero-padded partial shingle. Pinned bit-identical to the r15
  * window-lead shape by DedupSpec.
  *
  * Why an expression and not a reshape of the query: consecutive-token
  * access from ROWS needs a window sort — a full exchange of the token
  * stream (250M rows at sf100) before any shingle exists. Tokens are
  * already adjacent inside the split() array, but higher-order functions
  * (`transform`) run as CodegenFallback — measured 2× SLOWER than the
  * window at sf10 (23.3 s vs 11.6 s q47) because the lambda re-enters
  * interpreted eval per element. This kernel keeps the array-local shape
  * AND whole-stage codegen: a tight primitive loop, one long[] allocation
  * per document, zero exchanges until the signature aggregation.
  */
case class ShingleHashes3(child: Expression) extends UnaryExpression {

  import ShingleHashes3.EmptyTokenHash

  override def prettyName: String = "graft_shingle3"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      // Null elements hash as the empty string — the same value an
      // UnsafeArrayData null slot yields (zero offsetAndSize word), so
      // interpreted and codegen agree on array<string> with nulls.
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      th(i) =
        if (t == null) EmptyTokenHash
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      i += 1
    }
    val out =
      if (m >= 3) {
        val o = new Array[Long](m - 2)
        var j = 0
        while (j + 2 < m) {
          var s = XXH64.hashLong(th(j), 42L)
          s = XXH64.hashLong(th(j + 1), s)
          s = XXH64.hashLong(th(j + 2), s)
          o(j) = s
          j += 1
        }
        o
      } else if (m >= 1) {
        var s = XXH64.hashLong(th(0), 42L)
        s = XXH64.hashLong(if (m > 1) th(1) else 0L, s)
        s = XXH64.hashLong(0L, s)
        Array(s)
      } else Array.emptyLongArray
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val utf8 = classOf[UTF8String].getName
    val unsafeArr = classOf[UnsafeArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      s"""
        final int $m = $arr.numElements();
        final long[] $th = new long[$m];
        for (int $i = 0; $i < $m; $i++) {
          if ($arr.isNullAt($i)) {
            $th[$i] = ${EmptyTokenHash}L;
          } else {
            final $utf8 $t = $arr.getUTF8String($i);
            $th[$i] = $xxh.hashUnsafeBytes($t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42L);
          }
        }
        final long[] $out = new long[$m >= 3 ? $m - 2 : ($m >= 1 ? 1 : 0)];
        if ($m >= 3) {
          for (int $j = 0; $j + 2 < $m; $j++) {
            long $s = $xxh.hashLong($th[$j], 42L);
            $s = $xxh.hashLong($th[$j + 1], $s);
            $s = $xxh.hashLong($th[$j + 2], $s);
            $out[$j] = $s;
          }
        } else if ($m >= 1) {
          long $s = $xxh.hashLong($th[0], 42L);
          $s = $xxh.hashLong($m > 1 ? $th[1] : 0L, $s);
          $s = $xxh.hashLong(0L, $s);
          $out[0] = $s;
        }
        ${ev.value} = $unsafeArr.fromPrimitiveArray($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes3 =
    copy(child = newChild)
}

object ShingleHashes3 {
  /** XXH64 of zero bytes at seed 42 — what a null token hashes to (the
    * empty string), keeping interpreted eval identical to codegen over
    * UnsafeArrayData where a null slot reads as an empty UTF8String.
    */
  val EmptyTokenHash: Long = {
    val e = UTF8String.EMPTY_UTF8
    XXH64.hashUnsafeBytes(e.getBaseObject, e.getBaseOffset, e.numBytes, 42L)
  }
}
