package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: the (id, score) pair the ANN paths rank. */
case class Scored(id: Long, score: Double)

/** Typed top-k aggregator — the §2.11 aggregate-extension surface exercised
  * for real (SURVEY.md: "top-k heap for X5"). Keeps the k best candidates
  * by (score desc, id asc) in a sorted bounded buffer.
  *
  * Why an `Aggregator` and not the window row_number: the window shape
  * shuffles EVERY scored candidate to its query's partition before ranking
  * (|corpus| rows per query at 100 TB); this aggregator participates in
  * partial aggregation, so each map task forwards at most k rows per query
  * and the shuffle carries queries × k. The buffer is a k-element sorted
  * Vector (k is single digits here): insertion cost is a comparison against
  * the current worst in the common case, a k·log k re-sort when the
  * candidate belongs in the buffer.
  *
  * Ordering matches the window spec it replaces (`orderBy(cos.desc,
  * corpus_id)`): ties on score break toward the smaller id —
  * deterministic under any partitioning.
  */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] with Serializable {
  require(k >= 1, s"k must be >= 1 (got $k)")

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.length >= k && better(buf.last, a)) buf
    else ((buf :+ a).sortWith(better)).take(k)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
