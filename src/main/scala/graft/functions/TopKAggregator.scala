package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed Aggregator (UDAF): keeps at most k
  * (score, id) pairs in the buffer, so per-group state is O(k) however
  * large the group — the scale-safe alternative to sorting whole groups
  * or windowing when only the top handful is wanted. Merge is
  * associative/commutative, so partial aggregation (map-side combine)
  * applies and the shuffle carries only k pairs per group per mapper.
  *
  * Ties break on lower id, making output deterministic.
  */
case class Scored(score: Double, id: Long)

class TopKAggregator(k: Int) extends Aggregator[Scored, List[Scored], Seq[Long]] {
  override def zero: List[Scored] = Nil

  private def insert(buf: List[Scored], s: Scored): List[Scored] = {
    val merged = (s :: buf).sortBy(x => (-x.score, x.id))
    if (merged.size > k) merged.take(k) else merged
  }

  override def reduce(buf: List[Scored], in: Scored): List[Scored] = insert(buf, in)

  override def merge(a: List[Scored], b: List[Scored]): List[Scored] = {
    val merged = (a ++ b).sortBy(x => (-x.score, x.id))
    if (merged.size > k) merged.take(k) else merged
  }

  override def finish(buf: List[Scored]): Seq[Long] = buf.map(_.id)

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
