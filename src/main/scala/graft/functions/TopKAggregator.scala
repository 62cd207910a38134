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

  // buffer invariant: sorted by (score desc, id asc), length ≤ k
  private def beats(x: Scored, y: Scored): Boolean =
    x.score > y.score || (x.score == y.score && x.id < y.id)

  /** O(k) sorted insertion with an O(1) reject of rows that can't make
    * the cut — no per-row sort on the billion-row hot path.
    */
  private def insert(buf: List[Scored], s: Scored): List[Scored] = {
    if (buf.sizeIs >= k && !beats(s, buf.last)) return buf
    val (before, after) = buf.span(beats(_, s))
    val merged = before ::: s :: after
    if (merged.sizeIs > k) merged.take(k) else merged
  }

  override def reduce(buf: List[Scored], in: Scored): List[Scored] = insert(buf, in)

  /** Classic merge of two sorted buffers, truncated at k. */
  override def merge(a: List[Scored], b: List[Scored]): List[Scored] = {
    def go(x: List[Scored], y: List[Scored], n: Int): List[Scored] =
      if (n == 0) Nil
      else (x, y) match {
        case (Nil, ys) => ys.take(n)
        case (xs, Nil) => xs.take(n)
        case (xh :: xt, yh :: yt) =>
          if (beats(xh, yh)) xh :: go(xt, y, n - 1) else yh :: go(x, yt, n - 1)
      }
    go(a, b, k)
  }

  override def finish(buf: List[Scored]): Seq[Long] = buf.map(_.id)

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
