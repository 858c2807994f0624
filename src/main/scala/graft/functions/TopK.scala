package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored item entering / leaving the top-k aggregation. */
case class TopHit(value: Double, id: Long)

/** Bounded top-k as a typed Aggregator: each partition keeps only its k
  * best hits in the aggregation buffer, so the shuffle moves at most k
  * rows per group per partition instead of every row — the
  * map-side-combine alternative to window row_number top-n, which shuffles
  * and sorts full groups (SURVEY §2.13: "TypedImperativeAggregate top-k
  * buffer if section counts explode"). At 100 TB this is the difference
  * between shuffling k·partitions rows and shuffling the corpus.
  *
  * Ordering: descending value, ascending id tie-break; output sorted.
  */
class TopKAggregator(k: Int)
  extends Aggregator[TopHit, List[TopHit], Seq[TopHit]] {

  private val ord: Ordering[TopHit] = Ordering.by(h => (-h.value, h.id))

  override def zero: List[TopHit] = Nil

  private def trim(xs: List[TopHit]): List[TopHit] = xs.sorted(ord).take(k)

  override def reduce(buf: List[TopHit], a: TopHit): List[TopHit] =
    trim(a :: buf)

  override def merge(b1: List[TopHit], b2: List[TopHit]): List[TopHit] =
    trim(b1 ::: b2)

  override def finish(r: List[TopHit]): Seq[TopHit] = r.sorted(ord)

  override def bufferEncoder: Encoder[List[TopHit]] =
    Encoders.kryo[List[TopHit]] // opaque partial state, never user-visible

  override def outputEncoder: Encoder[Seq[TopHit]] =
    ExpressionEncoder[Seq[TopHit]]()
}
