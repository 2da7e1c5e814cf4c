package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

case class KV(key: String, value: Long)

/** Typed exact top-k UDAF (SURVEY §2B "UDAF surface"): keeps the k largest
  * (value DESC, key ASC) pairs. The buffer is bounded at k entries, so the
  * partial-aggregate (map-side combine) state is O(k) per partition — the
  * whole aggregation ships k rows per partition regardless of input size,
  * which is what makes a global top-k cheap at 100 TB.
  */
class TopKAgg(k: Int) extends Aggregator[KV, Seq[KV], Seq[KV]] {
  private def trim(s: Seq[KV]): Seq[KV] =
    s.sortBy(kv => (-kv.value, kv.key)).take(k)

  override def zero: Seq[KV] = Nil
  override def reduce(b: Seq[KV], a: KV): Seq[KV] = trim(b :+ a)
  override def merge(x: Seq[KV], y: Seq[KV]): Seq[KV] = trim(x ++ y)
  override def finish(r: Seq[KV]): Seq[KV] = r
  override def bufferEncoder: Encoder[Seq[KV]] = ExpressionEncoder[Seq[KV]]()
  override def outputEncoder: Encoder[Seq[KV]] = ExpressionEncoder[Seq[KV]]()
}
