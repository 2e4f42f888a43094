package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` top-k — the third Spark aggregate-extension mechanism
  * demonstrated in graft (alongside the native DeclarativeAggregate
  * [[graft.functions.GraftProduct]] and composed built-ins): bounded
  * per-group top-k as a MAP-SIDE-COMBINABLE aggregate.
  *
  * vs the window route (`Sorts.topKPerGroup`, q77): a ranking window sorts
  * every group's rows after the shuffle; this aggregate keeps a ≤k buffer
  * per group per partition and merges buffers — O(n log k) work, k-row
  * partial state on the map side, no per-group sort of the full data. The
  * right shape when k ≪ group size at 100 TB. (Spark's own
  * WindowGroupLimit recovers part of this for ranking windows; the
  * Aggregator form also works inside `agg`/`cube`/`rollup` where windows
  * can't go.)
  *
  * Ordering: (value DESC, id ASC) — a total order, so results are
  * partition-invariant; ties beyond position k cut deterministically.
  */
case class TopKIn(v: Long, id: Long)
case class TopKBuf(items: Seq[TopKIn])

class TopKAgg(k: Int) extends Aggregator[TopKIn, TopKBuf, Seq[TopKIn]] {

  private def order(a: TopKIn, b: TopKIn): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  private def trim(items: Seq[TopKIn]): Seq[TopKIn] =
    items.sortWith(order).take(k)

  override def zero: TopKBuf = TopKBuf(Seq.empty)
  override def reduce(b: TopKBuf, in: TopKIn): TopKBuf =
    TopKBuf(trim(b.items :+ in))
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf(trim(a.items ++ b.items))
  override def finish(b: TopKBuf): Seq[TopKIn] = trim(b.items)

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[TopKIn]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKIn]]()
}

object TopKAgg {
  /** Column-API form: `topK(3)(valueCol, idCol)` → `array<struct<v,id>>`. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[TopKIn])
    (v, id) => fn(v, id)
  }
}
