package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Distributed sort with the reference's surface:
  * `sort(tbl, keys, sort_ascending[], nulls_at_end, stable, limit)`
  * (sort.hpp:76-81).
  *
  * The reference implements a sample sort (local sort → split candidates →
  * all-to-all → local merge, cpp/src/sort.cpp:106-294); Spark's
  * `RangePartitioning` + `SortExec` is the same algorithm (reservoir-sampled
  * range partitioner), and `sort+limit` is rewritten by Catalyst to a top-k
  * `TakeOrderedAndProjectExec` — the local-limit-before-shuffle optimization the
  * reference applies by hand (sort.cpp:296-308).
  *
  * Limit semantics follow the reference: positive = head, negative = tail
  * (sort.cpp:425-432). Tail is computed by sorting in reverse, taking |limit|,
  * and re-sorting the (now tiny) result — both sorts are top-k plans.
  */
object Sorts {

  def sort(
      df: DataFrame,
      keys: Seq[String],
      ascending: Seq[Boolean],
      nullsAtEnd: Boolean = true,
      limit: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty && keys.length == ascending.length, "keys/ascending mismatch")
    // Spark's limit takes Int — a silent .toInt past 2^31 wraps negative and
    // corrupts the result (same guard as SetOps.slice)
    limit.foreach(n => require(n >= -Int.MaxValue.toLong && n <= Int.MaxValue.toLong,
      s"|limit|=$n exceeds Int range: Spark's limit is Int-typed"))
    val order = orderCols(keys, ascending, nullsAtEnd)
    limit match {
      case None => df.orderBy(order: _*)
      case Some(n) if n >= 0 => df.orderBy(order: _*).limit(n.toInt)
      case Some(n) => // tail: reverse order, take |n|, restore order
        val rev = orderCols(keys, ascending.map(!_), !nullsAtEnd)
        df.orderBy(rev: _*).limit((-n).toInt).orderBy(order: _*)
    }
  }

  /** Per-group top-k (beyond the reference's global sort+limit): the k best
    * rows per group by `ordering` — "k highest-quality documents per domain",
    * the selection primitive of training-data curation.
    *
    * `rank` semantics: "row" = exactly k rows (ties broken by ordering
    * position), "rank" = ties share a rank and all rank<=k rows survive
    * (can exceed k). Implemented as a ranking window + filter: ONE shuffle
    * on the group keys, and Spark's WindowGroupLimit pushes the limit into
    * the pre-shuffle local sort (partial top-k on the map side, like the
    * global TakeOrderedAndProject) — no group ever needs more than its top
    * k rows in one place.
    */
  def topKPerGroup(
      df: DataFrame,
      groupKeys: Seq[String],
      ordering: Seq[Column],
      k: Int,
      rank: String = "row"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{rank => rnk, row_number}
    val w = Window.partitionBy(groupKeys.map(col): _*).orderBy(ordering: _*)
    val fn = rank match {
      case "row" => row_number()
      case "rank" => rnk()
      case other => throw new IllegalArgumentException(s"unsupported rank kind: $other")
    }
    df.withColumn("__graft_rn", fn.over(w))
      .filter(col("__graft_rn") <= k)
      .drop("__graft_rn")
  }

  private[operators] def orderCols(
      keys: Seq[String],
      ascending: Seq[Boolean],
      nullsAtEnd: Boolean): Seq[Column] =
    keys.zip(ascending).map { case (k, asc) =>
      (asc, nullsAtEnd) match {
        case (true, true) => col(k).asc_nulls_last
        case (true, false) => col(k).asc_nulls_first
        case (false, true) => col(k).desc_nulls_last
        case (false, false) => col(k).desc_nulls_first
      }
    }
}
