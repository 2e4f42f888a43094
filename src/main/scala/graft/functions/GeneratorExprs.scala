package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a custom Catalyst GENERATOR: emits one
  * `(pos, shingle)` output row per sliding window, LAZILY — the window at
  * position k is built only when the downstream operator pulls row k.
  *
  * This is the streaming twin of [[WordShinglesExpr]] (which materializes
  * the full `array<string>` of windows before `explode` re-expands it): for
  * a document of T tokens the array form holds all T−n+1 windows (≈ n× the
  * document text) in memory at once per row, while the generator holds ONE
  * window — the difference between "fits" and "OOM" when shingling
  * 100 MB-scale documents on a 1000-executor cluster. `GenerateExec`
  * consumes `eval`'s iterator incrementally, so peak memory per row is
  * O(T) for the token array (unavoidable: the input array is already
  * materialized) + O(n) for the window, never O(T·n).
  *
  * Semantics match [[WordShingles.compute]] exactly (proved in
  * GeneratorSpec): a document shorter than n tokens yields its single
  * whole-document gram at pos 0; a NULL token array yields no rows (explode
  * semantics). Output order is position order, and `pos` makes the output
  * a deterministic set regardless of partitioning.
  *
  * Reference scope note: the reference's polars layer REJECTS all
  * row-expanding expressions (`dsl/translate.py:564` — no Gather/explode
  * surface); shingling there happens host-side in Python. This Generator is
  * the Spark-native mechanism for the same job, and completes the
  * extension-mechanism set demonstrated by the library: scalar codegen
  * Expression (HashExprs), DeclarativeAggregate (GraftProduct), typed
  * Aggregator (TopKAgg), imperative sketch fold (MinHashSignatureExpr),
  * optimizer Rule (RangeJoinRewrite), and now a Generator.
  */
case class ShingleExplodeExpr(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n > 0, s"shingle size must be positive: $n")

  private val Space = UTF8String.fromString(" ")

  override def prettyName: String = "graft_shingle_explode"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_explode expects array<string>, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val numToks = arr.numElements()
      // one defensive copy of the token refs: ArrayData may be an unsafe
      // buffer whose backing row is reused by the caller between pulls
      val toks = new Array[UTF8String](numToks)
      var i = 0
      while (i < numToks) {
        toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).clone()
        i += 1
      }
      if (numToks < n) {
        Iterator.single(InternalRow(0, UTF8String.concatWs(Space, toks: _*)))
      } else {
        val m = numToks - n + 1
        new Iterator[InternalRow] {
          private var k = 0
          private val win = new Array[UTF8String](n)
          override def hasNext: Boolean = k < m
          override def next(): InternalRow = {
            System.arraycopy(toks, k, win, 0, n)
            val row = InternalRow(k, UTF8String.concatWs(Space, win: _*))
            k += 1
            row
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleExplodeExpr =
    copy(child = newChild)
}
