package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric array columns as a native Catalyst expression.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * evaluates higher-order lambdas per element with boxing — the hot path of
  * similarity search (millions of pairs × vector dim) is exactly where that
  * hurts. This expression is a primitive loop over the two ArrayData buffers:
  * no allocation, no boxing, and `doGenCode` emits the same loop for
  * whole-stage codegen.
  *
  * Accepts array<float> / array<double> on either side (mixed OK); null if
  * either array is null; lengths must match.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"graft_dot expects array<float|double>, got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n, s"graft_dot: length mismatch $n vs ${b.numElements()}")
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two array<int> columns (int8-quantized embedding codes) as
  * a 64-bit integer — EXACT, unlike the float path, so quantized similarity
  * scores are bit-reproducible in any engine. Same primitive-loop/codegen
  * shape as [[DotProduct]]; products are accumulated in long (max |code| 127
  * over any realistic dim is far below overflow).
  */
case class IntDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_dot_int"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  // deferred like DotProduct.elemIsFloat: children may be unresolved at
  // construction time during analysis
  private lazy val checked: Boolean = {
    Seq(left, right).foreach(e => e.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => ()
      case other => throw new IllegalArgumentException(
        s"graft_dot_int expects array<int>, got $other")
    })
    true
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    require(checked)
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n, s"graft_dot_int: length mismatch $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    require(checked)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot_int: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((long) $a.getInt($i)) * $b.getInt($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}
