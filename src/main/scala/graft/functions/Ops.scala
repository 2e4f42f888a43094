package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Scalar expression surface (SURVEY §2.7): binary + unary ops by Arrow
  * compute name, cast, and both round modes. Everything maps to codegen'd
  * built-ins; null semantics (validity = AND of operands) and Kleene boolean
  * logic are Spark's native 3-valued logic.
  */
object Ops {

  /** `binary_operation(lhs, rhs, op, out_type)` (binaryop.hpp:80-83).
    * Scalar operands: pass `lit(x)` — Catalyst broadcasts literals implicitly
    * (the reference's col-scalar / scalar-col task flavors).
    */
  def binary(lhs: Column, rhs: Column, op: String): Column = op match {
    case "add" => lhs + rhs
    case "subtract" => lhs - rhs
    case "multiply" => lhs * rhs
    case "divide" => lhs / rhs
    case "true_divide" => lhs.cast("double") / rhs.cast("double")
    case "power" => pow(lhs, rhs)
    case "mod" => lhs % rhs
    case "bit_wise_and" => lhs.bitwiseAND(rhs)
    case "bit_wise_or" => lhs.bitwiseOR(rhs)
    case "bit_wise_xor" => lhs.bitwiseXOR(rhs)
    case "shift_left" => shiftleft(lhs, rhs) // rhs must be a literal int in Spark
    case "shift_right" => shiftright(lhs, rhs)
    case "logb" => log(rhs) / log(lhs) // log base lhs of rhs
    case "atan2" => atan2(lhs, rhs)
    case "equal" => lhs === rhs
    case "not_equal" => lhs =!= rhs
    case "greater" => lhs > rhs
    case "greater_equal" => lhs >= rhs
    case "less" => lhs < rhs
    case "less_equal" => lhs <= rhs
    // Spark's && / || ARE Kleene (SQL 3-valued) logic; the reference's
    // non-Kleene "and"/"or" differ only in the null-null case.
    case "and" | "and_kleene" => lhs && rhs
    case "or" | "or_kleene" => lhs || rhs
    case other => throw new IllegalArgumentException(s"unsupported binary op: $other")
  }

  /** Typed shift overloads — Spark's shiftleft/shiftright take the amount as
    * Int. `binary` reaches these by extracting the literal from the Column
    * via Catalyst (works for aliased/cast literals too, unlike string
    * parsing).
    */
  def shiftLeft(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.shiftleft(c, n)
  def shiftRight(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.shiftright(c, n)

  private def literalInt(n: Column, op: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Literal}
    // Column → resolved Expression via the public API: analyze a one-row
    // projection (plan-time only, nothing executes). Spark 4 removed
    // Column.expr from the public surface.
    // (a real column reference fails to resolve against range(1) — that's
    // exactly the non-literal case)
    val nExpr = scala.util.Try(
      org.apache.spark.sql.SparkSession.active.range(1).select(n)
        .queryExecution.analyzed.expressions.head
    ).getOrElse(throw new IllegalArgumentException(
      s"$op amount must be a literal int; or use Ops.shiftLeft/shiftRight(col, n: Int)"))
    def unwrap(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case Literal(v: Long, _) => Some(v.toInt)
      case Literal(v: Short, _) => Some(v.toInt)
      case Literal(v: Byte, _) => Some(v.toInt)
      case Alias(child, _) => unwrap(child)
      case c: Cast => unwrap(c.child)
      // unresolved non-literal trees can throw from foldable/eval — treat as
      // non-literal rather than erroring here
      case e => scala.util.Try(e.foldable).toOption.filter(identity)
        .flatMap(_ => scala.util.Try(e.eval()).toOption)
        .flatMap(Option(_)).collect {
          case v: Int => v
          case v: Long => v.toInt
        }
    }
    unwrap(nExpr).getOrElse(throw new IllegalArgumentException(
      s"$op amount must be a literal int (got ${nExpr.sql}); " +
        "or use Ops.shiftLeft/shiftRight(col, n: Int)"))
  }

  private def shiftleft(c: Column, n: Column): Column =
    shiftLeft(c, literalInt(n, "shift_left"))

  private def shiftright(c: Column, n: Column): Column =
    shiftRight(c, literalInt(n, "shift_right"))

  /** `unary_operation(col, op)` (unaryop.hpp:81; op map cpp/src/unaryop.cu:85-113). */
  def unary(c: Column, op: String): Column = op match {
    case "sin" => sin(c)
    case "cos" => cos(c)
    case "tan" => tan(c)
    case "asin" => asin(c)
    case "acos" => acos(c)
    case "atan" => atan(c)
    case "sinh" => sinh(c)
    case "cosh" => cosh(c)
    case "tanh" => tanh(c)
    case "asinh" => asinh(c)
    case "acosh" => acosh(c)
    case "atanh" => atanh(c)
    case "exp" => exp(c)
    case "ln" => log(c)
    case "log2" => log2(c)
    case "log10" => log10(c)
    case "sqrt" => sqrt(c)
    case "cbrt" => cbrt(c)
    case "ceil" => ceil(c)
    case "floor" => floor(c)
    case "abs" => abs(c)
    case "rint" => rint(c)
    case "negate" => negate(c)
    case "bit_wise_not" => bitwise_not(c)
    case "invert" => !c
    case "is_nan" => isnan(c)
    case "is_null" => c.isNull
    case "is_valid" => c.isNotNull
    case other => throw new IllegalArgumentException(s"unsupported unary op: $other")
  }

  /** `cast(col, dtype)` (unaryop.hpp:58). */
  def cast(c: Column, to: DataType): Column = c.cast(to)

  /** `round(col, digits, mode)` (unaryop.hpp:69): mode half_up → `round`,
    * half_to_even → `bround` — exact Spark equivalents.
    */
  def roundHalfUp(c: Column, digits: Int): Column = round(c, digits)
  def roundHalfToEven(c: Column, digits: Int): Column = bround(c, digits)
}
