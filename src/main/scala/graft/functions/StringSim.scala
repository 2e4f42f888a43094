package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity, matching DuckDB/RapidFuzz semantics so
  * the oracle can mirror it with `jaro_winkler_similarity`:
  *  - either side empty → 0.0 (including both empty);
  *  - match window = max(|s|,|t|)/2 − 1, floored at 0;
  *  - Winkler prefix boost (weight 0.1, prefix capped at 4) applied only
  *    when the Jaro score is STRICTLY above 0.7;
  * Complements the SymSpell deletion-neighborhood blocking in
  * `operators/Joins.fuzzyJoin`: blocking proposes candidate pairs at scale,
  * this expression scores them inside whole-stage codegen.
  */
object JaroWinkler {

  /** Static entry point shared by interpreted eval and generated code. */
  def similarity(l: UTF8String, r: UTF8String): Double = {
    val s = l.toString
    val t = r.toString
    val j = jaro(s, t)
    if (j > 0.7) {
      var p = 0
      val cap = math.min(4, math.min(s.length, t.length))
      while (p < cap && s.charAt(p) == t.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }

  private def jaro(s: String, t: String): Double = {
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && t.charAt(j) == s.charAt(i)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    // RapidFuzz/DuckDB halve the positional-mismatch count with INTEGER
    // division (floor), not the textbook t/2.0 — 'large gear'/'red gear'
    // (3 mismatches) separates the two: 0.8107 (floor) vs 0.7869 (exact).
    (matches.toDouble / n + matches.toDouble / m +
      (matches - trans / 2).toDouble / matches) / 3.0
  }
}

/** `graft_jaro_winkler(string, string) → double`; full codegen via the
  * shared static (the same pattern as Spark's own `levenshtein`, which
  * generates a call into `UTF8String` rather than inlining the DP table).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_jaro_winkler"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(JaroWinkler.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
