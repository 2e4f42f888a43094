package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String match functions (strings.hpp:49-51): `starts_with`, `ends_with`,
  * `match_substring`, `match_substring_regex` — containment, not full match.
  * All map to codegen'd Spark functions.
  */
object StringFns {

  def matches(matchFunc: String, c: Column, pattern: String): Column = matchFunc match {
    case "starts_with" => c.startsWith(pattern)
    case "ends_with" => c.endsWith(pattern)
    case "match_substring" => c.contains(pattern)
    // containment semantics: unanchored regex find
    case "match_substring_regex" => c.rlike(pattern)
    case other => throw new IllegalArgumentException(s"unsupported match func: $other")
  }

  def startsWith(c: Column, p: String): Column = c.startsWith(p)
  def endsWith(c: Column, p: String): Column = c.endsWith(p)
  def containsSubstring(c: Column, p: String): Column = c.contains(p)
  def matchSubstringRegex(c: Column, p: String): Column = c.rlike(p)
}

/** Static NFC helper shared by [[NfcNormalizeExpr]]'s interpreted and
  * generated paths. Java's `java.text.Normalizer` and DuckDB's utf8proc
  * both implement Unicode-conformant NFC, so outputs are byte-identical
  * cross-engine (the property the oracle gate leans on). Fast path: NFC
  * quick-check via `isNormalized` skips the copy for already-normalized
  * text (ASCII corpora pay ~zero).
  */
object NfcNormalize {
  def compute(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a codegen'd scalar — the first step of
  * every text-curation pipeline (CCNet/C4 normalize before tokenizing so
  * that composed and decomposed forms of the same glyph dedup/hash/compare
  * as one). Spark has no built-in normalizer; a Scala UDF here would box
  * per row and break whole-stage codegen.
  */
case class NfcNormalizeExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_nfc"
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($s);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
