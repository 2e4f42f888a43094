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
