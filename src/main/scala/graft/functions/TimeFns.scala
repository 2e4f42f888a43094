package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal functions (SURVEY §2.7):
  * `to_timestamps(col, type, strptime_format)` and
  * `extract_timestamp_component(col, component)`
  * (timestamps.hpp:49-99,112; component set dsl/expressions/datetime.py:90-101).
  *
  * Spark's `to_timestamp` takes Java `DateTimeFormatter` patterns, so we
  * translate the reference's strptime-style specifiers (timestamps.hpp:53-74).
  */
object TimeFns {

  /** strptime → java.time.format.DateTimeFormatter pattern translation. */
  def strptimeToJava(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => out.append("yyyy")
          case 'y' => out.append("yy")
          case 'm' => out.append("MM")
          case 'd' => out.append("dd")
          case 'H' => out.append("HH")
          case 'I' => out.append("hh")
          case 'M' => out.append("mm")
          case 'S' => out.append("ss")
          case 'f' => out.append("SSSSSS")
          case 'p' => out.append("a")
          case 'j' => out.append("DDD")
          case 'b' => out.append("MMM")
          case 'B' => out.append("MMMM")
          case 'a' => out.append("EEE")
          case 'A' => out.append("EEEE")
          case 'Z' => out.append("zzz")
          case 'z' => out.append("xx")
          case '%' => out.append('%')
          case other => throw new IllegalArgumentException(s"unsupported strptime specifier: %$other")
        }
        i += 2
      } else {
        // escape letters that are pattern-significant in Java formats
        if (c.isLetter) out.append('\'').append(c).append('\'') else out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** `to_timestamps`: parse strings with a strptime format. */
  def toTimestamps(c: Column, strptimeFmt: String): Column =
    to_timestamp(c, strptimeToJava(strptimeFmt))

  /** `extract_timestamp_component` — Arrow temporal component names
    * (year, month, day, day_of_week, hour, minute, second, millisecond,
    * microsecond, nanosecond). day_of_week follows Arrow/cudf numbering
    * (Monday=0..Sunday=6), translated from Spark's dayofweek (Sunday=1..Saturday=7).
    */
  def extractComponent(c: Column, component: String): Column = component match {
    case "year" => year(c)
    case "month" => month(c)
    case "day" => dayofmonth(c)
    case "day_of_week" => ((dayofweek(c) + 5) % 7) // Mon=0 .. Sun=6
    case "day_of_year" => dayofyear(c)
    case "week" => weekofyear(c)
    case "quarter" => quarter(c)
    case "hour" => hour(c)
    case "minute" => minute(c)
    case "second" => second(c)
    case "millisecond" =>
      (pmod(unix_micros(c), lit(1000000L)) / 1000).cast("int")
    case "microsecond" =>
      pmod(unix_micros(c), lit(1000L)).cast("int")
    // Spark timestamps are microsecond precision, so the ns-within-µs
    // component of a TimestampType column is always 0. NOTE: for sources
    // stored as timestamp[ns] (read via nanosAsLong as raw int64 — some
    // testdata rounds shipped events that way), true nanosecond components
    // need the raw column and `extractComponentNs` below.
    case "nanosecond" => lit(0)
    case other => throw new IllegalArgumentException(s"unsupported component: $other")
  }

  /** Component extraction from a raw int64 epoch-nanoseconds column (the
    * physical type of ns-precision parquet like the events table, read with
    * `nanosAsLong`): full ns fidelity, unlike TimestampType (µs) which
    * truncates. "nanosecond" is the ns-within-µs remainder (Arrow
    * semantics); everything else converts to µs and delegates.
    */
  def extractComponentNs(rawNanos: Column, component: String): Column = component match {
    case "nanosecond" => pmod(rawNanos, lit(1000L)).cast("int")
    case other =>
      // integer `div`, not `/`: double division loses precision above 2^53
      // and epoch-nanos magnitudes exceed it (same reason as Engine.events)
      extractComponent(timestamp_micros(call_function("div", rawNanos, lit(1000L))), other)
  }
}
