package graft.sources

import org.apache.spark.sql.types._

/** Type-boundary rules for the reference's Arrow type surface
  * (`cpp/src/utils.cpp:30-94` `to_legate_type`, SURVEY §1.2).
  *
  * The reference carries unsigned ints natively (`legate::uint8..uint64`);
  * the JVM and Spark SQL have no unsigned integral types, so the boundary
  * contract is WIDENING to the next signed type that holds the full value
  * range — the same mapping Spark's own parquet reader applies to
  * `UINT_8/16/32/64` annotated columns, so a parquet file written by the
  * reference round-trips losslessly:
  *
  *   uint8  → ShortType         (0 … 255)
  *   uint16 → IntegerType       (0 … 65 535)
  *   uint32 → LongType          (0 … 4 294 967 295)
  *   uint64 → DecimalType(20,0) (0 … 18 446 744 073 709 551 615 — exceeds
  *                               int64, only decimal holds it exactly)
  *
  * Consequences callers must know (and `FunctionsSpec` pins):
  *   - values NEVER reinterpret as negative: uint8 255 reads as 255S, not
  *     -1 — the widened type preserves magnitude, not bit pattern;
  *   - uint64 arithmetic (sum, avg) happens in decimal, so it cannot wrap
  *     at the 2^63 boundary the way the reference's native uint64 wraps at
  *     2^64; overflow instead grows the decimal precision (or errors past
  *     38 digits under ANSI).
  */
object Types {

  /** Spark type that losslessly holds an Arrow/reference type, by name.
    * Signed/float/string map to themselves; unsigned types widen.
    */
  def widenUnsigned(arrowType: String): DataType = arrowType match {
    case "bool" => BooleanType
    case "int8" => ByteType
    case "int16" => ShortType
    case "int32" => IntegerType
    case "int64" => LongType
    case "uint8" => ShortType
    case "uint16" => IntegerType
    case "uint32" => LongType
    case "uint64" => DecimalType(20, 0)
    case "float32" => FloatType
    case "float64" => DoubleType
    case "string" | "large_string" => StringType
    case other =>
      throw new IllegalArgumentException(s"unsupported reference type: $other")
  }

  /** Widen a full schema of (name, arrow type name) pairs. */
  def widenSchema(fields: Seq[(String, String)]): StructType =
    StructType(fields.map { case (n, t) => StructField(n, widenUnsigned(t)) })
}
