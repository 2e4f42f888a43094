package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, shiftleft}

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * A parquet scan prunes row groups / files on per-column min-max stats, but a
  * sort on (a, b) only clusters the leading key — a filter on `b` alone reads
  * everything. Interleaving the bits of both keys into one Z-value and
  * range-partition-sorting on it bounds BOTH columns' min-max spread within
  * every file, so selective filters on either dimension skip most of a 100 TB
  * table's files. (Same layout idea as Delta/Iceberg `ZORDER BY`; the
  * reference has no layout optimizer — this is beyond-parity Spark surface.)
  *
  * The bit-spread uses the classic mask-shift ladder (public-domain
  * "Interleave bits by Binary Magic Numbers" bit hack), built from codegen'd
  * Spark built-ins (`shiftleft` / `&` / `|`) — no UDF, and the identical
  * arithmetic is expressible in ANSI SQL for the oracle.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at bit 2·i.
    * Inputs are masked to 16 bits; callers quantize wider domains first. */
  def spread16(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value of two 16-bit dimensions: a's bits at even positions,
    * b's at odd. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The same spread ladder as ANSI SQL text, for cross-engine oracles. */
  def spread16Sql(x: String): String = {
    val m0 = s"(($x) & 65535)"
    val m1 = s"(($m0 | ($m0 << 8)) & 16711935)"
    val m2 = s"(($m1 | ($m1 << 4)) & 252645135)"
    val m3 = s"(($m2 | ($m2 << 2)) & 858993459)"
    s"(($m3 | ($m3 << 1)) & 1431655765)"
  }

  def zValueSql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Rewrite `df` into Z-order on (`a`, `b`): range-partition on the Z-value
    * (one shuffle, sampled balanced ranges — no skew from dimension
    * correlation), sort within partitions, and write `numFiles` parquet
    * files. Each file then covers one contiguous Z-range = a bounded
    * rectangle in (a, b), so min-max stats prune on either column. */
  def zorderWrite(
      df: DataFrame, a: String, b: String, path: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    val zCol = "__graft_z"
    require(!df.columns.contains(zCol), s"column name $zCol is reserved")
    df.withColumn(zCol, zValue(col(a), col(b)))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
      .write.mode("overwrite").parquet(path)
  }
}
