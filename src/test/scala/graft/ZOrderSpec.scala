package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Z-order layout: interleave correctness vs a bit-loop reference, SQL-text
  * faithfulness, and the payoff property — per-file min-max locality on BOTH
  * dimensions after `zorderWrite`.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Reference interleave: bit i of a → bit 2i, bit i of b → bit 2i+1. */
  private def zRef(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches the bit-loop reference, incl. 16-bit masking") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (70000L, 3L), (255L, 256L))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z")).as[Long].collect()
    val exp = pairs.map { case (a, b) => zRef(a & 0xFFFFL, b & 0xFFFFL) }
    assert(got.toSeq == exp)
  }

  test("zValueSql text evaluates identically to the Column form") {
    val df = spark.range(0, 5000)
      .select((col("id") * 37 % 65536).as("a"), (col("id") * 91 % 65536).as("b"))
    val viaCol = df.select(ZOrder.zValue(col("a"), col("b")).as("z"))
    val viaSql = df.selectExpr(s"${ZOrder.zValueSql("a", "b")} AS z")
    assert(viaCol.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaCol).isEmpty)
  }

  test("zorderWrite bounds both dimensions' min-max spread per file") {
    val n = 1 << 14
    // two independent uniform dimensions on [0, 1024)
    val df = spark.range(0, n).select(
      (xxhash64(col("id")) % 1024).cast("long").bitwiseAND(lit(1023L)).as("a"),
      (xxhash64(col("id") + 1000000) % 1024).cast("long").bitwiseAND(lit(1023L)).as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.zorderWrite(df, "a", "b", dir, numFiles = 16)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size == 16, s"expected 16 files, got ${files.size}")
    // each file covers a contiguous z-range => a bounded (a, b) rectangle;
    // with 16 files over a 1024x1024 uniform square, every rectangle spans
    // at most half the global extent on each axis (exact z-quadrants would
    // give 1/4 x 1/1 or 1/2 x 1/2; range boundaries cut mid-quadrant, so
    // allow the half-extent bound rather than the ideal)
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("a"), max("a"), min("b"), max("b")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    val narrowBoth = spans.count { case (sa, sb) => sa <= 640 && sb <= 640 }
    assert(narrowBoth >= 12,
      s"want >=12/16 files with both dims spanning <=640/1024, got $narrowBoth: $spans")
    // a plain full-table parquet write has every file spanning ~the full
    // extent on both axes — sanity-check the z layout actually narrowed
    assert(spans.map(_._1).min < 600 && spans.map(_._2).min < 600)
  }
}
