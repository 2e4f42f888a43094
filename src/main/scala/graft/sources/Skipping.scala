package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** File-level data-skipping index over a parquet directory: per-(file,
  * column) min/max/null-count harvested from parquet FOOTERS only (no data
  * pages are read), built distributed — the manifest-stats pattern of
  * Delta/Iceberg re-expressed Spark-first. The reference reads the same
  * footer metadata to plan per-rank row-group assignment
  * (`cpp/src/parquet.cpp:507-606`); here the stats become a persistent,
  * queryable index that prunes whole FILES before a scan is even planned.
  *
  * Scale shape: the index is one row per (file, column) — at 100 TB with
  * 1 GiB files that is ~10^5 rows per column, i.e. megabytes. The build
  * fans the footer reads out over executors (bounded, footer-only I/O);
  * the prune-time collect returns just the surviving file list, the same
  * driver-side file listing any Spark scan already performs. Files written
  * clustered on the stat column (`repartitionByRange` + `sortWithinPartitions`,
  * as in `ZOrder.zorderWrite`) give disjoint per-file ranges, so a
  * selective range predicate prunes all but O(selectivity × files).
  */
object Skipping {

  /** One file's footer stats for one column, row groups merged.
    * Numeric (int32/int64/float/double/date/timestamp) stats land in
    * `min_num`/`max_num` (timestamps as epoch micros, dates as epoch days);
    * UTF-8 binary stats land in `min_str`/`max_str`. `has_stats` false
    * (footer carried no usable statistics) means the file must be treated
    * as a candidate by every prune — skipping is an optimization, never a
    * correctness filter.
    */
  final case class FileColStats(
      file: String,
      column: String,
      min_num: Option[Double],
      max_num: Option[Double],
      min_str: Option[String],
      max_str: Option[String],
      null_count: Long,
      row_count: Long,
      has_stats: Boolean)

  private def parquetFiles(dir: String): Seq[String] = {
    val fs = new java.io.File(dir)
    val all =
      if (fs.isDirectory) fs.listFiles().toSeq.map(_.getAbsolutePath)
      else Seq(dir)
    all.filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
  }

  /** Build the skipping index for `columns` over every parquet file under
    * `dir`. Footer-only: executors open each footer, merge row-group
    * statistics, and emit one row per (file, column).
    */
  def buildStats(spark: SparkSession, dir: String, columns: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = parquetFiles(dir)
    require(files.nonEmpty, s"no parquet files under $dir")
    val cols = columns // avoid closing over `this`
    val slices = math.min(files.size, 64)
    val rows = spark.sparkContext.parallelize(files, slices).flatMap { path =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(path), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val fileRows = blocks.map(_.getRowCount).sum
        cols.map { c =>
          var minN = Option.empty[Double]; var maxN = Option.empty[Double]
          var minS = Option.empty[String]; var maxS = Option.empty[String]
          var nulls = 0L
          var ok = blocks.nonEmpty
          blocks.foreach { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == c) match {
              case Some(chunk) =>
                val st = chunk.getStatistics
                if (st == null || st.isEmpty) ok = false
                else {
                  nulls += math.max(st.getNumNulls, 0L)
                  if (st.hasNonNullValue) {
                    (st.genericGetMin, st.genericGetMax) match {
                      case (mn: Number, mx: Number) =>
                        val (lo, hi) = (mn.doubleValue(), mx.doubleValue())
                        minN = Some(minN.fold(lo)(math.min(_, lo)))
                        maxN = Some(maxN.fold(hi)(math.max(_, hi)))
                      case (mn: org.apache.parquet.io.api.Binary,
                            mx: org.apache.parquet.io.api.Binary) =>
                        val (lo, hi) = (mn.toStringUsingUTF8, mx.toStringUsingUTF8)
                        minS = Some(minS.fold(lo)(Ordering[String].min(_, lo)))
                        maxS = Some(maxS.fold(hi)(Ordering[String].max(_, hi)))
                      case _ => ok = false
                    }
                  }
                }
              case None => ok = false // column absent (schema evolution)
            }
          }
          FileColStats(path, c, minN, maxN, minS, maxS, nulls, fileRows,
            ok && (minN.isDefined || minS.isDefined || fileRows == nulls))
        }
      } finally reader.close()
    }
    rows.toDF()
  }

  /** Files that can contain a row with `lo <= column <= hi` (numeric stat
    * space: timestamps in epoch micros, dates in epoch days). Files without
    * usable stats are kept — pruning must stay conservative. Bounds are
    * inclusive; pass `lo = hi` for point lookups. The collect is bounded by
    * file count (the index is one row per file for this column).
    */
  def candidateFiles(stats: DataFrame, column: String, lo: Double, hi: Double): Seq[String] =
    stats.filter(col("column") === column)
      .filter(!col("has_stats") ||
        (col("max_num") >= lo && col("min_num") <= hi))
      .select("file").collect().map(_.getString(0)).toSeq.sorted

  /** String-range variant of [[candidateFiles]]. */
  def candidateFilesStr(stats: DataFrame, column: String, lo: String, hi: String): Seq[String] =
    stats.filter(col("column") === column)
      .filter(!col("has_stats") ||
        (col("max_str") >= lo && col("min_str") <= hi))
      .select("file").collect().map(_.getString(0)).toSeq.sorted

  /** Read only the files the index can't rule out for the residual
    * predicate `pred` over `column`'s numeric range [lo, hi], then apply
    * `pred` exactly. Falls back to an empty frame with the directory's
    * schema when everything prunes.
    */
  def readPruned(
      spark: SparkSession,
      dir: String,
      stats: DataFrame,
      column: String,
      lo: Double,
      hi: Double,
      pred: DataFrame => DataFrame): DataFrame = {
    val files = candidateFiles(stats, column, lo, hi)
    if (files.isEmpty) pred(spark.read.parquet(dir).limit(0))
    else pred(spark.read.parquet(files: _*))
  }
}
