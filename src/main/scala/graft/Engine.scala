package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Session + table-loading helpers for the graft engine.
  *
  * The reference (legate-dataframe) distributes tables across ranks and sizes its
  * launch domain from the machine scope; on Spark the analogous knobs are the
  * shuffle-partition count and AQE. We default shuffle partitions to the local
  * parallelism (not Spark's 200) and enable AQE so skewed joins / small partitions
  * re-plan at runtime — the behaviour we want on a real multi-executor cluster.
  */
object Engine {

  /** Apply graft's standard config to any builder (shared with Verify/Bench).
    *
    * Scale notes (100 TB design): AQE on (runtime coalescing + skew-join
    * splitting), broadcast threshold left at default (dims like region/nation/
    * supplier always broadcast), shuffle partitions sized to the local core
    * count for tests — on a real cluster this would be ~2-3x total cores and
    * AQE coalesces down.
    */
  def configure(b: SparkSession.Builder, cores: Int): SparkSession.Builder =
    b.withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The reference's Arrow/cudf kernels use unchecked (wrapping) integer
      // arithmetic; ANSI mode (Spark 4 default) would instead throw on
      // overflow / bad casts. Match the reference's semantics.
      .config("spark.sql.ansi.enabled", "false")
      // If events.parquet stores timestamp[ns] (some testdata rounds did),
      // Spark's parquet reader rejects it natively; read as long nanos
      // (normalized in Engine.events). Harmless for µs-stored data.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Runtime bloom-filter join pruning: when a shuffle join's build side
      // is selective, inject might_contain(fact_key) into the probe side's
      // scan — at 100 TB this skips whole row groups of the fact table for
      // free. The default size thresholds (creation ≤ 10 MB after filter,
      // probe scan ≥ 10 GB) keep it off for tiny local data and engage it
      // exactly where it pays on a cluster (PlanSpec proves the injection
      // fires once the thresholds are met).
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // bucketed-table warehouse (q111 co-located join) outside the repo
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")

  /** Build a local session configured the way every graft entry point expects. */
  def session(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.register(s)
    s
  }

  /** Load one star-schema table from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.Registry.register(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The events table with `ts` normalized to a session-zone TimestampType,
    * whatever the file's physical type:
    *  - int64 (ns-precision parquet read with `nanosAsLong`): integer-`div`
    *    to µs then `timestamp_micros` — `div` keeps the math in int64 (a
    *    double round-trip would lose precision at epoch-nanos magnitudes);
    *  - timestamp[us] without timezone (reads as TIMESTAMP_NTZ): cast to
    *    TimestampType — value-preserving because the session zone is pinned
    *    to UTC in `configure`, and downstream `unix_micros`/watermarks need
    *    TimestampType, not NTZ;
    *  - already TimestampType: pass through.
    * The testdata generator has shipped both physical types across rounds, so
    * the engine detects rather than assumes.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _ => df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
    }
  }
}
