package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial joins — the Spark-first shape for radius /
  * nearest-neighbor queries over 2D points (geohash / S2-cell analogue,
  * implemented over a uniform grid so the semantics stay exact and
  * SQL-mirrorable).
  *
  * Scale model: with cell width = radius, every near pair is guaranteed to
  * meet in EXACTLY one (build-cell, probe-offset) combination of the 3×3
  * neighborhood, so the join needs no post-hoc distinct; candidate work per
  * point is bounded by the 9-cell neighborhood's occupancy. At constant
  * point density the per-point work is O(1) and the whole join is one linear
  * hash shuffle on the cell key. A pathologically hot cell salts like any
  * skewed join key (Joins.saltedJoin applies unchanged to the cell key).
  */
object Spatial {

  /** All DIRECTED pairs (a ≠ b) within `r` (Euclidean) of each other.
    * `pts` must have columns (`id`, `x`, `y`); x/y should be DoubleType
    * (float inputs: cast first — float→double is exact, and double
    * arithmetic on identical operands is bit-identical in any engine).
    * Output: (id_a, id_b, d2) with d2 = squared distance ≤ r².
    */
  def radiusJoin(pts: DataFrame, r: Double): DataFrame = {
    val cells = pts
      .withColumn("cellx", floor(col("x") / r).cast("long"))
      .withColumn("celly", floor(col("y") / r).cast("long"))
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probe = cells.select(col("id").as("id_b"),
        col("x").as("bx"), col("y").as("by"),
        explode(array(offs: _*)).as("o"),
        col("cellx").as("bcx"), col("celly").as("bcy"))
      .select(col("id_b"), col("bx"), col("by"),
        (col("bcx") + col("o.dx")).as("cx"),
        (col("bcy") + col("o.dy")).as("cy"))
    val d2: Column = (cells("x") - col("bx")) * (cells("x") - col("bx")) +
      (cells("y") - col("by")) * (cells("y") - col("by"))
    cells.join(probe,
        cells("cellx") === col("cx") && cells("celly") === col("cy") &&
        cells("id") =!= col("id_b") && d2 <= lit(r * r))
      .select(cells("id").as("id_a"), col("id_b"), d2.as("d2"))
  }
}
