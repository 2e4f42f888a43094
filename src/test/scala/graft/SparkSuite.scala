package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate → one JVM-wide session). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.session(4)

  val sfDir = "/root/testdata/sf0.001"

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Order-insensitive comparison on full rows. */
  def assertSameRows(got: DataFrame, expected: Seq[Seq[Any]]): Unit = {
    val g = rows(got).map(_.toList).sortBy(_.toString())
    val e = expected.map(_.toList).sortBy(_.toString())
    assert(g == e, s"\ngot:      $g\nexpected: $e")
  }
}
