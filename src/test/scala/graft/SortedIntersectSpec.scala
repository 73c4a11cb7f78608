package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.GraftFunctions.sortedIntersectCount

/** [[graft.functions.SortedIntersectCount]] — value identity with
  * `size(array_intersect(a, b))` on its declared input shape (ascending
  * sorted, duplicate-free), the interpreted/codegen agreement, and nulls. */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic mini-forAll at seed 42 (the PropertySpec pattern — the
    * scalatest/scalacheck bridge isn't on the offline classpath). */
  private def forAll[A](gen: Gen[A], n: Int = 40)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var drawn = 0
    var tries = 0
    while (drawn < n && tries < n * 50) {
      gen.apply(params, seed).foreach { a => f(a); drawn += 1 }
      seed = seed.next
      tries += 1
    }
    assert(drawn == n, s"generator too restrictive: $drawn/$n samples")
  }

  private def run(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
    val df = Seq((a, b)).toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    val r = df.collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("hand cases: disjoint, identical, staggered, empty, containment") {
    val cases = Seq(
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 4L, 9L, 16L), Seq(2L, 4L, 8L, 16L, 32L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L), Seq(1L, 5L, 7L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    cases.foreach { case (a, b) =>
      val (m, ref) = run(a, b)
      assert(m == ref, s"a=$a b=$b: merge=$m ref=$ref")
    }
  }

  test("property: equals size(array_intersect) on sorted-distinct inputs") {
    val sortedDistinct = Gen.listOf(Gen.chooseNum(-100L, 100L))
      .map(_.distinct.sorted)
    val pairs = for { a <- sortedDistinct; b <- sortedDistinct } yield (a, b)
    forAll(pairs) { case (a, b) =>
      val (m, ref) = run(a, b)
      assert(m == ref, s"a=$a b=$b: merge=$m ref=$ref")
    }
  }

  test("null propagation and interpreted path") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")).as("m"))
    assert(df.collect()(0).isNullAt(0), "null input must yield null")
    // interpreted (non-codegen) path: evaluate via an eval-only context
    val e = graft.functions.SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 3L, 7L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3L, 7L, 9L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 2L)
  }
}
