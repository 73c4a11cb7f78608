package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Pins the ASOF semantics of [[graft.operators.AsOfJoin]]: latest right time
  * at-or-before the left time per key, null when none, `<=` on exact ties —
  * the same contract DuckDB's ASOF JOIN (the oracle for q20) implements. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: Seq[(Long, Long)], right: Seq[(Long, Long)]): Map[(Long, Long), Option[Long]] = {
    val l = left.toDF("k", "lt")
    val r = right.toDF("k", "rt")
    AsOfJoin.asOf(l, r, "k", "lt", "rt", "asof")
      .collect()
      .map(row => (row.getAs[Long]("k"), row.getAs[Long]("lt")) ->
        Option(row.getAs[Any]("asof")).map(_.asInstanceOf[Long]))
      .toMap
  }

  test("picks the latest right time at or before each left time, per key") {
    val res = run(
      left = Seq((1L, 100L), (1L, 250L), (2L, 50L)),
      right = Seq((1L, 90L), (1L, 200L), (1L, 300L), (2L, 10L)))
    assert(res((1L, 100L)) === Some(90L))
    assert(res((1L, 250L)) === Some(200L))
    assert(res((2L, 50L)) === Some(10L))
  }

  test("left rows with no prior right row get null (ASOF LEFT)") {
    val res = run(left = Seq((1L, 5L), (3L, 100L)), right = Seq((1L, 90L)))
    assert(res((1L, 5L)) === None)
    assert(res((3L, 100L)) === None)
  }

  test("a right row at exactly the left time is visible (<= semantics)") {
    val res = run(left = Seq((1L, 100L)), right = Seq((1L, 100L)))
    assert(res((1L, 100L)) === Some(100L))
  }

  test("left payload columns pass through unchanged") {
    val l = Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("k", "lt", "payload")
    val r = Seq((1L, 150L)).toDF("k", "rt")
    val out = AsOfJoin.asOf(l, r, "k", "lt", "rt", "asof")
      .orderBy(col("lt")).collect()
    assert(out.map(_.getAs[String]("payload")).toSeq === Seq("a", "b"))
    assert(Option(out(0).getAs[Any]("asof")) === None)
    assert(out(1).getAs[Long]("asof") === 150L)
  }

  private def runFwd(left: Seq[(Long, Long)], right: Seq[(Long, Long)]): Map[(Long, Long), Option[Long]] = {
    val l = left.toDF("k", "lt")
    val r = right.toDF("k", "rt")
    AsOfJoin.asOfForward(l, r, "k", "lt", "rt", "asof")
      .collect()
      .map(row => (row.getAs[Long]("k"), row.getAs[Long]("lt")) ->
        Option(row.getAs[Any]("asof")).map(_.asInstanceOf[Long]))
      .toMap
  }

  test("forward: picks the earliest right time at or after each left time, per key") {
    val res = runFwd(
      left = Seq((1L, 100L), (1L, 250L), (2L, 50L)),
      right = Seq((1L, 90L), (1L, 200L), (1L, 300L), (2L, 10L)))
    assert(res((1L, 100L)) === Some(200L))
    assert(res((1L, 250L)) === Some(300L))
    assert(res((2L, 50L)) === None)
  }

  test("forward: a right row at exactly the left time is visible (>= semantics)") {
    val res = runFwd(left = Seq((1L, 100L)), right = Seq((1L, 100L)))
    assert(res((1L, 100L)) === Some(100L))
  }

  test("single shuffle: plan has exactly one exchange for the union+window") {
    val l = Seq((1L, 100L)).toDF("k", "lt")
    val r = Seq((1L, 90L)).toDF("k", "rt")
    val plan = AsOfJoin.asOf(l, r, "k", "lt", "rt", "asof")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
  }
}
