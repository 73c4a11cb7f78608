package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted skew-join: result equivalence with the plain join, salt spread. */
class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  // 10k facts, 95% on one hot key — the classic skew shape
  private lazy val facts = spark.range(10000)
    .select(col("id"),
      when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 5).as("k"))
  private lazy val dim = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
    (3L, "d"), (4L, "e")).toDF("k", "tag")

  test("salted inner join == plain inner join (rows and values)") {
    val plain = facts.join(dim, Seq("k")).select("id", "k", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedInner(facts, dim, "k", salts = 8)
      .select("id", "k", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("the hot key spreads across multiple salt values") {
    val spread = facts
      .withColumn("salt", pmod(hash(facts.columns.map(col).toIndexedSeq: _*), lit(8)))
      .where(col("k") === 7L)
      .select(countDistinct(col("salt"))).head().getLong(0)
    assert(spread >= 6, s"hot key only reached $spread of 8 salts")
  }

  test("salts = 1 degenerates to the plain join") {
    val one = SkewJoin.saltedInner(facts, dim, "k", salts = 1).count()
    val plain = facts.join(dim, Seq("k")).count()
    assert(one == plain)
  }
}
