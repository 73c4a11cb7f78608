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

  test("hotKeyStream report closes the loop: skewed window salts, uniform window doesn't") {
    // the monitor's batch twin over a skewed event frame (hot user 7 holds
    // 95% of rows) — window() and the aggregates are mode-agnostic, so this
    // IS the report the streaming sink accumulates
    val skewed = facts.select(
      lit("2026-01-01 00:30:00").cast("timestamp").as("ts"),
      col("k").as("user_id"))
    val report = graft.streaming.EventStreams
      .hotKeyStream(skewed, "user_id", "1 hour", "30 minutes")
    val salts = SkewJoin.saltsFromReport(report)
    // expected decision from first principles: ceil(max/mean) over 6 keys
    val counts = skewed.groupBy("user_id").count().collect().map(_.getLong(1))
    val want = math.ceil(counts.max.toDouble * counts.length / counts.sum).toInt
    assert(salts == want && salts > 1,
      s"skewed window must prescribe ceil(hot_factor)=$want salts, got $salts")
    // the prescribed join keeps plain-join semantics
    val joined = SkewJoin.reportSaltedInner(
      facts, dim, "k", report).select("id", "k", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val plain = facts.join(dim, Seq("k")).select("id", "k", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(joined.sameElements(plain))

    // a uniform window prescribes the plain join...
    val uniform = spark.range(6000).select(
      lit("2026-01-01 00:30:00").cast("timestamp").as("ts"),
      (col("id") % 6).as("user_id"))
    val uniReport = graft.streaming.EventStreams
      .hotKeyStream(uniform, "user_id", "1 hour", "30 minutes")
    assert(SkewJoin.saltsFromReport(uniReport) == 1,
      "uniform window must prescribe 1 salt (plain join)")
    // ...and only the LATEST window drives the decision
    val twoWindows = skewed.unionByName(uniform.withColumn("ts",
      lit("2026-01-01 01:30:00").cast("timestamp")))
    val latest = graft.streaming.EventStreams
      .hotKeyStream(twoWindows, "user_id", "1 hour", "30 minutes")
    assert(SkewJoin.saltsFromReport(latest) == 1,
      "the decision must read the latest closed window, not an older one")
  }

  test("empty report means no skew evidence: 1 salt") {
    val empty = spark.range(0).select(
      lit(null).cast("timestamp").as("window_start"),
      lit(null).cast("double").as("hot_factor"))
    assert(SkewJoin.saltsFromReport(empty) == 1)
  }

  test("null hot_factor in the latest row means no skew evidence: 1 salt") {
    // ADVICE r10: a hand-built / partially-written report row must fall back
    // like the empty-report case, not NPE from the driver collect
    val partial = spark.range(1).select(
      lit("2026-01-01 00:00:00").cast("timestamp").as("window_start"),
      lit(null).cast("double").as("hot_factor"))
    assert(SkewJoin.saltsFromReport(partial) == 1)
  }
}
