package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Splits}

/** The split-assignment producer family: determinism, proportion
  * contracts, stratified exactness, and the leak-free construction's
  * defining property — ZERO split_leak_pairs against its own assignment
  * (every verified near-dup pair lies within one cluster, clusters hash
  * one key). */
class SplitsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private val spec = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("hash split: deterministic, total, proportions near spec") {
    val a = Splits.splitAssign(docs, spec, "s1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.splitAssign(docs, spec, "s1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "same salt must reproduce the assignment")
    assert(a.size == docs.count(), "every doc assigned exactly once")
    val n = a.size.toDouble
    val shares = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(shares.keySet == Set("train", "val", "test"))
    spec.foreach { case (name, f) =>
      assert(math.abs(shares(name) - f) < 0.05,
        s"$name share ${shares(name)} too far from $f")
    }
    val c = Splits.splitAssign(docs, spec, "s2").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != c, "a different salt must move some docs")
  }

  test("fraction spec guards: empty, non-positive, dup names, bad sum") {
    intercept[IllegalArgumentException](Splits.splitAssign(docs, Nil, "s"))
    intercept[IllegalArgumentException](
      Splits.splitAssign(docs, Seq("a" -> 0.0, "b" -> 1.0), "s"))
    intercept[IllegalArgumentException](
      Splits.splitAssign(docs, Seq("a" -> 0.5, "a" -> 0.5), "s"))
    intercept[IllegalArgumentException](
      Splits.splitAssign(docs, Seq("a" -> 0.5, "b" -> 0.4), "s"))
    // ADVICE r13: a fraction below millionths resolution rounds to a
    // zero-width band — a declared split no row could ever reach
    intercept[IllegalArgumentException](
      Splits.splitAssign(docs, Seq("a" -> 1e-9, "b" -> (1.0 - 1e-9)), "s"))
  }

  test("single-split spec: engine assigns it and the SQL renderer is valid") {
    val one = Seq("all" -> 1.0)
    val out = Splits.splitAssign(docs, one, "s1")
    assert(out.where(col("split") =!= "all").count() == 0)
    assert(out.count() == docs.count())
    // ADVICE r13: the renderer used to emit `CASE ELSE 'all' END` (no WHEN
    // arm), which DuckDB rejects — a single split must render as a literal
    assert(Splits.splitCaseSql(one, "s1", "doc_id") == "'all'")
  }

  test("NULL key falls through to the last split, matching the SQL `||` semantics") {
    import spark.implicits._
    val df = Seq((1L, Some("k1")), (2L, None: Option[String]), (3L, Some("k3")))
      .toDF("doc_id", "k")
    val out = Splits.splitAssign(df, spec, "s1", keyCol = "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // ADVICE r13: concat_ws skipped the NULL and hashed just the salt; the
    // oracle's `||` propagates NULL so its CASE falls through to the last
    // split — the engine now does the same (NULL bucket, every arm false)
    assert(out(2L) == "test", s"NULL key assigned ${out(2L)}, not the last split")
    assert(Set("train", "val", "test").contains(out(1L)))
  }

  test("stratified split: exact quotas per stratum (integer boundaries)") {
    val out = Splits.splitAssignStratified(docs, spec, "s1").cache()
    val perStratum = out.groupBy("source", "lang")
      .agg(count(lit(1)).as("total"),
        sum(when(col("split") === "train", 1).otherwise(0)).as("n_train"),
        sum(when(col("split") === "val", 1).otherwise(0)).as("n_val"),
        sum(when(col("split") === "test", 1).otherwise(0)).as("n_test"))
      .collect()
    assert(perStratum.nonEmpty)
    perStratum.foreach { r =>
      val total = r.getAs[Long]("total")
      // the engine's own boundary rule: |{rn : rn*1e6 <= cum*total}| is
      // floor(cum*total/1e6) at integer resolution — check each band size
      val expTrain = (800000L * total) / 1000000L
      val expVal = (900000L * total) / 1000000L - expTrain
      assert(r.getAs[Long]("n_train") == expTrain,
        s"stratum ${r.get(0)}/${r.get(1)} train ${r.getAs[Long]("n_train")} != $expTrain of $total")
      assert(r.getAs[Long]("n_val") == expVal)
      assert(r.getAs[Long]("n_test") == total - expTrain - expVal)
    }
    out.unpersist()
  }

  test("leak-free: clusters co-locate; singletons match the plain hash split; zero leak pairs") {
    val labels = Dedup.nearDupClusters(docs, 0.5)
    val out = Splits.splitAssignLeakFree(docs, labels, spec, "s1").cache()
    // (a) every cluster lands in exactly one split
    val perCluster = out.join(labels, Seq("doc_id"))
      .groupBy("cluster_rep").agg(countDistinct(col("split")).as("nsplits"))
      .agg(max("nsplits")).collect()(0).getLong(0)
    assert(perCluster == 1L, "a near-dup cluster straddled splits")
    // (b) unclustered docs get the identical assignment as splitAssign
    val plain = Splits.splitAssign(docs, spec, "s1")
    val mismatch = out.join(labels, Seq("doc_id"), "left_anti").as("lf")
      .join(plain.as("p"), col("lf.doc_id") === col("p.doc_id"))
      .where(col("lf.split") =!= col("p.split")).count()
    assert(mismatch == 0, "singleton assignment diverged from the hash split")
    // (c) the defining property: no verified near-dup pair straddles splits
    val pairs = Dedup.ngramJaccardPairs(docs, 0.5)
    val leaks = pairs
      .join(out.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(out.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .where(col("sa") =!= col("sb")).count()
    assert(leaks == 0, s"leak-free assignment produced $leaks leak pairs")
    // ... while the frozen detector split DOES leak on this corpus (the
    // reason split_leak_pairs exists) — the construction is load-bearing
    assert(Dedup.splitLeakPairs(docs, 0.5).count() > 0,
      "corpus should exhibit leakage under the plain hash split")
    out.unpersist()
    graft.CacheRegistry.release()
  }
}
