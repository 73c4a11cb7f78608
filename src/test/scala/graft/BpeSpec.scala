package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Iterative BPE training: distributed result ≡ single-node reference, greedy
  * merge-fold semantics, and the merge-application property (replaying the
  * learned rules in order reproduces the distributed symbol table). */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("trainMerges matches the single-node reference on the test corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Bpe.trainMerges(spark, docs, 8).collect()
      .map(r => Bpe.MergeRule(r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val wordCounts = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Bpe.trainMergesLocal(wordCounts, 8)
    assert(got.toSeq == want,
      s"distributed ${got.toSeq} != reference $want")
    assert(got.length == 8, "sf0.001 corpus must sustain 8 merge rounds")
    // ranks strictly increase and counts never increase within a round order
    assert(got.map(_.merge_rank).toSeq == (1 to 8))
  }

  test("greedy merge fold: overlapping pairs merge left-to-right, single pass") {
    val df = Seq(
      Seq("b", "b", "b"),          // -> [bb, b], NOT [b, bb] / [bbb]
      Seq("a", "b", "a", "b"),     // -> [ab, ab]
      Seq("a", "a", "b"),          // -> [a, ab]
      Seq("x")                     // untouched
    ).toDF("syms")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got.toList == List(
      List("b", "b", "b"), List("ab", "ab"), List("a", "ab"), List("x")))
    val got2 = df.select(Bpe.applyMerge(col("syms"), "b", "b").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got2.toList == List(
      List("bb", "b"), List("a", "b", "a", "b"), List("a", "a", "b"), List("x")))
  }

  test("replaying learned rules in order reproduces each word's segmentation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rules = Bpe.trainMerges(spark, docs, 6).collect()
      .map(r => (r.getString(1), r.getString(2)))
    // distributed replay over the word types
    val words = docs.select(explode(split(col("text"), " ")).as("word")).distinct()
    val replayed = rules.foldLeft(words.select(col("word"),
        split(col("word"), "").as("syms"))) { case (df, (a, b)) =>
      df.select(col("word"), Bpe.applyMerge(col("syms"), a, b).as("syms"))
    }.collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // local replay with the reference fold
    replayed.foreach { case (w, got) =>
      var s = w.toVector.map(_.toString)
      rules.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        s.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
          else out += x
        }
        s = out.toVector
      }
      assert(got == s.toList, s"word '$w': $got != $s")
      assert(s.mkString == w, s"segmentation of '$w' must concatenate back")
    }
  }

  test("exhausted corpus stops early with fewer rules") {
    val docs = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    // word 'ab' has ONE pair (a,b); after merging it there are no pairs left
    val got = Bpe.trainMerges(spark, docs, 5).collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "a" && got.head.getString(2) == "b"
      && got.head.getLong(4) == 3L)
  }
}
