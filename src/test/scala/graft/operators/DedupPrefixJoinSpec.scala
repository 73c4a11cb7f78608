package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity gate for the prefix-filtered (SSJoin/PPJoin-style) candidate rule
  * behind [[Dedup.ngramJaccardPairs]]: the optimized tail must emit EXACTLY
  * the pairs + Jaccard values of the retained naive all-postings self-join
  * ([[Dedup.jaccardPairsAllPairs]]), on fixtures chosen to stress the rule's
  * failure modes — hot shingles (which the df-ascending order must exclude
  * from prefixes WITHOUT dropping true pairs), borderline ⌈t·n⌉ sizes,
  * single-shingle docs, and a seeded randomized corpus swept over
  * thresholds. The oracle row (`ngram_jaccard` vs DuckDB) gates the same
  * identity end-to-end at sf0.01/sf10; this spec localizes a break to the
  * candidate rule.
  */
class DedupPrefixJoinSpec extends graft.SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String, String)]): DataFrame =
    rows.map { case (id, text, lang) => (id, text, lang, "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  /** Both tails over the same postings/docs, returned as comparable sets. */
  private def bothTails(docs: DataFrame, t: Double)
      : (Set[(Long, Long, Double)], Set[(Long, Long, Double)]) = {
    val shingled = Dedup.shingledDocs(docs)
    val posts = Dedup.shinglePostings(shingled)
    val naive = Dedup.jaccardPairsAllPairs(
        posts, shingled.select(col("doc_id"), size(col("sh")).as("n")), t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.ngramJaccardPairs(docs, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    (naive, pref)
  }

  private def assertParity(docs: DataFrame, thresholds: Seq[Double]): Unit =
    thresholds.foreach { t =>
      val (naive, pref) = bothTails(docs, t)
      assert(pref == naive,
        s"t=$t: prefix-filtered != naive; missing=${naive -- pref} extra=${pref -- naive}")
    }

  test("hot boilerplate shingle: prefixes exclude it, no true pair is lost") {
    // 20 docs all share one hot boilerplate sentence (its shingles have
    // df=20 -> suffix under df-ascending order) plus per-doc distinct tails;
    // docs 0/1 and 2/3 are true near-dup pairs through their tails.
    val boiler = "subscribe to our newsletter for updates every single day"
    val rows = (0L until 20L).map { i =>
      val tail = i match {
        case 0 | 1 => "alpha beta gamma delta epsilon zeta eta theta"
        case 2 | 3 => "iota kappa lambda mu nu xi omicron pi"
        case _ => s"unique$i tokens$i only$i here$i now$i word$i more$i fin$i"
      }
      (i, s"$boiler $tail", "en", "s0", 0L)
    }
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    assertParity(docs, Seq(0.3, 0.5, 0.8))
    // and the hot pairs genuinely exist (the fixture is not vacuous): every
    // doc shares the boilerplate shingles, so at a low-enough threshold the
    // naive join pairs everything — parity must hold there too
    val (naive, pref) = bothTails(docs, 0.05)
    assert(naive.size >= 20 * 19 / 2, s"low-t fixture must pair all: ${naive.size}")
    assert(pref == naive)
  }

  test("borderline sizes and single-shingle docs") {
    val docs = mkDocs(Seq(
      (0L, "a b c", "en"),            // exactly one 3-shingle
      (1L, "a b c", "en"),            // its exact dup: J = 1.0
      (2L, "a b c d", "en"),          // 2 shingles, J(0,2) = 1/2 — borderline at t=0.5
      (3L, "a b c d e f", "en"),      // 4 shingles
      (4L, "x y z w v", "en"),        // disjoint
      (5L, "a b c d e f", "fr")       // same text, different lang: never pairs
    ))
    assertParity(docs, Seq(0.2, 0.5, 0.75, 1.0))
    val (_, pref) = bothTails(docs, 0.5)
    assert(pref.contains((0L, 1L, 1.0)), s"exact single-shingle dup must survive: $pref")
    assert(pref.contains((0L, 2L, 0.5)), s"borderline J=0.5 at t=0.5 must survive: $pref")
    assert(!pref.exists(p => p._1 == 5L || p._2 == 5L), s"cross-lang pair leaked: $pref")
  }

  test("seeded random corpus: parity across thresholds") {
    val rnd = new scala.util.Random(42)
    val pool = Vector.tabulate(30)(i => s"w$i")
    val rows = (0L until 40L).map { i =>
      val n = 4 + rnd.nextInt(12)
      val text = Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
      (i, text, if (rnd.nextBoolean()) "en" else "de")
    }
    val docs = mkDocs(rows)
    assertParity(docs, Seq(0.1, 0.3, 0.5, 0.7, 0.9))
  }

  /** Cross-relation parity: [[Dedup.jaccardPairsAcross]] over a disjoint
    * history/batch split must emit exactly the STRADDLING pairs of the
    * full-corpus join — on the same failure-mode fixtures (hot shingles,
    * borderline sizes, randomized sweep). */
  private def assertCrossParity(docs: DataFrame, thresholds: Seq[Double]): Unit =
    thresholds.foreach { t =>
      val batch = docs.where(col("doc_id") % 5 === 4)
      val hist = docs.where(col("doc_id") % 5 =!= 4)
      val across = Dedup.jaccardPairsAcross(
          Dedup.shingledDocs(batch), Dedup.shingledDocs(hist), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val (naive, _) = bothTails(docs, t)
      val straddling = naive.filter(p => (p._1 % 5 == 4) != (p._2 % 5 == 4))
      graft.CacheRegistry.release()
      assert(across == straddling, s"t=$t: cross-prefix != naive-straddling; " +
        s"missing=${straddling -- across} extra=${across -- straddling}")
    }

  test("cross-relation prefix join: hot-shingle and borderline parity") {
    val boiler = "subscribe to our newsletter for updates every single day"
    val rows = (0L until 20L).map { i =>
      val tail = i match {
        // 4 % 5 == 4 -> doc 4 is a BATCH doc whose true partner 0 is history
        case 0 | 4 => "alpha beta gamma delta epsilon zeta eta theta"
        case 2 | 9 => "iota kappa lambda mu nu xi omicron pi"
        case _ => s"unique$i tokens$i only$i here$i now$i word$i more$i fin$i"
      }
      (i, s"$boiler $tail", "en")
    }
    assertCrossParity(mkDocs(rows), Seq(0.05, 0.3, 0.5, 0.8))
    // borderline/single-shingle docs with a straddling exact dup (4 vs 1)
    assertCrossParity(mkDocs(Seq(
      (0L, "a b c", "en"), (1L, "a b c", "en"), (4L, "a b c", "en"),
      (2L, "a b c d", "en"), (9L, "a b c d e f", "en"),
      (14L, "x y z w v", "en"), (19L, "a b c", "fr"))),
      Seq(0.2, 0.5, 1.0))
  }

  test("cross-relation prefix join: seeded random corpus across thresholds") {
    val rnd = new scala.util.Random(1337)
    val pool = Vector.tabulate(25)(i => s"w$i")
    val rows = (0L until 40L).map { i =>
      val n = 4 + rnd.nextInt(12)
      val text = Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
      (i, text, if (rnd.nextBoolean()) "en" else "de")
    }
    assertCrossParity(mkDocs(rows), Seq(0.1, 0.3, 0.5, 0.7, 0.9))
  }

  test("ngramJaccardPairsAmong parity on the restricted posting set") {
    val rnd = new scala.util.Random(7)
    val pool = Vector.tabulate(20)(i => s"t$i")
    val rows = (0L until 30L).map { i =>
      val text = Seq.fill(5 + rnd.nextInt(8))(pool(rnd.nextInt(pool.size))).mkString(" ")
      (i, text, "en")
    }
    val docs = mkDocs(rows)
    val ids = docs.where(col("doc_id") % 3 =!= 0).select(col("doc_id"))
    val among = Dedup.ngramJaccardPairsAmong(docs, ids, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val refiltered = Dedup.ngramJaccardPairs(
        docs.where(col("doc_id") % 3 =!= 0), 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(among == refiltered,
      s"among != refiltered; missing=${refiltered -- among} extra=${among -- refiltered}")
  }
}
