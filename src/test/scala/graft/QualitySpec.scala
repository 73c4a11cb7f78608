package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Gates for the bounded-memory approx variant of the quality-percentile
  * report (the exact form is hash-oracled by the driver gate; the approx form
  * returns sketch-chosen data points, so its gate is closeness to exact). */
class QualitySpec extends SparkSpec {

  test("approx percentiles track the exact report within rank-error bounds") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val exact = TextAnalysis.qualityPercentiles(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = TextAnalysis.qualityPercentilesApprox(docs, accuracy = 10000)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (lang, e) =>
      val a = approx(lang)
      assert(a.getLong(1) == e.getLong(1), s"$lang n_docs")
      (2 to 6).foreach { i =>
        // at accuracy=10000 and sf0.001 group sizes the rank error is < 1,
        // so the sketch's data point must sit within one 6-dp ratio step of
        // the interpolated exact value
        assert(math.abs(a.getDouble(i) - e.getDouble(i)) <= 0.02,
          s"$lang col $i: approx ${a.getDouble(i)} vs exact ${e.getDouble(i)}")
      }
      // and the approx row is internally ordered
      assert((2 until 6).forall(i => a.getDouble(i) <= a.getDouble(i + 1)))
    }
  }

  test("approx variant carries no per-doc list state in its aggregate") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = TextAnalysis.qualityPercentilesApprox(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("percentile_approx"), plan.take(400))
    assert(!plan.contains("collect_list"),
      "approx variant must not buffer the group's ratio list:\n" + plan.take(600))
  }

  test("q14 histogram-cumsum walk == plain percentile() bit-for-bit (r19)") {
    // the r19 rewrite: eventPercentiles now runs the lattice-histogram rank
    // walk (groupBy (type, value) → per-type running window over DISTINCT
    // values → Spark's own interpolation formula); the plain percentile()
    // formulation stays as the independent parity arm. Bit-identical, not
    // tolerance-based: the walk mirrors Percentile.getPercentile verbatim.
    val hist = graft.operators.Relational.eventPercentiles(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val sorted = graft.operators.Relational.eventPercentilesSorted(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(hist == sorted, s"histogram walk diverged:\n$hist\nvs\n$sorted")
    assert(hist.size == 5)
    // and the plan is the point: no TypedImperativeAggregate percentile
    // buffer anywhere — every stage is a codegen'd hash aggregate / window
    val plan = graft.operators.Relational.eventPercentiles(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"),
      "histogram form must not fall back to percentile():\n" + plan.take(600))
  }

  test("event-percentile approx twin tracks the exact q14 report (r15)") {
    val exact = graft.operators.Relational.eventPercentiles(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.operators.Relational
      .eventPercentilesApprox(spark, sf0001, accuracy = 10000)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    // GK's actual guarantee is on RANK, not value (a sparse tail can put
    // adjacent ranks units apart): at accuracy=10000 and sf0.001 group
    // sizes the rank error is < 1, so the returned data point must be one
    // of the target rank's neighbors in the group's sorted value list
    val valsByType = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted }
    exact.foreach { case (et, e) =>
      val a = approx(et)
      val vs = valsByType(et)
      def inRankWindow(got: Double, q: Double): Boolean = {
        val r = ((vs.length - 1) * q).toInt
        val lo = vs(math.max(0, r - 1))
        val hi = vs(math.min(vs.length - 1, r + 2))
        got >= lo && got <= hi
      }
      assert(inRankWindow(a.getDouble(1), 0.5), s"$et p50 ${a.getDouble(1)}")
      assert(inRankWindow(a.getDouble(2), 0.95), s"$et p95 ${a.getDouble(2)}")
      // min/max are exact in both forms
      assert(a.getDouble(3) == e.getDouble(3) && a.getDouble(4) == e.getDouble(4), et)
    }
  }

  test("HLL vocab twin tracks the exact per-language type counts within bound") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val exact = TextAnalysis.vocabSizeByLang(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = TextAnalysis.vocabSizeByLangApprox(docs, rsd = 0.02).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (lang, (eTypes, eTokens)) =>
      val (aTypes, aTokens) = approx(lang)
      assert(aTokens == eTokens, s"$lang token counts are exact in both forms")
      // HLL++ at rsd=0.02 sits within a few sd of truth; 5x headroom
      assert(math.abs(aTypes - eTypes) <= math.max(5, (0.1 * eTypes).toLong),
        s"$lang: approx $aTypes vs exact $eTypes")
    }
  }

  test("HLL vocab twin plans no distinct Expand — one pass, sketches merge") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = TextAnalysis.vocabSizeByLangApprox(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct"), plan.take(400))
    assert(!plan.contains("Expand"),
      "sketch twin must not plan the distinct Expand:\n" + plan.take(600))
  }
}
