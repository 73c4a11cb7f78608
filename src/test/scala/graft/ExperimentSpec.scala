package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, KnnExact}

/** Recall-targeted nProbe tuning (verdict r7 #4): the one-pass analytic
  * recall curve must agree with the MEASURED recallAtK operator at every
  * probed point, be monotone, and yield the minimal floor-satisfying nProbe —
  * the automated form of the reference's experiment grids
  * (`experiment{1..8}_config.txt`, n_probe ∈ {5,20,40,80}). */
class ExperimentSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val idx = IvfIndex.forSfDir(spark, sf0001, 16)
  private lazy val queries = emb.where(col("vec_id").isin(0L, 1L, 2L, 3L, 4L))
    .select(col("vec_id").as("query_id"), col("embedding"))
  private val K = 10

  test("recallCurve: monotone nondecreasing, full probe exactly 1.0") {
    val curve = idx.recallCurve(emb, queries, K)
    assert(curve.length == idx.numClusters)
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
      s"curve not monotone: ${curve.mkString(",")}")
    assert(curve.last == 1.0, s"full probe must be exact: ${curve.last}")
    assert(curve.head > 0.0, "probing the top cluster must find something")
  }

  test("analytic curve == measured recallAtK at nProbe 1, 4, 8, 16") {
    val curve = idx.recallCurve(emb, queries, K)
    Seq(1, 4, 8, 16).foreach { p =>
      val measured = idx.recallAtK(emb, queries, K, p).collect()
        .map(_.getAs[Double]("recall"))
      val mean = measured.sum / measured.length
      assert(math.abs(curve(p - 1) - mean) < 1e-9,
        s"nProbe=$p: analytic ${curve(p - 1)} != measured mean $mean")
    }
  }

  test("tuneNProbe returns the MINIMAL floor-satisfying probe count") {
    val curve = idx.recallCurve(emb, queries, K)
    Seq(0.5, 0.7, 0.9, 0.95, 1.0).foreach { floor =>
      val t = idx.tuneNProbe(emb, queries, K, floor)
      assert(t >= 1 && t <= idx.numClusters)
      assert(curve(t - 1) >= floor - 1e-12,
        s"floor $floor: tuned nProbe $t has recall ${curve(t - 1)}")
      if (t > 1)
        assert(curve(t - 2) < floor,
          s"floor $floor: $t not minimal (curve(${t - 1})=${curve(t - 2)})")
    }
    // floor 1.0 must verify against the measured operator too
    val tFull = idx.tuneNProbe(emb, queries, K, 1.0)
    val measured = idx.recallAtK(emb, queries, K, tFull).collect()
    assert(measured.forall(_.getAs[Double]("recall") == 1.0),
      s"tuned-for-1.0 nProbe $tFull must measure recall 1.0 on every query")
  }

  test("tuneNProbe on a synthetic monotone case: hand-checkable minimum") {
    // 4 well-separated clusters on distinct axes, 8 vectors each; query on
    // the axis of cluster A: its top-8 neighbors live in ONE cluster, so
    // recall@8 jumps to 1.0 at nProbe=1 — the tuner must say 1, not more
    import spark.implicits._
    val dim = 8
    val rows = (0 until 32).map { i =>
      val axis = i % 4
      val v = Array.fill(dim)(0.001f * ((i * 7 + 3) % 5))
      v(axis) = 1.0f + 0.01f * (i / 4)
      (i.toLong, axis, v.toSeq)
    }
    val df = rows.toDF("vec_id", "label", "embedding")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<float>"))
    val sidx = IvfIndex.build(spark, df, "target/ivf-test/tune-synth", 4)
    val q = df.where(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val t = sidx.tuneNProbe(df, q, 8, 1.0)
    val curve = sidx.recallCurve(df, q, 8)
    // the 8 same-axis vectors dominate cosine for the axis query; they share
    // a k-means cluster in this geometry, so the first probe already covers
    // the full exact top-8 (validated against the measured operator)
    val measured = sidx.recallAtK(df, q, 8, t).head().getAs[Double]("recall")
    assert(measured == 1.0, s"tuned nProbe $t must measure 1.0, curve=${curve.mkString(",")}")
    assert(t == curve.indexWhere(_ >= 1.0 - 1e-12) + 1, "minimality")
  }

  test("tuneNProbe rejects out-of-range floors") {
    intercept[IllegalArgumentException](idx.tuneNProbe(emb, queries, K, 0.0))
    intercept[IllegalArgumentException](idx.tuneNProbe(emb, queries, K, 1.5))
  }
}
