package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Mirrors the reference's only automated test — GPU-vs-CPU oracle check at
  * tolerance 1e-5 (`check_cos_sim.cpp:18-79`) — upgraded: deterministic random
  * batches vs an independent Double-precision Scala oracle, plus the edge cases
  * the reference never covered (zero vector / epsilon path, SQL surface).
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Independent oracle, same formula: dot / (||a||*||b|| + 1e-8). */
  private def oracle(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb + 1e-8)
  }

  test("matches Double oracle on 200 random vector pairs (tol 1e-9)") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)(
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = pairs.toDF("a", "b").withColumn("sim", cosineSim(col("a"), col("b")))
    val got = df.select("sim").as[Double].collect()
    pairs.zip(got).foreach { case ((a, b), s) =>
      assert(math.abs(s - oracle(a, b)) < 1e-9, s"mismatch vs oracle")
    }
  }

  test("zero vector exercises the epsilon path (no NaN, returns 0)") {
    val z = Array.fill(8)(0f); val v = Array.fill(8)(1f)
    val got = Seq((z, v)).toDF("a", "b")
      .select(cosineSim(col("a"), col("b"))).as[Double].head()
    assert(got == 0.0, s"zero-vector sim should be exactly 0/(0+1e-8)=0, got $got")
  }

  test("self-similarity is ~1 but < 1 (epsilon in denominator, IVF.cpp:150)") {
    val v = Array.fill(64)(0.5f)
    val got = Seq((v, v)).toDF("a", "b")
      .select(cosineSim(col("a"), col("b"))).as[Double].head()
    assert(got < 1.0 && got > 0.999999, s"epsilon semantics: got $got")
  }

  test("interpreted eval equals codegen result") {
    // whole-stage codegen on/off must agree bit-for-bit
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(50)(
      (Array.fill(32)(rnd.nextFloat()), Array.fill(32)(rnd.nextFloat())))
    val df = pairs.toDF("a", "b").withColumn("sim", cosineSim(col("a"), col("b")))
    val on = df.select("sim").as[Double].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off = try df.select("sim").as[Double].collect()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on.sameElements(off))
  }

  test("SQL registration: cosine_sim / dot_product / l2_norm callable from SQL") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c, " +
        "dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d, " +
        "l2_norm(array(3.0F, 4.0F)) AS n").head()
    assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 5.0) < 1e-12)
    assert(r.getDouble(0) > 0.999999)
  }

  test("null inputs propagate null") {
    val df = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS s")
    assert(df.head().isNullAt(0))
  }

  test("double-element arrays accepted (mixed float/double)") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0F, 0.0F)) AS s").head().getDouble(0)
    assert(r > 0.999999)
  }
}
