package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binary (1-bit sign) quantization: each dimension contributes one bit
  * (set iff the coordinate is positive), packed into two 32-bit halves of
  * the 64-dim testdata embedding — 32× smaller than the raw float vector,
  * the most aggressive point on the quantization ladder the engine offers
  * (SQ8 4×, PQ ~32× with codebooks, BQ 32× with NO codebook at all: the
  * quantizer is the sign function, so there is no training step and no
  * persisted artifact to manage — the degenerate-but-production-real end of
  * the reference's index-artifact spectrum, `clusters.py` → nothing).
  *
  * Search ranks by Hamming similarity (`dim − popcount(code ⊕ query)`), a
  * monotone proxy for cosine on roughly centered data. At 100 TB the scan
  * reads 8 bytes/row instead of 256 and the scorer is two XOR+POPCNT —
  * memory-bandwidth-bound in the best way. Ties are common in integer
  * Hamming space, so the declared total order (hamming ASC, vec_id ASC)
  * does real work here; the oracle mirrors it exactly.
  *
  * Packing detail: bits land in two BIGINT halves (dims 0–31 → `lo`,
  * 32–63 → `hi`) rather than one 64-bit word — bit 63 of a single word
  * would need the sign bit, which `Σ 2^i` arithmetic (the form both
  * engines compute exactly) cannot reach without overflow. Plan shape:
  * codes are one per-row fold over the embedding (zero shuffle, scan
  * speed); search is scan → two-column XOR/POPCNT → TakeOrderedAndProject.
  */
object BqQuant {

  private val HalfBits = 32

  /** Packed sign-bit code columns for one 32-dim half starting at `off`
    * (0-based): Σ_{i∈[off,off+32)} [x_i > 0]·2^(i−off). SQL-expr form so the
    * shift amount can be the lambda variable (the Scala DSL's shiftleft only
    * takes a literal bit count). */
  private def half(col0: String, off: Int) =
    expr(s"""aggregate(sequence(0, ${HalfBits - 1}), 0L,
             |(acc, i) -> acc + IF(element_at($col0, i + ${off + 1}) > 0F,
             |                     shiftleft(1L, i), 0L))""".stripMargin)

  /** (vec_id, label, lo, hi): the binary code table — the artifact a
    * production deployment writes once next to the raw vectors (8 bytes vs
    * 256 per row) and serves Hamming search from. */
  def codes(embeddings: DataFrame, dim: Int): DataFrame = {
    require(dim == 2 * HalfBits,
      s"binary packing is written for dim = ${2 * HalfBits} (got $dim)")
    embeddings.select(col("vec_id"), col("label"),
      half("embedding", 0).as("lo"), half("embedding", HalfBits).as("hi"))
  }

  /** Hamming top-k over the binary codes: (vec_id, label, hamming),
    * hamming ASC, vec_id ASC (the engine-wide deterministic tie-break —
    * load-bearing here, integer distances collide constantly). `query` is
    * the raw float vector; its code is computed driver-side (the sign
    * quantizer needs no corpus statistics). */
  def search(embeddings: DataFrame, query: Array[Float], k: Int,
      dim: Int): DataFrame = {
    require(query.length == dim, s"query dim ${query.length} != $dim")
    val (qlo, qhi) = queryCode(query)
    codes(embeddings, dim)
      .withColumn("hamming",
        (bit_count(col("lo").bitwiseXOR(lit(qlo))) +
         bit_count(col("hi").bitwiseXOR(lit(qhi)))).cast("int"))
      .orderBy(asc("hamming"), asc("vec_id")) // -> TakeOrderedAndProject
      .limit(k)
      .select(col("vec_id"), col("label"), col("hamming"))
  }

  /** Driver-side sign packing of the query vector (mirrors [[half]]).
    * NaN counts as positive: both Spark SQL and DuckDB order NaN above every
    * number, so `x > 0` sets the bit for NaN coordinates in the distributed
    * fold and the oracle — Scala's IEEE `NaN > 0f = false` would silently
    * disagree and a vector's own stored code would no longer be Hamming-0. */
  private[graft] def queryCode(query: Array[Float]): (Long, Long) = {
    def pack(off: Int): Long =
      (0 until HalfBits).foldLeft(0L) { (acc, i) =>
        val x = query(off + i)
        if (x > 0f || x.isNaN) acc + (1L << i) else acc
      }
    (pack(0), pack(HalfBits))
  }

  // ------------------------------------------------------------ oracles

  /** DuckDB CTE `bq(vec_id, label, lo, hi)` mirroring [[codes]]: the same
    * Σ 2^i fold via list_transform over an index range (sums stay < 2^32,
    * exact in every numeric type involved). */
  def codesOracleCte(table: String): String = {
    def half(off: Int) =
      s"""CAST(list_sum(list_transform(range(1, ${HalfBits + 1}),
         |    i -> CASE WHEN embedding[i + $off] > 0 THEN (1::BIGINT << (i - 1))
         |              ELSE 0::BIGINT END)) AS BIGINT)""".stripMargin
    s"""bq AS (SELECT vec_id, label, ${half(0)} AS lo, ${half(HalfBits)} AS hi
       |  FROM $table)""".stripMargin
  }

  /** Full Hamming top-k oracle: code the query row with the same CTE shape,
    * then xor/bit_count — the identical integer arithmetic both engines run. */
  def searchOracleSql(table: String, k: Int, queryVecId: Long): String =
    s"""WITH ${codesOracleCte(table)},
       |q AS (SELECT lo AS qlo, hi AS qhi FROM bq WHERE vec_id = $queryVecId)
       |SELECT vec_id, label,
       |  CAST(bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)) AS INT) AS hamming
       |FROM bq, q
       |ORDER BY hamming ASC, vec_id ASC LIMIT $k""".stripMargin
}
