package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{h32, h32Sql}

/** Multimodal-column plumbing: image/audio/video payloads as opaque BINARY
  * columns with typed metadata, per the builder brief. The container has no
  * image/audio codecs, so the DECODE step is a clearly-marked deterministic
  * stub ([[FakeDecoder]]) — the Spark-side plumbing (schema, batch shape,
  * partition-parallel decode boundary) is real and tested.
  *
  * At 100 TB: payloads live in Parquet BINARY columns (or object-store paths
  * for >? MB blobs), metadata in sibling struct columns so filters prune on
  * metadata WITHOUT touching payload bytes (column pruning keeps the scan
  * cheap); decode runs per-partition inside `mapPartitions` — the Scala analog
  * of `mapInPandas`' batched UDF boundary.
  */
object Multimodal {

  /** A decoded "frame": what a real image decoder would emit per payload. */
  final case class Frame(doc_id: Long, width: Int, height: Int, channels: Int,
      n_bytes: Long, checksum: Long)

  /** Deterministic fake decoder standing in for libjpeg/ffmpeg: derives
    * plausible dimensions + a checksum from the payload bytes alone.
    * Replace `decode` with a real codec call at the `???`-boundary; signature
    * and batch shape stay fixed.
    *
    * The stub's formulas are the PORTABLE hashes ([[graft.functions
    * .PortableHash]], md5-derived) so (a) a decoded [[Frame]] is bit-identical
    * to the columnar [[metadata]] projection (consistency is tested), and
    * (b) the composed decode→embed→kNN query (`multimodal_knn`) is
    * reproducible in the DuckDB oracle down to the hash. */
  object FakeDecoder {
    def decode(docId: Long, payload: Array[Byte]): Frame = {
      // real implementation would be e.g.: ImageIO.read(new ByteArrayInputStream(payload))
      val h32 = graft.functions.PortableHash.h32(payload)
      Frame(docId,
        width = 16 + (h32 % 240).toInt,
        height = 16 + ((h32 >> 8) % 240).toInt,
        channels = 3,
        n_bytes = payload.length.toLong,
        checksum = graft.functions.PortableHash.h60(payload))
    }
  }

  /** Attach a BINARY payload + typed metadata struct to the documents table —
    * the payload here is the utf-8 text bytes standing in for media bytes. */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("lang").as("meta_lang"),
        col("source").as("meta_source")).as("meta"))

  /** Metadata-only projection: must prune the payload column at the scan
    * (verify with .explain — ReadSchema excludes `payload`). Width/height are
    * the portable-hash fake of image dims so the oracle can check the plumbing:
    *   width  = 16 + h32(text) % 240
    *   height = 16 + (h32(text) >> 8) % 240
    */
  def metadata(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      (lit(16) + h32(col("text")) % 240).cast("int").as("width"),
      (lit(16) + shiftright(h32(col("text")), 8) % 240).cast("int").as("height"),
      lit(3).as("channels"))

  /** DuckDB oracle SQL for [[metadata]] over table name `t`. */
  def metadataOracleSql(t: String): String =
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  CAST(16 + ${h32Sql("text")} % 240 AS INT) AS width,
       |  CAST(16 + (${h32Sql("text")} >> 8) % 240 AS INT) AS height,
       |  CAST(3 AS INT) AS channels
       |FROM $t ORDER BY doc_id""".stripMargin

  /** Partition-parallel decode over the payload column: the real-codec
    * boundary. One JVM call per row inside mapPartitions — batched, no
    * driver involvement, no shuffle. */
  def decodeFrames(spark: SparkSession, withPayloads: DataFrame): Dataset[Frame] = {
    import spark.implicits._
    withPayloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => FakeDecoder.decode(id, payload) })
  }

  /** Frame feature extraction — the vision-encoder boundary: decoded frame →
    * fixed-width feature vector, emitted as `(vec_id, embedding ARRAY<FLOAT>)`
    * so multimodal content plugs DIRECTLY into every vector operator
    * ([[graft.operators.KnnExact]], [[graft.operators.IvfIndex]],
    * [[graft.operators.LshAnn]], [[graft.operators.SqQuant]]). The encoder is
    * a deterministic stub (hash-derived L2-normalized vector from the frame
    * checksum — no vision model in the container); a real encoder replaces
    * the per-row function only, the partition-batched boundary and output
    * contract stay fixed.
    *
    * Derivation contract (portable — [[frameEmbeddingQuerySql]] renders the
    * identical computation for the DuckDB oracle): per dimension i,
    * `d_i = (h32(checksum + "#" + i) % 2001 - 1000) / 1000.0` in DOUBLE;
    * the L2 norm folds `d_i²` in index order from a 0.0 seed; each component
    * casts to FLOAT only once, after the double-precision divide. */
  def frameEmbeddings(spark: SparkSession, withPayloads: DataFrame,
      dim: Int = 64): DataFrame = {
    import spark.implicits._
    decodeFrames(spark, withPayloads)
      .mapPartitions(_.map { f =>
        // encoder init would happen here, once per partition
        val d = new Array[Double](dim)
        val v = new Array[Float](dim)
        var i = 0
        var ss = 0.0
        while (i < dim) {
          val x = (graft.functions.PortableHash.h32(
            s"${f.checksum}#$i".getBytes("UTF-8")) % 2001L - 1000L).toDouble / 1000.0
          d(i) = x; ss += x * x; i += 1
        }
        val n = math.sqrt(ss)
        if (n > 0) { i = 0; while (i < dim) { v(i) = (d(i) / n).toFloat; i += 1 } }
        (f.doc_id, v)
      })
      .toDF("vec_id", "embedding")
  }

  /** DuckDB CTE fragment reproducing [[frameEmbeddings]] over the documents
    * whose `doc_id` satisfies `pred`: yields `(query_id, v)` with `v` the
    * frame embedding as a DOUBLE list (each component the exact FLOAT the
    * engine emits, widened back to DOUBLE for list math). The norm fold uses
    * `list_reduce` over `ORDER BY i` — seeded by the first element, which is
    * bit-identical to the engine's 0.0-seeded in-order accumulation. */
  def frameEmbeddingQuerySql(pred: String, dim: Int = 64): String = {
    val h32 = "(('0x' || substr(md5(CAST(cs AS VARCHAR) || '#' || CAST(i AS VARCHAR)), 1, 8))::BIGINT)"
    s"""qd AS (SELECT doc_id, (('0x' || substr(md5(text), 1, 15))::BIGINT) AS cs
       |  FROM documents WHERE $pred),
       |qraw AS (SELECT doc_id, i, ($h32 % 2001 - 1000) / 1000.0 AS d
       |  FROM qd, range($dim) r(i)),
       |qn AS (SELECT doc_id,
       |    sqrt(list_reduce(list(d * d ORDER BY i), (a, x) -> a + x)) AS nrm
       |  FROM qraw GROUP BY doc_id),
       |q AS (SELECT doc_id AS query_id,
       |    list(CAST(CAST(d / nrm AS REAL) AS DOUBLE) ORDER BY i) AS v
       |  FROM qraw JOIN qn USING (doc_id) GROUP BY doc_id)""".stripMargin
  }

  /** Deterministic frame-sampling stub: one "frame" per `stride` payload bytes
    * — the video-sampling plumbing (deterministic row explosion, frame count
    * derived from payload size) without a codec. frame_hash stands in for the
    * decoded frame tensor. */
  def sampleFrames(withPayloads: DataFrame, stride: Int): DataFrame =
    withPayloads.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0L),
          greatest(ceil(col("meta.n_bytes").cast("double") / stride).cast("long") - 1, lit(0L))),
        i => h32(concat(col("doc_id").cast("string"), lit(":"), i.cast("string")))))
        .as(Seq("frame_no", "frame_hash")))
}
