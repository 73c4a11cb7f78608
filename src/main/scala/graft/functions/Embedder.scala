package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** The embedding-model boundary (SURVEY §2 A2): the reference calls
  * SentenceTransformer all-MiniLM-L6-v2 in batch (`embedding.py:16,32`,
  * batch_size=1024) — an external PyTorch model that is NOT re-implemented in
  * SQL. In this engine embeddings are data (precomputed columns); when a model
  * must run inside the pipeline it plugs in here: a per-partition batched map
  * (the Scala analog of a batched `mapInPandas` UDF), so the model loads once
  * per partition, not per row, and the cluster scales the encode horizontally.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Encode one text. Implementations should be pure + deterministic. */
  def embed(text: String): Array[Float]
  /** Model-call batch size (the reference's `batch_size=1024` analog,
    * `embedding.py:32`) — [[Embedder.encode]] groups each partition's rows
    * into batches of this size before calling [[embedBatch]]. */
  def batchSize: Int = 256
  /** Encode a batch in one model call. Default delegates per-text; real
    * model backends ([[OnnxEmbedder]]) override with a true batched forward
    * pass — the GPU/BLAS utilization lever at the A2 boundary. */
  def embedBatch(texts: Array[String]): Array[Array[Float]] = texts.map(embed)
}

/** Deterministic bag-of-hashed-words embedder standing in for the MiniLM
  * boundary (the container has no torch/ONNX): token → portable-h32 bucket,
  * counts L2-normalized. Deterministic, order-insensitive, vocabulary-free —
  * good enough to make end-to-end embed→index→search flows real and testable.
  * A production encoder (ONNX Runtime / JNI) replaces `embed` only; the
  * partition-batched plumbing is identical.
  */
final case class HashEmbedder(dim: Int = 64) extends Embedder {
  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    var any = false
    text.split(" ").foreach { tok =>
      if (tok.nonEmpty) {
        val b = (PortableHash.h32(tok.getBytes("UTF-8")) % dim).toInt
        v(b) += 1f
        any = true
      }
    }
    if (any) {
      var s = 0.0
      var i = 0
      while (i < dim) { s += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(s)
      i = 0
      while (i < dim) { v(i) = (v(i) / n).toFloat; i += 1 }
    }
    v
  }
}

object Embedder {
  /** Batch-encode a text column: `(id, text) -> (id, embedding ARRAY<FLOAT>)`.
    * mapPartitions so an expensive model would initialize once per partition
    * (the reference's batch_size=1024 analog); no shuffle, scales with the
    * scan. */
  def encode(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      embedder: Embedder): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    ds.mapPartitions { it =>
      // model init happens on first batch, once per partition (OnnxEmbedder
      // opens its session lazily); grouped() keeps at most one batch of
      // texts in memory while streaming the partition through the model
      it.grouped(embedder.batchSize).flatMap { chunk =>
        val ids = chunk.map(_._1)
        val vecs = embedder.embedBatch(chunk.map(_._2).toArray)
        ids.lazyZip(vecs).map { case (id, v) => (id, v) }
      }
    }.toDF(idCol, "embedding")
  }

  /** Select the A2 backend from the environment: `GRAFT_ONNX_MODEL` +
    * `GRAFT_ONNX_VOCAB` (and the ONNX runtime on the classpath) activate
    * the real MiniLM arm; otherwise the deterministic hermetic stand-in.
    * The declared default everywhere in this repo is [[HashEmbedder]] —
    * this factory is the ONE opt-in switch, so no hermetic test or oracle
    * can silently depend on the model being present. */
  def forEnv(dim: Int = 64): Embedder =
    (sys.env.get("GRAFT_ONNX_MODEL"), sys.env.get("GRAFT_ONNX_VOCAB")) match {
      case (Some(model), Some(vocab)) if OnnxRuntime.available =>
        OnnxEmbedder(model, vocab)
      case _ => HashEmbedder(dim)
    }
}
