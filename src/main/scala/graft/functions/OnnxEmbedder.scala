package graft.functions

/** The REAL-model arm of the A2 embedding boundary (verdict r12 #3): the
  * reference encodes with SentenceTransformer all-MiniLM-L6-v2
  * (`embedding.py:16`, `test.py:10` — WordPiece tokenize → 6-layer encoder →
  * attention-mask mean pooling → L2 normalize). This file makes every part
  * of that contract REAL and hermetically tested EXCEPT the 6-layer
  * transformer forward pass itself, which is delegated to an ONNX Runtime
  * session loaded reflectively — so the repo keeps zero extra dependencies
  * (this container has no ONNX jar and no egress) while a deployment that
  * drops `onnxruntime.jar` on the classpath and exports the HF model gets
  * the reference's true encoder through the exact same partition-batched
  * [[Embedder.encode]] plumbing as the hermetic [[HashEmbedder]].
  *
  * Layering (each seam hermetically tested without the model):
  *  - [[WordPieceTokenizer]] — BERT-uncased basic+wordpiece tokenization
  *    from a vocab.txt, `[CLS] … [SEP]` framing, max-length truncation,
  *    attention masks.
  *  - [[SentencePooling]] — the MiniLM pooling head: masked mean over token
  *    states, then L2 normalization.
  *  - [[TransformerEmbedder]] — batching + tokenize + pool around an
  *    injected `runBatch` forward function (the test seam; a fake forward
  *    exercises everything but matmuls).
  *  - [[OnnxEmbedder]] — [[TransformerEmbedder]] whose `runBatch` is an
  *    ONNX Runtime InferenceSession reached via reflection
  *    ([[OnnxRuntime]]); a serializable (path-only) case class whose
  *    session initializes lazily once per executor JVM.
  */
object WordPieceTokenizer {

  /** Load a HuggingFace-format `vocab.txt` (token id = line number). */
  def fromFile(path: String, maxLen: Int = 128): WordPieceTokenizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try new WordPieceTokenizer(src.getLines().zipWithIndex.map {
      case (t, i) => (t, i)
    }.toMap, maxLen)
    finally src.close()
  }
}

/** BERT-uncased tokenization (the all-MiniLM-L6-v2 preprocessor): lowercase,
  * strip control chars, split on whitespace and around punctuation/CJK, then
  * greedy longest-match WordPiece with `##` continuation pieces; words with
  * no valid piece decomposition become `[UNK]`. Output is framed
  * `[CLS] pieces… [SEP]` and truncated to `maxLen` total positions (the
  * SentenceTransformer default truncation side: tail). */
final class WordPieceTokenizer(vocab: Map[String, Int], val maxLen: Int = 128)
    extends Serializable {
  require(maxLen >= 3, s"maxLen $maxLen cannot fit [CLS] x [SEP]")
  val clsId: Long = special("[CLS]")
  val sepId: Long = special("[SEP]")
  val padId: Long = special("[PAD]")
  val unkId: Long = special("[UNK]")
  private def special(t: String): Long = vocab.getOrElse(t,
    throw new IllegalArgumentException(s"vocab missing special token $t")).toLong

  private def isPunct(c: Char): Boolean = {
    // BERT's definition: ASCII non-alphanumeric ranges count as punctuation
    // even where Unicode disagrees (e.g. '$', '+'), plus Unicode P* classes
    val ascii = (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
      (c >= 91 && c <= 96) || (c >= 123 && c <= 126)
    ascii || {
      val t = Character.getType(c)
      t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
      t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
      t == Character.INITIAL_QUOTE_PUNCTUATION ||
      t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
    }
  }

  /** Basic tokenizer: lowercase + whitespace split + punctuation isolation. */
  private[graft] def basicTokens(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    def flush(): Unit = if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
    text.toLowerCase.foreach { c =>
      if (Character.isWhitespace(c)) flush()
      else if (Character.isISOControl(c)) () // drop control chars
      else if (isPunct(c)) { flush(); out += c.toString }
      else cur.append(c)
    }
    flush()
    out.toArray
  }

  /** Greedy longest-match-first subword split of one basic token. */
  private[graft] def wordpieces(token: String): Array[Long] = {
    if (token.length > 100) return Array(unkId) // BERT's long-word guard
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    while (start < token.length) {
      var end = token.length
      var found = -1
      while (end > start && found < 0) {
        val sub = (if (start > 0) "##" else "") + token.substring(start, end)
        vocab.get(sub) match {
          case Some(id) => found = id
          case None => end -= 1
        }
      }
      if (found < 0) return Array(unkId) // any unmatchable span voids the word
      pieces += found.toLong
      start = end
    }
    pieces.toArray
  }

  /** `(input_ids, attention_mask)`, both length `maxLen` (PAD-filled). */
  def encode(text: String): (Array[Long], Array[Long]) = {
    val body = basicTokens(text).flatMap(wordpieces).take(maxLen - 2)
    val ids = new Array[Long](maxLen)
    val mask = new Array[Long](maxLen)
    ids(0) = clsId; mask(0) = 1L
    var i = 0
    while (i < body.length) { ids(i + 1) = body(i); mask(i + 1) = 1L; i += 1 }
    ids(body.length + 1) = sepId; mask(body.length + 1) = 1L
    i = body.length + 2
    while (i < maxLen) { ids(i) = padId; i += 1 } // mask already 0
    (ids, mask)
  }
}

/** The all-MiniLM-L6-v2 pooling head (sentence-transformers' published
  * config: mean pooling over the attention mask, then L2 normalize). */
object SentencePooling {
  /** `hidden`: (seqLen, dim) token states for ONE text; `mask`: 1/0 per
    * position. Mean over unmasked positions, L2-normalized (the model's
    * `normalize_embeddings=True` serving form, which the cosine contract
    * downstream assumes). */
  def meanPoolNormalize(hidden: Array[Array[Float]], mask: Array[Long]): Array[Float] = {
    require(hidden.nonEmpty, "empty hidden state")
    val dim = hidden(0).length
    val acc = new Array[Double](dim)
    var n = 0L
    var i = 0
    while (i < hidden.length && i < mask.length) {
      if (mask(i) == 1L) {
        val row = hidden(i)
        var j = 0
        while (j < dim) { acc(j) += row(j); j += 1 }
        n += 1
      }
      i += 1
    }
    val denom = math.max(n, 1L).toDouble
    var s = 0.0
    var j = 0
    while (j < dim) { acc(j) /= denom; s += acc(j) * acc(j); j += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) {
      out(j) = if (norm > 0) (acc(j) / norm).toFloat else 0f
      j += 1
    }
    out
  }
}

/** Tokenize → forward → pool around an injected forward pass. `runBatch`
  * takes (batch of input_ids, batch of attention_mask), both
  * (batch, maxLen), and returns last_hidden_state (batch, maxLen, dim) —
  * the ONNX session's contract, injectable so the whole embedder minus the
  * matmuls is hermetically testable. NOT serializable by itself; Spark-side
  * use goes through [[OnnxEmbedder]], which reconstructs it per executor. */
final class TransformerEmbedder(
    tokenizer: WordPieceTokenizer,
    val dim: Int,
    runBatch: (Array[Array[Long]], Array[Array[Long]]) => Array[Array[Array[Float]]]) {

  def embedBatch(texts: Array[String]): Array[Array[Float]] = {
    if (texts.isEmpty) return Array.empty
    val enc = texts.map(tokenizer.encode)
    val hidden = runBatch(enc.map(_._1), enc.map(_._2))
    require(hidden.length == texts.length,
      s"model returned ${hidden.length} states for ${texts.length} texts")
    hidden.zip(enc).map { case (h, (_, mask)) =>
      val v = SentencePooling.meanPoolNormalize(h, mask)
      require(v.length == dim, s"model dim ${v.length}, declared $dim")
      v
    }
  }
}

/** Reflection adapter over the ONNX Runtime Java API (`ai.onnxruntime.*`) —
  * resolved by name so the repo compiles and runs with no ONNX dependency;
  * [[available]] is false in this container and the real arm stays dormant.
  * API shapes used (all public, stable since onnxruntime 1.8):
  * `OrtEnvironment.getEnvironment()`, `env.createSession(path)`,
  * `OnnxTensor.createTensor(env, long[][])`, `session.run(Map)`,
  * `result.get(0).getValue() : float[][][]`, plus `close()` on
  * tensors/results. */
object OnnxRuntime {
  private def cls(name: String): Option[Class[_]] =
    try Some(Class.forName(name)) catch { case _: ClassNotFoundException => None }

  def available: Boolean = cls("ai.onnxruntime.OrtEnvironment").isDefined

  /** (environment, session) for a model file; throws if the runtime or the
    * model is absent — callers gate on [[available]] first. */
  def newSession(modelPath: String): (AnyRef, AnyRef) = {
    val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
    val env = envCls.getMethod("getEnvironment").invoke(null)
    val session = envCls.getMethod("createSession", classOf[String])
      .invoke(env, modelPath)
    (env.asInstanceOf[AnyRef], session.asInstanceOf[AnyRef])
  }

  /** Declared input names of the session (MiniLM exports take input_ids +
    * attention_mask, most also token_type_ids — fed zeros when present). */
  def inputNames(session: AnyRef): Set[String] = {
    import scala.jdk.CollectionConverters._
    session.getClass.getMethod("getInputNames").invoke(session)
      .asInstanceOf[java.util.Set[String]].asScala.toSet
  }

  /** One forward pass: returns last_hidden_state (batch, seqLen, dim). */
  def run(env: AnyRef, session: AnyRef, names: Set[String],
      ids: Array[Array[Long]], mask: Array[Array[Long]]): Array[Array[Array[Float]]] = {
    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
    val create = tensorCls.getMethod("createTensor",
      Class.forName("ai.onnxruntime.OrtEnvironment"), classOf[Object])
    def tensor(a: Array[Array[Long]]): AnyRef =
      create.invoke(null, env, a).asInstanceOf[AnyRef]
    val inputs = new java.util.HashMap[String, AnyRef]()
    inputs.put("input_ids", tensor(ids))
    inputs.put("attention_mask", tensor(mask))
    if (names.contains("token_type_ids"))
      inputs.put("token_type_ids", tensor(ids.map(r => new Array[Long](r.length))))
    val runM = session.getClass.getMethods.find(m =>
      m.getName == "run" && m.getParameterCount == 1 &&
        m.getParameterTypes()(0).isAssignableFrom(classOf[java.util.HashMap[_, _]]))
      .getOrElse(throw new NoSuchMethodException("OrtSession.run(Map)"))
    val result = runM.invoke(session, inputs)
    try {
      val value = result.getClass.getMethod("get", classOf[Int])
        .invoke(result, Integer.valueOf(0))
      value.getClass.getMethod("getValue").invoke(value)
        .asInstanceOf[Array[Array[Array[Float]]]]
    } finally {
      result.getClass.getMethod("close").invoke(result)
      import scala.jdk.CollectionConverters._
      inputs.values().asScala.foreach(t =>
        t.getClass.getMethod("close").invoke(t))
    }
  }
}

/** The production [[Embedder]]: all-MiniLM-L6-v2 (or any BERT-family
  * sentence encoder) through ONNX Runtime. Serializable by PATH — each
  * executor JVM lazily opens its own session on first batch (the
  * once-per-partition init [[Embedder.encode]]'s mapPartitions was built
  * for, and the reference's load-model-once lifecycle). Hermetic default
  * stays [[HashEmbedder]]; select this arm via [[Embedder.forEnv]] with
  * `GRAFT_ONNX_MODEL`/`GRAFT_ONNX_VOCAB` set and the runtime on the
  * classpath. */
final case class OnnxEmbedder(
    modelPath: String,
    vocabPath: String,
    dim: Int = 384,
    maxLen: Int = 128,
    override val batchSize: Int = 32) extends Embedder {

  @transient private lazy val core: TransformerEmbedder = {
    require(OnnxRuntime.available,
      "ai.onnxruntime is not on the classpath — use HashEmbedder (the " +
        "hermetic default) or add onnxruntime.jar")
    val tok = WordPieceTokenizer.fromFile(vocabPath, maxLen)
    val (env, session) = OnnxRuntime.newSession(modelPath)
    val names = OnnxRuntime.inputNames(session)
    new TransformerEmbedder(tok, dim,
      (ids, mask) => OnnxRuntime.run(env, session, names, ids, mask))
  }

  override def embedBatch(texts: Array[String]): Array[Array[Float]] =
    core.embedBatch(texts)
  def embed(text: String): Array[Float] = embedBatch(Array(text)).head
}
