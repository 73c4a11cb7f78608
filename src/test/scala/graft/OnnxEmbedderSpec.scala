package graft

import org.apache.spark.sql.functions._

import graft.functions._

/** The real-model arm of the A2 boundary (verdict r12 #3). Everything
  * except the transformer forward pass is hermetic: the WordPiece
  * tokenizer, the MiniLM mean-pool/normalize head, and the batched
  * tokenize→forward→pool assembly are tested against hand-computed values
  * and a deterministic fake forward. The final test runs ONLY when
  * `GRAFT_ONNX_MODEL`/`GRAFT_ONNX_VOCAB` point at an exported
  * all-MiniLM-L6-v2 with onnxruntime on the classpath (this container has
  * neither — zero egress — so it cancels cleanly): it upgrades the
  * reference's eyeball test (`README.md:35-39`, `test.py:13-25`) to an
  * assert that OUR embedding of each golden query TEXT matches the
  * reference's shipped `query{1..5}.bin` vector and retrieves the same
  * top-5. */
class OnnxEmbedderSpec extends SparkSpec {

  // toy vocab: ids = positions. Includes specials + pieces for hand checks.
  private val toyVocab = Seq(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", // 0..3
    "the", "taj", "mah", "##al", "##s", "what", "is", "rate", // 4..11
    "learn", "##ing", ",", "?", "grad", "##ient") // 12..17
    .zipWithIndex.toMap
  private val tok = new WordPieceTokenizer(toyVocab, maxLen = 10)

  test("basic tokenizer: lowercase, whitespace split, punctuation isolation") {
    assert(tok.basicTokens("The Taj,MAHAL?").toSeq ==
      Seq("the", "taj", ",", "mahal", "?"))
    assert(tok.basicTokens("  \t ").isEmpty)
  }

  test("wordpiece: greedy longest-match with ## continuations; UNK on any gap") {
    assert(tok.wordpieces("learning").toSeq == Seq(12L, 13L)) // learn ##ing
    assert(tok.wordpieces("mahal").toSeq == Seq(6L, 7L))      // mah ##al
    assert(tok.wordpieces("mahals").toSeq == Seq(6L, 7L, 8L)) // mah ##al ##s
    assert(tok.wordpieces("gradient").toSeq == Seq(16L, 17L))
    assert(tok.wordpieces("xyz").toSeq == Seq(1L))            // [UNK]
    // an unmatchable TAIL voids the whole word (BERT semantics), even when
    // a prefix matched
    assert(tok.wordpieces("thex").toSeq == Seq(1L))
  }

  test("encode: [CLS]/[SEP] framing, PAD fill, attention mask, truncation") {
    val (ids, mask) = tok.encode("what is the learning rate?")
    // [CLS] what is the learn ##ing rate ? [SEP] [PAD]
    assert(ids.toSeq == Seq(2L, 9L, 10L, 4L, 12L, 13L, 11L, 15L, 3L, 0L))
    assert(mask.toSeq == Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 0L))
    // over-long input truncates the BODY to maxLen-2 and keeps the [SEP]
    val (ids2, mask2) = tok.encode("the the the the the the the the the the")
    assert(ids2.toSeq == Seq(2L) ++ Seq.fill(8)(4L) :+ 3L)
    assert(mask2.forall(_ == 1L))
  }

  test("tokenizer edges: empty text, unicode punctuation, long-word guard") {
    // empty / whitespace-only text still frames validly: [CLS] [SEP] + PADs
    val (ids, mask) = tok.encode("")
    assert(ids.toSeq == Seq(2L, 3L) ++ Seq.fill(8)(0L))
    assert(mask.toSeq == Seq(1L, 1L) ++ Seq.fill(8)(0L))
    // unicode punctuation splits like ASCII punctuation (BERT P*-class rule)
    assert(tok.basicTokens("the“taj”").toSeq ==
      Seq("the", "“", "taj", "”"))
    // ASCII symbols BERT treats as punctuation even where Unicode disagrees
    assert(tok.basicTokens("the$taj").toSeq == Seq("the", "$", "taj"))
    // the >100-char word guard short-circuits to [UNK] (BERT semantics)
    assert(tok.wordpieces("the" * 40).toSeq == Seq(1L))
    // control chars are dropped, not split on
    assert(tok.basicTokens("ta\u0000j").toSeq == Seq("taj"))
  }

  test("mean pooling: masked mean then L2 normalize, zero-safe") {
    val hidden = Array(
      Array(1f, 0f), // [CLS] — masked in
      Array(3f, 4f),
      Array(100f, 100f)) // PAD position — mask 0, must not contribute
    val v = SentencePooling.meanPoolNormalize(hidden, Array(1L, 1L, 0L))
    // mean = (2, 2), normalized = (1/√2, 1/√2)
    assert(math.abs(v(0) - 1 / math.sqrt(2)) < 1e-6)
    assert(math.abs(v(1) - 1 / math.sqrt(2)) < 1e-6)
    val z = SentencePooling.meanPoolNormalize(
      Array(Array(0f, 0f)), Array(1L))
    assert(z.toSeq == Seq(0f, 0f)) // zero vector stays zero, no NaN
  }

  // deterministic fake forward: state(pos, j) = ids(pos) * (j+1) — enough
  // structure that pooling mistakes (wrong mask, wrong axis) change values
  private def fakeForward(dim: Int)(
      ids: Array[Array[Long]], mask: Array[Array[Long]]): Array[Array[Array[Float]]] =
    ids.map(_.map(id => Array.tabulate(dim)(j => (id * (j + 1)).toFloat)))

  test("TransformerEmbedder: batch == single, pooling honors the mask") {
    val core = new TransformerEmbedder(tok, 4, fakeForward(4))
    val texts = Array("what is the learning rate?", "the taj mahal", "xyz")
    val batch = core.embedBatch(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(core.embedBatch(Array(t)).head.toSeq == batch(i).toSeq,
        s"batch/single divergence for '$t'")
    }
    // hand check: "the taj mahal" → ids [CLS]=2, 4, 5, 6, 7, [SEP]=3;
    // masked mean of ids = (2+4+5+6+7+3)/6 = 4.5 → direction (1,2,3,4)/‖·‖
    val expectDir = Array(1f, 2f, 3f, 4f)
    val n = math.sqrt(expectDir.map(x => x * x).sum)
    batch(1).zip(expectDir).foreach { case (got, e) =>
      assert(math.abs(got - e / n) < 1e-6) }
  }

  test("Embedder.encode streams partition batches through embedBatch") {
    // a counting embedder proves encode() batches by batchSize and loses no
    // row; an accumulator (not plain JVM state) because the task closure is
    // serialized per task even in local mode
    val calls = spark.sparkContext.longAccumulator("embed-batches")
    val counting = new Embedder {
      val dim = 2
      override val batchSize = 3
      def embed(text: String): Array[Float] = Array(text.length.toFloat, 1f)
      override def embedBatch(texts: Array[String]): Array[Array[Float]] = {
        calls.add(1); require(texts.length <= batchSize); texts.map(embed)
      }
    }
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, "x" * i.toInt)).toDF("id", "text")
      .repartition(2)
    val out = Embedder.encode(spark, df, "id", "text", counting).collect()
    assert(out.length == 10)
    assert(calls.value >= 4, s"expected ≥4 batches of ≤3 over 2 partitions, got ${calls.value}")
    val m = out.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(m(7L) == Seq(7f, 1f))
  }

  test("OnnxEmbedder is serializable and fails loudly without the runtime") {
    val e = OnnxEmbedder("/nonexistent/model.onnx", "/nonexistent/vocab.txt")
    // round-trips through java serialization (what Spark task closures need)
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(e); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray)).readObject()
      .asInstanceOf[OnnxEmbedder]
    assert(back.modelPath == e.modelPath)
    if (!OnnxRuntime.available) {
      val err = intercept[IllegalArgumentException](back.embed("x"))
      assert(err.getMessage.contains("onnxruntime"))
    }
  }

  test("forEnv: hermetic default unless the ONNX arm is fully configured") {
    // in this container the runtime is absent, so regardless of env vars the
    // factory must yield the deterministic stand-in
    assume(!OnnxRuntime.available)
    assert(Embedder.forEnv(64) == HashEmbedder(64))
  }

  test("GATED: real MiniLM matches the reference's golden query vectors") {
    val model = sys.env.get("GRAFT_ONNX_MODEL")
    val vocab = sys.env.get("GRAFT_ONNX_VOCAB")
    assume(model.isDefined && vocab.isDefined && OnnxRuntime.available,
      "set GRAFT_ONNX_MODEL/GRAFT_ONNX_VOCAB with onnxruntime on the classpath")
    val e = OnnxEmbedder(model.get, vocab.get)
    val queries = Seq( // README.md:35-39 — the texts behind query{1..5}.bin
      "What is learning rate in gradient descent?",
      "What is Microbial biogeography?",
      "Give me details about The Arch of Cabanes.",
      "Give me details about the history of the Taj Mahal.",
      "Tell me something about the labelling used on aid packages created and sent under the Marshall Plan")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb + 1e-8)
    }
    queries.zipWithIndex.foreach { case (q, i) =>
      val ours = e.embed(q)
      val ref = graft.sources.BinaryVectors
        .readFile(s"/root/reference/queries_data/query${i + 1}.bin", 384)(0)
      assert(cos(ours, ref) > 0.99,
        s"query ${i + 1}: ONNX embedding diverges from the reference vector")
      // retrieval equivalence on the shipped corpus: same top-5 articles
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      def top5(qv: Array[Float]) = emb
        .withColumn("sim", GraftFunctions.cosineSim(col("embedding"), typedLit(qv)))
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(top5(ours) == top5(ref), s"query ${i + 1}: retrieval diverged")
    }
  }
}
