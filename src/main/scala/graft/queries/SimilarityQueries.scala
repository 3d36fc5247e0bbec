package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational.roundp

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.{Pca, Similarity}
import graft.text.TextAnalysis

/** Similarity search over `embeddings` (vec_id, embedding array<float>,
  * label) plus the hash-based near-dup pipelines and the multimodal decode
  * plumbing. The production xxhash64/splitmix pipelines carry FULL DuckDB
  * oracles via [[XxhashOracleSql]] (XXH64 replayed in wraparound HUGEINT
  * arithmetic); their portable-hash twins remain as the simpler
  * cross-engine formulation, and NoOracleCrossCheckSpec still cross-checks
  * the two families against each other.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)
  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  // The IVF codebook is trained ONCE per dataset and reused — the production
  // shape (an offline training job owns the codebook; queries only probe).
  // The first q_knn_ivf call on a dataset pays the k-means cost; repeat
  // calls (and the bench median) reflect the probe path, which is what
  // scales with corpus size.
  private val codebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Wrap a text column into a valid one-byte-per-char binary PGM: every
    * non-printable-ASCII CODE POINT becomes one '?' (Spark's regexp runs
    * Java regex over the string's code points, matching DuckDB's code-point
    * regexp — a supplementary-plane char yields ONE '?' on both sides;
    * pinned by MultimodalSpec), then the text is space-padded into a
    * 32-wide raster. Shared by q_multimodal_meta and its spec. */
  private[graft] def textAsPgm(text: Column): Column = {
    val ascii = regexp_replace(text, "[^\\x20-\\x7e]", "?")
    val h = greatest(ceil(length(ascii).cast("double") / 32).cast("int"), lit(1))
    encode(concat(lit("P5\n32 "), h.cast("string"), lit("\n255\n"),
      rpad(ascii, h * 32, lit(" "))), "UTF-8")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force exact top-5 cosine neighbors for the first 10 vectors:
    // the ANN baseline (broadcast queries × one corpus scan).
    "q_knn_cosine" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceKnn(e, e.filter(col("vec_id") < 10), k = 5)
    }),

    // LSH (random-hyperplane) bucketed ANN — the scale path. 8 tables ×
    // 6 planes: ~tables/2^6 ≈ 12% of the corpus scanned per query, recall
    // tuned by the OR-construction S-curve. Splitmix plane signs are
    // position-computable (no RNG state), so the oracle replays them in
    // closed form (XxhashOracleSql.knnLshOracle).
    "q_knn_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshKnn(e, e.filter(col("vec_id") < 10), dims = 64, numPlanes = 6, k = 5, tables = 8)
    }),

    // Per-label centroid-free stats: mean pairwise-comparable norm + count
    // (validates array arithmetic against the oracle).
    "q_embedding_norms" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), Similarity.l2Norm(col("embedding")).as("norm"))
        .groupBy(col("label"))
        .agg(roundp(avg(col("norm")), 4).as("avg_norm"), count(lit(1)).as("n"))),

    // IVF ANN with a CONVERGED deterministic codebook: seed-point init +
    // 10 Lloyd iterations (6dp-pinned means, the distributed training
    // loop of Ivf.lloydTrain — one scan + one k×d-cell shuffle per step),
    // then the nprobe=2 probe path. Previously this ran Spark-ML KMeans
    // (rows-only checked: kmeans||'s RNG isn't replayable); the ML path
    // stays available as Ivf.trainCentroids (IvfSpec covers its recall),
    // while the driver query trains deterministically so the ENTIRE
    // train→assign→probe→rerank lifecycle sits under the DuckDB oracle
    // (10 chained Lloyd CTE pairs). q_knn_ivf_trained keeps the 2-step
    // variant; 10 steps is past convergence on this corpus.
    "q_knn_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = codebooks.computeIfAbsent(s"$dir#lloyd10",
        _ => graft.similarity.Ivf.lloydTrain(e, "vec_id", "embedding", k = 8, iters = 10))
      graft.similarity.Ivf.ivfKnn(e, e.filter(col("vec_id") < 10), centroids, k = 5, nprobe = 2)
    }),

    // The IVF PROBE PATH fully oracled: k-means training swapped for a
    // deterministic seed-point quantizer (the embeddings of vec_id 0..7 —
    // the classic random-point init, 8 driver-collected rows), leaving
    // every probe-side step — squared-L2 cell assignment, nprobe=2
    // probing, exact-cosine rerank, deterministic tiebreaks — exact
    // arithmetic the oracle replays value-for-value. q_knn_ivf runs the
    // same path off the converged Lloyd-10 codebook.
    "q_knn_ivf_portable" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = graft.similarity.Ivf.seedCentroids(e, "vec_id", "embedding", k = 8)
      graft.similarity.Ivf.ivfKnn(e, e.filter(col("vec_id") < 10), centroids,
        k = 5, nprobe = 2)
    }),

    // Deterministic distributed k-means with the TRAINING LOOP itself under
    // the oracle: seed-point init (vec_id 0..7), two Lloyd steps whose
    // per-cell/dim means are rounded at 6dp (the q_embedding_centroids
    // move applied to training state), final assignment emitted. The
    // DuckDB oracle replays both iterations as chained CTEs (lloydCtes).
    "q_kmeans" -> ((s, dir) => {
      val e = emb(s, dir)
      val cs = graft.similarity.Ivf.lloydTrain(e, "vec_id", "embedding", k = 8, iters = 2)
      e.select(col("vec_id"), graft.similarity.Ivf.cellOf(col("embedding"), cs).as("cell"))
    }),

    // Trained ANN end to end under ONE oracle: the q_kmeans Lloyd codebook
    // (2 deterministic iterations) feeds the q_knn_ivf_portable probe path
    // (cell bucketing, nprobe=2, exact-cosine rerank) — training AND
    // search replayed value-for-value by the same chained CTEs. This is
    // the full IVF lifecycle a production pipeline runs; q_knn_ivf runs
    // it to convergence (10 iterations).
    "q_knn_ivf_trained" -> ((s, dir) => {
      val e = emb(s, dir)
      val cs = graft.similarity.Ivf.lloydTrain(e, "vec_id", "embedding", k = 8, iters = 2)
      graft.similarity.Ivf.ivfKnn(e, e.filter(col("vec_id") < 10), cs, k = 5, nprobe = 2)
    }),

    // SemDeDup-style semantic dedup (cluster-then-dedup-within-cluster):
    // a deterministic seed-point codebook (embeddings of the k lowest ids)
    // buckets the corpus in one map pass; near-dup cosine pairs are formed
    // WITHIN cells only (one shuffle on the cell key — the shape that
    // survives 100 TB, vs q_embedding_dedup's corpus-wide triangle join);
    // the lowest-id member of each neighborhood survives. Same 0.42
    // threshold as q_embedding_dedup, so the cross-cell recall gap is
    // measurable (SemanticDedupSpec). The cell count SCALES with the
    // corpus (autoNlist: constant ~256-vector target cells, floor 8 —
    // fixed k made within-cell pairing quadratic, 13.7× wall-time at 10×
    // rows; with k∝n it re-measured linear). At the oracled SFs (≤2000
    // vectors) autoNlist floors to exactly 8, and the oracle computes the
    // same greatest(8, ceil(n/256)) itself so the two can never drift.
    "q_semantic_dedup" -> ((s, dir) => {
      val e = emb(s, dir)
      val k = graft.similarity.Ivf.autoNlist(e.count())
      val centroids = graft.similarity.Ivf.seedCentroids(e, "vec_id", "embedding", k)
      Similarity.semanticDedup(e, centroids, threshold = 0.42)
    }),

    // The SRP-LSH bucketed-ANN pipeline over the PORTABLE plane family
    // (one closed-form Lehmer multiplication per ±1 weight): every bucket
    // bit, candidate pair, and rank SQL-replayable — the PortableHash move
    // applied to hyperplanes. 4 tables × 4 planes; q_knn_lsh keeps the
    // better-mixing splitmix planes (now also fully oracled).
    "q_knn_srp_portable" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshKnnPortable(e, e.filter(col("vec_id") < 10), dims = 64,
        planesPerTable = 4, tables = 4, k = 5)
    }),

    // MinHash + LSH banding near-dup candidates (xxhash64-based; the
    // oracle replays every token/shingle/permutation/band hash —
    // XxhashOracleSql.minhashLshOracle).
    "q_minhash_lsh" -> ((s, dir) => {
      val sigs = Dedup.minhashSignatures(docs(s, dir), col("doc_id"), col("text"),
        n = 3, numPerms = 32)
      Dedup.minhashLshCandidates(sigs, numPerms = 32, rowsPerBand = 4)
    }),

    // The SAME MinHash→banding→candidates pipeline over the PORTABLE hash
    // family (polynomial-mod-P string hash + Lehmer affine permutations):
    // every signature slot, band tuple, and candidate pair is exact
    // integer arithmetic, so unlike q_minhash_lsh the oracle rebuilds the
    // ENTIRE pipeline value-for-value. xxhash64 stays the production
    // default; this gate proves the algorithm, leaving only the hash
    // family choice outside it.
    "q_minhash_portable" -> ((s, dir) => {
      val sigs = Dedup.minhashSignaturesPortable(docs(s, dir), col("doc_id"), col("text"),
        n = 3, numPerms = 32)
      Dedup.minhashBandCandidatesExact(sigs, numPerms = 32, rowsPerBand = 4)
    }),

    // SimHash's bit-voting oracle-gated through the portable family: 32
    // universal bits per token occurrence, ±1 votes, positive tallies set
    // fingerprint bits — the oracle re-derives every vote and bit. The
    // xxhash64 q_simhash stays the production fingerprint.
    "q_simhash_portable" -> ((s, dir) =>
      Dedup.simhashPortable(docs(s, dir), col("doc_id"), col("text"), bits = 32)),

    // 64-bit SimHash fingerprints (xxhash64-based; fully oracled).
    // Widened scan: the SimHash64 kernel runs per document on the scan
    // partitions, and a compact file arrives as ONE — the 12.9x this
    // query read at 26x was scan shape, not the kernel (its portable
    // twin widens inside simhashPortable and read 3.6x).
    "q_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.widen(docs(s, dir)), col("doc_id"), col("text"))),

    // SimHash DEDUP completed end to end: portable fingerprints → Manku
    // block-banding (2 × 16-bit blocks; Hamming ≤ 1 ⇒ some block equal, by
    // pigeonhole) → per-block equi-join → exact XOR-popcount verify. The
    // oracle replays fingerprints, blocks, candidates, and popcounts.
    // Hamming ≤ 1 because the portable fingerprint is 32-bit: at ≤ 3 a
    // word-salad corpus of tight dup families admits ~10% of the pair
    // space (the production 64-bit [[Dedup.simhash]] supports ≤ 3 with
    // 16-bit blocks at the same bucket granularity).
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(
        Dedup.simhashPortable(docs(s, dir), col("doc_id"), col("text"), bits = 32),
        bits = 32, maxHamming = 1)),

    // Order-sensitive rolling-hash fingerprint (xxhash64-based; the
    // oracle replays the fold in closed polynomial form).
    "q_rolling_fp" -> ((s, dir) =>
      graft.queries.Tables.widen(docs(s, dir)).select(col("doc_id"),
        TextAnalysis.rollingHashFingerprint(col("text")).as("fp"))),

    // Multimodal decode plumbing through the REAL netpbm decoder: each doc
    // wrapped into a valid binary PGM (same construction as q_image_decode),
    // then header parse + raster checksum through the partition-batched
    // decode surface. The oracle recomputes ALL outputs — dims, byte count,
    // AND the pixel checksum (= sum of the padded text's ASCII codes) —
    // from the text alone, independently verifying the decoder end to end.
    "q_multimodal_meta" -> ((s, dir) => {
      Multimodal.extractMeta(s,
          docs(s, dir).select(col("doc_id"), textAsPgm(col("text")).as("blob")),
          Multimodal.NetpbmDecoder)
        .toDF().select(col("doc_id"), col("n_bytes"), col("width"),
          col("height"), col("checksum"))
    }),

    // REAL image transform end to end: text-as-PGM → 2×2 average-pool
    // downsample (decode → pool → re-encode, all integer arithmetic) →
    // decode the RESIZED image for its metadata. The oracle replays the
    // pooling from the text alone — padded ASCII grid, floor-averaged
    // blocks (partial edge blocks over their actual pixels) — so every
    // output byte of the resize is independently verified.
    "q_image_resize" -> ((s, dir) => {
      val src = docs(s, dir).select(col("doc_id"), textAsPgm(col("text")).as("blob"))
      Multimodal.extractMeta(s,
          Multimodal.resizeImages(s, src, factor = 2),
          Multimodal.NetpbmDecoder)
        .toDF().select(col("doc_id"), col("n_bytes"), col("width"),
          col("height"), col("checksum"))
    }),

    // REAL audio decode (the audio twin of q_multimodal_meta): each doc's
    // printable-ASCII bytes wrapped as 8-bit mono PCM WAV, decoded by the
    // real RIFF chunk-walking parser (Multimodal.WavDecoder) through the
    // partition-batched surface. The oracle recomputes every stat from the
    // character codes alone — container arithmetic for sizes, max code for
    // peak amplitude, exact integer Σs² for the energy sum.
    // REAL audio transform end to end: text-as-WAV → decimate by 4 (keep
    // every 4th sample, rate 8000 → 2000; deliberately filterless so the
    // oracle replays every byte) → re-decode the RESIZED audio for its
    // stats. The audio twin of q_image_resize.
    "q_audio_decimate" -> ((s, dir) => {
      import s.implicits._
      val ascii = regexp_replace(col("text"), "[^\\x20-\\x7e]", "?")
      val wavs = docs(s, dir)
        .select(col("doc_id"), encode(ascii, "UTF-8").as("pcm"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, b) =>
          (id, Multimodal.WavDecoder.decimateWav(
            Multimodal.WavDecoder.wavFromBytes(b, 8000), 4))
        })
        .toDF("doc_id", "blob")
      Multimodal.extractAudioMeta(s, wavs).toDF()
        .select(col("doc_id"), col("n_bytes"), col("sample_rate"), col("channels"),
          col("bits"), col("n_samples"), col("peak"), col("sum_sq"))
    }),

    "q_audio_meta" -> ((s, dir) => {
      import s.implicits._
      val ascii = regexp_replace(col("text"), "[^\\x20-\\x7e]", "?")
      val wavs = docs(s, dir)
        .select(col("doc_id"), encode(ascii, "UTF-8").as("pcm"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, b) =>
          (id, Multimodal.WavDecoder.wavFromBytes(b, 8000))
        })
        .toDF("doc_id", "blob")
      Multimodal.extractAudioMeta(s, wavs).toDF()
        .select(col("doc_id"), col("n_bytes"), col("sample_rate"), col("channels"),
          col("bits"), col("n_samples"), col("peak"), col("sum_sq"))
    }),

    // The REAL feature extractor oracle-gated: brightness-histogram
    // features from the text-as-PGM images (the decode→embed leg feeding
    // the ANN pipelines). The L1-normalized float histogram is
    // de-normalized back to exact integer bucket counts (count = ⌊f·n+½⌋
    // — float32 normalization error ~1e-7·n ≪ ½, so recovery is exact),
    // which the oracle recomputes from the text's character grid:
    // bucket(code) = code·8/256 = code div 32, padding = space = 32.
    "q_image_features" -> ((s, dir) => {
      val d = docs(s, dir)
      val feats = Multimodal.extractFeatures(s,
        d.select(col("doc_id"), textAsPgm(col("text")).as("blob")),
        dim = 8, Multimodal.NetpbmDecoder)
      val ascii = regexp_replace(col("text"), "[^\\x20-\\x7e]", "?")
      val h = greatest(ceil(length(ascii).cast("double") / 32).cast("int"), lit(1))
      val withN = d.select(col("doc_id"), (h * 32).cast("long").as("n_px"))
      val buckets = (0 until 8).map(b =>
        floor(element_at(col("embedding"), b + 1).cast("double") * col("n_px") + 0.5)
          .cast("long").as(s"b$b"))
      feats.join(withN, "doc_id")
        .select(col("doc_id") +: col("n_px") +: buckets: _*)
    }),

    // Multimodal frame sampling (the video path): 64-byte frames, every
    // 2nd kept — slicing is column arithmetic the oracle reproduces from
    // byte lengths alone. The payload is the doc's UTF-8 bytes standing in
    // for a video blob (the testdata carries no real video; frame slicing
    // never decodes, so any byte stream exercises it faithfully).
    "q_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
          docs(s, dir).withColumn("blob", encode(col("text"), "UTF-8")),
          frameBytes = 64, stride = 2)
        .select(col("doc_id"), col("frame_idx"), length(col("frame")).as("n_bytes"))),

    // Embedding-cosine near-duplicate pairs — the EXACT triangle-blocked
    // equi-join (1-Bucket-Theta): identical results to the O(n²) cross
    // join by construction, but planned as a shuffled equi-join on block
    // pairs with bounded per-task memory — no cartesian/BNLJ node. The
    // cross-join form remains the spec baseline; the LSH variant remains
    // the approximate path (see Similarity scaladoc for the measured
    // trade-off at this threshold).
    "q_embedding_dedup" -> ((s, dir) =>
      Similarity.cosineNearDupPairsBlocked(emb(s, dir), threshold = 0.42, blocks = 8)),

    // The LINEAR scale path of the embedding near-dup family: SRP-LSH
    // bucket collisions (4 tables × 4 portable planes) generate the
    // candidate pairs, exact cosine verifies at the same 0.42 threshold
    // as q_embedding_dedup — so the family now has all three faces
    // driver-gated: exact-blocked O(n²) (q_embedding_dedup), cell-confined
    // SemDeDup (q_semantic_dedup), and bucketed-LSH with equi-join-only
    // candidate generation (this). Recall < 1 by the OR-construction
    // S-curve; the oracle replays the SAME pipeline (bucket bits,
    // collisions, cosine) value-for-value, so approximation is part of
    // the spec, not slack in the check. planesPerTable scales with the
    // corpus (Similarity.autoPlanesPerTable — constant ~512-vector
    // buckets, candidate volume linear in n); the oracle recomputes the
    // same integer formula from count(*) so the two can never drift.
    "q_embedding_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.cosineNearDupPairsLshPortable(e, threshold = 0.42,
        dims = 64, planesPerTable = Similarity.autoPlanesPerTable(e.count()),
        tables = 4)
    }),

    // Per-label centroid vectors (the codebook-free embedding aggregate a
    // label-balanced corpus wants): one posexplode over the scan, one
    // (label, dim) hash aggregate — per-dimension partial means combine
    // map-side, so the shuffle moves labels x dims cells, not vectors.
    "q_embedding_centroids" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg(roundp(avg(col("x").cast("double")), 5).as("mean"),
          count(lit(1)).as("n"))),

    // Quantized-scan kNN: int8-code shortlist (4× cheaper corpus scan) +
    // exact float re-rank — the two-stage compressed-ANN design. Fully
    // deterministic arithmetic, so unlike IVF/LSH this approximate path is
    // hash-checked against a complete DuckDB oracle that replays the same
    // quantize → integer-dot shortlist → exact re-rank pipeline.
    "q_knn_quantized" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.quantizedKnn(e, e.filter(col("vec_id") < 10), k = 5, shortlist = 20)
    }),

    // Product-quantization ADC search (similarity.Pq — Jégou TPAMI'11):
    // the corpus encoded ONCE to 4 codes of 3 bits (4 seed-point
    // sub-codebooks over 16-dim slices, the NearestCell kernel per
    // subspace), then ranked per query ENTIRELY in the compressed domain
    // — a 10×4×8-entry exact-subdistance LUT folded into the expression,
    // approximate distance = 4 table lookups summed in fixed order. The
    // compressed-scan tier between q_knn_quantized (int8 + exact rerank)
    // and q_knn_ivf (cell pruning); at 100 TB the persisted codes table
    // is ~128× smaller than the vectors, which is the scan that
    // dominates ANN cost. Every code, LUT entry (6dp-rounded), and rank
    // is replayed value-for-value by the oracle.
    "q_knn_pq" -> ((s, dir) => {
      val e = emb(s, dir)
      val cbs = graft.similarity.Pq.seedCodebooks(e, "vec_id", "embedding", m = 4, ksub = 8)
      graft.similarity.Pq.adcKnn(e, e.filter(col("vec_id") < 10), cbs, k = 5)
    }),

    // IVF-PQ — the two pruning levers COMPOSED (FAISS IndexIVFPQ, the
    // production 100 TB ANN): the seed-point coarse index bounds WHICH
    // rows a query touches (nprobe=2 of 8 cells) and PQ codes bound WHAT
    // each touched row costs (4 LUT lookups, no float vector). Corpus
    // side is one map pass (cell + 4 codes) persisted bucketed by cell;
    // probe side is a queries×nprobe broadcast. Non-residual codes keep
    // cells, codes, LUT entries, and ranks all oracle-replayable.
    "q_knn_ivfpq" -> ((s, dir) => {
      val e = emb(s, dir)
      val centroids = graft.similarity.Ivf.seedCentroids(e, "vec_id", "embedding", 8)
      val cbs = graft.similarity.Pq.seedCodebooks(e, "vec_id", "embedding", m = 4, ksub = 8)
      graft.similarity.Pq.ivfpqKnn(e, e.filter(col("vec_id") < 10), centroids, cbs,
        k = 5, nprobe = 2)
    }),

    // Int8 embedding quantization (the 4× ANN-corpus compression): per
    // vector the scale and the full integer code statistics, all
    // reproduced bit-for-bit by the DuckDB oracle from the same double
    // arithmetic (round-half-up via floor(+0.5) on both sides).
    "q_quantize_embed" -> ((s, dir) => {
      val q = Similarity.quantizeInt8(emb(s, dir), col("embedding"))
      q.select(col("vec_id"),
        size(col("q")).as("n_dims"),
        roundp(col("q_scale"), 8).as("scale_r"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("sum_q"),
        array_min(col("q")).as("min_q"),
        array_max(col("q")).as("max_q"),
        aggregate(col("q"), lit(0L), (a, x) => a + x.cast("bigint") * x).as("qnorm2"))
    }),

    // Covariance statistics for PCA over the int8-quantized codes: ONE
    // scan accumulates the 64×64 co-moment matrix + per-dim sums + n in a
    // single mergeable integer aggregate (functions.OuterProductAgg —
    // O(d²) state per task, merged elementwise; the explode formulation
    // would shuffle d²·N rows). Integer accumulation makes the result
    // independent of partitioning, so the derived covariance is
    // oracle-exact: cov_ij = (Σqᵢqⱼ − ΣqᵢΣqⱼ/n)/n with the identical
    // single-IEEE-op order on both engines.
    "q_embedding_covariance" -> ((s, dir) => {
      val d = 64
      val codes = Similarity.quantizeInt8(emb(s, dir), col("embedding"))
        .select(col("q").cast("array<int>").as("q"))
      val op = udaf(new graft.functions.OuterProductAgg(d),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
      val m = codes.agg(op(col("q")).as("m"))
      val n = element_at(col("m"), d * d + d + 1)
      val cells = transform(sequence(lit(0), lit(d * d - 1)), k => {
        val i = (k / d).cast("int")
        val j = pmod(k, lit(d)).cast("int")
        val sp = element_at(col("m"), k + 1)
        val si = element_at(col("m"), lit(d * d) + i + 1)
        val sj = element_at(col("m"), lit(d * d) + j + 1)
        struct(i.as("i"), j.as("j"), sp.as("sum_prod"),
          si.as("sum_i"), sj.as("sum_j"))
      })
      m.select(explode(cells).as("c"), n.as("n"))
        .select(col("c.i"), col("c.j"), col("c.sum_prod"),
          col("c.sum_i"), col("c.sum_j"), col("n"),
          roundp((col("c.sum_prod").cast("double")
            - col("c.sum_i").cast("double") * col("c.sum_j") / col("n")) / col("n"), 6)
            .as("cov"))
    }),

    // Johnson-Lindenstrauss dimensionality reduction 64→16 through the
    // Achlioptas {−1,0,+1} sparse projection (Similarity.projectSparse):
    // an all-INTEGER matvec over the int8 codes — no training pass, no
    // eigensolve, row-parallel at any scale, and exact on both engines
    // (the matrix is a frozen Lehmer function of the flat index, so the
    // oracle re-derives it entry for entry). Exploded to (vec_id, j, y)
    // rows so the hash compare sees scalars.
    "q_embedding_project" -> ((s, dir) =>
      Similarity.quantizeInt8(graft.queries.Tables.widen(emb(s, dir)), col("embedding"))
        .select(col("vec_id"), Similarity.projectSparse(col("q"), 16, 64).as("y"))
        // posexplode_OUTER: the non-outer form makes InferFiltersFromGenerate
        // push a `size(y) > 0` filter below the projections with the WHOLE
        // quantize+project chain inlined — a second full interpreted
        // evaluation per row (measured: 22 s of the 28.7 s pathology at
        // sf0.1). y is never null/empty here (kOut=16 literals), so outer
        // emits identical rows without the inferred filter.
        .select(col("vec_id"), posexplode_outer(col("y")).as(Seq("j", "y")))
        .select(col("vec_id"), col("j").cast("int").as("j"), col("y"))),

    // PCA top component by ALL-INTEGER power iteration (similarity.Pca)
    // — the third training loop fully under the oracle (trained BPE,
    // Lloyd k-means, now the eigensolve): distributed O(d²)-state
    // co-moment aggregate, 12 driver-side integer iterations (the d×d
    // solve is corpus-size-independent), distributed integer principal
    // scores. The oracle replays the ENTIRE optimization as 12 unrolled
    // matvec+renormalize CTE rounds over (i, val) rows — integer sums,
    // so no FP accumulation order exists to diverge.
    "q_pca_power" -> ((s, dir) =>
      Pca.principalScores(
        Similarity.quantizeInt8(emb(s, dir), col("embedding"))
          .select(col("vec_id"), col("q")),
        col("q"), d = 64, iters = 12)
        .select(col("vec_id"), col("score")))
  )

  // the portable minhash pipeline rebuilt in SQL: 3-gram string shingles,
  // poly(s) = sum ord(s_i)*31^i mod P over the first 48 chars, 32 Lehmer
  // affine permutations, per-doc minima, 8 bands of 4 joined on the raw
  // tuples — identical integer arithmetic to the Spark side
  private val minhashPortableOracle: String = {
    import graft.functions.PortableHash
    val pows = PortableHash.powers.mkString(", ")
    val (as, bs) = PortableHash.permConstants(32).unzip
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
       |  FROM documents),
       |shingled AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id,
       |           unnest(CASE WHEN len(t) < 3 THEN []
       |                  ELSE list_transform(range(1, len(t) - 1),
       |                       i -> array_to_string(t[i:i+2], ' ')) END) AS shingle
       |    FROM toks)),
       |hashed AS (
       |  SELECT doc_id,
       |         CAST(list_sum(list_transform(range(1, least(length(shingle), 48) + 1),
       |                i -> CAST(ord(substr(shingle, CAST(i AS INT), 1)) AS BIGINT) *
       |                     ([$pows])[CAST(i AS INT)]))
       |              % 2147483647 AS BIGINT) AS h
       |  FROM shingled),
       |perms AS (
       |  SELECT doc_id, j,
       |         min(CAST((h * ([${as.mkString(", ")}])[CAST(j + 1 AS INT)]
       |                   + ([${bs.mkString(", ")}])[CAST(j + 1 AS INT)])
       |                  % 2147483647 AS BIGINT)) AS m
       |  FROM hashed, (SELECT unnest(range(0, 32)) AS j) js
       |  GROUP BY doc_id, j),
       |sigs AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM perms GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, b,
       |         sig[CAST(4 * b + 1 AS INT)] AS s0, sig[CAST(4 * b + 2 AS INT)] AS s1,
       |         sig[CAST(4 * b + 3 AS INT)] AS s2, sig[CAST(4 * b + 4 AS INT)] AS s3
       |  FROM sigs, (SELECT unnest(range(0, 8)) AS b) bs)
       |SELECT a.doc_id AS id_a, c.doc_id AS id_b, count(*) AS n_shared_bands
       |FROM bands a JOIN bands c USING (b, s0, s1, s2, s3)
       |WHERE a.doc_id < c.doc_id
       |GROUP BY 1, 2""".stripMargin
  }

  // SimHash bit-voting rebuilt in SQL over the same portable family
  /** The portable SRP plane weights as a VALUES CTE body
    * `(1, [w…]), (2, [w…]), …` (flat plane id + 1, 64-element ±1 list) —
    * joined by plane id rather than inlined as a nested literal inside
    * the per-element lambda, where DuckDB re-materializes the whole
    * 4096-literal list per element (the MATERIALIZED-CTE perf trap:
    * inline form measured minutes, the join form seconds). The weights
    * are data-independent frozen constants of the family
    * (Similarity.planeSignPortable), so literals ARE the replay — the
    * powers/permConstants precedent. */
  private def planeWeightValues(nPlanes: Int): String =
    (0 until nPlanes).map { pl =>
      "(" + (pl + 1) + ", [" + (0 until 64).map(d =>
        if (graft.similarity.Similarity.planeSignPortable(pl, d, 64) > 0) "1.0" else "-1.0")
        .mkString(", ") + "])"
    }.mkString(", ")

  private val simhashPortableOracle: String = {
    import graft.functions.PortableHash
    val pows = PortableHash.powers.mkString(", ")
    val (as, bs) = PortableHash.permConstants(32).unzip
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS t
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id,
       |         CASE WHEN length(t) = 0 THEN 0
       |              ELSE CAST(list_sum(list_transform(range(1, least(length(t), 48) + 1),
       |                     i -> CAST(ord(substr(t, CAST(i AS INT), 1)) AS BIGINT) *
       |                          ([$pows])[CAST(i AS INT)]))
       |                   % 2147483647 AS BIGINT) END AS h
       |  FROM toks),
       |votes AS (
       |  SELECT doc_id, b,
       |         sum(CASE WHEN (h * ([${as.mkString(", ")}])[CAST(b + 1 AS INT)]
       |                        + ([${bs.mkString(", ")}])[CAST(b + 1 AS INT)])
       |                       % 2147483647 % 2 = 1
       |                  THEN 1 ELSE -1 END) AS v
       |  FROM hashed, (SELECT unnest(range(0, 32)) AS b) bsrc
       |  GROUP BY doc_id, b)
       |SELECT doc_id,
       |       CAST(sum(CASE WHEN v > 0
       |                     THEN CAST(1 AS BIGINT) << CAST(b AS INT)
       |                     ELSE 0 END) AS BIGINT) AS simhash
       |FROM votes GROUP BY doc_id""".stripMargin
  }

  // block-banded pairing over the portable fingerprints: the fp CTE is the
  // whole simhash oracle, then 16-bit blocks, per-block join, XOR popcount
  private val simhashPairsOracle: String =
    s"""WITH fp AS ($simhashPortableOracle),
       |blocks AS (
       |  SELECT doc_id, simhash, b,
       |         (simhash >> CAST(b * 16 AS INT)) & 65535 AS bv
       |  FROM fp, (SELECT unnest(range(0, 2)) AS b) bs),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, a.simhash AS ha,
       |                  c.doc_id AS id_b, c.simhash AS hb
       |  FROM blocks a JOIN blocks c
       |    ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= 1""".stripMargin

  /** The deterministic Lloyd training chain as DuckDB CTEs — c0 (seed
    * centroids = embeddings of vec_id 0..7) through c2 (after two
    * iterations): assignment = squared-L2 argmin with lowest-cell
    * tiebreak, per-(cell, dim) means floor-rounded at 6dp, empty cells
    * keeping their previous centroid via LEFT JOIN + coalesce. Shared by
    * the q_kmeans oracle (final assignment) and the q_knn_ivf_trained
    * oracle (codebook feeding the probe CTEs). */
  /** `iters` chained Lloyd steps as CTEs c0..c{iters}: seed centroids
    * (vec_id < 8), per-iteration squared-L2 assignment with lowest-cell
    * tiebreak, 6dp-pinned per-(cell,dim) means, empty cells keeping the
    * previous centroid — the SQL replay of [[graft.similarity.Ivf
    * .lloydTrain]]. Generated so q_kmeans/q_knn_ivf_trained (2 steps)
    * and q_knn_ivf (10 steps, converged) share one definition. */
  private def lloydCtes(iters: Int): String = {
    // MATERIALIZED is load-bearing: plain CTEs are textually inlined and
    // c_i references c_{i-1} through BOTH the assignment and the
    // empty-cell fallback, so a 10-iteration chain expands ~2^10 copies
    // of the full assignment scan (measured ~10 MINUTES for q_knn_ivf at
    // sf0.1; materialized: seconds).
    val c0 =
      """c0 AS MATERIALIZED (
        |  SELECT vec_id AS cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
        |  FROM embeddings WHERE vec_id < 8)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""a$i AS MATERIALIZED (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, s.cell,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             list_sum(list_transform(range(1, len(e.embedding) + 1),
         |               i -> (CAST(e.embedding[i] AS DOUBLE) - s.c[i])
         |                    * (CAST(e.embedding[i] AS DOUBLE) - s.c[i]))), s.cell) AS rnk
         |    FROM embeddings e, c${i - 1} s) WHERE rnk = 1),
         |m$i AS MATERIALIZED (
         |  SELECT cell, d,
         |         floor(avg(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE)) * 1000000 + 0.5)
         |           / 1000000 AS m
         |  FROM (SELECT cell, embedding, unnest(range(0, len(embedding))) AS d FROM a$i)
         |  GROUP BY cell, d),
         |c$i AS MATERIALIZED (
         |  SELECT s.cell, coalesce(m.c, s.c) AS c
         |  FROM c${i - 1} s LEFT JOIN (SELECT cell, list(m ORDER BY d) AS c FROM m$i GROUP BY cell) m
         |    ON s.cell = m.cell)""".stripMargin
    }
    (c0 +: steps).mkString(",\n")
  }

  private val lloydC2Ctes: String = lloydCtes(2)

  /** The IVF probe path as trailing CTEs + final SELECT over a trained
    * centroid CTE `(cell, c)`: squared-L2 distances to every centroid,
    * lowest-cell-tiebreak assignment, nprobe=2 probing for the query set
    * (vec_id < 10), exact-cosine rerank with 6dp floor-rounding. Shared
    * by q_knn_ivf_trained (c2) and q_knn_ivf (c10). */
  private def ivfProbeSql(centroidCte: String): String =
    s"""d AS (
       |  SELECT e.vec_id, e.embedding, s.cell,
       |         list_sum(list_transform(range(1, len(e.embedding) + 1),
       |           i -> (CAST(e.embedding[i] AS DOUBLE) - s.c[i])
       |                * (CAST(e.embedding[i] AS DOUBLE) - s.c[i]))) AS d2
       |  FROM embeddings e, $centroidCte s),
       |assign AS (
       |  SELECT vec_id AS n_id, embedding AS n_emb, cell FROM (
       |    SELECT vec_id, embedding, cell,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
       |    FROM d) WHERE rnk = 1),
       |probe AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, cell FROM (
       |    SELECT vec_id, embedding, cell,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
       |    FROM d WHERE vec_id < 10) WHERE rnk <= 2),
       |pairs AS (
       |  SELECT q_id, n_id,
       |         floor(list_cosine_similarity(
       |           list_transform(q_emb, x -> CAST(x AS DOUBLE)),
       |           list_transform(n_emb, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cos
       |  FROM probe JOIN assign USING (cell) WHERE n_id <> q_id),
       |ranked AS (
       |  SELECT q_id, n_id, cos,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rank
       |  FROM pairs)
       |SELECT q_id, n_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin

  /** The full PQ ADC pipeline as one statement, parameterized by the
    * query-set predicate (over alias `q`): per-subspace seed codebooks
    * (vec_id < 8 sliced 16-wide), squared-L2 code assignment with
    * lowest-code tiebreak, 6dp floor-rounded LUT entries, adc = the four
    * lookups summed left-to-right. Shared by q_knn_pq (vec_id < 10) and
    * q_streaming_knn (the streamed vec_id < 50 query set — per-query
    * results are batch-independent, so the replayed stream must equal
    * the batch ADC exactly). */
  private[queries] def pqAdcOracle(queryPred: String): String =
    s"""WITH cb AS (
       |  SELECT vec_id AS j, CAST(mm.m AS INT) AS m,
       |         list_transform(embedding[CAST(mm.m*16+1 AS INT) : CAST(mm.m*16+16 AS INT)],
       |                        x -> CAST(x AS DOUBLE)) AS c
       |  FROM embeddings, range(0, 4) mm(m) WHERE vec_id < 8),
       |codes AS (
       |  SELECT vec_id AS n_id, m, j AS code FROM (
       |    SELECT e.vec_id, cb.m, cb.j,
       |           row_number() OVER (PARTITION BY e.vec_id, cb.m ORDER BY
       |             list_sum(list_transform(range(1, 17),
       |               i -> (CAST(e.embedding[CAST(cb.m*16 + i AS INT)] AS DOUBLE) - cb.c[CAST(i AS INT)])
       |                    * (CAST(e.embedding[CAST(cb.m*16 + i AS INT)] AS DOUBLE) - cb.c[CAST(i AS INT)]))),
       |             cb.j) AS rnk
       |    FROM embeddings e, cb) WHERE rnk = 1),
       |cw AS (
       |  SELECT n_id,
       |         max(CASE WHEN m = 0 THEN code END) AS c0,
       |         max(CASE WHEN m = 1 THEN code END) AS c1,
       |         max(CASE WHEN m = 2 THEN code END) AS c2,
       |         max(CASE WHEN m = 3 THEN code END) AS c3
       |  FROM codes GROUP BY n_id),
       |lut AS (
       |  SELECT q.vec_id AS q_id, cb.m, cb.j,
       |         floor(list_sum(list_transform(range(1, 17),
       |           i -> (CAST(q.embedding[CAST(cb.m*16 + i AS INT)] AS DOUBLE) - cb.c[CAST(i AS INT)])
       |                * (CAST(q.embedding[CAST(cb.m*16 + i AS INT)] AS DOUBLE) - cb.c[CAST(i AS INT)])))
       |           * 1000000 + 0.5) / 1000000 AS d2
       |  FROM embeddings q, cb WHERE $queryPred),
       |adc AS (
       |  SELECT l0.q_id, cw.n_id, l0.d2 + l1.d2 + l2.d2 + l3.d2 AS adc
       |  FROM cw
       |  JOIN lut l0 ON l0.m = 0 AND l0.j = cw.c0
       |  JOIN lut l1 ON l1.m = 1 AND l1.j = cw.c1 AND l1.q_id = l0.q_id
       |  JOIN lut l2 ON l2.m = 2 AND l2.j = cw.c2 AND l2.q_id = l0.q_id
       |  JOIN lut l3 ON l3.m = 3 AND l3.j = cw.c3 AND l3.q_id = l0.q_id
       |  WHERE cw.n_id <> l0.q_id),
       |ranked AS (
       |  SELECT q_id, n_id, adc,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS INT) AS rank
       |  FROM adc)
       |SELECT q_id, n_id, adc, rank FROM ranked WHERE rank <= 5""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_minhash_portable" -> minhashPortableOracle,
    "q_simhash_portable" -> simhashPortableOracle,
    "q_simhash_pairs" -> simhashPairsOracle,
    "q_knn_cosine" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q_id, e.vec_id AS n_id,
        |         floor(list_cosine_similarity(
        |           list_transform(q_emb, x -> CAST(x AS DOUBLE)),
        |           list_transform(e.embedding, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cos
        |  FROM q, embeddings e WHERE e.vec_id <> q_id),
        |ranked AS (
        |  SELECT q_id, n_id, cos,
        |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rank
        |  FROM pairs)
        |SELECT q_id, n_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin,

    // the whole IVF probe path replayed: seed-point centroids (vec_id < 8),
    // squared-L2 assignment with first-min tiebreak (ORDER BY d2, cell ==
    // array_position's first minimum), nprobe=2, exact-cosine rerank
    "q_knn_ivf_portable" ->
      """WITH c AS (
        |  SELECT vec_id AS cell,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c_emb
        |  FROM embeddings WHERE vec_id < 8),
        |d AS (
        |  SELECT e.vec_id, e.embedding, c.cell,
        |         list_sum(list_transform(range(1, len(e.embedding) + 1),
        |           i -> (CAST(e.embedding[i] AS DOUBLE) - c.c_emb[i])
        |                * (CAST(e.embedding[i] AS DOUBLE) - c.c_emb[i]))) AS d2
        |  FROM embeddings e, c),
        |assign AS (
        |  SELECT vec_id AS n_id, embedding AS n_emb, cell FROM (
        |    SELECT vec_id, embedding, cell,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
        |    FROM d) WHERE rnk = 1),
        |probe AS (
        |  SELECT vec_id AS q_id, embedding AS q_emb, cell FROM (
        |    SELECT vec_id, embedding, cell,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
        |    FROM d WHERE vec_id < 10) WHERE rnk <= 2),
        |pairs AS (
        |  SELECT q_id, n_id,
        |         floor(list_cosine_similarity(
        |           list_transform(q_emb, x -> CAST(x AS DOUBLE)),
        |           list_transform(n_emb, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cos
        |  FROM probe JOIN assign USING (cell) WHERE n_id <> q_id),
        |ranked AS (
        |  SELECT q_id, n_id, cos,
        |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rank
        |  FROM pairs)
        |SELECT q_id, n_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin,

    // every SRP bucket bit re-derived from the frozen portable plane
    // weights (injected as literal ±1 tables — they are data-independent
    // constants, the powers/permConstants precedent), OR-construction
    // candidates, exact-cosine rerank
    "q_knn_srp_portable" ->
      s"""WITH w(pl, wl) AS (SELECT * FROM (VALUES ${planeWeightValues(16)})),
        |b AS (
        |  SELECT vec_id, t,
        |         sum(CASE WHEN proj > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS bucket
        |  FROM (
        |    SELECT e.vec_id, t.t, p.p,
        |           list_sum(list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * w.wl[CAST(i AS INT)])) AS proj
        |    FROM embeddings e, range(0, 4) t(t), range(0, 4) p(p), w
        |    WHERE w.pl = t.t * 4 + p.p + 1)
        |  GROUP BY vec_id, t),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
        |  FROM b q JOIN b n ON q.t = n.t AND q.bucket = n.bucket
        |  WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id),
        |pairs AS (
        |  SELECT c.q_id, c.n_id,
        |         floor(list_cosine_similarity(
        |           list_transform(eq.embedding, x -> CAST(x AS DOUBLE)),
        |           list_transform(en.embedding, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cos
        |  FROM cand c
        |  JOIN embeddings eq ON eq.vec_id = c.q_id
        |  JOIN embeddings en ON en.vec_id = c.n_id),
        |ranked AS (
        |  SELECT q_id, n_id, cos,
        |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rank
        |  FROM pairs)
        |SELECT q_id, n_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin,

    // both Lloyd iterations unrolled: assignment = argmin over squared-L2
    // (lowest-cell tiebreak, the q_knn_ivf_portable CTE), means rounded
    // floor(x*1e6+0.5)/1e6 per (cell, dim), empty cells keep the previous
    // centroid via LEFT JOIN + coalesce
    "q_kmeans" -> s"""WITH $lloydC2Ctes
        |SELECT vec_id, CAST(cell AS INT) AS cell FROM (
        |  SELECT e.vec_id, s.cell,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |           list_sum(list_transform(range(1, len(e.embedding) + 1),
        |             i -> (CAST(e.embedding[i] AS DOUBLE) - s.c[i])
        |                  * (CAST(e.embedding[i] AS DOUBLE) - s.c[i]))), s.cell) AS rnk
        |  FROM embeddings e, c2 s) WHERE rnk = 1""".stripMargin,

    // the Lloyd training CTEs feeding the q_knn_ivf_portable probe CTEs:
    // one statement replays codebook training, cell bucketing, nprobe=2
    // probing, and the exact-cosine rerank
    "q_knn_ivf_trained" -> (s"WITH ${lloydCtes(2)},\n" + ivfProbeSql("c2")),

    // q_knn_ivf: the converged-codebook variant — identical probe SQL
    // over 10 chained Lloyd CTE pairs (the deterministic replay of
    // Ivf.lloydTrain(k = 8, iters = 10))
    "q_knn_ivf" -> (s"WITH ${lloydCtes(10)},\n" + ivfProbeSql("c10")),

    // XXH64/splitmix production-hash pipelines replayed bit-for-bit
    // (XxhashOracleSql: wraparound HUGEINT arithmetic + MATERIALIZED CTE
    // chains) — the 4 formerly rows-only gates now under full oracles
    "q_simhash" -> XxhashOracleSql.simhashOracle,
    "q_rolling_fp" -> XxhashOracleSql.rollingFpOracle,
    "q_minhash_lsh" -> XxhashOracleSql.minhashLshOracle(),
    "q_knn_lsh" -> XxhashOracleSql.knnLshOracle(),


    // the q_knn_ivf_portable assignment CTE verbatim (seed centroids
    // vec_id 0..7, squared-L2, lowest-cell tiebreak), then within-cell
    // near-dup pairs and the lowest-id-survives anti-join
    "q_semantic_dedup" ->
      """WITH c AS (
        |  SELECT vec_id AS cell_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c_emb
        |  FROM embeddings
        |  WHERE vec_id < (SELECT greatest(8, CAST(ceil(count(*) / 256.0) AS BIGINT))
        |                  FROM embeddings)),
        |d AS (
        |  SELECT e.vec_id, e.embedding, c.cell_id,
        |         list_sum(list_transform(range(1, len(e.embedding) + 1),
        |           i -> (CAST(e.embedding[i] AS DOUBLE) - c.c_emb[i])
        |                * (CAST(e.embedding[i] AS DOUBLE) - c.c_emb[i]))) AS d2
        |  FROM embeddings e, c),
        |assign AS (
        |  SELECT vec_id, embedding, cell FROM (
        |    SELECT vec_id, embedding, cell_id AS cell,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell_id) AS rnk
        |    FROM d) WHERE rnk = 1),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE floor(list_cosine_similarity(
        |          list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |          list_transform(b.embedding, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 >= 0.42)
        |SELECT vec_id, CAST(cell AS INT) AS cell FROM assign
        |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin,

    "q_embedding_norms" ->
      """SELECT label,
        |       floor(avg(sqrt(list_sum(list_transform(embedding,
        |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) * 10000 + 0.5) / 10000 AS avg_norm,
        |       count(*) AS n
        |FROM embeddings GROUP BY label""".stripMargin,

    // the portable SRP buckets replayed bit-for-bit (the q_knn_srp_portable
    // CTE), with the data-dependent plane count re-derived from count(*)
    // by the same integer thresholds as Similarity.autoPlanesPerTable,
    // then: collision in any table → DISTINCT ordered pair → exact
    // cosine at the same threshold — the whole approximate pipeline under
    // a value-exact oracle
    "q_embedding_lsh" -> {
      val planeCases = (13 to 24)
        .map(k => s"(CASE WHEN count(*) > ${1L << k} THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH prm AS (SELECT 4 + $planeCases AS p FROM embeddings),
        |w(pl, wl) AS (SELECT * FROM (VALUES ${planeWeightValues(64)})),
        |b AS (
        |  SELECT vec_id, t,
        |         sum(CASE WHEN proj > 0 THEN CAST(1 AS BIGINT) << p0 ELSE 0 END) AS bucket
        |  FROM (
        |    SELECT e.vec_id, t.t, pp.p0,
        |           list_sum(list_transform(range(1, len(e.embedding) + 1),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * w.wl[CAST(i AS INT)])) AS proj
        |    FROM embeddings e, range(0, 4) t(t), range(0, 16) pp(p0), prm, w
        |    WHERE pp.p0 < prm.p AND w.pl = t.t * prm.p + pp.p0 + 1)
        |  GROUP BY vec_id, t),
        |cand AS (
        |  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
        |  FROM b l JOIN b r ON l.t = r.t AND l.bucket = r.bucket
        |  WHERE l.vec_id < r.vec_id)
        |SELECT id_a, id_b, cos FROM (
        |  SELECT c.id_a, c.id_b,
        |         floor(list_cosine_similarity(
        |           list_transform(ea.embedding, x -> CAST(x AS DOUBLE)),
        |           list_transform(eb.embedding, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cos
        |  FROM cand c
        |  JOIN embeddings ea ON ea.vec_id = c.id_a
        |  JOIN embeddings eb ON eb.vec_id = c.id_b)
        |WHERE cos >= 0.42""".stripMargin
    },

    "q_embedding_dedup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       floor(list_cosine_similarity(
        |         list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |         list_transform(b.embedding, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE floor(list_cosine_similarity(
        |        list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |        list_transform(b.embedding, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 >= 0.42""".stripMargin,

    // every decoded field recomputed from the text alone: header arithmetic
    // for dims/bytes, per-character ASCII-code sum (+ space padding) for
    // the raster checksum
    "q_multimodal_meta" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x20-\x7e]', '?', 'g') AS ascii
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, ascii,
        |         greatest(CAST(ceil(length(ascii) / 32.0) AS INT), 1) AS h
        |  FROM t)
        |SELECT doc_id,
        |       11 + length(CAST(h AS VARCHAR)) + 32 * h AS n_bytes,
        |       32 AS width, h AS height,
        |       CAST(coalesce(list_sum(list_transform(range(1, length(ascii) + 1),
        |              i -> ord(substr(ascii, CAST(i AS INT), 1)))), 0)
        |            + (32 * h - length(ascii)) * 32 AS BIGINT) AS checksum
        |FROM d""".stripMargin,

    // the 2x2 average-pool replayed from the text alone: the padded ASCII
    // grid (32 wide, space=32 padding), each output pixel the integer
    // floor-average of its block (last row-block of an odd-height image
    // averages 2 pixels, not 4), summed into the resized image's checksum;
    // dims/bytes from the resized header arithmetic (width 16, height
    // ceil(h/2), header 'P5\n16 ' + oh + '\n255\n' = 11 + len(oh) bytes)
    "q_image_resize" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x20-\x7e]', '?', 'g') AS ascii
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, ascii,
        |         greatest(CAST(ceil(length(ascii) / 32.0) AS INT), 1) AS h
        |  FROM t),
        |g AS (
        |  SELECT doc_id, h, CAST(ceil(h / 2.0) AS INT) AS oh,
        |         list_transform(range(1, 32 * h + 1),
        |           i -> CASE WHEN i <= length(ascii)
        |                     THEN ord(substr(ascii, CAST(i AS INT), 1))
        |                     ELSE 32 END) AS px
        |  FROM d),
        |p AS (
        |  SELECT doc_id, oh,
        |         list_sum(flatten(list_transform(range(0, oh), r ->
        |           list_transform(range(0, 16), c ->
        |             CASE WHEN 2 * r + 1 < h THEN
        |               (px[CAST(2*r*32 + 2*c + 1 AS INT)] + px[CAST(2*r*32 + 2*c + 2 AS INT)]
        |                + px[CAST((2*r+1)*32 + 2*c + 1 AS INT)] + px[CAST((2*r+1)*32 + 2*c + 2 AS INT)]) // 4
        |             ELSE
        |               (px[CAST(2*r*32 + 2*c + 1 AS INT)] + px[CAST(2*r*32 + 2*c + 2 AS INT)]) // 2
        |             END)))) AS checksum
        |  FROM g)
        |SELECT doc_id,
        |       11 + length(CAST(oh AS VARCHAR)) + 16 * oh AS n_bytes,
        |       16 AS width, oh AS height,
        |       CAST(checksum AS BIGINT) AS checksum
        |FROM p""".stripMargin,

    // every decoded audio stat recomputed from the character codes: the
    // 44-byte canonical header + one byte per sample, peak = max code,
    // energy = exact integer sum of squared codes
    "q_audio_meta" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x20-\x7e]', '?', 'g') AS ascii
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, ascii,
        |         list_transform(range(1, length(ascii) + 1),
        |           i -> ord(substr(ascii, CAST(i AS INT), 1))) AS cs
        |  FROM t)
        |SELECT doc_id,
        |       -- RIFF word alignment: odd data chunks carry a pad byte
        |       CAST(44 + length(ascii) + length(ascii) % 2 AS INT) AS n_bytes,
        |       8000 AS sample_rate, 1 AS channels, 8 AS bits,
        |       CAST(length(ascii) AS BIGINT) AS n_samples,
        |       CAST(coalesce(list_max(cs), 0) AS INT) AS peak,
        |       CAST(coalesce(list_sum(list_transform(cs, c -> c * c)), 0) AS BIGINT) AS sum_sq
        |FROM g""".stripMargin,

    // the decimated stats recomputed from the character codes at stride 4
    // (positions 1, 5, 9, … 1-based): container arithmetic for sizes,
    // max/Σs² over the kept samples only
    "q_audio_decimate" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x20-\x7e]', '?', 'g') AS ascii
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         list_transform(
        |           list_filter(range(1, length(ascii) + 1), i -> (i - 1) % 4 = 0),
        |           i -> ord(substr(ascii, CAST(i AS INT), 1))) AS cs
        |  FROM t)
        |SELECT doc_id,
        |       CAST(44 + len(cs) + len(cs) % 2 AS INT) AS n_bytes,
        |       2000 AS sample_rate, 1 AS channels, 8 AS bits,
        |       CAST(len(cs) AS BIGINT) AS n_samples,
        |       CAST(coalesce(list_max(cs), 0) AS INT) AS peak,
        |       CAST(coalesce(list_sum(list_transform(cs, c -> c * c)), 0) AS BIGINT) AS sum_sq
        |FROM g""".stripMargin,

    // histogram bucket counts recomputed from the character grid: every
    // raster byte is a printable-ASCII code (or the space padding), and
    // the decoder's bucket rule lum*8/256 is integer-exact
    "q_image_features" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x20-\x7e]', '?', 'g') AS ascii
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, ascii,
        |         greatest(CAST(ceil(length(ascii) / 32.0) AS INT), 1) AS h
        |  FROM t),
        |g AS (
        |  SELECT doc_id, h,
        |         list_transform(range(1, 32 * h + 1),
        |           i -> CASE WHEN i <= length(ascii)
        |                     THEN ord(substr(ascii, CAST(i AS INT), 1))
        |                     ELSE 32 END) AS px
        |  FROM d)
        |SELECT doc_id, CAST(32 * h AS BIGINT) AS n_px,
        |       CAST(len(list_filter(px, p -> p // 32 = 0)) AS BIGINT) AS b0,
        |       CAST(len(list_filter(px, p -> p // 32 = 1)) AS BIGINT) AS b1,
        |       CAST(len(list_filter(px, p -> p // 32 = 2)) AS BIGINT) AS b2,
        |       CAST(len(list_filter(px, p -> p // 32 = 3)) AS BIGINT) AS b3,
        |       CAST(len(list_filter(px, p -> p // 32 = 4)) AS BIGINT) AS b4,
        |       CAST(len(list_filter(px, p -> p // 32 = 5)) AS BIGINT) AS b5,
        |       CAST(len(list_filter(px, p -> p // 32 = 6)) AS BIGINT) AS b6,
        |       CAST(len(list_filter(px, p -> p // 32 = 7)) AS BIGINT) AS b7
        |FROM g""".stripMargin,

    // frame lengths derived arithmetically from the blob's byte length —
    // an independent derivation of the Spark-side slicing
    "q_frame_sample" ->
      """WITH t AS (
        |  SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
        |f AS (
        |  SELECT doc_id, nb,
        |         unnest(range(0, greatest(CAST(ceil(nb / 64.0) AS INT), 1))) AS frame_idx
        |  FROM t)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |       CAST(least(64, nb - frame_idx * 64) AS INT) AS n_bytes
        |FROM f WHERE frame_idx % 2 = 0""".stripMargin,

    "q_embedding_centroids" ->
      """SELECT label, CAST(d AS INT) AS dim,
        |       floor(avg(CAST(embedding[CAST(d + 1 AS INT)] AS DOUBLE)) * 100000 + 0.5)
        |         / 100000 AS mean,
        |       count(*) AS n
        |FROM (SELECT label, embedding,
        |             unnest(range(0, len(embedding))) AS d
        |      FROM embeddings)
        |GROUP BY label, d""".stripMargin,

    // the full two-stage pipeline replayed: same quantization arithmetic as
    // q_quantize_embed, integer dot products (exact), approximate cosine =
    // single IEEE divide/multiply/sqrt (bit-identical across engines),
    // shortlist-20 by (qcos DESC, n_id), exact re-rank rounded at 1e-6
    "q_knn_quantized" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         greatest(list_max(list_transform(embedding,
        |                    x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-12) AS sc
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, embedding,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS INT)) AS qv
        |  FROM s),
        |n2 AS (
        |  SELECT vec_id, embedding, qv,
        |         CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS q2
        |  FROM q),
        |pairs AS (
        |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |         a.embedding AS q_emb, b.embedding AS n_emb,
        |         a.q2 AS a_q2, b.q2 AS b_q2,
        |         CASE WHEN a.q2 = 0 OR b.q2 = 0 THEN -2.0
        |              ELSE CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
        |                     i -> CAST(a.qv[CAST(i AS INT)] AS BIGINT) * b.qv[CAST(i AS INT)])) AS DOUBLE)
        |                   / (sqrt(CAST(a.q2 AS DOUBLE)) * sqrt(CAST(b.q2 AS DOUBLE)))
        |         END AS qcos
        |  FROM n2 a, n2 b
        |  WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id),
        |short AS (
        |  SELECT q_id, n_id, q_emb, n_emb, a_q2, b_q2,
        |         row_number() OVER (PARTITION BY q_id ORDER BY qcos DESC, n_id) AS srank
        |  FROM pairs),
        |rer AS (
        |  SELECT q_id, n_id,
        |         CASE WHEN a_q2 = 0 OR b_q2 = 0 THEN -2.0
        |              ELSE floor(list_cosine_similarity(
        |                     list_transform(q_emb, x -> CAST(x AS DOUBLE)),
        |                     list_transform(n_emb, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000
        |         END AS cos
        |  FROM short WHERE srank <= 20),
        |ranked AS (
        |  SELECT q_id, n_id, cos,
        |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rank
        |  FROM rer)
        |SELECT q_id, n_id, cos, rank FROM ranked WHERE rank <= 5""".stripMargin,

    // the PQ pipeline replayed end to end: per-subspace seed codebooks
    // (vec_id < 8 sliced 16-wide), code assignment = squared-L2 argmin
    // with lowest-code tiebreak (the NearestCell contract), LUT entries
    // floor-rounded at 6dp, adc = the four lookups summed left-to-right
    "q_knn_pq" -> pqAdcOracle("q.vec_id < 10"),

    // the IVF probe CTEs (full-width seed centroids, squared-L2 argmin,
    // nprobe=2) composed with the PQ CTEs (sub-codebooks, codes, 6dp LUT)
    // — cell pruning bounds the pair set, ADC ranks it
    "q_knn_ivfpq" ->
      """WITH cfull AS (
        |  SELECT vec_id AS cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c_emb
        |  FROM embeddings WHERE vec_id < 8),
        |d AS (
        |  SELECT e.vec_id, cfull.cell,
        |         list_sum(list_transform(range(1, len(e.embedding) + 1),
        |           i -> (CAST(e.embedding[i] AS DOUBLE) - cfull.c_emb[i])
        |                * (CAST(e.embedding[i] AS DOUBLE) - cfull.c_emb[i]))) AS d2
        |  FROM embeddings e, cfull),
        |assign AS (
        |  SELECT vec_id AS n_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
        |    FROM d) WHERE rnk = 1),
        |probe AS (
        |  SELECT vec_id AS q_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
        |    FROM d WHERE vec_id < 10) WHERE rnk <= 2),
        |cb AS (
        |  SELECT vec_id AS j, CAST(mm.m AS INT) AS m,
        |         list_transform(embedding[CAST(mm.m*16+1 AS INT) : CAST(mm.m*16+16 AS INT)],
        |                        x -> CAST(x AS DOUBLE)) AS c
        |  FROM embeddings, range(0, 4) mm(m) WHERE vec_id < 8),
        |codes AS (
        |  SELECT vec_id AS n_id, m, j AS code FROM (
        |    SELECT e.vec_id, cb.m, cb.j,
        |           row_number() OVER (PARTITION BY e.vec_id, cb.m ORDER BY
        |             list_sum(list_transform(range(1, 17),
        |               i -> (CAST(e.embedding[CAST(cb.m*16 + i AS INT)] AS DOUBLE) - cb.c[CAST(i AS INT)])
        |                    * (CAST(e.embedding[CAST(cb.m*16 + i AS INT)] AS DOUBLE) - cb.c[CAST(i AS INT)]))),
        |             cb.j) AS rnk
        |    FROM embeddings e, cb) WHERE rnk = 1),
        |cw AS (
        |  SELECT n_id,
        |         max(CASE WHEN m = 0 THEN code END) AS c0,
        |         max(CASE WHEN m = 1 THEN code END) AS c1,
        |         max(CASE WHEN m = 2 THEN code END) AS c2,
        |         max(CASE WHEN m = 3 THEN code END) AS c3
        |  FROM codes GROUP BY n_id),
        |lut AS (
        |  SELECT q.vec_id AS q_id, cb.m, cb.j,
        |         floor(list_sum(list_transform(range(1, 17),
        |           i -> (CAST(q.embedding[CAST(cb.m*16 + i AS INT)] AS DOUBLE) - cb.c[CAST(i AS INT)])
        |                * (CAST(q.embedding[CAST(cb.m*16 + i AS INT)] AS DOUBLE) - cb.c[CAST(i AS INT)])))
        |           * 1000000 + 0.5) / 1000000 AS d2
        |  FROM embeddings q, cb WHERE q.vec_id < 10),
        |adc AS (
        |  SELECT p.q_id, a.n_id, l0.d2 + l1.d2 + l2.d2 + l3.d2 AS adc
        |  FROM probe p
        |  JOIN assign a ON a.cell = p.cell
        |  JOIN cw ON cw.n_id = a.n_id
        |  JOIN lut l0 ON l0.q_id = p.q_id AND l0.m = 0 AND l0.j = cw.c0
        |  JOIN lut l1 ON l1.q_id = p.q_id AND l1.m = 1 AND l1.j = cw.c1
        |  JOIN lut l2 ON l2.q_id = p.q_id AND l2.m = 2 AND l2.j = cw.c2
        |  JOIN lut l3 ON l3.q_id = p.q_id AND l3.m = 3 AND l3.j = cw.c3
        |  WHERE a.n_id <> p.q_id),
        |ranked AS (
        |  SELECT q_id, n_id, adc,
        |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS INT) AS rank
        |  FROM adc)
        |SELECT q_id, n_id, adc, rank FROM ranked WHERE rank <= 5""".stripMargin,

    // identical double arithmetic to the Spark side: scale = max|x|/127
    // (floored at 1e-12), q_i = floor(x/scale + 0.5) — every int agrees
    "q_quantize_embed" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         greatest(list_max(list_transform(embedding,
        |                    x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-12) AS sc
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, sc,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS INT)) AS qv
        |  FROM s)
        |SELECT vec_id,
        |       CAST(len(qv) AS INT) AS n_dims,
        |       floor(sc * 100000000 + 0.5) / 100000000 AS scale_r,
        |       CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT))) AS BIGINT) AS sum_q,
        |       list_min(qv) AS min_q,
        |       list_max(qv) AS max_q,
        |       CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS qnorm2
        |FROM q""".stripMargin,

    // the co-moment matrix rebuilt by brute unnest (the oracle can afford
    // d²·N rows); covariance derived with the identical IEEE-op order
    "q_embedding_covariance" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         greatest(list_max(list_transform(embedding,
        |                    x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-12) AS sc
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS INT)) AS qv
        |  FROM s),
        |idx AS (SELECT unnest(range(0, 64)) AS i),
        |nn AS (SELECT count(*) AS n FROM q),
        |sums AS (
        |  SELECT i.i AS i, CAST(sum(CAST(qv[CAST(i.i + 1 AS INT)] AS BIGINT)) AS BIGINT) AS s
        |  FROM q, idx i GROUP BY 1),
        |prods AS (
        |  SELECT i.i AS i, j.i AS j,
        |         CAST(sum(CAST(qv[CAST(i.i + 1 AS INT)] AS BIGINT)
        |                  * qv[CAST(j.i + 1 AS INT)]) AS BIGINT) AS sum_prod
        |  FROM q, idx i, idx j GROUP BY 1, 2)
        |SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j, p.sum_prod,
        |       si.s AS sum_i, sj.s AS sum_j, nn.n,
        |       floor((CAST(p.sum_prod AS DOUBLE)
        |              - CAST(si.s AS DOUBLE) * sj.s / nn.n) / nn.n
        |             * 1000000.0 + 0.5) / 1000000.0 AS cov
        |FROM prods p
        |JOIN sums si ON p.i = si.i
        |JOIN sums sj ON p.j = sj.i, nn""".stripMargin,

    // the projection matrix re-derived entry for entry from the Lehmer
    // formula; identical integer matvec
    "q_embedding_project" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         greatest(list_max(list_transform(embedding,
        |                    x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-12) AS sc
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS INT)) AS qv
        |  FROM s),
        |idx AS (SELECT unnest(range(0, 16)) AS j)
        |SELECT vec_id, CAST(j AS INT) AS j,
        |       CAST(list_sum(list_transform(range(0, 64), i ->
        |         CAST(qv[CAST(i + 1 AS INT)] AS BIGINT)
        |         * (CASE (j * 64 + i) * 48271 % 2147483647 % 6
        |            WHEN 0 THEN -1 WHEN 5 THEN 1 ELSE 0 END)))
        |            AS BIGINT) AS y
        |FROM q, idx""".stripMargin,

    // the whole power iteration unrolled: quantize → integer scatter
    // matrix n·Σqq − SS → 12 (matvec, max|u|, renormalize) CTE rounds
    // over (i, val) rows → integer principal scores. Sign-split floor
    // division matches the Scala driver loop exactly.
    "q_pca_power" -> {
      val rounds = (1 to 12).map { t =>
        s"""u$t AS MATERIALIZED (
           |  SELECT m.i AS i, CAST(sum(m.mij * v${t - 1}.val) AS BIGINT) AS val
           |  FROM m JOIN v${t - 1} ON m.j = v${t - 1}.i GROUP BY 1),
           |x$t AS (SELECT max(abs(val)) AS mx FROM u$t),
           |v$t AS MATERIALIZED (
           |  SELECT i, CAST(CASE WHEN mx = 0 THEN val
           |                      WHEN val < 0 THEN -((-val) * 1000 // mx)
           |                      ELSE (val * 1000 // mx) END AS BIGINT) AS val
           |  FROM u$t, x$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH s AS (
         |  SELECT vec_id, embedding,
         |         greatest(list_max(list_transform(embedding,
         |                    x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-12) AS sc
         |  FROM embeddings),
         |q AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS INT)) AS qv
         |  FROM s),
         |idx AS (SELECT unnest(range(0, 64)) AS i),
         |nn AS (SELECT count(*) AS n FROM q),
         |sums AS MATERIALIZED (
         |  SELECT i.i AS i, CAST(sum(CAST(qv[CAST(i.i + 1 AS INT)] AS BIGINT)) AS BIGINT) AS s
         |  FROM q, idx i GROUP BY 1),
         |prods AS MATERIALIZED (
         |  SELECT i.i AS i, j.i AS j,
         |         CAST(sum(CAST(qv[CAST(i.i + 1 AS INT)] AS BIGINT)
         |                  * qv[CAST(j.i + 1 AS INT)]) AS BIGINT) AS sp
         |  FROM q, idx i, idx j GROUP BY 1, 2),
         |m AS MATERIALIZED (
         |  SELECT p.i, p.j, CAST(nn.n * p.sp - si.s * sj.s AS BIGINT) AS mij
         |  FROM prods p
         |  JOIN sums si ON p.i = si.i
         |  JOIN sums sj ON p.j = sj.i, nn),
         |v0 AS (SELECT i.i AS i, CAST(1000 AS BIGINT) AS val FROM idx i),
         |$rounds
         |SELECT q.vec_id,
         |       CAST(sum(CAST(qv[CAST(v.i + 1 AS INT)] AS BIGINT) * v.val) AS BIGINT) AS score
         |FROM q, v12 v GROUP BY 1""".stripMargin
    }
  )
}
