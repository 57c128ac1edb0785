package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * All vector math is `zip_with`/`aggregate` higher-order expressions —
  * codegen'd, no UDFs, no driver-side collection.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ over two numeric arrays (computed in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine top-k: every query against every corpus vector.
    *
    * The query side must be small (it is broadcast); the corpus streams
    * through once. The per-query top-k shuffles candidates by query id —
    * fine for a handful of queries, and the reason `knnLsh` exists for the
    * many-query / huge-corpus regime.
    */
  def knnBruteForce(
      corpus: DataFrame,
      queries: DataFrame,
      id: String,
      vec: String,
      k: Int
  ): DataFrame = {
    val scored = corpus
      .select(col(id).as("nid"), asDouble(col(vec)).as("__ne"))
      .crossJoin(broadcast(
        queries.select(col(id).as("qid"), asDouble(col(vec)).as("__qe"))))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", cosine(col("__qe"), col("__ne")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank")
  }

  /** Deterministic gaussian hyperplanes (seeded) for sign-bit bucketing. */
  private[graft] def hyperplanes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: bit i = sign of ⟨e, planeᵢ⟩.
    * Vectors with high cosine land in the same bucket with probability
    * (1 - θ/π)^nbits (θ = angle) — the classic SimHash-for-angles scheme.
    */
  def lshBucket(e: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(asDouble(e), plane) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Bucketed approximate top-k: corpus is bucketed once by hyperplane
    * signs; each query probes its own bucket plus all 1-bit-flip neighbors
    * (multi-probe), then takes per-query top-k among those candidates.
    * Candidate volume ≈ (nbits+1)/2^nbits of the corpus per query — the
    * join is a plain bucket equi-join, shuffled by bucket, no all-pairs.
    */
  def knnLsh(
      corpus: DataFrame,
      queries: DataFrame,
      id: String,
      vec: String,
      k: Int,
      dim: Int,
      nbits: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val planes = hyperplanes(dim, nbits, seed)
    val c = corpus.select(col(id).as("nid"), asDouble(col(vec)).as("__ne"),
      lshBucket(col(vec), planes).as("bucket"))
    val qBase = queries.select(col(id).as("qid"), asDouble(col(vec)).as("__qe"),
      lshBucket(col(vec), planes).as("__b0"))
    // multi-probe: own bucket + every 1-bit flip
    val probes = explode(array(
      (col("__b0") +: (0 until nbits).map(i =>
        col("__b0").bitwiseXOR(shiftleft(lit(1L), i)))): _*)).as("bucket")
    val q = qBase.select(col("qid"), col("__qe"), probes)
    val scored = q.join(c, "bucket")
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", cosine(col("__qe"), col("__ne")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank")
  }

  /** Embedding near-dup pairs: same-bucket candidates (multi-probe on the
    * lower id side), exact cosine verify ≥ threshold. Never all-pairs.
    */
  def cosineNearDupPairs(
      vectors: DataFrame,
      id: String,
      vec: String,
      threshold: Double,
      dim: Int,
      nbits: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val planes = hyperplanes(dim, nbits, seed)
    val v = vectors.select(col(id).as("__id"), asDouble(col(vec)).as("__e"),
      lshBucket(col(vec), planes).as("__b0"))
    val probes = explode(array(
      (col("__b0") +: (0 until nbits).map(i =>
        col("__b0").bitwiseXOR(shiftleft(lit(1L), i)))): _*)).as("bucket")
    val a = v.select(col("__id").as("d1"), col("__e").as("e1"), probes)
    val b = v.select(col("__id").as("d2"), col("__e").as("e2"), col("__b0").as("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2", "e1", "e2")
      .distinct()
      .withColumn("cos", cosine(col("e1"), col("e2")))
      .filter(col("cos") >= threshold)
      .select("d1", "d2", "cos")
  }

  /** Symmetric int8 quantization of an embedding — 4× cheaper storage /
    * shuffle for ANN candidate stages: qᵢ = ⌊xᵢ·127/m + ½⌋ with
    * m = max|x|. The ⌊·+½⌋ form (not round()) keeps the result
    * bit-identical across engines, so the op carries an exact oracle.
    * Returns (scale, q): x ≈ q·scale with scale = m/127.
    */
  def quantizeInt8(vec: Column): (Column, Column) = {
    val e = asDouble(vec)
    val m = array_max(transform(e, x => abs(x)))
    val scale = when(m > 0, m / 127.0).otherwise(lit(1.0))
    val q = transform(e, x =>
      when(m > 0, floor(x * 127.0 / m + 0.5)).otherwise(lit(0.0)).cast("int"))
    (scale, q)
  }

  // ---- IVF (inverted-file) ANN ---------------------------------------------

  private def centLit(c: Array[Double]): Column = array(c.map(lit): _*)

  /** Per-row centroid scores [⟨e,c₀⟩, ⟨e,c₁⟩, …]. Centroids are unit
    * vectors, so dot order == cosine order and the row vector needs no
    * normalization (positive scaling preserves argmax). Index math works
    * on this array (array_position) rather than struct fields — the
    * analyzer drops struct field names when the struct wraps
    * higher-order-function lambdas like `aggregate`.
    */
  /** Centroid scores round to float32: the oracle twin recomputes the
    * same dots in another engine (different summation order → last-ulp
    * differences); rounding collapses near-ties into EXACT ties that both
    * engines break identically (lowest centroid id). Costs ~1e-7 score
    * resolution — irrelevant for list routing.
    */
  private def centScores(e: Column, cents: Array[Array[Double]]): Column =
    array(cents.map(c => dot(e, centLit(c)).cast("float").cast("double")): _*)

  /** The inverted-list id of a vector: argmax dot over the centroid set
    * (ties break to the lowest id — deterministic).
    */
  def nearestCentroid(e: Column, cents: Array[Array[Double]]): Column = {
    val ss = centScores(e, cents)
    (array_position(ss, array_max(ss)) - 1).cast("int")
  }

  /** The nprobe best centroid ids for a query vector, best first.
    * Distinct because collapsed (identical) centroids tie on score and
    * array_position maps both to the first — fewer probes, never dups.
    */
  def probeIds(e: Column, cents: Array[Array[Double]], nprobe: Int): Column = {
    val ss = centScores(e, cents)
    array_distinct(transform(
      slice(reverse(array_sort(ss)), 1, nprobe),
      s => (array_position(ss, s) - 1).cast("int")))
  }

  /** Spherical-ish k-means coarse quantizer, trained with distributed
    * Lloyd iterations: assignment is a per-row argmax over broadcast
    * centroid LITERALS (codegen'd, no shuffle, no UDF); the update step
    * is one posexplode + groupBy(list, pos) per iteration, collecting
    * only nlist×dim means to the driver (kilobytes at any corpus size).
    * Init is deterministic: the nlist lowest id-hash vectors.
    */
  def ivfCentroids(corpus: DataFrame, id: String, vec: String, nlist: Int,
      iters: Int = 3, seed: Long = 42L): Array[Array[Double]] = {
    // unit-normalize, then round each component to float32: an oracle
    // re-training in another engine averages in a different order; the
    // rounding makes the trained centroids BIT-IDENTICAL across engines
    def unit(c: Array[Double]): Array[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      (if (n == 0) c else c.map(_ / n)).map(_.toFloat.toDouble)
    }
    // portable init hash (md5 prefix, the CorpusOps pattern) — the same
    // expression is expressible in ANSI SQL, unlike xxhash64
    val h = conv(substring(md5(concat(col(id).cast("string"),
      lit(":" + seed))), 1, 8), 16, 10).cast("long")
    var cents: Array[Array[Double]] = corpus
      .select(asDouble(col(vec)).as("__e"), h.as("__h"), col(id).as("__i"))
      .orderBy(col("__h"), col("__i")).limit(nlist)
      .collect().map(r => unit(r.getSeq[Double](0).toArray))
    require(cents.nonEmpty, "ivfCentroids: empty corpus")
    val dim = cents(0).length
    var it = 0
    while (it < iters) {
      val means = corpus.select(asDouble(col(vec)).as("__e"))
        .select(nearestCentroid(col("__e"), cents).as("__c"), posexplode(col("__e")))
        .groupBy("__c", "pos").agg(avg("col").as("m"))
        .collect()
      val next = Array.fill(cents.length)(new Array[Double](dim))
      val seen = Array.fill(cents.length)(false)
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2); seen(r.getInt(0)) = true
      }
      // an emptied list keeps its previous centroid
      cents = next.zipWithIndex.map { case (c, i) => if (seen(i)) unit(c) else cents(i) }
      it += 1
    }
    cents
  }

  /** IVF-bucketed approximate top-k — the classic inverted-file ANN: the
    * corpus partitions into nlist inverted lists by nearest centroid;
    * each query probes only its nprobe best lists. The probe join is a
    * plain equi-join on the list id (shuffled by list, never all-pairs),
    * candidate volume ≈ nprobe/nlist of the corpus per query, and the
    * per-query top-k window partitions by query id. Against clustered
    * data IVF beats hyperplane LSH because the partitions FOLLOW the
    * data's own density rather than fixed random cuts.
    */
  def knnIvf(
      corpus: DataFrame,
      queries: DataFrame,
      id: String,
      vec: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 3,
      seed: Long = 42L
  ): DataFrame = {
    val cents = ivfCentroids(corpus, id, vec, nlist, iters, seed)
    val c = corpus.select(col(id).as("nid"), asDouble(col(vec)).as("__ne"),
      nearestCentroid(asDouble(col(vec)), cents).as("list"))
    val q = queries.select(col(id).as("qid"), asDouble(col(vec)).as("__qe"),
      explode(probeIds(asDouble(col(vec)), cents, nprobe)).as("list"))
    // each corpus vector lives in exactly one list, so a (qid, nid) pair
    // appears at most once — no dedup needed before ranking
    val scored = q.join(c, "list")
      .filter(col("nid") =!= col("qid"))
      // float32-rounded score: rank order agrees bit-for-bit with the
      // SQL oracle twin (near-ulp ties collapse, nid breaks them)
      .withColumn("cos", cosine(col("__qe"), col("__ne")).cast("float"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank")
  }
}
