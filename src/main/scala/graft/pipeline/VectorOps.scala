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
  private[pipeline] def hyperplanes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
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
}
