package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus management for training-data pipelines:
  * hash-bucket sampling, train/val/test splits, and per-source mixing.
  *
  * Every decision is a pure function of a row's KEY (an md5 bucket), so
  * membership is reproducible across runs, engines, repartitionings, and
  * cluster sizes — the property `rand()`-based sampling lacks (its draw
  * depends on partition layout, which changes with the cluster). md5 is
  * also engine-portable: DuckDB computes the identical bucket, which is
  * what lets these ops carry exact SQL oracles instead of tolerance
  * checks. Filters are plain codegen'd expressions, pushed to the scan.
  */
object CorpusOps {

  /** Bucket granularity: fractions quantize to 1/10000. */
  val Buckets = 10000

  /** Uniform bucket in [0, Buckets) from the row key (+salt — distinct
    * salts give independent samples over the same keys).
    */
  def hashBucket(key: Column, salt: String = ""): Column =
    pmod(
      conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
        .cast("long"),
      lit(Buckets.toLong))

  /** Deterministic `fraction`-sample: keeps a row iff its bucket falls
    * below fraction·10⁴. Stable: the same keys are kept every run.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashBucket(key, salt) < math.round(fraction * Buckets))

  /** Adds a `split` column assigning each row to one named slice by
    * cumulative weight (e.g. train 0.8 / val 0.1 / test 0.1). A key
    * always lands in the same slice — documents never leak between
    * train and test across pipeline runs.
    */
  def hashSplit(df: DataFrame, key: Column, weights: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val b = hashBucket(key, salt)
    val cuts = weights.scanLeft(0.0)((acc, w) => acc + w._2).tail
      .map(w => math.round(w * Buckets))
    val expr = weights.init.zip(cuts.init)
      .foldLeft(when(lit(false), lit(""))) { case (acc, ((name, _), cut)) =>
        acc.when(b < cut, lit(name))
      }
      .otherwise(lit(weights.last._1))
    df.withColumn("split", expr)
  }

  /** Dataset mixing: per-source keep rates (sources not listed drop).
    * The workhorse of corpus re-weighting — "keep 100% of wiki, 15% of
    * crawl" — as one pushed filter, no per-source passes.
    */
  def mixSample(df: DataFrame, key: Column, source: Column,
      rates: Map[String, Double], salt: String = ""): DataFrame = {
    val b = hashBucket(key, salt)
    val keep = rates.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(false))) { case (acc, (s, r)) =>
        acc.when(source === s, b < math.round(r * Buckets))
      }
      .otherwise(lit(false))
    df.filter(keep)
  }
}
