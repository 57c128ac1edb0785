package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * normalization, tokenization (whitespace + BPE-ish regex), language ID
  * (stopword n-gram heuristic), quality scoring, fingerprinting.
  *
  * Everything is Catalyst expressions over built-ins — no UDFs — so the
  * whole stage stays inside whole-stage codegen and scales with input
  * partitions (no shuffle until an explicit aggregation).
  */
object TextOps {

  /** Expression-level let-binding: evaluate `value` ONCE per row and refer
    * to it as a lambda variable in `body`.
    *
    * The Column DSL has no let — a Scala `val` splices a copy of the whole
    * subtree at every use site, and inside a higher-order-function lambda
    * that copy re-evaluates PER ELEMENT (the r2 q_dedup_near profile showed
    * tokenization running ~150× per document this way). Wrapping the value
    * in a 1-element array and binding it through `transform`'s lambda
    * variable gives true once-per-row evaluation.
    */
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** Lowercased, whitespace-collapsed text — the canonical form every
    * dedup/fingerprint path keys on.
    */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** BPE-ish subword boundaries: letter runs, digit runs, single
    * punctuation — the pre-tokenization regex families like GPT-2's BPE
    * use, minus byte-level merges.
    */
  val BpeTokenRe = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenRe), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Token-window chunking — the context-length splitter of a training
    * pipeline: each document explodes into windows of `chunkSize`
    * whitespace tokens overlapping by `overlap` (stride = size −
    * overlap), every token covered, last window allowed short. Pure
    * expressions (sequence → slice → array_join) so a 100 TB corpus
    * chunks in one codegen'd pass with zero shuffle; output rows carry
    * the input columns plus (chunk_idx, chunk_text).
    */
  def chunk(df: DataFrame, text: Column, chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0, "need chunkSize > overlap >= 0")
    val stride = chunkSize - overlap
    val chunks = bind(filter(split(text, "\\s+"), t => t =!= "")) { toks =>
      val n = size(toks)
      val k = when(n <= chunkSize, 1).otherwise(
        floor((n - chunkSize + (stride - 1)).cast("double") / stride).cast("int") + 1)
      transform(sequence(lit(0), k - 1), i =>
        array_join(slice(toks, i * stride + 1, lit(chunkSize)), " "))
    }
    df.select(col("*"), posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
  }

  /** 64-bit exact-content fingerprint of the normalized text. */
  def fingerprint(text: Column): Column = xxhash64(normalize(text))

  /** Winnowing-style robust fingerprints: minimum token-hash per sliding
    * window of `w` tokens, deduped. Two documents sharing a long run of
    * tokens share fingerprints even when the rest differs. `tokenHash`
    * defaults to xxhash64 (fastest); the oracle row passes an
    * engine-portable md5-derived hash so DuckDB can recompute the exact
    * fingerprint sets (same trick as the simhash oracle).
    */
  def winnowFingerprints(text: Column, w: Int = 5,
      tokenHash: Column => Column = (t: Column) => xxhash64(t)): Column =
    bind(transform(tokens(text), t => tokenHash(t))) { hs =>
      when(size(hs) >= w,
        array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)), i =>
          array_min(slice(hs, i, lit(w))))))
        .otherwise(when(size(hs) > 0, array(array_min(hs)))
          .otherwise(array().cast("array<bigint>")))
    }

  // --- language ID: tiny stopword profiles per language -------------------
  // The profile approach mirrors n-gram language detectors (score text
  // against per-language frequency profiles, argmax) scaled down to the
  // highest-signal tokens so it compiles to pure Catalyst expressions.
  private[graft] val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "den", "von", "zu", "mit", "sich",
      "des", "auf", "ist", "im", "nicht", "ein", "eine", "als", "auch", "es"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "on", "with", "as", "are", "at", "this", "be", "by", "have"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se",
      "las", "por", "un", "con", "una", "es", "para", "su", "al", "lo"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du",
      "une", "que", "est", "pour", "qui", "dans", "pas", "au", "sur", "ne")
  )

  /** Heuristic language ID: argmax of stopword-profile hits; CJK
    * codepoints short-circuit to "zh"; no hits → "und". Deterministic
    * tie-break = profile order (alphabetical).
    */
  def langId(text: Column): Column = bind(tokens(text)) { toks =>
    val scores = profiles.map { case (lang, words) =>
      val wl = array(words.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(wl, t)))
    }
    val best = greatest(scores.map(_._2): _*)
    val cjk = size(regexp_extract_all(text, lit("\\p{IsHan}"), lit(0)))
    val byProfile = scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best, lit(lang)).otherwise(els)
    }
    when(cjk > lit(0) && cjk >= size(toks), lit("zh"))
      .when(best <= lit(0), lit("und"))
      .otherwise(byProfile)
  }

  // --- quality scoring -----------------------------------------------------

  /** Per-document quality facets (all exact integer/IEEE math so results
    * hash identically across engines):
    *   n_chars, n_tokens, n_bpe_tokens, mean_tok_len, punct_ratio,
    *   stop_ratio, and a [0,1] `score` from four equal-weight indicators.
    */
  def qualityFacets(text: Column): Seq[(String, Column)] =
    facetsOfNorm(normalize(text))

  private def facetsOfNorm(norm: Column): Seq[(String, Column)] = {
    val nChars = length(norm)
    val nToks = size(split(norm, " "))
    val alnumLen = length(regexp_replace(norm, "\\s", ""))
    val meanTokLen = alnumLen.cast("double") / nToks
    val punct = length(regexp_replace(norm, "[\\w\\s]", ""))
    val punctRatio = punct.cast("double") / nChars
    val en = array(profiles.toMap.apply("en").map(lit): _*)
    val stopHits = size(filter(split(norm, " "), t => array_contains(en, t)))
    val stopRatio = stopHits.cast("double") / nToks
    val score =
      (when(nToks.between(10, 100000), 0.25).otherwise(0.0)
        + when(meanTokLen.between(2.0, 12.0), 0.25).otherwise(0.0)
        + when(punctRatio < 0.1, 0.25).otherwise(0.0)
        + when(stopRatio > 0.02, 0.25).otherwise(0.0))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "mean_tok_len" -> meanTokLen,
      "punct_ratio" -> punctRatio,
      "stop_ratio" -> stopRatio,
      "score" -> score
    )
  }

  /** `doc_id, facets…` over a documents frame; the normalized text is
    * bound once per row (see `bind`) instead of once per facet.
    */
  def quality(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val packed = bind(normalize(text)) { norm =>
      struct(facetsOfNorm(norm).map { case (n, c) => c.as(n) }: _*)
    }
    docs.select(id.as("doc_id"), packed.as("__q")).select(col("doc_id"), col("__q.*"))
  }
}
