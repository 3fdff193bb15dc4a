package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * token counting, quality scoring, n-gram heuristic language ID, document
  * fingerprinting. All pure built-in expressions (codegen'd, no UDFs) so
  * they stay inside whole-stage codegen at 100 TB.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish word-piece count: alnum runs and single non-alnum glyphs. */
  def wordPieceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Stopword hits: tokens appearing in the given list (higher-order
    * `filter`, codegen-friendly, no UDF). */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), w => w.isInCollection(stopwords)))

  /** Mean token length for single-space-joined text:
    * (chars − separators) / tokens — integer inputs, one double division,
    * bit-deterministic. */
  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - (n - 1)).cast("double") / n
  }

  /** Quality score in [0,1]: length credit + stopword-rate credit − symbol
    * noise. A declared heuristic (the exact formula is the spec). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text).cast("double")
    val stopRate = stopwordHits(text, stopwords).cast("double") / n
    val symbols = length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double")
    val lenCredit = least(n / lit(100.0), lit(1.0))
    greatest(lit(0.0), least(lit(1.0),
      lit(0.5) * lenCredit + lit(0.5) * stopRate * 5 - symbols / length(text)))
  }

  /** Normalized-text fingerprint: lowercase, collapse whitespace, md5. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Language-ID stopword lists (tiny n-gram heuristic). */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** Predicted language: argmax of stopword hits with deterministic
    * tie-break in list order, 'und' (undetermined) when all zero. */
  def langId(text: Column): Column = {
    val hits = LangStopwords.map { case (l, sw) => l -> stopwordHits(text, sw) }
    val maxHits = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(h > 0 && h === maxHits, lit(l)).otherwise(acc)
    }
  }
}
