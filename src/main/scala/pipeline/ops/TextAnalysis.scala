package pipeline.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Portable._

/**
 * Text-analysis operators for training-data pipelines: language ID,
 * quality scoring, token counting, document fingerprinting. All are
 * narrow per-row Column expressions (whole-stage codegen, no shuffle)
 * and all are portable to the SQL oracle.
 */
object TextAnalysis {

  /** Marker vocabularies for the n-gram/stopword language heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("über", "der", "und", "nicht"),
    "ja" -> Seq("東京", "の", "は"))

  /** NON-EMPTY tokens: whitespace split minus the empty fragments Spark's
    * split emits for blank/whitespace-bordered text — a newline-only doc
    * has 0 tokens, not 2 (Spark `trim` strips 0x20 only). The HASH
    * operators (minhash/simhash/fingerprint) deliberately keep raw split
    * semantics — their cross-engine oracles pin those. */
  private def tokenArr(textCol: Column): Column =
    filter(tokens(textCol), t => t =!= "")

  /** Count of tokens that appear in `marker`. */
  private def markerHits(toks: Column, markers: Seq[String]): Column =
    aggregate(toks, lit(0L),
      (acc, t) => acc + when(t.isin(markers: _*), 1L).otherwise(0L))

  /**
   * Language-ID heuristic: argmax of marker-token hits, deterministic
   * tie-break by language order (first wins), "und" when no marker hits.
   */
  def langId(textCol: Column): Column = {
    val toks = tokenArr(textCol)
    val scores = LangMarkers.map { case (l, ms) => l -> markerHits(toks, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    pick
  }

  /** Token count by whitespace splitting; 0 for blank text (including
    * non-space whitespace — see [[tokenArr]]). */
  def tokenCount(textCol: Column): Column = size(tokenArr(textCol))

  /** BPE-ish subword token estimate: count of matches of a GPT-2-style
    * pretokenizer regex (word pieces, numbers, punctuation runs). */
  def bpeTokenCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0)))

  /** Quality features: lengths, token stats, punctuation + stopword ratios.
    * Ratios are int/int double divisions — bit-deterministic. */
  def qualityFeatures(textCol: Column): Column = {
    val toks = tokenArr(textCol)
    val nTok = size(toks).cast("long")
    val nChar = length(textCol).cast("long")
    val nPunct = length(regexp_replace(textCol, "[A-Za-z0-9\\s\\u0080-\\uFFFF]", "")).cast("long")
    val nStop = markerHits(toks, Seq("the", "a", "of", "and"))
    val meanTokLen = when(nTok > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok.cast("double"))
      .otherwise(lit(0.0))
    struct(
      nChar.as("n_chars"),
      nTok.as("n_tokens"),
      nPunct.as("n_punct"),
      nStop.as("n_stopwords"),
      meanTokLen.as("mean_token_len"),
      when(nChar > 0, nPunct.cast("double") / nChar.cast("double")).otherwise(lit(0.0)).as("punct_ratio"),
      when(nTok > 0, nStop.cast("double") / nTok.cast("double")).otherwise(lit(0.0)).as("stopword_ratio"))
  }

  /** Composite quality score in [0,1]: stopword presence, sane token
    * length, low punctuation. Deterministic double arithmetic. */
  def qualityScore(textCol: Column): Column = {
    val f = qualityFeatures(textCol)
    val stopOk = least(f.getField("stopword_ratio") * lit(5.0), lit(1.0))
    val lenOk = when(f.getField("mean_token_len").between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    val punctOk = lit(1.0) - least(f.getField("punct_ratio") * lit(4.0), lit(1.0))
    (stopOk + lenOk + punctOk) / lit(3.0)
  }

  /** Rolling word-level fingerprint: fold (acc·31 + h32(word)) mod P.
    * Order-sensitive (unlike MinHash) — detects exact reorderings. */
  def fingerprint(textCol: Column): Column =
    aggregate(tokens(textCol), lit(0L), (acc, w) => pmod(acc * 31 + hash32(w), lit(P)))
}
