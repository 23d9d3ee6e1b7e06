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

  /** Marker vocabularies for the stopword language heuristic: ~10
    * languages × top-20 stopwords. Order is the deterministic tie-break
    * (first listed wins) — mirrored exactly by the generated oracle SQL
    * (graft.Oracle derives q_lang_id from THIS table, so the two engines
    * cannot drift). Cross-language collisions (fr/es/pt "de", "la"; en/de
    * "in") are resolved by the argmax over full 20-word lists, which is
    * the point of breadth over the round-3 3×4 demo vocabulary. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "was", "that",
      "it", "for", "on", "with", "as", "they", "at", "be", "this", "have",
      "from"),
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit",
      "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
      "eine", "als", "über"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du",
      "une", "que", "est", "pour", "qui", "dans", "par", "plus", "pas",
      "au", "sur"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se", "del",
      "las", "por", "para", "con", "una", "su", "al", "es", "lo", "como",
      "más"),
    "it" -> Seq("il", "di", "che", "la", "e", "per", "una", "sono", "con",
      "non", "si", "da", "come", "anche", "lo", "ma", "le", "se", "nel",
      "alla"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "para",
      "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "as"),
    "nl" -> Seq("de", "het", "een", "van", "en", "in", "is", "dat", "op",
      "te", "zijn", "met", "voor", "niet", "aan", "er", "om", "ook", "als",
      "dan"),
    "ru" -> Seq("и", "в", "не", "на", "я", "быть", "он", "с", "что", "а",
      "по", "это", "она", "этот", "к", "но", "они", "мы", "как", "из"),
    "ja" -> Seq("の", "に", "は", "を", "た", "が", "で", "て", "と", "し",
      "れ", "さ", "ある", "いる", "も", "する", "から", "な", "こと", "東京"),
    "zh" -> Seq("的", "一", "是", "在", "不", "了", "有", "和", "人", "这",
      "中", "大", "为", "上", "个", "国", "我", "以", "要", "他"))

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
   * Native one-pass expression (per-word bitmask lookup) — the HOF twin
   * [[langIdHof]] stays as the oracle-mirrored parity surface.
   */
  def langId(textCol: Column): Column =
    // null text → "und": the HOF's when-chain and the oracle's CASE both
    // fall through to 'und' on null scores; the null-safe native expr
    // returns null there, so coalesce restores the shared semantics
    coalesce(pipeline.expr.PortableExprs.langId(textCol), lit("und"))

  /** HOF twin of [[langId]] — the generated DuckDB oracle mirrors THIS
    * formulation symbol-for-symbol (per-language IN-list sums, greatest,
    * first-wins CASE); spec-pinned bit-equal to the native expression. */
  def langIdHof(textCol: Column): Column = {
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

  /** BPE-ish subword token ESTIMATE: count of matches of a GPT-2-style
    * pretokenizer regex (word pieces, numbers, punctuation runs). Cheap and
    * SQL-portable; see [[bpeTokenCountReal]] for the real tokenizer. */
  def bpeTokenCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0)))

  /** REAL merge-table BPE token count (pipeline.expr.Bpe): the same
    * pretokenizer, then learned merges applied in rank order — the number
    * a token-budget packer or corpus pricing should actually use (the
    * regex estimate miscounts code/UTF-8-heavy text). Deterministic: the
    * merge table derives from an embedded fixture corpus at class load. */
  def bpeTokenCountReal(textCol: Column): Column =
    pipeline.expr.Bpe.bpeCount(textCol)

  /** Real BPE count against an explicit merge table — e.g.
    * `Bpe.load("merges.txt")` for a production 32k–100k vocabulary. */
  def bpeTokenCountReal(textCol: Column, table: pipeline.expr.BpeTable): Column =
    pipeline.expr.Bpe.bpeCount(textCol, table)

  /** Quality features: lengths, token stats, punctuation + stopword ratios.
    * Ratios are int/int double divisions — bit-deterministic. The token
    * array is BOUND once (Portable.bind1): the struct's fields reference
    * it ~6 times, and each raw reference would re-split the text (lambda-
    * bearing exprs sit outside codegen subexpression elimination). */
  def qualityFeatures(textCol: Column): Column =
    bind1(tokenArr(textCol)) { toks =>
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
    * length, low punctuation. Deterministic double arithmetic. The
    * features struct is BOUND once — three field references would
    * otherwise evaluate it (and its tokenization) three times per row. */
  def qualityScore(textCol: Column): Column =
    bind1(qualityFeatures(textCol)) { f =>
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
