package pipeline.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/**
 * Deterministic merge-table byte-pair encoding: a REAL BPE tokenizer,
 * replacing the pretokenizer-regex ESTIMATE
 * (pipeline.ops.TextAnalysis.bpeTokenCount — kept alongside for
 * comparison) where an actual subword count matters: token budgets drive
 * shard packing (CorpusRefine.packTokenShards) and corpus pricing, and a
 * regex estimate miscounts code/UTF-8-heavy text.
 *
 * Two merge-table sources:
 *
 *  - the EMBEDDED FIXTURE table, learned at class load from an embedded
 *    corpus by the classic BPE procedure (count adjacent symbol pairs over
 *    the word frequency table; merge the most frequent, ties broken
 *    lexicographically; repeat) — a pure function of the corpus constant,
 *    so every executor and every rerun derives the identical table: no
 *    model file, no RNG, no network;
 *  - a LOADED table in the GPT-2 `merges.txt` format ([[Bpe.load]] /
 *    [[Bpe.parseMerges]]): one `left right` pair per line in rank order,
 *    `#version` header lines and blanks skipped (ONLY those — real
 *    GPT-2 vocabularies contain merges whose symbols start with '#') —
 *    how production vocabularies (32k–100k merges) enter the pipeline.
 *
 * Two PRETOKENIZER modes per table ([[BpeTable.byteLevel]]):
 *
 *  - CHAR-LEVEL (default): our three-class regex ([[Bpe.PretokenRe]] —
 *    ASCII letter runs, digit runs, punct runs; whitespace separates and
 *    is never counted), symbols = characters. A verbatim GPT-2 file
 *    parses fine here but its `Ġ` space-marker entries never fire,
 *    because char-level pretokens never carry the marker.
 *  - BYTE-LEVEL (GPT-2's own convention): the GPT-2 pretokenizer regex
 *    (contraction suffixes, space-attached letter/number/punct runs,
 *    whitespace-run tokens — hand-rolled in [[Bpe.gpt2TokenEnd]],
 *    spec-pinned equal to the published pattern compiled with Java's
 *    UNICODE_CHARACTER_CLASS), then each pretoken's UTF-8 bytes map
 *    through the GPT-2 `bytes_to_unicode` table ([[Bpe.ByteEnc]]:
 *    0x20→`Ġ`, 0x0A→`Ċ`, printable bytes→themselves), symbols = mapped
 *    bytes. Under this mode a VERBATIM upstream GPT-2-family merges.txt
 *    prices text exactly — every `Ġ` entry fires — so token budgets match
 *    the training-side tokenizer byte for byte. Whitespace itself
 *    tokenizes (multi-space runs, code indentation), unlike char level.
 *
 * Encoding applies merges in learned-rank order (lowest rank first),
 * exactly like GPT-2-style tokenizers apply their merges.txt.
 */
object Bpe {

  /** GPT-2-style pretokenizer (the SAME regex as the estimate in
    * TextAnalysis.bpeTokenCount): letter runs, digit runs, punctuation
    * runs; whitespace separates and is not counted. */
  val PretokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+".r

  /** Embedded training fixture: deterministic English+code+number text,
    * plus a stem×suffix morphology block ([[MorphBlock]]) that widens the
    * learned vocabulary to production-shaped subword merges (round-4
    * verdict: a ~500-merge table under-merges real text and overcounts
    * tokens). Still small by design — the point is a REAL merge procedure
    * with stable results; swap in a merges.txt for linguistic coverage. */
  val TrainingCorpus: String = (BaseCorpusLines ++ Seq(MorphBlock, MorphBlock))
    .mkString(" ")

  private def BaseCorpusLines: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog and the cat sat on the mat",
    "in the beginning the web page loaded the server returned the status",
    "request response header body content length type encoding charset utf",
    "error warning info debug trace log level message timestamp source sink",
    "select from where group by order limit join union distinct count sum",
    "function return value string integer double boolean array struct map",
    "http https ftp smtp imap pop dns tcp udp tls ssl ipv4 ipv6 localhost",
    "parse enrich route aggregate batch flush retry deadletter checkpoint",
    "123 456 789 1024 2048 4096 8192 100 200 301 404 500 502 503 2026",
    "ing tion ed er est ly ness ment able ible ous ful less ish es s",
    "pre post un re de over under out up down inter trans sub super anti",
    "the of and to in is was for on as with by at from it an be this that",
    "spark scala parquet iceberg shuffle partition executor driver codegen",
    "document corpus token shard budget sample stratum language quality",
    "loading loaded loader parsing parsed parser encoding encoded encoder",
    "requesting requested responses responding processed processing",
    "partitions partitioned executors drivers documents corpora tokens",
    "warnings errors messages timestamps sources sinks batches flushes",
    "selected selecting grouped grouping ordered ordering joined joining",
    "counted counting summed summing limited limiting united uniting",
    "strings integers doubles booleans arrays structs mappings functions",
    "checkpoints checkpointing retried retrying aggregated aggregating",
    "enriched enriching routed routing batched batching sampled sampling",
    "statuses headers bodies contents lengths types charsets levels",
    "quicker quickest browner brownest lazier laziest slower slowest",
    "distinctly distinctive distinction partitioner repartitioning",
    "international internationally transformation transformations",
    "understandable understanding misunderstanding underestimated",
    "the web pages were loaded and the servers returned their statuses",
    "all the requests and responses were logged with their timestamps",
    "every document in the corpus was tokenized sharded and sampled",
    "languages and qualities were estimated for each of the documents")

  /** Deterministic morphology block: every stem×suffix crossing, emitted
    * TWICE in the corpus so each crossing's adjacent pairs clear the
    * min-frequency-2 learning bar. Pure data, no RNG — reruns and
    * executors derive the identical table. */
  private def MorphBlock: String = {
    val stems = Vector(
      "load", "pars", "process", "request", "respond", "encod", "decod",
      "partition", "execut", "aggregat", "stream", "batch", "rout",
      "enrich", "filter", "sampl", "shard", "token", "index", "cach",
      "serializ", "compress", "schedul", "monitor", "validat", "transform",
      "normaliz", "digest", "cluster", "replicat", "migrat", "deploy",
      "configur", "authentic", "authoriz", "connect", "disconnect",
      "subscrib", "publish", "consum", "produc", "transmit", "receiv",
      "archiv", "restor", "snapshot", "compact", "merg", "split", "shuffl")
    val suffixes = Vector(
      "e", "es", "ed", "er", "ers", "ing", "ings", "ion", "ions",
      "able", "ement", "ation")
    stems.flatMap(st => suffixes.map(st + _)).mkString(" ")
  }

  /** Classic BPE learning over a word-frequency table. Deterministic:
    * ties on pair frequency break by the lexicographically smallest
    * (left, right). Stops early when no adjacent pair occurs twice.
    * `byteLevel` learns over GPT-2 pretokens mapped through [[ByteEnc]]
    * (so the table carries `Ġ`-prefixed merges, the production shape);
    * default is char-level over [[PretokenRe]]. */
  def learn(corpus: String, numMerges: Int,
            byteLevel: Boolean = false): Vector[(String, String)] = {
    val pretokens: Seq[String] =
      if (byteLevel) gpt2Pretokens(corpus).map(toByteSymbols).toSeq
      else PretokenRe.findAllIn(corpus).toSeq
    var words: Map[Vector[String], Int] =
      pretokens
        .groupBy(w => w.map(_.toString).toVector)
        .map { case (syms, ws) => syms -> ws.size }
    val merges = Vector.newBuilder[(String, String)]
    var n = 0
    var done = false
    while (n < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Int]
      words.foreach { case (syms, freq) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0) + freq)
          i += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2)
      if (best.isEmpty) done = true
      else {
        // max by count, then lexicographically smallest pair — total order
        val (pair, _) = best.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += pair
        val joined = pair._1 + pair._2
        words = words.map { case (syms, freq) =>
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == pair._1 && syms(i + 1) == pair._2; i += 1
          }
          if (!has) syms -> freq // untouched words keep their vector
          else {
            val out = Vector.newBuilder[String]
            i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result() -> freq
          }
        }.groupMapReduce(_._1)(_._2)(_ + _)
        n += 1
      }
    }
    merges.result()
  }

  /** The embedded-fixture table (learned once per JVM, identical on every
    * executor) — the default everywhere no merges.txt is configured. */
  lazy val Fixture: BpeTable =
    BpeTable.intern(new BpeTable(learn(TrainingCorpus, 8192)))

  /** Byte-level twin of [[Fixture]]: the same embedded corpus learned over
    * GPT-2 pretokens + [[ByteEnc]] symbols, so `Ġ`-marker merges are
    * learned and FIRE — byte-level mode works out of the box in a
    * zero-egress environment with no real merges.txt to load (and the
    * spec exercises the exact production table shape). */
  lazy val FixtureByteLevel: BpeTable =
    BpeTable.intern(new BpeTable(learn(TrainingCorpus, 8192, byteLevel = true),
      byteLevel = true))

  /** Fixture merge list / rank lookup (back-compat aliases). */
  def Merges: Vector[(String, String)] = Fixture.merges
  def Ranks: java.util.HashMap[String, Integer] = Fixture.ranks

  /** Total fixture-table BPE token count for a text (driver-side twin of
    * the expression; specs compare against it). */
  def countTokens(text: String): Int = Fixture.countTokens(text)

  /**
   * Parse GPT-2 `merges.txt` content: one `left right` merge per line in
   * rank order; `#version`-prefixed header lines and blank lines skip
   * (the GPT-2 file opens with `#version: 0.2`). ONLY the version header
   * skips — real GPT-2-family vocabularies contain merges whose symbols
   * START with '#' (`# #`, `## #` — the merges that build multi-# code
   * tokens), and a blanket '#' comment rule would silently drop them,
   * exactly the truncation this parser exists to refuse. Malformed lines
   * (not exactly two space-separated non-empty fields) fail fast with
   * the line number.
   */
  def parseMerges(lines: IterableOnce[String]): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var ln = 0
    lines.iterator.foreach { raw =>
      ln += 1
      val line = raw.stripLineEnd
      if (line.nonEmpty && !line.startsWith("#version")) {
        val parts = line.split(" ", -1)
        if (parts.length != 2 || parts(0).isEmpty || parts(1).isEmpty)
          throw new IllegalArgumentException(
            s"merges.txt line $ln: expected 'left right', got '$line'")
        out += ((parts(0), parts(1)))
      }
    }
    out.result()
  }

  /** Render a merge table back to GPT-2 `merges.txt` format (with the
    * version header) — parseMerges∘renderMerges is identity. */
  def renderMerges(merges: Vector[(String, String)]): String =
    ("#version: 0.2" +: merges.map { case (l, r) => s"$l $r" }).mkString("\n") + "\n"

  /** Load a GPT-2-format merges.txt from a local/shared path. Driver-side:
    * the parsed table ships to executors inside the expression tree, so
    * only the driver needs to see the file (spark-submit `--files` lands
    * it in the driver cwd on a cluster). `byteLevel = true` for a
    * verbatim upstream GPT-2-family vocabulary (symbols are
    * [[ByteEnc]]-mapped bytes, `Ġ` markers fire); default char-level. */
  def load(path: String, byteLevel: Boolean = false): BpeTable = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.UTF_8)
    BpeTable.intern(new BpeTable(
      parseMerges(scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala),
      byteLevel))
  }

  /** [[load]] with a per-(path, mode) cache: config compilation and SQL
    * function resolution may build the same expression many times per
    * session, and a 50k-merge production table should parse once, not per
    * query. Deliberately no invalidation — a vocabulary file is immutable
    * for the life of a training run; editing it in place mid-session is a
    * user error this cache makes visible rather than hides. */
  def loadCached(path: String, byteLevel: Boolean = false): BpeTable =
    loadedTables.computeIfAbsent((path, byteLevel), _ => load(path, byteLevel))

  private val loadedTables =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean), BpeTable]()

  /** Number of BPE symbols for ONE pretoken: start from characters, then
    * per pass find the lowest-ranked adjacent pair present and merge ALL
    * its (leftmost-first, non-overlapping) occurrences — the published
    * GPT-2 word loop. For any rank-ordered table (every learned table,
    * and any merges.txt recorded in learn order) this is provably
    * identical to merging one occurrence at a time: a pair containing a
    * composite symbol was necessarily learned after that symbol, so no
    * merge can create a pair that undercuts the current minimum, and a
    * pair cannot recreate itself. Merge-all also bounds degenerate
    * uniform runs — a byte-level pretoken of n padding spaces with
    * space-run merges collapses in O(log n) passes (O(n log n) work)
    * where one-at-a-time paid O(n) passes (O(n²)) — the junk-doc shape
    * (whitespace padding, minified JS, base64) a web crawl actually
    * contains. */
  def encodeLen(token: String, ranks: java.util.HashMap[String, Integer]): Int = {
    if (token.length <= 1) return token.length
    var syms = new java.util.ArrayList[String](token.length)
    var i = 0
    while (i < token.length) { syms.add(String.valueOf(token.charAt(i))); i += 1 }
    var merging = true
    while (merging && syms.size > 1) {
      var bestRank = Int.MaxValue
      var bestL: String = null
      var bestR: String = null
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestL = syms.get(j); bestR = syms.get(j + 1)
        }
        j += 1
      }
      if (bestL == null) merging = false
      else {
        val merged = bestL + bestR
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == bestL && syms.get(k + 1) == bestR) {
            out.add(merged); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
      }
    }
    syms.size
  }

  // the pretokenizer's three character classes, exactly as the regex
  // defines them: Java \s is ASCII-only ([ \t\n\f\r]); everything
  // neither \s nor alnum (incl. unicode letters/spaces) is a punct run
  @inline private[expr] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private[expr] def isAl(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private[expr] def isDg(c: Char): Boolean = c >= '0' && c <= '9'

  // ---------------------------------------------------------------------
  // Byte-level (GPT-2) mode
  // ---------------------------------------------------------------------

  /** GPT-2 `bytes_to_unicode`: a bijection byte → printable BMP char.
    * Bytes that are already printable-and-unambiguous (0x21–0x7E,
    * 0xA1–0xAC, 0xAE–0xFF) map to themselves; the 68 remaining bytes map,
    * in increasing byte order, to 0x100 + n — hence 0x20 (space) → `Ġ`
    * (U+0120), 0x0A (LF) → `Ċ` (U+010A), 0x09 (tab) → `ĉ` (U+0109).
    * This is the published GPT-2 encoder table (a pure arithmetic rule,
    * derived here, not copied data), and it is what makes merges.txt
    * symbols plain text: a merge file can carry any byte as a printable
    * character, whitespace included. */
  val ByteEnc: Array[Char] = {
    val a = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val keeps = (b >= 0x21 && b <= 0x7E) || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
      if (keeps) a(b) = b.toChar
      else { a(b) = (0x100 + n).toChar; n += 1 }
      b += 1
    }
    a
  }

  /** UTF-8 bytes of a pretoken mapped through [[ByteEnc]] — the symbol
    * string byte-level merges operate on (one char per BYTE). */
  def toByteSymbols(token: String): String = {
    val bytes = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = ByteEnc(bytes(i) & 0xFF); i += 1 }
    new String(out)
  }

  // GPT-2 pretokenizer character classes, by CODEPOINT (the pattern is
  // codepoint-wise; supplementary-plane letters must class as letters):
  // \s = the Unicode White_Space property (what Java's \s matches under
  // UNICODE_CHARACTER_CLASS — spec-pinned against the compiled pattern),
  // \p{L} = the five L categories, \p{N} = Nd|Nl|No.
  @inline private[expr] def isWsU(cp: Int): Boolean =
    (cp >= 0x09 && cp <= 0x0D) || cp == 0x20 || cp == 0x85 || cp == 0xA0 ||
      cp == 0x1680 || (cp >= 0x2000 && cp <= 0x200A) || cp == 0x2028 ||
      cp == 0x2029 || cp == 0x202F || cp == 0x205F || cp == 0x3000
  @inline private[expr] def isLu(cp: Int): Boolean = Character.isLetter(cp)
  @inline private[expr] def isNu(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  /** End (char index) of codepoints satisfying `p`, starting at `from`. */
  @inline private def runEnd(text: String, from: Int, p: Int => Boolean): Int = {
    var j = from
    while (j < text.length) {
      val cp = text.codePointAt(j)
      if (!p(cp)) return j
      j += Character.charCount(cp)
    }
    j
  }

  /** End of the GPT-2 pretoken starting at `start` — a hand-rolled scanner
    * for the published GPT-2 pattern
    * `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`
    * (the regex-module MatchIterator cost dominated the 1M-doc drill for
    * the char-level scanner; same rule here). Alternation order is the
    * pattern's: contraction suffixes (lowercase only — the upstream
    * pattern is case-sensitive) first; then an optional LITERAL space
    * attached to a letter/number/punct run; last the whitespace forms,
    * where `\s+(?!\S)` makes a run of k≥2 whitespace chars followed by
    * non-whitespace yield its first k−1 chars (the final one attaches to
    * the next token if it is 0x20, else stands alone). Spec-pinned
    * token-for-token equal to the compiled pattern on adversarial text. */
  private[expr] def gpt2TokenEnd(text: String, start: Int): Int = {
    val len = text.length
    val c = text.charAt(start)
    if (c == '\'' && start + 1 < len) {
      val c1 = text.charAt(start + 1)
      if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') return start + 2
      if (start + 2 < len) {
        val c2 = text.charAt(start + 2)
        if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
            (c1 == 'l' && c2 == 'l')) return start + 3
      }
    }
    val k = if (c == ' ') start + 1 else start
    if (k < len) {
      val cp = text.codePointAt(k)
      if (isLu(cp)) return runEnd(text, k, isLu)
      if (isNu(cp)) return runEnd(text, k, isNu)
      if (!isWsU(cp)) return runEnd(text, k, p => !isWsU(p) && !isLu(p) && !isNu(p))
    }
    // whitespace by elimination (c == ' ' with nothing attachable, or a
    // non-space whitespace char)
    val e = runEnd(text, start, isWsU)
    if (e >= len || e - start == 1) e else e - 1
  }

  /** GPT-2 pretokens of `text`, in order (driver/spec surface; the hot
    * path inlines [[gpt2TokenEnd]] in [[BpeTable.countTokens]]). */
  def gpt2Pretokens(text: String): Iterator[String] =
    new scala.collection.AbstractIterator[String] {
      private var i = 0
      def hasNext: Boolean = i < text.length
      def next(): String = {
        val e = gpt2TokenEnd(text, i)
        val s = text.substring(i, e)
        i = e
        s
      }
    }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column form: real BPE token count with the fixture table (null text →
    * null). Non-string columns coerce via the cast, like the estimate. */
  def bpeCount(text: Column): Column = bpeCount(text, Fixture)

  /** Column form against an explicit merge table (e.g. [[load]]ed from a
    * GPT-2 merges.txt) — the production-vocabulary path. */
  def bpeCount(text: Column, table: BpeTable): Column =
    column(BpeCountExpr(expression(text.cast("string")), table))
}

/**
 * An immutable BPE merge table + encoder. Serializable — the table ships
 * to executors inside the expression tree (serialized once per stage into
 * the broadcast task binary, NOT per row); the rank lookup and the
 * per-thread memo rebuild lazily after deserialization. Equality is by
 * the merge list, so two plans over the same vocabulary stay
 * canonically equal (exchange reuse, semanticEquals).
 */
final class BpeTable(val merges: Vector[(String, String)],
                     val byteLevel: Boolean) extends Serializable {

  /** Char-level table (the default mode). */
  def this(merges: Vector[(String, String)]) = this(merges, false)

  /** Deserialization interns into the per-JVM cache: the table ships in
    * every task binary, and WITHOUT interning each task would rebuild the
    * transient ranks map (50k entries for a production vocabulary) and
    * start a cold memo — the cross-task Zipf hit rate the 1M-doc drill
    * measured depends on tasks sharing one instance per executor. */
  private def readResolve: Any = BpeTable.intern(this)

  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      // first occurrence wins, like GPT-2's dict(zip(merges, range(n)))
      // would NOT — it keeps the last; rank order makes lower win anyway
      if (!m.containsKey(l + "\u0000" + r)) m.put(l + "\u0000" + r, i)
    }
    m
  }

  /** Per-thread LRU memo of pretoken → encoded length: word frequency is
    * Zipfian on real text, so most pretokens repeat constantly and the
    * O(len²) merge loop re-derives the same answer (measured 16.8s → see
    * BASELINE.md for the 1M-doc before/after). ThreadLocal because
    * expression instances can be shared across task threads in local
    * mode; per-TABLE so two vocabularies never cross-contaminate entries;
    * memoizing a pure function keeps results bit-identical. */
  @transient private lazy val cacheLocal =
    ThreadLocal.withInitial[java.util.LinkedHashMap[String, Integer]](() =>
      new java.util.LinkedHashMap[String, Integer](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Integer]): Boolean = size > 65536
      })

  def encodeLen(token: String): Int = Bpe.encodeLen(token, ranks)

  /** Total BPE token count for a text (sum over pretokens), in this
    * table's mode. */
  def countTokens(text: String): Int =
    if (byteLevel) countTokensByteLevel(text) else countTokensCharLevel(text)

  /** Byte-level count: GPT-2 pretokens ([[Bpe.gpt2TokenEnd]]), symbols =
    * [[Bpe.ByteEnc]]-mapped UTF-8 bytes. Memo key is the RAW pretoken
    * (mapping is injective; the memo is per-table, so modes never
    * cross-contaminate); same >64-char whole-document bypass as char
    * level. */
  /** Encode length for one pretoken through the per-thread memo. `tok` is
    * the RAW pretoken (the memo key); `syms` the symbol string to encode
    * (== tok for char level, ByteEnc-mapped for byte level). Long tokens
    * bypass the memo: a whitespace-free document (CJK, base64, minified
    * JS) is ONE pretoken, and caching whole documents per pooled thread
    * would pin unbounded heap; >64-char tokens rarely repeat Zipf-style
    * anyway. */
  @inline private def memoLen(
      tok: String, syms: String,
      rk: java.util.HashMap[String, Integer],
      cache: java.util.LinkedHashMap[String, Integer]): Int = {
    if (tok.length > 64) return Bpe.encodeLen(syms, rk)
    var n = cache.get(tok)
    if (n == null) {
      n = Integer.valueOf(Bpe.encodeLen(syms, rk))
      cache.put(tok, n)
    }
    n.intValue
  }

  private def countTokensByteLevel(text: String): Int = {
    val rk = ranks
    val cache = cacheLocal.get()
    var total = 0
    var i = 0
    val len = text.length
    while (i < len) {
      val e = Bpe.gpt2TokenEnd(text, i)
      val tok = text.substring(i, e)
      i = e
      total += memoLen(tok, Bpe.toByteSymbols(tok), rk, cache)
    }
    total
  }

  /** Char-level count: hand-rolled scanner over the SAME three classes as
    * [[Bpe.PretokenRe]] (spec-pinned equal on adversarial strings): the
    * Scala MatchIterator dominated the 1M-doc drill (regex scan ≈ the
    * whole 16.8s; see BASELINE.md). */
  private def countTokensCharLevel(text: String): Int = {
    import Bpe.{isAl, isDg, isWs}
    val rk = ranks
    val cache = cacheLocal.get()
    var total = 0
    var i = 0
    val len = text.length
    while (i < len) {
      val c = text.charAt(i)
      if (isWs(c)) i += 1
      else {
        val start = i
        if (isAl(c)) { i += 1; while (i < len && isAl(text.charAt(i))) i += 1 }
        else if (isDg(c)) { i += 1; while (i < len && isDg(text.charAt(i))) i += 1 }
        else {
          i += 1
          while (i < len && { val x = text.charAt(i); !isWs(x) && !isAl(x) && !isDg(x) }) i += 1
        }
        val tok = text.substring(start, i)
        total += memoLen(tok, tok, rk, cache)
      }
    }
    total
  }

  override def equals(o: Any): Boolean = o match {
    case t: BpeTable =>
      (t eq this) || (t.byteLevel == byteLevel && t.merges == merges)
    case _ => false
  }
  override val hashCode: Int = merges.hashCode * 31 + byteLevel.hashCode
  override def toString: String =
    s"BpeTable(${merges.size} merges, ${if (byteLevel) "byte" else "char"}-level)"
}

object BpeTable {
  /** Per-JVM canonical instance per (merge list, mode)
    * ([[BpeTable.readResolve]]): bounded by the number of DISTINCT
    * vocabularies in use (one or two in any real job), so no eviction. */
  private val interned = new java.util.concurrent.ConcurrentHashMap[
    (Vector[(String, String)], Boolean), BpeTable]()
  def intern(t: BpeTable): BpeTable =
    interned.computeIfAbsent((t.merges, t.byteLevel), _ => t)
}

/** text → real merge-table BPE token count, one tight per-row pass (the
  * native-over-HOF rule: any per-row loop lives in an Expression). The
  * table is a constructor value — fixture by default, loaded merges.txt
  * on the config surface — and participates in case-class equality. */
case class BpeCountExpr(child: Expression, table: BpeTable) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  def compute(input: Any): Any =
    Integer.valueOf(table.countTokens(input.toString))

  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => NativeCodegen.callCompute(ctx, ev, this, dataType, c))
  override protected def withNewChildInternal(c: Expression): BpeCountExpr =
    copy(child = c)
}
