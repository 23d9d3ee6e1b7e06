package pipeline.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/**
 * Deterministic merge-table byte-pair encoding: a REAL (if small) BPE
 * tokenizer, replacing the pretokenizer-regex ESTIMATE
 * (pipeline.ops.TextAnalysis.bpeTokenCount — kept alongside for
 * comparison) where an actual subword count matters: token budgets drive
 * shard packing (CorpusRefine.packTokenShards) and corpus pricing, and a
 * regex estimate miscounts code/UTF-8-heavy text.
 *
 * The merge table is LEARNED at class-load from an embedded fixture corpus
 * by the classic BPE procedure (count adjacent symbol pairs over the word
 * frequency table; merge the most frequent, ties broken lexicographically;
 * repeat) — a pure function of the corpus constant, so every executor and
 * every rerun derives the identical table: no model file, no RNG, no
 * network. Encoding applies merges in learned-rank order (lowest rank
 * first), exactly like GPT-2-style tokenizers apply their merges.txt.
 */
object Bpe {

  /** GPT-2-style pretokenizer (the SAME regex as the estimate in
    * TextAnalysis.bpeTokenCount): letter runs, digit runs, punctuation
    * runs; whitespace separates and is not counted. */
  val PretokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+".r

  /** Embedded training fixture: deterministic English+code+number text.
    * Small by design — the point is a REAL merge procedure with stable
    * results, not linguistic coverage (swap the corpus, keep the code). */
  val TrainingCorpus: String = Seq(
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
    .mkString(" ")

  /** Classic BPE learning over a word-frequency table. Deterministic:
    * ties on pair frequency break by the lexicographically smallest
    * (left, right). Stops early when no adjacent pair occurs twice. */
  def learn(corpus: String, numMerges: Int): Vector[(String, String)] = {
    var words: Map[Vector[String], Int] =
      PretokenRe.findAllIn(corpus).toSeq
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
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> freq
        }.groupMapReduce(_._1)(_._2)(_ + _)
        n += 1
      }
    }
    merges.result()
  }

  /** The fixture merge table (~hundreds of merges before the small corpus
    * exhausts repeated pairs) and its rank lookup. */
  lazy val Merges: Vector[(String, String)] = learn(TrainingCorpus, 1024)
  lazy val Ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    Merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + "\u0000" + r, i) }
    m
  }

  /** Number of BPE symbols for ONE pretoken: start from characters, merge
    * the lowest-ranked adjacent pair until none applies. */
  def encodeLen(token: String, ranks: java.util.HashMap[String, Integer]): Int = {
    if (token.length <= 1) return token.length
    var syms = new java.util.ArrayList[String](token.length)
    var i = 0
    while (i < token.length) { syms.add(String.valueOf(token.charAt(i))); i += 1 }
    var merging = true
    while (merging && syms.size > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) merging = false
      else {
        syms.set(bestAt, syms.get(bestAt) + syms.get(bestAt + 1))
        syms.remove(bestAt + 1)
      }
    }
    syms.size
  }

  /** Per-thread LRU memo of pretoken → encoded length: word frequency is
    * Zipfian on real text, so most pretokens repeat constantly and the
    * O(len²) merge loop re-derives the same answer (measured 16.8s → see
    * BASELINE.md for the 1M-doc before/after). ThreadLocal because
    * expression instances can be shared across task threads in local
    * mode; memoizing a pure function keeps results bit-identical. */
  private val cacheLocal =
    ThreadLocal.withInitial[java.util.LinkedHashMap[String, Integer]](() =>
      new java.util.LinkedHashMap[String, Integer](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Integer]): Boolean = size > 65536
      })

  // the pretokenizer's three character classes, exactly as the regex
  // defines them: Java \s is ASCII-only ([ \t\n\f\r]); everything
  // neither \s nor alnum (incl. unicode letters/spaces) is a punct run
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAl(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private def isDg(c: Char): Boolean = c >= '0' && c <= '9'

  /** Total BPE token count for a text (sum over pretokens). Hand-rolled
    * scanner over the SAME three classes as [[PretokenRe]] (spec-pinned
    * equal on adversarial strings): the Scala MatchIterator dominated the
    * 1M-doc drill (regex scan ≈ the whole 16.8s; see BASELINE.md). */
  def countTokens(text: String): Int = {
    val ranks = Ranks
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
        // long tokens bypass the memo: a whitespace-free document (CJK,
        // base64, minified JS) is ONE pretoken, and caching whole
        // documents per pooled thread would pin unbounded heap; >64-char
        // tokens rarely repeat Zipf-style anyway
        if (tok.length > 64) total += encodeLen(tok, ranks)
        else {
          var n = cache.get(tok)
          if (n == null) {
            n = Integer.valueOf(encodeLen(tok, ranks))
            cache.put(tok, n)
          }
          total += n.intValue
        }
      }
    }
    total
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column form: real BPE token count (null text → null). Non-string
    * columns coerce via the cast, like the regex-estimate twin. */
  def bpeCount(text: Column): Column =
    column(BpeCountExpr(expression(text.cast("string"))))
}

/** text → real merge-table BPE token count, one tight per-row pass (the
  * native-over-HOF rule: any per-row loop lives in an Expression). */
case class BpeCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  def compute(input: Any): Any =
    Integer.valueOf(Bpe.countTokens(input.toString))

  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => NativeCodegen.callCompute(ctx, ev, this, dataType, c))
  override protected def withNewChildInternal(c: Expression): BpeCountExpr =
    copy(child = c)
}
