package pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.expr.Bpe

/** Real merge-table BPE: learning pinned on a hand-computable corpus,
  * encoding cross-checked against an independently written reference
  * applier on adversarial strings, and the Spark expression against the
  * driver-side computation. */
class BpeSpec extends AnyFunSuite {

  lazy val spark = Sessions.local(4, 4, "bpe-spec")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  /** Independent reference applier: scan the merge list in rank order,
    * apply the first merge with an occurrence (leftmost), restart from
    * rank 0 — the textbook "lowest-ranked applicable merge first"
    * definition via different code than Bpe.encodeLen's best-pair scan. */
  private def refEncodeSyms(token: String,
                            merges: Vector[(String, String)]): Vector[String] = {
    var syms = token.map(_.toString).toVector
    var applied = true
    while (applied && syms.length > 1) {
      applied = false
      var r = 0
      while (r < merges.length && !applied) {
        val (l, rr) = merges(r)
        val at = syms.indices.dropRight(1)
          .find(i => syms(i) == l && syms(i + 1) == rr)
        at match {
          case Some(i) =>
            syms = (syms.take(i) :+ (l + rr)) ++ syms.drop(i + 2)
            applied = true
          case None => r += 1
        }
      }
    }
    syms
  }

  private def refEncodeLen(token: String, merges: Vector[(String, String)]): Int =
    refEncodeSyms(token, merges).length

  test("learn: hand-computed merges on a tiny corpus, deterministic ties") {
    // words: ab x3, abc x1 → (a,b)=4, (b,c)=1; only (a,b) reaches the
    // min-frequency-2 bar; after merging, (ab,c)=1 → stop
    assert(Bpe.learn("ab ab ab abc", 10) == Vector(("a", "b")))
    // low x2, lowest x2: (l,o)=4 (o,w)=4 → tie breaks lexicographically:
    // (l,o) < (o,w). then (lo,w)=4 wins; then (low,e)=2/(e,s)=2/(s,t)=2
    // → (e,s) first, then (es,t)=2, then (low,est)=2
    assert(Bpe.learn("low low lowest lowest", 10) == Vector(
      ("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"), ("low", "est")))
    // rerun-stable (pure function)
    assert(Bpe.learn(Bpe.TrainingCorpus, 8192) == Bpe.Merges)
    // round-5 widened corpus (stem×suffix morphology block): well past the
    // round-4 ~500-merge table that under-merged real text
    assert(Bpe.Merges.size > 700, s"fixture corpus learned ${Bpe.Merges.size} merges")
  }

  test("encode == independent reference applier on adversarial strings") {
    val adversarial = Seq(
      "the", "thee", "theethe", "a", "", "aaaaaaaaaaaaaaaaaaaaaaaa",
      "request", "requests", "requesting", "xqzkjv", "ab123cd",
      "def f(x:Int)=x*2//comment", "東京タワー123ビル", "über straße",
      "http://a.example/path?q=1&r=2", "  spaced   out  ",
      "1234567890", "!!!???...", "mixedCASEword", "s", "es", "est",
      // scanner-vs-regex class edges: Java \s is ASCII-only, so NBSP and
      // other unicode spaces belong to the PUNCT class, tab/VT/FF/CR/LF
      // separate; the hand-rolled scanner must agree with PretokenRe
      "a b", "tab\tand\u000Bvt\fff\rcr\nnl", "x　y",
      "end\t", "\n\nstart", "mix3d4lph4num3ric",
      Bpe.TrainingCorpus.take(200))
    adversarial.foreach { s =>
      val mine = Bpe.countTokens(s)
      val ref = Bpe.PretokenRe.findAllIn(s)
        .map(t => refEncodeLen(t, Bpe.Merges)).sum
      assert(mine == ref, s"mismatch on '$s': $mine vs $ref")
      // structural bounds: at least one symbol per pretoken, at most one
      // per character
      val pretoks = Bpe.PretokenRe.findAllIn(s).toSeq
      assert(mine >= pretoks.size && mine <= pretoks.map(_.length).sum)
    }
    // merges actually fire: common English compresses below char count
    assert(Bpe.countTokens("the") == 1)
    assert(Bpe.countTokens("xqzkjv") > 1) // unseen letters stay split
  }

  test("Spark expression == driver-side count; null-safe; estimate alongside") {
    val s = sc
    import s.implicits._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "SELECT count(*) FROM lineitem WHERE l_quantity > 42"),
      (3L, "東京 の は 123"),
      (4L, ""),
      (5L, null.asInstanceOf[String]))
    val d = texts.toDF("id", "text")
    val out = d.select(col("id"),
      pipeline.ops.TextAnalysis.bpeTokenCountReal(col("text")).as("real"),
      pipeline.ops.TextAnalysis.bpeTokenCount(col("text")).as("est"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    texts.foreach { case (id, t) =>
      if (t == null) assert(out(id) == null)
      else assert(out(id) == Bpe.countTokens(t), s"row $id")
    }
    // merges compress English well below its character count
    assert(out(1L).asInstanceOf[Int] < "the quick brown fox jumps over the lazy dog".length)
    // SQL surface parity
    pipeline.expr.Functions.registerAll(s)
    d.createOrReplaceTempView("bpe_t")
    val viaSql = s.sql("SELECT id, graft_bpe_count(text) AS real FROM bpe_t")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(viaSql == out.map { case (k, v) => k -> v })
  }

  test("merges.txt: parse/render round-trip, headers+blanks skipped, typo fails fast") {
    val m = Vector(("l", "o"), ("lo", "w"), ("e", "s"))
    assert(Bpe.parseMerges(Bpe.renderMerges(m).linesIterator) == m)
    // GPT-2-shaped content: version header, blank line, CRLF line ends
    val gpt2ish = "#version: 0.2\nt h\n\nth e\r\ni n\n"
    assert(Bpe.parseMerges(gpt2ish.linesIterator) ==
      Vector(("t", "h"), ("th", "e"), ("i", "n")))
    // ONLY '#version' headers skip: real GPT-2 vocabularies carry merges
    // whose SYMBOLS start with '#' ('# #' builds multi-# code tokens) —
    // a blanket comment rule would silently truncate them
    assert(Bpe.parseMerges(Seq("#version: 0.2", "# #", "## #", "a b")) ==
      Vector(("#", "#"), ("##", "#"), ("a", "b")))
    assert(Bpe.parseMerges(Bpe.renderMerges(Vector(("#", "#"))).linesIterator) ==
      Vector(("#", "#")))
    // malformed lines must fail with the line number, not truncate
    val bad = intercept[IllegalArgumentException] {
      Bpe.parseMerges(Seq("a b", "three part line", "c d"))
    }
    assert(bad.getMessage.contains("line 2"), bad.getMessage)
    intercept[IllegalArgumentException] { Bpe.parseMerges(Seq("lonely")) }
    intercept[IllegalArgumentException] { Bpe.parseMerges(Seq("a  b")) } // empty mid-field
  }

  test("loaded table: encoding matches the reference applier; fixture unaffected") {
    // the fixture table exported to merges.txt and reloaded is the SAME
    // tokenizer — parity on the adversarial strings via the independent
    // applier, against the LOADED table's ranks
    val dir = java.nio.file.Files.createTempDirectory("bpe-spec")
    val path = dir.resolve("merges.txt")
    java.nio.file.Files.writeString(path, Bpe.renderMerges(Bpe.Merges))
    val loaded = Bpe.load(path.toString)
    assert(loaded == Bpe.Fixture && loaded.merges == Bpe.Merges)
    // interning: equal merge lists resolve to ONE instance per JVM (the
    // readResolve path — tasks must share ranks map + memo, not rebuild
    // them per deserialized expression)
    assert(loaded eq Bpe.Fixture)
    assert(pipeline.expr.BpeTable.intern(
      new pipeline.expr.BpeTable(Bpe.Merges)) eq Bpe.Fixture)
    // a DIFFERENT vocabulary: hand-written production-style merges that the
    // fixture corpus never learned (w-h, wh-o) — counts must differ from
    // the fixture's where the vocabularies disagree
    val custom = dir.resolve("custom.txt")
    java.nio.file.Files.writeString(custom,
      "#version: 0.2\nw h\nwh o\nq q\n")
    val tbl = Bpe.load(custom.toString)
    val adversarial = Seq("who", "whowho", "qqq", "the", "wh", "o", "")
    adversarial.foreach { s =>
      val viaRef = Bpe.PretokenRe.findAllIn(s)
        .map(t => refEncodeLen(t, tbl.merges)).sum
      assert(tbl.countTokens(s) == viaRef, s"loaded-table mismatch on '$s'")
    }
    assert(tbl.countTokens("who") == 1)   // w+h → wh, wh+o → who
    assert(tbl.countTokens("qqq") == 2)   // qq + q
    assert(Bpe.countTokens("who") > 1)    // fixture never learned 'who'
    // loadCached: same instance per path, parsed once
    assert(Bpe.loadCached(custom.toString) eq Bpe.loadCached(custom.toString))
  }

  test("Spark expression with a loaded table; SQL mergesPath arg; plan equality") {
    val s = sc
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-spec-spark")
    val path = dir.resolve("m.txt")
    java.nio.file.Files.writeString(path, "w h\nwh o\n")
    val tbl = Bpe.load(path.toString)
    val d = Seq((1L, "who is who"), (2L, "the who"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = d.select(col("id"),
      pipeline.ops.TextAnalysis.bpeTokenCountReal(col("text"), tbl).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(out(1L) == tbl.countTokens("who is who"))
    assert(out(2L) == tbl.countTokens("the who"))
    assert(out(3L) == null)
    // SQL surface: optional merges-path literal
    pipeline.expr.Functions.registerAll(s)
    d.createOrReplaceTempView("bpe_load_t")
    val viaSql = s.sql(
      s"SELECT id, graft_bpe_count(text, '${path.toString}') AS n FROM bpe_load_t")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(viaSql == out)
    // expression equality is by merge table: equal vocabularies unify
    // (semanticEquals / exchange reuse), different vocabularies don't
    import pipeline.expr.BpeCountExpr
    val e = org.apache.spark.sql.GraftColumnBridge.expression(col("text"))
    assert(BpeCountExpr(e, Bpe.load(path.toString)) == BpeCountExpr(e, tbl))
    assert(BpeCountExpr(e, Bpe.Fixture) != BpeCountExpr(e, tbl))
  }

  // -------------------------------------------------------------------
  // Byte-level (GPT-2) mode
  // -------------------------------------------------------------------

  /** The published GPT-2 pretokenizer pattern compiled the way the
    * upstream (Unicode-aware) regex engine reads it — the independent
    * oracle for the hand-rolled scanner in Bpe.gpt2TokenEnd. Python's
    * `regex` \s (str.isspace semantics) also matches the information
    * separators U+001C–001F, which Java's \s excludes even under
    * UNICODE_CHARACTER_CLASS — so the class is spelled out explicitly
    * everywhere the upstream pattern says \s. */
  private val Gpt2Re = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\x1C-\x1F\p{L}\p{N}]+|[\s\x1C-\x1F]+(?![^\s\x1C-\x1F])|[\s\x1C-\x1F]+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  private def reTokens(s: String): Vector[String] = {
    val m = Gpt2Re.matcher(s)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  test("byte-level: ByteEnc is the GPT-2 bytes_to_unicode bijection") {
    assert(Bpe.ByteEnc.length == 256 && Bpe.ByteEnc.distinct.length == 256)
    // the canonical pins every GPT-2 merges.txt relies on
    assert(Bpe.ByteEnc(0x20) == 'Ġ') // space → U+0120
    assert(Bpe.ByteEnc(0x0A) == 'Ċ') // LF → U+010A
    assert(Bpe.ByteEnc(0x09) == 'ĉ') // tab → U+0109
    assert(Bpe.ByteEnc(0xAD) == 'Ń') // soft hyphen, the 68th shifted byte
    // printable-and-unambiguous bytes map to themselves
    assert(Bpe.ByteEnc('a') == 'a' && Bpe.ByteEnc('!') == '!' &&
      Bpe.ByteEnc(0xA1) == 0xA1.toChar && Bpe.ByteEnc(0xFF) == 0xFF.toChar)
    // shifted bytes land at 0x100+n in increasing byte order
    assert(Bpe.ByteEnc(0x00) == 0x100.toChar && Bpe.ByteEnc(0x01) == 0x101.toChar)
    // UTF-8 multi-byte: é = C3 A9, both in keep ranges → the famous "Ã©"
    assert(Bpe.toByteSymbols("é") == "Ã©")
    assert(Bpe.toByteSymbols(" the") == "Ġthe")
    assert(Bpe.toByteSymbols("\n\n") == "ĊĊ")
  }

  test("byte-level: hand-rolled GPT-2 pretokenizer == compiled pattern") {
    val texts = Seq(
      "Hello world", "don't stop, we're I've I'm he'll she'd it'S can't",
      "  leading", "trailing  ", "a  b   c", "tabs\t\tand\nnewlines\r\n",
      "    indented code\n        deeper\n", "東京タワー123ビル",
      "über straße", "naïve café", "x y", "　ideographic space",
      "𝒜𝒷𝒸 𝟙𝟚", "😀 emoji 🚀!", "price: $1,234.56 (-7%)",
      "'quoted' ''s", " 's", "a'll", "I'LL", "'", "a'", "'x",
      "", " ", "\n", "  ", "\n\n", " \n", "\n ", "mix3d4lph4num3ric",
      "http://a.example/path?q=1&r=2", "a b", "end\t", "\n\nstart",
      // U+001C–001F: whitespace under Python's \s (str.isspace), NOT under
      // Java's — the scanner follows Python (ADVICE r5); built via toChar
      // so no raw control bytes land in this source file
      "a" + 0x1C.toChar + "b", 0x1D.toChar.toString + 0x1E.toChar + "x",
      "fs" + 0x1C.toChar + 0x1C.toChar + 0x1C.toChar + "gs", 0x1F.toChar.toString,
      Bpe.TrainingCorpus.take(300))
    texts.foreach { s =>
      assert(Bpe.gpt2Pretokens(s).toVector == reTokens(s),
        s"pretokenizer mismatch on '${s.take(40)}'")
    }
    // pretokens always concatenate back to the input (nothing dropped —
    // unlike char level, whitespace is kept and counted)
    texts.foreach(s => assert(Bpe.gpt2Pretokens(s).mkString == s))
  }

  test("byte-level: hand-computed merges; Ġ-marker entries fire") {
    // a production-shaped vocabulary: space-marker merges building " the"
    val tbl = pipeline.expr.BpeTable.intern(new pipeline.expr.BpeTable(
      Vector(("Ġ", "t"), ("Ġt", "h"), ("Ġth", "e")), byteLevel = true))
    assert(tbl.countTokens(" the") == 1)  // Ġ+t → Ġt+h → Ġth+e → Ġthe
    assert(tbl.countTokens("the") == 3)   // no leading space: no merge applies
    assert(tbl.countTokens("the the") == 3 + 1)
    // whitespace itself tokenizes: "a  b" → ["a", " ", " b"] → 1+1+2
    assert(tbl.countTokens("a  b") == 4)
    // parity with the independent rank-order applier over byte symbols,
    // on the full adversarial set, against the LEARNED byte-level fixture
    val adversarial = Seq(
      "the quick brown fox", "don't we're it's", "  indent\n\ncode",
      "東京タワー123ビル", "über straße", "😀!", " 's", "a  b   c",
      "", " ", "\n\n", Bpe.TrainingCorpus.take(200))
    adversarial.foreach { s =>
      val mine = Bpe.FixtureByteLevel.countTokens(s)
      val ref = reTokens(s)
        .map(t => refEncodeLen(Bpe.toByteSymbols(t), Bpe.FixtureByteLevel.merges))
        .sum
      assert(mine == ref, s"byte-level mismatch on '${s.take(40)}': $mine vs $ref")
    }
  }

  test("byte-level: degenerate uniform runs stay tractable (merge-all per pass)") {
    // a junk doc padded with 100k spaces: ONE >64-char pretoken, memo
    // bypassed. With run merges (the shape real GPT-2 vocabularies carry)
    // the merge-all-per-pass encode collapses it in O(log n) passes —
    // one-at-a-time would do ~1e10 operations here and hang the suite.
    val runTbl = pipeline.expr.BpeTable.intern(new pipeline.expr.BpeTable(
      Vector(("Ġ", "Ġ"), ("ĠĠ", "ĠĠ")), byteLevel = true))
    val padded = " " * 100000
    // 100k Ġ → 50k ĠĠ → 25k ĠĠĠĠ, no further merge applies
    assert(runTbl.countTokens(padded) == 25000)
    // trailing pad after text: run of 99999 splits k−1/1 before 'x'
    assert(Bpe.gpt2Pretokens(" " * 3 + "x").toVector == Vector("  ", " x"))
    // merge-all == one-at-a-time on a mixed string (regression vs the
    // independent rank-order applier, which IS one-at-a-time)
    val mixed = "  a  b " + (" " * 70) + " end"
    val viaRef = reTokens(mixed)
      .map(t => refEncodeLen(Bpe.toByteSymbols(t), runTbl.merges)).sum
    assert(runTbl.countTokens(mixed) == viaRef)
  }

  test("byte-level fixture: deterministic, Ġ merges learned, mode isolation") {
    // rerun-stable (pure function of the embedded corpus)
    assert(Bpe.learn(Bpe.TrainingCorpus, 8192, byteLevel = true) ==
      Bpe.FixtureByteLevel.merges)
    // the corpus-learned table carries space-marker merges — the entries a
    // verbatim upstream vocabulary lives on — and they FIRE on real text
    assert(Bpe.FixtureByteLevel.merges.exists(_._1.startsWith("Ġ")))
    assert(Bpe.FixtureByteLevel.countTokens(" the") == 1,
      "common ' the' must compress to one token under the byte-level fixture")
    // same merges + different mode ≠ same table (equality, interning)
    assert(Bpe.FixtureByteLevel != Bpe.Fixture)
    val charTwin = pipeline.expr.BpeTable.intern(
      new pipeline.expr.BpeTable(Bpe.FixtureByteLevel.merges, byteLevel = false))
    assert(charTwin != Bpe.FixtureByteLevel && !(charTwin eq Bpe.FixtureByteLevel))
  }

  test("byte-level: loader round-trip; per-(path, mode) cache; SQL 3rd arg") {
    val s = sc
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-spec-byte")
    val path = dir.resolve("merges.txt")
    // the byte-level fixture rendered to GPT-2 format and reloaded is the
    // SAME tokenizer instance (interning by (merges, mode))
    java.nio.file.Files.writeString(path,
      Bpe.renderMerges(Bpe.FixtureByteLevel.merges))
    assert(Bpe.load(path.toString, byteLevel = true) eq Bpe.FixtureByteLevel)
    // one file, two modes → two distinct cached tables
    val charT = Bpe.loadCached(path.toString)
    val byteT = Bpe.loadCached(path.toString, byteLevel = true)
    assert(!(charT eq byteT) && charT.merges == byteT.merges)
    assert(byteT eq Bpe.loadCached(path.toString, byteLevel = true))
    // Spark expression parity in byte mode (null-safe)
    val d = Seq((1L, "the quick brown fox"), (2L, "a  b\n\nc"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val out = d.select(col("id"),
      pipeline.ops.TextAnalysis.bpeTokenCountReal(col("text"), Bpe.FixtureByteLevel).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(out(1L) == Bpe.FixtureByteLevel.countTokens("the quick brown fox"))
    assert(out(2L) == Bpe.FixtureByteLevel.countTokens("a  b\n\nc"))
    assert(out(3L) == null)
    // SQL surface: 3rd arg selects the pretokenizer; '' path keeps fixture
    pipeline.expr.Functions.registerAll(s)
    d.createOrReplaceTempView("bpe_byte_t")
    val viaSql = s.sql(
      "SELECT id, graft_bpe_count(text, '', 'byte') AS n FROM bpe_byte_t")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(viaSql == out)
    val viaPath = s.sql(
      s"SELECT id, graft_bpe_count(text, '${path.toString}', 'byte') AS n FROM bpe_byte_t")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(viaPath == out)
    val bad = intercept[Exception] {
      s.sql("SELECT graft_bpe_count(text, '', 'weird') FROM bpe_byte_t").collect()
    }
    assert(bad.getMessage.contains("pretokenizer") ||
      Option(bad.getCause).exists(_.getMessage.contains("pretokenizer")))
  }

  // -------------------------------------------------------------------
  // Token-ID emission
  // -------------------------------------------------------------------

  private val idAdversarial = Seq(
    "the quick brown fox", "don't we're it's", "  indent\n\ncode",
    "東京タワー123ビル", "über straße", "😀!", " 's", "a  b   c",
    "", " ", "\n\n", "price: $1,234.56 (-7%)", "mix3d4lph4num3ric",
    "a" + 0x1C.toChar + "b", "  spaced   out  ",
    Bpe.TrainingCorpus.take(200))

  test("encodeIds: byte-level == independent applier ids; size == count; lossless round-trip") {
    val tbl = Bpe.FixtureByteLevel
    val vmap = tbl.vocab.toMap
    idAdversarial.foreach { s =>
      val ids = tbl.encodeIds(s)
      // the independent rank-order applier's symbol sequence, mapped
      // through the vocabulary — must match id for id, in order
      val ref = reTokens(s).flatMap(t =>
        refEncodeSyms(Bpe.toByteSymbols(t), tbl.merges)).map(vmap)
      assert(ids.toVector == ref, s"id mismatch on '${s.take(40)}'")
      assert(ids.length == tbl.countTokens(s),
        s"size(ids) != countTokens on '${s.take(40)}'")
      // byte-level decode∘encode is the identity — whitespace included
      assert(tbl.decodeIds(ids) == s, s"round-trip broke on '${s.take(40)}'")
    }
  }

  test("encodeIds: char-level size parity; UNK for out-of-alphabet chars; lossy decode") {
    val tbl = Bpe.Fixture
    idAdversarial.foreach { s =>
      val ids = tbl.encodeIds(s)
      assert(ids.length == tbl.countTokens(s), s"char-level size on '${s.take(40)}'")
      assert(ids.forall(i => i >= 0 && i < tbl.vocabSize))
    }
    // CJK chars are outside the derived training alphabet → UNK, which
    // decodes to U+FFFD; ASCII pretokens decode exactly (whitespace is
    // dropped — char level never tokenized it)
    val ids = tbl.encodeIds("the 東京 cat")
    assert(ids.contains(tbl.unkId))
    assert(tbl.decodeIds(ids) == "the" + "��" + "cat")
    // decode rejects corrupt ids with null, never throws
    assert(tbl.decodeIds(Array(-1)) == null)
    assert(tbl.decodeIds(Array(Int.MaxValue)) == null)
    assert(Bpe.FixtureByteLevel.decodeIds(Array(999999)) == null)
  }

  test("derived vocab: byte-level bases are ids 0..255, products follow ranks; no unk") {
    val tbl = Bpe.FixtureByteLevel
    val v = tbl.vocab
    // base ids: byte order through ByteEnc
    (0 until 256).foreach { b =>
      assert(v(b) == (String.valueOf(Bpe.ByteEnc(b)), b))
    }
    // products take the next ids in rank order
    assert(v(256)._1 == tbl.merges.head._1 + tbl.merges.head._2)
    assert(tbl.unkId == -1)
    assert(tbl.vocabSize == v.size)
    assert(v.map(_._2) == v.indices.toVector) // dense
    // char-level: sorted char alphabet + products + one UNK slot
    val ct = Bpe.Fixture
    val baseChars = ct.vocab.takeWhile(_._1.length == 1).map(_._1)
    assert(baseChars == baseChars.sorted)
    assert(ct.unkId == ct.vocab.size && ct.vocabSize == ct.vocab.size + 1)
  }

  test("vocab.json: parse/render round-trip; validation failures") {
    val v = Vector(("Ġ", 0), ("a", 1), ("# #", 2), ("\"q\\u", 3))
    assert(Bpe.parseVocab(Bpe.renderVocab(v)) == v)
    // GPT-2-shaped json with unicode escapes and weird keys
    assert(Bpe.parseVocab("""{"Ġthe": 262, "Ġof": 286}""") ==
      Vector(("Ġthe", 262), ("Ġof", 286)))
    intercept[IllegalArgumentException] { Bpe.parseVocab("""[1,2]""") }
    intercept[IllegalArgumentException] { Bpe.parseVocab("""{"a": 1.5}""") }
    intercept[IllegalArgumentException] { Bpe.parseVocab("""{"a": -2}""") }
    intercept[IllegalArgumentException] { Bpe.parseVocab("""{"a": "x"}""") }
    intercept[IllegalArgumentException] { Bpe.parseVocab("""{"a": 1, "a": 2}""") }
    intercept[IllegalArgumentException] { Bpe.parseVocab("""{"a": 1, "b": 1}""") }
  }

  test("load with vocab.json: upstream ids win over derived; coverage validated") {
    val dir = java.nio.file.Files.createTempDirectory("bpe-vocab")
    val mpath = dir.resolve("merges.txt")
    java.nio.file.Files.writeString(mpath,
      Bpe.renderMerges(Bpe.FixtureByteLevel.merges))
    // a permuted id assignment (reverse order) — a VERBATIM upstream
    // vocabulary whose ids differ from rank derivation must be honored
    val derived = Bpe.FixtureByteLevel.vocab
    val maxId = derived.map(_._2).max
    val permuted = derived.map { case (t, i) => (t, maxId - i) }
    val vpath = dir.resolve("vocab.json")
    java.nio.file.Files.writeString(vpath, Bpe.renderVocab(permuted))
    val tbl = Bpe.load(mpath.toString, byteLevel = true, vpath.toString)
    assert(tbl.explicitVocab.contains(permuted))
    assert(tbl != Bpe.FixtureByteLevel) // vocab participates in identity
    val s = "the quick fox"
    val viaDerived = Bpe.FixtureByteLevel.encodeIds(s)
    assert(tbl.encodeIds(s).toVector == viaDerived.toVector.map(maxId - _))
    assert(tbl.decodeIds(tbl.encodeIds(s)) == s) // still lossless
    assert(tbl.countTokens(s) == Bpe.FixtureByteLevel.countTokens(s))
    // coverage validation: a vocab missing a base byte symbol fails fast
    val holey = dir.resolve("holey.json")
    java.nio.file.Files.writeString(holey,
      Bpe.renderVocab(permuted.filterNot(_._1 == "Ġ")))
    val err = intercept[IllegalArgumentException] {
      Bpe.load(mpath.toString, byteLevel = true, holey.toString)
    }
    assert(err.getMessage.contains("base byte symbol"))
    // missing merge product fails too
    val noProd = dir.resolve("noprod.json")
    val firstProd = Bpe.FixtureByteLevel.merges.head match { case (l, r) => l + r }
    java.nio.file.Files.writeString(noProd,
      Bpe.renderVocab(permuted.filterNot(_._1 == firstProd)))
    intercept[IllegalArgumentException] {
      Bpe.load(mpath.toString, byteLevel = true, noProd.toString)
    }
    // char-level + vocab.json refused (GPT-2 ids are byte-level)
    intercept[IllegalArgumentException] {
      Bpe.load(mpath.toString, byteLevel = false, vpath.toString)
    }
    // loadCached keys on (path, mode, vocabPath)
    assert(Bpe.loadCached(mpath.toString, byteLevel = true, vpath.toString) eq
      Bpe.loadCached(mpath.toString, byteLevel = true, vpath.toString))
    assert(!(Bpe.loadCached(mpath.toString, byteLevel = true) eq
      Bpe.loadCached(mpath.toString, byteLevel = true, vpath.toString)))
  }

  test("encodeIds: degenerate 100k-space run stays tractable and round-trips") {
    val runTbl = pipeline.expr.BpeTable.intern(new pipeline.expr.BpeTable(
      Vector(("Ġ", "Ġ"), ("ĠĠ", "ĠĠ")), byteLevel = true))
    val padded = " " * 100000
    val ids = runTbl.encodeIds(padded)
    assert(ids.length == 25000 && ids.length == runTbl.countTokens(padded))
    assert(runTbl.decodeIds(ids) == padded)
  }

  test("Spark expression + SQL surface: encode/decode parity, vocabPath arg") {
    val s = sc
    import s.implicits._
    val tbl = Bpe.FixtureByteLevel
    val texts = Seq((1L, "the quick brown fox"), (2L, "a  b\n\nc"),
      (3L, null.asInstanceOf[String]))
    val d = texts.toDF("id", "text")
    val out = d.select(col("id"),
      Bpe.bpeEncode(col("text"), tbl).as("ids"),
      Bpe.bpeDecode(Bpe.bpeEncode(col("text"), tbl), tbl).as("rt"))
      .collect().map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) null else r.getSeq[Int](1).toVector,
        if (r.isNullAt(2)) null else r.getString(2))).toMap
    texts.foreach { case (id, t) =>
      if (t == null) assert(out(id) == ((null, null)))
      else assert(out(id) == ((tbl.encodeIds(t).toVector, t)), s"row $id")
    }
    // SQL: graft_bpe_encode / graft_bpe_decode with mode + vocabPath args
    pipeline.expr.Functions.registerAll(s)
    d.createOrReplaceTempView("bpe_ids_t")
    val viaSql = s.sql(
      "SELECT id, graft_bpe_decode(graft_bpe_encode(text, '', 'byte'), '', 'byte') AS rt " +
        "FROM bpe_ids_t")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    texts.foreach { case (id, t) => assert(viaSql(id) == t) }
    // vocabPath without mergesPath is refused (fixtures use derived ids)
    val bad = intercept[Exception] {
      s.sql("SELECT graft_bpe_encode(text, '', 'byte', '/tmp/v.json') FROM bpe_ids_t").collect()
    }
    assert(bad.getMessage.contains("vocabPath") ||
      Option(bad.getCause).exists(_.getMessage.contains("vocabPath")))
    // corrupt ids decode to null, not an exception
    val nullRt = s.sql("SELECT graft_bpe_decode(array(999999), '', 'byte') AS x")
      .collect().head
    assert(nullRt.isNullAt(0))
  }

  test("learnFromCounts: incremental indexed loop == naive recount reference") {
    // the naive form: full pair recount + argmax scan + full rebuild per
    // merge — quadratic, but unarguably correct; the production loop must
    // match it merge-for-merge, including tie-breaks and early stop
    def naive(words0: Map[Vector[String], Long], numMerges: Int): Vector[(String, String)] = {
      var words = words0
      val out = Vector.newBuilder[(String, String)]
      var n = 0
      var done = false
      while (n < numMerges && !done) {
        val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
        words.foreach { case (s, f) =>
          (0 until s.length - 1).foreach(i => pc.update((s(i), s(i + 1)),
            pc.getOrElse((s(i), s(i + 1)), 0L) + f))
        }
        val best = pc.filter(_._2 >= 2)
        if (best.isEmpty) done = true
        else {
          val (pair, _) = best.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          out += pair
          words = words.map { case (s, f) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == pair._1 && s(i + 1) == pair._2) {
                b += pair._1 + pair._2; i += 2
              } else { b += s(i); i += 1 }
            }
            b.result() -> f
          }.groupMapReduce(_._1)(_._2)(_ + _)
          n += 1
        }
      }
      out.result()
    }
    def counts(corpus: String): Map[Vector[String], Long] =
      pipeline.expr.Bpe.PretokenRe.findAllIn(corpus).toSeq
        .groupBy(w => w.map(_.toString).toVector)
        .map { case (k, ws) => k -> ws.size.toLong }
    // overlapping-run, tie, and early-stop shapes + the embedded corpus
    val cases = Seq(
      "aaa aaa bbb aaa",                         // overlapping same-symbol runs
      "ab ab ba ba cd cd",                       // exact count ties → lexicographic
      "xyz",                                     // nothing occurs twice → 0 merges
      "low lower lowest newest newer wide wider widest " * 3,
      pipeline.expr.Bpe.TrainingCorpus.take(4000))
    cases.foreach { c =>
      val w = counts(c)
      for (m <- Seq(1, 5, 50))
        assert(pipeline.expr.Bpe.learnFromCounts(w, m) == naive(w, m),
          s"divergence on '${c.take(40)}...' at $m merges")
    }
    // deterministic pseudo-random word tables (seeded — no RNG in prod code)
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val w = (1 to 60).map { _ =>
        Vector.fill(rnd.nextInt(6) + 1)(('a' + rnd.nextInt(4)).toChar.toString) ->
          (rnd.nextInt(5) + 1).toLong
      }.groupMapReduce(_._1)(_._2)(_ + _)
      assert(pipeline.expr.Bpe.learnFromCounts(w, 30) == naive(w, 30))
    }
  }

  test("train: distributed word-count front-end == learnFromCounts on exact per-doc counts") {
    val s = sc
    import s.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown cat naps under the lazy tree",
      "quick quick brown brown the the the fox",
      "lowest lower lowest newest newer newest wide wider widest")
    val df = docs.toDF("text").repartition(3)
    for (byteLevel <- Seq(false, true)) {
      // reference counts computed per doc in plain Scala (boundary-free:
      // no concatenation, so gpt2 whitespace attachment can't differ)
      val ref = docs.flatMap { d =>
        if (byteLevel) pipeline.expr.Bpe.gpt2Pretokens(d)
          .map(pipeline.expr.Bpe.toByteSymbols).toSeq
        else pipeline.expr.Bpe.PretokenRe.findAllIn(d).toSeq
      }.groupBy(w => w.map(_.toString).toVector)
        .map { case (k, ws) => k -> ws.size.toLong }
      val want = pipeline.expr.Bpe.learnFromCounts(ref, 25)
      val table = pipeline.expr.Bpe.train(df, "text", 25, byteLevel)
      assert(table.merges == want, s"byteLevel=$byteLevel")
      assert(table.byteLevel == byteLevel)
    }
  }

  test("train: learned table encodes losslessly, compresses, and round-trips merges.txt") {
    val s = sc
    import s.implicits._
    val docs = Seq(
      "low lower lowest low low lowest",
      "new newer newest new new newest",
      "wide wider widest wide wide widest")
    val df = docs.toDF("text").repartition(2)
    val table = pipeline.expr.Bpe.train(df, "text", 40, byteLevel = true)
    assert(table.merges.nonEmpty)
    // byte-level decode∘encode is the identity on the training corpus
    val rt = df.select(col("text"),
      pipeline.expr.Bpe.bpeDecode(
        pipeline.expr.Bpe.bpeEncode(col("text"), table), table).as("back"))
      .collect()
    rt.foreach(r => assert(r.getString(0) == r.getString(1)))
    // the merges COMPRESS: fewer ids than base symbols on a repeated word
    val nIds = df.select(org.apache.spark.sql.functions.size(
      pipeline.expr.Bpe.bpeEncode(col("text"), table)).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    val nSyms = docs.map(d => pipeline.expr.Bpe.gpt2Pretokens(d)
      .map(pipeline.expr.Bpe.toByteSymbols(_).length).sum).sum
    assert(nIds < nSyms, s"$nIds ids vs $nSyms base symbols")
    // the trained table ships as a standard merges.txt and loads back
    val p = java.nio.file.Files.createTempFile("trained", ".txt")
    java.nio.file.Files.writeString(p,
      pipeline.expr.Bpe.renderMerges(table.merges))
    val loaded = pipeline.expr.Bpe.load(p.toString, byteLevel = true)
    assert(loaded.merges == table.merges)
    // maxWords cap: keeping only the top words is deterministic and
    // equals learning from the capped count table
    val all = df.select(explode(
        pipeline.expr.Bpe.pretokens(col("text"), byteLevel = true)).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val top3 = all.sortBy { case (w, c) => (-c, w) }.take(3)
      .map { case (w, c) => w.map(_.toString).toVector -> c }.toMap
    val capped = pipeline.expr.Bpe.train(df, "text", 10, byteLevel = true,
      maxWords = 3)
    assert(capped.merges == pipeline.expr.Bpe.learnFromCounts(top3, 10))
  }
}
