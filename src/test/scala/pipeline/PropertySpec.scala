package pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import pipeline.fixtures.Webtext
import pipeline.model.WebDoc
import pipeline.ref.RefNormalizer
import pipeline.stages.{Parse, Route, RouteRule}

/** Property-based invariants (SURVEY.md §5.2.4):
  *  ∀ routing configs: Σ per-sink counts = Σ rows |sinks(row)|;
  *  fan-in union count = Σ source counts;
  *  parse∘truncate agrees with the reference spec on arbitrary text;
  *  salting never changes multiplicity. */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, 4, "property-spec")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  /** Seed-fixed property driver (no scalatest-scalacheck bridge offline). */
  private def forAll[A](gen: Gen[A], n: Int = 8)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      check(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val genRules: Gen[Seq[RouteRule]] = for {
    n <- Gen.choose(1, 4)
    rules <- Gen.listOfN(n, for {
      sink <- Gen.oneOf("s1", "s2", "s3", "s4")
      pred <- Gen.oneOf(
        col("status") >= 500, col("status") === 200, col("lang") === "en",
        col("bytes") > 500000L, lit(true))
    } yield RouteRule(pred, sink))
  } yield rules :+ RouteRule(lit(true), "catchall")

  test("∀ rule sets: per-sink counts sum to Σ |sinks(row)| and rows never vanish") {
    val s = sc
    val parsed = Parse(Webtext.df(s, 1200, 4)).cache()
    val total = parsed.count()
    forAll(genRules) { rules =>
      val routed = Route(parsed, rules)
      val bySink = routed.groupBy("sink").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySink.values.sum == routed.count())
      // catchall guarantees every non-corrupt row lands somewhere; corrupt
      // rows land in deadletter exclusively
      val nonCorrupt = parsed.filter(!col("is_corrupt")).count()
      val corrupt = total - nonCorrupt
      assert(bySink.getOrElse("deadletter", 0L) == corrupt)
      // distinct (doc, sink) per rule-sink ≤ nonCorrupt; catchall == nonCorrupt
      assert(bySink("catchall") == nonCorrupt)
    }
    parsed.unpersist()
  }

  test("∀ splits: fan-in union-all count = Σ source counts") {
    val s = sc
    val docs = Webtext.df(s, 1000, 4).cache()
    forAll(Gen.choose(1, 99)) { pct =>
      val a = docs.filter(pmod(xxhash64(col("url")), lit(100)) < pct)
        .withColumn("source", lit("a"))
      val b = docs.filter(pmod(xxhash64(col("url")), lit(100)) >= pct)
        .withColumn("source", lit("b"))
      val u = a.unionByName(b)
      assert(u.count() == a.count() + b.count())
      assert(u.count() == 1000L)
    }
    docs.unpersist()
  }

  private val genText: Gen[String] = for {
    title <- Gen.option(Gen.alphaNumStr.map(t => s"title: $t"))
    status <- Gen.option(Gen.choose(0, 999))
    hasJson <- Gen.oneOf(true, false)
    corrupt <- Gen.oneOf(true, false)
    body <- Gen.listOf(Gen.oneOf("spark", "scan", "über", "東京", "x y")).map(_.mkString(" "))
    pad <- Gen.choose(0, 3)
  } yield {
    val kv = status.map(st => s"status=$st bytes=7 method=GET").getOrElse("no kv here")
    val json = if (!hasJson) "" else if (corrupt) "\n{\"broken\": " else "\n" + Webtext.nginxJson(2L)
    title.getOrElse("untitled") + "\n" + kv + "\n" + body + json + ("\n" * pad)
  }

  test("∀ texts: Spark parse ≡ RefNormalizer (fields + extracted bytes)") {
    val s = sc
    import s.implicits._
    forAll(Gen.listOfN(30, genText)) { texts =>
      val docs = texts.zipWithIndex.map { case (tx, i) =>
        WebDoc(s"https://prop.example.com/$i", new java.sql.Timestamp(i * 60000L), null, tx, "en")
      }
      val got = Parse(docs.toDF())
        .select("url", "extracted_text", "status", "bytes", "method", "title", "is_corrupt")
        .as[(String, String, Int, Long, String, String, Boolean)]
        .collect().map(r => r._1 -> r).toMap
      docs.foreach { d =>
        val ref = RefNormalizer.parse(d)
        val g = got(d.url)
        assert(g._2 == ref.extracted_text, s"text for ${d.url}: [${d.text}]")
        assert(g._3 == ref.status && g._4 == ref.bytes && g._5 == ref.method
          && g._6 == ref.title && g._7 == ref.is_corrupt, s"fields for [${d.text}]")
      }
    }
  }

  test("∀ texts: round-4 op invariants (bpe bounds, paragraph conservation, tfidf ranks)") {
    val s = sc
    import s.implicits._
    forAll(Gen.listOfN(40, genText), n = 6) { texts =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

      // BPE: pretoken count ≤ real count ≤ estimate-regex char mass; and
      // the whitespace estimate can differ, but both are non-negative
      val bpe = d.select(
        pipeline.ops.TextAnalysis.bpeTokenCount(col("text")).as("est"),
        pipeline.ops.TextAnalysis.bpeTokenCountReal(col("text")).as("real"))
        .collect()
      bpe.foreach { r =>
        val (est, real) = (r.getInt(0), r.getInt(1))
        assert(real >= est, s"real BPE count $real < pretoken count $est " +
          "(each pretoken encodes to >= 1 symbol)")
      }

      // paragraph dedup conservation: Σ n_paras == total exploded chunks;
      // Σ n_kept == number of DISTINCT paragraph digests corpus-wide;
      // 0 <= n_kept <= n_paras per doc
      val stats = pipeline.ops.CorpusRefine.paragraphDedup(d, "doc_id", "text", k = 2)
      val rows = stats.collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(rows.forall { case (np, nk) => nk >= 0 && nk <= np })
      val exploded = d.select(col("doc_id"),
        explode(pipeline.ops.CorpusRefine.wordChunks(
          pipeline.ops.Portable.tokens(col("text")), 2)).as("para"))
      assert(rows.map(_._1).sum == exploded.count())
      assert(rows.map(_._2).sum == exploded.select("para").distinct().count())

      // tfidf: per-doc ranks are dense 1..min(k, #terms); df ≥ 1; score > 0
      val tf = pipeline.ops.CorpusRefine.tfidfTopK(d, "doc_id", "text", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4), r.getLong(5)))
      tf.groupBy(_._1).foreach { case (_, rs) =>
        assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq, "ranks must be dense from 1")
      }
      assert(tf.forall { case (_, df, score, _) => df >= 1 && score > 0.0 })
    }
  }

  test("∀ mp4 params: encode→header identity; ∀ merge tables: render→parse identity") {
    // MP4: header(encode(p)) == p over the whole parameter lattice
    val genMp4 = for {
      ts <- Gen.choose(1, 1000000)
      dur <- Gen.choose(0L, 0xffffffffL)
      w <- Gen.choose(1, 32767)
      h <- Gen.choose(1, 32767)
    } yield (ts, dur, w, h)
    forAll(genMp4, n = 24) { case (ts, dur, w, h) =>
      val bytes = pipeline.expr.Mp4EncodeExpr.encode(ts, dur, w, h)
      assert(pipeline.expr.Mp4HeaderExpr.header(bytes)
        .contains(("isom", ts, dur, w, h)), s"($ts,$dur,${w}x$h)")
      // single-byte corruption anywhere must parse-or-refuse, never throw
      val pos = (ts + w) % bytes.length
      val mutated = bytes.clone(); mutated(pos) = (mutated(pos) ^ 0x55).toByte
      pipeline.expr.Mp4HeaderExpr.header(mutated)
    }
    // BPE merges.txt: parseMerges ∘ renderMerges == identity for any table
    // over space-free symbols (the format's alphabet)
    val genSym = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val genTable = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(genSym, genSym)).map(_.toVector))
    forAll(genTable, n = 16) { merges =>
      assert(pipeline.expr.Bpe.parseMerges(
        pipeline.expr.Bpe.renderMerges(merges).linesIterator) == merges)
      // and the loaded table prices any text within the structural bounds
      val tbl = new pipeline.expr.BpeTable(merges)
      val text = merges.take(5).map { case (l, r) => l + r }.mkString(" ") + " zz9"
      val n = tbl.countTokens(text)
      val pretoks = pipeline.expr.Bpe.PretokenRe.findAllIn(text).toSeq
      assert(n >= pretoks.size && n <= pretoks.map(_.length).sum)
    }
  }
}
