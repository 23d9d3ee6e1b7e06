package pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.ops.CorpusRefine

/** Semantics specs for the corpus-refinement ops (PII, URL canon/dedup,
  * repetition features, paragraph dedup, stratified sampling) — value-level
  * checks the DuckDB oracle can't express (brute-force cross-checks,
  * determinism, plan-shape negatives). */
class CorpusRefineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, 4, "corpusrefine-spec")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  test("redactPii removes every counted match and only those") {
    val s = sc
    import s.implicits._
    val d = Seq(
      (1L, "mail a.b+c@x-y.example.org and 10.0.0.1 tel +1-415-555-0000 done"),
      (2L, "no pii here, just words and 1.2 version numbers"),
      (3L, "two mails a@b.co c@d.io one ip 255.255.255.255"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val out = d.select(
      col("id"),
      CorpusRefine.piiCounts(col("text")).as("c"),
      CorpusRefine.redactPii(col("text")).as("red"))
      .select(col("id"), col("c.n_emails"), col("c.n_phones"), col("c.n_ips"), col("red"))
      .collect().sortBy(_.getLong(0))

    assert(out(0).getLong(1) == 1 && out(0).getLong(2) == 1 && out(0).getLong(3) == 1)
    assert(out(0).getString(4) == "mail <EMAIL> and <IP> tel <PHONE> done")
    assert(out(1).getLong(1) == 0 && out(1).getLong(3) == 0)
    assert(out(1).getString(4) == "no pii here, just words and 1.2 version numbers")
    assert(out(2).getLong(1) == 2 && out(2).getLong(3) == 1)
    // null text → null counts and null redaction (deadletter semantics)
    assert(out(3).isNullAt(1) && out(3).isNullAt(4))
    // the redacted output never re-matches any PII pattern
    val clean = d.filter(col("text").isNotNull)
      .select(CorpusRefine.piiCounts(CorpusRefine.redactPii(col("text"))).as("c"))
      .agg(sum(col("c.n_emails")) + sum(col("c.n_phones")) + sum(col("c.n_ips")))
      .head().getLong(0)
    assert(clean == 0)
  }

  test("canonicalizeUrl: tracking variants collapse, semantics preserved") {
    val s = sc
    import s.implicits._
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Path/7/?utm_source=feed&id=3#frag",
      "https://example.com/Path/7?id=3&utm_campaign=x",
      "https://example.com/Path/7?id=3",
      // different id param → must NOT collapse with the above
      "https://example.com/Path/7?id=4",
      // http default port + lone tracking param + trailing slash
      "HTTP://Example.com:80/a/b/?utm_source=x",
      "http://example.com/a/b",
      // non-default port is semantic and survives
      "https://example.com:8443/x?id=1",
      // scheme-less / malformed: must fall back to the RAW value, never
      // collapse to the constant "://" (distinct malformed URLs grouped
      // into one dedup bucket would silently drop all but one document)
      "example.com/no-scheme",
      "not a url at all",
      "://degenerate",
      // scheme present but host EMPTY: the hostport regex misses — must
      // also fall back raw (two such URLs must not share canon "http://")
      "http:///a",
      "http:///b")
    val canon = urls.toDF("url")
      .select(CorpusRefine.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(canon(0) == "https://example.com/Path/7?id=3")
    assert(canon(0) == canon(1) && canon(1) == canon(2))
    assert(canon(3) == "https://example.com/Path/7?id=4")
    assert(canon(4) == "http://example.com/a/b" && canon(4) == canon(5))
    assert(canon(6) == "https://example.com:8443/x?id=1")
    assert(canon(7) == "example.com/no-scheme")
    assert(canon(8) == "not a url at all")
    assert(canon(9) == "://degenerate")
    assert(canon(10) == "http:///a" && canon(11) == "http:///b")
    // null stays null (propagates; excluded from dedup by the null group)
    val nullOut = Seq((1L, null.asInstanceOf[String])).toDF("id", "url")
      .select(CorpusRefine.canonicalizeUrl(col("url"))).head()
    assert(nullOut.isNullAt(0))
  }

  test("urlDedup groups by canonical form and keeps the lowest id") {
    val s = sc
    import s.implicits._
    val d = Seq(
      (10L, "https://a.example/p?id=1&utm_source=x"),
      (3L, "HTTPS://A.EXAMPLE/p?id=1"),
      (7L, "https://a.example/p?id=2")).toDF("doc_id", "url")
    val out = CorpusRefine.urlDedup(d, "doc_id", "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq(
      ("https://a.example/p?id=1", 3L, 2L),
      ("https://a.example/p?id=2", 7L, 1L)))
  }

  test("repetitionFeatures: hand-computed top-bigram fraction") {
    val s = sc
    import s.implicits._
    // "x y x y x" → bigrams: [x y, y x, x y, y x] → top 2/4; distinct 2/5
    val d = Seq((1L, "x y x y x"), (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")
    val out = CorpusRefine.repetitionFeatures(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((4L, 2L, 0.5, 2.0 / 5.0)))
    assert(out(2L) == ((2L, 1L, 0.5, 1.0)))
    assert(!out.contains(3L)) // <2 words → no bigrams → absent (oracle mirrors)
    // per-document features must never shuffle: fully narrow plan
    val plan = CorpusRefine.repetitionFeatures(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("native repetition stats == HOF formulation, bit for bit") {
    val s = sc
    import s.implicits._
    val d = (Seq(
      (1L, "x y x y x"), (2L, "a b c"), (3L, "solo"), (4L, ""),
      (5L, null.asInstanceOf[String]), (6L, "  padded   spaces  here "),
      (7L, "a a a a a a"), (8L, "tab\tand\nnewline split")) ++
      (100L until 300L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} end")))
      .toDF("doc_id", "text")
    val nat = CorpusRefine.repetitionFeatures(d, "doc_id", "text")
    val hof = CorpusRefine.repetitionFeaturesHof(d, "doc_id", "text")
    assert(nat.exceptAll(hof).isEmpty && hof.exceptAll(nat).isEmpty)
    assert(nat.count() > 0 && nat.count() == hof.count())
  }

  test("paragraphDedup: first occurrence wins corpus-wide, brute-force parity") {
    val s = sc
    import s.implicits._
    val d = Seq(
      (1L, "a b c d e f"), // paras: "a b c", "d e f"
      (2L, "a b c x y z"), // "a b c" dup of doc1#0 → dropped here
      (3L, "d e f"), //        dup of doc1#1
      (4L, "fresh words only here now yes")).toDF("doc_id", "text")
    val out = CorpusRefine.paragraphDedup(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 2L)))
    assert(out(2L) == ((2L, 1L)))
    assert(out(3L) == ((1L, 0L)))
    assert(out(4L) == ((2L, 2L)))
    // determinism: rerun is identical
    val again = CorpusRefine.paragraphDedup(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == out)
    // plan guard (the round-3 skew finding): NO window at all — the stats
    // form keeps every row, so a rank window over the digest would sort a
    // ubiquitous boilerplate paragraph's copies in ONE task
    // (WindowGroupLimit can only prune rank-FILTERED windows). First
    // occurrence is a map-side-combinable min(struct) aggregate instead,
    // and the exploded frame is shared via ReusedExchange (one Generate).
    val q = CorpusRefine.paragraphDedup(d.repartition(2), "doc_id", "text", 3)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    val fp = { val c = p.indexOf("== Initial Plan =="); if (c < 0) p else p.substring(0, c) }
    assert(!fp.contains("windowspecdefinition"), s"stats form must not window:\n$fp")
    assert("Generate".r.findAllIn(fp).size == 1, fp)
    assert(fp.contains("ReusedExchange") || fp.contains("ReusedQueryStage"),
      s"firsts aggregate must reuse the exploded barrier exchange:\n$fp")
  }

  test("paragraphDedupApply rewrites docs with only surviving chunks, in order") {
    val s = sc
    import s.implicits._
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"), // "a b c" drops (doc1 owns it); "x y z" survives
      (3L, "d e f"), //        fully deduped → absent from the output
      (4L, "x y z a b c")) // both chunks already seen → absent
      .toDF("doc_id", "text")
    val out = CorpusRefine.paragraphDedupApply(d, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a b c d e f", 2L -> "x y z"))
  }

  test("tfidfTopK: rational score, deterministic ties, df counted once per doc") {
    val s = sc
    import s.implicits._
    // "rare" appears only in doc 1 (df=1); "common" in all 3 (df=3).
    val d = Seq(
      (1L, "rare common common"),
      (2L, "common beta beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val out = CorpusRefine.tfidfTopK(d, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(5)) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1: rare tf=1 df=1 → 3.0; common tf=2 df=3 → 2.0
    assert(out((1L, 1L)) == (("rare", 1L, 1L, 3.0)))
    assert(out((1L, 2L)) == (("common", 2L, 3L, 2.0)))
    // doc 2: beta tf=2 df=1 → 6.0 beats common tf=1 df=3 → 1.0
    assert(out((2L, 1L)) == (("beta", 2L, 1L, 6.0)))
    // doc 3: gamma 3.0, common 1.0
    assert(out((3L, 1L)) == (("gamma", 1L, 1L, 3.0)))
    // duplicate id rows merge in the pairs agg (tf doubles) but count ONCE
    // in N (countDistinct): rare tf=2, df=1, N=3 → 6.0. A row-count N
    // would give 8.0 and diverge from the oracle's count(DISTINCT doc_id).
    val dup = d.unionByName(Seq((1L, "rare common common")).toDF("doc_id", "text"))
    val outDup = CorpusRefine.tfidfTopK(dup, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L && col("rnk") === 1L)
      .select("term", "score").head()
    assert(outDup.getString(0) == "rare" && outDup.getDouble(1) == 6.0)
    // maxDocFreq cap: df("common") = 3 > 2 → common drops from RANKING
    // entirely; per-doc top-k re-ranks over the surviving terms
    val capped = CorpusRefine.tfidfTopK(d, "doc_id", "text", k = 2, maxDocFreq = 2L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(!capped.exists(_._2 == "common"), s"capped df must drop stop-terms: $capped")
    assert(capped == Set((1L, "rare"), (2L, "beta"), (3L, "gamma")))
    // plan guard (the round-3 scale-killer): df must NOT come from a
    // term-partitioned window (a stop-term's full row set through one
    // task); it comes from a map-side-combined groupBy(term) aggregate
    // that REUSES the barrier exchange, so the corpus still explodes
    // exactly once in the FINAL adaptive plan
    val q = CorpusRefine.tfidfTopK(d.repartition(2), "doc_id", "text", 2)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    val fp = { val c = p.indexOf("== Initial Plan =="); if (c < 0) p else p.substring(0, c) }
    assert("Generate explode".r.findAllIn(fp).size == 1, fp)
    val windowParts = "windowspecdefinition\\((\\w+)#".r.findAllMatchIn(fp)
      .map(_.group(1)).toSet
    assert(windowParts == Set("doc_id"),
      s"only the per-doc top-k window may exist (got $windowParts):\n$fp")
    assert(fp.contains("ReusedExchange") || fp.contains("ReusedQueryStage"),
      s"df aggregate must reuse the pairs barrier exchange:\n$fp")
  }

  test("packTokenShards: greedy sequential packing via distributed prefix sum") {
    val s = sc
    import s.implicits._
    val d = (0L until 1000L).map(i => (i, (i % 7) + 1)).toDF("doc_id", "n_tokens")
      .repartition(8)
    val out = CorpusRefine.packTokenShards(d, "doc_id", "n_tokens",
      budget = 50L, buckets = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // shard assignment equals the single-threaded greedy reference
    var cum = 0L
    out.foreach { case (_, n, shard) =>
      assert(shard == cum / 50L, s"row $out")
      cum += n
    }
    // shards are contiguous in id order and start at 0
    assert(out.head._3 == 0L)
    assert(out.map(_._3).distinct.sorted.toSeq ==
      (0L to out.last._3).toSeq)
    // the data-sized window is PARTITIONED (bucket column); the only
    // unpartitioned window runs over the tiny per-bucket offsets frame
    val plan = CorpusRefine.packTokenShards(d, "doc_id", "n_tokens", 50L, 10)
      .queryExecution.optimizedPlan.toString
    val windows = "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
    assert(windows.exists(_.startsWith("_b")),
      s"local cumsum must partition by bucket:\n$plan")
    // null ids would silently vanish through the min/max agg + offsets
    // join — rejected up front with a config-shaped error instead
    val withNull = d.unionByName(d.limit(1)
      .select(lit(null).cast("long").as("doc_id"), col("n_tokens")))
    val err = intercept[IllegalArgumentException] {
      CorpusRefine.packTokenShards(withNull, "doc_id", "n_tokens", 50L, 10)
    }
    assert(err.getMessage.contains("null id"), err.getMessage)
  }

  test("packSequences: fixed-length chunks equal the single-threaded concat reference") {
    val s = sc
    import s.implicits._
    // variable-length docs incl. empties; ids unique per (doc, position)
    // so a piece landing in the wrong sequence or order is always visible
    val docs = (0L until 200L).map { i =>
      (i, (0L until (i % 23)).map(j => i * 1000 + j).toArray)
    }
    val d = docs.toDF("doc_id", "ids").repartition(8)
    val L = 64
    val got = CorpusRefine.packSequences(d, "doc_id", "ids", seqLen = L,
      buckets = 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
      .sortBy(_._1)
    // single-threaded reference: concat in id order with EOS, chunk, drop tail
    val stream = docs.sortBy(_._1).flatMap { case (_, ids) => ids :+ -1L }
    val want = stream.grouped(L).filter(_.size == L).toList
    assert(got.map(_._1).toList == want.indices.map(_.toLong).toList,
      s"sequence numbering: ${got.map(_._1).toList}")
    got.zip(want).foreach { case ((k, ids, n), ref) =>
      assert(n == L && ids == ref.toList, s"sequence $k differs")
    }
    // keep-remainder form: one extra short row holding the exact tail
    val tail = stream.grouped(L).toList.last
    if (tail.size < L) {
      val all = CorpusRefine.packSequences(d, "doc_id", "ids", seqLen = L,
        dropRemainder = false, buckets = 7)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).sortBy(_._1)
      assert(all.length == want.length + 1 && all.last._2 == tail.toList)
    }
    // appendEos=false: the raw concatenation, no separators
    val noEos = CorpusRefine.packSequences(d, "doc_id", "ids", seqLen = L,
      appendEos = false, buckets = 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList))
      .sortBy(_._1).flatMap(_._2).toList
    val rawStream = docs.sortBy(_._1).flatMap(_._2).toList
    assert(noEos == rawStream.take(rawStream.size / L * L))
    // a doc longer than several sequences slices correctly (multi-piece)
    val big = Seq((0L, (0L until 300L).toArray), (1L, Array(7L, 8L)))
      .toDF("doc_id", "ids")
    val bigGot = CorpusRefine.packSequences(big, "doc_id", "ids", seqLen = 50)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).sortBy(_._1)
    val bigRef = ((0L until 300L) ++ Seq(-1L, 7L, 8L, -1L))
      .grouped(50).filter(_.size == 50).toList
    assert(bigGot.map(_._2).toList == bigRef.map(_.toList))
    // null id arrays are rejected config-shaped (no silent position skew)
    val withNull = d.unionByName(Seq((999L, null.asInstanceOf[Array[Long]]))
      .toDF("doc_id", "ids"))
    val err = intercept[IllegalArgumentException] {
      CorpusRefine.packSequences(withNull, "doc_id", "ids", seqLen = L)
    }
    assert(err.getMessage.contains("null"), err.getMessage)
  }

  test("writeSequenceShards: BPE-encoded packed sequences land shard-partitioned and decode back") {
    val s = sc
    import s.implicits._
    import pipeline.expr.Bpe
    val docs = (0L until 60L)
      .map(i => (i, s"doc $i alpha beta gamma " * ((i % 5) + 1).toInt))
      .toDF("doc_id", "text").repartition(4)
    val out = java.nio.file.Files.createTempDirectory("graft-seqshards").toString
    val L = 32
    val emitted = CorpusRefine.writeSequenceShards(docs, "doc_id", "text",
      Bpe.FixtureByteLevel, seqLen = L, eosId = -1L, out, seqsPerShard = 4)
    val back = s.read.parquet(out)
    // written rows == emitted; every sequence is exactly seqLen; shard
    // assignment is seq div 4
    assert(back.count() == emitted.count() && back.count() > 0)
    // partition-column type inference reads `shard` back as int — cast
    val rows = back.select(col("seq"), col("n_ids"), col("shard").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (seq, n, shard) =>
      assert(n == L && shard == seq / 4, s"seq=$seq n=$n shard=$shard")
    }
    assert(rows.map(_._1).sorted.toList == rows.indices.map(_.toLong).toList)
    // the packed stream is the concatenation of per-doc encodes + EOS:
    // re-derive it single-threaded from the same encoder and compare
    val perDoc = docs.select(col("doc_id"),
      Bpe.bpeEncode(col("text"), Bpe.FixtureByteLevel).as("ids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).map(_.toLong)))
      .sortBy(_._1)
    val stream = perDoc.flatMap { case (_, ids) => ids :+ -1L }
    val want = stream.grouped(L).filter(_.size == L).toList.map(_.toList)
    val got = back.select("seq", "ids").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).sortBy(_._1)
      .map(_._2).toList
    assert(got == want)
  }

  test("packTokenShards equalize: identical shards on clustered ids, balanced buckets") {
    val s = sc
    import s.implicits._
    // adversarially clustered ids: 90% packed into [0, 900), 10% strewn
    // across a 10^9 span — span-derived bucketing funnels the dense 90%
    // into bucket 0 (one straggler local-window task at scale)
    val ids = (0L until 900L) ++ (0L until 100L).map(i => 1000000L + i * 10000000L)
    val d = ids.map(i => (i, (i % 7) + 1)).toDF("doc_id", "n_tokens").repartition(8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val plain = rows(CorpusRefine.packTokenShards(d, "doc_id", "n_tokens", 50L, 10))
    val eq = rows(CorpusRefine.packTokenShards(d, "doc_id", "n_tokens", 50L, 10,
      equalize = true))
    // the CONTRACT: equalize re-balances parallelism only — any boundary
    // set respecting id order yields the same global prefix sum, so the
    // shard output is bit-identical
    assert(eq.toSeq == plain.toSeq)
    // and the greedy reference still holds
    var cum = 0L
    eq.foreach { case (_, n, shard) => assert(shard == cum / 50L); cum += n }
    // balance, pinned with the same quantile rule the operator uses:
    // span-derived puts >=90% of rows in one bucket; quantile boundaries
    // cap the largest bucket near n/buckets
    val span = ids.max - ids.min + 1
    val width = (span + 9) / 10
    val spanMax = ids.groupBy(i => (i - ids.min) / width).values.map(_.size).max
    assert(spanMax >= 900, s"fixture must be skewed, got max bucket $spanMax")
    val bounds = d.select(col("doc_id").cast("double").as("_q"))
      .stat.approxQuantile("_q", (1 until 10).map(_.toDouble / 10).toArray, 0.001)
      .map(math.floor(_).toLong).distinct.sorted
    val eqMax = ids.groupBy(i => bounds.count(_ <= i)).values.map(_.size).max
    assert(eqMax <= 2 * ids.size / 10,
      s"quantile buckets must be balanced, got max $eqMax of ${ids.size}")
    // buckets=1 degenerates to a single bucket without erroring
    assert(rows(CorpusRefine.packTokenShards(d, "doc_id", "n_tokens", 50L, 1,
      equalize = true)).toSeq == plain.toSeq)
  }

  test("emit/writeTokenShards: real-id budgets, partitioned layout, lossless read-back") {
    val s = sc
    import s.implicits._
    import pipeline.expr.Bpe
    val tbl = Bpe.FixtureByteLevel
    val docs = (1L to 60L).map(i =>
      (i, s"doc $i " + "the quick brown fox jumps over the lazy dog " * (i % 7 + 1).toInt))
      .toDF("doc_id", "text")
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("tokshards").toString
    val emitted = CorpusRefine.writeTokenShards(docs, "doc_id", "text", tbl,
      budget = 120L, outDir = dir, buckets = 4)
    val rows = emitted.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toVector, r.getLong(3)))
      .sortBy(_._1)
    // budgets run on the REAL id count: n_tokens == size(ids) ==
    // countTokens(text), per the driver-side table
    rows.foreach { case (id, n, ids, _) =>
      assert(n == ids.size && n == tbl.countTokens(texts(id)), s"doc $id")
      assert(ids == tbl.encodeIds(texts(id)).toVector, s"doc $id ids")
    }
    // shard == exclusive-prefix-sum div budget (driver-side recompute)
    var cum = 0L
    rows.foreach { case (id, n, _, shard) =>
      assert(shard == cum / 120L, s"doc $id: shard $shard at cum $cum")
      cum += n
    }
    // the written layout is one directory per shard with decodable rows
    val shardDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(shardDirs.nonEmpty &&
      shardDirs.toSet == rows.map(r => s"shard=${r._4}").toSet)
    val back = s.read.parquet(dir)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        Bpe.bpeDecode(col("ids"), tbl).as("decoded"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(back.length == 60)
    back.foreach { case (id, shard, decoded) =>
      assert(decoded == texts(id), s"read-back decode broke for doc $id")
      assert(shard == rows.find(_._1 == id).get._4)
    }
    // equalize flips parallelism only — shard output bit-identical
    val eq = CorpusRefine.emitTokenShards(docs, "doc_id", "text", tbl,
      budget = 120L, buckets = 4, equalize = true)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    rows.foreach { case (id, _, _, shard) => assert(eq(id) == shard) }
  }

  test("decontaminate: shared-shingle threshold, benchmark broadcast, apply") {
    val s = sc
    import s.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over a sleepy cat"), // 4 shared 3-grams
      (2L, "the quick brown fox jumps over the lazy dog today"), // 7 shared
      (3L, "completely unrelated words in this document here"),
      (4L, "quick brown fox appears once")) // 1 shared ("quick brown fox")
      .toDF("doc_id", "text")
    val flagged = CorpusRefine.decontaminate(corpus, bench, "doc_id", "text",
      nGram = 3, minShared = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged == Map(1L -> 4L, 2L -> 7L))
    // apply drops exactly the flagged docs
    val kept = CorpusRefine.decontaminateApply(corpus, bench, "doc_id", "text",
      nGram = 3, minShared = 4L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 4L))
    // threshold 1 also catches doc 4
    assert(CorpusRefine.decontaminate(corpus, bench, "doc_id", "text", 3, 1L)
      .count() == 3)
    // plan: the benchmark side is broadcast — the CORPUS never shuffles for
    // the join; the only exchanges are the per-doc count aggregate and the
    // benchmark side's own tiny shingle-distinct (bench-sized, not
    // corpus-sized)
    val q = CorpusRefine.decontaminate(corpus.repartition(2), bench,
      "doc_id", "text", 3, 1L)
    q.count()
    val p = q.queryExecution.executedPlan.toString
    val fp = { val c = p.indexOf("== Initial Plan =="); if (c < 0) p else p.substring(0, c) }
    assert(fp.contains("BroadcastHashJoin"), fp)
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(fp).size == 1, fp)
    assert("Exchange hashpartitioning".r.findAllIn(fp).size <= 2, fp)
  }

  test("stratifiedSample: deterministic, rate-bounded, stratum-respecting") {
    val s = sc
    import s.implicits._
    val d = (0L until 2000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 50, "de" -> 30)
    val a = CorpusRefine.stratifiedSample(d, "doc_id", "lang", rates, 10)
    val b = CorpusRefine.stratifiedSample(d, "doc_id", "lang", rates, 10)
    assert(a.collect().toSeq.sortBy(_.getLong(0)) ==
      b.collect().toSeq.sortBy(_.getLong(0)))
    val byLang = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~667 docs per stratum; hash-uniform → near the nominal rates
    assert(byLang("en") > 250 && byLang("en") < 420)
    assert(byLang("de") > 130 && byLang("de") < 270)
    assert(byLang("zh") > 30 && byLang("zh") < 110)
    // sampling is a pure narrow filter: no exchange in the plan
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("tfidfTopK: null-id docs filtered up front — no df=0 +Infinity terms") {
    val s = sc
    import s.implicits._
    // "ghostterm" occurs ONLY in the null-id doc: count(id) skips nulls, so
    // without the up-front filter it gets df=0 → score tf·N/0 = +Infinity
    // and ranks first in the null partition (the r4 ADVICE finding)
    val d = Seq(
      (Option(1L), "alpha common"),
      (Option(2L), "common beta"),
      (Option.empty[Long], "ghostterm ghostterm")).toDF("doc_id", "text")
    val out = CorpusRefine.tfidfTopK(d, "doc_id", "text", k = 2).collect()
    assert(out.forall(r => !r.isNullAt(0)), "null-id rows must not rank")
    assert(!out.exists(_.getString(1) == "ghostterm"))
    assert(out.forall(r => java.lang.Double.isFinite(r.getDouble(4))),
      s"no infinite scores: ${out.mkString(",")}")
    // N excludes the null-id doc: alpha tf=1 df=1 N=2 → 2.0
    val alpha = out.find(r => r.getLong(0) == 1L && r.getString(1) == "alpha").get
    assert(alpha.getDouble(4) == 2.0)
  }

  test("paragraphDedup: duplicate-id inputs inflate n_kept (documented precondition)") {
    val s = sc
    import s.implicits._
    // two rows sharing doc_id with identical text both match the (d,id,pos)
    // firsts row — the documented unique-id precondition; run dedup_exact
    // first on inputs that may carry duplicate ids
    val d = Seq((1L, "a b c"), (1L, "a b c")).toDF("doc_id", "text")
    val out = CorpusRefine.paragraphDedup(d, "doc_id", "text", k = 3).head()
    assert(out.getLong(1) == 2L && out.getLong(2) == 2L,
      s"pinned duplicate-id behavior changed: $out")
  }
}
