package pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.expr.PortableExprs
import pipeline.fixtures.Webtext
import pipeline.ops.{Dedup, Portable, Similarity, TextAnalysis}

/** Parity + semantics specs for the training-data ops:
  *  - native Catalyst expressions ≡ the HOF/Column formulations (bit-exact)
  *  - MinHash-LSH recall against exact Jaccard on the dup-seeded fixture
  *  - ANN: LSH/IVF candidates score-match brute force where they overlap */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, 4, "ops-spec")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  private def docs(n: Long) = {
    val s = sc
    Webtext.df(s, n, 4).select(
      monotonically_increasing_id().as("id"), col("text"), col("url"))
      .withColumn("id", xxhash64(col("url"))) // stable unique id
  }

  test("native MinHash signature == HOF formulation, bit for bit") {
    val d = docs(800).select(col("id"), col("text"))
    val hof = d.select(col("id"), Dedup.minhashSig("text", 3, 8).as("sig"))
      .filter(!array_contains(transform(col("sig"), _.isNull), true))
    val fast = d.select(col("id"), PortableExprs.minhashSig(col("text"), 3, 8).as("sig"))
      .filter(col("sig").isNotNull)
    assert(hof.exceptAll(fast).isEmpty && fast.exceptAll(hof).isEmpty)
    assert(fast.count() > 0)
  }

  test("native SimHash == HOF simhash; native fingerprint == HOF fingerprint") {
    val d = docs(500).select(col("id"), col("text"))
    val both = d.select(
      Dedup.simhash("text", 16).as("a"),
      PortableExprs.simhash(col("text"), 16).as("b"),
      TextAnalysis.fingerprint(col("text")).as("fa"),
      PortableExprs.fingerprint(col("text")).as("fb"))
    assert(both.filter(col("a") =!= col("b") || col("fa") =!= col("fb")).count() == 0)
  }

  test("native cosine == HOF cosine, bit for bit, incl. real embeddings") {
    val s = sc
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val pairs = a.join(b, col("a") < col("b"))
      .select(Portable.cosine(col("va"), col("vb")).as("hof"),
        PortableExprs.cosine(col("va"), col("vb")).as("fast"))
    assert(pairs.filter(col("hof") =!= col("fast")).count() == 0)
  }

  test("native hyperplane sig == HOF hyperplane sig on synthetic vectors") {
    val s = sc
    import s.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(16)(d => ((i * 31 + d * 7) % 13 - 6).toFloat / 7f))
    }.toDF("vid", "vec")
    val both = vecs.select(
      Similarity.hyperplaneSig("vec", 6, 16).as("a"),
      PortableExprs.hyperplaneSig(col("vec"), 6, 16).as("b"),
      // NONZERO planeOffset too: the OR-construction tables actually
      // shipped (lshTopK/embedNearDupLsh) hash planes offset+p
      Similarity.hyperplaneSig("vec", 6, 16, planeOffset = 12).as("a2"),
      PortableExprs.hyperplaneSig(col("vec"), 6, 16, planeOffset = 12).as("b2"))
    assert(both.filter(col("a") =!= col("b") || col("a2") =!= col("b2")).count() == 0)
    // offset tables are genuinely independent signatures
    assert(both.filter(col("a") =!= col("a2")).count() > 0)
  }

  test("connected components: chains merge transitively, islands stay apart") {
    val s = sc
    import s.implicits._
    // two chains + one isolated edge: {1-2-3-4}, {10-11}, {20-21-22}
    val pairs = Seq((1L, 2L), (3L, 2L), (3L, 4L), (10L, 11L), (21L, 20L), (21L, 22L))
      .toDF("a", "b")
    val comp = pipeline.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // a long path converges too (worst case for label propagation)
    val path = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val before = s.sparkContext.getPersistentRDDs.size
    val cc = pipeline.ops.Dedup.connectedComponents(path)
    val pc = cc.collect().map(r => r.getLong(1)).distinct
    assert(pc.toSeq == Seq(0L))
    // checkpoint-release contract: a 30-hop path runs ≥5 rounds, each
    // materializing two frames; only the FINAL label map may survive the
    // loop (Dataset.unpersist is a storage no-op on checkpoints — the
    // release must reach the underlying RDD, the 10M-drill OOM lesson)
    Thread.sleep(500) // async unpersist drains
    val after = s.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"checkpoint leak: $before persisted RDDs before, $after after")
  }

  test("connected components: adaptive loop partitioning restores session " +
    "confs and is label-identical across partition settings") {
    val s = sc
    import s.implicits._
    val pairs = Seq((1L, 2L), (3L, 2L), (5L, 6L), (9L, 5L)).toDF("a", "b")
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    def run() = pipeline.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 9L -> 5L)
    // tiny graph → the loop derives 1 partition; a forced rows-per-partition
    // of 1 → the defaultParallelism clamp binds. Same labels either way,
    // and the session confs come back untouched.
    for (rpp <- Seq("2000000", "1")) {
      s.conf.set("spark.graft.cc.rowsPerPartition", rpp)
      val before = keys.map(k => k -> s.conf.getOption(k)).toMap
      assert(run() == expected, s"labels diverged at rowsPerPartition=$rpp")
      val afterC = keys.map(k => k -> s.conf.getOption(k)).toMap
      assert(afterC == before, s"session confs not restored: $afterC")
    }
    s.conf.unset("spark.graft.cc.rowsPerPartition")
  }

  test("exact dedup finds the seeded duplicate fraction") {
    val d = docs(4000)
    val dups = Dedup.exact(d, "id", "text").filter(col("n_copies") > 1)
    val expected = (0L until 4000L).count(i => Webtext.dupOf(i).isDefined)
    assert(expected > 0)
    // every seeded dup collapses onto its source text digest
    assert(dups.agg(sum(col("n_copies") - 1)).head.getLong(0) >= expected * 9 / 10)
  }

  test("MinHash-LSH recalls exact duplicates (jaccard=1 pairs)") {
    val d = docs(2000)
    val pairs = Dedup.minhashLsh(d, "id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact duplicates (same text) MUST collide in every band
    val exactDups = Dedup.exact(d, "id", "text").filter(col("n_copies") > 1)
    val nDup = exactDups.count()
    assert(nDup > 0)
    val d2 = d.select(col("id"), md5(col("text").cast("binary")).as("dg"))
    val expectPairs = d2.as("x").join(d2.as("y"),
        col("x.dg") === col("y.dg") && col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expectPairs.nonEmpty)
    assert(expectPairs.subsetOf(pairs),
      s"missing ${expectPairs.diff(pairs).size} of ${expectPairs.size} exact-dup pairs")
  }

  test("minhashLsh bucket cap bounds candidate pairs, uncapped is superset") {
    val d = docs(2000)
    val all = Dedup.minhashLsh(d, "id", "text").count()
    val capped = Dedup.minhashLsh(d, "id", "text", maxBucketSize = 5).count()
    assert(capped <= all)
    val cappedPairs = Dedup.minhashLsh(d, "id", "text", maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = Dedup.minhashLsh(d, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs.subsetOf(allPairs))
  }

  test("simhashNearDup: pigeonhole recall is EXACT vs brute hamming; guards hold") {
    val d = docs(800)
    val got = Dedup.simhashNearDup(d, "id", "text",
      bits = 16, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // brute-force ground truth: ALL pairs with hamming <= 3 over the full
    // simhash — banded recall must be exact for maxHamming <= bands-1
    val sigs = d.select(col("id"),
      pipeline.expr.PortableExprs.simhash(col("text"), 16).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val truth = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b) -> h).toMap
    assert(truth.nonEmpty, "fixture must contain hamming<=3 pairs")
    assert(got == truth, s"banded recall must be exact: missing ${
      (truth.keySet -- got.keySet).take(3)}, extra ${(got.keySet -- truth.keySet).take(3)}")
    // hamming-0 twins (exact text dups) all present with distance 0
    assert(got.values.exists(_ == 0))
    // tighter maxHamming is a filter of the same pair set
    val tight = Dedup.simhashNearDup(d, "id", "text",
      bits = 16, bands = 4, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(tight == truth.filter(_._2 <= 1))
    // bucket cap yields a subset (the minhashLsh guard semantics)
    val capped = Dedup.simhashNearDup(d, "id", "text",
      bits = 16, bands = 4, maxHamming = 3, maxBucketSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(truth.keySet))
    // config-shaped rejections
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDup(d, "id", "text", bits = 16, bands = 5)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDup(d, "id", "text", maxHamming = -1)
    }
  }

  test("dHash: PNG round-trip recovers every bit; pooling matches independent reimpl") {
    import pipeline.expr.{ImageDhashExpr, PngEncodeExpr, PngFromBitsExpr}
    // 1) bit-exact round trip: pngFromDhash encodes a REAL PNG whose 9×8
    //    grid is the identity pooling, so decode→pool→compare must
    //    recover the exact 64-bit value — adversarial values included
    val vals = Seq(0L, -1L, Long.MinValue, Long.MaxValue, 0x5555555555555555L,
      0xAAAAAAAAAAAAAAAAL, 1L, 1L << 63, 0xDEADBEEFCAFEBABEL) ++
      (0 until 50).map(i => new scala.util.Random(i).nextLong())
    vals.foreach { h =>
      assert(ImageDhashExpr.dhash(PngFromBitsExpr.encode(h)) === Some(h),
        s"round trip broke for ${h.toHexString}")
    }
    // 2) pooling ground truth on NON-trivial sizes: independent test-side
    //    reimplementation (luma raster first, then rectangle sums) over
    //    the deterministic PngEncodeExpr fixtures
    def refDhash(bytes: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val w = img.getWidth; val h = img.getHeight
      val luma = Array.tabulate(h, w) { (y, x) =>
        val p = img.getRGB(x, y)
        (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)) / 1000L
      }
      val cell = Array.tabulate(8, 9) { (r, c) =>
        val ys = (r * h / 8) until ((r + 1) * h / 8)
        val xs = (c * w / 9) until ((c + 1) * w / 9)
        ys.map(y => xs.map(x => luma(y)(x)).sum).sum / (ys.size.toLong * xs.size)
      }
      (0 until 64).foldLeft(0L) { (acc, i) =>
        if (cell(i / 8)(i % 8 + 1) > cell(i / 8)(i % 8)) acc | (1L << i) else acc
      }
    }
    for ((w, h) <- Seq((9, 8), (64, 48), (100, 80), (33, 17), (9, 100), (640, 8))) {
      val png = PngEncodeExpr.encode(w, h)
      assert(ImageDhashExpr.dhash(png) === Some(refDhash(png)),
        s"pooling diverged from reference at ${w}x$h")
    }
    // 3) undecodable / too-small / bomb-header payloads → None, never throw
    assert(ImageDhashExpr.dhash("not a png".getBytes) === None)
    assert(ImageDhashExpr.dhash(Array.emptyByteArray) === None)
    assert(ImageDhashExpr.dhash(null) === None)
    assert(ImageDhashExpr.dhash(PngEncodeExpr.encode(8, 8)) === None) // w < 9
    assert(ImageDhashExpr.dhash(PngEncodeExpr.encode(9, 7)) === None) // h < 8
  }

  test("imageNearDup: banded recall EXACT vs brute hamming on real PNGs; nulls drop") {
    val s = sc
    import s.implicits._
    import pipeline.expr.ImageExprs
    // fixture: clustered target hashes (the q_dedup_image construction)
    // rendered to REAL PNGs, plus undecodable rows that must not pair
    val targets = (0L until 120L).map { id =>
      val g = id % 15; val v = id / 15
      val base = (0 until 8).map(j =>
        ((g * 11 + j * 17 + 7) % (if (j == 7) 128 else 256)) << (j * 8)).reduce(_ | _)
      val flip = (0 until 3).map(k =>
        if (v > k) 1L << ((v * 9 + k * 13) % 63).toInt else 0L).reduce(_ ^ _)
      id -> (base ^ flip)
    }
    val imgs = targets.toDF("id", "h")
      .select(col("id"), ImageExprs.pngFromDhash(col("h")).as("img"))
      .unionByName(Seq((900L, "corrupt".getBytes), (901L, Array.emptyByteArray))
        .toDF("id", "img"))
    val got = Dedup.imageNearDup(imgs, "id", "img", bands = 8, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val truth = (for {
      (a, ha) <- targets; (b, hb) <- targets if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b) -> d).toMap
    assert(truth.nonEmpty, "fixture must contain hamming<=3 pairs")
    assert(got == truth, s"image banded recall must be exact: missing ${
      (truth.keySet -- got.keySet).take(3)}, extra ${(got.keySet -- truth.keySet).take(3)}")
    assert(!got.keySet.exists(p => p._1 >= 900L || p._2 >= 900L),
      "undecodable images must generate no pairs")
    // bands=1 over the full 64 bits: the degenerate single-band probe is
    // hamming-0 only (mask wrap guard) — every emitted pair is exact-equal
    val single = Dedup.imageNearDup(imgs, "id", "img", bands = 1, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(single == truth.filter(_._2 == 0))
  }

  test("duplicateSpanStats: per-doc dup window counts equal the brute-force reference") {
    val s = sc
    import s.implicits._
    val rows = Seq(
      // d0 is fully period-8 (every window repeats INTERNALLY — the paper
      // counts any second occurrence, same doc included) → dup_frac 1.0;
      // d1 shares exactly one 8-token run with d0 → dup_frac 1/4
      (0L, ("a b c d e f g h " * 3).trim),
      (1L, "prefix1 x a b c d e f g h suffix1"),
      (2L, "q w e r t y u i o p unique2 only2"),   // no shared windows
      (3L, "short doc"),                            // < k tokens → 0 windows
      (4L, null.asInstanceOf[String]))              // null text → 0 windows
    val d = rows.toDF("id", "text").repartition(3)
    val k = 8
    val got = Dedup.duplicateSpanStats(d, "id", "text", k)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // brute force in Scala
    val windows = rows.flatMap { case (id, t) =>
      Option(t).toSeq.flatMap(_.trim.split("\\s+").toSeq.sliding(k)
        .filter(_.size == k).map(w => (id, w.mkString(" "))))
    }
    val occ = windows.groupBy(_._2).map { case (g, ws) => g -> ws.size }
    val want = rows.map { case (id, t) =>
      val ws = windows.filter(_._1 == id)
      id -> (ws.size.toLong, ws.count(w => occ(w._2) >= 2).toLong)
    }.toMap
    want.foreach { case (id, (n, dup)) =>
      val (gn, gdup, gfrac) = got(id)
      assert(gn == n && gdup == dup, s"doc $id: got $gn/$gdup want $n/$dup")
      assert(gfrac == (if (n == 0) 0.0 else dup.toDouble / n), s"doc $id frac")
    }
    // windowless docs report 0/0/0.0 — never vanish
    assert(got(3L) == ((0L, 0L, 0.0)) && got(4L) == ((0L, 0L, 0.0)))
    // the quality gate: d0 (frac 1.0) drops at 0.5; d1 (1/4) and the
    // windowless docs pass
    val kept = Dedup.duplicateSpanFilter(d, "id", "text", k, maxFrac = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 4L), s"kept $kept")
  }

  test("duplicateSpanApply: canonical copy survives, others cut; edge cases pinned") {
    val s = sc
    import s.implicits._
    val k = 8
    val rows = Seq(
      (1L, "A B C D E F G H x y"),                           // canonical (min id)
      (2L, "p q A B C D E F G H r"),                         // loses the window
      (3L, "q w e r t y u i o p unique3"),                   // untouched
      (4L, ("a b c d e f g h " * 2).trim + " a b"),          // internal repeat
      (5L, "A B C D E F G H"),                               // exactly one window, non-canonical → empty
      (6L, "short doc"),
      (7L, null.asInstanceOf[String]))
    val d = rows.toDF("id", "text").repartition(3)
    val got = Dedup.duplicateSpanApply(d, "id", "text", k)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getLong(2))).toMap
    // canonical (1,0) survives; doc 2's occurrence at pos 2 cuts tokens 2..9
    assert(got(1L) == ((Some("A B C D E F G H x y"), 0L)), s"got ${got(1L)}")
    assert(got(2L) == ((Some("p q r"), 8L)), s"got ${got(2L)}")
    // untouched docs keep BYTE-ORIGINAL text
    assert(got(3L) == ((Some("q w e r t y u i o p unique3"), 0L)))
    // internal period-8 repeat: occurrences (4,0)/(4,8) etc. — keeper is
    // pos 0; removable (4,8),(4,9),(4,10) cover tokens 8..17
    assert(got(4L) == ((Some("a b c d e f g h"), 10L)), s"got ${got(4L)}")
    // every token covered → EMPTY text, not a silent revert
    assert(got(5L) == ((Some(""), 8L)), s"got ${got(5L)}")
    // windowless docs pass through untouched (never-vanish)
    assert(got(6L) == ((Some("short doc"), 0L)) && got(7L) == ((None, 0L)))
  }

  test("ngramJaccard scores exact duplicates at 1.0 and respects threshold") {
    val d = docs(1500)
    val j = Dedup.ngramJaccard(d, "id", "text", 3, 0.5)
    assert(j.filter(col("jaccard") > 1.0).count() == 0)
    val d2 = d.select(col("id"), md5(col("text").cast("binary")).as("dg"))
    val nExact = d2.as("x").join(d2.as("y"),
      col("x.dg") === col("y.dg") && col("x.id") < col("y.id")).count()
    assert(j.filter(col("jaccard") === 1.0).count() >= nExact)
  }

  test("ngramJaccard DF-cap: surviving pairs keep EXACT uncapped scores") {
    val d = docs(1500)
    val all = Dedup.ngramJaccard(d, "id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // a tight cap on this word-soup fixture actually drops shingles
    val capped = Dedup.ngramJaccard(d, "id", "text", 3, 0.3, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(all.nonEmpty && capped.nonEmpty)
    // candidates only shrink, never grow
    assert(capped.keySet.subsetOf(all.keySet))
    // exactness: every surviving pair scores bit-identically to the
    // uncapped run (the cap gates candidate generation, not verification)
    capped.foreach { case (k, v) => assert(all(k) == v, s"score drift at $k") }
    // and exact-dup pairs (jaccard=1) survive any cap that leaves them a
    // shared rare shingle
    val ones = all.filter(_._2 == 1.0).keySet
    val cappedOnes = capped.filter(_._2 == 1.0).keySet
    assert(cappedOnes.subsetOf(ones))
  }

  test("LSH ANN results are a score-consistent subset of brute force") {
    val s = sc
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "cid", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", 5, 4, 64)
      .select("qid", "cid", "cos").collect()
    assert(lsh.nonEmpty)
    // any (qid,cid) present in both must carry the identical cosine
    lsh.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(c == r.getDouble(2))
      }
    }
  }

  test("IVF ANN returns k results per query with exact cosines") {
    val s = sc
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5, 8, 3)
    val perQ = ivf.groupBy("qid").count().collect()
    assert(perQ.length == 5 && perQ.forall(_.getLong(1) == 5))
    val brute = Similarity.bruteTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "cid", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.select("qid", "cid", "cos").collect().foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach(c => assert(c == r.getDouble(2)))
    }
  }

  test("IVF trained path: fitCentroids deterministic across calls and samples") {
    val s = sc
    import s.implicits._
    val emb = (0 until 400).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i % 5 + d * 0.3).toFloat)))
      .toDF("vec_id", "embedding")
    // same seed + same deterministic hash sample → identical centroids
    val c1 = pipeline.ops.Similarity.fitCentroids(
      emb, "vec_id", "embedding", nCells = 4, maxIter = 5, samplePercent = 50)
    val c2 = pipeline.ops.Similarity.fitCentroids(
      emb, "vec_id", "embedding", nCells = 4, maxIter = 5, samplePercent = 50)
    assert(c1 == c2, "rerun must reproduce the centroid set bit-for-bit")
    assert(c1.size == 4 && c1.forall(_.size == 8))
    // the trained end-to-end path returns k rows per query like the
    // explicit-centroid form
    val got = pipeline.ops.Similarity.ivfTopK(
      emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, nCells = 4, nProbe = 2, maxIter = 5, samplePercent = 50)
      .groupBy("qid").count().collect().map(_.getLong(1))
    assert(got.length == 3 && got.forall(_ == 5L))
    // bad sample bound rejected
    intercept[IllegalArgumentException] {
      pipeline.ops.Similarity.fitCentroids(emb, "vec_id", "embedding", 4,
        samplePercent = 0)
    }
  }

  test("multimodal decode: REAL JDK image+audio+mp4-header codecs + frames") {
    val s = sc
    import s.implicits._
    import pipeline.ops.Multimodal._
    val assets = Seq(
      pngAsset(1L, 320, 200),                                  // real PNG
      mp4Asset(2L, timescale = 1000, durationTicks = 120000L, 640, 360),
      wavAsset(3L, rate = 16000, channels = 2, frames = 8000), // real WAV
      MediaAsset(4L, "image", Array.empty[Byte]),
      MediaAsset(5L, "image", Array.tabulate(64)(_.toByte)),   // not an image
      MediaAsset(6L, "audio", Array.tabulate(32)(i => (i * 3).toByte)), // not audio
      MediaAsset(7L, "video", Array.tabulate(256)(i => (i * 7).toByte)) // not an mp4
    ).toDS()
    val meta = decodeMeta(assets).collect().sortBy(_.asset_id)
    assert(meta.length == 7)
    // the image decode is REAL: exact header dims, not a checksum fake
    assert(meta(0).ok && meta(0).width == 320 && meta(0).height == 200)
    // the video header decode is REAL now too: 120000 ticks @ 1000 = 120 s,
    // dims from tkhd — a checksum fake cannot produce these
    assert(meta(1).ok && meta(1).duration_ms == 120000L &&
      meta(1).width == 640 && meta(1).height == 360)
    // the audio decode is REAL too: 8000 frames @ 16 kHz = exactly 500 ms
    assert(meta(2).ok && meta(2).duration_ms == 500L)
    assert(!meta(3).ok)
    assert(!meta(4).ok) // garbage bytes: no JDK reader claims them
    assert(!meta(5).ok) // garbage audio: header parse refuses, not a fake ok
    assert(!meta(6).ok) // garbage video: the box walk refuses, not a fake ok
    // header round-trip of the WAV fixture is exact
    assert(pipeline.expr.WavHeaderExpr.header(
      pipeline.expr.WavEncodeExpr.encode(16000, 2, 8000))
      .contains((16000, 2, 8000L, "wav")))
    // determinism: same input → same metadata
    val meta2 = decodeMeta(assets).collect().sortBy(_.asset_id)
    assert(meta.toSeq == meta2.toSeq)
    val frames = sampleFrames(assets, everyMs = 50000L)
    assert(frames.count() == meta(1).duration_ms / 50000L + 1)
    // REAL resize: 320x200 into 160x480 → scale 0.5, aspect preserved,
    // output is itself a decodable PNG of exactly those dims
    val rs = resize(assets, 160, 480).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3)))
    assert(rs.map(_._1).toSet == Set(1L)) // only the decodable image
    val (_, w, h, bytes) = rs.head
    assert(w == 160 && h == 100)
    assert(pipeline.expr.ImageDimsExpr.dims(bytes).contains((160, 100, "png")))
    // never upscales
    val same = resize(assets, 640, 480).collect().head
    assert(same.getInt(1) == 320 && same.getInt(2) == 200)
  }

  test("lang-id breadth: 10-language seeded fixture classifies >=90%") {
    val s = sc
    import s.implicits._
    // 20 deterministic sentences per language: 4 rotating markers from the
    // language's own stopword list + 3 non-marker noise words — realistic
    // enough that cross-language stopword collisions (fr/es/pt 'de') must
    // be resolved by the argmax, not by trivially disjoint vocabularies
    val rows = for {
      (lang, ms) <- TextAnalysis.LangMarkers
      i <- 0 until 20
    } yield {
      val picks = Seq(ms(i % ms.size), ms((i + 3) % ms.size),
        ms((i + 7) % ms.size), ms((i + 11) % ms.size))
      (lang, (picks ++ Seq(s"zz${i}q", s"xx$lang$i", s"word$i")).mkString(" "))
    }
    val out = rows.toDF("lang_true", "text")
      .withColumn("pred", TextAnalysis.langId(col("text")))
    val acc = out.filter(col("pred") === col("lang_true")).count().toDouble / rows.size
    val confusions = out.filter(col("pred") =!= col("lang_true"))
      .groupBy("lang_true", "pred").count().collect().toSeq
    assert(acc >= 0.9, s"accuracy $acc; confusion: $confusions")
    // every sentence carries markers — nothing may fall through to 'und'
    assert(out.filter(col("pred") === "und").count() == 0)
    // native expression == HOF twin (the oracle-mirrored formulation),
    // bit for bit, incl. tie/empty/null/collision rows
    val edge = Seq("", "   ", "de la le en", "zzz", "the der le el il o de",
      null.asInstanceOf[String]).map(("??", _))
    val par = (rows ++ edge).toDF("lang_true", "text")
      .select(TextAnalysis.langId(col("text")).as("nat"),
        TextAnalysis.langIdHof(col("text")).as("hof"))
    assert(par.filter(
      !(col("nat") <=> col("hof"))).count() == 0,
      par.filter(!(col("nat") <=> col("hof"))).collect().mkString(","))
  }

  test("lang-id, quality, token counts are deterministic and sane") {
    val s = sc
    import s.implicits._
    val d = Seq(
      (1L, "the quick brown fox and the lazy dog"),
      (2L, "über und nicht der zug"),
      (3L, "東京 の は"),
      (4L, "zzz qqq"),
      (5L, "")).toDF("id", "text")
    val out = d.select(col("id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == "en" && out(2L)._1 == "de" && out(3L)._1 == "ja")
    assert(out(4L)._1 == "und" && out(5L)._2 == 0)
    assert(out(1L)._3 > out(4L)._3, "stopword-rich text scores higher")
  }
}
