package pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.fixtures.Webtext

/** Plan-shape regression guards: the properties PLANS.md documents must
  * hold structurally, not just at the time someone last read an explain. */
class PlanGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, 4, "plan-guard")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  /** The ADAPTIVE FINAL plan only — `executedPlan.toString` under AQE also
    * prints the "== Initial Plan ==" section, which double-counts operators
    * that reuse/prune away at runtime. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut < 0) s else s.substring(0, cut)
  }

  private def webtextOnDisk(n: Long): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("plan-guard").toString
    Webtext.df(sc, n, 4).write.mode("overwrite").parquet(dir)
    sc.read.parquet(dir)
  }

  test("fused pre-write plan: exactly one shuffle; html never scanned") {
    val webtext = webtextOnDisk(2000)
    val routed = Pipeline.fusedPlan(webtext, 4)
    // AQE wraps the physical plan, so count exchanges in the rendered tree
    val plan = routed.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
    assert(broadcasts == 2, s"both dims must be broadcast:\n$plan")
    assert(!plan.contains("html"), s"html column must be pruned from the scan:\n$plan")
  }

  test("enrich joins are broadcast-hash, never sort-merge") {
    val webtext = webtextOnDisk(2000)
    val plan = Pipeline.transform(webtext).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("day filter on parse output reaches the parquet scan as warc_ts range") {
    val webtext = webtextOnDisk(2000)
    val df = stages.Parse(webtext)
      .filter(col("day") === lit(java.sql.Date.valueOf("2026-01-01")))
      .select("url", "status")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual(warc_ts"),
      s"day predicate not pushed as warc_ts range:\n$scan")
  }

  test("multiline joiner: one shuffle (window and agg share the source partitioning)") {
    val s = sc
    val dir = java.nio.file.Files.createTempDirectory("ml-plan").toString
    Webtext.df(s, 500, 4)
      .select(col("lang").as("src"), xxhash64(col("url")).as("off"),
        col("text").as("line"))
      .write.mode("overwrite").parquet(dir)
    val df = stages.Multiline.joinLines(s.read.parquet(dir), "src", "off", "line")
    df.collect()
    val plan = finalPlan(df)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1,
      s"joinLines must shuffle once on the source key (got $shuffles):\n$plan")
  }

  test("imageNearDup: the (expensive) decode+dhash runs exactly once per row") {
    val s = sc
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("img-plan").toString
    // clustered hashes (low-bit variants of shared bases) so the probe
    // emits pairs — an empty result collapses to EmptyRelation under AQE
    // and the rendered plan stops meaning anything
    (0L until 200L).map(i => (i, (i % 40) * 1024L + (i % 3)))
      .toDF("id", "h")
      .select(col("id"), pipeline.expr.ImageExprs.pngFromDhash(col("h")).as("img"))
      .write.mode("overwrite").parquet(dir)
    // broadcast pinned off for the guard: at fixture size AQE flips the
    // band self-join to broadcast, whose rendering re-prints the build
    // side's subtree (the expression still evaluates once below the
    // barrier, but the string count stops meaning anything); the shuffle
    // join is the at-scale plan this guard is about, same as the minhash
    // guard's shape
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df =
      try {
        val d = pipeline.ops.Dedup.imageNearDup(s.read.parquet(dir), "id", "img")
        assert(d.collect().nonEmpty) // finalize the adaptive plan; non-empty
        d
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val plan = finalPlan(df)
    val evals = "imagedhashexpr".r.findAllIn(plan.toLowerCase).size
    assert(evals == 1, s"dhash computed $evals times (want 1):\n$plan")
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage") ||
      plan.contains("TableCacheQueryStage"),
      s"self-join sides must share the signature exchange:\n$plan")
  }

  test("minhash LSH computes the signature exactly once (ReusedExchange)") {
    val s = sc
    val dir = java.nio.file.Files.createTempDirectory("mh-plan").toString
    Webtext.df(s, 500, 4).select("url", "text")
      .withColumn("doc_id", xxhash64(col("url")))
      .write.mode("overwrite").parquet(dir)
    val df = pipeline.ops.Dedup.minhashLsh(s.read.parquet(dir), "doc_id", "text")
    df.collect() // finalize the adaptive plan so ReusedExchange materializes
    val plan = finalPlan(df)
    val evals = "minhashsigexpr".r.findAllIn(plan.toLowerCase).size
    assert(evals == 1, s"signature computed $evals times (want 1):\n$plan")
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage") ||
      plan.contains("TableCacheQueryStage"),
      s"self-join sides must share the signature exchange:\n$plan")
  }

  test("duplicateSpanStats: gram explode + md5 computed once (shared exchange)") {
    val s = sc
    val dir = java.nio.file.Files.createTempDirectory("ds-plan").toString
    Webtext.df(s, 500, 4).select("url", "text")
      .withColumn("doc_id", xxhash64(col("url")))
      .write.mode("overwrite").parquet(dir)
    val df = pipeline.ops.Dedup.duplicateSpanStats(
      s.read.parquet(dir), "doc_id", "text", k = 8)
    df.collect()
    val plan = finalPlan(df)
    // one linear chain: the token-scale explode + md5 runs exactly once
    // (the perDoc-groupBy + semi-join-back alternative read the frame
    // from two branches and exchange reuse did NOT fire — measured 2×)
    val explodes = "generate explode".r.findAllIn(plan.toLowerCase).size
    assert(explodes == 1, s"gram explode ran $explodes times (want 1):\n$plan")
    // text never rides a shuffle: only ids and 32-char digests do
    val exchanges = plan.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty && !exchanges.exists(_.contains("text#")),
      s"text must not shuffle:\n${exchanges.mkString("\n")}")
  }

  test("IVF cell assignment is narrow: no cross join, no per-row-id window") {
    val s = sc
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf-plan").toString
    (0 until 200).map(i => (i.toLong, Array.tabulate(8)(d => (i * d % 7).toFloat)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(dir)
    val emb = s.read.parquet(dir)
    val cents = (0 until 4).map(c => Seq.tabulate(8)(d => (c + d).toFloat))
    val df = pipeline.ops.Similarity.ivfTopKWithCentroids(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3, nProbe = 2, cents)
    df.collect()
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"cell assignment must not cross-join:\n$plan")
    assert(!plan.contains("monotonically_increasing_id"),
      s"no per-row unique-id windowing:\n$plan")
    // the only Window machinery is the final per-query top-k (rank window +
    // its WindowGroupLimit partial pushdown)
    assert("WindowExec|WindowGroupLimit|Window ".r.findAllIn(plan).size <= 3,
      s"unexpected windows:\n$plan")
  }

  test("IVF stored assignment: cell-partitioned reads prune to the probed cells") {
    // the assignCells claim ("cell as a partition column → cell-pruned
    // reads skip non-probed cells at the source") must hold structurally:
    // a probe over a cell-partitioned assigned corpus shows partition
    // pruning, and only the probed cells' files are read
    val s = sc
    import s.implicits._
    val corpus = (0L until 400L).map { i =>
      (i, Array.tabulate(8)(d => ((i % 4) * 10 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = pipeline.ops.Similarity.fitCentroids(
      corpus, "vec_id", "embedding", nCells = 4, maxIter = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf-assigned").toString
    pipeline.ops.Similarity.assignCells(corpus, "vec_id", "embedding", cents)
      .write.partitionBy("cell").mode("overwrite").parquet(dir)
    val assigned = s.read.parquet(dir)
    val queries = corpus.filter(col("vec_id") < 2)
    val out = pipeline.ops.Similarity.ivfTopKAssigned(
      assigned, queries, "vec_id", "embedding", k = 3, nProbe = 1, cents)
    assert(out.groupBy("qid").count().collect().forall(_.getLong(1) == 3L))
    // the cell equijoin against the broadcast query side becomes a
    // partition-filterable predicate only with DPP/broadcast pruning; the
    // DIRECT form — filtering the assigned table by the probed cells — must
    // prune at the source (the production read pattern: compute the probe
    // cells driver-side per query batch, push them into the scan)
    val probed = Seq(0, 2)
    val pruned = assigned.filter(col("cell").isin(probed.map(Integer.valueOf): _*))
    val scanStr = pruned.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("cell"),
      s"cell filter must reach the scan as a partition filter:\n$scanStr")
    // and the pruned read really skips the other cells' rows
    val cellsRead = pruned.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cellsRead.subsetOf(probed.toSet))
  }

  test("embedding LSH dedup: vectors never ride the pair-dedup shuffle") {
    val s = sc
    val dir = java.nio.file.Files.createTempDirectory("emblsh-plan").toString
    import s.implicits._
    (0 until 300).map(i => (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.1 + d).toFloat)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(dir)
    val emb = s.read.parquet(dir)
    val df = pipeline.ops.Dedup.embedNearDupLsh(
      emb, "vec_id", "embedding", threshold = 0.2, planes = 3, dim = 8, tables = 2)
    df.collect()
    val plan = finalPlan(df)
    // the distinct aggregate must key/carry bare ids, not embedding arrays
    val distinctLines = plan.linesIterator
      .filter(l => l.contains("HashAggregate") && l.contains("keys=[a#")).toList
    assert(distinctLines.nonEmpty && distinctLines.forall(!_.contains("embedding")),
      s"embedding column inside the dedup aggregate:\n$plan")
    val sigEvals = "hyperplanesigexpr".r.findAllIn(plan.toLowerCase).size
    assert(sigEvals == 2, s"bucket signatures computed ${sigEvals}x (want tables=2):\n$plan")
  }

  test("grok extraction: ONE expression eval inside whole-stage codegen") {
    val s = sc
    val dir = java.nio.file.Files.createTempDirectory("grok-plan").toString
    Webtext.df(s, 300, 2).select("url", "text").write.mode("overwrite").parquet(dir)
    val g = pipeline.expr.Grok.extract(col("text"),
      "status=%{INT:status:int} bytes=%{INT:bytes:long} method=%{WORD:method}")
    val df = s.read.parquet(dir).select(col("url"),
      g.getField("status").as("st"), g.getField("bytes").as("b"),
      g.getField("method").as("m"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` star prefix marks whole-stage-codegen operators; inside a
    // codegen'd projection, subexpression elimination evaluates the (three
    // textual) grokextractexpr references once — what must not happen is
    // the Project falling OUT of codegen (no star), where each reference
    // would re-run the regex
    assert(plan.toLowerCase.contains("grokextractexpr"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*(")),
      s"grok projection fell out of whole-stage codegen:\n$plan")
  }

  test("ngram Jaccard: shingles computed once behind the barrier") {
    val s = sc
    val dir = java.nio.file.Files.createTempDirectory("ngram-plan").toString
    Webtext.df(s, 300, 2).select("url", "text")
      .withColumn("doc_id", xxhash64(col("url")))
      .write.mode("overwrite").parquet(dir)
    val df = pipeline.ops.Dedup.ngramJaccard(s.read.parquet(dir), "doc_id", "text")
    df.collect()
    val plan = finalPlan(df)
    val evals = "shinglesexpr".r.findAllIn(plan.toLowerCase).size
    assert(evals == 1, s"shingles computed $evals times (want 1):\n$plan")
  }

  test("SQL surface: registered graft_* functions match the Column API") {
    val s = sc
    pipeline.expr.Functions.registerAll(s)
    val dir = java.nio.file.Files.createTempDirectory("sql-fn").toString
    Webtext.df(s, 300, 2).select("url", "text").write.mode("overwrite").parquet(dir)
    s.read.parquet(dir).createOrReplaceTempView("wt")
    val viaSql = s.sql(
      """SELECT graft_simhash(text) AS sh, graft_fingerprint(text) AS fp,
        |       graft_cosine(array(1.0F, 2.0F), array(2.0F, 4.0F)) AS cos,
        |       graft_parse_event(url, text).status AS st,
        |       graft_repetition(text).top_bigram_n AS rep
        |FROM wt""".stripMargin)
    val viaCols = s.read.parquet(dir).select(
      pipeline.expr.PortableExprs.simhash(col("text"), 16).as("sh"),
      pipeline.expr.PortableExprs.fingerprint(col("text")).as("fp"),
      pipeline.expr.PortableExprs.cosine(
        array(lit(1.0f), lit(2.0f)), array(lit(2.0f), lit(4.0f))).as("cos"),
      pipeline.expr.PortableExprs.parseEvent(col("url"), col("text"))
        .getField("status").as("st"),
      pipeline.expr.PortableExprs.repetitionStats(col("text"))
        .getField("top_bigram_n").as("rep"))
    assert(viaSql.exceptAll(viaCols).isEmpty && viaCols.exceptAll(viaSql).isEmpty)
    assert(math.abs(viaSql.head.getDouble(2) - 1.0) < 1e-12)
  }

  test("paragraph dedup: only the digest rides the shuffle, never text") {
    val s = sc
    val dir = java.nio.file.Files.createTempDirectory("pg-para").toString
    Webtext.df(s, 500, 4).select(
      xxhash64(col("url")).as("doc_id"), col("text"))
      .write.mode("overwrite").parquet(dir)
    val df = ops.CorpusRefine.paragraphDedup(
      s.read.parquet(dir), "doc_id", "text", k = 3)
    df.count()
    val plan = finalPlan(df)
    // the digest exchange exists...
    assert("Exchange hashpartitioning\\(d#".r.findAllIn(plan).nonEmpty,
      s"digest shuffle missing:\n$plan")
    // ...and its input projection has already dropped the paragraph string:
    // `para#N` may appear INSIDE md5(cast(para#N as binary)) but never as a
    // standalone output column of the exchange's input
    val exchangeInputs = "Exchange hashpartitioning\\(d#\\d+[^\\n]*\\n([^\\n]*)"
      .r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, plan)
    exchangeInputs.foreach(in =>
      assert(!"para#\\d+[,\\]]".r.findAllIn(in).hasNext,
        s"paragraph text rides the shuffle: $in\n$plan"))
  }

  test("corpus narrow family is exchange-free as a fused plan") {
    val s = sc
    val dir = java.nio.file.Files.createTempDirectory("pg-narrow").toString
    Webtext.df(s, 500, 4).select(
      xxhash64(col("url")).as("doc_id"), col("url"), col("text"), col("lang"))
      .write.mode("overwrite").parquet(dir)
    val docs = s.read.parquet(dir)
    // pii + url canon + repetition + sample composed: still ZERO exchanges
    val fused = ops.CorpusRefine.stratifiedSample(
      docs.select(col("doc_id"), col("lang"),
        ops.CorpusRefine.redactPii(col("text")).as("red"),
        ops.CorpusRefine.canonicalizeUrl(col("url")).as("u"),
        pipeline.expr.PortableExprs.repetitionStats(col("text")).as("st")),
      "doc_id", "lang", Map("en" -> 50), 10)
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"narrow family must not shuffle:\n$plan")
    // and the plan is codegen'd (toString marks codegen stages with "*(n)")
    assert(plan.contains("*("), plan)
  }
}
