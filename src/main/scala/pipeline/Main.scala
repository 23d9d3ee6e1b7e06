package pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import pipeline.fixtures.Webtext
import pipeline.io.{Ledger, ParquetTableIO}
import pipeline.stages.{Aggregate, Enrich, Parse, Route}

/** SparkSession factory with the scale-oriented defaults used everywhere. */
object Sessions {
  def local(cores: Int, shufflePartitions: Int = -1,
            app: String = "graft-pipeline"): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cores
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}

/**
 * End-to-end pipeline: scan → parse → enrich → route → write + aggregate.
 *
 * Two run modes (SURVEY.md §7.3 step 5):
 *  - `runFused`: ONE job — narrow parse/enrich/route fuse into a single
 *    codegen stage, a single pre-write repartition on (sink, day, salt) is
 *    the only exchange in the hot path (SURVEY.md §4.2). Used for bench.
 *  - `runIncremental`: one job per day-unit with a Ledger commit after
 *    each — the resumable form; a killed run resumes exactly where the
 *    ledger says it stopped, re-staging the incomplete unit.
 *
 * Skew: hot domains concentrate rows into one (sink, day) write partition;
 * `pmod(xxhash64(url), SALTS)` spreads each write partition over SALTS
 * tasks without changing row multiplicity (property-tested).
 */
object Pipeline {

  val Salts = 8

  /** The shared narrow stage chain: parse → enrich → route.
    * `observed = true` attaches the batcher/deadletter accounting metrics
    * (pipeline.Metrics) to the parse stage — computed inline during the
    * action, no extra pass. */
  def transform(webtext: DataFrame, observed: Boolean = false): DataFrame = {
    val spark = webtext.sparkSession
    val parsed0 = Parse(webtext)
    val parsed = if (observed) Metrics.observeParsed(parsed0) else parsed0
    val enriched = Enrich(parsed, Webtext.langMetaDf(spark), Webtext.geoDf(spark))
    Route(enriched)
  }

  /** Columns actually persisted per sink (keeps `html` out of the write). */
  private val outCols = Seq("url", "warc_ts", "lang", "host", "title", "status",
    "bytes", "method", "extracted_text", "is_corrupt", "lang_family", "region",
    "sink", "day").map(col)

  /** The exact pre-write plan: transform → project (prunes `html` from the
    * scan) → salted repartition. Explicit partition count pins write
    * parallelism to the session's shuffle setting — without it AQE
    * coalesces to ~the same task count at every cluster size, capping
    * scale-up (measured: efficiency 0.36→ok). */
  def fusedPlan(webtext: DataFrame, writeTasks: Int, observed: Boolean = false): DataFrame =
    transform(webtext, observed)
      .select(outCols: _*)
      .withColumn("salt", pmod(xxhash64(col("url")), lit(Salts)))
      .repartition(writeTasks, col("sink"), col("day"), col("salt"))
      .drop("salt")

  def runFused(spark: SparkSession, webtext: DataFrame, outDir: String): Map[String, Long] = {
    val writeTasks = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val routed = fusedPlan(webtext, writeTasks, observed = true)
    val io = new ParquetTableIO(outDir)
    val schema = routed.schema // explicit on read-back: empty writes have no files to infer from
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      if (sys.env.contains("GRAFT_PHASE_TIMING"))
        println(f"[fused] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    phase("write")(io.write(routed, "routed", Seq("sink", "day")))
    val counts = phase("readback") {
      Aggregate.sinkCounts(spark.read.schema(schema).parquet(s"$outDir/routed"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val ledger = new Ledger(outDir)
    counts.foreach { case (s, n) => ledger.commit(s"fused/sink=$s", n) }
    counts
  }

  /** Resumable variant: work unit = one day; skip units the ledger has. */
  def runIncremental(spark: SparkSession, webtext: DataFrame, outDir: String,
                     failAfterUnits: Int = Int.MaxValue): Map[String, Long] = {
    val ledger = new Ledger(outDir)
    val done = ledger.committedUnits()
    val days = webtext.select(to_date(col("warc_ts")).as("day"))
      .distinct().collect().map(_.getDate(0).toString).sorted
    val io = new ParquetTableIO(outDir)
    var unitsRun = 0
    days.filterNot(d => done.contains(d)).foreach { d =>
      if (unitsRun >= failAfterUnits)
        throw new RuntimeException(s"injected failure before unit $d")
      val dayDf = webtext.filter(to_date(col("warc_ts")) === lit(d)) // partition-prunable
      val routed = transform(dayDf).select(outCols: _*)
      io.write(routed, s"routed_days/day=$d", Seq("sink"))
      val n = spark.read.parquet(s"$outDir/routed_days/day=$d").count()
      ledger.commit(d, n)
      unitsRun += 1
    }
    ledger.committedRows()
  }

  def main(args: Array[String]): Unit = {
    val conf = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val cores = conf.getOrElse("--cores", "8").toInt
    val n = conf.getOrElse("--rows", "100000").toLong
    val out = conf.getOrElse("--out", "/tmp/graft-pipeline-out")
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("WARN")
    val webtext = conf.get("--input")
      .map(spark.read.parquet(_))
      .getOrElse(Webtext.df(spark, n, cores * 4))
    val counts = runFused(spark, webtext, out)
    println(counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
    spark.stop()
  }
}
