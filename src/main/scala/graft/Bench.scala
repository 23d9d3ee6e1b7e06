package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds over
  * SPARK_GRAFT_SF_DIR plus an end-to-end pipeline throughput section
  * (parse→enrich→route→aggregate over the seed-42 webtext fixture).
  * Protocol details in BASELINE.md. */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up (JIT + codegen + FS), excluded from all timings
    spark.read.parquet(s"$sfDir/region.parquet").count()
    SparkEntry.queries("q1_agg")(spark, sfDir).count()

    // a failed query must be VISIBLE in the bench output (a swallowed
    // failure publishes its time-to-crash as a healthy-looking timing)
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => failed += name }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // end-to-end pipeline throughput on the deterministic webtext fixture
    val pipeRows = sys.env.getOrElse("SPARK_GRAFT_PIPE_ROWS", "500000").toLong
    val webtext = pipeline.fixtures.Webtext.df(spark, pipeRows, cpus.toInt * 4)
      .cache()
    webtext.count() // materialize: generation excluded from pipeline timing
    val tP = System.nanoTime()
    val routedRows = pipeline.stages.Aggregate
      .sinkCounts(pipeline.Pipeline.transform(webtext))
      .collect().map(_.getLong(1)).sum
    val pipeSec = (System.nanoTime() - tP) / 1e9
    webtext.unpersist()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""failed":$failedJson,""" +
        s""""pipeline":{"rows":$pipeRows,"routed_rows":$routedRows,"sec":$pipeSec,""" +
        s""""docs_per_sec":${math.round(pipeRows / pipeSec)}}}""")
    spark.stop()
  }
}
