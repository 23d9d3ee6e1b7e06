package pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import pipeline.fixtures.Webtext
import pipeline.stages.{Enrich, Parse, Route}

/** Stage-by-stage wall-clock breakdown of the fused pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val conf = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val cores = conf.getOrElse("--cores", "32").toInt
    val input = conf.getOrElse("--input", "/tmp/graft-webtext-bench")
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val raw = spark.read.parquet(input)
    time("scan count")(raw.count())
    time("scan text bytes")(raw.select(sum(octet_length(col("text")))).head.getLong(0))
    time("parse only")(Parse(raw).select(count(lit(1))).head.getLong(0))
    time("parse force-all") {
      Parse(raw).select(sum(octet_length(col("extracted_text")) + col("status") +
        octet_length(col("title")))).head.getLong(0)
    }
    val parsed = Parse(raw)
    time("parse+enrich")(Enrich(parsed, Webtext.langMetaDf(spark), Webtext.geoDf(spark))
      .select(count(lit(1))).head.getLong(0))
    time("transform (no write)")(Pipeline.transform(raw).select(count(lit(1))).head.getLong(0))
    time("transform+agg")(Pipeline.transform(raw).groupBy("sink").count().count())
    time("full fused run") {
      Pipeline.runFused(spark, raw, "/tmp/graft-profile-out").values.sum
    }
    spark.stop()
  }
}
