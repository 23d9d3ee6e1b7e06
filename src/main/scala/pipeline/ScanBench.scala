package pipeline

import org.apache.spark.sql.functions._

/** Pure-scan scaling probe (dev tool): isolates parquet scan + decompress
  * from the pipeline compute, to attribute scaling losses. */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val conf = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val cores = conf.getOrElse("--cores", "8").toInt
    val input = conf.getOrElse("--input", "/tmp/graft-webtext-8m")
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet(input)
    raw.limit(1000).count() // warm
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scan] cores=$cores $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    t("scan+len")(raw.select(sum(octet_length(col("text")))).head.getLong(0))
    t("scan+len run2")(raw.select(sum(octet_length(col("text")) + octet_length(col("url")))).head.getLong(0))
    t("parse-expr only")(raw.select(sum(octet_length(
      pipeline.expr.PortableExprs.parseEvent(col("url"), col("text"))
        .getField("extracted_text")))).head.getLong(0))
    spark.stop()
  }
}
