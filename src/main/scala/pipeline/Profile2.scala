package pipeline

import org.apache.spark.sql.functions._
import pipeline.model.Schemas

/** Micro-bisect of Parse expression costs (dev tool). */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.parquet("/tmp/graft-webtext-bench").select("text")
    raw.count()
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p2] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($r)")
    }
    val lines = split(col("text"), "\n")
    val linesCap = split(substring(col("text"), 1, 204800), "\n")
    time("octet_length only")(raw.select(sum(octet_length(col("text")))).head.getLong(0))
    time("substring cap + len")(raw.select(sum(octet_length(substring(col("text"), 1, 204800)))).head.getLong(0))
    time("split + get0")(raw.select(sum(octet_length(get(lines, lit(0))))).head.getLong(0))
    time("splitCap + get0")(raw.select(sum(octet_length(get(linesCap, lit(0))))).head.getLong(0))
    time("splitCap x3 refs")(raw.select(sum(octet_length(get(linesCap, lit(0))) +
      octet_length(get(linesCap, lit(1))) + octet_length(get(linesCap, lit(2))))).head.getLong(0))
    time("regexp_extract title")(raw.select(sum(octet_length(
      regexp_extract(get(linesCap, lit(0)), "^title: (.*)$", 1)))).head.getLong(0))
    time("regexp status on kv")(raw.select(sum(coalesce(nullif(
      regexp_extract(get(linesCap, lit(1)), "status=([0-9]+)", 1), lit("")).cast("long"), lit(0L)))).head.getLong(0))
    time("from_json 30%")(raw.select(count(from_json(
      when(get(linesCap, lit(3)).startsWith("{"), get(linesCap, lit(3))),
      Schemas.nginxWithCorrupt).getField("ts"))).head.getLong(0))
    time("concat extracted")(raw.select(sum(octet_length(concat(
      regexp_extract(get(linesCap, lit(0)), "^title: (.*)$", 1), lit("\n"),
      coalesce(get(linesCap, lit(2)), lit("")))))).head.getLong(0))
    spark.stop()
  }
}
