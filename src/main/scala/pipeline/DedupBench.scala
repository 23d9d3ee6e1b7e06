package pipeline

import org.apache.spark.sql.functions._

import pipeline.fixtures.Webtext
import pipeline.ops.Dedup

/** Training-data-ops scale benchmark: dedup family over an N-row webtext
  * corpus (seeded ~2% exact dups). Prints one JSON line per op. */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val conf = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val cores = conf.getOrElse("--cores", "32").toInt
    val n = conf.getOrElse("--rows", "1000000").toLong
    val input = conf.getOrElse("--input", s"/tmp/graft-dedup-$n")
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(input).exists()) {
      Webtext.df(spark, n, 64).select(
        xxhash64(col("url")).as("id"), col("text"))
        .write.mode("overwrite").parquet(input)
    }
    val docs = spark.read.parquet(input)
    docs.limit(1000).count() // warm
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","rows":$n,"sec":${sec}%.2f,"docs_per_sec":${(n / sec).toLong},"result_rows":$r}""")
    }
    time("dedup_exact")(Dedup.exact(docs, "id", "text").filter(col("n_copies") > 1).count())
    time("dedup_exact_apply")(Dedup.dropExactDuplicates(docs, "id", "text").count())
    // the word-soup fixture's shingle entropy is unrealistically low, so
    // bucket sizes grow ~linearly with the corpus and UNCAPPED pair counts
    // grow quadratically (1M docs → 14.6M pairs; 10M → ~1.4B). The uncapped
    // run exists to demonstrate exactly that hazard — skip it past 2M rows
    // (on real web text buckets stay small and uncapped is the default).
    if (n <= 2000000L)
      time("minhash_lsh_pairs")(Dedup.minhashLsh(docs, "id", "text").count())
    time("minhash_lsh_capped")(
      Dedup.minhashLsh(docs, "id", "text", maxBucketSize = 100).count())
    time("simhash_buckets")(Dedup.simhashBuckets(docs, "id", "text").count())
    time("fingerprint")(docs.select(
      pipeline.expr.PortableExprs.fingerprint(col("text")).as("fp"))
      .filter(col("fp") =!= 0L).count())
    spark.stop()
  }
}
