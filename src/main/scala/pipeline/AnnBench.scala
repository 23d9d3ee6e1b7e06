package pipeline

import org.apache.spark.sql.functions._

import pipeline.ops.Similarity

/**
 * ANN recall/latency study: IVF (trained centroids, Lloyd iterations) and
 * hyperplane-LSH against brute-force ground truth on a clustered synthetic
 * embedding corpus — the empirical counterpart of the MinHash S-curve
 * drill in DedupBench `--mode recall`. Prints one JSON line per setting:
 *
 *   {"bench":"ann_recall","algo":"ivf","rows":N,"nCells":..,"nProbe":..,
 *    "maxIter":..,"recall_at_k":..,"fit_sec":..,"query_sec":..}
 *
 * Fixture: `--clusters` natural clusters in 64d — centers deterministic
 * hash arithmetic in [-1,1], points = center + ±0.1 hash noise — so true
 * nearest neighbors are (mostly) same-cluster and recall genuinely
 * depends on probing the right cells. No RNG state anywhere: reruns are
 * bit-identical.
 */
object AnnBench {

  val Dim = 64

  def main(args: Array[String]): Unit = {
    val conf = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val cores = conf.getOrElse("--cores", "32").toInt
    val n = conf.getOrElse("--rows", "1000000").toLong
    val nQueries = conf.getOrElse("--queries", "100").toInt
    val k = conf.getOrElse("--k", "10").toInt
    val nClusters = conf.getOrElse("--clusters", "200").toInt
    // default fixture path keys on EVERY generation parameter (a --clusters
    // change must not silently reuse a differently-clustered corpus), and
    // DEFAULT-path reuse requires the _SUCCESS marker (a killed run's
    // partial directory must regenerate, not feed the bench a truncated
    // corpus). An EXPLICIT --input is the user's corpus: never regenerate
    // over it (rsync'd copies legitimately lack _SUCCESS; overwriting
    // would destroy real data), just require it to exist.
    val explicitInput = conf.get("--input")
    val input = explicitInput.getOrElse(s"/tmp/graft-ann-$n-c$nClusters")
    // the local-existence precheck only applies to scheme-less local paths;
    // s3a://, hdfs:// etc. go straight to spark.read (java.io.File cannot
    // see them and would reject a perfectly readable corpus)
    explicitInput.filterNot(_.contains("://")).foreach(p =>
      require(new java.io.File(p).exists(), s"--input $p does not exist"))
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (explicitInput.isEmpty && !new java.io.File(s"$input/_SUCCESS").exists()) {
      spark.range(0, n, 1, 64).map { i =>
        val c = (i % nClusters).toInt
        val v = Array.tabulate(Dim) { d =>
          val ch = (c * 1103515245L + d * 12345L) & 0x7fffffffL
          val center = (ch % 2000L) / 1000.0f - 1.0f
          val nh = (i * 6364136223846793005L + d * 1442695040888963407L) >>> 33
          center + ((nh % 200L) / 1000.0f - 0.1f)
        }
        (i, v)
      }.toDF("id", "vec").write.mode("overwrite").parquet(input)
    }
    val corpus = spark.read.parquet(input)
    val queries = corpus.filter(col("id") < nQueries)
    corpus.limit(1000).count() // warm

    def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "cid").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    // --mode amortize: the stored-assignment study — the round-4 recall
    // study MEASURED that corpus cell assignment (O(N·nCells) argmin)
    // dominates single-batch IVF query cost and asserted it amortizes at
    // production; this charges assignment ONCE (written to parquet, the
    // stored-partition-column analog) and times Q successive query batches
    // against the stored frame vs recomputing assignment per batch.
    if (conf.get("--mode").contains("amortize")) {
      val nBatches = conf.getOrElse("--batches", "5").toInt
      for (nCells <- Seq(16, 64, 256)) {
        val cents = Similarity.fitCentroids(corpus, "id", "vec", nCells,
          maxIter = 5, samplePercent = if (n > 200000) 5 else 100)
        val assignedPath = s"$input-assigned-c$nCells"
        val a0 = System.nanoTime()
        Similarity.assignCells(corpus, "id", "vec", cents)
          .write.mode("overwrite").parquet(assignedPath)
        val assignSec = (System.nanoTime() - a0) / 1e9
        val assigned = spark.read.parquet(assignedPath)
        def batchQueries(b: Int) = corpus
          .filter(col("id") >= b.toLong * nQueries && col("id") < (b + 1).toLong * nQueries)
        // unmeasured warm-up: both plan shapes once, so codegen/JIT and
        // the parquet footer reads don't land on the first timed batch
        Similarity.ivfTopKAssigned(assigned, batchQueries(nBatches),
          "id", "vec", k, nProbe = 2, cents).count()
        Similarity.ivfTopKWithCentroids(corpus, batchQueries(nBatches),
          "id", "vec", k, nProbe = 2, cents).count()
        // charge assignment once, then Q batches over the stored frame
        val storedSecs = (0 until nBatches).map { b =>
          val t = System.nanoTime()
          Similarity.ivfTopKAssigned(assigned, batchQueries(b),
            "id", "vec", k, nProbe = 2, cents).count()
          (System.nanoTime() - t) / 1e9
        }
        // the unamortized twin recomputes the corpus assignment per batch
        val recomputeSecs = (0 until nBatches).map { b =>
          val t = System.nanoTime()
          Similarity.ivfTopKWithCentroids(corpus, batchQueries(b),
            "id", "vec", k, nProbe = 2, cents).count()
          (System.nanoTime() - t) / 1e9
        }
        val sAvg = storedSecs.sum / nBatches
        val rAvg = recomputeSecs.sum / nBatches
        println(f"""{"bench":"ann_amortize","rows":$n,"nCells":$nCells,"batches":$nBatches,"queries_per_batch":$nQueries,"assign_sec":$assignSec%.2f,"stored_batch_sec":$sAvg%.2f,"recompute_batch_sec":$rAvg%.2f,"amortized_total_sec":${assignSec + storedSecs.sum}%.2f,"recompute_total_sec":${recomputeSecs.sum}%.2f}""")
      }
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val truth = topkMap(
      Similarity.bruteTopK(corpus, queries, "id", "vec", k))
    val bruteSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"bench":"ann_recall","algo":"brute","rows":$n,"k":$k,"queries":$nQueries,"query_sec":$bruteSec%.2f}""")

    def recallOf(got: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, ts) =>
        got.getOrElse(q, Set.empty).intersect(ts).size.toDouble / ts.size
      }
      per.sum / per.size
    }

    for (nCells <- Seq(64, 256); maxIter <- Seq(1, 10)) {
      val f0 = System.nanoTime()
      val cents = Similarity.fitCentroids(corpus, "id", "vec", nCells,
        maxIter = maxIter, samplePercent = if (n > 200000) 5 else 100)
      val fitSec = (System.nanoTime() - f0) / 1e9
      for (nProbe <- Seq(1, 2, 4, 8)) {
        val q0 = System.nanoTime()
        val got = topkMap(Similarity.ivfTopKWithCentroids(
          corpus, queries, "id", "vec", k, nProbe, cents))
        val qSec = (System.nanoTime() - q0) / 1e9
        println(f"""{"bench":"ann_recall","algo":"ivf","rows":$n,"k":$k,"nCells":$nCells,"maxIter":$maxIter,"nProbe":$nProbe,"recall_at_k":${recallOf(got)}%.3f,"fit_sec":$fitSec%.2f,"query_sec":$qSec%.2f}""")
      }
    }

    for ((planes, tables) <- Seq((8, 1), (8, 4), (12, 4))) {
      val q0 = System.nanoTime()
      val got = topkMap(Similarity.lshTopK(
        corpus, queries, "id", "vec", k, planes, Dim, tables))
      val qSec = (System.nanoTime() - q0) / 1e9
      println(f"""{"bench":"ann_recall","algo":"lsh","rows":$n,"k":$k,"planes":$planes,"tables":$tables,"recall_at_k":${recallOf(got)}%.3f,"query_sec":$qSec%.2f}""")
    }
    spark.stop()
  }
}
