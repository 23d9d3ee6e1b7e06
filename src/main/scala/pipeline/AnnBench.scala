package pipeline

import org.apache.spark.sql.functions._

import pipeline.ops.Similarity

/** Similarity-search scale benchmark: brute-force vs hyperplane-LSH top-k
  * over N deterministic synthetic vectors (seeded clusters so LSH recall is
  * meaningful). Prints one JSON line per variant incl. measured recall. */
object AnnBench {

  /** Deterministic 64-dim vector for row i: cluster centroid (i mod 32)
    * + small per-row jitter, splitmix-derived — parallel, order-free. */
  def vector(i: Long, dim: Int = 64): Array[Float] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val cluster = i % 32
    Array.tabulate(dim) { d =>
      val base = ((mix(cluster * 1315423911L + d) >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      val jitter = ((mix(i * 6364136223846793005L + d) >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 0.1
      (base + jitter).toFloat
    }
  }

  def main(args: Array[String]): Unit = {
    val conf = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val cores = conf.getOrElse("--cores", "32").toInt
    val n = conf.getOrElse("--rows", "1000000").toLong
    val nQ = conf.getOrElse("--queries", "50").toInt
    val k = 10
    val spark = Sessions.local(cores)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = spark.range(0, n, 1, 64)
      .mapPartitions(_.map(i => (i.longValue, vector(i.longValue))))
      .toDF("vec_id", "embedding").cache()
    corpus.count() // materialize; generation excluded
    val queries = corpus.filter(col("vec_id") < nQ).cache()
    queries.count()

    def run(name: String)(f: => org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val t0 = System.nanoTime()
      val rows = f.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","corpus":$n,"queries":$nQ,"k":$k,"sec":${sec}%.2f,"vecs_per_sec":${(n * nQ / sec).toLong}}""")
      rows.toSet
    }

    val brute = run("ann_brute")(
      Similarity.bruteTopK(corpus, queries, "vec_id", "embedding", k))
    val lsh = run("ann_lsh_10planes")(
      Similarity.lshTopK(corpus, queries, "vec_id", "embedding", k, planes = 10, dim = 64))
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    println(f"""{"op":"ann_lsh_recall","recall":${recall}%.3f,"brute_pairs":${brute.size},"lsh_pairs":${lsh.size}}""")
    val lsh4 = run("ann_lsh_10planes_4tables")(
      Similarity.lshTopK(corpus, queries, "vec_id", "embedding", k,
        planes = 10, dim = 64, tables = 4))
    val recall4 = lsh4.intersect(brute).size.toDouble / brute.size
    println(f"""{"op":"ann_lsh4_recall","recall":${recall4}%.3f}""")
    // IVF: k-means cells (fit timed separately), narrow per-row argmin
    // assignment, nProbe-cell probes
    val tFit = System.nanoTime()
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val model = new KMeans().setK(64).setSeed(42L).setMaxIter(5)
      .fit(corpus.select(array_to_vector(col("embedding").cast("array<double>")).as("features")))
    val cents = model.clusterCenters.map(_.toArray.map(_.toFloat).toSeq).toSeq
    println(f"""{"op":"ann_ivf_fit","cells":64,"sec":${(System.nanoTime() - tFit) / 1e9}%.2f}""")
    val ivf = run("ann_ivf_64cells_8probe")(
      Similarity.ivfTopKWithCentroids(corpus, queries, "vec_id", "embedding",
        k, nProbe = 8, cents))
    val recallIvf = ivf.intersect(brute).size.toDouble / brute.size
    println(f"""{"op":"ann_ivf_recall","recall":${recallIvf}%.3f}""")
    spark.stop()
  }
}
