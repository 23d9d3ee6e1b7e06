package pipeline.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Portable._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`).
 *
 * Scale design:
 *  - `bruteTopK` is the exactness baseline: broadcast the (small) query set,
 *    one pass over the corpus, per-query top-k via window rank. Corpus is
 *    never shuffled by vector — only the (tiny) per-query candidate rows.
 *  - `lshTopK` is the scale path: deterministic random-hyperplane signatures
 *    bucket the corpus once (narrow, per-row); queries probe only their
 *    bucket — turning O(Q·N) into O(Q·N/2^bits) with a bucket equijoin.
 *  - `ivfTopK` is the cluster path: k-means centroids (Spark ML) partition
 *    the corpus; queries scan the nProbe nearest cells.
 */
object Similarity {

  /** Brute-force cosine top-k. `queries` should be small (broadcast). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("cos", pipeline.expr.PortableExprs.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /**
   * Deterministic random-hyperplane signature (portable): plane p, dim i
   * weight = ±1 from bit parity of hash32("p:i"). sign bit = (v·r_p) > 0.
   * Per-row, no shuffle; portable to the SQL oracle.
   */
  def hyperplaneSig(vecCol: String, planes: Int, dim: Int) = {
    val v = col(vecCol)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val dot = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
        (acc, i) => acc + v.getItem(i).cast("double") *
          (pmod(hash32(concat(p.cast("string"), lit(":"), i.cast("string"))), lit(2L))
            .cast("double") * lit(2.0) - lit(1.0)))
      when(dot > 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(sequence(lit(0), lit(planes - 1)), lit(0L),
      (acc, p) => acc + get(bits, p) * call_function("shiftleft", lit(1L), p))
  }

  /** LSH-bucketed ANN: exact cosine top-k within the query's bucket(s).
    * `tables` > 1 is the standard OR-construction: L independent
    * hyperplane signatures (disjoint plane index ranges feed the portable
    * weight hash, so tables are independent by construction); a candidate
    * matches if it shares ANY table's bucket — recall rises with L at the
    * cost of more candidates. One corpus pass computes all L buckets. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int, dim: Int,
              tables: Int = 1): DataFrame = {
    def sigs(c: DataFrame, id: String, v: String) =
      c.select(col(id), col(v), posexplode(array(
        (0 until tables).map(t => pipeline.expr.PortableExprs
          .hyperplaneSig(col(v), planes, dim, planeOffset = t * planes)): _*))
        .as(Seq("table", "bucket")))
    val c = sigs(corpus, idCol, vecCol)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"), col("table"), col("bucket"))
    val q = broadcast(sigs(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("table"), col("bucket")))
    val scored = q.join(c, Seq("table", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "qv", "cid", "cv").distinct() // OR across tables
      .withColumn("cos", pipeline.expr.PortableExprs.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /**
   * IVF-style ANN with Spark ML k-means centroids: assign corpus rows to
   * their nearest centroid once (narrow after a small broadcast of
   * centroids), probe `nProbe` cells per query. Returns exact cosine
   * top-k within probed cells.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int, nProbe: Int,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val train = corpus.select(array_to_vector(
      col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(5).fit(train)
    val centroids = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.map(_.toFloat))
    }
    import spark.implicits._
    val cents = broadcast(centroids.toSeq.toDF("cell", "centroid"))
    def nearestCells(v: String, n: Int) = {
      // rank cells by cosine to the row's vector; keep n
      val w = Window.partitionBy(col("_rid")).orderBy(col("_ccos").desc, col("cell").asc)
      (df: DataFrame) => df
        .withColumn("_rid", monotonically_increasing_id())
        .crossJoin(cents)
        .withColumn("_ccos", pipeline.expr.PortableExprs.cosine(col(v), col("centroid")))
        .withColumn("_crank", row_number().over(w))
        .filter(col("_crank") <= n)
        .drop("centroid", "_ccos", "_crank", "_rid")
    }
    val c = nearestCells("cv", 1)(
      corpus.select(col(idCol).as("cid"), col(vecCol).as("cv")))
    val q = nearestCells("qv", nProbe)(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val scored = q.join(c, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", pipeline.expr.PortableExprs.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }
}
