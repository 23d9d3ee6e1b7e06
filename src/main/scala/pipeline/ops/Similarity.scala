package pipeline.ops

import org.apache.spark.sql.{Column, DataFrame}
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
   * weight = ±1 from bit parity of hash32("(p+planeOffset):i"). sign bit =
   * (v·r_p) > 0. Per-row, no shuffle; portable to the SQL oracle.
   * `planeOffset` selects an independent table for the OR-construction —
   * this HOF twin carries it so the MULTI-TABLE production path has a
   * cross-checked reference implementation too (parity-tested vs
   * HyperplaneSigExpr at zero and nonzero offsets).
   */
  def hyperplaneSig(vecCol: String, planes: Int, dim: Int, planeOffset: Int = 0) = {
    val v = col(vecCol)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val dot = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
        (acc, i) => acc + v.getItem(i).cast("double") *
          (pmod(hash32(concat((p + lit(planeOffset)).cast("string"), lit(":"), i.cast("string"))), lit(2L))
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
    // tables == 1: one bucket per doc → (qid, cid) already unique, vectors
    // stay in hand. tables > 1: dedup candidates as BARE ID PAIRS (the OR
    // step) so float vectors never ride the distinct shuffle, then re-attach
    // qv from the broadcast query set and cv from the corpus.
    val matched = q.join(c, Seq("table", "bucket")).filter(col("qid") =!= col("cid"))
    val withVecs =
      if (tables == 1) matched.select("qid", "qv", "cid", "cv")
      else matched.select("qid", "cid").distinct()
        .join(broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))), Seq("qid"))
        .join(corpus.select(col(idCol).as("cid"), col(vecCol).as("cv")), Seq("cid"))
    val scored = withVecs
      .withColumn("cos", pipeline.expr.PortableExprs.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /**
   * IVF-style ANN over EXPLICIT centroids: cell assignment is one narrow
   * per-row pass — the centroid list rides the plan as a literal (Spark
   * ships it with the serialized task closure, the broadcast-variable role),
   * each row scores all cells in place and keeps its top-n. No
   * monotonically_increasing_id, no crossJoin, no window — the r1 version
   * shuffled and sorted corpus×nCells rows keyed by a per-row unique id to
   * compute what is a per-row argmin (flagged as a scale-killer).
   * Returns exact cosine top-k within the `nProbe` probed cells per query.
   */
  def ivfTopKWithCentroids(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, k: Int, nProbe: Int,
                           centroids: Seq[Seq[Float]]): DataFrame =
    ivfTopKAssigned(assignCells(corpus, idCol, vecCol, centroids),
      queries, idCol, vecCol, k, nProbe, centroids)

  /** cells ranked per row: sort struct(-cos, cell) ascending ≡ cos desc,
    * cell asc — deterministic ties, identical on the SQL-oracle side. */
  private def rankedCells(v: Column, centroids: Seq[Seq[Float]]): Column = {
    val centLit = typedLit(centroids)
    array_sort(transform(sequence(lit(0), lit(centroids.size - 1)),
      i => struct(
        (-pipeline.expr.PortableExprs.cosine(v, get(centLit, i))).as("neg"),
        i.cast("int").as("cell"))))
  }

  /**
   * Corpus cell assignment as a PERSISTABLE frame `(cid, cv, cell)` — one
   * narrow per-row argmin pass (the centroid list rides the plan as a
   * literal). At production scale this runs ONCE per (corpus, centroid
   * generation) and is STORED — cell as a partition column of the vector
   * table — so per-query-batch cost excludes the O(N·nCells) assignment
   * scan and cell-pruned reads skip non-probed cells at the source.
   * Amortization measured in pipeline.AnnBench `--mode amortize` →
   * BASELINE.md.
   */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: Seq[Seq[Float]]): DataFrame =
    corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .withColumn("cell",
        get(rankedCells(col("cv"), centroids), lit(0)).getField("cell"))

  /** IVF top-k over a PRE-ASSIGNED corpus (the [[assignCells]] shape,
    * typically read back from storage): only the query batch pays the
    * centroid scoring; the corpus side is a plain cell equijoin. */
  def ivfTopKAssigned(assigned: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int, nProbe: Int,
                      centroids: Seq[Seq[Float]]): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("cell",
        explode(transform(slice(rankedCells(col("qv"), centroids), 1, nProbe),
          s => s.getField("cell"))))
    // a corpus row lives in exactly ONE cell and probe cells are distinct,
    // so (qid, cid) pairs are unique — no dedup pass needed
    val scored = broadcast(q).join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", pipeline.expr.PortableExprs.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "cos", "rank")
  }

  /**
   * Fit IVF centroids with Spark ML k-means (full Lloyd iterations) on a
   * deterministic hash-sample of the corpus. Sampling is standard IVF
   * practice — centroids need a REPRESENTATIVE sample, and fitting on all
   * of a 10^12-row corpus would cost one full corpus pass per Lloyd
   * iteration; the hash gate keeps the sample deterministic across reruns
   * (no RNG state, the stratifiedSample pattern). Recall vs (nCells,
   * nProbe, maxIter) is measured in pipeline.AnnBench → BASELINE.md.
   */
  def fitCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nCells: Int, maxIter: Int = 10, seed: Long = 42L,
                   samplePercent: Int = 100): Seq[Seq[Float]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(samplePercent >= 1 && samplePercent <= 100,
      s"samplePercent must be 1..100, got $samplePercent")
    val base =
      if (samplePercent >= 100) corpus
      else corpus.filter(
        pmod(hash32(col(idCol).cast("string")), lit(100L)) < samplePercent)
    val train = base.select(array_to_vector(
      col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .fit(train)
    model.clusterCenters.map(_.toArray.map(_.toFloat).toSeq).toSeq
  }

  /** IVF with k-means-trained centroids (model-dependent; pass explicit
    * centroids via [[ivfTopKWithCentroids]] for oracle-checkable
    * determinism). `maxIter` = Lloyd iterations; `samplePercent` bounds
    * the training pass at corpus scale. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int, nProbe: Int,
              seed: Long = 42L, maxIter: Int = 5,
              samplePercent: Int = 100): DataFrame = {
    val centroids = fitCentroids(corpus, idCol, vecCol, nCells,
      maxIter, seed, samplePercent)
    ivfTopKWithCentroids(corpus, queries, idCol, vecCol, k, nProbe, centroids)
  }
}
