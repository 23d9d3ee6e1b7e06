package pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.ops.NgramLm

/** Stupid-backoff n-gram LM: count/train parity with a plain-Scala
  * reference, the integer score detail, the IEEE perplexity step, and the
  * CCNet head/middle/tail bucketing. */
class NgramLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, 4, "ngramlm-spec")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  /** Plain-Scala stupid-backoff reference — independent reimplementation
    * of the scoring rule over the same counts. */
  private def refScore(train: Seq[String], score: Seq[(Long, String)], n: Int,
                       minCount: Long = 1L) = {
    def toks(t: String): Seq[String] =
      Option(t).map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)) match {
        case Some(s) if s.nonEmpty => s
        case Some(_) => Seq("") // split("") == [""], tokens() parity
        case None => Seq.empty
      }
    // NB tokens("") in Spark = [""] (one empty token); mirror exactly
    def sparkToks(t: String): Seq[String] =
      Option(t).map(_.trim.split("\\s+").toSeq).getOrElse(Seq.empty)
    val counts = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    var total = 0L
    train.foreach { t =>
      val ws = sparkToks(t)
      total += ws.size
      for (o <- 1 to n; i <- 0 to ws.size - o)
        counts((o, ws.slice(i, i + o).mkString(" "))) =
          counts.getOrElse((o, ws.slice(i, i + o).mkString(" ")), 0L) + 1
    }
    val pruned = counts.filter { case ((o, _), c) => o == 1 || c >= minCount }
    score.map { case (id, t) =>
      val ws = sparkToks(t)
      var sumLog = 0L
      val perLevel = Array.fill(n + 1)(0L) // index 0 = OOV
      val nums = Array.fill(n + 1)(0L)
      val dens = Array.fill(n + 1)(0L)
      ws.zipWithIndex.foreach { case (w, p) =>
        val formable = math.min(n, p + 1)
        // highest order whose gram AND context both survive pruning
        val lv = (formable to 2 by -1).find { o =>
          val g = ws.slice(p - o + 1, p + 1).mkString(" ")
          val c = ws.slice(p - o + 1, p).mkString(" ")
          pruned.contains((o, g)) && pruned.contains((o - 1, c))
        }.getOrElse(if (pruned.contains((1, w))) 1 else 0)
        val (num, den) =
          if (lv >= 2) (pruned((lv, ws.slice(p - lv + 1, p + 1).mkString(" "))),
            pruned((lv - 1, ws.slice(p - lv + 1, p).mkString(" "))))
          else if (lv == 1) (pruned((1, w)), total)
          else (1L, total + 1L)
        val drops = formable - math.max(lv, 1) + (if (lv == 0) 1 else 0)
        sumLog += math.round(
          (math.log(num.toDouble) - math.log(den.toDouble) +
            drops * math.log(0.4)) * 1000000.0)
        perLevel(lv) += 1; nums(lv) += num; dens(lv) += den
      }
      id -> ((ws.size.toLong, perLevel.toVector, nums.toVector, dens.toVector, sumLog))
    }.toMap
  }

  test("train + scoreDetail == plain-Scala stupid-backoff reference (n=3, pruning, OOV)") {
    val s = sc
    import s.implicits._
    val trainDocs = Seq(
      "the cat sat on the mat",
      "the cat sat on the hat",
      "the dog sat on the mat",
      "a cat ran to the mat",
      "the cat sat on the mat") // full repeat: trigram counts ≥ 2
    val scoreDocs: Seq[(Long, String)] = Seq(
      (1L, "the cat sat on the mat"),   // in-distribution
      (2L, "the cat sat quietly here"), // OOV tokens mid-doc
      (3L, "zebra"),                    // full OOV, single token
      (4L, null.asInstanceOf[String]))  // never-vanish zeros
    for (minCount <- Seq(1L, 2L)) {
      val model = NgramLm.train(trainDocs.toDF("text"), "text", 3, minCount)
      val detail = NgramLm.scoreDetail(
        scoreDocs.toDF("doc_id", "text"), "doc_id", "text", model, 3)
        .collect().map { r =>
          r.getLong(0) -> ((r.getLong(1),
            Vector(r.getLong(r.fieldIndex("n_oov")),
              r.getLong(r.fieldIndex("n_l1")), r.getLong(r.fieldIndex("n_l2")),
              r.getLong(r.fieldIndex("n_l3"))),
            Vector(0L, r.getLong(r.fieldIndex("num_l1")),
              r.getLong(r.fieldIndex("num_l2")), r.getLong(r.fieldIndex("num_l3"))),
            Vector(0L, r.getLong(r.fieldIndex("den_l1")),
              r.getLong(r.fieldIndex("den_l2")), r.getLong(r.fieldIndex("den_l3"))),
            r.getLong(r.fieldIndex("sum_log_q6"))))
        }.toMap
      val want = refScore(trainDocs, scoreDocs, 3, minCount)
      want.foreach { case (id, (nTok, lv, nums, dens, sumLog)) =>
        val (gn, glv, gnums, gdens, gsum) = detail(id)
        assert(gn == nTok, s"doc $id n_scored (minCount=$minCount)")
        assert(glv == lv, s"doc $id levels: got $glv want $lv (minCount=$minCount)")
        // reference indexes (0=oov,1,2,3); detail vectors exclude oov sums
        assert(gnums.drop(1) == nums.drop(1), s"doc $id nums (minCount=$minCount)")
        assert(gdens.drop(1) == dens.drop(1), s"doc $id dens (minCount=$minCount)")
        assert(gsum == sumLog, s"doc $id sum_log_q6: got $gsum want $sumLog")
      }
    }
  }

  test("perplexity: IEEE step matches the Scala formula; repetitive text scores lower") {
    val s = sc
    import s.implicits._
    val trainDocs = (1 to 30).map(_ => "alpha beta gamma delta alpha beta gamma")
    val model = NgramLm.train(trainDocs.toDF("text"), "text", 3)
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta"),  // fluent under the model
      (2L, "delta delta alpha gamma beta alpha")) // shuffled — higher ppl
      .toDF("doc_id", "text")
    val ppl = NgramLm.perplexity(
      NgramLm.scoreDetail(docs, "doc_id", "text", model, 3))
      .select("doc_id", "n_scored", "sum_log_q6", "ppl")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    ppl.foreach { case (_, (n, slq, p)) =>
      val want = math.exp(-slq.toDouble / (n * 1000000.0))
      // 1-ulp slack: Spark's codegen'd arithmetic can associate the
      // division differently than the literal Scala formula; ppl is
      // never an oracle surface (the integer detail is — class doc)
      assert(math.abs(p - want) <= math.ulp(want) * 4, s"$p vs $want")
    }
    assert(ppl(1L)._3 < ppl(2L)._3, s"fluent < shuffled: $ppl")
  }

  test("pplBuckets: per-language terciles, head < middle < tail") {
    val s = sc
    import s.implicits._
    val trainDocs = (1 to 50).map(_ => "one two three four five six seven")
    val model = NgramLm.train(trainDocs.toDF("text"), "text", 2)
    // 30 docs per lang with graded fluency: k in-model tokens + (7-k) OOV
    val docs = (0 until 60).map { i =>
      val k = (i % 30) % 8
      val text = (Seq.fill(k)("one two").mkString(" ") + " " +
        Seq.fill(7 - k)(s"zz$i").mkString(" ")).trim
      (i.toLong, text, if (i < 30) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val detail = NgramLm.scoreDetail(docs, "doc_id", "text", model, 2)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val bucketed = NgramLm.pplBuckets(detail, "lang")
    val byBucket = bucketed.groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n"), avg("ppl").as("avg_ppl"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    for (l <- Seq("en", "de")) {
      assert(Seq("head", "middle", "tail").forall(b => byBucket.contains((l, b))),
        s"all buckets present for $l: ${byBucket.keys}")
      assert(byBucket((l, "head"))._2 < byBucket((l, "middle"))._2 &&
        byBucket((l, "middle"))._2 < byBucket((l, "tail"))._2,
        s"bucket ordering for $l: $byBucket")
    }
    // null-language docs must not crash the quantile pass (the r6 shape
    // drove one approxQuantile job per collected lang value and threw on
    // null); they tercile among themselves like any other group
    val withNull = docs.unionByName(
      Seq((100L, "one two one two zzz", null.asInstanceOf[String]))
        .toDF("doc_id", "text", "lang"))
    val detailN = NgramLm.scoreDetail(withNull, "doc_id", "text", model, 2)
      .join(withNull.select("doc_id", "lang"), Seq("doc_id"))
    val bn = NgramLm.pplBuckets(detailN, "lang")
    assert(bn.filter(col("lang").isNull).count() == 1)
    assert(bn.filter(col("lang").isNull && col("bucket").isNull).count() == 0)
  }
}
