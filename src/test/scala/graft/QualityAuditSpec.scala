package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral properties of the round-5 quality-audit family beyond the
  * oracle hash-compare: the recall audit's values are well-formed
  * fractions, the MinHash estimator is actually an accurate estimator
  * (not just bit-reproducible), and the weighted sampler is replayable
  * and biased the way weights say it should be.
  */
class QualityAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q145 recall@10 is a well-formed fraction and hits never exceed the candidate count") {
    val rows = SparkEntry.queries("q145_ann_recall")(spark, sf)
      .select("ivf_n", "hits", "recall_at_10").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ivfN, hits, rec) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(hits >= 0 && hits <= 10, s"hits=$hits out of range")
      assert(hits <= math.max(ivfN, 0), s"hits=$hits exceed ivf candidates=$ivfN")
      assert(rec >= 0.0 && rec <= 1.0, s"recall=$rec out of range")
      assert(math.abs(rec - hits / 10.0) < 1e-9)
    }
  }

  test("q148 MinHash calibration curve is sane (k=8 => weighted mean |err| well under 2 sigma)") {
    val rows = SparkEntry.queries("q148_minhash_accuracy")(spark, sf)
      .select("n_eq", "est_j", "n_pairs", "mean_jacc", "mean_abs_err", "min_jacc", "max_jacc")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nEq, est, mj, mn, mx) =
        (r.getLong(0), r.getDouble(1), r.getDouble(3), r.getDouble(5), r.getDouble(6))
      assert(est == nEq / 8.0, s"estimator level $est not n_eq/8")
      assert(mj >= mn - 1e-9 && mj <= mx + 1e-9, "bucket mean outside its own envelope")
      assert(mn > 0.0 && mx <= 1.0, "exact Jaccard outside (0,1]")
    }
    // per-pair sd of the k=8 estimator is sqrt(j(1-j)/8) <= 0.177; the
    // banded candidates skew to high-j pairs (smaller sd), so the mean
    // absolute error across pairs sits far below one sd of the worst case
    val totPairs = rows.map(_.getLong(2)).sum.toDouble
    val wErr = rows.map(r => r.getLong(2) * r.getDouble(4)).sum / totPairs
    assert(wErr < 0.25, s"weighted mean |est - exact| = $wErr — sketch broken")
  }

  test("q147 A-ES sample is replayable and weight-biased toward longer documents") {
    val q = SparkEntry.queries("q147_weighted_sample")
    val first = q(spark, sf).collect()
    val second = q(spark, sf).collect()
    assert(first.sameElements(second), "weighted sample not replayable")
    val perSource = q(spark, sf).groupBy("source").count().collect()
    perSource.foreach(r => assert(r.getLong(1) <= 5, "more than k per stratum"))
    // weighting property: the expected sampled-doc length under A-ES
    // exceeds the corpus mean; check the aggregate (not per source —
    // single draws are noisy) with slack for the small fixture
    val sampledMean = q(spark, sf).agg(avg("n_chars")).collect()(0).getDouble(0)
    val corpusMean = Tables.documents(spark, sf).agg(avg("n_chars")).collect()(0).getDouble(0)
    assert(sampledMean > corpusMean * 0.8,
      s"sampled mean $sampledMean not biased vs corpus mean $corpusMean")
  }
}
