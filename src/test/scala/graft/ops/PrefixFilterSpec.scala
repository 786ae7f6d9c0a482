package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The prefix-filtered exact Jaccard threshold join (DedupOps
  * .prefixRows / prefixCandidates / verifyJaccardThreshold, the
  * q212/q213 engine): perfect recall is a THEOREM (the smallest shared
  * token under the rarest-first order must sit in both prefixes), so
  * the spec checks the implementation against the brute-force join on
  * real data, on an adversarial boilerplate corpus where the naive
  * join is quadratic, and on exact threshold boundaries where a float
  * gate would drift.
  */
class PrefixFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Brute force: every same-scope pair sharing ANY token, thresholded
    * J ≥ p/q with the same integer gate — no prefix logic at all.
    */
  private def bruteForce(toks: DataFrame, scope: Seq[String], p: Int, q: Int): DataFrame = {
    val keys = scope :+ "tok"
    val t1 = toks.select((keys.map(col) :+ col("doc_id").as("d1")): _*)
    val t2 = toks.select((keys.map(col) :+ col("doc_id").as("d2")): _*)
    val cand = t1.join(t2, keys).filter(col("d1") < col("d2"))
      .select((scope.map(col) :+ col("d1") :+ col("d2")): _*).distinct()
    DedupOps.verifyJaccardThreshold(toks, cand, scope, p, q)
  }

  private def assertSameSets(a: DataFrame, b: DataFrame, what: String): Unit = {
    val cols = Seq("d1", "d2", "c", "n1", "n2", "jacc")
    val x = a.select(cols.map(col): _*)
    val y = b.select(cols.map(col): _*)
    assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty, what)
  }

  test("prefix join equals brute force on real 3-gram shingles (t = 1/2)") {
    val scope = Seq("lang", "source")
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(expr(
          "transform(sequence(1, size(toks)-2), i -> concat(element_at(toks,i),' ',element_at(toks,i+1),' ',element_at(toks,i+2)))")))
          .as("tok"))
    assertSameSets(
      DedupOps.jaccardThresholdJoin(sh, scope, 1, 2),
      bruteForce(sh, scope, 1, 2),
      "prefix-filtered join diverges from brute force on real shingles")
  }

  test("adversarial boilerplate corpus: recall intact, join volume collapses (t = 2/3)") {
    import spark.implicits._
    // 60 docs ALL sharing 3 boilerplate tokens (the naive join's
    // quadratic bucket: 3 × C(60,2) = 5310 join rows) + 5 near-dup
    // pairs sharing 9 of their 10 tokens, J = 9/11 ≥ 2/3.
    val docs = (0 until 60).map { i =>
      val rare =
        if (i < 10 && i % 2 == 1) (0 until 6).map(j => s"rare_${i - 1}_$j")
        else (0 until 6).map(j => s"rare_${i}_$j")
      val last = if (i < 10 && i % 2 == 1) Seq(s"u_$i") else Seq(s"u_${i}_x")
      (i.toLong, Seq("the", "quick", "brown") ++ rare ++ last)
    }
    val toks = docs.toDF("doc_id", "toks")
      .select(col("doc_id"), lit("xx").as("lang"), explode(col("toks")).as("tok"))
    val scope = Seq("lang")

    assertSameSets(
      DedupOps.jaccardThresholdJoin(toks, scope, 2, 3),
      bruteForce(toks, scope, 2, 3),
      "prefix-filtered join diverges from brute force on the boilerplate corpus")

    // the 5 constructed pairs: |A∩B| = 9 of 10, J = 9/11 ≥ 2/3
    assert(DedupOps.jaccardThresholdJoin(toks, scope, 2, 3).count() === 5L)

    // volume: Σ k(k−1)/2 over prefix buckets vs over all buckets —
    // the boilerplate bucket must not survive into any prefix
    def volume(rel: DataFrame): Long =
      rel.groupBy("lang", "tok").agg(count(lit(1)).as("k"))
        .agg(sum(expr("k * (k - 1) div 2"))).collect()(0).getLong(0)
    val all = volume(toks)
    val pre = volume(DedupOps.prefixRows(toks, scope, 2, 3))
    assert(all >= 5310L, s"test corpus lost its quadratic bucket (all = $all)")
    assert(pre * 50 < all, s"prefix volume $pre not << naive volume $all")
  }

  test("integer threshold gate: exact-boundary pair kept, one-below dropped (t = 1/2)") {
    import spark.implicits._
    // A = {t1..t4, a}, B = {t1..t4, b1, b2, b3}: c = 4, u = 8 → J = 1/2
    // exactly — MUST be kept by the ≥ gate ((p+q)·c = 12 ≥ p·(n1+n2) = 12
    // wait: 3·4 = 12 ≥ 1·(5+7) = 12 ✓ boundary).
    // C = {t1..t4, c1, c2, c3, c4}: vs A c = 4, u = 9 → J = 4/9 < 1/2.
    val rows =
      (1 to 4).map(i => (1L, s"t$i")) ++ Seq((1L, "a")) ++
        ((1 to 4).map(i => (2L, s"t$i")) ++ Seq((2L, "b1"), (2L, "b2"), (2L, "b3"))) ++
        ((1 to 4).map(i => (3L, s"t$i")) ++ (1 to 4).map(i => (3L, s"c$i")))
    val toks = rows.toDF("doc_id", "tok").withColumn("lang", lit("xx"))
    val out = DedupOps.jaccardThresholdJoin(toks, Seq("lang"), 1, 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)), "exact J = 1/2 boundary pair dropped")
    assert(!out.contains((1L, 3L)), "J = 4/9 pair wrongly kept")
    assert(!out.contains((2L, 3L)), "J = 4/11 pair wrongly kept")
  }
}
