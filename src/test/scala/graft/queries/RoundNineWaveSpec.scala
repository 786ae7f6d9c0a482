package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Properties of the round-9 wave queries (q175–q187) the DuckDB oracle
  * alone can't state: brute-force JVM recomputations (interval union,
  * skyline dominance), structural invariants (chunk coverage, semdedup
  * cluster representatives, CI ordering, removal identity on untouched
  * docs), and the double-delimiter greedy-merge semantics q182's BPE
  * rewrite rides on.
  */
class RoundNineWaveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q175 matches a brute-force JVM interval union per user") {
    val out = SparkEntry.queries("q175_interval_union")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val iv = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"),
        (col("ts_us") + floor(col("value") * lit(60000000.0)).cast("long")).as("e_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = iv.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s0, e0)) => acc match {
          case (bs, be) :: rest if s0 <= be => (bs, math.max(be, e0)) :: rest
          case _ => (s0, e0) :: acc
        }
      }
      val lens = merged.map { case (s0, e0) => e0 - s0 }
      u -> ((merged.size.toLong, lens.sum, lens.max))
    }
    assert(brute.size === out.size)
    brute.foreach { case (u, exp) => assert(out(u) === exp, s"user $u") }
  }

  test("q184 is exactly the brute-force dominance skyline per scope") {
    val pts = Tables.documents(spark, sf)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .select(col("lang"), col("source"), col("doc_id"),
        size(col("toks")).cast("long").as("x"),
        size(array_distinct(col("toks"))).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val brute = pts.groupBy(p => (p._1, p._2)).toSeq.flatMap { case (_, ps) =>
      ps.filterNot(p => ps.exists(q =>
        q._4 >= p._4 && q._5 >= p._5 && (q._4 > p._4 || q._5 > p._5))).toSeq
    }.map(p => (p._1, p._2, p._3)).toSet
    val got = SparkEntry.queries("q184_skyline")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === brute)
  }

  test("q178 chunk set per doc covers every token with the declared stride") {
    val W = 32; val S = 24
    val nToks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = SparkEntry.queries("q178_context_chunks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(chunks.keySet === nToks.keySet)
    chunks.foreach { case (doc, cs) =>
      val n = nToks(doc)
      val expected = if (n <= W) 1L else math.ceil((n - W).toDouble / S).toLong + 1
      assert(cs.length.toLong === expected, s"doc $doc chunk count")
      assert(cs.map(_._2).sorted.toSeq === (0L until expected), s"doc $doc indices")
      cs.foreach { case (_, idx, len) =>
        val start = idx * S + 1
        val expLen = math.min(W.toLong, n - start + 1)
        assert(len === expLen, s"doc $doc chunk $idx length")
      }
      // full coverage: the last chunk reaches token n
      val lastStart = (expected - 1) * S + 1
      assert(lastStart + cs.map(_._3).last - 1 >= n || expected == 1L)
    }
  }

  test("q182's double-delimiter replace implements greedy left-to-right BPE merge") {
    import spark.implicits._
    // adversarial overlap fixture: runs of the same symbol
    val cases = Seq(
      ("|a||a||a|", "a", "a", "|aa||a|"),       // aaa -> [aa, a], not [a, aa]
      ("|a||a||a||a|", "a", "a", "|aa||aa|"),   // aaaa -> [aa, aa]
      ("|x||a||b||a||b|", "a", "b", "|x||ab||ab|"),
      ("|ab||a||b|", "a", "b", "|ab||ab|"))     // merged symbol != raw pair
    val got = cases.toDF("seq", "l", "r", "want")
      .withColumn("rewritten",
        expr("replace(seq, concat('|', l, '||', r, '|'), concat('|', l, r, '|'))"))
      .collect()
    got.foreach(r => assert(r.getString(4) === r.getString(3), r.getString(0)))
  }

  test("q187 leaves untouched docs byte-identical and never grows a doc") {
    val out = SparkEntry.queries("q187_exact_substr_removal")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.forall { case (_, n, k, _) => k <= n })
    // docs with < 5 tokens can't host a 5-gram: fully kept
    out.filter(_._2 < 5).foreach { case (d, n, k, _) => assert(k === n, s"doc $d") }
    // every fully-kept doc's md5 equals the md5 of its normalized text
    val truth = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(concat_ws(" ", split(trim(col("text")), "\\s+"))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(t => t._2 === t._3).foreach { case (d, _, _, m) =>
      assert(m === truth(d), s"doc $d rewrite changed an untouched doc")
    }
  }

  test("q176 keep-list: exactly one representative per cluster, labels are minima") {
    val rows = SparkEntry.queries("q176_semdedup_keeplist")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    rows.foreach { case (v, c, keep) =>
      assert(c <= v, s"cluster label $c above member $v")
      assert(keep === (v == c))
    }
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, ms) =>
      assert(ms.count(_._3) === 1, s"cluster $c keeps ${ms.count(_._3)}")
      assert(ms.map(_._1).min === c, s"cluster $c label is not its min member")
    }
  }

  test("q185 intervals are ordered and inside [0, 1]") {
    SparkEntry.queries("q185_keep_rate_ci")(spark, sf).collect().foreach { r =>
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo >= 0.0 && hi <= 1.0 && lo <= p && p <= hi, r.toString)
    }
  }
}
