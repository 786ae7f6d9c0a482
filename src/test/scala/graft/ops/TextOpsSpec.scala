package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval(text: String): (Long, Long, Long, Double, String) = {
    val r = Seq(text).toDF("t").select(
      TextOps.tokenCount(col("t")),
      TextOps.stopwordCount(col("t")),
      TextOps.punctCount(col("t")),
      TextOps.avgTokenLen(col("t")),
      TextOps.fingerprint(col("t"))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))
  }

  test("token/stopword/punct counts on a normal sentence") {
    val (toks, stops, punct, avg, _) = eval("the cat sat, on a mat.")
    assert(toks === 6)
    assert(stops === 2) // the, a ("on" is not in the list)
    assert(punct === 2)
    assert(math.abs(avg - (17.0 / 6)) < 1e-12) // 17 non-space chars
  }

  test("edge: empty and all-whitespace strings yield one empty token (pinned semantics)") {
    assert(eval("")._1 === 1)
    assert(eval("   ")._1 === 1)
    // the documented guard distinguishes truly-empty text
    val guarded = Seq("", "  ", "x").toDF("t")
      .select(when(length(trim(col("t"))) > 0, TextOps.tokenCount(col("t"))).otherwise(0L).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(guarded === Seq(0L, 0L, 1L))
  }

  test("edge: consecutive stopwords — non-overlapping scan removes alternate matches only") {
    // " the a " — removing " the " consumes the separator space, so " a "
    // no longer matches; both engines scan the same way (oracle parity).
    val (_, stops, _, _, _) = eval("x the a y")
    assert(stops === 1)
  }

  test("fingerprint normalizes case and outer whitespace") {
    val f1 = eval("  Hello World ")._5
    val f2 = eval("hello world")._5
    assert(f1 === f2)
  }

  test("cleaned strips urls, emails, digits") {
    val out = Seq("see https://x.io/a?b=1 or mail me@ex.com room 42")
      .toDF("t").select(TextOps.cleaned(col("t"))).head().getString(0)
    assert(!out.contains("https") && !out.contains("@") && !out.matches(".*[0-9].*"))
    assert(out.contains("see") && out.contains("room"))
  }
}
