package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property layer over the as-of join — the operator with the newest
  * codegen path gets the broadest input coverage: random probe/quote
  * sets (few keys to force collisions, duplicate and tied times, null
  * times) checked against a driver-side brute-force reference on every
  * variant (backward/forward × strict × tolerance), and the
  * merge-vs-broadcast implementation equivalence the q124 composition
  * promises when (key, time) is unique on the right.
  */
class AsOfPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  private val probeGen = Gen.listOfN(14, for {
    k <- Gen.oneOf("a", "b", "c")
    t <- Gen.option(Gen.choose(0L, 40L))
  } yield (k, t))

  private val quoteGen = Gen.listOfN(10, for {
    k <- Gen.oneOf("a", "b", "d")
    t <- Gen.option(Gen.choose(0L, 40L))
    v <- Gen.choose(0, 99)
  } yield (k, t, v.toLong))

  /** Brute-force reference: per probe, scan every quote. On right-side
    * time ties the merge retains the LAST row in (key, time, arrival)
    * sort order backward and the FIRST forward — tie-break on value
    * makes the expectation deterministic without assuming which.
    */
  private def reference(
      probes: Seq[(String, Option[Long])], quotes: Seq[(String, Option[Long], Long)],
      strict: Boolean, tol: Option[Long], fwd: Boolean): Set[(Int, Option[Long])] =
    probes.zipWithIndex.map { case ((pk, pt), pid) =>
      val best = pt match {
        case None => None
        case Some(t) =>
          val cands = quotes.flatMap {
            case (qk, Some(qt), qv) if qk == pk =>
              val inDir =
                if (fwd) { if (strict) qt > t else qt >= t }
                else { if (strict) qt < t else qt <= t }
              val inTol = tol.forall(x => (if (fwd) qt - t else t - qt) <= x)
              if (inDir && inTol) Some((qt, qv)) else None
            case _ => None
          }
          if (cands.isEmpty) None
          else Some(if (fwd) cands.minBy(_._1)._1 else cands.maxBy(_._1)._1)
      }
      (pid, best)
    }.toSet

  test("asofJoin matches brute force on random inputs, every variant") {
    val variants = for {
      strict <- Seq(false, true); fwd <- Seq(false, true)
      tol <- Seq(None, Some(7L))
    } yield (strict, tol, fwd)
    check(Prop.forAll(probeGen, quoteGen) { (ps, qs) =>
      (ps.nonEmpty && qs.nonEmpty) ==> {
        val pdf = ps.zipWithIndex.map { case ((k, t), i) => (i, k, t) }
          .toDF("pid", "kk", "pt")
        val qdf = qs.toDF("kk", "qt", "qv")
        variants.forall { case (strict, tol, fwd) =>
          val got = AsOfJoinOps.asofJoin(pdf, qdf, Seq("kk"), "pt", "qt", strict, tol, fwd)
            .select(col("pid"), col("qt")).collect()
            .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
          got == reference(ps, qs, strict, tol, fwd)
        }
      }
    })
  }

  test("salted as-of is row-identical to the unsalted operator") {
    val variants = Seq((false, None, false), (true, Some(7L), false), (false, None, true))
    check(Prop.forAll(probeGen, quoteGen) { (ps, qs) =>
      (ps.nonEmpty && qs.nonEmpty) ==> {
        val pdf = ps.zipWithIndex.map { case ((k, t), i) => (i, k, t) }
          .toDF("pid", "kk", "pt")
        val qdf = qs.toDF("kk", "qt", "qv")
        variants.forall { case (strict, tol, fwd) =>
          def norm(df: org.apache.spark.sql.DataFrame): Set[(Int, Option[Long])] =
            df.select(col("pid"), col("qt")).collect()
              .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
          val plain = norm(AsOfJoinOps.asofJoin(pdf, qdf, Seq("kk"), "pt", "qt", strict, tol, fwd))
          val salted = norm(AsOfJoinOps.asofJoinSalted(pdf, qdf, Seq("kk"), "pt", "qt",
            strict, tol, fwd, saltBuckets = 3))
          // saltOn with a per-row-unique column (the tied-timestamp
          // degeneracy escape hatch) must also be row-identical
          val saltedById = norm(AsOfJoinOps.asofJoinSalted(pdf, qdf, Seq("kk"), "pt", "qt",
            strict, tol, fwd, saltBuckets = 3, saltOn = Seq("pt", "pid")))
          plain == salted && plain == saltedById
        }
      }
    })
  }

  test("merge exec and broadcast composition agree when (key, time) is unique on the right") {
    val uniqueQuoteGen = quoteGen.map(_.distinctBy(q => (q._1, q._2)))
    val variants = for {
      strict <- Seq(false, true); fwd <- Seq(false, true)
      tol <- Seq(None, Some(7L))
    } yield (strict, tol, fwd)
    check(Prop.forAll(probeGen, uniqueQuoteGen) { (ps, qs) =>
      (ps.nonEmpty && qs.nonEmpty) ==> {
        val pdf = ps.zipWithIndex.map { case ((k, t), i) => (i, k, t) }
          .toDF("pid", "kk", "pt")
        val qdf = qs.toDF("kk", "qt", "qv")
        variants.forall { case (strict, tol, fwd) =>
          def norm(df: org.apache.spark.sql.DataFrame): Set[(Int, Option[Long], Option[Long])] =
            df.collect().map(r => (
              r.getInt(r.fieldIndex("pid")),
              if (r.isNullAt(r.fieldIndex("qt"))) None else Some(r.getLong(r.fieldIndex("qt"))),
              if (r.isNullAt(r.fieldIndex("qv"))) None else Some(r.getLong(r.fieldIndex("qv"))))).toSet
          val merge = norm(AsOfJoinOps.asofJoin(pdf, qdf, Seq("kk"), "pt", "qt", strict, tol, fwd)
            .select(col("pid"), col("qt"), col("qv")))
          val bcast = norm(AsOfJoinOps.asofJoinBroadcast(pdf, qdf, Seq("kk"), "pt", "qt", strict, tol, fwd)
            .select(col("pid"), col("qt"), col("qv")))
          merge == bcast
        }
      }
    })
  }
}
