package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SURVEY.md §5.3 property layer: invariants over generated inputs
  * (kept to few-iteration Spark jobs — each case is a tiny local plan).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(5), p)
    assert(res.passed, res.status.toString)
  }

  test("pivotWide preserves group count (H1)") {
    val gen = Gen.listOfN(12, for {
      g <- Gen.choose(1, 3)
      pos <- Gen.oneOf("CB", "FS", "LB")
      v <- Gen.choose(0.0, 10.0)
    } yield (g, pos, v))
    check(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("g", "position", "s")
        val wide = RelationalOps.pivotWide(Seq("g"), "position", Seq("CB", "FS", "LB"), Seq("s"),
          orderCol = "s")(df)
        wide.count() == rows.map(_._1).distinct.size
      }
    })
  }

  test("modeByGroup result is a member of the group's values (D4)") {
    val gen = Gen.listOfN(10, for {
      g <- Gen.choose(1, 2)
      v <- Gen.oneOf("a", "b", "c")
    } yield (g, v))
    check(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("g", "v")
        val modes = RelationalOps.modeByGroup(Seq("g"), "v", "m")(df).collect()
        modes.forall { r =>
          val g = r.getInt(0)
          rows.filter(_._1 == g).map(_._2).contains(r.getString(1))
        }
      }
    })
  }

  test("teamControl sigmoid output is strictly inside (0,1) (I5)") {
    val gen = Gen.listOfN(8, for {
      cell <- Gen.choose(0, 2)
      infl <- Gen.choose(0.0, 1.0)
      sgn <- Gen.oneOf(1.0, -1.0)
    } yield (cell.toDouble, 0.0, infl, sgn))
    check(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("grid_x", "grid_y", "influence", "sgn")
        FieldControl.teamControl(Seq("grid_x", "grid_y"), col("influence"), col("sgn"))(df)
          .select("control").collect()
          .forall { r => val v = r.getDouble(0); v > 0.0 && v < 1.0 }
      }
    })
  }

  test("topKPerGroup never exceeds k per group and keeps the max (E1/F2)") {
    val gen = Gen.listOfN(15, for {
      g <- Gen.choose(1, 3)
      v <- Gen.choose(-100.0, 100.0)
    } yield (g, v))
    check(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("g", "v")
        val top = RelationalOps.topKPerGroup(Seq("g"), Seq(col("v").desc), 2)(df)
          .collect().map(r => (r.getInt(0), r.getDouble(1)))
        val byG = top.groupBy(_._1)
        byG.forall(_._2.length <= 2) &&
          byG.forall { case (g, vs) =>
            vs.map(_._2).max == rows.filter(_._1 == g).map(_._2).max
          }
      }
    })
  }
}
