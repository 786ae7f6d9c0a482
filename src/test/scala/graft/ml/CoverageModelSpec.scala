package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** §5.4 ML sanity (mirrors all coverages.R:209-231 as assertions): RF
  * beats the majority class on a separable synthetic coverage fixture;
  * importances sum to 1; confusion matrix rows sum to class counts.
  */
class CoverageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Separable synthetic: man coverage ⇔ defenders tight (small dist). */
  private lazy val labeled = {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val man = i % 2 == 0
      val base = if (man) 2.0 else 12.0
      val jitter = (i % 7) * 0.3
      (if (man) "Cover 1 Man" else "Cover 3 Zone",
        base + jitter, base * 0.8 + jitter, 4.0 + (i % 3))
    }
    rows.toDF("coverage", "dist_cb", "dist_fs", "n_db")
  }

  test("RF beats majority baseline on separable data (K1/K2)") {
    val (train, test) = CoverageModel.trainTestSplit(labeled)
    val fitted = CoverageModel.fit(train, numTrees = 20)
    val scored = fitted.predict(test)
    val acc = fitted.accuracy(scored)
    assert(acc > 0.9, s"accuracy $acc not > 0.9 on separable fixture")
  }

  test("feature importances sum to ~1 and name every feature (K4)") {
    val fitted = CoverageModel.fit(labeled, numTrees = 10)
    val imp = fitted.importances
    assert(imp.map(_._1).toSet === Set("dist_cb", "dist_fs", "n_db"))
    assert(math.abs(imp.map(_._2).sum - 1.0) < 1e-9)
  }

  test("fitted pipeline persists and reloads with identical predictions (production roundtrip)") {
    import org.apache.spark.ml.PipelineModel
    val fitted = CoverageModel.fit(labeled, numTrees = 10)
    val path = java.nio.file.Paths.get("target", "coverage-model").toAbsolutePath.toString
    fitted.model.write.overwrite().save(path)
    val reloaded = PipelineModel.load(path)
    val a = fitted.predict(labeled).select("coverage", "predicted_coverage")
    val b = reloaded.transform(labeled).select("coverage", "predicted_coverage")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("confusion matrix rows sum to class counts (K3)") {
    val fitted = CoverageModel.fit(labeled, numTrees = 10)
    val scored = fitted.predict(labeled)
    val cm = fitted.confusion(scored).collect()
    val classCounts = labeled.groupBy("coverage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    cm.foreach { row =>
      val label = row.getString(0)
      val rowSum = (1 until row.length).map(row.getLong).sum
      assert(rowSum === classCounts(label))
    }
  }
}
