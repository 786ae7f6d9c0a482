package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** §2.A6: sink breadth — the engine's outputs roundtrip through the
  * columnar and text formats Spark ships (the reference's only sinks are
  * plots; ours are files, per the driver contract).
  */
class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val out = Paths.get("target", "sink-test").toAbsolutePath.toString

  private lazy val src = Tables.nation(spark, sf)

  private def roundtrip(fmt: String): Unit = {
    val path = s"$out/$fmt"
    src.write.mode("overwrite").format(fmt).save(path)
    val back = spark.read.format(fmt)
      .schema(src.schema) // text formats need the schema restated
      .load(path)
    assert(back.count() === src.count())
    val a = src.orderBy("n_nationkey").collect().toSeq
    val b = back.orderBy("n_nationkey").collect().toSeq
    assert(a === b)
  }

  test("parquet sink roundtrips")(roundtrip("parquet"))
  test("orc sink roundtrips")(roundtrip("orc"))
  test("json sink roundtrips")(roundtrip("json"))
  test("csv sink roundtrips") {
    val path = s"$out/csv"
    src.write.mode("overwrite").option("header", "true").csv(path)
    val back = spark.read.schema(src.schema).option("header", "true").csv(path)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("partitioned parquet sink prunes on read (partition pruning)") {
    val path = s"$out/partitioned"
    Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(path)
    val one = spark.read.parquet(path).filter(col("order_year") === 1997)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"))
    assert(one.count() > 0)
  }
}
