package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Scale-technique demonstrations (SURVEY.md §4): salting for hot-key
  * aggregation skew, and bucketed tables for shuffle-free co-located
  * joins — the 100 TB answers to "one task gets the viral key" and
  * "the big fact⋈fact join reshuffles every query".
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedAgg equals the direct aggregation on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows hit one hot key — the salted plan splits that key
    val rows = (1 to 2000).map(i => (if (i % 10 == 0) s"cold_${i % 50}" else "hot", i.toLong))
    val df = rows.toDF("k", "v")
    val salted = SkewOps.saltedAgg(Seq("k"), saltBuckets = 8,
      Map("sum_v" -> col("v")))(df)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("saltedJoin equals the plain equi-join at several bucket counts") {
    import spark.implicits._
    // hot key 1 carries 90% of the fact side
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) (i % 7).toLong + 2 else 1L, i.toLong))
      .toDF("fk", "v")
    val dim = (1 to 10).map(i => (i.toLong, s"d$i")).toDF("dk", "name")
    val direct = fact.join(dim, col("fk") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (buckets <- Seq(1, 3, 8)) {
      val salted = SkewOps.saltedJoin(fact, dim, "fk", "dk", buckets, Seq("v"))
        .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(salted === direct, s"saltBuckets=$buckets")
    }
  }

  test("bucketed tables join without an exchange (co-located fact join)") {
    val wh = java.nio.file.Paths.get("target", "bucketing-test").toAbsolutePath
    // idempotence: the metastore (fresh derby per JVM) forgets the tables
    // but their directories survive — clear both before re-creating
    spark.sql("DROP TABLE IF EXISTS graft_buckets.orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_buckets.lineitem_b")
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
    rm(wh)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_buckets LOCATION '$wh'")
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_buckets.orders_b")
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_buckets.lineitem_b")
    val joined = spark.table("graft_buckets.lineitem_b")
      .join(spark.table("graft_buckets.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key: no shuffle exchange at all
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(2000)}")
    assert(joined.count() === Tables.lineitem(spark, sf).count())
  }
}
