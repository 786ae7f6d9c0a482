package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = {
    val d = Paths.get("target", "fixture-sources")
    Files.createDirectories(d)
    d
  }

  test("csv glob scan unions weekly files in one pass (A1/A3)") {
    // two "weekly" files, same schema — the reference's bind_rows loop
    Files.writeString(dir.resolve("week1.csv"), "gameId,x\n1,10.5\n1,11.0\n")
    Files.writeString(dir.resolve("week2.csv"), "gameId,x\n2,20.0\n")
    val schema = StructType(Seq(
      StructField("gameId", LongType), StructField("x", DoubleType)))
    val df = TextSources.csvGlob(spark, schema, dir.resolve("week*.csv").toString)
    assert(df.count() === 3)
    assert(df.schema === schema)
  }

  test("tsv fixture scan (A5 — the remote team-colors TSV, shipped local)") {
    Files.writeString(dir.resolve("colors.tsv"), "teams\tcolor1\tcolor2\nDET\t#0076b6\t#b0b7bc\n")
    val schema = StructType(Seq(
      StructField("teams", StringType), StructField("color1", StringType),
      StructField("color2", StringType)))
    val df = TextSources.tsv(spark, schema, dir.resolve("colors.tsv").toString)
    val r = df.head()
    assert(r.getString(0) === "DET" && r.getString(1) === "#0076b6")
  }

  test("malformed CSV tolerance: bad values null out, rows survive (A1 robustness, pinned)") {
    // Pins the engine's ingest contract under Spark 4 + non-ANSI
    // (R-like) semantics: unparseable values become nulls, short rows
    // pad with nulls, extra tokens truncate — no row loss, so malformed
    // upstream data degrades to nulls a filter can audit (q42 profiling).
    val schema = StructType(Seq(
      StructField("gameId", LongType), StructField("x", DoubleType)))
    Files.writeString(dir.resolve("bad_type.csv"),
      "gameId,x\n1,10.5\nnot_a_number,oops\n2\n3,30.0,EXTRA\n")
    val df = spark.read.schema(schema).option("header", "true")
      .csv(dir.resolve("bad_type.csv").toString)
    assert(df.count() === 4)
    assert(df.filter(df("gameId").isNull).count() === 1)  // type failure → null
    assert(df.filter(df("x").isNull).count() === 2)       // type failure + short row
    assert(df.filter(df("gameId") === 3L && df("x") === 30.0).count() === 1) // extra token truncated
  }

  test("json-lines scan with explicit schema") {
    Files.writeString(dir.resolve("ev.jsonl"), """{"k":1,"v":"a"}""" + "\n" + """{"k":2,"v":"b"}""" + "\n")
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val df = TextSources.jsonLines(spark, schema, dir.resolve("ev.jsonl").toString)
    assert(df.count() === 2)
  }
}
