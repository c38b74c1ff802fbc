package graft.sources

import graft.spark.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpDir(tag: String) = {
    // a fresh NOT-YET-EXISTING path: CorpusIO.write defaults to Spark's
    // safe ErrorIfExists, which rejects even an empty pre-created dir
    val d = java.nio.file.Files.createTempDirectory(s"corpus_io_$tag")
    java.nio.file.Files.delete(d)
    d.toString
  }

  test("csv/jsonl/orc roundtrip the parquet fixture exactly") {
    val region = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val schema = region.schema
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val expected = rows(region)
    for (fmt <- Seq("csv", "jsonl", "orc")) {
      val dir = tmpDir(fmt)
      CorpusIO.write(region, dir, fmt)
      val back = CorpusIO.read(spark, dir, fmt,
        schema = if (fmt == "orc") None else Some(schema))
      assert(rows(back.select(region.columns.map(col): _*)) == expected, fmt)
    }
  }

  test("text format: one document per line, single value column") {
    val dir = tmpDir("text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(regexp_replace(col("text"), "[\\n\\r]", " ").as("value"))
    CorpusIO.write(docs, dir, "text")
    val back = CorpusIO.read(spark, dir, "text")
    assert(back.columns.toSeq == Seq("value"))
    assert(back.count() == docs.count())
  }

  test("schema inference on csv/jsonl is refused (full-scan cost at 100 TB)") {
    val ex = intercept[IllegalArgumentException] {
      CorpusIO.read(spark, "/tmp/whatever", "csv")
    }
    assert(ex.getMessage.contains("explicit schema"))
  }

  test("parquet read keeps pushdown: filter and projection reach the scan") {
    val dir = tmpDir("pushdown")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    CorpusIO.write(docs, dir, "parquet")
    val plan = CorpusIO.read(spark, dir, "parquet")
      .filter(col("lang") === "en").select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), plan)
  }

  test("partitioned write prunes partitions from the path on read") {
    val dir = tmpDir("partitioned")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    CorpusIO.write(docs, dir, "parquet", partitionBy = Seq("lang"))
    val langs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langs.nonEmpty && langs.forall(_.startsWith("lang=")))
    // partition pruning: only the lang=en directory is scanned
    val pruned = CorpusIO.read(spark, dir, "parquet").filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(pruned.count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("maxRecordsPerFile bounds output file sizes") {
    val dir = tmpDir("maxrec")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(1) // one task; the cap must still split the output
    val n = docs.count()
    CorpusIO.write(docs, dir, "parquet", maxRecordsPerFile = 10L)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files.size >= (n / 10L).toInt, s"expected >= ${n / 10} files, got ${files.size}")
    assert(CorpusIO.read(spark, dir, "parquet").count() == n)
  }
}
