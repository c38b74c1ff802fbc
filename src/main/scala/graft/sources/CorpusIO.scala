package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Unified corpus IO: one schema-explicit entry point per supported format,
  * so a pipeline's read/write layer is declared once and stays swappable.
  *
  * Formats: `parquet` (columnar — column pruning + predicate pushdown reach
  * the scan), `csv` (header on by default), `jsonl` (JSON Lines), `text`
  * (one document per line, single `value` column), `orc`.
  *
  * Scale notes, encoded as defaults rather than prose:
  *  - reads NEVER infer schemas on text formats (an inference pass is a full
  *    extra scan of the corpus at 100 TB) — csv/jsonl require an explicit
  *    schema;
  *  - `maxRecordsPerFile` bounds output file sizes independent of partition
  *    count, the knob that keeps downstream scan parallelism healthy;
  *  - `partitionBy` writes hive-style directories so downstream reads prune
  *    partitions from the path, not the footer.
  */
object CorpusIO {

  val formats: Set[String] = Set("parquet", "orc", "csv", "jsonl", "text")

  def read(
      spark: SparkSession,
      path: String,
      format: String = "parquet",
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    require(formats.contains(format), s"unsupported format '$format' (one of $formats)")
    val needsSchema = format == "csv" || format == "jsonl"
    require(!needsSchema || schema.isDefined,
      s"$format requires an explicit schema: inference costs a full extra pass over the corpus")
    val base = spark.read
    val withSchema = schema.map(base.schema).getOrElse(base)
    // malformed-line policy: FAILFAST by default — Spark's PERMISSIVE
    // default turns every unparseable csv/jsonl line into an all-null row
    // SILENTLY, and at corpus scale that is wrong counts, not a warning.
    // Callers that genuinely want best-effort ingest override with
    // options("mode" -> "PERMISSIVE") deliberately (the SaveMode.
    // ErrorIfExists philosophy of write(), applied to reads).
    val parseDefaults =
      if (needsSchema) Map("mode" -> "FAILFAST") else Map.empty[String, String]
    val reader =
      if (format == "csv")
        withSchema.options(parseDefaults ++ Map("header" -> "true") ++ options)
      else withSchema.options(parseDefaults ++ options)
    format match {
      case "parquet" => reader.parquet(path)
      case "orc"     => reader.orc(path)
      case "csv"     => reader.csv(path)
      case "jsonl"   => reader.json(path)
      case "text"    => reader.text(path)
    }
  }

  def write(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L,
      // Spark's own safe default: silently replacing an existing dataset
      // from a shared IO helper (a mistyped path pointing at a source!)
      // is data destruction — callers that re-run into scratch dirs pass
      // Overwrite explicitly
      mode: SaveMode = SaveMode.ErrorIfExists,
      options: Map[String, String] = Map.empty
  ): Unit = {
    require(formats.contains(format), s"unsupported format '$format' (one of $formats)")
    var w = df.write.mode(mode)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w = format match {
      case "csv" => w.options(Map("header" -> "true") ++ options)
      case _     => w.options(options)
    }
    format match {
      case "parquet" => w.parquet(path)
      case "orc"     => w.orc(path)
      case "csv"     => w.csv(path)
      case "jsonl"   => w.json(path)
      case "text"    => w.text(path)
    }
  }
}
