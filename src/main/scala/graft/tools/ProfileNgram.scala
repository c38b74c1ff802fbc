package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-level attribution for the ngram-Jaccard ladder: candidate-pair
  * and prefix-row counts per scale rung, so super-linear bench growth can
  * be pinned to the stage that generates it (evidence tooling only).
  *
  * Usage: runMain graft.tools.ProfileNgram <sfDir> [threshold]
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.8
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("profile-ngram").getOrCreate()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("head", lower(substring(col("text"), 1, 100)))
    val g = Dedup.ngramGramsStage(docs, "doc_id", "head", "lang", 3)
    val ordered = Dedup.ngramOrderedStage(g)
    val nDocs = ordered.count()
    val longPrefix = (floor(col("sz") * (1 - threshold)) + 1).cast("int")
    val shortPrefix =
      (floor(col("sz") * ((1 - threshold) / (1 + threshold))) + 1).cast("int")
    val prefixes = ordered.select(col("block"), col("id"),
      posexplode(slice(col("grams"), lit(1), longPrefix)).as(Seq("pos", "gram")))
    val nPrefix = prefixes.count()
    // candidate volume BEFORE filters/distinct, for BOTH join shapes: the
    // symmetric long x long join (pre-round-8) and the asymmetric
    // short x long join ngramCandidatesStage now runs
    val shorts = ordered.select(col("block"), col("id"),
      posexplode(slice(col("grams"), lit(1), shortPrefix)).as(Seq("pos", "gram")))
    val pa = prefixes.select(col("block"), col("gram"), col("id").as("id_a"))
    val pb = prefixes.select(col("block"), col("gram"), col("id").as("id_b"))
    val rawPairs = pa.hint("shuffle_hash").join(pb, Seq("block", "gram"))
      .filter(col("id_a") < col("id_b")).count()
    val sz = ordered.select(col("id"), col("sz"))
    val rawAsym = shorts.select(col("block"), col("gram"), col("id").as("id_a"))
      .join(sz.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .hint("shuffle_hash").join(pb, Seq("block", "gram"))
      .join(sz.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .filter(col("sz_a") < col("sz_b") ||
        (col("sz_a") === col("sz_b") && col("id_a") < col("id_b"))).count()
    val cand = Dedup.ngramCandidatesStage(ordered, threshold).count()
    // the SAME asymmetric join minus the POSITIONAL conjunct: isolates the
    // PPJoin positional filter's own cut of the post-distinct candidate
    // set (the size-ratio and direction filters still apply)
    val paC = ordered.select(col("block"), col("id").as("id_a"),
      col("sz").as("sz_a"),
      posexplode(slice(col("grams"), lit(1), shortPrefix)).as(Seq("pos_a", "gram")))
    val pbC = ordered.select(col("block"), col("id").as("id_b"),
      col("sz").as("sz_b"),
      posexplode(slice(col("grams"), lit(1), longPrefix)).as(Seq("pos_b", "gram")))
    val candNoPos = paC.hint("shuffle_hash").join(pbC,
        paC("block") === pbC("block") && paC("gram") === pbC("gram") &&
          (col("sz_a") < col("sz_b") ||
            (col("sz_a") === col("sz_b") && col("id_a") < col("id_b"))) &&
          col("sz_b") * threshold <= col("sz_a"))
      .select(least(col("id_a"), col("id_b")).as("ida"),
        greatest(col("id_a"), col("id_b")).as("idb")).distinct().count()
    // top prefix-gram groups: the quadratic drivers
    val hot = prefixes.groupBy("block", "gram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(5).collect()
      .map(r => s"${r.getLong(2)}").mkString(",")
    println(s"[profile-ngram] dir=$dir docs=$nDocs prefixRows=$nPrefix " +
      s"rawJoinPairs=$rawPairs rawAsymPairs=$rawAsym candidates=$cand " +
      s"candidatesNoPositional=$candNoPos topPrefixGroupSizes=$hot")
    spark.stop()
  }
}
