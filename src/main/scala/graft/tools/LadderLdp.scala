package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Domain-size ladder for the LOCAL-DP frequency mechanisms (r16): the
  * same per-unit report set estimated over domains of k = 100 / 10,000 /
  * 100,000 values. What the rungs must show: OLH wall grows with the
  * CANDIDATE GRID (k x observed seeds — the estimation side), never with
  * n x k, and the per-candidate cost stays flat-to-falling; the unary
  * arm (run at k = 100 and 10,000 only) grows with n x k BITS per
  * report — at k = 100,000 it would explode ~10^10 exploded rows, which
  * is precisely the mechanism gap OLH closes (one bucket per report at
  * any k). Evidence tooling only — never a gate input.
  *
  * Usage: runMain graft.tools.LadderLdp [sfDir] */
object LadderLdp {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .appName("ladder-ldp").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = spark.read.parquet(s"$sfDir/events.parquet")

    for (k <- Seq(100, 10000, 100000)) {
      // synthetic closed domain of k values; each unit's value derives
      // deterministically from its id so every rung sees the same units
      val domain = (0 until k).map(i => f"v$i%06d")
      val valCol = format_string("v%06d",
        pmod(col("user_id") * 48271L + 12345L, lit(k.toLong)))
      val arms: Seq[(String, () => Long)] = Seq(
        "olh" -> (() => graft.spark.LocalDP.ldpFrequencyOLH(events,
          "user_id", valCol, domain, epsilon = 1.0,
          noise = graft.core.NoiseSource.Secure, seedSpace = 256).count())
      ) ++ (if (k <= 10000) Seq(
        "unary" -> (() => graft.spark.LocalDP.ldpFrequency(events,
          "user_id", valCol, domain, epsilon = 1.0,
          noise = graft.core.NoiseSource.Secure).count())
      ) else Nil)
      for ((arm, run) <- arms) {
        val reps = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = run()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val best = reps.map(_._1).min
        println(f"[ladder-ldp] k=$k%6d arm=$arm%-5s rows=${reps.head._2}%7d " +
          f"best=$best%7.2fs perCandidateUs=${best * 1e6 / k}%9.2f")
      }
    }

    // heavy-hitter depth rung (r17): hexLen 8 / rounds 4 — the
    // GROUP-SPLIT VARIANCE story: each round sees only n/rounds units,
    // so deeper walks trade per-level candidate cost (k * 16^2 per
    // level, 4 levels) against a 1/4-size estimating group per level.
    // 3 planted heavies on 60% of units, singleton tail; report wall
    // time, discovery recall, and the per-round floor from the explain.
    {
      val planted = Seq("alpha", "beta", "gamma")
        .map(w => graft.spark.LocalDP.md5Word(w.hashCode.toLong))
        .map(h => f"${h & 0xffffffffL}%08x")
      val hv = expr(
        s"""CASE WHEN user_id % 10 < 6 THEN
              element_at(array(${planted.map(p => s"'$p'").mkString(",")}),
                CAST(user_id % 3 + 1 AS INT))
            ELSE substr(md5(CAST(user_id AS STRING)), 1, 8) END""")
      val nUnits = events.select(countDistinct(col("user_id"))).head().getLong(0)
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val out = graft.spark.LocalDP.ldpHeavyHitters(
          events.select(col("user_id"), hv.as("hv")), "user_id", col("hv"),
          hexLen = 8, epsilon = 4.0,
          noise = graft.core.NoiseSource.Secure, k = 8, rounds = 4)
          .collect().map(_.getString(0)).toSet
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        ((System.nanoTime() - t0) / 1e9, planted.count(out.contains))
      }
      println(f"[ladder-ldp] hh hexLen=8 rounds=4 n=$nUnits best=" +
        f"${reps.map(_._1).min}%7.2fs recall=${reps.map(_._2).max}/3")
      println(graft.spark.LocalDP.explainHeavyHitters(hexLen = 8,
        epsilon = 4.0, nUnits = nUnits, k = 8, rounds = 4))
    }

    // LDP range-tree bins ladder (r17): wall must track the GENERATED
    // grid ((2*bins-1) x per-level seeds), never n x bins — the same
    // estimation-side-bound story as the OLH domain ladder above
    for (bins <- Seq(64, 1024, 4096)) {
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.spark.LocalDP.ldpRangeTree(events, "user_id",
          col("value"), lo = 0.0, hi = 1000.0, bins = bins,
          epsilon = 4.0, noise = graft.core.NoiseSource.Secure).count()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = reps.map(_._1).min
      println(f"[ladder-ldp] rangeTree bins=$bins%5d nodes=${reps.head._2}%6d " +
        f"best=$best%7.2fs perNodeUs=${best * 1e6 / (2 * bins - 1)}%9.2f")
    }
    spark.stop()
  }
}
