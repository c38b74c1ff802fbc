package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram-Jaccard near-dup detection.
  *
  * Scale design: every method is a bounded number of shuffles on keys chosen
  * to stay small (hash buckets / band signatures), never an unblocked n^2
  * self-join. Candidate generation goes through LSH band buckets; only
  * bucket-collisions are verified with the exact measure. All hashing is
  * xxhash64 (native, codegen'd).
  */
object Dedup {

  // ---------------- exact ----------------

  /** Exact dedup on `keyCols`: keeps the row with the smallest `tiebreaker`
    * per duplicate group. One shuffle on the group key hash. */
  def dedupExact(df: DataFrame, keyCols: Seq[String], tiebreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tiebreaker))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Duplicate-group summary: one row per distinct key with the kept id and
    * the group size (what you report after a dedup pass). */
  def duplicateGroups(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  // ---------------- shingles + MinHash ----------------

  /** Word n-gram shingles of the lowercased text (distinct). */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** Character n-gram shingles (distinct). */
  def charShingles(text: Column, n: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => substring(text, i, lit(n))))

  /** MinHash signature: `numHashes` independent permutations simulated by
    * salted xxhash64, each taking the min over the shingle set. */
  def minHashSignature(shingles: Column, numHashes: Int = 128): Column =
    minHashSignatureFromHashes(transform(shingles, s => xxhash64(s)), numHashes)

  /** MinHash signature over PRE-HASHED shingles: each permutation re-mixes
    * the 8-byte long instead of re-hashing the full shingle string — hash
    * each string once, mix 128 times (the standard one-hash minhash layout).
    * Callers should materialize the hashed-shingle array as its own column so
    * it is computed once, not once per permutation lambda. */
  def minHashSignatureFromHashes(shingleHashes: Column, numHashes: Int = 128): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleHashes, h => xxhash64(h, i))))

  /** Estimated Jaccard from two MinHash signatures. */
  def minHashSimilarity(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x)).cast("double") /
      size(sigA).cast("double")

  /** Exact Jaccard of two (distinct) shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: shingle -> minhash(numBands*rowsPerBand) -> per-band bucket
    * key -> self-join per (band, bucket) -> exact-Jaccard verify >= threshold.
    * The self-join is per-bucket (tiny groups), so the shuffle key cardinality
    * is ~numBands * numDocs and no quadratic blowup occurs; at 100 TB this is
    * the textbook dedup layout (band buckets ~ constant size, AQE handles the
    * occasional hot bucket).
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, distinct.
    */
  def minHashLSH(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numBands: Int = 16,
      rowsPerBand: Int = 8,
      threshold: Double = 0.6
  ): DataFrame = {
    val numHashes = numBands * rowsPerBand
    // repartition: parallelize past a single-file scan. localCheckpoint: a
    // planner barrier — without it CollapseProject substitutes the shingle
    // expression (regex!) into all 128 hash lambdas, exploding the per-row
    // cost; it also materializes signatures once for the three downstream uses
    val withSig = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .repartition(col("id"))
      .withColumn("shingles", wordShingles(col("text"), shingleSize))
      .filter(size(col("shingles")) > 0)
      // hash every shingle string ONCE; the 128 permutations re-mix longs
      // (CollapseProject keeps multi-referenced non-cheap aliases intact,
      // so this column is not inlined into the permutation lambdas)
      .withColumn("__sh_hashes", transform(col("shingles"), s => xxhash64(s)))
      .withColumn("sig", minHashSignatureFromHashes(col("__sh_hashes"), numHashes))
      .drop("text", "__sh_hashes")
      .localCheckpoint(false)
    // band key = hash of the band's slice of the signature
    val bandSigs = (0 until numBands).map { b =>
      xxhash64(concat_ws("_", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))
    }
    // candidates carry ids only — shingle arrays are joined back AFTER the
    // bucket join + distinct, so big arrays never ride the candidate shuffle
    val banded = withSig
      .select(col("id"), posexplode(array(bandSigs: _*)).as(Seq("band", "bucket")))
    val left = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val right = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    // shuffle_hash hint: without it Spark may broadcast one side, which
    // would build the whole minhash subtree single-threaded in the driver
    val candidates = left.hint("shuffle_hash").join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct() // a pair may collide in several bands
    val shA = withSig.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val shB = withSig.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates.join(shA, "id_a").join(shB, "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash of the token multiset: bit b of the result is 1 iff the
    * sum over tokens of sign(bit b of xxhash64(token)) is positive. Pure
    * higher-order expressions (no UDF). */
  def simHash(text: Column): Column =
    simHashFromHashes(transform(TextAnalysis.tokens(text), t => xxhash64(t)))

  /** SimHash over PRE-HASHED tokens. The 64 bit-sum aggregates each
    * reference the hash array; callers should materialize it as its own
    * column so tokenization+hashing run once, not 64 times (CollapseProject
    * keeps multi-referenced non-cheap aliases intact). */
  def simHashFromHashes(tokenHashes: Column): Column =
    // Scala-side loop over the 64 bits (shift amounts must be literal Ints)
    (0 until 64).map { b =>
      when(
        aggregate(tokenHashes, lit(0L),
          (s, h) => s + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two 64-bit SimHashes. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 4 16-bit chunks (a pair within Hamming
    * distance <= 3 of 64 bits must agree on at least one chunk — pigeonhole),
    * verify with exact Hamming distance. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .repartition(col("id"))
      .withColumn("__th", transform(TextAnalysis.tokens(col("text")), t => xxhash64(t)))
      .select(col("id"), simHashFromHashes(col("__th")).as("sig"))
      .localCheckpoint(false)
    val chunks = (0 until 4).map(c => shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL))
    val chunked = sigs.select(col("id"), col("sig"),
      posexplode(array(chunks: _*)).as(Seq("chunk", "key")))
    val l = chunked.select(col("chunk"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.hint("shuffle_hash").join(r, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
      .withColumn("hamming", hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---------------- n-gram Jaccard (blocked exact) ----------------

  /** Exact character-n-gram Jaccard pairs above `threshold`, blocked by a key
    * (e.g. language).
    *
    * Candidate generation uses prefix filtering (AllPairs / SSJoin): order
    * every document's gram set by ascending global document frequency
    * (rarest first) and explode only the first
    * floor((1-t)*|A|)+1 grams — two sets with J >= t must share at least one
    * prefix gram under any consistent global order, so there are NO false
    * negatives and the final output is identical to the naive quadratic join.
    * Rare-first ordering keeps the per-gram buckets small, so the candidate
    * join stays near-linear instead of quadratic per block — the property
    * that makes this run on a 100 TB corpus. Candidates (plus an exact-safe
    * size-ratio check: t*|A| <= |B| <= |A|/t) are verified with one exact
    * intersection; |A ∪ B| = |A| + |B| - |A ∩ B|. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val g = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      charShingles(lower(col(textCol)), n).as("grams"))
      .repartition(col("id"))
      .withColumn("sz", size(col("grams")))
      .localCheckpoint(false) // barrier + reuse (gram-df pass and re-order pass)

    // global document frequency per gram -> rare-first total order (df, gram)
    val gramDf = g.select(col("id"), explode(col("grams")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
    val ordered = g.select(col("block"), col("id"), col("sz"), explode(col("grams")).as("gram"))
      .join(gramDf, "gram")
      .groupBy("block", "id", "sz")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("gram")))),
        s => s.getField("gram")).as("grams"))
      .localCheckpoint(false) // reused by prefixes + both verify sides
    val prefixSize = (floor(col("sz") * (1 - threshold)) + 1).cast("int")
    val prefixes = ordered.select(col("block"), col("id"), col("sz"),
      explode(slice(col("grams"), lit(1), prefixSize)).as("gram"))

    // candidate pairs: share >= 1 prefix gram within the block + size ratio
    val pa = prefixes.select(col("block"), col("gram"), col("id").as("id_a"), col("sz").as("sz_a"))
    val pb = prefixes.select(col("block"), col("gram"), col("id").as("id_b"), col("sz").as("sz_b"))
    val candidates = pa.hint("shuffle_hash").join(pb,
        pa("block") === pb("block") && pa("gram") === pb("gram") &&
          col("id_a") < col("id_b") &&
          col("sz_b") * threshold <= col("sz_a") && col("sz_a") * threshold <= col("sz_b"))
      .select("id_a", "id_b").distinct()

    // exact verify on the (small) candidate set only
    val ga = ordered.select(col("id").as("id_a"), col("grams").as("g_a"), col("sz").as("sz_a"))
    val gb = ordered.select(col("id").as("id_b"), col("grams").as("g_b"), col("sz").as("sz_b"))
    val inter = size(array_intersect(col("g_a"), col("g_b"))).cast("double")
    val unionSz = (col("sz_a") + col("sz_b")).cast("double") - inter
    candidates.join(ga, "id_a").join(gb, "id_b")
      .withColumn("jaccard", when(unionSz === 0.0, lit(0.0)).otherwise(inter / unionSz))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------------- embedding near-dup ----------------

  /** Embedding-cosine near-duplicate pairs via banded random-hyperplane LSH
    * + exact cosine verify. A pair is a candidate if ANY of the `bands`
    * signatures (of `planes` sign bits each) collides — with b bands of p
    * planes, a pair at angle theta survives with prob
    * 1 - (1 - (1 - theta/pi)^p)^b, so high-cosine pairs are found with
    * near-certainty while far pairs rarely collide. Candidates carry ids
    * only through the bucket join and the distinct; vectors are joined back
    * for the exact verify (same layout as [[minHashLSH]]), so embeddings
    * never ride the candidate shuffle. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 8, bands: Int = 8): DataFrame = {
    val s = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val sigs = (0 until bands).map(b =>
      xxhash64(Similarity.hyperplaneSignatureBand(col("vec"), planes, b), lit(b)))
    val banded = s.select(col("id"),
      posexplode(array(sigs: _*)).as(Seq("band", "bucket")))
      .select("id", "band", "bucket")
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = l.hint("shuffle_hash").join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = s.select(col("id").as("id_a"), col("vec").as("v_a"))
    val vb = s.select(col("id").as("id_b"), col("vec").as("v_b"))
    candidates
      .join(va.hint("shuffle_hash"), "id_a")
      .join(vb.hint("shuffle_hash"), "id_b")
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
