package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics over corpus-derived edges (domain link graphs,
  * citation graphs, doc-reference graphs). The iterative state is one
  * (node, rank) row per node — the MapReduce-style layout that scales to
  * billion-node graphs: no driver-side adjacency, every step a join +
  * aggregate the optimizer lays out as shuffle-hash exchanges.
  *
  * Reference scope note: PipelineDP has no graph tier; this extends the
  * training-data-pipeline operator set (domain authority weighting for
  * crawl filtering, cf. the Common Crawl harmonic-centrality ranking).
  */
object GraphOps {

  /** Exact integer floor-division as the IEEE double expression
    * `floor(a / b)` — the ONE division form that an independent SQL engine
    * replays bit-for-bit. Exact (true floor) whenever `quotient * b <
    * 2^53`; every division in [[pageRank]] keeps numerators <= ~1.7e13,
    * far under the bound. */
  private def ldiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  /** PageRank in PORTABLE fixed-point arithmetic: ranks are longs scaled
    * by `scale` (default 1e12), every step integer-exact and
    * order-independent (long sums + floor divisions only), so the whole
    * `iters`-round computation — including dangling-mass redistribution —
    * replays bit-for-bit in an unrolled SQL oracle. No floating
    * accumulation anywhere: the only doubles are single exact divisions.
    *
    * Per iteration (damping 0.85 as the exact rational 17/20):
    * {{{
    *   contrib(e)   = rank(src) // outdeg(src)          (per edge)
    *   dangling     = sum of rank over outdeg-0 nodes   (one scalar)
    *   rank'(n)     = (scale*3/20)//N
    *                + ((incoming(n) + dangling//N) * 17) // 20
    * }}}
    *
    * Scale shape: edges stay distributed end to end; each round is one
    * shuffle-hash join (edges x ranks, both partitioned by node) + one
    * map-side-combined sum per dst + one bounded scalar aggregate for the
    * dangling mass. Rounds are `localCheckpoint`ed like
    * [[Dedup.connectedComponents]] — lineage would otherwise double per
    * iteration. Driver state: two longs (N, dangling) per round.
    *
    * Rank mass is conserved up to floor drift (< N + 2 per round, spec'd);
    * ranks are a deterministic function of the edge SET — partitioning
    * and merge order cannot change a single bit.
    *
    * @param edges    directed edge frame; duplicate edges collapse
    * @param iters    fixed round count (portable oracles unroll it)
    * @return (node, rank_scaled, rank) — `rank` = rank_scaled / scale,
    *         one exact double division
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    // the exactness contract is scale-bounded: every floor(a/b) below is
    // the true integer floor only while the intermediate rank mass
    // (~scale * 17/10 worst case) stays under 2^53 — past ~2.6e14 the
    // double division silently stops being exact and the spec'd
    // mass-conservation drift bound no longer holds
    require(scale > 0 && scale <= 260000000000000L,
      s"scale must be in (0, 2.6e14] to keep the floor divisions exact, got $scale")
    val e = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    require(scale >= n,
      s"scale ($scale) must be >= the node count ($n): the integer initial " +
        "rank scale/n would otherwise floor to 0 and every rank fixes at 0")
    // teleport share of each round, integer-exact: (scale * 3/20) / N
    val base = (scale * 3L / 20L) / n
    var ranks = nodes.withColumn("rank_scaled", lit(scale / n))
      .localCheckpoint(false)
    for (it <- 1 to iters) {
      // the round's dangling mass rides as a broadcast ONE-ROW aggregate
      // instead of a driver collect (r19): the loop builds one lazy DAG —
      // no per-iteration action, no per-iteration job — and the lazy
      // checkpoints still truncate lineage as they materialize inside the
      // single final job. Same integer value: sums of scaled longs stay
      // far under 2^53, where ldiv's floor(double) equals Scala's
      // nonnegative Long division exactly (the file's exactness contract).
      val dangling = ranks.join(outdeg, Seq("node"), "left_anti")
        .agg(coalesce(sum("rank_scaled"), lit(0L)).as("__dang"))
      val incoming = e
        .join(ranks.join(outdeg, "node")
            .select(col("node").as("src"),
              ldiv(col("rank_scaled"), col("outdeg")).as("c")),
          "src")
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("inc"))
      ranks = nodes.join(incoming, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(base) + ldiv((coalesce(col("inc"), lit(0L)) +
            ldiv(col("__dang"), lit(n)))
            * lit(17L), lit(20L))).as("rank_scaled"))
        // EAGER every 5th round (never the last — the caller's action
        // materializes that one): the all-lazy chain stacks one pending
        // BroadcastExchange per round, and the final action must resolve
        // every one of them inside a single spark.sql.broadcastTimeout
        // window (default 300s) — at high `iters` that is a timeout
        // regression waiting to happen and the pending plan grows
        // linearly. A bounded cadence caps both (at most 5 pending
        // rounds) at zero extra jobs for the common iters <= 5 call.
        .localCheckpoint(it % 5 == 0 && it < iters)
    }
    ranks.withColumn("rank",
      col("rank_scaled").cast("double") / lit(scale.toDouble))
  }

  /** Exact TRIANGLE COUNT + global clustering coefficient of an undirected
    * graph — the standard structure probe of a duplicate-pair or link
    * graph. Edges canonicalize, then every edge is ORIENTED from its
    * lower-(degree, id) endpoint to the higher one before the wedge join
    * (the classic degree-ordered / "compact-forward" MapReduce shape):
    * every node's out-degree under this orientation is O(sqrt(m)), so the
    * wedge join emits O(m^1.5) candidates total instead of sum-of-d^2 —
    * a planted star of degree d contributes ZERO wedges instead of d^2,
    * which is what survives a power-law duplicate graph at 100 TB.
    * A triangle with key order p < q < r is found exactly once, as the
    * wedge (q,r) out of p closed by the oriented edge q -> r.
    * n_wedges is the exact sum over nodes of (deg choose 2), so
    * clustering = 3 * triangles / wedges, one IEEE division of longs.
    * Returns ONE row: (n_nodes, n_edges, n_wedges, n_triangles,
    * clustering). */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false) // consumed by degrees and both orientation joins
    val deg = e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
      .localCheckpoint(false) // consumed by degStats + both orientation joins
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    val o = degreeOriented(e, deg)
      .localCheckpoint(false) // consumed by the wedge join (twice) + probe
    val tri = o.as("x")
      .join(o.as("y"),
        col("x.u") === col("y.u") && col("x.kv") < col("y.kv"))
      .select(col("x.v").as("u"), col("y.v").as("v"))
      .join(o.select("u", "v"), Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val edgeCount = e.agg(count(lit(1)).as("n_edges"))
    degStats.crossJoin(broadcast(edgeCount)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0L, lit(0.0))
          .otherwise((col("n_triangles") * 3L).cast("double") /
            col("n_wedges").cast("double")).as("clustering"))
  }

  /** Degree-ordered orientation: given canonical undirected edges (a, b)
    * and the degree frame (v, d), emit each edge once as (u, v, kv) where
    * u is the lower-(degree, id) endpoint, v the higher, and kv is v's
    * comparable (degree, id) sort key (carried so the wedge join can
    * order a node's out-neighbors without re-joining degrees). Out-degree
    * per node is bounded by O(sqrt(m)) under this orientation, which is
    * what caps wedge-candidate volume; exposed package-private so specs
    * can pin the candidate-count collapse on a planted star. */
  private[graft] def degreeOriented(e: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    // total order on nodes: (degree, id) lexicographic, as one comparable
    // struct (identical field names on both arms so when/otherwise unifies)
    val ka = struct(col("da").as("dk"), col("a").as("nk"))
    val kb = struct(col("db").as("dk"), col("b").as("nk"))
    withDeg.select(
      when(ka < kb, col("a")).otherwise(col("b")).as("u"),
      when(ka < kb, col("b")).otherwise(col("a")).as("v"),
      when(ka < kb, kb).otherwise(ka).as("kv"))
  }
}
