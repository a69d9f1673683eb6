package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Relational graph analytics over canonical edge lists — the capability
  * the reference *declares* (spark-graphx in build.sbt:13) but never uses
  * (SURVEY.md §0: "graphx is declared but never imported"). Everything here
  * is pure DataFrame dataflow: at 100 TB a vertex-partitioned edge list +
  * hash-shuffle joins is exactly what GraphX's routing tables degenerate
  * to, without the RDD layer in the way.
  *
  * The load-bearing consumer is deduplication: near-dup operators
  * (Dedup.minhashNearDup, TextAnalysis.ngramJaccardPairs, …) emit PAIRS,
  * but a pipeline needs CLUSTERS — "keep one doc per group of mutual
  * near-dups" is connected components over the pair graph. Pairs are not
  * transitively closed (a~b, b~c but a≁c), so a groupBy can't do it; an
  * iterative algorithm must.
  *
  * Edge-list convention: (aCol, bCol) with a < b, no self-loops, each
  * undirected edge once — the output shape of all graft pair operators.
  */
object Graph {

  /** Undirected degree per vertex. One map-side-combinable agg over the
    * symmetrized edge list. */
  def degrees(edges: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id"): DataFrame =
    edges.select(col(aCol).as("id"))
      .unionAll(edges.select(col(bCol).as("id")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("degree"))

  /** Global triangle count via the oriented wedge join: edges oriented
    * low→high in the (degree, id) total order, each triangle x<y<z
    * counted exactly once as wedge (x,y)+(y,z) closed by (x,z).
    *
    * The orientation MUST be degree-ordered, not id-ordered (fixed r16,
    * caught by the power-law arm in TunePowerLawGraph): the wedge join
    * fans out in(m)·out(m) at each middle m, and under id-ordering a
    * mid-id hub of degree d contributes ≈ (d/2)² wedges — measured
    * 180.7 s vs 2.5 s uniform at equal edge count (3M edges, hub
    * d = 48.8k, ~6e8 wedges). Degree-ordering gives the classic
    * heavy-hitter bound (out-degree ≤ √(2|E|) for every node, total
    * wedge mass O(|E|^1.5)): the max-degree hub has out-degree 0 — all
    * its edges point AT it — so hubs stop being wedge middles at all.
    * The oriented edge list is materialized once (checkpoint /
    * localCheckpoint, the kCore discipline) because the wedge join
    * consumes it three times and the degree join should not be planned
    * thrice. The count itself is orientation-invariant, so oracle
    * values are unchanged. Returns a 1-row frame (n_triangles). */
  def triangleCount(edges: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id"): DataFrame = {
    val spark = edges.sparkSession
    def materialize(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(true)
    val e0 = edges.select(col(aCol).as("x"), col(bCol).as("y"))
    val deg = e0.select(col("x").as("id"))
      .unionAll(e0.select(col("y").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val fwd = struct(col("dx"), col("x")) < struct(col("dy"), col("y"))
    val e = materialize(e0
      .join(deg.select(col("id").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("id").as("y"), col("d").as("dy")), "y")
      .select(when(fwd, col("x")).otherwise(col("y")).as("a"),
        when(fwd, col("y")).otherwise(col("x")).as("b")))
    val wedge = e.join(e.select(col("a").as("b"), col("b").as("c")), "b")
    wedge.join(e.select(col("a"), col("b").as("c")),
        Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** PageRank over the undirected pair graph (each edge walked both ways).
    *
    * Standard power iteration: rank(v) ← (1-d)/n + d·Σ rank(u)/deg(u) over
    * neighbors u. Each iteration is one shuffle join (ranks ⋈ edges on the
    * source) + one map-side-combinable sum agg on the destination — the
    * same dataflow GraphX's Pregel compiles to, without the RDD layer.
    * Ranks are checkpointed every `checkpointInterval` rounds to truncate
    * the lineage (reliably when a checkpoint dir is configured,
    * executor-locally otherwise — same policy as connectedComponents).
    * Each checkpoint is an eager extra action, so short runs (≤ the
    * interval) pay exactly one materialization at the end; long runs
    * trade a few extra jobs for bounded lineage. The edge list is cached:
    * it is re-joined every round.
    *
    * On a symmetrized edge list every vertex has deg ≥ 1, so there is no
    * dangling mass and ranks sum to 1 exactly (up to float addition) at
    * every step — pinned in GraphSpec.
    *
    * @return (id, pagerank) for every vertex incident to an edge.
    */
  def pageRank(edges: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", iterations: Int = 10,
      damping: Double = 0.85, checkpointInterval: Int = 8): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    def materialize(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(true)
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    val withDeg = sym.join(
        sym.groupBy($"src").agg(count(lit(1)).as("deg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = withDeg.select($"src").distinct().count()
    var ranks = withDeg.select($"src".as("id")).distinct()
      .withColumn("pagerank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val contribs = withDeg.join(ranks, $"src" === $"id")
        .select($"dst", ($"pagerank" / $"deg").as("c"))
      ranks = contribs.groupBy($"dst".as("id"))
        .agg((lit((1.0 - damping) / n) + lit(damping) * sum($"c"))
          .as("pagerank"))
      if (i % checkpointInterval == 0 || i == iterations)
        ranks = materialize(ranks)
    }
    withDeg.unpersist(blocking = false)
    ranks
  }

  /** Fixed-point PageRank: identical dataflow to `pageRank`, but ranks
    * are BIGINT multiples of 1/`scale` and every divide is integer
    * division — the result is bit-reproducible across ANY engine that
    * implements 64-bit integer arithmetic (the float version depends on
    * summation order). That makes the 6-round power iteration exactly
    * checkable by a SQL oracle, and at scale removes float-nondeterminism
    * between runs (partial-agg order varies with partitioning).
    *
    * Per round, with S = scale and d = 85/100:
    *   rank'(v) = (15·S div 100) div n  +  (85 · Σ (rank(u) div deg(u))) div 100
    * All terms stay well under 2^63: Σ rank ≤ S = 10^9, ×85 ≤ 8.5·10^10.
    * Truncation loses ≤ deg(u) parts-per-scale per vertex per round —
    * at S = 10^9 the ranking is unchanged vs float (pinned in GraphSpec).
    *
    * @return (id, rank_fp) — rank scaled by `scale`, as a long. */
  def pageRankFixedPoint(edges: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", iterations: Int = 6,
      scale: Long = 1000000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    def materialize(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(true)
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
    val withDeg = sym.join(
        sym.groupBy($"src").agg(count(lit(1)).as("deg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = withDeg.select($"src").distinct().count()
    if (n == 0) {  // empty graph: no vertices, no ranks (and no div-by-0)
      withDeg.unpersist(blocking = false)
      return sym.select($"src".as("id"), lit(0L).as("rank_fp")).limit(0)
    }
    val base = 15L * scale / 100L / n  // driver-side longs: exact
    var ranks = withDeg.select($"src".as("id")).distinct()
      .withColumn("rank_fp", lit(scale / n))
    for (i <- 1 to iterations) {
      val contribs = withDeg.join(ranks, $"src" === $"id")
        .select($"dst", expr("rank_fp div deg").as("c"))
      ranks = contribs.groupBy($"dst".as("id"))
        .agg(expr(s"${base}L + (85 * sum(c)) div 100").as("rank_fp"))
      if (i == iterations) ranks = materialize(ranks)
    }
    withDeg.unpersist(blocking = false)
    ranks
  }

  /** Quotient sizes up to this many symmetrized edges run the power
    * iteration DRIVER-side (exact same long arithmetic — the loop over
    * a collected edge array is microseconds, while 12 tiny distributed
    * shuffle stages cost ~19 s of pure scheduling at local[32]; the
    * estimator-state-collect precedent, bounded like the BPE histogram).
    * Larger quotients — a 100 TB crawl's distinct-content graph can be
    * billions of edges — take the distributed loop. */
  val QuotientDriverEdgeBound = 2000000L

  /** Fixed-point PageRank on the exact-twin QUOTIENT of a blow-up graph
    * (r13 — the pairTriangles decomposition device applied to the power
    * iteration). Inputs: `classEdges` = the quotient's cross edges as
    * (a_id, b_id) class-rep pairs; `classes` = (rep, csize, survived),
    * where a survived class of size m ≥ 2 is an internal K_m in the
    * blown-up graph (twins pair each other at jaccard exactly 1.0).
    *
    * Exactness (integer arithmetic, so this is bit-equal to running
    * pageRankFixedPoint on the blown-up member graph): twins start
    * equal (scale/n) and the update is the same function of identical
    * inputs, so by induction all members of a class hold the SAME rank
    * at every iteration; a member's neighbors are its (m_c − 1)
    * class-mates plus all m_d members of each adjacent class, each
    * contributing the identical integer r div deg, so the member-level
    * Σ collapses to (m_c − 1)·t_c + Σ_d m_d·t_d with no rounding ever
    * reordered (integer multiply IS repeated addition of equal longs).
    * Every iteration therefore runs on quotient-sized frames; the
    * caller expands class ranks back to members join-wise. The DuckDB
    * oracle keeps replaying the blown-up member-level definition — the
    * bit-match proves the quotient.
    *
    * @return (id = class rep, rank_fp) for every class with ≥ 1
    *         member-level edge (cross edge, or internal clique). */
  def pageRankFixedPointQuotient(classEdges: DataFrame, classes: DataFrame,
      iterations: Int = 6, scale: Long = 1000000000L,
      driverEdgeBound: Long = QuotientDriverEdgeBound): DataFrame = {
    val spark = classEdges.sparkSession
    import spark.implicits._
    def materialize(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(true)
    val sym = classEdges.select($"a_id".as("src"), $"b_id".as("dst"))
      .unionAll(classEdges.select($"b_id".as("src"), $"a_id".as("dst")))
    // member-level degree, identical for every member of a class:
    // (m − 1) class-mates when the class is an internal clique, plus
    // all members of each adjacent class
    val crossDeg = sym
      .join(classes.select($"rep".as("dst"), $"csize".as("m_dst")), "dst")
      .groupBy($"src".as("rep")).agg(sum($"m_dst").as("cross_deg"))
    val nodes = classes
      .select($"rep".as("id"), $"csize".cast("long").as("m"),
        when($"survived" && $"csize" >= 2, ($"csize" - 1).cast("long"))
          .otherwise(0L).as("intra_deg"))
      .join(crossDeg.withColumnRenamed("rep", "id"), Seq("id"), "left_outer")
      .withColumn("deg", $"intra_deg" + coalesce($"cross_deg", lit(0L)))
      .filter($"deg" >= 1L)
      .select($"id", $"m", $"intra_deg", $"deg")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.agg(coalesce(sum($"m"), lit(0L))).head().getLong(0)
    if (n == 0) {  // empty blow-up: no vertices, no ranks
      nodes.unpersist(blocking = false)
      return classEdges.select($"a_id".as("id"), lit(0L).as("rank_fp"))
        .limit(0)
    }
    val base = 15L * scale / 100L / n  // driver-side longs: exact
    // ONE weighted edge list, built and persisted before the loop —
    // cross edges carry w = m_src (all members of src contribute the
    // identical t_src), intra cliques become a SELF-loop with
    // w = m − 1. Each iteration then references `ranks` exactly once
    // (the direct operator's shape): a second reference per iteration
    // doubles the lazy-plan fan-out per round and evaluates the base
    // 2^iterations times — measured 397 s vs 35 s at the 30× corpus.
    val wEdges = sym
      .join(nodes.select($"id".as("src"), $"m".as("w"), $"deg"), "src")
      .select($"src", $"dst", $"w", $"deg")
      .unionByName(nodes.filter($"intra_deg" >= 1L)
        .select($"id".as("src"), $"id".as("dst"),
          $"intra_deg".as("w"), $"deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgeRows = wEdges.count()
    val out =
      if (edgeRows <= driverEdgeBound) {
        // driver-exact path: identical long arithmetic over the
        // collected weighted edge array — sum ORDER is irrelevant
        // (integer addition is associative/commutative), so this is
        // bit-equal to the distributed fold
        val es = wEdges.select($"src", $"dst", $"w", $"deg").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        val ids = nodes.select($"id").collect().map(_.getLong(0))
        var r = ids.map(_ -> scale / n).toMap
        for (_ <- 1 to iterations) {
          val acc = scala.collection.mutable.Map.empty[Long, Long]
          es.foreach { case (src, dst, w, deg) =>
            acc(dst) = acc.getOrElse(dst, 0L) + w * (r(src) / deg)
          }
          r = acc.iterator
            .map { case (id, s) => id -> (base + (85L * s) / 100L) }.toMap
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(r.toSeq.map(p => Row(p._1, p._2))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("rank_fp",
              org.apache.spark.sql.types.LongType, nullable = false))))
      } else {
        var ranks = nodes.select($"id")
          .withColumn("rank_fp", lit(scale / n))
        for (i <- 1 to iterations) {
          val contribs = wEdges.join(ranks, $"src" === $"id")
            .select($"dst", ($"w" * expr("rank_fp div deg")).as("c"))
          ranks = contribs.groupBy($"dst".as("id"))
            .agg(expr(s"${base}L + (85 * sum(c)) div 100").as("rank_fp"))
          if (i == iterations) ranks = materialize(ranks)
        }
        ranks
      }
    wEdges.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): converges in O(log n) rounds on ANY graph — unlike
    * min-label propagation, whose round count is the graph diameter
    * (linear on chain-shaped near-dup clusters). Each round is two
    * shuffle joins; intermediate state is checkpointed to truncate the
    * lineage — RELIABLY (to the configured checkpoint dir, surviving
    * executor loss: the right mode on a cluster) when
    * `sparkContext.setCheckpointDir` has been called, executor-locally
    * otherwise (fine in one JVM; lost state would mean recomputing a
    * truncated lineage that no longer exists).
    *
    * @return (id, component) for every vertex incident to an edge, where
    *         component = smallest vertex id in its component.
    */
  /** k-core decomposition by iterative peeling: repeatedly drop every
    * vertex whose CURRENT degree is below k until a fixpoint — what
    * survives is the maximal subgraph where everyone keeps ≥ k
    * neighbors. The dense-cluster detector the monotone ops can't give:
    * degrees count raw edges, components merge through a single bridge,
    * but a 2-core sheds every tree/chain appendage and keeps only the
    * cyclic cores (for near-dup graphs: template families vs chains of
    * borderline pairs).
    *
    * Each round is one symmetrized map-combinable degree agg + one
    * broadcast-able anti-join of the (shrinking) edge list against the
    * dropped-vertex set, checkpoint-materialized like the other
    * iterative ops so lineage stays flat. Rounds are bounded by the
    * graph's PEELING DEPTH, which is worst-case LINEAR in the longest
    * chain (a path peels 2 vertices per round) — small on real near-dup
    * graphs, but the `maxRounds` valve is a runaway backstop, not an
    * expected bound, and is sized so only a genuinely pathological input
    * trips it. Returns (id, core_degree) for the surviving vertices —
    * degree WITHIN the core, ≥ k by construction. */
  def kCore(edges: DataFrame, k: Int, aCol: String = "a_id",
      bCol: String = "b_id", maxRounds: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val spark = edges.sparkSession
    import spark.implicits._
    def materialize(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(true)
    var e = materialize(edges
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .filter($"a" =!= $"b").distinct())
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val deg = e.select($"a".as("id")).unionAll(e.select($"b".as("id")))
        .groupBy($"id").agg(count(lit(1)).as("degree"))
      val drop = deg.filter($"degree" < k).select($"id")
      if (drop.isEmpty) done = true
      else {
        e = materialize(e
          .join(drop.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
          .join(drop.withColumnRenamed("id", "b"), Seq("b"), "left_anti")
          .select($"a", $"b"))
        round += 1
      }
    }
    require(done, s"kCore did not converge in $maxRounds rounds")
    e.select($"a".as("id")).unionAll(e.select($"b".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("core_degree"))
  }

  /** k-core peeling on the exact-twin QUOTIENT of a blow-up graph (r13 —
    * completing the quotient family: triangles, components, PageRank,
    * and now the peel). Twins share every degree at every round, so
    * classes peel as UNITS and the member-level rounds collapse exactly:
    * a member's current degree is intra (m − 1 when the class is an
    * internal clique) + Σ m_d over surviving adjacent classes, identical
    * for every member; the surviving graph stays a blow-up of the
    * surviving quotient by induction. Same inputs as
    * pageRankFixedPointQuotient; output (id = class rep, core_degree),
    * the caller expands to members (who all share the class value). The
    * member-level unrolled-peeling DuckDB oracle stays unchanged — the
    * bit-match is the proof. Below `driverEdgeBound` symmetrized edges
    * the peel runs driver-side (peeling is pure integer set arithmetic);
    * above it, a distributed weighted-degree round loop mirroring kCore. */
  def kCoreQuotient(classEdges: DataFrame, classes: DataFrame, k: Int,
      driverEdgeBound: Long = QuotientDriverEdgeBound,
      maxRounds: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val spark = classEdges.sparkSession
    import spark.implicits._
    def materialize(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(true)
    val cls = classes
      .select($"rep".as("id"), $"csize".cast("long").as("m"),
        when($"survived" && $"csize" >= 2, ($"csize" - 1).cast("long"))
          .otherwise(0L).as("intra_deg"))
    val eqd = classEdges.select($"a_id".as("a"), $"b_id".as("b"))
      .filter($"a" =!= $"b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgeRows = eqd.count()
    if (2 * edgeRows <= driverEdgeBound) {
      // driver-exact peel over the collected quotient
      val es = eqd.collect().map(r => (r.getLong(0), r.getLong(1)))
      val info = cls.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val adj = scala.collection.mutable.Map
        .empty[Long, List[Long]].withDefaultValue(Nil)
      es.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
      var alive = info.collect {
        case (id, (_, intra)) if intra >= 1L || adj(id).nonEmpty => id
      }.toSet
      var done = false
      var round = 0
      def degOf(id: Long): Long =
        info(id)._2 + adj(id).iterator.filter(alive).map(info(_)._1).sum
      while (!done && round < maxRounds) {
        val drop = alive.filter(degOf(_) < k)
        if (drop.isEmpty) done = true
        else { alive = alive -- drop; round += 1 }
      }
      require(done, s"kCoreQuotient did not converge in $maxRounds rounds")
      eqd.unpersist(blocking = false)
      val rows = alive.toSeq.map(id => Row(id, degOf(id)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("core_degree",
            org.apache.spark.sql.types.LongType, nullable = false))))
    } else {
      // distributed weighted peel: per round, class degree = intra +
      // Σ m_d over surviving neighbors; drop < k; anti-join the edges
      val clsP = cls
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var e = materialize(eqd)
      eqd.unpersist(blocking = false)
      def degrees(edges: DataFrame): DataFrame = {
        val sym = edges.select($"a".as("id"), $"b".as("nb"))
          .unionAll(edges.select($"b".as("id"), $"a".as("nb")))
        val crossDeg = sym
          .join(clsP.select($"id".as("nb"), $"m".as("nm")), "nb")
          .groupBy($"id").agg(sum($"nm").as("cross_deg"))
        clsP.join(crossDeg, Seq("id"), "left_outer")
          .select($"id", $"m", ($"intra_deg" +
            coalesce($"cross_deg", lit(0L))).as("degree"))
      }
      // node set: intra cliques count as alive even with no cross edges
      var alive = materialize(degrees(e).filter($"degree" >= 1L)
        .select($"id"))
      var done = false
      var round = 0
      while (!done && round < maxRounds) {
        val deg = degrees(e.join(alive.withColumnRenamed("id", "a"),
            Seq("a"), "left_semi")
          .join(alive.withColumnRenamed("id", "b"), Seq("b"), "left_semi"))
          .join(alive, Seq("id"), "left_semi")
        val drop = deg.filter($"degree" < k).select($"id")
        if (drop.isEmpty) done = true
        else {
          alive = materialize(
            alive.join(drop, Seq("id"), "left_anti"))
          round += 1
        }
      }
      require(done, s"kCoreQuotient did not converge in $maxRounds rounds")
      val eAlive = e
        .join(alive.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      val out = degrees(eAlive)
        .join(alive, Seq("id"), "left_semi")
        .select($"id", $"degree".as("core_degree"))
      clsP.unpersist(blocking = false)
      out
    }
  }

  def connectedComponents(edges: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxRounds: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // state: (x, p) with p < x — "x currently attached to p"
    def materialize(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(true)
    var e = materialize(edges
      .select(greatest(col(aCol), col(bCol)).as("x"),
        least(col(aCol), col(bCol)).as("p"))
      .filter($"x" =!= $"p")
      .distinct())
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // large-star: every neighbor v > u attaches to u's min neighbor
      val sym = e.select($"x".as("u"), $"p".as("v"))
        .unionAll(e.select($"p".as("u"), $"x".as("v")))
      val mins = sym.groupBy($"u")
        .agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      val large = sym.join(mins, "u")
        .filter($"v" > $"u")
        .select($"v".as("x"), $"m".as("p"))
        .filter($"x" =!= $"p")
        .distinct()
      // small-star: all smaller neighbors (and u itself) attach to the min
      val smins = large.groupBy($"x").agg(min($"p").as("m"))
      val withM = large.join(smins, "x")
      val next = materialize(withM.select($"p".as("x2"), $"m".as("p2"))
        .unionAll(withM.select($"x".as("x2"), $"m".as("p2")))
        .filter($"x2" =!= $"p2")
        .select($"x2".as("x"), $"p2".as("p"))
        .distinct())
      // Convergence = star forest: no parent is itself a child (chains
      // fully collapsed). One semi-join probe, vs the two except
      // anti-joins a set-equality check needs; at the fixpoint the
      // alternating iteration provably reproduces E (see scaladoc), so
      // the criteria agree — this one just fires a round earlier when
      // the star forest appears.
      converged = next.select($"p")
        .join(next.select($"x"), $"p" === $"x", "left_semi")
        .isEmpty
      e = next
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // star forest: children map to their root; roots map to themselves
    e.select($"x".as("id"), $"p".as("component"))
      .unionAll(e.select($"p").distinct()
        .join(e.select($"x"), $"p" === $"x", "left_anti")
        .select($"p".as("id"), $"p".as("component")))
  }
}
