package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph operators for the dedup pipeline.
  *
  * Near-dup pair detection (MinHash/LSH, embedding blocks) yields EDGES;
  * the keep/drop decision needs COMPONENTS — transitively-linked groups
  * collapse to one representative, or chains like a~b, b~c drop both b
  * and c even when a~c was never a candidate pair.
  */
object GraphOps {

  /** Weighted PageRank by power iteration — authority scoring over a
    * similarity/mirror graph (e.g. q66's source-mirror edge weights):
    * which nodes sit at the center of the duplication web, i.e. which
    * sources are canonical and which are re-hosts. Undirected input
    * (edges symmetrize internally; self-loops dropped); the simplified
    * formulation without dangling-mass redistribution — isolated nodes
    * hold the teleport floor (1−d)/N, documented and oracle-replayed.
    *
    * Plan shape: per-iteration = one edge⋈rank join + one partial-agg
    * sum per destination (the classic distributed PR step; ranks and
    * out-weights key the joins, nothing ever collects to the driver).
    * Per-edge contributions bank as EXACT integer nano-units
    * (round(c·10⁹)), so each iteration's sums are order-independent
    * and the whole trace replays in SQL; ranks round 6dp per iteration.
    *
    * Output: (<node col>, pr) after `iters` iterations.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int = 3, damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst",
               weightCol: String = "weight"): DataFrame = {
    import graft.ops.Rounding.round
    val nodeCol = nodes.columns.head
    val clean = edges.filter(col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("s"), col(dstCol).as("d"), col(weightCol).cast("double").as("w"))
    val sym = clean.unionByName(clean.select(col("d").as("s"), col("s").as("d"), col("w")))
      .localCheckpoint(true)
    val outw = sym.groupBy("s").agg(sum("w").as("ow"))
    val n = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    var pr = nodes.select(col(nodeCol).as("node"))
      .crossJoin(n)
      .select(col("node"), round(lit(1.0) / col("n_nodes"), 6).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = sym
        .join(pr.select(col("node").as("s"), col("pr")), Seq("s"))
        .join(outw, Seq("s"))
        .select(col("d"),
          round(col("pr") / col("ow") * col("w") * lit(1000000000.0)).cast("long").as("__c"))
        .groupBy("d").agg(sum("__c").as("__in"))
      pr = pr.select(col("node")).crossJoin(n)
        .join(contrib.select(col("d").as("node"), col("__in")), Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) / col("n_nodes")
            + lit(damping) * (coalesce(col("__in"), lit(0L)) / lit(1000000000.0)), 6).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("node").as(nodeCol), col("pr"))
  }

  /** DIRECTED weighted PageRank — the web-link formulation, where an
    * edge is an endorsement FROM src TO dst and direction carries the
    * meaning (the undirected [[pageRank]] models mutual-similarity
    * webs; a link graph is not one — a farm linking out a thousand
    * times must not inherit the authority it points at). Self-loops
    * drop; out-weight normalizes per SOURCE over its outgoing edges
    * only. Same simplified formulation as [[pageRank]], documented
    * identically: no dangling-mass redistribution — a sink node's rank
    * mass leaves the system (its pr still holds the teleport floor),
    * which preserves exact SQL replayability (the dangling sum would
    * otherwise need a per-iteration global scalar).
    *
    * Plan shape per iteration: one edge⋈rank join + one partial-agg
    * sum per destination, contributions banked as exact integer
    * nano-units, ranks rounded 6dp — the [[pageRank]] discipline on
    * the directed edge set.
    *
    * Output: (<node col>, pr) after `iters` iterations.
    */
  def pageRankDirected(edges: DataFrame, nodes: DataFrame, iters: Int = 3,
                       damping: Double = 0.85, srcCol: String = "src",
                       dstCol: String = "dst", weightCol: String = "weight"): DataFrame = {
    import graft.ops.Rounding.round
    val nodeCol = nodes.columns.head
    val dir = edges.filter(col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("s"), col(dstCol).as("d"), col(weightCol).cast("double").as("w"))
      .localCheckpoint(true)
    val outw = dir.groupBy("s").agg(sum("w").as("ow"))
    val n = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    var pr = nodes.select(col(nodeCol).as("node"))
      .crossJoin(n)
      .select(col("node"), round(lit(1.0) / col("n_nodes"), 6).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = dir
        .join(pr.select(col("node").as("s"), col("pr")), Seq("s"))
        .join(outw, Seq("s"))
        .select(col("d"),
          round(col("pr") / col("ow") * col("w") * lit(1000000000.0)).cast("long").as("__c"))
        .groupBy("d").agg(sum("__c").as("__in"))
      pr = pr.select(col("node")).crossJoin(n)
        .join(contrib.select(col("d").as("node"), col("__in")), Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) / col("n_nodes")
            + lit(damping) * (coalesce(col("__in"), lit(0L)) / lit(1000000000.0)), 6).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("node").as(nodeCol), col("pr"))
  }

  /** HITS (Kleinberg) hubs-and-authorities by power iteration over a
    * DIRECTED weighted graph — the complement to
    * [[pageRankDirected]]: a page is a good AUTHORITY when good hubs
    * point at it, a good HUB when it points at good authorities; the
    * two mutually-recursive scores separate directories/link-outs
    * from endorsed content, which one PageRank number cannot.
    *
    * Determinism: per-iteration contributions bank as exact integer
    * nano-units (the [[pageRank]] discipline), each score vector
    * L1-normalizes by the exact integer total (long/long double
    * division is IEEE-identical in any engine), results round 6dp per
    * iteration — the whole trace replays in SQL. Self-loops drop;
    * nodes without in-(out-)edges hold score 0 on that side.
    *
    * Plan shape per iteration: two edge⋈score joins + two partial-agg
    * sums + two broadcast scalar totals — all on the graph, never the
    * corpus.
    *
    * Output: (<node col>, hub, authority) after `iters` iterations.
    */
  def hits(edges: DataFrame, nodes: DataFrame, iters: Int = 2,
           srcCol: String = "src", dstCol: String = "dst",
           weightCol: String = "weight"): DataFrame = {
    import graft.ops.Rounding.round
    val nodeCol = nodes.columns.head
    val dir = edges.filter(col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("s"), col(dstCol).as("d"), col(weightCol).cast("double").as("w"))
      .localCheckpoint(true)
    val nd = nodes.select(col(nodeCol).as("node")).localCheckpoint(true)
    def normalized(raw: DataFrame, keyCol: String, out: String): DataFrame = {
      val tot = broadcast(raw.agg(sum("__c").as("__t")))
      nd.join(raw.select(col(keyCol).as("node"), col("__c")), Seq("node"), "left")
        .crossJoin(tot)
        .select(col("node"),
          when(col("__t") > 0L,
            round(coalesce(col("__c"), lit(0L)) / col("__t").cast("double"), 6))
            .otherwise(lit(0.0)).as(out))
        .localCheckpoint(true)
    }
    var h = nd.select(col("node"), lit(1.0).as("h"))
    var a = nd.select(col("node"), lit(0.0).as("a"))
    for (_ <- 1 to iters) {
      val aRaw = dir.join(h.select(col("node").as("s"), col("h")), Seq("s"))
        .select(col("d"), round(col("h") * col("w") * lit(1000000000.0)).cast("long").as("__c0"))
        .groupBy("d").agg(sum("__c0").as("__c"))
      a = normalized(aRaw, "d", "a")
      val hRaw = dir.join(a.select(col("node").as("d"), col("a")), Seq("d"))
        .select(col("s"), round(col("a") * col("w") * lit(1000000000.0)).cast("long").as("__c0"))
        .groupBy("s").agg(sum("__c0").as("__c"))
      h = normalized(hRaw, "s", "h")
    }
    h.join(a, Seq("node"))
      .select(col("node").as(nodeCol), col("h").as("hub"), col("a").as("authority"))
  }

  /** Connected components with scale-adaptive strategy.
    *
    * Input: an edge list (undirected; direction of the given columns is
    * ignored). Output: `(id, component)` for every vertex that appears
    * in at least one edge, where `component` is the minimum vertex id
    * reachable from `id` — a deterministic canonical representative.
    *
    * Strategy selection mirrors broadcast-vs-shuffle joins: the edge
    * list is ALREADY materialized (localCheckpoint) when counted, so the
    * check is free. At or below `driverThreshold` INPUT edges, a
    * driver-side union-find finishes in one pass — the dup graph after
    * candidate filtering is a vanishing fraction of the corpus, exactly
    * the "small side" case. Driver heap holds the boxed edge array plus
    * a per-vertex map while it runs (~100 bytes/edge) — the default 1M
    * stays ~100 MB; raise it only with driver memory to match.
    * Above it, iterative min-label propagation WITH POINTER JUMPING:
    * each round takes the min over the vertex's own label, its
    * neighbors' labels, and its label's label (`l(l(v))` — one extra
    * self-join on the label table). The jump doubles how far the
    * minimum has travelled each round, so rounds are O(log diameter)
    * rather than O(diameter) — long chains (the adversarial case for
    * plain propagation, cf. Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) converge in tens of rounds at any
    * realistic scale. Per round: one shuffle for the neighbor min
    * (map-side combined), one for the jump join, lineage cut by
    * localCheckpoint, convergence from a scalar label-sum aggregate.
    * REFUSES on maxIter exhaustion rather than returning silently
    * split components.
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a", dstCol: String = "id_b",
                          maxIter: Int = 50, driverThreshold: Long = 1000000L): DataFrame = {
    // fail fast on non-integral id columns: a silent cast("long") would
    // turn string/UUID ids into nulls and report zero components
    Seq(srcCol, dstCol).foreach { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = edges.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"connectedComponents needs integral vertex ids; '$c' is ${dt.catalogString} " +
          "(map string ids to a surrogate long key first)")
    }
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val e = sym.union(sym.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint()
    // e is symmetrized (2 rows per input edge): compare input-edge count
    if (e.count() / 2 <= driverThreshold) {
      // union-find with path compression over the collected edges
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      e.as[(Long, Long)].collect().foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val out = parent.keysIterator.map(v => (v, find(v))).toSeq
      spark.createDataset(out).toDF("id", "component")
    } else {
      var labels = e.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint()
      // coalesce: an empty edge list means an empty label table (sum null)
      var prevSum = labels.agg(coalesce(sum("label"), lit(0L))).head().getLong(0)
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        // min over: own label, neighbors' labels, and the label's label
        // (pointer jump — labels are vertex ids, so l(v) has its own row)
        val neigh = e.join(labels.withColumnRenamed("id", "src"), Seq("src"))
          .select(col("dst").as("id"), col("label"))
        val jump = labels.as("a")
          .join(labels.select(col("id").as("label"), col("label").as("ll")), Seq("label"))
          .select(col("id"), col("ll").as("label"))
        labels = neigh.union(jump).union(labels)
          .groupBy("id").agg(min("label").as("label"))
          .localCheckpoint()
        val s = labels.agg(coalesce(sum("label"), lit(0L))).head().getLong(0)
        converged = s == prevSum
        prevSum = s
        i += 1
      }
      // an unconverged exit would silently split real components — refuse
      if (!converged) throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          "(component diameter exceeds maxIter); raise maxIter or use an " +
          "O(log n)-round large-star/small-star variant for deep graphs")
      labels.select(col("id"), col("label").as("component"))
    }
  }

  /** Dup-cluster summary over near-dup edges: one row per component with
    * the canonical kept doc (minimum id), the member count, and the
    * sorted member list — the decision table a dedup job applies.
    */
  def dupClusters(edges: DataFrame, srcCol: String = "id_a", dstCol: String = "id_b",
                  maxIter: Int = 50, driverThreshold: Long = 1000000L): DataFrame =
    connectedComponents(edges, srcCol, dstCol, maxIter, driverThreshold)
      .groupBy(col("component").as("keep_id"))
      .agg(count(lit(1)).cast("long").as("cluster_size"),
        sort_array(collect_list(col("id"))).as("members"))

  /** Quality-aware cluster-representative selection: given near-dup
    * edges and a per-doc score table, keep the HIGHEST-scoring member
    * of each component (tie → lowest id) — the curation upgrade of
    * [[dupClusters]]' min-id canonical choice (a dedup pass should keep
    * the cleanest copy, not the first-crawled one).
    *
    * One aggregation over the component table: the arg-max rides a
    * struct ordering (score desc, id asc via negated id), so there is
    * no window sort and no second shuffle.
    *
    * Output: (component, rep_id, rep_score, cluster_size).
    */
  def clusterRepresentatives(edges: DataFrame, scores: DataFrame,
                             idCol: String = "doc_id", scoreCol: String = "quality_score",
                             srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame =
    connectedComponents(edges, srcCol, dstCol)
      .join(scores.select(col(idCol).cast("long").as("id"), col(scoreCol).as("score")), Seq("id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).cast("long").as("cluster_size"),
        max(struct(col("score").as("s"), (-col("id")).as("negid"))).as("m"))
      .select(col("component"), (-col("m.negid")).as("rep_id"),
        col("m.s").as("rep_score"), col("cluster_size"))

  /** k-core of an undirected graph by iterative peeling: repeatedly
    * drop vertices with degree < k until the fixpoint — the densest
    * backbone of a near-dup graph (a 10-core member sits inside a
    * heavily mirrored family; peripheral one-off dups peel away). The
    * classic distributed formulation: each round is one degree
    * aggregate and two semi-joins, all keyed on the vertex; lineage is
    * cut per round (checkpoint) and convergence is a scalar edge
    * count. Rounds are data-dependent but bounded: REFUSES on
    * `maxRounds` exhaustion rather than returning a half-peeled graph
    * (the [[connectedComponents]] discipline). The oracle unrolls
    * `maxRounds` rounds — rounds after the fixpoint are no-ops, so
    * early exit here and the fixed unroll there agree by construction.
    *
    * Output: (id, deg) for every core vertex, with its within-core
    * degree (≥ k by definition).
    */
  def kCore(edges: DataFrame, k: Int = 3, maxRounds: Int = 8,
            srcCol: String = "id_a", dstCol: String = "id_b",
            driverThreshold: Long = 1000000L): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1, got $k")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var prev = e.count()
    if (prev <= driverThreshold) {
      // r15: driver peeling below the [[connectedComponents]]
      // driverThreshold (~16 bytes/edge collected) — the distributed
      // loop pays (degree aggregate + two semi-joins + checkpoint +
      // count) PER ROUND, ~60 driver-gated jobs at maxRounds 12, for a
      // fixpoint the driver computes in microseconds on a graph this
      // size. Same arithmetic round-for-round (degree filter >= k on
      // the canonical distinct edge set), same unique fixpoint, same
      // REFUSE-on-budget discipline — only the executor round-trips
      // disappear. The scale path above the threshold is unchanged.
      val spark = edges.sparkSession
      var es: Array[(Any, Any)] = e.collect().map(r => (r.get(0), r.get(1)))
      var converged = es.isEmpty
      var round = 0
      while (!converged && round < maxRounds) {
        round += 1
        val deg = scala.collection.mutable.HashMap.empty[Any, Long]
        es.foreach { case (a, b) =>
          deg(a) = deg.getOrElse(a, 0L) + 1L
          deg(b) = deg.getOrElse(b, 0L) + 1L
        }
        val next = es.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
        converged = next.length == es.length
        es = next
      }
      require(converged, s"kCore: no fixpoint after $maxRounds rounds (raise maxRounds)")
      val deg = scala.collection.mutable.HashMap.empty[Any, Long]
      es.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1L
        deg(b) = deg.getOrElse(b, 0L) + 1L
      }
      val idType = e.schema("a").dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("deg", org.apache.spark.sql.types.LongType,
          nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          deg.toSeq.map { case (v, d) => org.apache.spark.sql.Row(v, d) }, 1), schema)
    } else {
      var converged = prev == 0L
      var round = 0
      while (!converged && round < maxRounds) {
        round += 1
        val keep = degrees(e).filter(col("deg") >= k).select("v")
        e = e.join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
          .select("a", "b")
          .localCheckpoint(true)
        val n = e.count()
        converged = n == prev
        prev = n
      }
      require(converged, s"kCore: no fixpoint after $maxRounds rounds (raise maxRounds)")
      degrees(e).select(col("v").as("id"), col("deg"))
    }
  }

  /** Triangle census of an undirected graph — the density diagnostic of
    * a near-dup graph: a high global clustering coefficient means dup
    * pairs close into cliques (mirrored corpora, template families),
    * a low one means chains (incremental edits). Returns one row:
    * (n_nodes, n_edges, n_wedges, n_triangles, clustering) with
    * `clustering = 3·triangles / wedges` (4dp; 0.0 when wedge-free).
    *
    * Plan shape is the degree-oriented wedge join (the MapReduce
    * triangle-counting standard, cf. Suri & Vassilvitskii WWW'11
    * "Counting Triangles and the Curse of the Last Reducer"): every
    * edge is oriented from its (degree, id)-smaller endpoint to the
    * larger, wedges form only at each edge's LOWER-degree end, and a
    * triangle is a wedge whose closing pair is itself an oriented edge
    * — a hub with degree d contributes O(d^1.5)-bounded wedge work
    * instead of O(d²), which is exactly the fix for the "curse of the
    * last reducer" on power-law dup graphs. The closing-edge join is
    * an equi-join on the oriented pair (consistent total order ⇒ the
    * closing edge can only appear as (v1, v2)), never a broadcast of
    * the edge set. Wedge COUNT (for the coefficient) is Σ C(deg, 2) —
    * derived from the degree table, no wedge materialization.
    */
  def triangleStats(edges: DataFrame, srcCol: String = "id_a",
                    dstCol: String = "id_b"): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // degrees + both orientation joins read it
    val deg = e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true) // wedge-count agg + two orientation joins
    // orient low → high under the (deg, id) total order
    val aOrd = struct(col("da").as("d"), col("a").as("i"))
    val bOrd = struct(col("db").as("d"), col("b").as("i"))
    val oriented = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .select(when(aOrd < bOrd, col("a")).otherwise(col("b")).as("u"),
        when(aOrd < bOrd, bOrd).otherwise(aOrd).as("w"))
      .select(col("u"), col("w.i").as("v"), col("w").as("vord"))
      .localCheckpoint(true) // wedge self-join (2×) + closing-edge join
    val wedgePairs = oriented.as("e1")
      .join(oriented.select(col("u"), col("v").as("v2"), col("vord").as("vord2")).as("e2"), Seq("u"))
      .filter(col("vord") < col("vord2"))
      .select(col("v").as("u"), col("v2").as("v"))
    val tri = wedgePairs.join(oriented.select("u", "v"), Seq("u", "v"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges"))
    counts.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        Rounding.round(
          when(col("n_wedges") > 0,
            lit(3.0) * col("n_triangles") / col("n_wedges")).otherwise(0.0), 4)
          .as("clustering"))
  }

  /** Label spreading over the near-dup graph: seed labels propagate to
    * every UNLABELED member of their connected component by component
    * majority (ties to the smallest label); seeds keep their own label
    * — the semi-supervised trick that turns a 25%-labeled corpus into
    * a fully-labeled one wherever duplication links documents.
    *
    * Plan shape: components from the edges only ([[connectedComponents]]);
    * the corpus takes one left join to its component, one
    * (component, label) count aggregate, one struct-ordered arg-max
    * per component (no window), one broadcast-scale join back.
    *
    * Output: (id, component, label, label_src ∈ own|propagated|none).
    *
    * `seeds` is keyed by `seedIdCol` (defaults to `idCol`, so seeds
    * drawn from the corpus frame need no rename) with labels in
    * `labelCol`.
    */
  def labelSpread(docs: DataFrame, seeds: DataFrame, edges: DataFrame,
                  idCol: String = "doc_id", srcCol: String = "id_a",
                  dstCol: String = "id_b", seedIdCol: String = null,
                  labelCol: String = "label"): DataFrame = {
    val sid = Option(seedIdCol).getOrElse(idCol)
    val comp = connectedComponents(edges, srcCol, dstCol)
    val joined = docs.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      .join(seeds.select(col(sid).cast("long").as("id"),
        col(labelCol).cast("long").as("__own")), Seq("id"), "left")
      .localCheckpoint(true) // majority aggregate + the final projection both read it
    val maj = joined.filter(col("__own").isNotNull)
      .groupBy("component", "__own").agg(count(lit(1)).as("__n"))
      .groupBy("component")
      .agg(max(struct(col("__n"), (-col("__own")).as("__nl"))).as("__m"))
      .select(col("component"), (-col("__m.__nl")).as("__maj"))
    joined.join(maj, Seq("component"), "left")
      .select(col("id").as(idCol), col("component"),
        coalesce(col("__own"), col("__maj")).as("label"),
        when(col("__own").isNotNull, "own")
          .when(col("__maj").isNotNull, "propagated")
          .otherwise("none").as("label_src"))
  }
}
