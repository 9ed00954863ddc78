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

  /** Connected components by iterative min-label propagation.
    *
    * Input: an edge list (undirected; direction of the given columns is
    * ignored). Output: `(id, component)` for every vertex that appears
    * in at least one edge, where `component` is the minimum vertex id
    * reachable from `id` — a deterministic canonical representative.
    *
    * Scale design: each iteration is ONE shuffle keyed by vertex id
    * (neighbor labels + own label, min-combined map-side); iterations
    * bound by the component diameter — near-dup graphs are shallow
    * (clusters of mutual near-dups), so a handful of rounds converge.
    * `localCheckpoint` truncates the growing lineage each round, and
    * convergence is detected with a single scalar aggregate (the label
    * sum strictly decreases until fixpoint) — no driver-side data
    * collection. For adversarially deep graphs (long chains) swap in the
    * alternating large-star/small-star rounds (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — same
    * per-round shape, O(log n) rounds; not needed for dedup clusters.
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a", dstCol: String = "id_b",
                          maxIter: Int = 50): DataFrame = {
    // fail fast on non-integral id columns: a silent cast("long") would
    // turn string/UUID ids into nulls and report zero components
    Seq(srcCol, dstCol).foreach { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = edges.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"connectedComponents needs integral vertex ids; '$c' is ${dt.catalogString} " +
          "(map string ids to a surrogate long key first)")
    }
    val sym = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val e = sym.union(sym.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint()
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // coalesce: an empty edge list means an empty label table (sum null)
    var prevSum = labels.agg(coalesce(sum("label"), lit(0L))).head().getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor labels ∪ own label → min per vertex: one shuffle
      labels = e.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("label"))
        .union(labels)
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

  /** Dup-cluster summary over near-dup edges: one row per component with
    * the canonical kept doc (minimum id), the member count, and the
    * sorted member list — the decision table a dedup job applies.
    */
  def dupClusters(edges: DataFrame, srcCol: String = "id_a", dstCol: String = "id_b",
                  maxIter: Int = 50): DataFrame =
    connectedComponents(edges, srcCol, dstCol, maxIter)
      .groupBy(col("component").as("keep_id"))
      .agg(count(lit(1)).cast("long").as("cluster_size"),
        sort_array(collect_list(col("id"))).as("members"))
}
