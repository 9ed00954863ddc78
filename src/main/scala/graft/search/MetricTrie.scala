package graft.search

import scala.collection.mutable

import graft.model.TreeLimits
import graft.names.{Glob, MetricNames}
import org.apache.spark.sql.DataFrame

/** Driver-side in-memory trie over the current metric tree — the
  * serving-latency cache the reference keeps hot
  * (`/root/reference/src/main/java/ru/yandex/market/graphouse/search/tree/MetricTree.java:22-120`):
  * dashboard autocomplete and render fan-out issue thousands of glob
  * lookups per second, which should not each pay a Spark job.
  *
  * CONTRACT: `search(q)` returns exactly what
  * [[MetricSearchOps.search]] returns over the same tree state
  * (level-count match, per-level glob, optional trailing dot for dirs,
  * visibility at emit, invalid glob → empty). The trie is an OPTIONAL
  * cache: correctness never depends on it, and any staleness is bounded
  * by the refresh cadence (the reference tolerates a 120 s propagation
  * window the same way, `search/MetricSearch.java:86-89`).
  *
  * Scale: one node per tree path (~10M names is the reference's design
  * center); segments are interned by the child map, lookups are
  * per-level hash hits for literal segments and compiled-regex scans
  * only for wildcard levels. Not thread-safe for concurrent refresh;
  * swap whole instances instead (build-and-swap like the reference's
  * startup load).
  */
final class MetricTrie private (root: MetricTrie.Node,
                                @volatile private var watermark: Long) {

  /** All (name, status) rows matching the glob query; visibility applied
    * at emit. Invalid globs return empty, matching the reference.
    */
  def search(query: String): Seq[(String, String)] = {
    val levels = MetricNames.splitToLevels(query)
    if (levels.isEmpty) return Nil
    // level-count parity with the relational path: split drops trailing
    // empty segments ("a.b.." → 2) but MetricNames.level counts dots
    // (3); the relational filter can match nothing there, so neither may
    // the trie
    if (MetricNames.level(query) != levels.length) return Nil
    // pre-validate every level: one invalid level → empty result
    val matchers = levels.map { seg =>
      if (Glob.hasWildcards(seg)) Glob.levelToRegex(seg) match {
        case Some(re) => Right(java.util.regex.Pattern.compile(re))
        case None     => return Nil
      }
      else Left(seg)
    }
    var frontier = List(root)
    matchers.foreach { m =>
      frontier = m match {
        case Left(lit) => frontier.flatMap(n => n.children.get(lit))
        case Right(p)  => frontier.flatMap(_.children.collect {
          case (seg, child) if p.matcher(seg).matches() => child
        })
      }
      if (frontier.isEmpty) return Nil
    }
    frontier.flatMap(n => n.metricRow.toSeq ++ n.dirRow.toSeq)
      .filter { case (_, status) => MetricSearchOps.visibleStatus(status) }
  }

  /** Node count (diagnostics / capacity checks). */
  def size: Long = {
    def walk(n: MetricTrie.Node): Long = 1L + n.children.valuesIterator.map(walk).sum
    walk(root) - 1 // don't count the synthetic root
  }

  /** Incremental refresh: fold only tree rows at or past the watermark
    * (the max `updated` this trie has applied) into the live structure,
    * instead of rebuilding 10M nodes per cadence tick. The filter
    * pushes to the parquet scan, so a refresh costs rows-since-last-
    * refresh, not tree size; application is idempotent (newest status
    * per name overwrites), which is why the watermark is INCLUSIVE —
    * same-second rows written after a refresh re-apply harmlessly on
    * the next one rather than being missed forever. Returns the number
    * of names applied.
    *
    * Concurrency contract, same class as the reference's in-place
    * in-memory tree updates: ONE writer; concurrent readers may observe
    * a partially-applied delta, bounded by the refresh cadence — the
    * same staleness window `fromTree` rebuild-and-swap already accepts
    * between refreshes. Swap whole instances instead when readers need
    * a consistent point-in-time snapshot.
    */
  def applyDelta(tree: DataFrame): Long = {
    import org.apache.spark.sql.functions.col
    val delta = MetricSearchOps.currentTree(tree.filter(col("updated") >= watermark))
      .select("name", "status", "updated").collect()
    var maxSeen = watermark
    delta.foreach { row =>
      MetricTrie.insert(root, row.getString(0), row.getString(1))
      maxSeen = math.max(maxSeen, row.getLong(2))
    }
    watermark = maxSeen
    delta.length.toLong
  }

  /** [[search]] plus limit-notification pseudo-rows — trie twin of
    * [[MetricSearchOps.searchWithLimits]] (reference
    * `MetricTree.appendLimitNotificationsIfNeeded`,
    * `search/tree/MetricTree.java:181-188`): a query whose last level is
    * the bare `*` prepends `<parent>._SUBDIRS_LIMIT_REACHED_MAX_N` /
    * `<parent>._METRICS_LIMIT_REACHED_MAX_N` rows for each matched
    * visible parent dir at or past a cap.
    */
  def searchWithLimits(query: String, limits: TreeLimits): Seq[(String, String)] = {
    if (!limits.enabled) return search(query)
    val levels = MetricNames.splitToLevels(query)
    if (levels.isEmpty || levels.last != "*" ||
      MetricNames.level(query) != levels.length) return search(query)
    // walk to the parent frontier with the same per-level matching as
    // search; the synthetic root (query "*") is always visible
    var frontier = List(root)
    levels.init.foreach { seg =>
      frontier =
        if (Glob.hasWildcards(seg)) Glob.levelToRegex(seg) match {
          case Some(re) =>
            val p = java.util.regex.Pattern.compile(re)
            frontier.flatMap(_.children.collect {
              case (s, child) if p.matcher(s).matches() => child
            })
          case None => Nil
        }
        else frontier.flatMap(_.children.get(seg))
    }
    val notifs = frontier.flatMap { n =>
      val parentVisible = (n eq root) ||
        n.dirRow.exists { case (_, st) => MetricSearchOps.visibleStatus(st) }
      if (!parentVisible) Nil
      else {
        val parentName = n.dirRow.map(_._1).getOrElse("")
        val dirs = n.children.valuesIterator.count(_.dirRow.isDefined)
        val metrics = n.children.valuesIterator.count(_.metricRow.isDefined)
        val d = if (limits.maxSubDirsPerDir > 0 && dirs >= limits.maxSubDirsPerDir)
          Seq((parentName + limits.subdirsMessage, "SIMPLE")) else Nil
        val m = if (limits.maxMetricsPerDir > 0 && metrics >= limits.maxMetricsPerDir)
          Seq((parentName + limits.metricsMessage, "SIMPLE")) else Nil
        d ++ m
      }
    }
    notifs ++ search(query)
  }
}

object MetricTrie {

  private[search] final class Node {
    val children: mutable.HashMap[String, Node] = mutable.HashMap.empty
    var metricRow: Option[(String, String)] = None
    var dirRow: Option[(String, String)] = None
  }

  /** Build from the append-only tree table: collects the CURRENT state
    * (latest status per name) to the driver. `maxNodes` guards driver
    * memory — the reference's ops guidance is the same shape (>10M
    * names ⇒ raise the 4 GB default heap, `doc/config.md:17-19`).
    */
  def fromTree(tree: DataFrame, maxNodes: Long = 20000000L): MetricTrie = {
    // persist across the guard count and the collect: one currentTree
    // aggregation per refresh, not two
    val current = MetricSearchOps.currentTree(tree).select("name", "status", "updated").persist()
    try {
      val n = current.count()
      require(n <= maxNodes,
        s"metric tree has $n names > maxNodes=$maxNodes; raise the limit (and driver memory)")
      val root = new Node
      var wm = 0L
      current.collect().foreach { row =>
        insert(root, row.getString(0), row.getString(1))
        wm = math.max(wm, row.getLong(2))
      }
      new MetricTrie(root, wm)
    } finally current.unpersist()
  }

  private[search] def insert(root: Node, name: String, status: String): Unit = {
    val segs = MetricNames.splitToLevels(name)
    var node = root
    segs.foreach { s => node = node.children.getOrElseUpdate(s, new Node) }
    if (MetricNames.isDir(name)) node.dirRow = Some((name, status))
    else node.metricRow = Some((name, status))
  }
}
