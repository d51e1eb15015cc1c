package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for corpus curation (beyond the reference's
  * surface; see SURVEY.md §2 "LLM-data-pipeline operators"). The driving use
  * case is transitive near-duplicate clustering: pairwise LSH verdicts (a~b,
  * b~c) must collapse into one cluster even when a and c never collide.
  */
object Graph {

  /** Connected components of an undirected edge list by alternating
    * large-star / small-star contraction (Kiveris, Lattanzi, Mirrokni,
    * Rastogi, Vassilvitskii — "Connected Components in MapReduce and
    * Beyond", SoCC 2014). Returns one `(node, component)` row per distinct
    * node appearing in `edges`, where `component` is the smallest node id of
    * the node's component.
    *
    * Scale shape: each round is two groupBy-min passes plus a key join — no
    * all-pairs work, no driver-side graph. Both operations shuffle on node
    * id, so a massive component spreads across partitions instead of
    * hot-spotting one task; edge count never grows beyond the symmetric
    * closure and contracts geometrically (the paper proves O(log n) rounds;
    * LSH-duplicate graphs — dense clusters, tiny diameter — converge in 2-3).
    * Lineage is cut per round with an eager localCheckpoint, which keeps the
    * plan O(1) per iteration instead of doubling (on a cluster with a
    * checkpoint dir, swap for reliable `checkpoint` to add fault tolerance
    * past executor loss).
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxIter: Int = 50): DataFrame = {
    val nodes = edges.select(col(srcCol).as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .distinct()

    // canonical (a > b) orientation, self-loops dropped
    var e = edges
      .select(greatest(col(srcCol), col(dstCol)).as("a"), least(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var eCount = e.count()

    var converged = eCount == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: every node u links its LARGER neighbors v to
      // m = min(Γ(u) ∪ {u}); m ≤ u < v keeps the (a > b) orientation
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val lMin = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(lMin, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .distinct()

      // small-star: every node a links its (all smaller, post-large-star)
      // neighbors b — and itself — to m = min(Γ(a) ∪ {a})
      val sMin = large.groupBy("a").agg(min("b").as("m"))
      val next = large.join(sMin, "a")
        .select(col("b").as("x"), col("m"))
        .where(col("x") =!= col("m"))
        .unionByName(sMin.select(col("a").as("x"), col("m")))
        .select(greatest(col("x"), col("m")).as("a"), least(col("x"), col("m")).as("b"))
        .where(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint(true)

      // fixpoint test on the canonical sets: equal counts + empty difference
      val nextCount = next.count()
      converged = nextCount == eCount && next.except(e).isEmpty
      e = next
      eCount = nextCount
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // fixpoint = disjoint stars (v, root); roots and isolated nodes map to
    // themselves
    nodes.join(e.select(col("a").as("node"), col("b").as("component")), Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }
}
