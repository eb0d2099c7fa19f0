package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph utilities backing the dedup layer. */
object GraphOps {

  /** Connected components via hash-min label propagation WITH pointer
    * jumping. Each iteration runs (1) a neighbor-min step — every node
    * takes the min label in its neighborhood (one shuffle-join + one
    * partial-min aggregate) — and (2) a pointer-jump step — label :=
    * label(label), a self-join that halves label-chain lengths. The
    * jump turns O(diameter) convergence into O(log diameter): a
    * 100 TB near-dup graph with a pathological chain component (doc A
    * ~ B ~ ... ~ Z) finishes in ~log2(chain) rounds instead of one
    * round per hop. This is the hash-min/pointer-jumping hybrid the
    * large-star/small-star literature (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") reduces to on min-labeled
    * graphs. Lineage is truncated per round via localCheckpoint so the
    * plan does not grow with iterations; each round runs exactly ONE
    * Spark job — the convergence witness (the exact label sum) is
    * fused into the aggregate that materializes the round's
    * checkpoint, and the neighbor-min step folds the node's own label
    * in through a union instead of a join-back (one fewer join per
    * round).
    *
    * Correctness of the fixpoint: labels start at self-id and only
    * ever decrease, always holding an id of a same-component node. At
    * a fixpoint with two labels m1 < m2 inside one component, some
    * edge would bridge differently-labeled nodes and the neighbor-min
    * step would have decreased the larger — contradiction; so a
    * fixpoint labels every node with its component's min id.
    *
    * @param nodes one column `id`
    * @param edges columns `a`, `b` — undirected pairs in any
    *              orientation; duplicates and self-loops tolerated
    * @return (id, component) with component = min id in the component
    * @throws IllegalStateException if maxIter rounds do not converge
    *         (honest failure beats a silently-partial clustering)
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false)
    var labels = nodes.select(col("id"), col("id").as("label"))
      .localCheckpoint(false)
    var iter = 0
    var converged = false
    // Convergence witness: labels only ever decrease pointwise, so the
    // label SUM is strictly decreasing until — and constant at — the
    // fixpoint. Tracking the sum across rounds replaces the old
    // `prev`-column + left-join-back formulation: one fewer join per
    // round (guide §2.4), one fewer checkpointed column, same fused
    // one-job-per-round materialization. DECIMAL(38,0) keeps the sum
    // exact at any node count / id magnitude (a double sum could make
    // two different label states compare equal).
    var prevSum: Option[java.math.BigDecimal] = None
    while (iter < maxIter && !converged) {
      // neighbor-min WITH self in one aggregate: min over (own label ∪
      // neighbors' labels) ≡ the old least(label, nbr_min) — the
      // labels ⋈ nbrMin join-back is gone
      val stepped = labels
        .union(sym.join(labels, col("id") === col("a"))
                 .select(col("b").as("id"), col("label")))
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      val ptr = stepped
        .select(col("id").as("pid"), col("label").as("plabel"))
      val next = stepped
        .join(ptr, col("label") === col("pid"), "left")
        .select(col("id"),
                least(col("label"), coalesce(col("plabel"), col("label")))
                  .as("label"))
        .localCheckpoint(false)
      // One job per round: the aggregate both persists the checkpoint
      // (every partition) and answers convergence.
      val sumNow = Option(next
        .agg(sum(col("label")).cast(
          org.apache.spark.sql.types.DecimalType(38, 0)).as("s"))
        .head.getDecimal(0))
      converged = (prevSum, sumNow) match {
        case (Some(p), Some(s)) => p.compareTo(s) == 0
        case (None, None)       => iter > 0 // empty node set: trivial fixpoint
        case _                  => false
      }
      prevSum = sumNow
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint within $maxIter iterations")
    labels.select(col("id"), col("label").as("component"))
  }
}
