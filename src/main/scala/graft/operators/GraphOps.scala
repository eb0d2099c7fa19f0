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
    * Spark job — the convergence count is fused into the aggregate
    * that materializes the round's checkpoint.
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
    while (iter < maxIter && !converged) {
      val nbrMin = labels
        .join(sym, col("id") === col("a"))
        .groupBy(col("b")).agg(min(col("label")).as("nbr_min"))
      // the round's starting label rides along as `prev` so the
      // convergence check needs no second join against `labels`
      val stepped = labels
        .join(nbrMin, col("id") === col("b"), "left")
        .select(col("id"), col("label").as("prev"),
                least(col("label"), coalesce(col("nbr_min"), col("label")))
                  .as("label"))
      val ptr = stepped
        .select(col("id").as("pid"), col("label").as("plabel"))
      val next = stepped
        .join(ptr, col("label") === col("pid"), "left")
        .select(col("id"), col("prev"),
                least(col("label"), coalesce(col("plabel"), col("label")))
                  .as("label"))
        .localCheckpoint(false)
      // Labels only ever decrease, so "no label changed" is fixpoint.
      // The change count is FUSED into the materializing aggregate:
      // one job per round both persists the checkpoint (every
      // partition, not whatever a limit-1 probe happens to touch) and
      // answers convergence — previously a separate probe job.
      converged = next
        .agg(count(when(col("label") < col("prev"), 1)).as("n_changed"))
        .head.getLong(0) == 0L
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint within $maxIter iterations")
    labels.select(col("id"), col("label").as("component"))
  }
}
