package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph scoring beyond the connected-component operators in
  * [[Dedup]]: PageRank under the integer micro-unit discipline that
  * makes every other scoring operator in this engine oracle-exact.
  *
  * All rank mass lives in BIGINT "pico-units" (1e12 = total mass 1.0):
  * per-edge contributions are integer divisions (`r div outdeg`), the
  * damping step is `(85 · Σ) div 100` — no floating point anywhere, so
  * results are independent of aggregation fold order, partitioning, and
  * engine libm. The deliberate cost is the floor at each division
  * (≤ outdeg pico-units of mass per node per iteration — at 1e12 scale,
  * noise in the 12th decimal).
  *
  * Scale shape: each iteration is one shuffle join of the edge list
  * against the current rank vector on `src` plus one aggregation on
  * `dst` — the textbook distributed PR step. The degree table joins in
  * BROADCAST (node-sized, not edge-sized). Lineage is truncated with a
  * `localCheckpoint` every `checkpointEvery` iterations, same policy as
  * [[Dedup.clusters]].
  */
object Graph {

  private val TotalMass = 1000000000000L // 1e12 pico-units = rank mass 1.0

  /** PageRank over an edge list `(src, dst)` (directed; pass both
    * directions for an undirected graph). Every node must appear as a
    * `src` at least once (true for undirected graphs by construction) —
    * VALIDATED by default, not assumed: a dangling (dst-only) node would
    * silently drop from the rank vector and leak its incoming mass every
    * iteration, so the precondition is checked with one node-sized
    * anti-join up front and violations fail loudly. A caller whose edge
    * list is two-directional by construction may pass `validate = false`
    * to skip that pass. Damping 0.85, `iterations` full steps from the
    * uniform vector.
    * Returns (node, rank_pico) with rank in pico-units (1e12 = mass 1.0).
    */
  /** When `broadcastRank` is set, the per-iteration rank vector and
    * contribution sums ride BROADCAST joins instead of shuffling the
    * edge list: each iteration becomes one edge-scan with map-side
    * joins plus a node-sized aggregation — the right plan whenever the
    * node set is dimension-sized (catalog entities, hosts, users),
    * even though edges are fact-sized. Leave it off for graphs whose
    * NODE set is itself beyond driver memory (web graphs): the shuffle
    * join is the textbook scale-out there.
    */
  def pageRank(edges: DataFrame, iterations: Int = 3,
               checkpointEvery: Int = 5,
               validate: Boolean = true,
               broadcastRank: Boolean = false): DataFrame = {
    require(iterations >= 1)
    val e0 = edges.select(col("src"), col("dst"))
    // Broadcast mode re-scans the edge SUBTREE every iteration (there is
    // no shuffle whose exchange Catalyst could reuse), so derivation work
    // upstream of the edge list (distinct, unions) would be re-paid
    // 3× per run; one lineage-truncating materialization amortizes it.
    // Shuffle mode keeps the lazy composition — its per-iteration
    // exchanges ARE reused (see below).
    val e = if (broadcastRank) e0.localCheckpoint() else e0
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    if (validate) {
      // one extra job (node-sized distinct + anti join, early-out via
      // isEmpty's limit-1) — the price of never returning a subtly
      // smaller, mass-leaking result on a directed graph. A caller whose
      // edges are two-directional BY CONSTRUCTION (so every dst is also
      // a src) may pass validate = false and skip the pass; the default
      // stays safe.
      val dangling = e.select(col("dst").as("node")).distinct()
        .join(deg.select(col("node")), Seq("node"), "left_anti")
      require(dangling.isEmpty,
        "pageRank: edge list has dst-only (dangling) node(s); every node " +
          "must appear as src at least once — pass both directions for " +
          "undirected graphs, or add self-loops / drop dangling edges")
    }
    val n = deg.agg(count(lit(1)).as("n"))
    var rank = deg.crossJoin(broadcast(n))
      .select(col("node"), expr(s"${TotalMass}L div n").as("r"))
    // DELIBERATELY no persist of e/deg: for the few iterations PR needs,
    // the whole loop composes into ONE lazy plan, and Catalyst reuses
    // the repeated edge/degree exchanges across iterations
    // (ReusedExchange) — measured ~1.4× faster at sf0.1 than
    // materializing them through the block store, which pays
    // serialization plus a plan-breaking eager barrier per input. Deep
    // iteration counts hit lineage growth instead; `checkpointEvery`
    // truncates it, trading that reuse back for bounded plans.
    def hint(df: DataFrame): DataFrame =
      if (broadcastRank) broadcast(df) else df
    for (i <- 1 to iterations) {
      val contrib = e
        .join(broadcast(deg.withColumnRenamed("node", "src")), "src")
        .join(hint(rank.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
      val summed = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = deg.select(col("node"))
        .join(hint(summed), Seq("node"), "left")
        .crossJoin(broadcast(n))
        .select(col("node"),
          expr(s"(${15 * TotalMass / 100}L div n) + (85 * coalesce(s, 0L)) div 100")
            .as("r"))
      if (i % checkpointEvery == 0 && i < iterations)
        rank = rank.localCheckpoint()
    }
    rank.select(col("node"), col("r").as("rank_pico"))
  }
}
