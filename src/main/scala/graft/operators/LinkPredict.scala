package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction — the classic KG-completion candidate
  * generator: node pairs that share many neighbors but are not yet edges
  * are the missing-link candidates a completion model scores first
  * (common-neighbors is the standard strong baseline; Adamic-Adar and
  * resource-allocation are reweightings of the same wedge expansion).
  *
  * Scale shape: wedges come from the SAME hub-capped per-group pair
  * expansion as the triangle counter ([[Triangles.groupedPairs]] — the cap
  * is applied map-side before the C(deg, 2) blow-up, so a celebrity node
  * contributes C(cap, 2) wedges, not C(10^6, 2)); existing edges drop via
  * one anti join; the top-k is a TakeOrderedAndProject, never a full sort.
  */
object LinkPredict {

  /** Top-`k` non-edge pairs by common-neighbor count over the canonical
    * edge set, deterministic total order (n_common DESC, src, dst).
    * `memberCap` bounds each neighbor's wedge fan-out (the hub cap). */
  def commonNeighbors(edges: DataFrame, memberCap: Int, k: Int): DataFrame = {
    // canonical edges referenced twice (wedges + anti join): materialize once
    val e = Triangles.canonical(edges).localCheckpoint()
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    // group = the shared neighbor, members = its adjacency -> wedge pairs
    val wedges = Triangles.groupedPairs(sym, "src", "dst", memberCap)
    wedges.groupBy("src", "dst").agg(count(lit(1)).as("n_common"))
      .join(e, Seq("src", "dst"), "left_anti")
      .orderBy(desc("n_common"), asc("src"), asc("dst"))
      .limit(k)
  }

  /** Resource-allocation index (Zhou et al. 2009 — the strongest of the
    * classic local link-prediction scores): each common neighbor z
    * contributes 1/deg(z), so hubs connect everything weakly and
    * low-degree bridges score high. Kept INTEGER-EXACT the house way:
    * the contribution is the micro-weight 10¹² DIV deg(z) (pure integer
    * division, engine-exact), summed per pair — no float accumulation to
    * diverge between engines or partitionings. Same wedge/cap/anti-join
    * shape as [[commonNeighbors]], plus one degree join on the shared
    * neighbor (broadcast-sized: O(nodes)). Degrees are TRUE degrees from
    * the full adjacency; the cap bounds only wedge fan-out. */
  def resourceAllocation(edges: DataFrame, memberCap: Int, k: Int): DataFrame = {
    val e = Triangles.canonical(edges).localCheckpoint()
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "z")
    val capped = Triangles.cappedMembers(sym, "src", "dst", memberCap)
    val a = capped.as("a"); val b = capped.as("b")
    val wedges = a.join(b, col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.src").as("z"), col("a.dst").as("u"), col("b.dst").as("v"))
    wedges.join(deg, "z")
      .select(col("u").as("src"), col("v").as("dst"),
        expr("CAST(1000000000000 AS BIGINT) DIV deg").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("ra_micro"))
      .join(e, Seq("src", "dst"), "left_anti")
      .orderBy(desc("ra_micro"), asc("src"), asc("dst"))
      .limit(k)
  }
}
