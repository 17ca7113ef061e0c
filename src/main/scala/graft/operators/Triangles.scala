package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an undirected simple graph, with the
  * degree-ordered orientation used by the classic distributed algorithms
  * (Suri–Vassilvitskii MapReduce triangle counting; see also Schank's
  * forward algorithm): orient every edge from its lower-(degree, id)
  * endpoint to its higher one, build wedges only out of each vertex's
  * oriented neighbor list, and close them against the oriented edge set.
  *
  * Why this shape at scale: with orientation, the wedge count is
  * Σ_v C(outdeg(v), 2) where outdeg is bounded by O(√m) on any graph
  * (and by the arboricity in general) — a hub with degree 10⁷ in the raw
  * graph contributes almost no wedges because nearly all its edges point
  * INTO it. The naive undirected 3-way self-join explodes on exactly
  * those hubs. Three shuffles total (degree agg, wedge self-join,
  * closing join), all equi-joins — no cross products.
  *
  * Input: `edges(src, dst)` undirected, any orientation/duplicates/loops
  * (canonicalized and deduplicated here). Output: one row `n_triangles`.
  */
object Triangles {

  /** Co-occurrence edges from (group, member) rows — e.g. (url, entity) —
    * with a deterministic per-group member cap applied BEFORE the pairwise
    * self-join: a group with k members emits C(k,2) pairs, so one link-farm
    * page with 10⁴ entities would emit 10⁸ rows from a single task. The cap
    * is a row_number window (planned as a map-side WindowGroupLimit,
    * `PlanQualitySpec`), ordered by member so the kept set is reproducible
    * cross-engine. */
  def groupedPairs(rows: DataFrame, groupCol: String, memberCol: String,
      memberCap: Int): DataFrame = {
    val capped = cappedMembers(rows, groupCol, memberCol, memberCap)
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b, col(s"a.$groupCol") === col(s"b.$groupCol") &&
        col(s"a.$memberCol") < col(s"b.$memberCol"))
      .select(col(s"a.$memberCol").as("src"), col(s"b.$memberCol").as("dst"))
  }

  /** The SHARED deterministic per-group member cap (row_number ordered by
    * member, planned as a map-side WindowGroupLimit): every co-mention
    * derivation — pair expansion here, the entity-association denominators
    * — must cap through this one definition or their "same capped set"
    * consistency silently breaks. */
  def cappedMembers(rows: DataFrame, groupCol: String, memberCol: String,
      memberCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    rows.select(col(groupCol), col(memberCol)).distinct()
      .withColumn("__rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(memberCol)))
      .filter(col("__rn") <= memberCap).drop("__rn")
  }

  /** Canonical simple edge set: src < dst, distinct, loops dropped. */
  def canonical(edges: DataFrame): DataFrame =
    edges
      .filter(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()

  def count(edges: DataFrame): DataFrame = {
    // the edge set is referenced three times below (degrees, orientation,
    // closing join) and each reference would re-execute the FULL upstream
    // lineage — for a KG co-mention graph that is the whole extract+link
    // pipeline, six times over. localCheckpoint materializes the (much
    // smaller than the corpus) edge set once and truncates lineage, same
    // pattern as Dedup.components.
    val e = canonical(edges).localCheckpoint()
    val deg = e.select(col("src").as("v"))
      .unionAll(e.select(col("dst").as("v")))
      .groupBy("v").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))

    // orient u -> w iff (deg(u), u) < (deg(w), w): a strict total order,
    // so every edge gets exactly one direction
    val withDeg = e
      .join(deg.withColumnRenamed("v", "src").withColumnRenamed("deg", "sdeg"), "src")
      .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    val oriented = withDeg.select(
      when(col("sdeg") < col("ddeg") ||
           (col("sdeg") === col("ddeg") && col("src") < col("dst")),
        struct(col("src").as("u"), col("dst").as("w")))
        .otherwise(struct(col("dst").as("u"), col("src").as("w")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))

    // wedges (u; w1 < w2 by id) from each pivot's oriented out-neighbors —
    // orientation bounds the wedge fan-out; the close is checked against the
    // id-canonical undirected set (the closing edge's own orientation depends
    // on degrees, so the id-ordered canonical form is the stable join key)
    val a = oriented.as("a")
    val b = oriented.as("b")
    val wedges = a.join(b, col("a.u") === col("b.u") && col("a.w") < col("b.w"))
      .select(col("a.w").as("src"), col("b.w").as("dst"))
    wedges.join(e, Seq("src", "dst"), "left_semi")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
  }
}
