package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic FILTERED negative sampling for KG-embedding training —
  * the corrupted-triple generator every TransE-family trainer needs
  * (Bordes et al., "Translating Embeddings", NIPS 2013: corrupt one side
  * of each positive, and in the *filtered* protocol drop corruptions that
  * are themselves true triples).
  *
  * Determinism instead of RNG: the candidate entity for negative `k` of
  * edge (src, dst) is a mixed-congruential function of (src, dst, k)
  * modulo the vocabulary size — reproducible across partitionings,
  * engines, and reruns (the property every oracle and every resumable
  * training pipeline wants; RNG-based samplers cannot be checkpoint-safe
  * without dragging seeds through lineage). The mixing constants are
  * classic Weyl/LCG multipliers; spread is verified in the spec.
  *
  * Scale shape (100 TB): candidate generation is MAP-SIDE ONLY (an
  * explode of k=1..K plus integer arithmetic — no shuffle, no state); the
  * vocabulary size is one scalar broadcast; the filtered check is a
  * single anti-join of candidates against the true edge set on the
  * corrupted pair key. Nothing here is proportional to |V|² — the output
  * is ≤ K·|E| rows and the only shuffle carries exactly those rows.
  *
  * Input: `edges(src, dst)` CANONICAL id-space positives (src < dst,
  * distinct — [[Triangles.canonical]]); ids non-negative ints. Output:
  * (src_id, dst_id, k, neg_id) — the tail-corrupted candidate for each
  * k = 1..negsPerEdge that survives the filtered protocol (candidate
  * differs from both endpoints and the corrupted pair is not a true
  * edge).
  */
object NegativeSampling {

  /** Tail-corruption negatives under the filtered protocol. The entity
    * vocabulary is taken from the edge node set itself (max id + 1) so
    * the sampler is a pure function of its input relation. */
  def tailCorrupt(edges: DataFrame, negsPerEdge: Int): DataFrame = {
    require(negsPerEdge >= 1, s"negsPerEdge must be >= 1, got $negsPerEdge")
    // referenced twice (candidate source + filter side): materialize the
    // edge set once, lineage truncated — same discipline as Triangles.count
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .localCheckpoint()
    // one vocabulary scalar off a distributed max over the materialized
    // edge set — a single-row action (the Ann-style bounded fetch), so the
    // candidate stage below is literally map-side: no join of any kind,
    // just the explode and integer arithmetic. max() over zero rows is
    // NULL: an empty edge set yields zero negatives, not an NPE
    val vocabRow = e.agg((greatest(max("src"), max("dst")) + 1L).as("n_vocab")).head()
    if (vocabRow.isNullAt(0)) {
      return e.sparkSession.emptyDataFrame
        .select(lit(0).as("src_id"), lit(0).as("dst_id"),
          lit(0).as("k"), lit(0).as("neg_id"))
    }
    val nVocab = vocabRow.getLong(0)
    val ks = array((1 to negsPerEdge).map(lit): _*)
    val cand = e
      .select(col("src"), col("dst"), explode(ks).as("k"))
      .withColumn("neg",
        (col("src") * 40503L + col("dst") * 69069L + col("k") * 97561L)
          % lit(nVocab))
      .filter(col("neg") =!= col("src") && col("neg") =!= col("dst"))
    // filtered protocol: the corrupted pair (src, neg) — canonicalized,
    // since the positive set is undirected-canonical — must not be true
    cand
      .join(e.select(col("src").as("__cs"), col("dst").as("__cd")),
        least(col("src"), col("neg")) === col("__cs") &&
          greatest(col("src"), col("neg")) === col("__cd"),
        "left_anti")
      .select(col("src").cast("int").as("src_id"),
        col("dst").cast("int").as("dst_id"),
        col("k").cast("int").as("k"),
        col("neg").cast("int").as("neg_id"))
  }
}
