package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typo-robust entity linking: SymSpell-style deletion-neighborhood
  * blocking + exact edit-distance verification — the fuzzy complement to
  * [[Linker]]'s exact alias join (a web corpus misspells entity names; an
  * exact dictionary silently drops those mentions).
  *
  * Blocking guarantee (the SymSpell invariant, Garbe's symmetric-delete
  * algorithm): if levenshtein(a, b) <= 1 then the deletion neighborhoods
  * del1(a) and del1(b) — each string plus all of its single-character
  * deletions — intersect. Proof by case: equal strings share themselves;
  * a substitution at i means deleting position i from both sides yields
  * the same string; an insertion/deletion means one side IS a del1 of the
  * other. So an EQUI join on neighborhood keys finds every candidate at
  * distance <= 1 (recall 1.0, property-locked by `FuzzyLinkSpec`), and the
  * exact `levenshtein` verify drops the false positives.
  *
  * Scale shape: both sides explode to O(rows · len) short keys — linear,
  * never the all-pairs product a naive fuzzy join would plan; the
  * candidate join is a plain hash join on the key; verification and
  * best-candidate selection are one codegen'd `levenshtein` plus one
  * aggregation keyed on the surface. The alias side's expansion is
  * index-buildable once per dictionary and reusable across batches (the
  * same economics as the dedup band index).
  */
object FuzzyLink {

  /** Explode `srcCol` to its deletion-neighborhood keys (`__k`): the string
    * itself plus every single-character deletion, deduplicated ("aa" yields
    * "a" once). Callers must not feed empty strings. */
  private def withDel1Keys(df: DataFrame, srcCol: String): DataFrame =
    df.filter(length(col(srcCol)) >= 1)
      .withColumn("__k", explode(expr(
        s"array_union(array($srcCol), transform(sequence(1, length($srcCol)), " +
          s"i -> concat(substr($srcCol, 1, i - 1), substr($srcCol, i + 1))))")))

  /** Resolve each distinct `surface` to its best alias within edit distance
    * 1: candidates via the deletion-neighborhood equi join, verified with
    * exact levenshtein, ranked by (distance ASC, prior DESC, entity_iri,
    * alias_norm) — a total order, so the answer is deterministic at any
    * parallelism. `aliases` carries (alias_norm, entity_iri, prior); like
    * [[Linker.linkRelational]] the alias side reduces to its best row per
    * alias first, and the join strategy is left to AQE. Output:
    * (surface, alias_norm, entity_iri, lev). */
  def resolve(surfaces: DataFrame, aliases: DataFrame): DataFrame = {
    val ak = withDel1Keys(
      aliases.select(col("alias_norm")).distinct(), "alias_norm")
      .select(col("alias_norm"), col("__k"))
    resolveAgainstKeys(surfaces, ak, aliases)
  }

  /** Materialize the alias-side deletion-key index as a `__k`-bucketed,
    * sorted table — the dictionary's expansion is paid ONCE per dictionary
    * instead of once per mention batch, and the bucketed layout
    * pre-shuffles the index on the join key so each batch's candidate join
    * reads it exchange-free (only the surface side shuffles —
    * `FuzzyLinkSpec` locks the plan). The same stored-index economics as
    * `Dedup.writeBandIndex` and `Ann.buildIvfIndex`. */
  def writeAliasIndex(aliases: DataFrame, table: String, buckets: Int = 16): Unit =
    withDel1Keys(aliases.select(col("alias_norm")).distinct(), "alias_norm")
      .select(col("alias_norm"), col("__k"))
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, "__k")
      .sortBy("__k", "alias_norm")
      .saveAsTable(table)

  /** [[resolve]] against a stored [[writeAliasIndex]] table: identical
    * output (spec-locked), candidate join consumes the index's bucketing.
    * `aliases` still supplies (alias_norm, entity_iri, prior) for the
    * best-candidate ranking — at scale that side reduces to O(|aliases|)
    * before joining only the verified candidates. */
  def resolveIndexed(surfaces: DataFrame, aliases: DataFrame, indexTable: String): DataFrame =
    resolveAgainstKeys(surfaces, surfaces.sparkSession.table(indexTable), aliases)

  private def resolveAgainstKeys(surfaces: DataFrame, aliasKeys: DataFrame,
      aliases: DataFrame): DataFrame = {
    val sk = withDel1Keys(surfaces.select(col("surface")).distinct(), "surface")
      .select(col("surface"), col("__k"))
    val cands = sk.join(aliasKeys, "__k")
      .select(col("surface"), col("alias_norm")).distinct()
      .withColumn("lev", levenshtein(col("surface"), col("alias_norm")).cast("long"))
      .filter(col("lev") <= 1)
    val best = aliases.groupBy("alias_norm")
      .agg(min_by(
        struct(col("entity_iri"), col("prior")),
        struct((col("prior") * -1).as("negPrior"), col("entity_iri"))).as("b"))
      .select(col("alias_norm"),
        col("b.entity_iri").as("entity_iri"), col("b.prior").as("prior"))
    cands.join(best, "alias_norm")
      .groupBy("surface")
      .agg(min_by(
        struct(col("alias_norm"), col("entity_iri"), col("lev")),
        struct(col("lev"), (col("prior") * -1).as("negPrior"),
          col("entity_iri"), col("alias_norm"))).as("m"))
      .select(col("surface"), col("m.alias_norm").as("alias_norm"),
        col("m.entity_iri").as("entity_iri"), col("m.lev").as("lev"))
  }
}
