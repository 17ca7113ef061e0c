package graft.link

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** SymSpell fuzzy linking: the deletion-neighborhood blocking invariant
  * (recall 1.0 at distance 1), resolution parity with a local brute-force
  * reference, and partition invariance. */
class FuzzyLinkSpec extends SparkTestBase {

  // classic DP levenshtein — the independent reference metric
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def del1(s: String): Set[String] =
    Set(s) ++ (0 until s.length).map(i => s.substring(0, i) + s.substring(i + 1))

  test("blocking invariant: any two strings within distance 1 share a deletion key") {
    val rng = new scala.util.Random(41)
    val alpha = "abcdef"
    (0 until 500).foreach { _ =>
      val a = (0 until (2 + rng.nextInt(8))).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      // one random edit: substitution, insertion, or deletion
      val b = rng.nextInt(3) match {
        case 0 => val i = rng.nextInt(a.length)
          a.substring(0, i) + alpha(rng.nextInt(alpha.length)) + a.substring(i + 1)
        case 1 => val i = rng.nextInt(a.length + 1)
          a.substring(0, i) + alpha(rng.nextInt(alpha.length)) + a.substring(i)
        case _ => val i = rng.nextInt(a.length)
          a.substring(0, i) + a.substring(i + 1)
      }
      assert(lev(a, b) <= 1)
      if (b.nonEmpty)
        assert(del1(a).intersect(del1(b)).nonEmpty, s"'$a' vs '$b' share no key")
    }
  }

  test("resolve matches a local brute-force reference on planted typos") {
    val sps = spark; import sps.implicits._
    val aliases = Seq(
      ("berlin", "ent:e1", 0.9), ("berline", "ent:e2", 0.8),
      ("paris", "ent:e3", 0.7), ("parts", "ent:e4", 0.95),
      ("tokyo", "ent:e5", 0.5), ("kyoto", "ent:e6", 0.6),
      ("madrid", "ent:e7", 0.4))
    val surfaces = Seq(
      "berlin",   // exact (lev 0 beats berline's lev 1)
      "berli",    // deletion: berlin wins on lev 1... also berline lev 2
      "pariss",   // insertion: paris
      "parid",    // substitution: paris (0.7) vs... parts lev 2? p-a-r-i-d / p-a-r-t-s = 2
      "tokio",    // substitution: tokyo
      "osaka")    // no candidate within 1
    val got = FuzzyLink.resolve(surfaces.toDF("surface"), aliases.toDF("alias_norm", "entity_iri", "prior"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getLong(3))).toMap
    // local brute force under the same (lev, prior DESC, iri, alias) order
    val want = surfaces.flatMap { s =>
      val cands = aliases.map { case (a, e, p) => (a, e, p, lev(s, a)) }.filter(_._4 <= 1)
      if (cands.isEmpty) None
      else {
        val (a, e, _, l) = cands.minBy { case (a, e, p, l) => (l, -p, e, a) }
        Some(s -> (a, e, l.toLong))
      }
    }.toMap
    assert(got == want)
    assert(!got.contains("osaka") && got.size == 5)
  }

  test("stored alias index: identical output, candidate join consumes the bucketing") {
    val sps = spark; import sps.implicits._
    val rng = new scala.util.Random(19)
    val alpha = "abcde"
    val aliases = (0 until 80).map { i =>
      val a = (0 until (3 + rng.nextInt(6))).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      (a, s"ent:e$i", rng.nextInt(100) / 100.0)
    }
    val surfaces = aliases.map(_._1).distinct.map(a => a.substring(0, a.length - 1))
      .filter(_.nonEmpty)
    val sd = surfaces.toDF("surface"); val ad = aliases.toDF("alias_norm", "entity_iri", "prior")
    graft.util.Warehouse.dropTable(spark, "fuzzy_alias_index")
    FuzzyLink.writeAliasIndex(ad, "fuzzy_alias_index", buckets = 4)
    val direct = FuzzyLink.resolve(sd, ad).collect().map(_.toString).sorted.toSeq
    val indexed = FuzzyLink.resolveIndexed(sd, ad, "fuzzy_alias_index")
      .collect().map(_.toString).sorted.toSeq
    assert(indexed.nonEmpty && indexed == direct)
    // plan lock: exactly one __k exchange (the surface side) — the index's
    // bucketing satisfies the join distribution
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = FuzzyLink.resolveIndexed(sd, ad, "fuzzy_alias_index")
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning\\(__k".r.findAllIn(plan).size == 1, plan)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("resolution is partition-invariant") {
    val sps = spark; import sps.implicits._
    val rng = new scala.util.Random(7)
    val alpha = "abcde"
    val aliases = (0 until 60).map { i =>
      val a = (0 until (3 + rng.nextInt(5))).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      (a, s"ent:e$i", rng.nextInt(100) / 100.0)
    }
    val surfaces = aliases.map(_._1).distinct.map(a => a.substring(0, a.length - 1))
      .filter(_.nonEmpty)
    val sd = surfaces.toDF("surface"); val ad = aliases.toDF("alias_norm", "entity_iri", "prior")
    def run(parts: Int) = FuzzyLink.resolve(sd.repartition(parts), ad.repartition(parts))
      .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(7))
    assert(run(1).nonEmpty)
  }
}
