package graft.operators

import graft.SparkTestBase
import graft.operators.Bgp.Pattern

/** Randomized semantics lock for the BGP family: Bgp.solve / solveMinus /
  * solveOptional compared against an INDEPENDENT in-memory reference
  * evaluator (nested-loop pattern matching with SPARQL bag semantics) on
  * seeded random graphs and random connected patterns. The reference is
  * deliberately naive — different code shape, same defined semantics. */
class BgpRandomSpec extends SparkTestBase {

  private type T = (String, String, String)

  /** nested-loop reference: bag of bindings (variable -> value maps) */
  private def refSolve(triples: Seq[T], patterns: Seq[Pattern]): Seq[Map[String, String]] = {
    def matchOne(t: T, pt: Pattern): Option[Map[String, String]] = {
      val pairs = Seq(pt.s -> t._1, pt.p -> t._2, pt.o -> t._3)
      pairs.foldLeft(Option(Map.empty[String, String])) {
        case (None, _) => None
        case (Some(m), (term, v)) =>
          if (term.startsWith("?")) {
            val k = term.tail
            m.get(k) match {
              case Some(x) if x != v => None
              case _ => Some(m + (k -> v))
            }
          } else if (term == v) Some(m) else None
      }
    }
    patterns.foldLeft(Seq(Map.empty[String, String])) { (acc, pt) =>
      for {
        m <- acc
        t <- triples
        b <- matchOne(t, pt)
        if b.forall { case (k, v) => m.get(k).forall(_ == v) }
      } yield m ++ b
    }
  }

  private def canon(bindings: Seq[Map[String, String]]): Seq[String] =
    bindings.map(m => m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(","))
      .sorted

  private def dfBindings(df: org.apache.spark.sql.DataFrame): Seq[Map[String, String]] = {
    val cols = df.columns
    df.collect().toSeq.map(r => cols.zipWithIndex.collect {
      case (c, i) if !r.isNullAt(i) => c -> r.getString(i)
    }.toMap)
  }

  /** random connected patterns: each one reuses a variable already bound
    * when possible; every pattern binds >=1 var, no within-pattern repeats */
  private def genCase(rnd: scala.util.Random): (Seq[T], Seq[Pattern]) = {
    val nodes = (0 until 6).map(i => s"n$i")
    val preds = (0 until 3).map(i => s"p$i")
    val triples = Seq.fill(20 + rnd.nextInt(20))(
      (nodes(rnd.nextInt(nodes.size)), preds(rnd.nextInt(preds.size)),
        nodes(rnd.nextInt(nodes.size))))
    val allVars = Vector("a", "b", "c", "d")
    val bound = scala.collection.mutable.Buffer[String]()
    def mkPattern(first: Boolean): Pattern = {
      while (true) {
        val used = scala.collection.mutable.Set[String]()
        def term(constPool: Seq[String]): String =
          if (rnd.nextInt(100) < 55) {
            val pool = allVars.filterNot(used.contains)
            if (pool.isEmpty) constPool(rnd.nextInt(constPool.size))
            else { val v = pool(rnd.nextInt(pool.size)); used += v; s"?$v" }
          } else constPool(rnd.nextInt(constPool.size))
        val p = Pattern(term(nodes), term(preds), term(nodes))
        val vars = p.productIterator.collect {
          case s: String if s.startsWith("?") => s.tail
        }.toSeq
        val connected = first || vars.exists(bound.contains)
        if (vars.nonEmpty && connected) {
          bound ++= vars.filterNot(bound.contains)
          return p
        }
      }
      sys.error("unreachable")
    }
    val pats = mkPattern(first = true) +: Seq.fill(1 + rnd.nextInt(2))(mkPattern(first = false))
    (triples, pats)
  }

  test("solve matches the nested-loop reference on 25 seeded random cases") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(4242)
    var nonEmpty = 0
    for (i <- 0 until 25) {
      val (triples, pats) = genCase(rnd)
      val df = triples.toDF("subj", "pred", "obj")
      val got = canon(dfBindings(Bgp.solve(df, pats)))
      val want = canon(refSolve(triples, pats))
      assert(got === want, s"case $i: patterns=$pats")
      if (want.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 10, s"only $nonEmpty non-empty cases — generator too strict")
  }

  test("solve is pattern-LIST-order invariant on 25 seeded shuffled cases (r7)") {
    // the selectivity-ordered fold must produce the same binding multiset
    // for EVERY permutation of the pattern list (the reorder is an
    // optimization, never a semantics change)
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(9191)
    for (i <- 0 until 25) {
      val (triples, pats) = genCase(rnd)
      val df = triples.toDF("subj", "pred", "obj")
      val want = canon(refSolve(triples, pats))
      val shuffled = rnd.shuffle(pats)
      val got = canon(dfBindings(Bgp.solve(df, shuffled)))
      assert(got === want, s"case $i: original=$pats shuffled=$shuffled")
    }
  }

  test("solveMinus matches reference set-minus-by-compatibility on seeded cases") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(777)
    var removedSomething = 0
    for (i <- 0 until 15) {
      val (triples, pats) = genCase(rnd)
      val required = pats.init
      val minusG = Seq(pats.last)
      // the generator guarantees pats.last shares a var with earlier ones
      // only collectively; solveMinus needs overlap with required — skip
      // cases where it doesn't
      val reqVars = required.flatMap(_.productIterator.collect {
        case s: String if s.startsWith("?") => s.tail
      }).toSet
      val minusVars = minusG.head.productIterator.collect {
        case s: String if s.startsWith("?") => s.tail
      }.toSet
      if (required.nonEmpty && (reqVars & minusVars).nonEmpty) {
        val df = triples.toDF("subj", "pred", "obj")
        val got = canon(dfBindings(Bgp.solveMinus(df, required, minusG)))
        val base = refSolve(triples, required)
        val minusSols = refSolve(triples, minusG)
        val want = canon(base.filterNot { m =>
          minusSols.exists { g =>
            val shared = m.keySet & g.keySet
            shared.nonEmpty && shared.forall(k => m(k) == g(k))
          }
        })
        assert(got === want, s"case $i: req=$required minus=$minusG")
        if (want.size != base.size) removedSomething += 1
      }
    }
    assert(removedSomething >= 2, "minus never removed anything across all cases")
  }

  test("solveOptional matches reference left-join semantics on seeded cases") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(1313)
    var hadNulls = 0
    for (i <- 0 until 15) {
      val (triples, pats) = genCase(rnd)
      val required = pats.init
      val optG = Seq(pats.last)
      val reqVars = required.flatMap(_.productIterator.collect {
        case s: String if s.startsWith("?") => s.tail
      }).toSet
      val optVars = optG.head.productIterator.collect {
        case s: String if s.startsWith("?") => s.tail
      }.toSet
      if (required.nonEmpty && (reqVars & optVars).nonEmpty) {
        val df = triples.toDF("subj", "pred", "obj")
        val got = canon(dfBindings(Bgp.solveOptional(df, required, Seq(optG))))
        val base = refSolve(triples, required)
        val optSols = refSolve(triples, optG)
        val want = canon(base.flatMap { m =>
          val exts = optSols.filter { g =>
            val shared = m.keySet & g.keySet
            shared.forall(k => m(k) == g(k)) // anchored on required vars, never null
          }
          if (exts.isEmpty) Seq(m) else exts.map(m ++ _)
        })
        assert(got === want, s"case $i: req=$required opt=$optG")
        if (want.exists(_.split(",").length < (reqVars ++ optVars).size)) hadNulls += 1
      }
    }
    assert(hadNulls >= 2, "optional never produced an unmatched (null-extended) binding")
  }
}
