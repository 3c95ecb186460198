package graft.cypher

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import Ast._

/** Round-trip property test for the Cypher grammar (round 11; r10 verdict
  * directive #5): a pretty-printer over the AST plus seeded ScalaCheck
  * generators pin `parse(render(ast)) == ast` for ≥500 generated queries
  * per run. The grammar covers ~40 clause forms and regressions previously
  * surfaced only through hand-written vectors; any parse/precedence drift
  * now breaks here with a printable witness.
  *
  * Rendering is canonical (legacy var-length spelling, full parens around
  * binary operators) — spellings that DESUGAR at parse time (QPP groups,
  * quantified-rel shorthand, REMOVE) are intentionally not rendered, so
  * the map is injective and plain equality is the right check.
  */
class ParserRoundTripSpec extends AnyFunSuite {

  // ------------------------------------------------------------ renderer

  private def esc(s: String): String = s.flatMap {
    case '\'' => "\\'"
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def rex(e: Expr): String = e match {
    case Prop(v, p) => s"$v.$p"
    case Var(n) => n
    case Lit(null) => "null"
    case Lit(s: String) => s"'${esc(s)}'"
    case Lit(b: Boolean) => b.toString
    case Lit(v) => v.toString // Long | Double (toString→parse roundtrips)
    case Fn(n, args, d) =>
      s"$n(${if (d) "DISTINCT " else ""}${args.map(rex).mkString(", ")})"
    case Bin(op, l, r) =>
      val o = op match {
        case "startswith" => "STARTS WITH"
        case "endswith" => "ENDS WITH"
        case "contains" => "CONTAINS"
        case other => other
      }
      s"(${rex(l)} $o ${rex(r)})"
    case Not(x) => s"(NOT ${rex(x)})"
    case IsNull(x, neg) => s"(${rex(x)} IS ${if (neg) "NOT " else ""}NULL)"
    case In(x, coll) => s"(${rex(x)} IN ${rex(coll)})"
    case ListLit(xs) => s"[${xs.map(rex).mkString(", ")}]"
    case MapLit(kvs) =>
      s"{${kvs.map { case (k, v) => s"$k: ${rex(v)}" }.mkString(", ")}}"
    case ListComp(v, coll, w, p) =>
      s"[$v IN ${rex(coll)}${w.fold("")(x => s" WHERE ${rex(x)}")}" +
        s"${p.fold("")(x => s" | ${rex(x)}")}]"
    case ReduceExpr(acc, init, v, coll, step) =>
      s"reduce($acc = ${rex(init)}, $v IN ${rex(coll)} | ${rex(step)})"
    case ListPred(kind, v, coll, pred) =>
      s"$kind($v IN ${rex(coll)} WHERE ${rex(pred)})"
    case Index(coll, i) => s"${rex(coll)}[${rex(i)}]"
    case HasLabel(v, ls) => s"$v${ls.map(":" + _).mkString}"
    // always parenthesized: a bare `v:A|B` inside a comprehension WHERE
    // would be claimed by the comprehension's `|` (the documented
    // ambiguity the parser resolves by requiring parens there)
    case HasAnyLabel(v, ls) => s"($v:${ls.mkString("|")})"
    case Param(n) => s"$$$n"
    case PatternPred(p) => s"exists(${rpath(p)})"
    case ExistsBlock(ps, w) =>
      s"EXISTS { ${ps.map(rpath).mkString(", ")}" +
        s"${w.fold("")(x => s" WHERE ${rex(x)}")} }"
    case CountBlock(ps, w) =>
      s"COUNT { ${ps.map(rpath).mkString(", ")}" +
        s"${w.fold("")(x => s" WHERE ${rex(x)}")} }"
    case CollectBlock(ps, w, r, ob, lim) =>
      s"COLLECT { MATCH ${ps.map(rpath).mkString(", ")}" +
        s"${w.fold("")(x => s" WHERE ${rex(x)}")} RETURN ${rex(r)}" +
        s"${if (ob.isEmpty) "" else " ORDER BY " + ob.map(rsort).mkString(", ")}" +
        s"${lim.fold("")(n => s" LIMIT $n")} }"
    case PatternComp(p, w, proj) =>
      s"[${rpath(p)}${w.fold("")(x => s" WHERE ${rex(x)}")} | ${rex(proj)}]"
    case MapProj(v, props, star, extras) =>
      val parts = props.map("." + _) ++ (if (star) Seq(".*") else Nil) ++
        extras.map { case (k, x) => s"$k: ${rex(x)}" }
      s"$v {${parts.mkString(", ")}}"
    case CaseExpr(subj, branches, orElse) =>
      s"CASE${subj.fold("")(" " + rex(_))}" +
        branches.map { case (c, r) => s" WHEN ${rex(c)} THEN ${rex(r)}" }.mkString +
        s"${orElse.fold("")(d => s" ELSE ${rex(d)}")} END"
    case TypedNull(_) => sys.error("TypedNull is compiler-internal, never rendered")
  }

  private def rprops(ps: Seq[(String, Expr)]): String =
    if (ps.isEmpty) ""
    else s" {${ps.map { case (k, v) => s"$k: ${rex(v)}" }.mkString(", ")}}"

  private def rnode(n: NodePat): String = {
    val lbl =
      if (n.alts.nonEmpty) ":" + n.alts.mkString("|")
      else n.label.fold("")(":" + _)
    s"(${n.variable.getOrElse("")}$lbl${rprops(n.props)})"
  }

  private def rvl(vl: (Int, Int)): String = vl match {
    case (1, Parser.Unbounded) => "*"
    case (lo, Parser.Unbounded) => s"*$lo.."
    case (lo, hi) if lo == hi => s"*$lo"
    case (lo, hi) => s"*$lo..$hi"
  }

  private def rrel(r: RelPat): String = {
    val inner = s"${r.variable.getOrElse("")}" +
      (if (r.labels.isEmpty) "" else ":" + r.labels.mkString("|")) +
      r.varLength.fold("")(rvl) + rprops(r.props)
    r.dir match {
      case Out => s"-[$inner]->"
      case In => s"<-[$inner]-"
      case Undirected => s"-[$inner]-"
    }
  }

  private def rpath(p: PathPat): String =
    rnode(p.head) + p.hops.map { case (r, n) => rrel(r) + rnode(n) }.mkString

  private def rsort(s: Sort): String = s"${rex(s.expr)}${if (s.asc) "" else " DESC"}"

  private def rproj(kw: String, p: Projection): String = {
    val items = (if (p.star) Seq("*") else Nil) ++
      p.items.map(i => rex(i.expr) + i.alias.fold("")(" AS " + _))
    s"$kw${if (p.distinct) " DISTINCT" else ""} ${items.mkString(", ")}" +
      p.where.fold("")(w => s" WHERE ${rex(w)}") +
      (if (p.orderBy.isEmpty) ""
       else " ORDER BY " + p.orderBy.map(rsort).mkString(", ")) +
      p.skip.fold("")(n => s" SKIP $n") +
      p.limit.fold("")(n => s" LIMIT $n")
  }

  private def rsetItem(it: SetItem): String = it match {
    case SetProp(v, p, e) => s"$v.$p = ${rex(e)}"
    case SetPlus(v, m) => s"$v += {${m.map { case (k, e) => s"$k: ${rex(e)}" }.mkString(", ")}}"
    case SetAll(v, m) => s"$v = {${m.map { case (k, e) => s"$k: ${rex(e)}" }.mkString(", ")}}"
    case SetLabel(v, ls, true) => s"$v${ls.map(":" + _).mkString}"
    case SetLabel(_, _, false) =>
      sys.error("label removal renders only through a REMOVE clause")
  }

  /** A SetClause whose items are all REMOVE-shaped (label removals and
    * null'd properties), with at least one label removal, renders through
    * the REMOVE spelling — `SET` has no add=false syntax. Both spellings
    * parse to the same AST for null'd properties, so the map stays
    * injective on what the generators emit.
    */
  private def rremoveItem(it: SetItem): String = it match {
    case SetLabel(v, ls, false) => s"$v${ls.map(":" + _).mkString}"
    case SetProp(v, p, Lit(null)) => s"$v.$p"
    case other => sys.error(s"not REMOVE-renderable: $other")
  }

  private def isRemoveShape(it: SetItem): Boolean = it match {
    case SetLabel(_, _, false) | SetProp(_, _, Lit(null)) => true
    case _ => false
  }

  private def rwrite(w: WriteClause): String = w match {
    case SetClause(items)
        if items.nonEmpty && items.forall(isRemoveShape) &&
          items.exists { case SetLabel(_, _, false) => true; case _ => false } =>
      s"REMOVE ${items.map(rremoveItem).mkString(", ")}"
    case CreateClause(ps) => s"CREATE ${ps.map(rpath).mkString(", ")}"
    case MergeClause(p, oc, om) =>
      s"MERGE ${rpath(p)}" +
        (if (oc.isEmpty) "" else s" ON CREATE SET ${oc.map(rsetItem).mkString(", ")}") +
        (if (om.isEmpty) "" else s" ON MATCH SET ${om.map(rsetItem).mkString(", ")}")
    case SetClause(items) => s"SET ${items.map(rsetItem).mkString(", ")}"
    case DeleteClause(vars, detach) =>
      s"${if (detach) "DETACH " else ""}DELETE ${vars.mkString(", ")}"
    case ForeachClause(v, coll, body) =>
      s"FOREACH ($v IN ${rex(coll)} | ${body.map(rwrite).mkString(" ")})"
  }

  private def rread(r: Reading): String = r match {
    case MatchClause(ps, opt) =>
      s"${if (opt) "OPTIONAL " else ""}MATCH ${ps.map(rpath).mkString(", ")}"
    case UnwindClause(e, a) => s"UNWIND ${rex(e)} AS $a"
    case ShortestPathClause(pv, p, all, opt) =>
      s"${if (opt) "OPTIONAL " else ""}MATCH $pv = " +
        s"${if (all) "allShortestPaths" else "shortestPath"}(${rpath(p)})"
    case CallClause(_, _) => sys.error("CALL not generated")
  }

  private def render(q: Query): String = {
    val stages = q.stages.map { st =>
      (st.reads.map(rread) ++
        st.where.map(w => s"WHERE ${rex(w)}").toSeq ++
        st.writes.map(rwrite) ++
        st.projection.map(rproj("WITH", _)).toSeq).mkString(" ")
    }
    val base = (stages :+ rproj("RETURN", q.ret)).mkString(" ")
    q.union match {
      case Some((all, next)) =>
        s"$base UNION${if (all) " ALL" else ""} ${render(next)}"
      case None => base
    }
  }

  // ---------------------------------------------------------- generators

  private val varNames = Seq("aa", "bb", "cc", "nn", "rr", "xx", "yy", "zz")
  private val labels = Seq("Foo", "Bar", "Baz", "Qux")
  private val rels = Seq("RA", "RB", "RC")
  private val props = Seq("pk", "pw", "pv", "pz")
  private val fns = Seq("count", "size", "abs", "tointeger", "tostring",
    "sum", "min", "max", "coalesce", "labels", "type", "length", "head")

  private def vGen: Gen[String] = Gen.oneOf(varNames)
  private def pGen: Gen[String] = Gen.oneOf(props)

  private val litGen: Gen[Expr] = Gen.oneOf(
    Gen.choose(-99L, 99L).map(Lit(_)),
    Gen.choose(-400L, 400L).map(n => Lit(n / 4.0)),
    Gen.oneOf("a", "b c", "d'e", "f\\g", "h\nj", "").map(Lit(_)),
    Gen.const(Lit(true)), Gen.const(Lit(false)), Gen.const(Lit(null)),
    Gen.oneOf("p1", "p2").map(Param(_)))

  private def leafGen: Gen[Expr] = Gen.oneOf(
    litGen,
    vGen.map(Var(_)),
    for { v <- vGen; p <- pGen } yield Prop(v, p),
    for { v <- vGen; n <- Gen.choose(1, 2); ls <- Gen.pick(n, labels) }
      yield HasLabel(v, ls.toSeq),
    for { v <- vGen; ls <- Gen.pick(2, labels) }
      yield HasAnyLabel(v, ls.toSeq))

  private def exprGen(depth: Int): Gen[Expr] =
    if (depth <= 0) leafGen
    else {
      val sub = exprGen(depth - 1)
      Gen.frequency(
        4 -> leafGen,
        3 -> (for {
          // the parser stores AND/OR lowercased — generate the stored form
          op <- Gen.oneOf("+", "-", "*", "/", "%", "=", "<>", "<", "<=",
            ">", ">=", "and", "or", "startswith", "endswith", "contains", "=~")
          l <- sub; r <- sub
        } yield Bin(op, l, r)),
        1 -> sub.map(Not(_)),
        1 -> (for { x <- sub; n <- Gen.oneOf(true, false) } yield IsNull(x, n)),
        1 -> (for {
          x <- sub
          coll <- Gen.oneOf(Gen.listOfN(2, litGen).map(ListLit(_)), vGen.map(Var(_)))
        } yield In(x, coll)),
        1 -> Gen.listOfN(3, sub).map(ListLit(_)),
        1 -> (for {
          ks <- Gen.pick(2, props); vs <- Gen.listOfN(2, sub)
        } yield MapLit(ks.toSeq.zip(vs))),
        2 -> (for {
          n <- Gen.oneOf(fns)
          nargs <- Gen.choose(if (n == "count") 0 else 1, 2)
          args <- Gen.listOfN(nargs, sub)
          d <- if (n == "count" && nargs == 1) Gen.oneOf(true, false)
               else Gen.const(false)
        } yield Fn(n, args, d)),
        1 -> (for {
          v <- vGen; coll <- sub
          w <- Gen.option(sub); p <- Gen.option(sub)
        } yield ListComp(v, coll, w, p)),
        1 -> (for {
          acc <- vGen; init <- sub; v <- vGen; coll <- sub; step <- sub
        } yield ReduceExpr(acc, init, v, coll, step)),
        1 -> (for {
          k <- Gen.oneOf("all", "any", "none", "single")
          v <- vGen; coll <- sub; pred <- sub
        } yield ListPred(k, v, coll, pred)),
        1 -> (for {
          coll <- Gen.oneOf(vGen.map(Var(_)), Gen.listOfN(2, litGen).map(ListLit(_)))
          i <- sub
        } yield Index(coll, i)),
        1 -> (for {
          subj <- Gen.option(sub)
          n <- Gen.choose(1, 2)
          bs <- Gen.listOfN(n, Gen.zip(sub, sub))
          d <- Gen.option(sub)
        } yield CaseExpr(subj, bs, d)))
    }

  private def nodeGen(bindProb: Int = 7): Gen[NodePat] = for {
    v <- Gen.frequency(bindProb -> vGen.map(Some(_)), 3 -> Gen.const(None))
    // label shapes: single, none, or a disjunction (:A|B) — the parser
    // normalizes duplicates away and collapses a 1-element disjunction to
    // a plain label, so the generator emits ≥2 distinct alternatives
    (l, alts) <- Gen.frequency[(Option[String], Seq[String])](
      6 -> Gen.oneOf(labels).map(l => (Some(l), Nil)),
      3 -> Gen.const((None, Nil)),
      1 -> Gen.choose(2, 3).flatMap(k =>
        Gen.pick(k, labels).map(ls => (None, ls.toSeq))))
    np <- Gen.choose(0, 2)
    ks <- Gen.pick(np, props)
    vs <- Gen.listOfN(np, litGen)
  } yield NodePat(v, l, ks.toSeq.zip(vs), alts)

  private val vlGen: Gen[Option[(Int, Int)]] = Gen.frequency(
    6 -> Gen.const(None),
    1 -> Gen.const(Some((1, Parser.Unbounded))),
    1 -> Gen.const(Some((0, Parser.Unbounded))),
    1 -> (for { lo <- Gen.choose(0, 3); w <- Gen.choose(0, 4) }
      yield Some((lo, lo + w))),
    1 -> Gen.choose(1, 4).map(n => Some((n, n))))

  private def relGen: Gen[RelPat] = for {
    v <- Gen.frequency(4 -> vGen.map(Some(_)), 6 -> Gen.const(None))
    nl <- Gen.choose(0, 2)
    ls <- Gen.pick(nl, rels)
    dir <- Gen.oneOf(Out, In, Undirected)
    vl <- vlGen
    np <- Gen.choose(0, 1)
    ks <- Gen.pick(np, props)
    vs <- Gen.listOfN(np, litGen)
  } yield RelPat(v, ls.toSeq, dir, vl, ks.toSeq.zip(vs))

  private def pathGen(maxHops: Int): Gen[PathPat] = for {
    head <- nodeGen()
    n <- Gen.choose(0, maxHops)
    hops <- Gen.listOfN(n, Gen.zip(relGen, nodeGen()))
  } yield PathPat(head, hops)

  private def blockExprGen: Gen[Expr] = {
    val inner = exprGen(1)
    Gen.oneOf(
      for { ps <- Gen.listOfN(1, pathGen(2)); w <- Gen.option(inner) }
        yield ExistsBlock(ps, w),
      for { ps <- Gen.listOfN(1, pathGen(2)); w <- Gen.option(inner) }
        yield CountBlock(ps, w),
      for {
        ps <- Gen.listOfN(1, pathGen(2)); w <- Gen.option(inner)
        r <- inner
        ob <- Gen.listOfN(1, Gen.zip(inner, Gen.oneOf(true, false))
          .map { case (e, a) => Sort(e, a) })
        lim <- Gen.option(Gen.choose(1L, 9L))
      } yield CollectBlock(ps, w, r, if (lim.isDefined) ob else Nil, lim),
      for {
        head <- nodeGen(); hop <- Gen.zip(relGen, nodeGen())
        w <- Gen.option(inner); proj <- inner
      } yield PatternComp(PathPat(head, Seq(hop)), w, proj),
      for {
        v <- vGen; np <- Gen.choose(0, 2); ps <- Gen.pick(np, props)
        star <- Gen.oneOf(true, false)
        ne <- Gen.choose(0, 1); ks <- Gen.pick(ne, Seq("ea", "eb"))
        es <- Gen.listOfN(ne, inner)
      } yield MapProj(v, ps.toSeq, star, ks.toSeq.zip(es)))
  }

  private def itemGen: Gen[Item] = for {
    e <- Gen.frequency(8 -> exprGen(2), 2 -> blockExprGen)
    a <- Gen.option(vGen)
  } yield Item(e, a)

  private def projGen(allowWhere: Boolean): Gen[Projection] = for {
    n <- Gen.choose(1, 3)
    items <- Gen.listOfN(n, itemGen)
    distinct <- Gen.frequency(8 -> Gen.const(false), 2 -> Gen.const(true))
    where <- if (allowWhere) Gen.option(exprGen(1)) else Gen.const(None)
    nob <- Gen.choose(0, 2)
    ob <- Gen.listOfN(nob, Gen.zip(exprGen(1), Gen.oneOf(true, false))
      .map { case (e, a) => Sort(e, a) })
    skip <- Gen.frequency(8 -> Gen.const(None), 2 -> Gen.choose(1L, 5L).map(Some(_)))
    limit <- Gen.frequency(7 -> Gen.const(None), 3 -> Gen.choose(1L, 9L).map(Some(_)))
    star <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
  } yield Projection(items, distinct, where, ob, skip, limit, star)

  private def setItemGen: Gen[SetItem] = for {
    v <- vGen
    it <- Gen.oneOf(
      for { p <- pGen; e <- exprGen(1) } yield SetProp(v, p, e),
      for {
        np <- Gen.choose(1, 2); ks <- Gen.pick(np, props)
        es <- Gen.listOfN(np, exprGen(1))
      } yield SetPlus(v, ks.toSeq.zip(es)),
      for {
        np <- Gen.choose(1, 2); ks <- Gen.pick(np, props)
        es <- Gen.listOfN(np, exprGen(1))
      } yield SetAll(v, ks.toSeq.zip(es)),
      for { n <- Gen.choose(1, 2); ls <- Gen.pick(n, labels) }
        yield SetLabel(v, ls.toSeq, add = true))
  } yield it

  /** Items legal under REMOVE: label removals and bare properties
    * (which parse as SET-to-null).
    */
  private def removeItemGen: Gen[SetItem] = for {
    v <- vGen
    it <- Gen.frequency(
      6 -> (for { n <- Gen.choose(1, 2); ls <- Gen.pick(n, labels) }
        yield SetLabel(v, ls.toSeq, add = false)),
      4 -> pGen.map(p => SetProp(v, p, Lit(null))))
  } yield it

  private def writeGen: Gen[WriteClause] = Gen.frequency(
    3 -> (for {
      p <- pathGen(1)
      oc <- Gen.frequency(7 -> Gen.const(Nil),
        3 -> Gen.listOfN(1, setItemGen))
      om <- Gen.frequency(7 -> Gen.const(Nil),
        3 -> Gen.listOfN(1, setItemGen))
    } yield MergeClause(p, oc, om)),
    3 -> Gen.listOfN(1, pathGen(1)).map(CreateClause(_)),
    2 -> Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, setItemGen)).map(SetClause(_)),
    1 -> Gen.choose(1, 2).flatMap(n =>
      Gen.listOfN(n, removeItemGen)).map(SetClause(_)),
    1 -> (for {
      n <- Gen.choose(1, 2); vs <- Gen.pick(n, varNames)
      d <- Gen.oneOf(true, false)
    } yield DeleteClause(vs.toSeq, d)),
    1 -> (for {
      v <- vGen; coll <- Gen.listOfN(2, litGen).map(ListLit(_))
      body <- Gen.listOfN(1, Gen.choose(1, 1).flatMap(n =>
        Gen.listOfN(n, setItemGen)).map(SetClause(_)))
    } yield ForeachClause(v, coll, body)))

  private def readGen: Gen[Reading] = Gen.frequency(
    6 -> (for {
      n <- Gen.choose(1, 2)
      ps <- Gen.listOfN(n, pathGen(2))
      opt <- Gen.frequency(8 -> Gen.const(false), 2 -> Gen.const(true))
    } yield MatchClause(ps, opt)),
    2 -> (for { e <- exprGen(1); a <- vGen } yield UnwindClause(e, a)),
    2 -> (for {
      pv <- Gen.oneOf("p1x", "p2x")
      head <- nodeGen(); hop <- Gen.zip(relGen, nodeGen())
      all <- Gen.oneOf(true, false)
      opt <- Gen.frequency(8 -> Gen.const(false), 2 -> Gen.const(true))
    } yield ShortestPathClause(pv, PathPat(head, Seq(hop)), all, opt)))

  private def stageGen(withProjection: Boolean): Gen[Stage] = for {
    nr <- Gen.choose(1, 2)
    reads <- Gen.listOfN(nr, readGen)
    where <- Gen.option(exprGen(2))
    nw <- Gen.frequency(7 -> Gen.const(0), 3 -> Gen.choose(1, 2))
    writes <- Gen.listOfN(nw, writeGen)
    proj <- if (withProjection) projGen(allowWhere = true).map(Some(_))
            else Gen.const(None)
  } yield Stage(reads, where, proj, writes)

  private def queryGen(allowUnion: Boolean): Gen[Query] = for {
    nmid <- Gen.choose(0, 1)
    mids <- Gen.listOfN(nmid, stageGen(withProjection = true))
    last <- stageGen(withProjection = false)
    ret <- projGen(allowWhere = false)
    union <- if (!allowUnion) Gen.const(None)
             else Gen.frequency(
               9 -> Gen.const(None),
               1 -> Gen.zip(Gen.oneOf(true, false), queryGen(allowUnion = false))
                 .map(Some(_)))
  } yield Query(mids :+ last, ret, union)

  // ------------------------------------------------------------- the pin

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("parse(render(ast)) == ast over 600 generated queries") {
    var checked = 0
    (1 to 600).foreach { seed =>
      val q = sample(queryGen(allowUnion = true), seed * 7919L)
      val text = render(q)
      val back =
        try Parser.parse(text)
        catch {
          case e: Parser.ParseException =>
            fail(s"seed=$seed failed to parse:\n$text\n${e.getMessage}")
        }
      assert(back == q, s"seed=$seed roundtrip mismatch:\n$text")
      checked += 1
    }
    assert(checked == 600)
  }

  test("renderer fidelity on hand-written corner cases") {
    // shapes the generators hit rarely, pinned explicitly
    val vectors = Seq(
      "MATCH (aa:Foo)-[rr:RA|RB*0..3 {pw: 1}]->(bb) RETURN size(rr) AS nn",
      "MATCH (aa) WHERE ((aa.pk STARTS WITH 'x') AND (NOT (aa.pw IS NULL))) RETURN aa.pk",
      "MATCH (aa:Foo) RETURN CASE aa.pk WHEN 1 THEN 'a' ELSE 'b' END AS cc",
      "MATCH (aa:Foo) WITH aa.pk AS k WHERE (k > 2) RETURN k ORDER BY k DESC SKIP 1 LIMIT 3",
      "MERGE (aa:Foo {pk: 1}) ON CREATE SET aa.pw = 2 ON MATCH SET aa = {pw: 3} RETURN aa.pw",
      "MATCH (aa:Foo) RETURN [xx IN aa.pv WHERE (xx > 0) | (xx * 2)] AS ys",
      "MATCH p1x = shortestPath((aa:Foo)-[:RA*]-(bb:Bar)) RETURN length(p1x)",
      "MATCH (aa:Foo) RETURN COUNT { (aa)-[:RA]->(bb:Bar) WHERE (bb.pk = 1) } AS c",
      "MATCH (aa:Foo) SET aa:Bar:Baz RETURN aa.pk",
      "MATCH (aa:Foo) REMOVE aa:Bar, aa.pk RETURN aa.pw",
      "MERGE (aa:Foo {pk: 1}) ON CREATE SET aa:Qux ON MATCH SET aa.pw = 2 RETURN aa.pk")
    vectors.foreach { v =>
      val ast = Parser.parse(v)
      assert(Parser.parse(render(ast)) == ast, v)
    }
  }
}
