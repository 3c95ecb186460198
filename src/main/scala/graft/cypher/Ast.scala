package graft.cypher

/** AST for the Cypher subset the engine compiles to DataFrame plans.
  *
  * The subset covers what the reference's text2cypher surface actually
  * emits and validates (reference: final/langraph_neo4j3.py:154-221 — MATCH
  * pattern chains, WHERE, WITH aggregation, RETURN with aliases, ORDER BY,
  * LIMIT; observed instances in final/experimenting_new/notebook1.ipynb:844
  * and final/experimenting_new/rca.ipynb:345-354) plus bounded var-length
  * relationships `[:R*1..n]` (SURVEY.md §2.8 G13).
  */
object Ast {

  sealed trait Expr
  /** `v.prop` */
  final case class Prop(variable: String, prop: String) extends Expr
  /** bare pattern variable, e.g. `count(o)` */
  final case class Var(name: String) extends Expr
  /** literal: Long, Double, String, Boolean, or null */
  final case class Lit(value: Any) extends Expr
  /** function call; `distinct` for `count(DISTINCT x)` */
  final case class Fn(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  /** binary op: + - * / % = <> < <= > >= AND OR */
  /** binary op: + - * / % = <> < <= > >= AND OR, plus the string predicates
    * `startswith`/`endswith`/`contains`/`=~` (Cypher `STARTS WITH` etc.)
    */
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  /** `x IN coll` — coll is a [[ListLit]], [[Param]], or any list-valued expr */
  final case class In(e: Expr, coll: Expr) extends Expr
  /** `[e1, e2, …]` list literal */
  final case class ListLit(items: Seq[Expr]) extends Expr
  /** `{k1: e1, k2: e2, …}` map literal in EXPRESSION position — the
    * temporal constructors' map form (`datetime({year: 2024, month: 1})`,
    * `time({hour: 21})`). Pattern prop maps and SET maps parse separately
    * (they are clause syntax, not expressions).
    */
  final case class MapLit(items: Seq[(String, Expr)]) extends Expr
  /** COMPILER-INTERNAL (never parsed): a null of a known store column
    * type — the replace-all expansion of `SET v = {…}` inside a MERGE's
    * ON CREATE/ON MATCH resets absent properties through the same
    * (prop, Expr) plumbing as explicit SET items, and the reset must keep
    * the store column's type.
    */
  final case class TypedNull(dt: org.apache.spark.sql.types.DataType) extends Expr
  /** `[x IN coll WHERE pred | proj]` list comprehension (both parts optional) */
  final case class ListComp(variable: String, coll: Expr,
      where: Option[Expr], proj: Option[Expr]) extends Expr
  /** `reduce(acc = init, x IN coll | expr)` */
  final case class ReduceExpr(acc: String, init: Expr,
      variable: String, coll: Expr, step: Expr) extends Expr
  /** `all/any/none/single(x IN coll WHERE pred)` — Cypher list predicates,
    * the open text2cypher surface's idiomatic path filter
    * (`WHERE all(n IN nodes(p) WHERE ...)`).
    */
  final case class ListPred(kind: String, variable: String,
      coll: Expr, pred: Expr) extends Expr
  /** `list[idx]` — 0-based positive, negative from the end (Cypher) */
  final case class Index(coll: Expr, idx: Expr) extends Expr
  /** `n:Label[:Label2]` label predicate in EXPRESSION position (`WHERE
    * n:Nation`) — true when the node has every listed label.
    */
  final case class HasLabel(variable: String, labels: Seq[String]) extends Expr
  /** `n:A|B` label DISJUNCTION in expression position (`WHERE n:A|B`,
    * Neo4j-5 label expressions) — true when the node has ANY listed label.
    * Mixing `|` and `:` in one predicate is rejected at parse time.
    */
  final case class HasAnyLabel(variable: String, labels: Seq[String]) extends Expr
  /** `$name` query parameter, bound at run time (reference:
    * final/langraph_neo4j3.py:359-363 executes parameterized probes)
    */
  final case class Param(name: String) extends Expr
  /** `exists((a)-[:R]->(b))` pattern predicate — true when the pattern has
    * at least one match from the bound row. Only valid as a top-level AND
    * conjunct of a WHERE (possibly under NOT).
    */
  final case class PatternPred(path: PathPat) extends Expr
  /** `EXISTS { [MATCH] patterns [WHERE pred] }` — the Neo4j-5 block form
    * of the existence predicate (multi-pattern + inner WHERE).
    */
  final case class ExistsBlock(paths: Seq[PathPat], where: Option[Expr]) extends Expr
  /** `COUNT { [MATCH] patterns [WHERE pred] }` — per-row match count
    * (0 when nothing matches), correlated on the variables shared with
    * the enclosing frame.
    */
  final case class CountBlock(paths: Seq[PathPat], where: Option[Expr]) extends Expr
  /** `COLLECT { [MATCH] patterns [WHERE pred] RETURN expr [ORDER BY …]
    * [LIMIT n] }` — the third Neo4j-5 block form: the list of `expr` over
    * every match, correlated like [[CountBlock]]; `[]` when nothing
    * matches. ORDER BY sorts WITHIN each per-row list; LIMIT keeps its
    * head (top-k list per row).
    */
  final case class CollectBlock(paths: Seq[PathPat], where: Option[Expr],
      ret: Expr, orderBy: Seq[Sort] = Nil, limit: Option[Long] = None) extends Expr
  /** `n {.prop, .*, alias: expr}` map projection — a struct of selected
    * properties (`.*` = every stored property) plus computed entries;
    * Neo4j's idiomatic "shape the output" form in generated Cypher.
    */
  final case class MapProj(variable: String, props: Seq[String],
      star: Boolean, extras: Seq[(String, Expr)]) extends Expr
  /** `[(a)-[:R]->(b) WHERE pred | proj]` pattern comprehension — the
    * expression form LLM-generated Cypher idiomatically spells "collect
    * the neighbors' X inline" with (reference:
    * final/langraph_neo4j3.py:154-181 accepts arbitrary questions).
    * Same semantics as a [[CollectBlock]] over one path.
    */
  final case class PatternComp(path: PathPat, where: Option[Expr],
      proj: Expr) extends Expr
  /** generic `CASE WHEN c THEN r ... ELSE d END` or simple
    * `CASE subj WHEN v THEN r ... END`
    */
  final case class CaseExpr(
      subject: Option[Expr],
      branches: Seq[(Expr, Expr)],
      orElse: Option[Expr]) extends Expr

  sealed trait Direction
  case object Out extends Direction // -[]->
  case object In extends Direction // <-[]-
  case object Undirected extends Direction // -[]-

  /** Node pattern. A label disjunction `(n:A|B)` parses to `label = None`
    * and `alts` holding the alternatives (≥ 2, distinct); a plain `(n:A)`
    * keeps the single label in `label` with `alts` empty. The compiler
    * matches a disjunction by restricting the interpretation enumeration
    * to the listed labels and unioning the per-label branches — the same
    * machinery an unlabeled node rides, with a narrower candidate set.
    * Write clauses (CREATE/MERGE) reject disjunctions, matching Neo4j.
    */
  final case class NodePat(
      variable: Option[String],
      label: Option[String],
      props: Seq[(String, Expr)] = Nil,
      alts: Seq[String] = Nil)

  /** Relationship pattern. `labels` holds the type disjunction `[:A|B]`
    * (one element for a plain `[:A]`, empty for an untyped `-[r]->`): the
    * compiler matches the union of every schema-fitting type, Neo4j
    * semantics for multi-type and open patterns.
    */
  final case class RelPat(
      variable: Option[String],
      labels: Seq[String],
      dir: Direction,
      varLength: Option[(Int, Int)] = None,
      props: Seq[(String, Expr)] = Nil)

  object RelPat {
    /** Single-type convenience constructor (the pre-disjunction shape). */
    def apply(variable: Option[String], label: Option[String],
        dir: Direction): RelPat = RelPat(variable, label.toSeq, dir, None, Nil)
  }

  /** `(a)-[r]->(b)-[s]->(c)`: head node + (rel, node) hops. */
  final case class PathPat(head: NodePat, hops: Seq[(RelPat, NodePat)])

  final case class Item(expr: Expr, alias: Option[String])

  final case class Sort(expr: Expr, asc: Boolean)

  /** One projection stage (`WITH` or `RETURN`). `star` = `WITH *` /
    * `RETURN *` — carry every bound variable, plus any explicit items.
    */
  final case class Projection(
      items: Seq[Item],
      distinct: Boolean,
      where: Option[Expr] = None, // WITH ... WHERE (post-aggregation filter)
      orderBy: Seq[Sort] = Nil,
      skip: Option[Long] = None,
      limit: Option[Long] = None,
      star: Boolean = false)

  /** A reading clause: MATCH / OPTIONAL MATCH / UNWIND, in written order. */
  sealed trait Reading

  /** One MATCH / OPTIONAL MATCH clause (comma-separated paths). */
  final case class MatchClause(paths: Seq[PathPat], optional: Boolean) extends Reading

  /** `UNWIND expr AS alias` — one row per list element. */
  final case class UnwindClause(expr: Expr, alias: String) extends Reading

  /** `CALL { [WITH v, …] … RETURN … }` — a read-only subquery. Without
    * imports it runs once and its rows cross the enclosing frame; with an
    * importing WITH it correlates on the imported variables (per distinct
    * imported key — duplicate enclosing rows share the same subquery
    * result, which is observationally per-row for reads).
    */
  final case class CallClause(imports: Seq[String], body: Query) extends Reading

  /** `MATCH p = shortestPath((a:L {…})-[:R*lo..hi]->(b:L))` — binds `p` so
    * `length(p)` is the minimum hop count between each (a, b) pair within
    * the bounds. One relationship pattern only; an open upper bound (bare
    * `*` / `*lo..`) runs the BFS to frontier exhaustion. `all` =
    * `allShortestPaths(...)`: one row per minimum-length path per endpoint
    * pair instead of the single lexicographic-min representative.
    */
  final case class ShortestPathClause(pathVar: String, path: PathPat,
      all: Boolean = false,
      /** OPTIONAL MATCH p = shortestPath(...): rows with no path keep
        * nulls for `p` (and an unbound far endpoint) instead of dropping.
        */
      optional: Boolean = false) extends Reading

  // ------------------------------------------------------------ write AST
  // The write subset covers exactly what the reference's injection pipeline
  // emits (reference: final/inject_node.py:350-358 `UNWIND $rows MERGE
  // (n:L {key: row.key}) SET n += {…}`; final/inject_relationship.py:636-644
  // `MATCH (s) … MATCH (t) … MERGE (s)-[r:L]->(t)`) plus CREATE and
  // [DETACH] DELETE for completeness.

  /** One item of a SET clause. */
  sealed trait SetItem
  /** `SET v += {k: e, …}` — merge the map into the entity's properties. */
  final case class SetPlus(variable: String, map: Seq[(String, Expr)]) extends SetItem
  /** `SET v.prop = expr`. */
  final case class SetProp(variable: String, prop: String, value: Expr) extends SetItem
  /** `SET v = {k: e, …}` — REPLACE the entity's properties: every stored
    * property absent from the map resets to null (the fixed-schema
    * analogue of Neo4j's property removal).
    */
  final case class SetAll(variable: String, map: Seq[(String, Expr)]) extends SetItem
  /** `SET v:Label[:Label2…]` (add = true) / `REMOVE v:Label…` (add =
    * false) — label membership mutation. The store represents a secondary
    * label as key-linked membership in that label's node store.
    */
  final case class SetLabel(variable: String, labels: Seq[String],
      add: Boolean) extends SetItem

  /** A writing clause: CREATE / MERGE / SET / DELETE, in written order. */
  sealed trait WriteClause
  /** `CREATE (…)-[:…]->(…), …` — unconditional insert. */
  final case class CreateClause(paths: Seq[PathPat]) extends WriteClause
  /** `MERGE (n:L {…})` or `MERGE (s)-[r:L {…}]->(t)` — match-or-create,
    * with optional `ON CREATE SET` / `ON MATCH SET` companions whose
    * expressions may reference the merge variable's current properties
    * (`ON MATCH SET n.cnt = n.cnt + 1`).
    */
  final case class MergeClause(path: PathPat,
      onCreate: Seq[SetItem] = Nil, onMatch: Seq[SetItem] = Nil) extends WriteClause
  final case class SetClause(items: Seq[SetItem]) extends WriteClause
  /** `[DETACH] DELETE v, …` */
  final case class DeleteClause(vars: Seq[String], detach: Boolean) extends WriteClause
  /** `FOREACH (x IN coll | write-clauses)` — side-effect-only iteration:
    * the body writes run once per list element with `x` bound; the
    * enclosing frame's rows and bindings are untouched.
    */
  final case class ForeachClause(variable: String, coll: Expr,
      body: Seq[WriteClause]) extends WriteClause

  /** One stage: reading clauses (possibly none after the first stage), an
    * optional WHERE, write clauses, and — unless it is the final stage — a
    * WITH projection. `MATCH … WITH … MATCH … RETURN` chains are stages.
    */
  final case class Stage(
      reads: Seq[Reading],
      where: Option[Expr],
      projection: Option[Projection],
      writes: Seq[WriteClause] = Nil)

  /** `union`: an optional `UNION [ALL]` continuation — the chained query's
    * own `union` continues the chain. Branch outputs must be union-compatible
    * by column name; a trailing ORDER BY/SKIP/LIMIT on the LAST branch
    * applies to the whole union (Neo4j disallows branch-level ORDER BY, so
    * the trailing one is unambiguous).
    */
  final case class Query(stages: Seq[Stage], ret: Projection,
      union: Option[(Boolean, Query)] = None) {
    def patterns: Seq[PathPat] =
      stages.flatMap(_.reads.collect { case MatchClause(paths, false) => paths }.flatten)
    def where: Option[Expr] = stages.headOption.flatMap(_.where)
  }
}
