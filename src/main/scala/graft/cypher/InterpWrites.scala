package graft.cypher

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.{EdgeType, GraphStore, GraphWriter, NodeType}
import Ast._
import CypherEngine._

/** Write-clause half of the [[CypherEngine]] interpreter (split from
  * Compiler.scala in r14 — no behavior change): CREATE / MERGE (with ON
  * CREATE / ON MATCH routing through membership provenance) / SET /
  * REMOVE / DELETE against the immutable [[graft.graph.GraphStore]].
  */
private[cypher] trait InterpWrites { self: CypherEngine.Interp =>

    // --------------------------------------------------------------- writes

    var anonCounter = 0
    def anonVar(): String = { anonCounter += 1; s"__w$anonCounter" }

    /** Write-time audit metrics, surfaced on [[CypherEngine.WriteResult]]
      * (r15 verdict #2) — see `observed` there for the published keys.
      */
    val writeObservations = scala.collection.mutable.LinkedHashMap[String, Long]()

    def nodeKeyCol(v: String, ctx: Ctx): Column =
      col(s"${v}__${store.schema.node(ctx.labels(v)).key}")

    /** Per-(src, dst)-pair parallel-edge discriminator, ordered by the
      * edge's PROPERTY columns so the assignment is DETERMINISTIC across
      * re-evaluations: the edge union is re-instantiated per BFS level
      * and recomputed on shuffle retry, and an `orderBy(lit(1))` window
      * (the pre-r13 form — r12 ADVICE) could hand the same physical edge
      * different `__n` values per evaluation, pairing a trail step with
      * the wrong parallel edge's payload or duplicating rows under task
      * retry. Rows identical in EVERY property are interchangeable — any
      * numbering among them yields the same (content, __n) set — so the
      * property sort is exactly the needed stability, with no persist.
      */
    def discriminator(et: EdgeType): Column = {
      val ord: Seq[Column] =
        if (et.properties.isEmpty) Seq(lit(1)) else et.properties.map(col(_))
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(et.keyS), col(et.keyT)).orderBy(ord: _*))
    }

    /** `MERGE (n:L {merge props}) [SET n += {…} / SET n.p = e]*` with
      * optional `ON CREATE SET` / `ON MATCH SET`, fused into one
      * [[GraphWriter.mergeNodes]] upsert. The frame first LEFT-joins the
      * CURRENT node store on the merge props, which both binds `n` and
      * yields a matched marker — so ON MATCH expressions may reference the
      * node's current properties (`ON MATCH SET n.cnt = n.cnt + 1`,
      * standard Cypher counters). Post-write values are recomputed onto the
      * frame column-wise (no second join against the updated store).
      * A SET of a merge-key column is ignored: the merge value is
      * authoritative (the reference's `SET n += {key: row.key, …}` re-sets
      * the key to the identical value, final/inject_node.py:353-356).
      */
    def mergeNodeWrite(df: DataFrame, ctx: Ctx, pat: NodePat,
        sets: Seq[(String, Expr)], onCreate: Seq[(String, Expr)],
        onMatch: Seq[(String, Expr)]): (DataFrame, Ctx) = {
      val v = pat.variable.getOrElse(
        throw CypherException("MERGE node pattern needs a variable"))
      if (ctx.labels.contains(v))
        throw CypherException(s"MERGE variable $v is already bound")
      if (pat.alts.nonEmpty) throw CypherException(
        "MERGE node pattern cannot use a label disjunction (" +
          pat.alts.mkString("|") + ") — a merged node has one label")
      val label = pat.label.getOrElse(
        throw CypherException("MERGE node pattern needs a label"))
      if (pat.props.isEmpty)
        throw CypherException("MERGE node pattern needs at least one merge property")
      val mergeKeys = pat.props.map(_._1)
      def toMap(xs: Seq[(String, Expr)]) = {
        val m = collection.mutable.LinkedHashMap[String, Expr]()
        xs.foreach { case (k, e) => if (!mergeKeys.contains(k)) m(k) = e }
        m
      }
      val setMap = toMap(sets)
      val ocMap = toMap(onCreate)
      val omMap = toMap(onMatch)
      val touched = (setMap.keys ++ ocMap.keys ++ omMap.keys).toSeq.distinct
      val mark = s"__merged_$v"
      val existedCols: Seq[String] =
        store.nodes.get(label).map(_.columns.toSeq).getOrElse(Nil)
      val joined = store.nodes.get(label) match {
        case Some(_) =>
          val nd = nodeDf(v, label).withColumn(mark, lit(true))
          val cond = pat.props.map { case (p, e) => column(e, ctx) <=> col(s"${v}__$p") }
            .reduce(_ && _)
          df.join(nd, cond, "left_outer")
        case None => df.withColumn(mark, lit(null).cast("boolean"))
      }
      val ctxN = ctx.copy(labels = ctx.labels + (v -> label))
      val matched = col(mark).isNotNull
      def cur(p: String): Column =
        if (existedCols.contains(p)) col(s"${v}__$p") else lit(null)
      def valueOf(p: String): Column =
        if (existedCols.isEmpty)
          // brand-new label: nothing can match, and ON MATCH expressions
          // may reference columns that don't exist yet — compile only the
          // create branch
          ocMap.get(p).orElse(setMap.get(p)).map(e => columnL(e, ctxN, Map.empty))
            .getOrElse(lit(null))
        else
          when(matched,
            omMap.get(p).orElse(setMap.get(p)).map(e => columnL(e, ctxN, Map.empty))
              .getOrElse(cur(p)))
            .otherwise(
              ocMap.get(p).orElse(setMap.get(p)).map(e => columnL(e, ctxN, Map.empty))
                .getOrElse(lit(null)))
      // membership routing (r13 verdict directive #4 — closes §2.15
      // deviation 6): a MERGE on a label holding membership-derived rows
      // can MATCH a member, whose true home is another source store —
      // upserting it into the TARGET store would fabricate a native
      // duplicate of a node that already exists. Mark each matched row's
      // provenance (native / per-source member, by the same key rendering
      // the derivation used; on a key-value collision both claim the row,
      // §2.15 deviation 2), send created + native-matched rows through the
      // target upsert, and route member updates to their SOURCE-store rows
      // (the provenance pair names the store; shared-name semantics make
      // the update visible back through the target label). A touched
      // property with no home in a matched member's source store rejects
      // loudly — written-but-invisible would be worse.
      val inboundSrcs = store.memberships.keysIterator
        .collect { case (t, s) if t == label => s }.toSeq.distinct.sorted
      if (inboundSrcs.isEmpty || existedCols.isEmpty) {
        val incoming = joined.select(
          pat.props.map { case (p, e) => column(e, ctx).as(p) } ++
            touched.map(p => valueOf(p).as(p)): _*)
        store = GraphWriter.mergeNodes(store, label, incoming, mergeKeys)
      } else {
        val nt = store.schema.node(label)
        val keyRen = col(s"${v}__${nt.key}").cast(StringType)
        val tgtType = store.nodes(label).schema(nt.key).dataType
        val natM = "__mrg_nat"
        var marked = joined.join(
          store.nodes(label)
            .select(col(nt.key).cast(StringType).as(natM)).distinct(),
          keyRen === col(natM), "left_outer")
        val memCols = inboundSrcs.map { s =>
          val snt = store.schema.node(s)
          val srcDf = store.nodes(s)
          val m = store.memberships((label, s))
          val ren = s"__mrg_ren_$s"
          val sk = s"__mrg_key_$s"
          val sKeys = srcDf
            .join(m, srcDf(snt.key).cast(StringType) === m("__m_key"),
              "left_semi")
            .select(col(snt.key).cast(tgtType).cast(StringType).as(ren),
              col(snt.key).as(sk))
          marked = marked.join(sKeys, keyRen === col(ren), "left_outer")
          (s, ren, sk)
        }
        // ONE member-match probe per source, reused by the reject AND the
        // source-upsert gate below (r16, found by the collision fuzzer):
        // the upsert used to run UNCONDITIONALLY with an empty frame when
        // no member matched, and its `touched`-column schema leaked into
        // the source store via the full-outer merge — Tb silently gained a
        // null `p` column, after which `missing` read empty and the reject
        // NEVER fired again for that source (a MERGE creating one native
        // row disarmed the loud member-mutation guard for the whole
        // session's descendants).
        val memHit: Map[String, Boolean] = memCols.map { case (s, ren, _) =>
          s -> !marked.filter(matched && col(ren).isNotNull).isEmpty
        }.toMap
        memCols.foreach { case (s, ren, _) =>
          val missing = touched.filterNot(store.nodes(s).columns.contains)
          if (missing.nonEmpty && memHit(s))
            throw CypherException(
              s"MERGE (:$label) ON MATCH/SET touches ${missing.mkString(", ")} " +
                s"— matched membership-derived rows from :$s carry no such " +
                "stored property (mutate them through their own label)")
        }
        val incoming = marked.filter(!matched || col(natM).isNotNull).select(
          pat.props.map { case (p, e) => column(e, ctx).as(p) } ++
            touched.map(p => valueOf(p).as(p)): _*)
        store = GraphWriter.mergeNodes(store, label, incoming, mergeKeys)
        memCols.foreach { case (s, ren, sk) =>
          if (touched.nonEmpty && memHit(s)) {
            val snt = store.schema.node(s)
            val incomingS = marked.filter(matched && col(ren).isNotNull)
              .select(col(sk).as(snt.key) +:
                touched.map(p => valueOf(p).as(p)): _*)
            store = GraphWriter.mergeNodes(store, s, incomingS, Seq(snt.key))
          }
        }
      }
      // refresh the binding in place: merge keys from the pattern exprs
      // (covers created rows, whose store-side columns are null), touched
      // properties from the same value expressions the store got
      var out = joined.withColumns(
        pat.props.map { case (p, e) => s"${v}__$p" -> column(e, ctx) }.toMap ++
          touched.map(p => s"${v}__$p" -> valueOf(p)).toMap)
      out = out.drop(mark)
      (out, ctxN)
    }

    /** `MERGE (s)-[r:L {props}]->(t)` / CREATE equivalent: both endpoints
      * must be bound node variables; one row per frame row becomes an edge
      * (MERGE skips rows whose full written pattern already exists — one
      * anti join). Orientation corrects against the schema like reads do.
      *
      * With `sets`/`onCreate`/`onMatch` (MERGE only — the idiomatic edge
      * counter `MERGE (a)-[r:T]->(b) ON CREATE SET r.n = 1 ON MATCH SET
      * r.n = r.n + 1`), the frame first LEFT-joins the CURRENT edge store
      * on (endpoint keys + merge props), which binds `r`'s current
      * properties and yields a matched marker — the same pre-join shape as
      * [[mergeNodeWrite]] — then hands the resolved values to
      * [[GraphWriter.upsertEdges]]'s full-outer upsert.
      */
    def mergeEdgeWrite(df: DataFrame, ctx: Ctx, path: PathPat,
        create: Boolean,
        sets: Seq[(String, Expr)] = Nil,
        onCreate: Seq[(String, Expr)] = Nil,
        onMatch: Seq[(String, Expr)] = Nil): (DataFrame, Ctx) = {
      val (rel, dstPat) = path.hops.head
      val aVar = path.head.variable.getOrElse(
        throw CypherException("relationship write needs named endpoints"))
      val bVar = dstPat.variable.getOrElse(
        throw CypherException("relationship write needs named endpoints"))
      Seq(aVar, bVar).foreach(x =>
        if (!ctx.labels.contains(x))
          throw CypherException(s"relationship write endpoint $x is not a bound node"))
      val label = rel.labels match {
        case Seq(l) => l
        case _ => throw CypherException(
          "relationship write needs exactly one relationship type")
      }
      val (s0, d0) = rel.dir match {
        case Out => (aVar, bVar)
        case In => (bVar, aVar)
        case Undirected =>
          throw CypherException("relationship write needs a direction (-[]-> or <-[]-)")
      }
      val (sLabel, dLabel) = (ctx.labels(s0), ctx.labels(d0))
      // schema orientation wins over the written arrow (direction
      // correction, same rule as reads)
      val (keyS, keyT, srcVar, dstVar) = store.schema.edges.find(_.label == label) match {
        case Some(et) =>
          if (et.src == sLabel && et.dst == dLabel) (et.keyS, et.keyT, s0, d0)
          else if (et.src == dLabel && et.dst == sLabel) (et.keyS, et.keyT, d0, s0)
          else throw CypherException(
            s"relationship $label connects ${et.src}→${et.dst}, not $sLabel→$dLabel")
        case None =>
          val ks = store.schema.node(sLabel).key
          val kt0 = store.schema.node(dLabel).key
          (ks, if (kt0 == ks) kt0 + "_dst" else kt0, s0, d0)
      }
      if (sets.isEmpty && onCreate.isEmpty && onMatch.isEmpty) {
        val incoming = df.select(
          nodeKeyCol(srcVar, ctx).as(keyS) +: nodeKeyCol(dstVar, ctx).as(keyT) +:
            rel.props.map { case (p, e) => column(e, ctx).as(p) }: _*)
        // endpoint keys come from MATCHed or just-CREATEd node frames, so
        // the merged rows keep the endpoint-validated invariant
        store = GraphWriter.mergeEdges(store, label, ctx.labels(srcVar), ctx.labels(dstVar),
          keyS, keyT, incoming, create, endpointsValidated = true)
        rel.variable match {
          case Some(rv) =>
            val d = rel.props.foldLeft(df) { case (acc, (p, e)) =>
              acc.withColumn(s"${rv}__$p", column(e, ctx))
            }
            (d, ctx.copy(rels = ctx.rels + (rv -> RelInfo(label, srcVar, dstVar))))
          case None => (df, ctx)
        }
      } else {
        if (create)
          throw CypherException("ON CREATE/ON MATCH SET applies to MERGE, not CREATE")
        val rv = rel.variable.getOrElse(anonVar())
        if (ctx.rels.contains(rv) || ctx.labels.contains(rv))
          throw CypherException(s"MERGE relationship variable $rv is already bound")
        val mergeKeys = rel.props.map(_._1)
        def toMap(xs: Seq[(String, Expr)]) = {
          val m = collection.mutable.LinkedHashMap[String, Expr]()
          xs.foreach { case (k, e) => if (!mergeKeys.contains(k)) m(k) = e }
          m
        }
        val setMap = toMap(sets)
        val ocMap = toMap(onCreate)
        val omMap = toMap(onMatch)
        val touched = (setMap.keys ++ ocMap.keys ++ omMap.keys).toSeq.distinct
        val mark = s"__emerged_$rv"
        // captured BEFORE the upsert mutates `store`: valueOf is evaluated
        // again for the post-write frame refresh
        val brandNew = !store.edges.contains(label)
        val existedProps: Seq[String] =
          if (!brandNew) store.schema.edge(label).properties else Nil
        val joined = store.edges.get(label) match {
          case Some(ed0) =>
            val ed = ed0.columns.foldLeft(ed0)((d, c) =>
              d.withColumnRenamed(c, s"${rv}__$c")).withColumn(mark, lit(true))
            val cond = (nodeKeyCol(srcVar, ctx) <=> col(s"${rv}__$keyS")) &&
              (nodeKeyCol(dstVar, ctx) <=> col(s"${rv}__$keyT")) &&
              rel.props.map { case (p, e) => column(e, ctx) <=> col(s"${rv}__$p") }
                .foldLeft(lit(true))(_ && _)
            df.join(ed, cond, "left_outer")
          case None => df.withColumn(mark, lit(null).cast("boolean"))
        }
        val ctxN = ctx.copy(rels = ctx.rels + (rv -> RelInfo(label, srcVar, dstVar)))
        val matched = col(mark).isNotNull
        def cur(p: String): Column =
          if (existedProps.contains(p)) col(s"${rv}__$p") else lit(null)
        def valueOf(p: String): Column =
          if (brandNew)
            // brand-new type: nothing can match — compile only the create
            // branch (ON MATCH may reference properties that don't exist)
            ocMap.get(p).orElse(setMap.get(p)).map(e => columnL(e, ctxN, Map.empty))
              .getOrElse(lit(null))
          else
            when(matched,
              omMap.get(p).orElse(setMap.get(p)).map(e => columnL(e, ctxN, Map.empty))
                .getOrElse(cur(p)))
              .otherwise(
                ocMap.get(p).orElse(setMap.get(p)).map(e => columnL(e, ctxN, Map.empty))
                  .getOrElse(lit(null)))
        val incoming = joined.select(
          nodeKeyCol(srcVar, ctx).as(keyS) +: nodeKeyCol(dstVar, ctx).as(keyT) +:
            (rel.props.map { case (p, e) => column(e, ctx).as(p) } ++
              touched.map(p => valueOf(p).as(p))): _*)
        store = GraphWriter.upsertEdges(store, label, ctx.labels(srcVar),
          ctx.labels(dstVar), keyS, keyT, incoming, mergeKeys,
          endpointsValidated = true)
        // refresh the binding in place: merge props from the pattern exprs,
        // touched properties from the same value expressions the store got
        var out = joined.withColumns(
          rel.props.map { case (p, e) => s"${rv}__$p" -> column(e, ctx) }.toMap ++
            touched.map(p => s"${rv}__$p" -> valueOf(p)).toMap)
        out = out.drop(mark)
        (out, ctxN)
      }
    }

    /** `CREATE (n:L {…})` — one node per frame row, no matching. Binds `n`
      * column-wise from the written properties (cheaper than a join: a
      * created node's properties are exactly what the row wrote).
      */
    def createNodeWrite(df: DataFrame, ctx: Ctx, pat: NodePat): (DataFrame, Ctx) = {
      val v = pat.variable.getOrElse(anonVar())
      if (ctx.labels.contains(v))
        throw CypherException(s"CREATE variable $v is already bound")
      if (pat.alts.nonEmpty) throw CypherException(
        "CREATE node pattern cannot use a label disjunction (" +
          pat.alts.mkString("|") + ") — a created node has one label")
      val label = pat.label.getOrElse(
        throw CypherException("CREATE node pattern needs a label"))
      if (pat.props.isEmpty)
        throw CypherException("CREATE node pattern needs at least one property")
      val incoming = df.select(pat.props.map { case (p, e) => column(e, ctx).as(p) }: _*)
      store = GraphWriter.createNodes(store, label, incoming)
      val nt = store.schema.node(label)
      val given = pat.props.toMap
      val d = (nt.key +: nt.properties).foldLeft(df) { (acc, c) =>
        acc.withColumn(s"${v}__$c", given.get(c).map(column(_, ctx)).getOrElse(lit(null)))
      }
      (d, ctx.copy(labels = ctx.labels + (v -> label)))
    }

    /** One CREATE path: create unbound nodes, then create each hop edge. */
    def createPath(df0: DataFrame, ctx0: Ctx, path: PathPat): (DataFrame, Ctx) = {
      var df = df0
      var ctx = ctx0
      def ensure(pat: NodePat): NodePat = {
        val withVar = pat.variable match {
          case Some(_) => pat
          case None => pat.copy(variable = Some(anonVar()))
        }
        if (!ctx.labels.contains(withVar.variable.get)) {
          val (d2, c2) = createNodeWrite(df, ctx, withVar)
          df = d2; ctx = c2
        }
        withVar
      }
      val head = ensure(path.head)
      var prev = head
      path.hops.foreach { case (rel, node) =>
        val n = ensure(node)
        val (d2, c2) = mergeEdgeWrite(df, ctx, PathPat(prev, Seq((rel, n))), create = true)
        df = d2; ctx = c2
        prev = n
      }
      (df, ctx)
    }

    /** Standalone SET on an already-bound node or relationship variable:
      * upsert the store (node key / edge identity), refresh the frame's
      * columns in place. A relationship's identity is its endpoint keys
      * plus every property column the match bound — the same parallel-edge
      * rule as DELETE r ([[deleteVar]]): `SET r.w = 1` on a matched
      * `()-[r:T {k: 2}]->()` touches only the parallel edges whose
      * properties matched.
      */
    /** `SET v:Label` / `REMOVE v:Label` — label membership mutation.
      * Secondary membership is PROVENANCE rows `(targetLabel,
      * sourceLabel) → key` in [[GraphStore.memberships]], never rows in
      * the target label's node store (r12 ADVICE: the old row-upserting
      * design silently overwrote / deleted genuine native nodes whose key
      * VALUES collided with the members' — e.g. `MATCH (p:Person) REMOVE
      * p:Acct` destroyed unrelated Acct nodes). Members materialize at
      * MATCH time from the LIVE source store ([[labelFrame]]), so the
      * node answers `MATCH (n:Label)` afterwards — with its CURRENT
      * properties, like Neo4j's one-node-many-labels. An unknown label
      * registers a node type cloning v's schema over an EMPTY native
      * store. REMOVE deletes only the matching provenance rows: native
      * nodes of the target label are untouchable by construction (Neo4j:
      * removing a label a node never had is a no-op). Removing the node's
      * OWN store label rejects loudly — the store cannot hold label-less
      * nodes (documented deviation; use DETACH DELETE). Reference write
      * surface: final/inject_node.py:351-358 (dynamic labels at
      * injection).
      */
    def setLabels(df: DataFrame, ctx: Ctx, v: String,
        ls: Seq[String], add: Boolean): (DataFrame, Ctx) = {
      val label = ctx.labels.getOrElse(v, throw CypherException(
        s"SET/REMOVE label target $v is not a bound single-label node variable"))
      val nt = store.schema.node(label)
      // matched member keys in the ONE store-side rendering every
      // membership consumer joins on: the source key as a string
      val matchedKeys = df.select(
        col(s"${v}__${nt.key}").cast(StringType).as("__m_key"))
        .na.drop().distinct()
      // Provenance resolution (r13 ADVICE): when the bound label itself
      // holds membership-derived rows, a matched key may belong to a
      // member whose TRUE home is another source store — recording it
      // under (l, label) would point the provenance at the wrong store
      // (the member silently drops from the new label, or a colliding
      // native node is fabricated as a member). Partition the matched
      // keys: keys present in the NATIVE store write under (l, label);
      // for each inbound pair (label, s) the member keys whose target
      // rendering matched write under (l, s) with their ORIGINAL
      // source-keyspace keys. On a key-value collision both partitions
      // claim the key — both rows matched (§2.15 deviation 2's
      // key-linked identity). No inbound memberships — every ordinary
      // store — keeps the old single-pair path untouched.
      val inbound = store.memberships.keysIterator
        .collect { case (t, s) if t == label => s }.toSeq.distinct.sorted
      val perSource: Seq[(String, DataFrame)] =
        if (inbound.isEmpty) Seq(label -> matchedKeys)
        else {
          val native = matchedKeys.join(
            store.nodes(label)
              .select(col(nt.key).cast(StringType).as("__m_key")),
            Seq("__m_key"), "left_semi")
          val tgtType = store.nodes(label).schema(nt.key).dataType
          val members = inbound.map { s =>
            val snt = store.schema.node(s)
            val srcDf = store.nodes(s)
            val m = store.memberships((label, s))
            s -> srcDf
              .join(m, srcDf(snt.key).cast(StringType) === m("__m_key"),
                "left_semi")
              .select(col(snt.key).cast(tgtType).cast(StringType)
                  .as("__t_key"),
                col(snt.key).cast(StringType).as("__m_key"))
              .join(matchedKeys.withColumnRenamed("__m_key", "__t_key"),
                Seq("__t_key"), "left_semi")
              .select("__m_key").distinct()
          }
          (label -> native) +: members
        }
      ls.foreach { l =>
        if (!add) {
          if (l == label) throw CypherException(
            s"REMOVE $v:$l would leave the node label-less — the " +
              "fixed-schema store keys every node to exactly one primary " +
              "label (use DETACH DELETE to drop the node, or REMOVE a " +
              "secondary label)")
          // a membership-derived row natively holds ITS source label: if
          // any matched member came from source l, REMOVE v:l targets
          // that row's PRIMARY label — same label-less hazard, runtime-
          // gated so native-only matches keep working
          perSource.collectFirst { case (s, keys) if s == l && s != label =>
            keys }.foreach { keys =>
            if (!keys.isEmpty) throw CypherException(
              s"REMOVE $v:$l matches membership-derived rows whose " +
                s"primary label IS $l — removing it would leave them " +
                "label-less (use DETACH DELETE, or match them through " +
                "their own label)")
          }
        }
        perSource.foreach { case (src, keys) =>
          if (add) {
            // SET of a label the node natively holds is a no-op (Neo4j).
            // On the partitioned path an empty partition writes NO pair —
            // a (l, src) entry with zero keys would join src's store into
            // every later labelFrame(l)/lift for nothing (the runtime
            // isEmpty probe only runs when inbound memberships exist;
            // the common single-partition path stays action-free).
            if (l != src && (inbound.isEmpty || !keys.isEmpty)) {
              if (!store.schema.nodes.exists(_.name == l)) {
                // brand-new label: a node type cloning v's schema, native
                // store EMPTY — every row is membership-derived
                store = store.copy(
                  schema = store.schema.copy(nodes = store.schema.nodes :+
                    NodeType(l, nt.key, properties = nt.properties,
                      keyUnique = true)),
                  nodes = store.nodes + (l -> store.nodes(label).limit(0)))
              }
              val old = store.memberships.get((l, src))
              val merged = old match {
                case Some(m) => m.unionByName(keys).distinct()
                case None => keys
              }
              // eagerly checkpoint the provenance frame: it is re-read by
              // EVERY later membership lift / labels() / MATCH on the
              // label, and left lazy it re-pays its source scan + distinct
              // per query (ProfileMembership measured 1.7 s/query at
              // sf10); checkpointed it is a bounded broadcastable key set.
              // localCheckpoint(true), not persist (r14 ADVICE): the new
              // frame derives from the superseded one, so it must be
              // MATERIALIZED before that parent's blocks release, and the
              // checkpoint TRUNCATES lineage — chained mutations in one
              // session never stack union/anti-join plans or orphaned
              // cached RDDs (r13 ADVICE).
              // the superseded frame is NOT force-released (ADVICE r15:
              // unpersist is a no-op on a localCheckpoint'd Dataset — its
              // LogicalRDD blocks were never in the cacheManager, and
              // force-dropping them would truncate a retained pre-mutation
              // immutable store into unreadability); the blocks release
              // when the RDD is GC'd and the ContextCleaner runs
              store = store.copy(memberships = store.memberships +
                ((l, src) -> merged.localCheckpoint(true)))
              // §2.15 deviation-2 collisions made LOUD (r15 verdict #2):
              // count member keys whose target-keyspace rendering equals a
              // NATIVE l key. The membership model is exact in every
              // non-collision case; where this is nonzero, the member and
              // the colliding native node double-match key joins — publish
              // the count on WriteResult.observed and warn, so a user
              // whose integer-keyed tables share id ranges finds out at
              // write time. One semi-join over the just-checkpointed
              // bounded provenance frame against l's key column — SKIPPED
              // when the audit provably cannot fire (r16, r15 verdict #5:
              // empty native target — every SET-onto-new-label query — or
              // disjoint integral key ranges from the memoized key stats).
              val coll =
                if (!store.collisionPossible(l, src)) 0L
                else store.membershipCollisionFrame(l, src).count()
              if (coll > 0) {
                writeObservations(s"collisions:$l<-$src") =
                  writeObservations.getOrElse(s"collisions:$l<-$src", 0L)
                    .max(coll)
                org.slf4j.LoggerFactory.getLogger("graft.cypher.writes")
                  .warn(s"SET :$l matched $coll member key(s) from $src " +
                    s"whose rendering collides with native $l keys — " +
                    "both match key-joined patterns (see GraphStore" +
                    ".describe 'collision' rows and SURVEY.md §2.15)")
              }
            }
          } else {
            store.memberships.get((l, src)).foreach { m =>
              // superseded frame left to GC + ContextCleaner (see the SET
              // branch above — unpersist on a localCheckpoint'd Dataset is
              // a no-op, and force-dropping would break retained stores)
              store = store.copy(memberships = store.memberships +
                ((l, src) -> m.join(keys, Seq("__m_key"), "left_anti")
                  .localCheckpoint(true)))
            } // no provenance rows from this source → no-op (Neo4j: the
              // node never had the label; native target nodes are NEVER
              // touched)
          }
        }
      }
      (df, ctx)
    }

    def standaloneSet(df: DataFrame, ctx: Ctx, item: SetItem): (DataFrame, Ctx) = {
      item match {
        case SetLabel(v, ls, add) => return setLabels(df, ctx, v, ls, add)
        case _ => ()
      }
      // normalize to (prop, value-column) pairs; `SET v = {…}` (replace-
      // all) expands to EVERY stored property — absent ones reset to a
      // typed null (the fixed-schema analogue of Neo4j's removal)
      def replaceAll(v: String, m: Seq[(String, Expr)],
          stored: Seq[String], schema: StructType,
          keyNames: Seq[String], what: String): Seq[(String, Column)] = {
        m.foreach { case (p, _) =>
          if (keyNames.contains(p)) throw CypherException(
            s"SET $v = {…} cannot replace '$p' — it is the $what's identity; " +
              "use explicit SET items for non-identity properties")
          if (!stored.contains(p)) throw CypherException(
            s"SET $v = {…}: unknown property '$p' for the $what (the store " +
              "schema is fixed)")
        }
        stored.map(p => p -> m.find(_._1 == p).map { case (_, e) => column(e, ctx) }
          .getOrElse(lit(null).cast(schema(p).dataType)))
      }
      val (v, pairs) = item match {
        case SetPlus(x, m) => (x, m.map { case (p, e) => p -> column(e, ctx) })
        case SetProp(x, p, e) => (x, Seq(p -> column(e, ctx)))
        case SetAll(x, m) => ctx.labels.get(x) match {
          case Some(label) =>
            val nt = store.schema.node(label)
            (x, replaceAll(x, m, nt.properties, store.nodes(label).schema,
              Seq(nt.key), s"node :$label"))
          case None =>
            val ri = ctx.rels.getOrElse(x, throw CypherException(
              s"SET target $x is not a bound node or single-type relationship variable"))
            val et = store.schema.edge(ri.label)
            (x, replaceAll(x, m, et.properties, store.edges(ri.label).schema,
              Seq(et.keyS, et.keyT), s"relationship :${ri.label}"))
        }
      }
      ctx.labels.get(v) match {
        case Some(label) =>
          val nt = store.schema.node(label)
          val incoming = df.select(
            col(s"${v}__${nt.key}").as(nt.key) +:
              pairs.map { case (p, c) => c.as(p) }: _*)
          store = GraphWriter.mergeNodes(store, label, incoming, Seq(nt.key))
          val d = pairs.foldLeft(df) { case (acc, (p, c)) =>
            acc.withColumn(s"${v}__$p", c)
          }
          (d, ctx)
        case None =>
          val RelInfo(label, sV, dV) = ctx.rels.getOrElse(v,
            throw CypherException(
              s"SET target $v is not a bound node or single-type relationship variable"))
          val et = store.schema.edge(label)
          val idProps = et.properties
            .filter(p => df.columns.contains(s"${v}__$p"))
          val sel = Seq(nodeKeyCol(sV, ctx).as(et.keyS),
              nodeKeyCol(dV, ctx).as(et.keyT)) ++
            idProps.map(p => col(s"${v}__$p").as(p)) ++
            pairs.map { case (p, c) => c.as(s"__set_$p") }
          store = GraphWriter.updateEdges(store, label, df.select(sel: _*))
          val d = pairs.foldLeft(df) { case (acc, (p, c)) =>
            acc.withColumn(s"${v}__$p", c)
          }
          (d, ctx)
      }
    }

    /** `[DETACH] DELETE v` — node or relationship variable. The frame keeps
      * the deleted bindings (Neo4j semantics); only the store shrinks.
      */
    def deleteVar(df: DataFrame, ctx: Ctx, v: String, detach: Boolean): Unit =
      ctx.labels.get(v) match {
        case Some(label) =>
          val key = store.schema.node(label).key
          val keys = df.select(col(s"${v}__$key").as(key)).distinct()
          store = GraphWriter.deleteNodes(store, label, keys, detach)
        case None => ctx.rels.get(v) match {
          case Some(RelInfo(label, sV, dV)) =>
            val et = store.schema.edge(label)
            // the matched relationship's property columns are part of its
            // identity: without them DELETE r would remove ALL parallel
            // edges between each matched pair, including ones whose
            // properties did not match the pattern
            val propCols = et.properties
              .filter(p => df.columns.contains(s"${v}__$p"))
              .map(p => col(s"${v}__$p").as(p))
            val pairs = df.select(
              Seq(nodeKeyCol(sV, ctx).as(et.keyS),
                nodeKeyCol(dV, ctx).as(et.keyT)) ++ propCols: _*).distinct()
            store = GraphWriter.deleteEdges(store, label, pairs)
          case None => throw CypherException(s"cannot DELETE unbound variable $v")
        }
      }

    /** Apply a stage's write clauses in order, fusing `MERGE node` with the
      * SET clauses that immediately follow it and target only its variable
      * (the reference's injection shape, final/inject_node.py:350-358).
      */
    def applyWrites(df0: DataFrame, ctx0: Ctx,
        writes: Seq[WriteClause]): (DataFrame, Ctx) = {
      var df = df0
      var ctx = ctx0
      var i = 0
      /** Flatten SET items to (prop, Expr) pairs. `expandAll` realizes
        * `SET v = {…}` (replace-all) for the merge target: every stored
        * non-identity property, absent ones reset to a [[TypedNull]] of
        * the store column's type (round 11; closes the r10 verdict's
        * "What's missing #5"). Fused/standalone contexts that can't
        * expand pass None and keep the loud rejection.
        */
      def flat(items: Seq[SetItem],
          expandAll: Option[Seq[(String, Expr)] => Seq[(String, Expr)]] = None)
          : Seq[(String, Expr)] = items.map {
        case SetPlus(_, m) => m
        case SetProp(_, p, e) => Seq((p, e))
        case SetAll(x, m) => expandAll.fold[Seq[(String, Expr)]](
          throw CypherException(
            s"SET $x = {…} (replace-all) is not supported inside a fused " +
              "SET — use += / explicit properties, or a separate " +
              "standalone SET clause"))(f => f(m))
        case SetLabel(x, ls, _) => throw CypherException(
          s"SET $x:${ls.mkString(":")} is not supported in this position")
      }.flatten
      /** Replace-all expansion over a declared property list: map keys
        * must be known non-identity properties; every stored property is
        * emitted (map value, or a typed null reset). Merge-pattern props
        * are excluded downstream by mergeNode/EdgeWrite's toMap (the
        * merge identity never resets).
        */
      def expandOver(v: String, stored: Seq[String], schema: Option[StructType],
          keyNames: Seq[String], what: String)(
          m: Seq[(String, Expr)]): Seq[(String, Expr)] = {
        m.foreach { case (p, _) =>
          if (keyNames.contains(p)) throw CypherException(
            s"SET $v = {…} cannot replace '$p' — it is the $what's identity; " +
              "use explicit SET items for non-identity properties")
          if (!stored.contains(p)) throw CypherException(
            s"SET $v = {…}: unknown property '$p' for the $what (the store " +
              "schema is fixed)")
        }
        stored.map(p => p -> m.find(_._1 == p).map(_._2).getOrElse(
          TypedNull(schema.flatMap(s => s.fields.find(_.name == p))
            .map(_.dataType).getOrElse(StringType))))
      }
      while (i < writes.length) {
        writes(i) match {
          case MergeClause(path, onCreate, onMatch) if path.hops.isEmpty =>
            val v = path.head.variable.getOrElse(
              throw CypherException("MERGE node pattern needs a variable"))
            def targets(items: Seq[SetItem], who: String): Unit = items.foreach {
              case SetPlus(x, _) if x != who => throw CypherException(
                s"ON CREATE/ON MATCH SET must target the merge variable $who")
              case SetProp(x, _, _) if x != who => throw CypherException(
                s"ON CREATE/ON MATCH SET must target the merge variable $who")
              case SetAll(x, _) if x != who => throw CypherException(
                s"ON CREATE/ON MATCH SET must target the merge variable $who")
              case SetLabel(x, _, _) if x != who => throw CypherException(
                s"ON CREATE/ON MATCH SET must target the merge variable $who")
              case _ => ()
            }
            targets(onCreate, v); targets(onMatch, v)
            // label additions apply POST-merge to the created / matched
            // subset (discriminated against the label's pre-merge key set)
            val labelOnCreate = onCreate.collect { case sl: SetLabel => sl }
            val labelOnMatch = onMatch.collect { case sl: SetLabel => sl }
            val onCreateRest = onCreate.filterNot(_.isInstanceOf[SetLabel])
            val onMatchRest = onMatch.filterNot(_.isInstanceOf[SetLabel])
            val preKeys: Option[(DataFrame, String)] =
              if (labelOnCreate.isEmpty && labelOnMatch.isEmpty) None
              else for {
                lbl <- path.head.label
                n <- store.nodes.get(lbl)
              } yield {
                val k = store.schema.node(lbl).key
                // immutable lineage: this frame still reads the PRE-merge
                // rows after the store advances
                (n.select(col(k).as("__prek")), k)
              }
            val sets = Seq.newBuilder[(String, Expr)]
            var j = i + 1
            var fusing = true
            while (fusing && j < writes.length) writes(j) match {
              case SetClause(items) if items.forall {
                    case SetPlus(x, _) => x == v
                    case SetProp(x, _, _) => x == v
                    case _ => false // replace-all/labels: standalone below
                  } =>
                sets ++= flat(items)
                j += 1
              case _ => fusing = false
            }
            // ON-SET replace-all expands against the merge label's
            // declared schema (brand-new labels have none to expand
            // against and keep the rejection)
            val nodeExpand = path.head.label.flatMap(label =>
              store.schema.nodes.find(_.name == label).map(nt =>
                expandOver(v, nt.properties,
                  store.nodes.get(label).map(_.schema), Seq(nt.key),
                  s"node :$label") _))
            val (d2, c2) = mergeNodeWrite(df, ctx, path.head, sets.result(),
              flat(onCreateRest, nodeExpand), flat(onMatchRest, nodeExpand))
            df = d2; ctx = c2
            if (labelOnCreate.nonEmpty || labelOnMatch.nonEmpty) {
              val mLabel = c2.labels(v)
              val keyCol = col(s"${v}__${store.schema.node(mLabel).key}")
              def subset(created: Boolean): DataFrame = preKeys match {
                case Some((pk, _)) => d2.join(pk, keyCol === col("__prek"),
                  if (created) "left_anti" else "left_semi")
                case None => if (created) d2 else d2.limit(0)
              }
              labelOnCreate.foreach(sl =>
                setLabels(subset(created = true), c2, v, sl.labels, sl.add))
              labelOnMatch.foreach(sl =>
                setLabels(subset(created = false), c2, v, sl.labels, sl.add))
            }
            i = j
          case MergeClause(path, onCreate, onMatch) if path.hops.size == 1 =>
            // ON CREATE/ON MATCH SET and immediately-following SET clauses
            // must target the merge's relationship variable (node-endpoint
            // SETs are separate standalone clauses, not part of the merge)
            val rvOpt = path.hops.head._1.variable
            def relTargets(items: Seq[SetItem]): Unit = items.foreach {
              case SetPlus(x, _) if !rvOpt.contains(x) => throw CypherException(
                s"ON CREATE/ON MATCH SET on a relationship MERGE must target " +
                  s"its relationship variable${rvOpt.fold("")(" " + _)}")
              case SetProp(x, _, _) if !rvOpt.contains(x) => throw CypherException(
                s"ON CREATE/ON MATCH SET on a relationship MERGE must target " +
                  s"its relationship variable${rvOpt.fold("")(" " + _)}")
              case SetAll(x, _) if !rvOpt.contains(x) => throw CypherException(
                s"ON CREATE/ON MATCH SET on a relationship MERGE must target " +
                  s"its relationship variable${rvOpt.fold("")(" " + _)}")
              case SetLabel(_, _, _) => throw CypherException(
                "SET r:Label on a relationship MERGE — relationships have " +
                  "a single type; labels apply to nodes")
              case _ => ()
            }
            relTargets(onCreate); relTargets(onMatch)
            val sets = Seq.newBuilder[(String, Expr)]
            var j = i + 1
            var fusing = rvOpt.nonEmpty
            while (fusing && j < writes.length) writes(j) match {
              case SetClause(items) if items.forall {
                    case SetPlus(x, _) => rvOpt.contains(x)
                    case SetProp(x, _, _) => rvOpt.contains(x)
                    case _ => false // replace-all/labels: standalone below
                  } =>
                sets ++= flat(items)
                j += 1
              case _ => fusing = false
            }
            val relExpand = for {
              rv <- rvOpt
              lbl <- path.hops.head._1.labels.headOption
              et <- store.schema.edges.find(_.label == lbl)
            } yield expandOver(rv, et.properties,
              store.edges.get(lbl).map(_.schema), Seq(et.keyS, et.keyT),
              s"relationship :$lbl") _
            val (d2, c2) = mergeEdgeWrite(df, ctx, path, create = false,
              sets.result(), flat(onCreate, relExpand), flat(onMatch, relExpand))
            df = d2; ctx = c2
            i = j max (i + 1)
          case MergeClause(_, _, _) =>
            throw CypherException(
              "MERGE supports a single node or a single-relationship pattern")
          case CreateClause(paths) =>
            paths.foreach { p =>
              val (d2, c2) = createPath(df, ctx, p)
              df = d2; ctx = c2
            }
            i += 1
          case SetClause(items) =>
            items.foreach { item =>
              val (d2, c2) = standaloneSet(df, ctx, item)
              df = d2; ctx = c2
            }
            i += 1
          case DeleteClause(vars, detach) =>
            vars.foreach(v => deleteVar(df, ctx, v, detach))
            i += 1
          case ForeachClause(x, coll, body) =>
            // side-effect-only iteration (Neo4j FOREACH): explode the list
            // into a SCRATCH frame with x bound as a plain column, run the
            // body writes against it (they mutate the shared store), then
            // continue with the ORIGINAL frame — FOREACH never changes the
            // enclosing cardinality or bindings. Empty/null lists explode
            // to zero scratch rows = no-op, matching Neo4j. Semantics
            // note: body writes apply BATCH-AT-ONCE over the exploded
            // frame (the engine's set-oriented write model), not
            // element-sequentially — same-key collisions within one
            // FOREACH follow MERGE's batch upsert rules, so an ON MATCH
            // counter does not observe earlier elements of the same batch.
            val base = if (df == null)
              spark.range(1).select() else df // write-only query: one row
            val scratch = base.withColumn(x, explode(column(coll, ctx)))
            applyWrites(scratch, ctx.copy(plains = ctx.plains + x), body)
            i += 1
        }
      }
      (df, ctx)
    }
}
