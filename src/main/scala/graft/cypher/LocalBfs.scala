package graft.cypher

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

import CypherEngine.{CypherException, UniqueWalkMaxPathsKey}

/** Single-task local BFS / walk-enumeration kernels behind the
  * shortestPath family's adaptive physical strategy (split out of
  * [[CypherEngine]], r16 — the r14 <2,000-LoC file invariant). The
  * kernels live on this OBJECT, not the Interp traits: their
  * mapPartitions closures must stay free of any reference to the
  * non-serializable interpreter instance (an anonymous class nested in
  * a trait method captures the trait as its outer pointer). Gate policy
  * (edge caps, work budgets, conf keys) stays on [[CypherEngine]];
  * this file is only the kernels and their orderings.
  */
private[cypher] object LocalBfs {

  /** Materialized-row budget inside [[localDist]]'s keepAll / withRels
    * branches (ADVICE r15 medium): the edge cap and the seeds×edges work
    * budget bound the TRAVERSAL, but allShortestPaths multiplicity — the
    * number of distinct minimum-length (path, type-sequence) pairs — is
    * unbounded by either (parallel edge types compound per hop), and those
    * rows accumulate in ONE task's heap. Over budget the kernel throws
    * [[LocalPathsOverBudget]]; the caller catches it (cause-chain scan —
    * Spark wraps task failures) and re-runs the SAME BFS on the
    * distributed, spillable [[graft.cypher]] bfsFrames shape, which the
    * old pre-r15 gate always took for these shapes.
    */
  private[cypher] val LocalKeepAllRowBudget: Long = 2L * 1000 * 1000
  final class LocalPathsOverBudget(msg: String) extends RuntimeException(msg)
  @annotation.tailrec
  private[cypher] def isLocalPathsOverBudget(t: Throwable): Boolean = t match {
    case null => false
    case _: LocalPathsOverBudget => true
    case _ =>
      // Spark may surface a remote task failure as a flattened message
      // instead of a typed cause (e.g. after executor-side serialization)
      if (t.getMessage != null && t.getMessage.contains("LocalPathsOverBudget"))
        true
      else isLocalPathsOverBudget(t.getCause)
  }

  /** Orders node-key values the way Spark orders them inside `min(__path)`:
    * integral types numerically, strings as unsigned UTF-8 bytes (Spark
    * compares `UTF8String` binary, NOT java.lang.String UTF-16 order — they
    * differ beyond the BMP). Key types without a faithful local ordering
    * return None and stay on the distributed path.
    */
  // Single-task BFS kernels live on the OBJECT (not the Interp traits):
  // their mapPartitions closures must stay free of any reference to the
  // non-serializable interpreter instance (an anonymous class nested in a
  // trait method captures the trait as its outer pointer).

  /** Single-task relationship-unique path enumeration — the local
    * strategy behind [[uniqueWalkClosure]]'s adaptive switch, mirroring
    * [[localDist]]: edges and seeds arrive in one task via a tagged
    * union (never through the driver). Per-path visited-edge sets are
    * immutable cons lists over edge INDICES — structural sharing makes
    * the per-path memory one cell, and the linear `contains` scan is
    * bounded by path length. The budget throw inside the task surfaces
    * through the caller's unwrap as the standard loud budget error.
    * `e` columns: (__cs, __cd, __eid); a `None` seed set means
    * every edge source starts a path (unanchored pattern).
    */
  def localUniqueWalk(e: DataFrame, seeds: Option[DataFrame],
      lo: Int, maxPaths: Long): DataFrame = {
    val spark = e.sparkSession
    val seedAll = seeds.isEmpty
    val base = e.select(lit(0).as("__t"), col("__cs"), col("__cd"))
    val tagged = seeds match {
      case Some(s) => base.unionByName(
        s.select(lit(1).as("__t"), col("__seed").as("__cs"), col("__seed").as("__cd")))
      case None => base
    }
    val loV = lo
    val budget = maxPaths
    val rows = tagged.coalesce(1).rdd.mapPartitions { it =>
      import scala.collection.mutable
      val dsts = mutable.ArrayBuffer.empty[Any]
      val adj = mutable.HashMap.empty[Any, mutable.ArrayBuffer[Int]]
      val seedSet = mutable.LinkedHashSet.empty[Any]
      it.foreach { r =>
        if (r.getInt(0) == 0) {
          if (!r.isNullAt(1) && !r.isNullAt(2)) {
            val i = dsts.length
            dsts += r.get(2)
            adj.getOrElseUpdate(r.get(1), mutable.ArrayBuffer.empty) += i
            if (seedAll) seedSet += r.get(1)
          }
        } else if (!r.isNullAt(1)) seedSet += r.get(1)
      }
      def overBudget(paths: Long, len: Int): Nothing = throw CypherException(
        s"open-bound var-length enumerated more than $budget " +
          s"relationship-unique paths by length $len — bound the " +
          s"pattern (*1..n) or raise $UniqueWalkMaxPathsKey")
      val out = mutable.ArrayBuffer.empty[Row]
      var frontier = mutable.ArrayBuffer.empty[(Any, Any, List[Int])]
      seedSet.foreach { s =>
        adj.get(s).foreach(_.foreach(ei => frontier += ((s, dsts(ei), ei :: Nil))))
      }
      var paths = frontier.length.toLong
      var len = 1
      if (paths > budget) overBudget(paths, len)
      if (loV <= 1) frontier.foreach { case (s, d, _) => out += Row(s, d) }
      while (frontier.nonEmpty) {
        val next = mutable.ArrayBuffer.empty[(Any, Any, List[Int])]
        frontier.foreach { case (s, cur, seen) =>
          adj.get(cur).foreach(_.foreach { ei =>
            if (!seen.contains(ei)) next += ((s, dsts(ei), ei :: seen))
          })
        }
        len += 1
        paths += next.length
        if (paths > budget) overBudget(paths, len)
        if (len >= loV) next.foreach { case (s, d, _) => out += Row(s, d) }
        frontier = next
      }
      out.iterator
    }
    spark.createDataFrame(rows,
      StructType(Seq(e.schema("__cs"), e.schema("__cd"))))
  }

  /** Single-task multi-source BFS with path tracking — the local strategy
    * behind [[distDf]]'s adaptive switch. Edges and seeds arrive in one
    * task via a tagged union (never through the driver); the BFS is
    * level-synchronous with per-destination lexicographic-min path
    * pruning, bit-identical to the distributed loop's
    * `groupBy(min(__path))` + anti-join discipline (string keys compare as
    * UTF-8 bytes, matching Spark's UTF8String ordering).
    */
  def localDist(e0: DataFrame, seeds: DataFrame, hi: Int,
      kt: DataType, keepAll: Boolean, withPath: Boolean,
      withRels: Boolean = false): DataFrame = {
    require(!withRels || withPath, "withRels requires withPath")
    val spark = e0.sparkSession
    val cmp = keyComparator(kt).get
    val maxLevel = hi.toLong
    // under withRels each edge row carries its member type (`__rt`) so the
    // BFS can accumulate the per-hop type sequence, mirroring
    // [[InterpPaths]]' distributed loop; seed rows carry a null type
    val rtCol = if (withRels) col("__rt") else lit(null).cast(StringType).as("__rt")
    val tagged = e0.select(lit(0).as("__t"), col("__ds"), col("__dd"), rtCol)
      .unionByName(seeds.select(lit(1).as("__t"),
        col("__seed").as("__ds"), col("__seed").as("__dd"),
        lit(null).cast(StringType).as("__rt")))
    val keepAllBudget = LocalKeepAllRowBudget
    val rows = tagged.coalesce(1).rdd.mapPartitions { it =>
      import scala.collection.mutable
      // keepAll multiplicity budget (ADVICE r15 medium): the edge/work caps
      // bound the traversal but NOT the number of distinct minimum-length
      // (path, types) pairs, which can compound per hop under parallel edge
      // types and all accumulate in this one task's heap. Count every
      // NEW pair materialized (frontier + promoted alike); over budget,
      // throw the typed marker the caller converts into a distributed
      // bfsFrames re-run.
      var mat = 0L
      def countMat(added: Boolean): Unit = if (added) {
        mat += 1
        if (mat > keepAllBudget) throw new LocalPathsOverBudget(
          s"single-task allShortestPaths materialized more than " +
            s"$keepAllBudget (path, rels) rows")
      }
      val adj = mutable.HashMap.empty[Any, mutable.ArrayBuffer[Any]]
      // parallel per-edge type buffer, populated only under withRels —
      // adjR(src)(i) is the type of the edge behind adj(src)(i)
      val adjR = mutable.HashMap.empty[Any, mutable.ArrayBuffer[String]]
      val seedSet = mutable.LinkedHashSet.empty[Any]
      it.foreach { r =>
        if (!r.isNullAt(1) && !r.isNullAt(2)) {
          if (r.getInt(0) == 0) {
            adj.getOrElseUpdate(r.get(1), mutable.ArrayBuffer.empty) += r.get(2)
            if (withRels)
              adjR.getOrElseUpdate(r.get(1), mutable.ArrayBuffer.empty) += r.getString(3)
          }
          else seedSet += r.get(1)
        }
      }
      val pathOrd = new Ordering[Vector[Any]] {
        def compare(a: Vector[Any], b: Vector[Any]): Int = {
          var i = 0
          val n = math.min(a.length, b.length)
          while (i < n) {
            val c = cmp(a(i), b(i))
            if (c != 0) return c
            i += 1
          }
          a.length - b.length
        }
      }
      // (path, type-sequence) ordering for the withRels single-path prune —
      // identical to the distributed loop's min(struct(__path, __rels)):
      // path elements first (field order), then the type strings as UTF-8
      // bytes (Spark's UTF8String ordering)
      val strCmp = keyComparator(StringType).get
      val prOrd = new Ordering[(Vector[Any], Vector[String])] {
        def compare(a: (Vector[Any], Vector[String]),
            b: (Vector[Any], Vector[String])): Int = {
          val c = pathOrd.compare(a._1, b._1)
          if (c != 0) return c
          var i = 0
          val n = math.min(a._2.length, b._2.length)
          while (i < n) {
            val c2 = strCmp(a._2(i), b._2(i))
            if (c2 != 0) return c2
            i += 1
          }
          a._2.length - b._2.length
        }
      }
      seedSet.iterator.flatMap { s =>
        if (withRels && keepAll) {
          // allShortestPaths with the per-hop type sequence: every distinct
          // (path, types) pair per destination at its minimum length
          val reached = mutable.HashMap
            .empty[Any, (Long, Vector[(Vector[Any], Vector[String])])]
          var frontier = mutable.HashMap
            .empty[Any, mutable.LinkedHashSet[(Vector[Any], Vector[String])]]
          adj.get(s).foreach { ds =>
            val rs = adjR(s)
            var i = 0
            while (i < ds.length) {
              countMat(frontier.getOrElseUpdate(ds(i), mutable.LinkedHashSet.empty)
                .add((Vector(s, ds(i)), Vector(rs(i)))))
              i += 1
            }
          }
          var level = 1L
          frontier.foreach { case (d, ps) => reached(d) = (level, ps.toVector) }
          while (level < maxLevel && frontier.nonEmpty) {
            val next = mutable.HashMap
              .empty[Any, mutable.LinkedHashSet[(Vector[Any], Vector[String])]]
            frontier.foreach { case (d, ps) =>
              adj.get(d).foreach { ds =>
                val rs = adjR(d)
                var i = 0
                while (i < ds.length) {
                  val d2 = ds(i)
                  if (!reached.contains(d2)) ps.foreach { case (p, rl) =>
                    countMat(next.getOrElseUpdate(d2, mutable.LinkedHashSet.empty)
                      .add((p :+ d2, rl :+ rs(i))))
                  }
                  i += 1
                }
              }
            }
            level += 1
            next.foreach { case (d, ps) => reached(d) = (level, ps.toVector) }
            frontier = next
          }
          reached.iterator.flatMap { case (d, (len, ps)) =>
            ps.iterator.map { case (p, rl) => Row(s, d, len, p, rl) }
          }
        } else if (withRels) {
          // shortestPath with relationships(p): ONE lexicographic-min
          // (path, types) pair per destination
          val reached = mutable.HashMap.empty[Any, (Long, Vector[Any], Vector[String])]
          var frontier = mutable.HashMap.empty[Any, (Vector[Any], Vector[String])]
          adj.get(s).foreach { ds =>
            val rs = adjR(s)
            var i = 0
            while (i < ds.length) {
              val pr = (Vector(s, ds(i)), Vector(rs(i)))
              if (frontier.get(ds(i)).forall(q => prOrd.compare(pr, q) < 0))
                frontier(ds(i)) = pr
              i += 1
            }
          }
          var level = 1L
          frontier.foreach { case (d, (p, rl)) => reached(d) = (level, p, rl) }
          while (level < maxLevel && frontier.nonEmpty) {
            val next = mutable.HashMap.empty[Any, (Vector[Any], Vector[String])]
            frontier.foreach { case (d, (p, rl)) =>
              adj.get(d).foreach { ds =>
                val rs = adjR(d)
                var i = 0
                while (i < ds.length) {
                  val d2 = ds(i)
                  if (!reached.contains(d2)) {
                    val pr = (p :+ d2, rl :+ rs(i))
                    if (next.get(d2).forall(q => prOrd.compare(pr, q) < 0))
                      next(d2) = pr
                  }
                  i += 1
                }
              }
            }
            level += 1
            next.foreach { case (d, (p, rl)) => reached(d) = (level, p, rl) }
            frontier = next
          }
          reached.iterator.map { case (d, (len, p, rl)) => Row(s, d, len, p, rl) }
        } else if (keepAll) {
          // allShortestPaths: keep EVERY distinct minimum-length path per
          // destination (LinkedHashSet dedups duplicate parallel edges);
          // the reached check still runs per level, so no path revisits
          // a node — mirroring the distributed loop's pair anti join
          val reached = mutable.HashMap.empty[Any, (Long, Vector[Vector[Any]])]
          var frontier = mutable.HashMap.empty[Any, mutable.LinkedHashSet[Vector[Any]]]
          adj.get(s).foreach(_.foreach { d =>
            countMat(frontier.getOrElseUpdate(d, mutable.LinkedHashSet.empty)
              .add(Vector(s, d)))
          })
          var level = 1L
          frontier.foreach { case (d, ps) => reached(d) = (level, ps.toVector) }
          while (level < maxLevel && frontier.nonEmpty) {
            val next = mutable.HashMap.empty[Any, mutable.LinkedHashSet[Vector[Any]]]
            frontier.foreach { case (d, ps) =>
              adj.get(d).foreach(_.foreach { d2 =>
                if (!reached.contains(d2)) ps.foreach { p =>
                  countMat(next.getOrElseUpdate(d2, mutable.LinkedHashSet.empty)
                    .add(p :+ d2))
                }
              })
            }
            level += 1
            next.foreach { case (d, ps) => reached(d) = (level, ps.toVector) }
            frontier = next
          }
          reached.iterator.flatMap { case (d, (len, ps)) =>
            ps.iterator.map(p => Row(s, d, len, p))
          }
        } else if (withPath) {
          val reached = mutable.HashMap.empty[Any, (Long, Vector[Any])]
          var frontier = mutable.HashMap.empty[Any, Vector[Any]]
          adj.get(s).foreach(_.foreach { d =>
            val p = Vector(s, d)
            if (frontier.get(d).forall(q => pathOrd.compare(p, q) < 0))
              frontier(d) = p
          })
          var level = 1L
          frontier.foreach { case (d, p) => reached(d) = (level, p) }
          while (level < maxLevel && frontier.nonEmpty) {
            val next = mutable.HashMap.empty[Any, Vector[Any]]
            frontier.foreach { case (d, p) =>
              adj.get(d).foreach(_.foreach { d2 =>
                if (!reached.contains(d2)) {
                  val p2 = p :+ d2
                  if (next.get(d2).forall(q => pathOrd.compare(p2, q) < 0))
                    next(d2) = p2
                }
              })
            }
            level += 1
            next.foreach { case (d, p) => reached(d) = (level, p) }
            frontier = next
          }
          reached.iterator.map { case (d, (len, p)) => Row(s, d, len, p) }
        } else {
          // length-only: plain key-set BFS, no path bookkeeping at all
          val reached = mutable.HashMap.empty[Any, Long]
          var frontier = mutable.LinkedHashSet.empty[Any]
          adj.get(s).foreach(_.foreach(frontier += _))
          var level = 1L
          frontier.foreach(d => reached(d) = level)
          while (level < maxLevel && frontier.nonEmpty) {
            val next = mutable.LinkedHashSet.empty[Any]
            frontier.foreach { d =>
              adj.get(d).foreach(_.foreach { d2 =>
                if (!reached.contains(d2)) next += d2
              })
            }
            level += 1
            next.foreach(d => reached(d) = level)
            frontier = next
          }
          reached.iterator.map { case (d, len) => Row(s, d, len) }
        }
      }
    }
    val base = Seq(
      StructField("__ds", kt), StructField("__dd", kt),
      StructField("__len", LongType, nullable = false))
    val withP =
      if (withPath || keepAll) base :+ StructField("__path", ArrayType(kt))
      else base
    val schema =
      if (withRels) withP :+ StructField("__rels", ArrayType(StringType))
      else withP
    spark.createDataFrame(rows, StructType(schema))
  }

  private[cypher] def keyComparator(dt: DataType): Option[(Any, Any) => Int] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some {
      (a, b) => java.lang.Long.compare(
        a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
    }
    case StringType => Some { (a, b) =>
      val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      var r = 0
      val n = math.min(x.length, y.length)
      while (r == 0 && i < n) {
        r = (x(i) & 0xff) - (y(i) & 0xff)
        i += 1
      }
      if (r != 0) r else x.length - y.length
    }
    // label-tagged BFS keys (`(__l, __k)` structs, [[heteroDistDf]]):
    // field-wise comparison in declaration order, nulls first — lets the
    // tiny-graph single-task BFS serve heterogeneous walks too (r14,
    // r13 verdict directive #3)
    case st: StructType =>
      val subs = st.fields.map(f => keyComparator(f.dataType))
      if (subs.exists(_.isEmpty)) None
      else {
        val cs = subs.map(_.get)
        Some { (a, b) =>
          val ra = a.asInstanceOf[Row]
          val rb = b.asInstanceOf[Row]
          var i = 0
          var r = 0
          while (r == 0 && i < cs.length) {
            val (x, y) = (ra.get(i), rb.get(i))
            r = if (x == null && y == null) 0
                else if (x == null) -1
                else if (y == null) 1
                else cs(i)(x, y)
            i += 1
          }
          r
        }
      }
    case _ => None
  }
}
