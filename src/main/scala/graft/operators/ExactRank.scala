package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global rank selection WITHOUT a global sort — the machinery
  * that lets percentile-bucket operators (CCNet-style perplexity
  * terciles, NTILE scorecard signals) stay bit-identical to their
  * `NTILE(k) OVER (ORDER BY value, id)` oracle while never funnelling
  * the corpus through a single-task window.
  *
  * The selection problem: given a frame totally ordered by
  * (value, id), find the exact (value, id) pair at 1-based global rank
  * r. The classic distributed answer is a range-partitioned sort
  * (still a full shuffle + sort of every row); this one is the
  * sketch-bracket-and-refine scheme instead:
  *
  *   1. bracket: one `percentile_approx` (Greenwald–Khanna, mergeable,
  *      rank error ≤ n/accuracy) brackets the target rank between two
  *      ACTUAL data values [vLo, vHi] — GK returns observed elements,
  *      so the bracket is type-exact for longs and doubles alike;
  *   2. verify: one aggregate computes the EXACT boundary counts
  *      (#rows < vLo, ≤ vLo, < vHi, ≤ vHi). If the target rank lands
  *      on a boundary value, that value is the exact answer (GK only
  *      ever proposed it; the exact counts confirmed it). The sketch
  *      guarantee is thereby checked, never trusted;
  *   3. shrink: otherwise the answer lies strictly inside (vLo, vHi) —
  *      an interval that, by the verified rank error, holds
  *      O(n/accuracy) rows. Recurse on the filtered frame with the
  *      rank rebased by the exact below-count.
  *   4. floor: once the candidate window is ≤ max(accuracy, 1024)
  *      rows, collect just the window and index it — driver state
  *      bounded by the ACCURACY PARAMETER, not the data (the
  *      `driverMaxEdges` discipline from Clustering).
  *
  * Each round is two aggregates over a (persisted) two-column frame
  * and shrinks the window ~accuracy/6×, so 100 TB (n ≈ 1e11) resolves
  * in 3 rounds at the default accuracy. Duplicated values never stall
  * the loop: a value carrying the target rank is returned from the
  * exact boundary check, and the id tiebreak inside a duplicated value
  * runs the same selection over the (unique) ids of just that value's
  * rows.
  *
  * Determinism contract: every returned cut is an actual data element
  * confirmed by exact integer counts, so downstream bucket assignment
  * (`bucketCol`) is engine-exact — the DuckDB NTILE oracle restates it
  * verbatim. */
object ExactRank {

  /** Exact cut for one rank: the (value, tiebreakId) pair at global
    * 1-based rank `rank` of the (value, id) lexicographic order. */
  final case class Cut(rank: Long, value: Double, id: Long)

  /** NTILE(buckets) cumulative bucket-boundary ranks s_1..s_{b-1}:
    * standard SQL semantics — bucket i gets n/b rows plus one extra
    * for the first n mod b buckets. A frame's bucket is
    * 1 + #{cuts strictly before the row}. */
  def ntileCutRanks(n: Long, buckets: Int): Seq[Long] = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    if (n <= 0) Seq.empty
    else {
      val base = n / buckets
      val rem = n % buckets
      (1 until buckets).map(i => i * base + math.min(i.toLong, rem))
        .filter(_ >= 1L)
    }
  }

  /** Ordering over the runtime-typed values GK hands back (actual data
    * elements — comparisons must be type-exact, not via-double, so
    * 64-bit ids beyond 2^53 still order correctly). */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: Int, y: Int)       => java.lang.Integer.compare(x, y)
    case (x: Float, y: Float)   => java.lang.Float.compare(x, y)
    case _ => throw new IllegalArgumentException(
      s"unsupported rank-selection value types: ${a.getClass}, ${b.getClass}")
  }

  private def toDouble(a: Any): Double = a match {
    case d: Double => d
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case f: Float  => f.toDouble
  }

  private def toLong(a: Any): Long = a match {
    case l: Long => l
    case i: Int  => i.toLong
    case d: Double => d.toLong
  }

  /** SINGLE-RANK REFERENCE implementation: exact value at global
    * 1-based rank `r` of column `c`'s ascending order over `df`
    * (duplicates: the value v with count(< v) < r ≤ count(≤ v)).
    * Returns (value, exact global count of rows strictly below
    * value) — the below-count is what an id tiebreak inside a
    * duplicated value rebases on. The batched [[cutsAt]] applies
    * these EXACT decision rules to many ranks per aggregate pass;
    * this one-rank form is kept as the independently-tested oracle
    * the spec holds the batch against (and the readable statement of
    * the algorithm).
    *
    * `n` must be df.count(). Driver state: O(max(accuracy, 1024))
    * collected cells in the floor step; everything before is
    * two-aggregate rounds. */
  private[graft] def selectAt(df: DataFrame, c: String, n: Long, r: Long,
                              accuracy: Int): (Any, Long) = {
    require(r >= 1 && r <= n, s"rank $r out of [1, $n]")
    val floorSize = math.max(accuracy, 1024)
    var cur = df
    var base = 0L   // exact #rows (globally) ordered strictly before cur's window
    var curN = n
    var rounds = 0
    var stalled = false
    def cnt(cond: Column) = sum(when(cond, 1L).otherwise(0L))
    while (curN > floorSize) {
      rounds += 1
      // GK bracketing + bisection fallback both guarantee progress;
      // 256 covers a full 64-bit bisection with wide margin.
      require(rounds <= 256, "rank-selection window failed to shrink (bug)")
      val target = r - base
      val prevN = curN
      if (stalled) {
        // Bisection fallback — only reachable if the sketch bracket
        // made no progress (e.g. long values beyond 2^53, where GK's
        // internal double buffering can propose NON-observed bracket
        // values outside the window). Arithmetic midpoint + exact
        // counts always splits a window with ≥2 distinct values; a
        // 1-distinct-value window is caught by the boundary hit below.
        val mm = cur.agg(min(col(c)).as("mn"), max(col(c)).as("mx")).head
        val (mn, mx) = (mm.get(0), mm.get(1))
        val mid: Any = (mn, mx) match {
          case (a: Double, b: Double) => a / 2 + b / 2
          case (a: Long, b: Long)     => a / 2 + b / 2 + (a % 2 + b % 2) / 2
          case (a: Int, b: Int)       => (a.toLong + b.toLong) / 2
          case _                      => toDouble(mn) / 2 + toDouble(mx) / 2
        }
        val cs = cur.agg(
          cnt(col(c) < lit(mn)).as("x"), cnt(col(c) <= lit(mn)).as("le_mn"),
          cnt(col(c) <= lit(mid)).as("le_mid")).head
        val leMn = cs.getLong(1); val leMid = cs.getLong(2)
        if (target <= leMn) return (mn, base) // all-equal prefix holds the rank
        if (target <= leMid) {
          cur = cur.filter(col(c) > lit(mn) && col(c) <= lit(mid))
          base += leMn; curN = leMid - leMn
        } else {
          cur = cur.filter(col(c) > lit(mid)); base += leMid; curN -= leMid
        }
        stalled = curN == prevN
      } else {
        val e = math.max(1L, (curN + accuracy - 1) / accuracy)
        val pLo = math.max(0.0, (target - 3.0 * e) / curN)
        val pHi = math.min(1.0, (target + 3.0 * e) / curN)
        val bracket = cur.agg(percentile_approx(col(c),
          typedlit(Seq(pLo, pHi)), lit(accuracy)).as("b")).head
          .getSeq[Any](0)
        val (vLo, vHi) = (bracket(0), bracket(1))
        val counts = cur.agg(
          cnt(col(c) < lit(vLo)).as("lt_lo"), cnt(col(c) <= lit(vLo)).as("le_lo"),
          cnt(col(c) < lit(vHi)).as("lt_hi"), cnt(col(c) <= lit(vHi)).as("le_hi")).head
        val (ltLo, leLo, ltHi, leHi) =
          (counts.getLong(0), counts.getLong(1), counts.getLong(2), counts.getLong(3))
        if (ltLo < target && target <= leLo) return (vLo, base + ltLo)
        if (ltHi < target && target <= leHi) return (vHi, base + ltHi)
        if (target <= ltLo) {
          // GK undershot its guarantee (not observed; defensive): keep
          // the strictly-below-vLo window — still a strict shrink.
          cur = cur.filter(col(c) < lit(vLo)); curN = ltLo
        } else if (target > leHi) {
          cur = cur.filter(col(c) > lit(vHi)); base += leHi; curN -= leHi
        } else {
          // strictly interior: O(n/accuracy) rows by the verified counts
          cur = cur.filter(col(c) > lit(vLo) && col(c) < lit(vHi))
          base += leLo; curN = ltHi - leLo
        }
        stalled = curN == prevN
      }
    }
    // floor: window ≤ max(accuracy, 1024) rows — bounded collect
    val window = cur.select(col(c)).collect().map(_.get(0))
    scala.util.Sorting.stableSort(window, (a: Any, b: Any) => cmp(a, b) < 0)
    val v = window((r - base - 1).toInt)
    (v, base + window.count(cmp(_, v) < 0))
  }

  /** One in-flight selection problem of the batched [[cutsAt]] loop:
    * find the element at window-relative rank `target` of `colName`'s
    * ascending order over the rows matching `pred` (None = whole
    * frame). Windows are always value-COMPLETE intervals (every shrink
    * filters on value comparisons), so a value's full duplicate mass
    * is inside whichever window proposes it. `phase` 1 selects the cut
    * VALUE; its resolution spawns a phase-2 task selecting the
    * tiebreak ID among the rows tied at that value. */
  private final case class Task(rank: Long, colName: String,
                                pred: Option[Column], target: Long,
                                count: Long, stalled: Boolean, phase: Int)

  /** Exact cuts at the given ascending 1-based global ranks of the
    * (valueCol, idCol) lexicographic total order. `valueCol` is a
    * double (duplicates fine), `idCol` an integral per-row tiebreak
    * (unique; also what makes the order total). `df` should be
    * persisted by the caller.
    *
    * ALL ranks are selected together: each round runs ONE bracket
    * aggregate (a `percentile_approx` per live rank, conditional on
    * its window predicate) and ONE exact boundary-count aggregate for
    * every live rank — so the job count is ~2 per ROUND, not per rank,
    * and the duplicated-value tiebreak costs no dedicated counting
    * pass (the tied-row count falls out of the boundary counts that
    * resolved the value: #tied = #{≤ v} − #{< v}). Floored windows
    * collect once per DISTINCT window (the k phase-1 tasks share the
    * whole-frame window — one collect serves them all). Decision rules
    * are identical to [[selectAt]], so the returned cuts are
    * bit-identical to the one-rank-at-a-time path. Driver state:
    * O(max(accuracy, 1024)) per distinct floored window. */
  def cutsAt(df: DataFrame, valueCol: String, idCol: String,
             ranks: Seq[Long], accuracy: Int = 10000,
             nKnown: Option[Long] = None): Seq[Cut] = {
    if (ranks.isEmpty) return Seq.empty
    // callers that already counted the (persisted) frame pass n in —
    // one fewer full pass over it
    val n = nKnown.getOrElse(df.count())
    val floorSize = math.max(accuracy, 1024)
    def cnt(cond: Column) = sum(when(cond, 1L).otherwise(0L))
    def windowed(t: Task): Column =
      t.pred.map(p => when(p, col(t.colName))).getOrElse(col(t.colName))
    def and(pred: Option[Column], c: Column): Option[Column] =
      Some(pred.map(_ && c).getOrElse(c))

    val values = scala.collection.mutable.Map.empty[Long, Any] // rank -> cut value
    val ids = scala.collection.mutable.Map.empty[Long, Any]    // rank -> tiebreak id
    // phase-1 resolution: record the value and enqueue the id tiebreak
    // (ltEq/leEq are the resolving boundary's window-relative counts,
    // so the tied-row count and rebased target are free)
    def resolveValue(t: Task, v: Any, ltV: Long, leV: Long): Option[Task] =
      if (t.phase == 1) {
        values(t.rank) = v
        val tiedPred = and(None, col(valueCol) === lit(v))
        Some(Task(t.rank, idCol, tiedPred, t.target - ltV, leV - ltV,
          stalled = false, phase = 2))
      } else { ids(t.rank) = v; None }

    var tasks: List[Task] = ranks.toList.map { r =>
      require(r >= 1 && r <= n, s"rank $r out of [1, $n]")
      Task(r, valueCol, None, r, n, stalled = false, phase = 1)
    }
    var rounds = 0
    while (tasks.nonEmpty) {
      rounds += 1
      // GK bracketing + bisection fallback both guarantee progress per
      // task; 256 covers a full 64-bit bisection with wide margin.
      require(rounds <= 512, "rank-selection window failed to shrink (bug)")
      val (floored, active) = tasks.partition(_.count <= floorSize)
      var next: List[Task] = Nil
      // floor: collect once per DISTINCT window (≤ floorSize rows each)
      val windowCache = scala.collection.mutable.Map.empty[String, Array[Any]]
      floored.foreach { t =>
        val key = t.colName + "§" + t.pred.map(_.toString).getOrElse("")
        val w = windowCache.getOrElseUpdate(key, {
          val arr = t.pred.map(df.filter(_)).getOrElse(df)
            .select(col(t.colName)).collect().map(_.get(0))
          scala.util.Sorting.stableSort(arr, (a: Any, b: Any) => cmp(a, b) < 0)
          arr
        })
        val v = w((t.target - 1).toInt)
        val ltV = w.count(cmp(_, v) < 0).toLong
        val leV = w.count(cmp(_, v) <= 0).toLong
        resolveValue(t, v, ltV, leV).foreach(next ::= _)
      }
      if (active.nonEmpty) {
        // pass 1 — ONE aggregate: a GK bracket per running task, a
        // min/max pair per stalled task (bisection fallback: only
        // reachable if the sketch bracket made no progress, e.g. long
        // values beyond 2^53 where GK's double buffering can propose
        // non-observed brackets outside the window)
        val bracketExprs = active.flatMap { t =>
          if (t.stalled)
            Seq(min(windowed(t)), max(windowed(t)))
          else {
            val e = math.max(1L, (t.count + accuracy - 1) / accuracy)
            val pLo = math.max(0.0, (t.target - 3.0 * e) / t.count)
            val pHi = math.min(1.0, (t.target + 3.0 * e) / t.count)
            Seq(percentile_approx(windowed(t), typedlit(Seq(pLo, pHi)),
              lit(accuracy)))
          }
        }
        val row1 = df.agg(bracketExprs.head, bracketExprs.tail: _*).head
        // per task: the bracket/bisection probe values, in row1 order
        var slot = 0
        val probes: Seq[(Task, Any, Any)] = active.map { t =>
          if (t.stalled) {
            val (mn, mx) = (row1.get(slot), row1.get(slot + 1)); slot += 2
            val mid: Any = (mn, mx) match {
              case (a: Double, b: Double) => a / 2 + b / 2
              case (a: Long, b: Long)     => a / 2 + b / 2 + (a % 2 + b % 2) / 2
              case (a: Int, b: Int)       => (a.toLong + b.toLong) / 2
              case _                      => toDouble(mn) / 2 + toDouble(mx) / 2
            }
            (t, mn, mid)
          } else {
            val b = row1.getSeq[Any](slot); slot += 1
            (t, b(0), b(1))
          }
        }
        // pass 2 — ONE aggregate: exact boundary counts for every task
        val countExprs = probes.flatMap { case (t, a, b) =>
          def c(cond: Column) = cnt(t.pred.map(_ && cond).getOrElse(cond))
          if (t.stalled)
            Seq(c(col(t.colName) <= lit(a)), c(col(t.colName) <= lit(b)))
          else
            Seq(c(col(t.colName) < lit(a)), c(col(t.colName) <= lit(a)),
              c(col(t.colName) < lit(b)), c(col(t.colName) <= lit(b)))
        }
        val row2 = df.agg(countExprs.head, countExprs.tail: _*).head
        slot = 0
        probes.foreach { case (t, a, b) =>
          if (t.stalled) {
            val (mn, mid) = (a, b)
            val leMn = row2.getLong(slot); val leMid = row2.getLong(slot + 1)
            slot += 2
            if (t.target <= leMn) {
              // all-equal prefix holds the rank (mn is the window min,
              // so its below-count inside the window is 0)
              resolveValue(t, mn, 0L, leMn).foreach(next ::= _)
            } else if (t.target <= leMid) {
              next ::= t.copy(
                pred = and(t.pred, col(t.colName) > lit(mn) && col(t.colName) <= lit(mid)),
                target = t.target - leMn, count = leMid - leMn,
                stalled = leMid - leMn == t.count)
            } else {
              next ::= t.copy(
                pred = and(t.pred, col(t.colName) > lit(mid)),
                target = t.target - leMid, count = t.count - leMid,
                stalled = t.count - leMid == t.count)
            }
          } else {
            val (vLo, vHi) = (a, b)
            val ltLo = row2.getLong(slot); val leLo = row2.getLong(slot + 1)
            val ltHi = row2.getLong(slot + 2); val leHi = row2.getLong(slot + 3)
            slot += 4
            if (ltLo < t.target && t.target <= leLo)
              resolveValue(t, vLo, ltLo, leLo).foreach(next ::= _)
            else if (ltHi < t.target && t.target <= leHi)
              resolveValue(t, vHi, ltHi, leHi).foreach(next ::= _)
            else if (t.target <= ltLo)
              // GK undershot its guarantee (not observed; defensive):
              // keep the strictly-below-vLo window — still a strict shrink
              next ::= t.copy(pred = and(t.pred, col(t.colName) < lit(vLo)),
                count = ltLo, stalled = ltLo == t.count)
            else if (t.target > leHi)
              next ::= t.copy(pred = and(t.pred, col(t.colName) > lit(vHi)),
                target = t.target - leHi, count = t.count - leHi,
                stalled = t.count - leHi == t.count)
            else
              // strictly interior: O(n/accuracy) rows by the verified counts
              next ::= t.copy(
                pred = and(t.pred, col(t.colName) > lit(vLo) && col(t.colName) < lit(vHi)),
                target = t.target - leLo, count = ltHi - leLo,
                stalled = ltHi - leLo == t.count)
          }
        }
      }
      tasks = next
    }
    ranks.map(r => Cut(r, toDouble(values(r)), toLong(ids(r))))
  }

  /** Bucket assignment from exact cuts: 1 + #{cuts ordered strictly
    * before (value, id)} — identical to
    * NTILE(cuts.size + 1) OVER (ORDER BY value, id). A narrow,
    * codegen-friendly when-chain over broadcast literals: no join, no
    * shuffle, no window. */
  def bucketCol(value: Column, id: Column, cuts: Seq[Cut]): Column = {
    val sorted = cuts.sortBy(_.rank)
    sorted.zipWithIndex.foldRight(lit(sorted.size + 1L)) {
      case ((cut, i), elseCol) =>
        when(value < lit(cut.value) ||
          (value === lit(cut.value) && id <= lit(cut.id)), lit(i + 1L))
          .otherwise(elseCol)
    }
  }
}
