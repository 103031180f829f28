package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}

/** As-of join: for every left row, attach the single right row with the
  * greatest `rightTime <= leftTime` among rows sharing the join keys
  * (pandas `merge_asof` / kdb `aj` semantics) — the classic time-series
  * enrichment operator Spark lacks.
  *
  * Why a custom operator (SURVEY.md §4, extension path (c)): the
  * built-in composition — equi-join, filter `r.ts <= l.ts`, then
  * row_number() — materializes every (left, earlier-right) pair before
  * discarding all but one, an O(|matches|) blowup that a busy key makes
  * quadratic. This plan co-partitions both sides on the keys, sorts
  * (key, time) — both delegated to EnsureRequirements, so AQE still
  * plans the exchanges — and merges each partition in one linear pass
  * holding exactly ONE candidate row.
  *
  * zipPartitions requires both children on the same partition count;
  * EnsureRequirements guarantees it at planning time, and if an
  * adaptive re-plan ever broke the alignment the join fails loudly
  * (RDD zip precondition) rather than mis-pairing partitions.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  private def timeAsLong(v: Any): Long = v match {
    case l: java.lang.Long    => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short   => s.toLong
    case other => throw new IllegalArgumentException(
      s"asof time column must be timestamp/integral, got ${other.getClass}")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(leftKeys, left.output)
      val rKeyGen = UnsafeProjection.create(rightKeys, right.output)
      val lTimeB = BindReferences.bindReference(leftTime, left.output)
      val rTimeB = BindReferences.bindReference(rightTime, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow
      // bind against `output` (right side marked nullable) — binding to
      // the raw child attrs would elide null checks on the right columns
      // and read 0s out of the all-null no-match row.
      val project = UnsafeProjection.create(output, output)
      val rBuf = rIter.buffered

      // One candidate (copied — sorter iterators reuse row buffers):
      // the latest right row whose (key, time) fits the current left row.
      // Its time travels with it for the tolerance check — the candidate
      // stays the BEST match for later (larger) left times, but tolerance
      // is evaluated per left row against that fixed candidate time.
      var candKey: InternalRow = null
      var cand: InternalRow = null
      var candTime: Long = Long.MinValue
      val tol = tolerance.getOrElse(Long.MaxValue)

      lIter.map { l =>
        val lKey = lKeyGen(l)
        // null left time never matches (mirrors the SQL `<=` predicate,
        // where NULL comparison is false); nulls sort first, so no
        // candidate has accumulated for this key yet.
        val lTimeV = lTimeB.eval(l)
        if (candKey != null && keyOrd.compare(candKey, lKey) != 0) {
          candKey = null; cand = null
        }
        if (lTimeV == null || lKey.anyNull) {
          // SQL equality never matches NULL keys (and NULL time compares
          // false) — emit the null-extended row, consume nothing.
          project(joined(l, nullRight))
        } else {
          val lT = timeAsLong(lTimeV)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyGen(rBuf.head)
            if (rKey.anyNull) { rBuf.next() } // NULL key: unmatchable
            else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) rBuf.next() // dead key: left keys only grow
              else if (c == 0) {
                val rTimeV = rTimeB.eval(rBuf.head)
                if (rTimeV == null) rBuf.next() // unmatchable right row
                else if (timeAsLong(rTimeV) <= lT) {
                  candTime = timeAsLong(rTimeV)
                  cand = rBuf.next().copy()
                  candKey = lKey.copy()
                } else advancing = false
              } else advancing = false
            }
          }
          // tolerance: any earlier right row is further away than the
          // candidate, so "candidate too old" == "no match at all".
          val inTol = cand != null && lT - candTime <= tol
          project(joined(l, if (inTol) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API. */
object AsOf {

  /** Idempotently register the planning strategy and the filter-pushdown
    * optimizer rule in this session. (Config-driven alternative:
    * `spark.sql.extensions=graft.GraftExtensions`.)
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfFilterPushdown
  }

  /** `left` as-of-joined with `right`: per left row, the latest right
    * row with `rightTime <= leftTime` matching on `keys` (right columns
    * null when no such row). `tolerance` (same units as the raw time
    * values — microseconds for timestamps read via unix_micros) caps
    * how stale the match may be: rows where `leftTime - rightTime >
    * tolerance` get no match (pandas merge_asof `tolerance` semantics).
    * Column arguments must come from the respective input frames
    * (`df("col")`), so they resolve before the plan is built.
    */
  def join(left: DataFrame, right: DataFrame, leftKeys: Seq[Column],
           rightKeys: Seq[Column], leftTime: Column, rightTime: Column,
           tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "asof join needs matching non-empty key lists")
    val spark = left.sparkSession
    install(spark)
    val lPlan = DatasetBridge.plan(left)
    val rPlan = DatasetBridge.plan(right)
    // Unlike Dataset.join, this plan does not rewrite the right side's
    // attribute ids; a self-join would bind right columns to left
    // ordinals and silently emit wrong data. Refuse it instead.
    val overlap = lPlan.outputSet.intersect(rPlan.outputSet)
    require(overlap.isEmpty,
      s"asof join sides share attributes (${overlap.mkString(", ")}); " +
        "re-alias one side (df.select(cols.map(c => col(c).as(c + \"_r\")))) first")
    require(tolerance.forall(_ >= 0), "asof tolerance must be non-negative")
    val plan = AsOfJoin(
      lPlan, rPlan,
      leftKeys.map(ColumnBridge.expression),
      rightKeys.map(ColumnBridge.expression),
      ColumnBridge.expression(leftTime),
      ColumnBridge.expression(rightTime),
      tolerance)
    DatasetBridge.ofRows(spark, plan)
  }
}
