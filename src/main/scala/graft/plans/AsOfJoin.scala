package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.{ColumnBridgeImpl => Bridge}

/** Native as-of join (SURVEY §2B "as-of (nearest ts)" — the one join type
  * Spark lacks): for every left row, attach the single right row with the
  * same key and the greatest right-time <= left-time (left outer
  * semantics).
  *
  * Implemented the preferred custom-operator way (guide order (c)):
  * logical node → planner Strategy → physical BinaryExecNode. The
  * physical operator declares ClusteredDistribution on the key and
  * (key, time) child orderings, so Catalyst provides the exchanges and
  * sorts (reusing any existing partitioning/bucketing!) and the execute()
  * body is a pure streaming merge: O(n) per partition, O(1) state — the
  * shape that scales to 100 TB of events. Contrast with the composed form
  * (q18: range join + row_number + filter) which materializes every
  * (left, candidate-right) pair before discarding all but one.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Option[Expression] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

object AsOfStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Option[Expression] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Catalyst inserts the shuffles/sorts (or reuses existing ones — e.g.
  // bucketed layouts) to satisfy these. The optional tiebreak joins the
  // right ordering so "last consumed wins" is deterministic among
  // equal-(key, time) right rows (= max tiebreak, matching the composed
  // q18 form's p_id desc pick).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +: rightTiebreak.map(SortOrder(_, Ascending)).toSeq))
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeEval = BindReferences.bindReference(leftTime, left.output)
      val rTimeEval = BindReferences.bindReference(rightTime, right.output)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeyTypes)
      val nullRight = new GenericInternalRow(right.output.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)

      val rBuf = rIter.buffered
      // last right row (copied) whose (key, time) has been consumed, per
      // the current merge position
      var matchKey: UnsafeRow = null
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRaw = lTimeEval.eval(lRow)
        // SQL equi-join semantics: NULL keys never match (NULL = NULL is
        // not true) — same for a null left time (p_ts <= NULL is false).
        // Null-keyed rows sort first, so skipping without advancing keeps
        // the pointer monotone (null-keyed RIGHT rows are consumed later
        // by the c < 0 branch once left reaches non-null keys).
        if (lKey.anyNull || lTimeRaw == null) {
          // still drain right rows behind this key so the pointer stays
          // monotone for subsequent left rows
          var advancing = true
          while (advancing && rBuf.hasNext) {
            if (keyOrd.compare(rKeyProj(rBuf.head), lKey) < 0) rBuf.next()
            else advancing = false
          }
          resultProj(joined(lRow, nullRight))
        } else {
          val lTime = lTimeRaw.asInstanceOf[Long]
          // advance the right pointer while it is behind (key, time)-wise
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rKey = rKeyProj(rRow)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) { rBuf.next(); advancing = true }
            else if (c == 0) {
              val rTimeRaw = rTimeEval.eval(rRow)
              // null right times never match (sorted first by the
              // required ordering) — consume without recording
              if (rTimeRaw == null) { rBuf.next() }
              else if (rTimeRaw.asInstanceOf[Long] <= lTime) {
                matchKey = rKey.copy()
                matchRow = rRow.copy()
                rBuf.next()
              } else advancing = false
            } else advancing = false
          }
          val hit = matchRow != null && matchKey != null && keyOrd.compare(matchKey, lKey) == 0
          resultProj(joined(lRow, if (hit) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** User-facing API + extension registration. */
object AsOfJoin {

  /** left-outer as-of join: one output row per left row. Key/time columns
    * are resolved against the respective inputs; right time must be <=
    * left time, latest wins. Time columns must be timestamp/long-backed. */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      onLeft: String, onRight: String,
      leftTimeCol: String, rightTimeCol: String,
      rightTiebreakCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = leftDf.sparkSession
    ensureRegistered(spark)
    val leftPlan = Bridge.plan(leftDf)
    var rightPlan = Bridge.plan(rightDf)
    var rightKey = Bridge.expression(rightDf(onRight))
    var rightTime = Bridge.expression(rightDf(rightTimeCol))
    var rightTb = rightTiebreakCol.map(c => Bridge.expression(rightDf(c)))
    // Self-join safety: if any right attribute shares an exprId with the
    // left side (e.g. both sides derive from one DataFrame), re-alias the
    // whole right output with fresh exprIds — otherwise the concatenated
    // output contains duplicate ids and downstream binding silently
    // resolves right columns to left ordinals (Dataset.join does the same
    // dedup in its analysis; a custom plan must do it itself).
    val leftIds = leftPlan.outputSet
    if (rightPlan.output.exists(leftIds.contains)) {
      val aliases = rightPlan.output.map(a => Alias(a, a.name)())
      val remap = rightPlan.output.zip(aliases.map(_.toAttribute))
        .map { case (old, fresh) => old.exprId -> fresh }.toMap
      rightPlan = Project(aliases, rightPlan)
      rightKey = rightKey.transform {
        case a: AttributeReference if remap.contains(a.exprId) => remap(a.exprId)
      }
      rightTime = rightTime.transform {
        case a: AttributeReference if remap.contains(a.exprId) => remap(a.exprId)
      }
      rightTb = rightTb.map(_.transform {
        case a: AttributeReference if remap.contains(a.exprId) => remap(a.exprId)
      })
    }
    val plan = AsOfJoinPlan(
      leftPlan, rightPlan,
      Seq(Bridge.expression(leftDf(onLeft))), Seq(rightKey),
      Bridge.expression(leftDf(leftTimeCol)), rightTime, rightTb)
    Bridge.ofRows(spark, plan)
  }

  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
}

/** SparkSessionExtensions entry point (spark.sql.extensions=
  * graft.plans.GraftExtensions; GraftSession wires it by default):
  * planner strategy for the native as-of join + the Jaccard-kernel
  * optimizer rewrite. */
final class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfStrategy)
    e.injectOptimizerRule(_ => JaccardRewrite)
    GraftExtensions.sqlFunctions.foreach(e.injectFunction)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.catalyst._

  private def fn(name: String, usage: String, builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.catalyst", name, usage),
      builder)

  /** The native expressions, exposed to SQL ("Functions, not UDFs" all
    * the way down: spark.sql("SELECT rolling_hash(text) ...") plans the
    * same codegen'd expression the Column API uses). */
  val sqlFunctions: Seq[(FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    fn("rolling_hash", "polynomial fingerprint of a string", es => RollingHash(es.head)),
    fn("sim_hash", "64-bit simhash of whitespace tokens", es => SimHash(es.head)),
    fn("float_vec_dot", "double dot product of two float arrays",
      es => FloatVecDot(es(0), es(1))),
    fn("jaccard_sim", "jaccard similarity of two distinct-element long arrays",
      es => JaccardSim(es(0), es(1))),
    fn("shingle_hashes", "distinct hashed 3-gram token shingles",
      es => ShingleHashes(es.head, 3)),
    fn("minhash_sig", "k-minima minhash signature of hashed shingles",
      es => {
        require(es.length == 2 && es(1).foldable,
          "minhash_sig(arr, k): k must be an integer literal")
        val k = es(1).eval() match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.intValue()
          case other => throw new IllegalArgumentException(
            s"minhash_sig(arr, k): k must be an integer literal, got $other")
        }
        MinHashSig(es(0), k)
      }))
}
