package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Descending, ExprId, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** As-of join as a first-class Catalyst operator — the full §7.3(c)
  * stack (logical node → strategy → physical plan) for the one
  * primitive Spark genuinely lacks (SPARK-22947): "for each left row,
  * the latest right row at or before its timestamp, per key".
  *
  * Physical shape: both sides hash-partition on their keys and sort by
  * (key, ts) — declared via `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements plans the exchanges
  * and sorts and AQE sizes them — then ONE forward-only merge pass per
  * co-partition. Memory is O(1) per partition (one candidate row),
  * versus the union+window composition in [[graft.operators.AsOfJoin]]
  * which buffers a window frame and materializes the unioned schema.
  * Both produce identical results (spec-asserted); the composition
  * stays as the no-custom-code variant.
  *
  * Tie/null semantics follow the composed variant (which the DuckDB
  * ASOF oracle also matches on non-null data): right rows at ts equal
  * to the left's match (`<=`); ties within right on (key, ts) resolve
  * to the max value (right is additionally sorted by value, and the
  * merge keeps the last candidate seen); null keys group together as
  * in window partitioning; null timestamps sort first.
  */
object AsOfJoinPlan {

  /** Same contract as [[graft.operators.AsOfJoin.asOf]]: `left`'s
    * columns plus `matched_<rightValueCol>`, executed by
    * [[AsOfJoinExec]]. Right side is pruned to (key, ts, value) before
    * the exchange — column pruning an opaque custom node would
    * otherwise lose.
    *
    * `forward = true` flips the direction: the EARLIEST right row at or
    * after the left timestamp (pandas merge_asof direction='forward');
    * (key, ts) ties still resolve to the max value in both directions.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, rightValueCol: String,
      forward: Boolean = false): DataFrame =
    asOfMultiKey(left, right, Seq(keyCol), tsCol, rightValueCol, forward)

  /** Composite-key as-of: equality on every column of `keyCols`, then
    * the temporal match on `tsCol` — e.g. (user, event_type). The exec
    * hashes and orders on all key columns; the merge's key comparison
    * is one generated ordering over the composite.
    */
  def asOfMultiKey(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String, rightValueCol: String,
      forward: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "as-of needs at least one key column")
    val spark = left.sparkSession
    PlanBridge.addStrategy(spark, AsOfJoinStrategy)
    val lPlan = PlanBridge.analyzed(left)
    // fresh exprIds on the right so self-joins (left and right carved
    // from the same source) don't alias each other's attributes
    val rAnalyzed = PlanBridge.analyzed(right.select(
      (keyCols :+ tsCol :+ rightValueCol)
        .map(org.apache.spark.sql.functions.col): _*))
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)

    def attrOf(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    def rAttrOf(name: String): Attribute =
      rPlan.projectList.find(_.name == name).get.toAttribute

    val rv = rAttrOf(rightValueCol)
    // the merge compares left-projected and right-projected rows with
    // ONE generated ordering per schema — mismatched types would make
    // it misread row bytes, so fail loudly here instead
    (keyCols :+ tsCol).foreach { c =>
      require(attrOf(lPlan, c).dataType == rAttrOf(c).dataType,
        s"as-of column type mismatch: left $c is " +
          s"${attrOf(lPlan, c).dataType}, right is ${rAttrOf(c).dataType}")
    }
    val node = AsOfJoinNode(
      leftKeys = keyCols.map(attrOf(lPlan, _)),
      rightKeys = keyCols.map(rAttrOf),
      leftTs = attrOf(lPlan, tsCol),
      rightTs = rAttrOf(tsCol),
      rightValue = rv,
      matchedName = s"matched_$rightValueCol",
      matchedId = NamedExpression.newExprId,
      matchedType = rv.dataType,
      forward = forward,
      left = lPlan, right = rPlan)
    PlanBridge.ofRows(spark, node)
  }
}

/** Logical as-of join. The matched-value output attribute is stored as
  * (name, exprId, type) — NOT as an `Expression` field — so the default
  * `expressions`/`references` traversal doesn't see it as an input and
  * fail the missing-attribute analysis check; `producedAttributes`
  * declares it as born here.
  */
case class AsOfJoinNode(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightValue: Expression,
    matchedName: String, matchedId: ExprId, matchedType: DataType,
    forward: Boolean,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {

  private def matchedAttr: AttributeReference =
    AttributeReference(matchedName, matchedType, nullable = true)(
      exprId = matchedId)

  override def output: Seq[Attribute] = left.output :+ matchedAttr

  override def producedAttributes: AttributeSet = AttributeSet(matchedAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]. Registered per-session
  * via `experimental.extraStrategies` (PlanBridge.addStrategy).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, rk, lt, rt, rv, mName, mId, mType, fwd, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, rv, mName, mId, mType, fwd,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned, co-sorted single-pass merge as-of join.
  *
  * Spark provides the heavy machinery from the declarations alone:
  * `requiredChildDistribution` (hash exchanges on the join keys, AQE
  * re-sizable), `requiredChildOrdering` (per-partition sorts by key,
  * ts — and value on the right, so overwrite-last = max-value tie
  * resolution). `doExecute` is then a forward-only zip of the two
  * sorted streams holding exactly one candidate row — no window
  * buffer, no unioned schema, no backtracking.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightValue: Expression,
    matchedName: String, matchedId: ExprId, matchedType: DataType,
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  private def matchedAttr: AttributeReference =
    AttributeReference(matchedName, matchedType, nullable = true)(
      exprId = matchedId)

  override def output: Seq[Attribute] = left.output :+ matchedAttr

  override def producedAttributes: AttributeSet = AttributeSet(matchedAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    // requireAllClusterKeys: a child only "satisfies" with a hash on
    // EXACTLY these keys in order — a pre-existing partitioning on a
    // subset would zip mis-aligned partitions against the other side
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    // value ordering makes (key, ts) ties deterministic at max value:
    // backward keeps the LAST candidate seen (so value ascending),
    // forward takes the FIRST row at the match position (so descending)
    rightKeys.map(SortOrder(_, Ascending)) ++ Seq(
      SortOrder(rightTs, Ascending),
      SortOrder(rightValue, if (forward) Descending else Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTs; val rt = rightTs; val rv = rightValue
    val keyFields = StructType(
      lk.map(e => StructField("k", e.dataType, nullable = true)))
    val tsFields = StructType(
      Seq(StructField("t", lt.dataType, nullable = true)))
    val outAttrs = output
    val numOutput = longMetric("numOutputRows")
    val numMatched = longMetric("numMatchedRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rt), rOut)
      val rValProj = UnsafeProjection.create(Seq(rv), rOut)
      val keyOrd = GenerateOrdering.create(keyFields)
      val tsOrd = GenerateOrdering.create(tsFields)
      // identity projection over (left row ++ 1-col value row)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullValue = new GenericInternalRow(1)

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null

      if (!forward) {
        // backward ("at or before"): consume right rows up to the left
        // ts, remembering the last same-key row seen as the candidate
        var candKey: InternalRow = null // copied key of the candidate
        var candVal: InternalRow = null // copied 1-col value row
        lIter.map { l =>
          val lKey = lKeyProj(l)
          var scanning = rRow != null
          while (scanning) {
            val c = keyOrd.compare(rKeyProj(rRow), lKey)
            if (c < 0 || (c == 0 && tsOrd.compare(rTsProj(rRow), lTsProj(l)) <= 0)) {
              if (c == 0) {
                candKey = rKeyProj(rRow).copy()
                candVal = rValProj(rRow).copy()
              }
              rRow = if (rIter.hasNext) rIter.next() else null
              scanning = rRow != null
            } else scanning = false
          }
          val matched =
            candKey != null && keyOrd.compare(candKey, lKeyProj(l)) == 0
          numOutput += 1
          if (matched) numMatched += 1
          outProj(joined(l, if (matched) candVal else nullValue))
        }
      } else {
        // forward ("at or after"): skip right rows strictly before the
        // left ts; the right HEAD then is the match (not consumed — it
        // may serve several left rows), no candidate state at all
        lIter.map { l =>
          val lKey = lKeyProj(l)
          var scanning = rRow != null
          while (scanning) {
            val c = keyOrd.compare(rKeyProj(rRow), lKey)
            if (c < 0 || (c == 0 && tsOrd.compare(rTsProj(rRow), lTsProj(l)) < 0)) {
              rRow = if (rIter.hasNext) rIter.next() else null
              scanning = rRow != null
            } else scanning = false
          }
          val matched =
            rRow != null && keyOrd.compare(rKeyProj(rRow), lKey) == 0
          numOutput += 1
          if (matched) numMatched += 1
          outProj(joined(l, if (matched) rValProj(rRow) else nullValue))
        }
      }
    }
  }
}
