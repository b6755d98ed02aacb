package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.model.{EventRule, Threshold}

/** Config-driven error flagging: compile a list of threshold rules into one
  * Catalyst boolean expression and materialize a 0/1 `is_error` column.
  *
  * Re-expresses `finde_fehler_basierend_auf_schwellwerten`
  * (`src/daily_aggregator.py:70-116`). The "rule engine" runs entirely at
  * plan-construction time — the compiled predicate is a pure `Column`
  * expression, so execution is whole-stage-codegen'd and shuffle-free
  * (narrow transform), exactly what a 100 TB scan wants.
  */
object ErrorRules {

  /** One threshold test against a value column (`daily_aggregator.py:89-96`). */
  def thresholdCondition(value: Column, th: Threshold): Column = th match {
    case Threshold.Above(x)           => value > x
    case Threshold.Below(x)           => value < x
    case Threshold.OutsideRange(l, h) => value < l || value > h
  }

  /** Guard + threshold for one rule: row must match (parameter, event) and
    * carry a non-null value (`daily_aggregator.py:82-86`).
    */
  def ruleCondition(rule: EventRule): Column = {
    val guard = col("parameter_name") === rule.paramName &&
      col("event_name") === rule.eventName &&
      col("value").isNotNull
    guard && thresholdCondition(col("value"), rule.threshold)
  }

  /** OR-fold of all rules; `lit(false)` when the config is empty
    * (`daily_aggregator.py:104-109`).
    */
  def combinedCondition(rules: Seq[EventRule]): Column =
    rules.map(ruleCondition).reduceOption(_ || _).getOrElse(lit(false))

  /** Generic form for arbitrary tables: each rule is (guard, value, threshold). */
  def combinedConditionGeneric(rules: Seq[(Column, Column, Threshold)]): Column =
    rules
      .map { case (guard, value, th) =>
        guard && value.isNotNull && thresholdCondition(value, th) }
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Materialize `is_error` as INT 0/1 (`daily_aggregator.py:111-114`). */
  def flag(events: DataFrame, rules: Seq[EventRule]): DataFrame =
    events.withColumn(
      "is_error",
      when(combinedCondition(rules), 1).otherwise(0).cast(IntegerType))
}
