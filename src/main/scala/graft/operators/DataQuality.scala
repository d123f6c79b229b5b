package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the expectation layer (deequ /
  * dbt-test shape) an ingestion pipeline runs between silver write
  * and publish: every check is a pure DataFrame expression returning
  * a one-row census (check name, n_checked, n_violations), so a
  * whole suite unions into one result frame and a gate is just
  * `sum(n_violations) == 0`. Nothing collects: at 100 TB each check
  * is one scan-side aggregation (FK orphans: one anti-join against
  * the parent keys, broadcastable when the parent is a dimension).
  */
object DataQuality {

  private def census(name: String, checked: Column,
      violations: Column, df: DataFrame): DataFrame =
    df.agg(checked.as("n_checked"), violations.as("n_violations"))
      .select(lit(name).as("check"), col("n_checked"),
        col("n_violations"))

  /** Rows whose key occurs more than once (composite keys allowed).
    * n_violations counts the EXCESS rows — 0 means the key is unique.
    */
  def uniqueKey(df: DataFrame, keyCols: Seq[String],
      name: String = "unique_key"): DataFrame =
    census(name, sum(col("n")).cast("long"),
      sum(col("n") - 1).cast("long"),
      df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n")))

  /** Child rows whose FK value has no parent row (null FKs are NOT
    * orphans — model optional references explicitly). */
  def fkOrphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String = "fk_orphans"): DataFrame = {
    val joined = child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as("__pk")).distinct(),
        col(childKey) === col("__pk"), "left")
    census(name, count(lit(1)).cast("long"),
      sum(when(col("__pk").isNull, 1L).otherwise(0L)).cast("long"),
      joined)
  }

  /** Null-fraction check on one column. */
  def nonNull(df: DataFrame, c: String,
      name: String = "non_null"): DataFrame =
    census(name, count(lit(1)).cast("long"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long"), df)

  /** Closed-interval range check (violations = outside [lo, hi];
    * nulls don't count — pair with nonNull). */
  def inRange(df: DataFrame, c: String, lo: Column, hi: Column,
      name: String = "in_range"): DataFrame =
    census(name, count(lit(1)).cast("long"),
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
        .otherwise(0L)).cast("long"), df)

  /** Membership check against an allowed-value set. */
  def inSet(df: DataFrame, c: String, allowed: Seq[String],
      name: String = "in_set"): DataFrame =
    census(name, count(lit(1)).cast("long"),
      sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L)
        .otherwise(0L)).cast("long"), df)

  /** Run a suite: union the checks into one census frame. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionAll _)
}
