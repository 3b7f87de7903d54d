package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 routes Column
  * through ColumnNode; this is the supported classic-mode conversion,
  * just access-restricted — so we expose it from inside the package.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame whose logical plan IS the cached `InMemoryRelation` of
    * `df` (which must already be cached + materialized). Returning this
    * from the warm-table layer means duplicate uses of one cached table
    * inside a single query are deduplicated during ANALYSIS — where the
    * plan-normalization repair rule can fix the stale `outputOrdering`
    * `InMemoryRelation.newInstance()` leaves behind — instead of during
    * cache substitution, which has no extension point before the
    * optimizer canonicalizes (and crashes on) the broken relation.
    */
  def cachedRelationDf(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.sql.DataFrame] = {
    val classicDf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classicDf.sparkSession
    spark.sharedState.cacheManager.lookupCachedData(classicDf)
      .map(cd => org.apache.spark.sql.classic.Dataset.ofRows(spark, cd.cachedRepresentation))
  }
}
