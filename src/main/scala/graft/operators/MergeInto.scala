package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO / upsert semantics over immutable DataFrames — SURVEY.md
  * §2.1 maps the reference's INSERT ... ON CONFLICT
  * (/root/reference/src/execution/operator/persistent/physical_insert.cpp)
  * to Delta MERGE when a transactional table format is available; this is
  * the format-agnostic DataFrame equivalent producing the post-merge
  * snapshot, to be written back atomically by the caller.
  *
  * One shuffle on the merge key (full outer join); at scale the join
  * inherits AQE skew handling and can be bucketed on the key to avoid
  * re-shuffling the base table on every merge.
  */
object MergeInto {

  /** WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *:
    * rows from `updates` win on key collision; unmatched base rows pass
    * through; unmatched update rows are inserted.
    *
    * A matched update row wins for EVERY column, including NULLs — an
    * update can null out a field, per UPDATE SET * semantics. The match is
    * detected via a non-null marker column on the updates side (a plain
    * `coalesce` would silently keep the base value whenever an update
    * carries NULL).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = base.columns.filterNot(keys.contains)
    val b = dataCols.foldLeft(base) { (df, c) => df.withColumnRenamed(c, s"_b_$c") }
    val u = dataCols.foldLeft(updates) { (df, c) => df.withColumnRenamed(c, s"_u_$c") }
      .withColumn("_u_matched", lit(true))
    b.join(u, keys, "full_outer")
      .select(keys.map(col) ++
        dataCols.map(c =>
          when(col("_u_matched").isNotNull, col(s"_u_$c"))
            .otherwise(col(s"_b_$c")).as(c)): _*)
  }

  /** WHEN MATCHED THEN DELETE: anti-join the delete-set keys. */
  def delete(base: DataFrame, deletes: DataFrame, keys: Seq[String]): DataFrame =
    base.join(deletes.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
