package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `glob()` as a file-listing RELATION — the reference exposes the glob
  * matcher itself as a table function returning one row per matched file
  * (reference: src/function/table/glob.cpp), distinct from glob-driven
  * *reads* (which Sources covers via pathGlobFilter).
  *
  * Listing runs driver-side through the Hadoop FileSystem API — O(files)
  * METADATA, the same division of labor as the planner's own file
  * enumeration and Delta's log replay; the rows produced are catalog
  * facts, not data. On a cluster the Hadoop FS abstraction makes the
  * same call work against HDFS/S3 listings.
  */
object GlobList {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mtime", TimestampType, nullable = false)))

  /** One row per file matching the glob pattern: absolute path, size in
    * bytes, modification time. Directories are excluded (the reference's
    * glob emits matched paths; size/mtime are the binaryFile-source
    * metadata columns a pipeline actually joins on).
    */
  def files(spark: SparkSession, pattern: String): DataFrame = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val rows = statuses.toIndexedSeq.filter(_.isFile).map { st =>
      Row(st.getPath.toUri.getPath, st.getLen,
        new java.sql.Timestamp(st.getModificationTime))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
