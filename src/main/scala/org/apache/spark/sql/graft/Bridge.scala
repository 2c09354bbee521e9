package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.classic.{ExpressionUtils, Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame}

/** Column ⇄ Expression conversions. Spark 4 made these `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft exposes them
  * from a subpackage of `org.apache.spark.sql` — the standard extension
  * point for libraries that add native Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A file listing pinned at construction: `refresh()` is a no-op, so
    * `spark.catalog.refreshTable` from a concurrent writer (which calls
    * `FileIndex.refresh()` IN PLACE on relations resolved through views
    * and the relation cache) cannot change what a plan holding this
    * index reads. Partition filters MUST still be honored: Catalyst
    * removes partition-column predicates from the row-level filters and
    * relies on the index to prune — an index that ignores them silently
    * un-filters the query (a partitioned DELETE's `NOT(day='d1')` would
    * delete nothing). Evaluation binds by name against partitionSchema,
    * the same contract as Spark's PartitioningAwareFileIndex.
    */
  private final class FrozenFileIndex(
      files: Seq[PartitionDirectory],
      roots: Seq[Path],
      partSchema: StructType,
      size: Long) extends FileIndex {
    override def rootPaths: Seq[Path] = roots
    override def listFiles(
        partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      if (partitionFilters.isEmpty || partSchema.isEmpty) files
      else {
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val i = partSchema.indexWhere(_.name == a.name)
              BoundReference(i, partSchema(i).dataType, nullable = true)
          })
        files.filter(p => bound.eval(p.values))
      }
    }
    override val inputFiles: Array[String] =
      files.flatMap(_.files.map(_.getPath.toString)).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = size
    override def partitionSchema: StructType = partSchema
  }

  /** Rebuild `df` with every file-source relation's listing re-listed NOW
    * and frozen (see FrozenFileIndex). The caller serializes this against
    * writers; afterwards `df.inputFiles` is exactly — and permanently —
    * the set of files the plan will scan, immune to in-place index
    * refreshes from concurrent appends.
    */
  def freezeFileIndexes(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[CSparkSession]
    val frozen = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        val fs = lr.relation.asInstanceOf[HadoopFsRelation]
        fs.location.refresh()
        val idx = new FrozenFileIndex(
          fs.location.listFiles(Nil, Nil), fs.location.rootPaths,
          fs.location.partitionSchema, fs.location.sizeInBytes)
        lr.copy(relation = fs.copy(location = idx)(spark))
    }
    CDataset.ofRows(spark, frozen)
  }

  /** Bucket id a bucketed-writer file name encodes (Spark's own parser —
    * the same one the bucketed scan keys on), None for plain files.
    * Lets the commit protocol verify that files carried into a bucketed
    * version really honor the bucket spec before keeping the marker.
    */
  def bucketIdOf(fileName: String): Option[Int] =
    org.apache.spark.sql.execution.datasources.BucketingUtils
      .getBucketId(fileName)
}
