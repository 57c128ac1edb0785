package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Companion to [[ExprBridge]]: reaches the private[sql]
  * `internalCreateDataFrame` so imperative line decoders (zeek TSV) can
  * hand Spark InternalRows directly — no external-Row materialization,
  * no Catalyst converter pass, same contract the DataSource V2 zng scan
  * gets for free.
  */
object RowBridge {
  def toDF(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
