package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 routes `Column` through `ColumnNode`, and the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is private[sql] —
  * so this one-file shim sits inside the org.apache.spark.sql package tree,
  * the standard pattern for libraries that ship custom Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame's physical rows without Row boxing (`df.rdd` inserts a
    * deserializing projection per row). */
  def internalRows(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** Rebuild a DataFrame from InternalRows (the private[sql] twin of
    * createDataFrame — no Row re-encoding pass). */
  def fromInternalRows(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Standard NON_FOLDABLE_ARGUMENT AnalysisException for a SQL function
    * handed a column where a constant parameter is required
    * (QueryCompilationErrors is private[sql], hence here). */
  def nonFoldableArgument(funcName: String, paramName: String,
      tpe: org.apache.spark.sql.types.DataType): Throwable =
    org.apache.spark.sql.errors.QueryCompilationErrors
      .nonFoldableArgumentError(funcName, paramName, tpe)

  /** Register a temp SQL function on a LIVE session (the builder-time path
    * is GraftExtensions; sessionState is private[sql], hence here). */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Parse a SQL expression string to its raw (unresolved) Catalyst
    * tree — `functions.expr` defers parsing inside a lazy
    * ColumnNodeExpression, so reference analysis must go through the
    * session parser directly (sessionState is private[sql]). */
  def parseExpression(spark: org.apache.spark.sql.SparkSession,
      sql: String): Expression =
    spark.sessionState.sqlParser.parseExpression(sql)

  /** Parse a full SQL statement to its raw logical plan (sessionState
    * is private[sql]) — the live-session entry of the DML face. */
  def parsePlan(spark: org.apache.spark.sql.SparkSession,
      sql: String): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(sql)

  /** Drain the listener bus so a metrics listener has observed every
    * task of the jobs that already finished (`listenerBus` is
    * private[spark]). Audit/spec tooling only — never on a hot path. */
  def waitListenerBusEmpty(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** A configured catalog plugin by name (CatalogManager is
    * private[sql]) — how the DML face resolves `catalog.ns.table`
    * identifiers to a GraftCatalog instance. */
  def catalogPlugin(spark: org.apache.spark.sql.SparkSession,
      name: String): org.apache.spark.sql.connector.catalog.CatalogPlugin =
    spark.sessionState.catalogManager.catalog(name)

  /** The session's SQL parser itself — the delegate a wrapping
    * `ParserInterface` (GraftSqlParser) forwards to. */
  def sqlParser(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.parser.ParserInterface =
    spark.sessionState.sqlParser

  /** Build a DataFrame over an arbitrary logical plan (the private[sql]
    * Dataset.ofRows — how a library hands Catalyst a custom LeafNode). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session's Hadoop configuration as a task-shippable accessor
    * (`Configuration` itself isn't serializable; Spark's wrapper is
    * private[spark], hence here). */
  def serializableHadoopConf(spark: org.apache.spark.sql.SparkSession)
      : () => org.apache.hadoop.conf.Configuration = {
    val wrapped = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    () => wrapped.value
  }
}
