package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** North-star sink (BASELINE.json): batch DataFrame → ClickHouse over JDBC.
  *
  * No ClickHouse JDBC driver ships in this zero-egress environment, so this
  * stays a thin, config-driven wrapper around Spark's generic JDBC writer —
  * the 100 TB-relevant part is the *write shape*, which is handled here:
  * repartition to bound per-task insert size and sort within partitions by
  * the target table's ORDER BY key so ClickHouse parts arrive pre-sorted
  * (cheap merges, good primary-key locality).
  */
object ClickHouseSink {

  final case class Config(
      url: String,                       // jdbc:clickhouse://host:8123/db
      table: String,
      orderByKey: Seq[String],           // ClickHouse engine ORDER BY columns
      user: String = "default",
      password: String = "",
      batchSize: Int = 100000,
      numWritePartitions: Int = 0)       // 0 = keep current partitioning

  /** The write shape, exposed for testing: repartition to bound per-task
    * insert size, then sort within partitions by the ClickHouse ORDER BY
    * key (pre-sorted parts → cheap merges on the server). */
  def shape(df: DataFrame, cfg: Config): DataFrame = {
    val shaped0 =
      if (cfg.numWritePartitions > 0) df.repartition(cfg.numWritePartitions)
      else df
    if (cfg.orderByKey.nonEmpty)
      shaped0.sortWithinPartitions(cfg.orderByKey.map(df(_)): _*)
    else shaped0
  }

  def write(df: DataFrame, cfg: Config): Unit = {
    shape(df, cfg).write
      .format("jdbc")
      .mode(SaveMode.Append)
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", cfg.batchSize.toString)
      .option("isolationLevel", "NONE") // ClickHouse has no transactions
      .save()
  }
}
