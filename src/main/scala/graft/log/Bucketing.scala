package graft.log

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed topic tables: pre-shuffle the log once on its join key so
 * every subsequent join/aggregation on that key is exchange-free — the
 * 100 TB answer to "this topic is joined on `key` by every consumer".
 *
 * Spark bucketing requires the table catalog (`saveAsTable`); both sides
 * bucketed on the same key with the same bucket count join with NO
 * Exchange (verified in BucketedJoinSpec). At cluster scale this is the
 * difference between one shuffle per query and zero.
 */
object Bucketing {

  /** Persist `df` as a bucketed+sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
