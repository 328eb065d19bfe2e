package graft.store

import org.apache.spark.sql.DataFrame

/** Bucketed data-source tables for co-located joins (SURVEY.md §4).
  *
  * A shuffled equi-join moves BOTH sides across the network every time it
  * runs. When a big table is joined on the same key repeatedly (fact ⋈ fact
  * on orderkey, every day), pre-bucketing both sides on that key hashes
  * rows into matching bucket files at WRITE time: Spark's scan then reports
  * `HashPartitioning(key, n)` and the join plans with no Exchange on either
  * side — the shuffle is paid once at ingest instead of per-query. Sorting
  * within buckets additionally removes the per-query Sort of a sort-merge
  * join.
  *
  * This uses Spark-native bucketing (data-source tables in the session
  * catalog), not Hive bucketing; both sides must use the same key and
  * bucket count to co-locate.
  */
object BucketedStore {

  /** Write `df` as a bucketed + in-bucket-sorted table named `table` with
    * files at `path`. Equal keys land in the same bucket id on every table
    * written with the same (key, buckets). */
  def write(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
