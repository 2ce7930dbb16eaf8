package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factories with the configuration story for each
  * deployment shape. The queries/operators in this library are
  * config-agnostic — these builders encode where the knobs should sit
  * so a local run and a 1000-executor run execute the same plans.
  */
object Sessions {

  /** Local development/test session (the driver harness shape). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    base(SparkSession.builder().master(s"local[$cores]"))
      .config("spark.sql.shuffle.partitions", cores)
      .getOrCreate()

  /** Cluster-shaped tuning for the ~100 TB target. Notes on each
    * knob, since the values are the design, not incidental:
    *
    *  - shuffle.partitions ≈ 2-3× total executor cores as the
    *    *initial* value; AQE coalesces small partitions after each
    *    stage, so erring high costs little and avoids 2 GB-per-
    *    partition shuffle failures on the big joins.
    *  - files.maxPartitionBytes 256m: scan tasks sized so a full
    *    row-group batch plus join build side fits executor memory.
    *  - adaptive.enabled + skewJoin: runtime re-planning converts
    *    sort-merge to broadcast when a side turns out small, and
    *    splits skewed partitions — the salting helper (operators.Skew)
    *    is for skewed *aggregations*, which AQE does not rebalance.
    *  - autoBroadcastJoinThreshold 64m: every TPC-H-shaped dimension
    *    (region/nation/customer/supplier/part at any realistic scale
    *    of dims-vs-facts) broadcasts; the fact table never moves
    *    before its partial aggregate.
    *  - parquet filter pushdown + nanosAsLong are correctness/scan
    *    requirements for this corpus.
    */
  def clusterTuned(builder: SparkSession.Builder,
      totalCores: Int): SparkSession.Builder =
    base(builder)
      .config("spark.sql.shuffle.partitions", math.max(totalCores * 2, 200))
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)

  private def base(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // oracle parquet may spell timestamps µs-without-UTC-flag; read
      // them as plain TIMESTAMP (Spark-3 behavior), not TIMESTAMP_NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
}
