package graft.streaming

/** Maps the `SPARK_GRAFT_STATE_PROVIDER` env contract
  * ("hdfs" | "rocksdb") to the Structured Streaming providerClass
  * conf value. Shared by StreamBench (the throughput/state-bytes A/B
  * harness) and Verify (the ci.sh `state_provider` correctness axis):
  * RocksDB is the documented 100-TB default (docs/STREAM_SCALE.md —
  * HDFS-backed heap state grows linearly in live keys, RocksDB stays
  * flat behind a bounded block cache), so the five `*_state` gates
  * must be provably green under BOTH providers, not only benched.
  * Default "hdfs" keeps the driver's stock gate byte-identical to
  * pre-r12 rounds. */
object StateProvider {
  val confKey = "spark.sql.streaming.stateStore.providerClass"

  def fromEnv(): String =
    sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "hdfs")
      .toLowerCase match {
      case "rocksdb" => "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider"
      case "hdfs" => "org.apache.spark.sql.execution.streaming." +
        "state.HDFSBackedStateStoreProvider"
      case other => sys.error(
        s"SPARK_GRAFT_STATE_PROVIDER must be hdfs|rocksdb, got $other")
    }
}
