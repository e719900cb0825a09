package graft.engine

import org.apache.spark.sql.{Dataset, Encoder}

/** C6 `map_data`: a bidirectional element transform applied on a
  * collection's write path (`to`) and read path (`from`) — re-expressing
  * the reference's `Dataset::map_data` adapter
  * (spire-rs/spire crates/spire-core/src/dataset/utils/mod.rs:166-191,
  * map_data.rs:84; canonical URL-lowercasing example at
  * dataset/utils/mod.rs:38-47).
  *
  * In Spark the adapter is just `Dataset.map` staged at the table
  * boundary; this wrapper exists to make the write/read pairing explicit
  * and testable (MapDataSpec pins the reference example's roundtrip).
  */
final case class MappedData[A, B](to: A => B, from: B => A)
    extends Serializable {

  /** Write-path transform (reference `write`/`write_batch` adapters). */
  def onWrite(ds: Dataset[A])(implicit e: Encoder[B]): Dataset[B] = ds.map(to)

  /** Read-path transform (reference `read`/`read_all` adapters). */
  def onRead(ds: Dataset[B])(implicit e: Encoder[A]): Dataset[A] = ds.map(from)
}
