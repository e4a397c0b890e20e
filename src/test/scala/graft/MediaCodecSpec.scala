package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** A swapped-in test codec: constant dimensions, checksum = blob
  * length — output provably different from [[Multimodal.StubCodec]]
  * on every non-degenerate row. Top-level class with a no-arg
  * constructor (the seam instantiates by name, task-side).
  */
final class FixedTestCodec extends Multimodal.MediaCodec {
  override def decode(b: graft.ops.MediaBlob): graft.ops.BlobFeatures =
    graft.ops.BlobFeatures(b.doc_id, 640, 480, 1, b.blob.length.toLong)
}

/** The pluggable multimodal codec seam (VERDICT r11 #7): the decode
  * operator routes through the `spark.graft.mm.codec` conf — default
  * = the deterministic stub the oracles pin; a deployment-injected
  * class changes the pipeline output with ZERO operator edits.
  */
class MediaCodecSpec extends SparkSpec {

  test("spark.graft.mm.codec swaps the decode implementation: " +
    "default = stub (oracle-pinned), injected class changes output, " +
    "unset restores the stub") {
    val stub = Multimodal.decodeFeatures(spark, sf).collect()
    assert(stub.nonEmpty)

    spark.conf.set(Multimodal.CodecConf, classOf[FixedTestCodec].getName)
    try {
      val swapped = Multimodal.decodeFeatures(spark, sf).collect()
      assert(swapped.length == stub.length,
        "the seam changes decode VALUES, not the pipeline shape")
      assert(swapped.forall(r => r.getInt(1) == 640 && r.getInt(2) == 480),
        "the injected codec's output must flow through")
      // The stub and the test codec must actually disagree somewhere
      // (else the swap proved nothing).
      assert(stub.exists(r => r.getInt(1) != 640),
        "fixture must distinguish the codecs")
      // checksum column = blob length under the test codec.
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), length(col("text")).cast("long").as("len"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      swapped.take(20).foreach(r =>
        assert(r.getLong(4) == docs(r.getLong(0))))
    } finally spark.conf.unset(Multimodal.CodecConf)

    // Conf unset: byte-identical to the default stub run.
    val again = Multimodal.decodeFeatures(spark, sf).collect()
    assert(again.toSeq == stub.toSeq)

    // A bogus class refuses loudly at execution.
    spark.conf.set(Multimodal.CodecConf, "no.such.Codec")
    try intercept[Exception] {
      Multimodal.decodeFeatures(spark, sf).collect()
    } finally spark.conf.unset(Multimodal.CodecConf)
  }
}
