package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Deletion vectors — Iceberg v3's compact position-delete encoding
  * (puffin-stored bitmaps, one vector per data file), re-expressed
  * for this store: a `.dv` file is a self-contained blob naming ONE
  * data file and the sorted set of its deleted row ordinals,
  * delta-varint encoded (~1–2 bytes per position for clustered
  * deletes vs ~2 long columns per pair in a position-delete parquet).
  *
  * DVs ride the manifest as ordinary `kind = "pos"` [[SnapStore.DeleteFile]]
  * entries (`refs` = the one data file) — the ENCODING is the only
  * difference, so every routing decision (affected-file grouping,
  * metadata tables, sequence rules) is shared with parquet position
  * deletes, and the two encodings may coexist on one table (position
  * suppression is idempotent, so unioning them is sound). Content
  * readers branch on the `.dv` suffix.
  *
  * Format: magic `GDV1` · varint name length · data-file-name UTF-8
  * bytes · varint cardinality · that many delta varints (first
  * position absolute, then `gap - 1` per successor — strictly
  * increasing, deduplicated). The recorded cardinality makes
  * truncation detectable at decode.
  */
object DeleteVectors {

  // v2 of the blob layout (the cardinality header landed after v1;
  // the magic bump makes any v1 blob refuse loudly at the magic
  // check instead of mis-decoding its first delta as a count).
  private val Magic = Array[Byte]('G', 'D', 'V', '2')

  /** Is this manifest path a deletion vector? */
  def isDv(path: String): Boolean = path.endsWith(".dv")

  /** Session switch: position deletes write as deletion vectors. */
  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.delete.vectors").exists(_.toBoolean)

  /** Task-side DV writer over a `(file, pos)` iterator SORTED within
    * the partition (each file's rows wholly in one partition): one
    * blob per file into `tmpDir`, merging (and thereby superseding)
    * the file's pending DVs from `oldByRef`. Yields one summary row
    * `(data file, tmp blob name, merged cardinality)` per blob — the
    * only thing that travels back to the driver.
    */
  def writeGroups(it: Iterator[(String, Long)],
      oldByRef: Map[String, Seq[String]], tmpDir: String):
      Iterator[(String, String, Long)] = {
    val out = mutable.ArrayBuffer.empty[(String, String, Long)]
    val buf = it.buffered
    while (buf.hasNext) {
      val file = buf.head._1
      val b = new mutable.ArrayBuilder.ofLong
      while (buf.hasNext && buf.head._1 == file) b.addOne(buf.next()._2)
      oldByRef.getOrElse(file, Seq.empty)
        .foreach(p => b.addAll(read(java.nio.file.Paths.get(p))._2))
      val merged = b.result().sorted.distinct
      val name = s"dv-${java.util.UUID.randomUUID().toString.take(12)}.dv"
      val os = Files.newOutputStream(java.nio.file.Paths.get(tmpDir, name))
      val n = try write(os, file, merged) finally os.close()
      out += ((file, name, n))
    }
    out.iterator
  }

  private def writeVarint(out: DataOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.writeByte(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.writeByte(v.toInt)
  }

  private def readVarint(in: DataInputStream): Long = {
    var shift = 0
    var acc = 0L
    var b = in.read()
    if (b < 0) throw new EOFException()
    while ((b & 0x80) != 0) {
      acc |= (b & 0x7fL) << shift
      shift += 7
      b = in.read()
      if (b < 0) throw new EOFException()
    }
    acc | (b.toLong << shift)
  }

  /** Write the STRICTLY-INCREASING (caller-sorted, deduplicated)
    * position array for `dataFile` into `out`. Returns the count.
    * The cardinality rides the header so a TRUNCATED blob (partial
    * write/copy) is detected at decode instead of silently serving
    * fewer deletions (code review r12).
    */
  def write(out: OutputStream, dataFile: String,
      positions: Array[Long]): Long = {
    val d = new DataOutputStream(new BufferedOutputStream(out, 1 << 16))
    d.write(Magic)
    val name = dataFile.getBytes(UTF_8)
    writeVarint(d, name.length.toLong)
    d.write(name)
    writeVarint(d, positions.length.toLong)
    var prev = -1L
    positions.foreach { p =>
      require(p > prev, s"positions must be strictly increasing ($p after $prev)")
      writeVarint(d, if (prev < 0) p else p - prev - 1)
      prev = p
    }
    d.flush()
    positions.length.toLong
  }

  /** Decode a `.dv` blob: (referenced data file name, sorted
    * positions). A blob shorter or longer than its recorded
    * cardinality refuses loudly — deletions must never silently
    * shrink.
    */
  def read(in: InputStream): (String, Array[Long]) = {
    val d = new DataInputStream(new BufferedInputStream(in, 1 << 16))
    val magic = new Array[Byte](4)
    d.readFully(magic)
    require(java.util.Arrays.equals(magic, Magic),
      "not a graft deletion vector (bad magic)")
    val nameLen = readVarint(d).toInt
    val name = new Array[Byte](nameLen)
    d.readFully(name)
    val count = readVarint(d)
    val b = new mutable.ArrayBuilder.ofLong
    var prev = -1L
    var i = 0L
    try {
      while (i < count) {
        val delta = readVarint(d)
        prev = if (prev < 0) delta else prev + delta + 1
        b.addOne(prev)
        i += 1
      }
    } catch {
      case _: EOFException => throw new IllegalStateException(
        s"truncated deletion vector: $i of $count positions present")
    }
    require(d.read() < 0,
      "corrupt deletion vector: trailing bytes after the recorded count")
    (new String(name, UTF_8), b.result())
  }

  def read(path: Path): (String, Array[Long]) = {
    val in = Files.newInputStream(path)
    try read(in) finally in.close()
  }

  /** Task-side row view of one DV — `(file, pos)` InternalRows, the
    * exact shape a position-delete parquet reader yields, so
    * [[SnapDeleteCache.posMap]] builds identical structures from
    * either encoding.
    */
  def rowIterator(path: String): Iterator[InternalRow] = {
    val p =
      if (path.startsWith("file:"))
        java.nio.file.Paths.get(java.net.URI.create(path))
      else java.nio.file.Paths.get(path)
    val (name, positions) = read(p)
    val u = UTF8String.fromString(name)
    positions.iterator.map(p =>
      new GenericInternalRow(Array[Any](u, p)): InternalRow)
  }

  /** The `(file, pos)` DataFrame of a mixed pos-delete set — parquet
    * entries scan as parquet, `.dv` entries decode DISTRIBUTED (a
    * dataset of paths flat-mapped task-side; executors read the
    * shared store directly, no driver materialization). The one
    * frame every V1 rewrite/fold path anti-joins or merges with.
    */
  def pairsDf(spark: SparkSession, table: Path,
      deletes: Seq[SnapStore.DeleteFile]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (dvs, pqs) = deletes.partition(d => isDv(d.path))
    val frames = Seq.newBuilder[DataFrame]
    if (pqs.nonEmpty)
      frames += spark.read
        .parquet(pqs.map(d => table.resolve(d.path).toString): _*)
        .select(col("file"), col("pos"))
    if (dvs.nonEmpty) {
      val paths = dvs.map(d => table.resolve(d.path).toString)
      frames += spark.createDataset(paths)
        .flatMap { p =>
          val (name, positions) = DeleteVectors.read(
            java.nio.file.Paths.get(p))
          positions.iterator.map(name -> _)
        }
        .toDF("file", "pos")
    }
    frames.result().reduce(_ unionByName _)
  }
}
