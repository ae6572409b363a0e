package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Seq((1L, "a" * 100), (2L, "xy"), (3L, "b" * 200))
      .toDF("id", "payload"), "payload", "image/fake")

  test("asMedia: binary content + typed metadata struct") {
    val r = media.filter(col("id") === 1).head()
    assert(r.getAs[Array[Byte]]("content").length === 100)
    val meta = r.getAs[org.apache.spark.sql.Row]("media_meta")
    assert(meta.getAs[String]("media_type") === "image/fake")
    assert(meta.getAs[Int]("width") >= 0 && meta.getAs[Int]("width") < 1920)
    assert(meta.getAs[Long]("duration_ms") === 4000L)
  }

  test("decodeFeaturesStub: fixed-width deterministic features") {
    val f = media.select(
      Multimodal.decodeFeaturesStub(col("content"), 8).as("f"))
      .collect().map(_.getSeq[Double](0))
    assert(f.forall(_.length === 8))
    assert(f.forall(_.forall(v => v >= 0.0 && v < 1.0)))
    // deterministic: same payload → same features
    val again = media.select(
      Multimodal.decodeFeaturesStub(col("content"), 8).as("f"))
      .collect().map(_.getSeq[Double](0))
    assert(f.toSeq === again.toSeq)
  }

  test("sampleFrames: stride slicing incl. short payloads") {
    val frames = media.select(col("id"),
        Multimodal.sampleFrames(col("content"), 64, 16).as("fr"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1)).toMap
    assert(frames(1L).length === 2)  // 100 bytes → offsets 0, 64
    assert(frames(1L).head.length === 16)
    assert(frames(2L).length === 1)  // shorter than a frame → 1 truncated
    assert(frames(3L).length === 3)  // 200 bytes → 0, 64, 128
  }

  test("resizeStub: bounded output, identity under target, deterministic") {
    val out = media.select(col("id"),
        Multimodal.resizeStub(64)(col("content")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("r")).toMap
    assert(out(1L).length === 64)   // 100 bytes → downsampled to 64
    assert(out(2L).length === 2)    // already under target → unchanged
    assert(out(3L).length === 64)
    assert(out(1L).forall(_ == 'a'.toByte)) // sampled from the source bytes
  }

  test("repartitionByPayloadBytes sizes tasks by bytes, not rows") {
    val out = Multimodal.repartitionByPayloadBytes(media, "content",
      targetBytes = 150L)
    // total 302 bytes / 150-byte target → 3 partitions
    assert(out.rdd.getNumPartitions === 3)
    assert(out.count() === 3)
  }

  test("repartitionByPayloadBytes: file-backed input sizes from file " +
      "metadata (no content pass) and the batched write is O(files)") {
    val src = graft.Scratch.dir("graft_mm_src")
    spark.range(200)
      .select(col("id"), expr("cast(repeat('x', 1000) as binary)").as("content"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    val back = spark.read.parquet(src)
    val (nFiles, bytes) = graft.Tables.scanFileBytes(back)
    assert(nFiles === 1 && bytes > 0)
    val out = Multimodal.repartitionByPayloadBytes(back, "content",
      targetBytes = (bytes + 3) / 4) // ceil-div so ceil(bytes/target) = 4
    assert(out.rdd.getNumPartitions === 4)
    // the m2b layout property: the write lands one file per sized
    // partition — O(files), never O(rows)
    val dst = graft.Scratch.dir("graft_mm_dst")
    out.write.mode("overwrite").parquet(dst)
    val parts = new java.io.File(dst).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts === 4, s"expected 4 part files, got $parts")
  }

  test("decodeBatch: mapPartitions plumbing appends decoded_len") {
    val out = Multimodal.decodeBatch(media, "content")
    assert(out.schema.fieldNames.contains("decoded_len"))
    val lens = out.select("id", "decoded_len").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lens === Map(1L -> 100L, 2L -> 2L, 3L -> 200L))
  }

  test("syntheticPng emits a real PNG stream and decodePng recovers " +
      "the closed-form pixels exactly") {
    val bytes = Multimodal.syntheticPng(42L)
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A
    assert(bytes.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val dec = Multimodal.decodePng(42L, bytes)
    assert(dec.width === 1 + (42 % 8).toInt)
    assert(dec.height === 1 + (42 % 6).toInt)
    val want = (for {
      y <- 0 until dec.height; x <- 0 until dec.width
    } yield (42L * 31 + x * 7 + y * 13) % 256).sum
    assert(dec.pix_sum === want)
    assert(dec.n_bytes === bytes.length.toLong)
  }

  test("decodePng throws loudly on undecodable bytes") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodePng(7L, "not a png".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("encodePngs→parquet→decodeImages round-trips distributed, and " +
      "the codec boundary stays in the Dataset lane (no RDD hop)") {
    import spark.implicits._
    val dir = graft.Scratch.dir("graft_mm_png")
    Multimodal.encodePngs(spark.range(0, 50).as[Long]).toDF()
      .write.mode("overwrite").parquet(dir)
    val decoded = Multimodal.decodeImages(
      spark.read.parquet(dir), "doc_id", "content")
    // no df.rdd hop: the physical plan still starts at the parquet
    // FileScan (an RDD hop would plan Scan ExistingRDD and sever AQE)
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), plan)
    assert(plan.contains("Scan parquet") || plan.contains("FileScan"), plan)
    val rows = decoded.collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      assert(r.width === 1 + (r.doc_id % 8).toInt)
      assert(r.height === 1 + (r.doc_id % 6).toInt)
      val want = (for {
        y <- 0 until r.height; x <- 0 until r.width
      } yield (r.doc_id * 31 + x * 7 + y * 13) % 256).sum
      assert(r.pix_sum === want, s"doc ${r.doc_id}")
    }
  }

  private def pngPixSum(fid: Long, w: Int, h: Int): Long =
    (for { y <- 0 until h; x <- 0 until w }
      yield (fid * 31 + x * 7 + y * 13) % 256).sum

  test("GVC1 video: encode → demux → stride decode matches the closed form") {
    import spark.implicits._
    val vids = Multimodal.encodeVideos(spark.range(0, 30).as[Long]).toDF()

    // stride 1: every frame of every container decodes
    val all = Multimodal.decodeVideoFrames(vids, "doc_id", "content")
      .collect().map(f => (f.doc_id, f.frame_idx) -> f).toMap
    val wantKeys = (for {
      id <- 0L until 30L; fi <- 0 to (id % 3).toInt
    } yield (id, fi)).toSet
    assert(all.keySet === wantKeys)
    all.values.foreach { f =>
      val fid = f.doc_id * 16 + f.frame_idx
      assert(f.width === 1 + (fid % 8).toInt)
      assert(f.height === 1 + (fid % 6).toInt)
      assert(f.pix_sum === pngPixSum(fid, f.width, f.height),
        s"doc ${f.doc_id} frame ${f.frame_idx}")
    }

    // stride 2: exactly the even frames survive, identical values
    val sampled = Multimodal.decodeVideoFrames(vids, "doc_id", "content",
        stride = 2)
      .collect().map(f => (f.doc_id, f.frame_idx) -> f).toMap
    assert(sampled.keySet === wantKeys.filter(_._2 % 2 == 0))
    sampled.foreach { case (k, f) => assert(f === all(k)) }
  }

  test("syntheticWav emits a real RIFF/WAVE stream and decodeWav " +
      "recovers the closed-form samples exactly") {
    val bytes = Multimodal.syntheticWav(42L)
    // RIFF....WAVE header
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    val dec = Multimodal.decodeWav(42L, bytes)
    val n = 40 + (42 % 23).toInt
    assert(dec.n_samples === n.toLong)
    assert(dec.sample_rate === 8000)
    val want = (0 until n).map(i => (42L * 31 + i * 7) % 2001 - 1000).sum
    assert(dec.sample_sum === want)
  }

  test("decodeWav rejects non-WAV and non-PCM-s16-mono payloads") {
    intercept[Exception] { // UnsupportedAudioFileException or similar
      Multimodal.decodeWav(7L, "not audio at all".getBytes("UTF-8"))
    }
    // a real WAV but stereo 8-bit: must hit the format guard
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 2, true, false)
    val pcm = new Array[Byte](64)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 32L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeWav(8L, bos.toByteArray)
    }
    assert(e.getMessage.contains("not 16-bit mono"))
  }

  test("encodeWavs→parquet→decodeAudio round-trips distributed in the " +
      "Dataset lane (no RDD hop)") {
    import spark.implicits._
    val dir = graft.Scratch.dir("graft_mm_wav")
    Multimodal.encodeWavs(spark.range(0, 60).as[Long]).toDF()
      .write.mode("overwrite").parquet(dir)
    val decoded = Multimodal.decodeAudio(
      spark.read.parquet(dir), "doc_id", "content")
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), plan)
    assert(plan.contains("Scan parquet") || plan.contains("FileScan"), plan)
    val rows = decoded.collect()
    assert(rows.length === 60)
    rows.foreach { r =>
      val n = 40 + (r.doc_id % 23).toInt
      assert(r.n_samples === n.toLong, s"doc ${r.doc_id}")
      assert(r.sample_rate === 8000)
      val want = (0 until n).map(i => (r.doc_id * 31 + i * 7) % 2001 - 1000).sum
      assert(r.sample_sum === want, s"doc ${r.doc_id}")
    }
  }

  test("decodeVideoFrames rejects a non-GVC1 payload") {
    import spark.implicits._
    val bad = Seq((1L, "definitely not a container".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoFrames(bad, "doc_id", "content").collect()
    }
    assert(e.getMessage.contains("GVC1") ||
      e.getCause != null && e.getCause.getMessage.contains("GVC1"))
  }
}
