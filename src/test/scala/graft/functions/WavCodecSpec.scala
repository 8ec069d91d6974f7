package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WAV decode contracts. The decoder is pinned against HAND-WRITTEN
  * golden bytes (not the companion encoder — a shared endianness or
  * offset misunderstanding between encode and decode would cancel in a
  * round trip; golden bytes tie the parse to the public RIFF spec),
  * plus chunk-walking, malformed-input and SQL-surface checks.
  */
class WavCodecSpec extends SparkSpec {

  /** Canonical 44-byte-header WAV, handwritten byte by byte:
    * 2 ch, 44100 Hz, 16-bit PCM, 2 frames: (100, -100), (32767, -32768).
    */
  private def golden: Array[Byte] = {
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    ("RIFF".getBytes("US-ASCII") ++ le32(36 + 8) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(8) ++
      le16(100) ++ le16(0xff9c) /* -100 */ ++ le16(0x7fff) ++ le16(0x8000)).toArray
  }

  test("golden bytes decode exactly (header fields, signed samples, channel interleave)") {
    val r = WavCodec.decode(golden)
    assert(r != null)
    assert(r.getInt(0) === 1)      // fmt_tag PCM
    assert(r.getInt(1) === 2)      // channels
    assert(r.getInt(2) === 44100)  // sample rate
    assert(r.getInt(3) === 16)     // bits
    assert(r.getInt(4) === 2)      // frames
    assert(r.getLong(5) === 100L + 32767L)    // ch0: frames' first samples
    assert(r.getLong(6) === -100L - 32768L)   // ch1: signed negatives
    assert(r.getInt(7) === 32768)  // |−32768|
  }

  test("encoder output round-trips through the decoder (separate code paths)") {
    val samples = Array[Short](10, -20, 300, -4000, 5, 6)
    val r = WavCodec.decode(WavCodec.encode(3, 8000, samples))
    assert(r != null)
    assert(r.getInt(1) === 3 && r.getInt(2) === 8000 && r.getInt(4) === 2)
    assert(r.getLong(5) === 10L - 4000L) // ch0 = interleave indexes 0, 3
    assert(r.getLong(6) === -20L + 5L)   // ch1 = indexes 1, 4
    assert(r.getInt(7) === 4000)
  }

  test("chunk WALKING: a JUNK chunk before data must not shift the parse (no fixed-44 assumption)") {
    // encoder always emits JUNK before data — golden has none; both decode
    val withJunk = WavCodec.encode(2, 44100, Array[Short](100, -100, 32767, -32768))
    val a = WavCodec.decode(withJunk)
    val b = WavCodec.decode(golden)
    assert(a != null && b != null)
    (0 until 8).foreach(i => assert(a.get(i, WavCodec.schema.fields(i).dataType) ===
      b.get(i, WavCodec.schema.fields(i).dataType), s"field $i diverged"))
  }

  test("malformed inputs decode to NULL, never throw (a bad blob must not kill a scan)") {
    assert(WavCodec.decode(null) === null)
    assert(WavCodec.decode(Array.emptyByteArray) === null)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII")) === null) // no chunks
    assert(WavCodec.decode("not a wav at all........".getBytes("US-ASCII")) === null)
    val truncated = golden.take(30)
    assert(WavCodec.decode(truncated) === null)
    // lying chunk length (points past the buffer) must not read OOB
    val lying = golden.clone()
    lying(40) = 0x7f.toByte // data size byte → huge
    assert(WavCodec.decode(lying) === null)
    // non-PCM fmt tag rejected
    val alaw = golden.clone()
    alaw(20) = 6 // fmt tag = A-law
    assert(WavCodec.decode(alaw) === null)
  }

  test("wav_features: window split, in-window ZCR, partial tail, exact integer energy") {
    // mono samples [3, -1, 0, 5, -2], window 2:
    //  w0 [3,-1]: energy 10, one crossing, peak 3
    //  w1 [0, 5]: energy 25, no crossing (both ≥ 0), peak 5
    //  w2 [-2]  : partial tail — energy 4, no crossing possible, peak 2
    val blob = WavCodec.encode(1, 8000, Array[Short](3, -1, 0, 5, -2))
    val arr = WavCodec.features(blob, 2)
    assert(arr != null && arr.numElements() === 3)
    def row(i: Int) = arr.getStruct(i, 4)
    assert((row(0).getInt(0), row(0).getLong(1), row(0).getInt(2), row(0).getInt(3)) ===
      ((0, 10L, 1, 3)))
    assert((row(1).getInt(0), row(1).getLong(1), row(1).getInt(2), row(1).getInt(3)) ===
      ((1, 25L, 0, 5)))
    assert((row(2).getInt(0), row(2).getLong(1), row(2).getInt(2), row(2).getInt(3)) ===
      ((2, 4L, 0, 2)))
  }

  test("wav_features: stereo uses the channel-0 stride; crossings never count across a window boundary") {
    // stereo frames (ch0, ch1): (4,-9), (-4,-9), (4,-9), (-4,-9) — ch1 is
    // all negative noise that must be ignored; ch0 alternates sign every
    // frame, so with window 2 each window has exactly ONE in-window
    // crossing (the boundary crossing between frames 1→2 is dropped)
    val blob = WavCodec.encode(2, 8000, Array[Short](4, -9, -4, -9, 4, -9, -4, -9))
    val arr = WavCodec.features(blob, 2)
    assert(arr != null && arr.numElements() === 2)
    (0 until 2).foreach { i =>
      val r = arr.getStruct(i, 4)
      assert(r.getLong(1) === 32L, s"window $i energy must come from ch0 only")
      assert(r.getInt(2) === 1, s"window $i must count exactly its in-window crossing")
      assert(r.getInt(3) === 4)
    }
  }

  test("wav_features: invalid input or non-positive window → null; SQL surface explodes") {
    assert(WavCodec.features("junk".getBytes("US-ASCII"), 4) === null)
    assert(WavCodec.features(WavCodec.encode(1, 8000, Array[Short](1)), 0) === null)
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq((1L, WavCodec.encode(1, 8000, Array[Short](3, -1, 0, 5, -2))))
      .toDF("id", "wav")
      .selectExpr("id", "explode(wav_features(wav, 2)) AS f")
      .selectExpr("f.win_idx", "f.energy", "f.zcr", "f.peak")
      .orderBy("win_idx").collect()
    assert(got.map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq ===
      Seq((0, 10L, 1, 3), (1, 25L, 0, 5), (2, 4L, 0, 2)))
  }

  test("wav_decode is SQL-callable, codegen-compatible, and null-propagating") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, WavCodec.encode(1, 16000, Array[Short](7, -7, 100))),
      (2L, "garbage".getBytes("US-ASCII")),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "wav")
    val got = df.selectExpr("id", "wav_decode(wav) AS w")
      .selectExpr("id", "w.channels", "w.n_frames", "w.ch0_sum", "w.peak")
      .orderBy("id").collect()
    assert(got(0).getInt(1) === 1 && got(0).getInt(2) === 3 &&
      got(0).getLong(3) === 100L && got(0).getInt(4) === 100)
    assert(got(1).isNullAt(1), "garbage must decode to null, not fail the query")
    assert(got(2).isNullAt(1), "null input propagates null")
  }
}
