package graft.functions

import graft.SparkSpec

/** BMP decode contracts. Golden bytes are HAND-WRITTEN (not produced
  * by the companion encoder) so a shared layout misunderstanding
  * cannot cancel in a round trip; orientation, offset-field, and
  * malformed-input behavior are pinned separately.
  */
class BmpCodecSpec extends SparkSpec {

  /** Canonical 2×2 24-bpp bottom-up BMP, offset 54, byte by byte.
    * Logical top-left row-major pixels: red, green / blue, (10,20,30).
    * Bottom-up storage writes the BLUE row first.
    */
  private def golden: Array[Byte] = {
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    ("BM".getBytes("US-ASCII") ++ le32(70) ++ le16(0) ++ le16(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      // storage row 0 = logical BOTTOM row: blue (BGR 255,0,0), (30,20,10), pad
      Array[Byte](255.toByte, 0, 0, 30, 20, 10, 0, 0) ++
      // storage row 1 = logical TOP row: red (BGR 0,0,255), green (0,255,0), pad
      Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0)).toArray
  }
  private val goldenPixels = Array(0xff0000, 0x00ff00, 0x0000ff, (10 << 16) | (20 << 8) | 30)

  test("golden bytes decode exactly (header fields, BGR order, bottom-up rows, padding)") {
    val r = BmpCodec.decode(golden)
    assert(r != null)
    assert(r.getInt(0) === 2 && r.getInt(1) === 2 && r.getInt(2) === 24)
    assert(r.getLong(3) === 265L) // r: 255 + 0 + 0 + 10
    assert(r.getLong(4) === 275L) // g: 0 + 255 + 0 + 20
    assert(r.getLong(5) === 285L) // b: 0 + 0 + 255 + 30
    assert(r.getLong(6) === 149685L) // green pixel: 587*255
    // Σ index·lum over LOGICAL order: 0·76245 + 1·149685 + 2·29070 + 3·18150
    assert(r.getLong(7) === 262275L)
  }

  test("encoder output round-trips through the decoder (separate code paths)") {
    val enc = BmpCodec.encode(2, 2, goldenPixels)
    val (a, b) = (BmpCodec.decode(enc), BmpCodec.decode(golden))
    assert(a != null && b != null)
    (0 until 8).foreach(i => assert(a.get(i, BmpCodec.schema.fields(i).dataType) ===
      b.get(i, BmpCodec.schema.fields(i).dataType), s"field $i diverged"))
  }

  test("orientation-blind logical decode: top-down (negative height) equals bottom-up, moment included") {
    val px = Array.tabulate(5 * 3)(i => ((i * 37) % 256) << 16 | ((i * 11) % 256) << 8 | (i % 256))
    val up = BmpCodec.decode(BmpCodec.encode(5, 3, px, topDown = false))
    val down = BmpCodec.decode(BmpCodec.encode(5, 3, px, topDown = true))
    assert(up != null && down != null)
    (0 until 8).foreach(i => assert(up.get(i, BmpCodec.schema.fields(i).dataType) ===
      down.get(i, BmpCodec.schema.fields(i).dataType),
      s"field $i depends on storage orientation"))
    assert(up.getLong(7) !== 0L, "moment must be order-sensitive, not trivially zero")
  }

  test("pixel offset FIELD is honored: a header-to-pixels gap must not shift the parse") {
    val gapped = BmpCodec.decode(BmpCodec.encode(2, 2, goldenPixels, gap = 6))
    val plain = BmpCodec.decode(golden)
    (0 until 8).foreach(i => assert(gapped.get(i, BmpCodec.schema.fields(i).dataType) ===
      plain.get(i, BmpCodec.schema.fields(i).dataType),
      s"field $i shifted by the pixel-data gap (fixed-54 assumption?)"))
  }

  test("malformed inputs decode to NULL, never throw") {
    assert(BmpCodec.decode(null) === null)
    assert(BmpCodec.decode(Array.emptyByteArray) === null)
    assert(BmpCodec.decode("PNGnotbmp".getBytes("US-ASCII")) === null)
    assert(BmpCodec.decode(golden.take(40)) === null)
    // 8-bpp rejected (palette formats are a different decoder)
    val pal = golden.clone(); pal(28) = 8
    assert(BmpCodec.decode(pal) === null)
    // compressed rejected
    val rle = golden.clone(); rle(30) = 1
    assert(BmpCodec.decode(rle) === null)
    // lying pixel offset pointing past the buffer must not read OOB
    val lying = golden.clone(); lying(10) = 60
    assert(BmpCodec.decode(lying) === null)
    // lying width blowing past the buffer must not read OOB
    val wide = golden.clone(); wide(19) = 0x7f.toByte
    assert(BmpCodec.decode(wide) === null)
    // Long-overflow pair: width=0x7FFFFFFF with |height|≈1.5e9 makes
    // rowSize·height wrap NEGATIVE in Long, which would sail past a
    // naive sum-bounds check and index out of bounds
    val huge = golden.clone()
    huge(18) = 0xff.toByte; huge(19) = 0xff.toByte
    huge(20) = 0xff.toByte; huge(21) = 0x7f.toByte // width = Int.MaxValue
    huge(22) = 0x00; huge(23) = 0x00.toByte
    huge(24) = 0x68.toByte; huge(25) = 0x59.toByte // height = 1,500,512,256
    assert(BmpCodec.decode(huge) === null)
    val hugeDown = huge.clone(); hugeDown(25) = (hugeDown(25) | 0x80).toByte // negative height
    assert(BmpCodec.decode(hugeDown) === null)
  }

  test("bmp_decode is SQL-callable and null-propagating") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, BmpCodec.encode(2, 2, goldenPixels)),
      (2L, "garbage".getBytes("US-ASCII")),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "bmp")
    val got = df.selectExpr("id", "bmp_decode(bmp) AS m")
      .selectExpr("id", "m.width", "m.r_sum", "m.lum_moment")
      .orderBy("id").collect()
    assert(got(0).getInt(1) === 2 && got(0).getLong(2) === 265L &&
      got(0).getLong(3) === 262275L)
    assert(got(1).isNullAt(1), "garbage must decode to null, not fail the query")
    assert(got(2).isNullAt(1), "null input propagates null")
  }
}
