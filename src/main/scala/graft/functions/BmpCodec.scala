package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** BMP binary codec — the image half of the engine's multimodal decode
  * (the audio half is [[WavCodec]]): `bmp_decode(blob)` parses a real
  * Windows bitmap container (BITMAPFILEHEADER, BITMAPINFOHEADER,
  * 24-bit BGR pixel rows with 4-byte padding) into typed header fields
  * plus integer pixel statistics. Same byte-dissection discipline as
  * the reference's wire decoder (`sources/wal/decoder.py:91-127`)
  * applied to a public media format.
  *
  * Decode semantics that real-world BMPs force:
  *  - pixel data starts at the OFFSET FIELD in the file header, not at
  *    byte 54 — gaps/palettes between headers and pixels are legal and
  *    common, so the encoder deliberately emits some;
  *  - a NEGATIVE height means TOP-DOWN row order (the bottom-up
  *    default is inverted); decode normalizes both to logical
  *    top-left row-major indexing, so the caller never sees storage
  *    orientation. The `lum_moment` statistic (Σ index·luminance) is
  *    order-SENSITIVE precisely so a row-order bug cannot hide behind
  *    order-invariant channel sums;
  *  - rows pad to 4-byte boundaries; only 24-bpp uncompressed is
  *    accepted (anything else → NULL, never an exception — malformed
  *    media must not kill a 100 TB scan).
  *
  * All statistics are pure integer aggregates (channel sums, max
  * pixel luminance ×1000 undivided, index-weighted moment), exactly
  * portable to any SQL oracle with no float rounding surface.
  */
object BmpCodec {

  /** Serialize `pixels` (logical top-left row-major 0xRRGGBB ints) as
    * a 24-bpp BMP. `topDown = true` stores a negative height with rows
    * in logical order; `false` stores the bottom-up default. `gap`
    * inserts that many bytes between the headers and the pixel array
    * (reflected in the offset field) so any consumer hard-coding
    * offset 54 breaks loudly in tests.
    */
  def encode(width: Int, height: Int, pixels: Array[Int],
      topDown: Boolean = false, gap: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      "pixels must hold width*height values")
    require(gap >= 0)
    val rowSize = (3 * width + 3) & ~3
    val pixelOff = 14 + 40 + gap
    val fileSize = pixelOff + rowSize * height
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(pixelOff)
    buf.putInt(40).putInt(width).putInt(if (topDown) -height else height)
      .putShort(1) // planes
      .putShort(24) // bpp
      .putInt(0) // BI_RGB, uncompressed
      .putInt(rowSize * height)
      .putInt(2835).putInt(2835) // 72 DPI in px/metre
      .putInt(0).putInt(0) // palette sizes
    (0 until gap).foreach(_ => buf.put(0xEE.toByte)) // junk, must be skipped
    val storageRows = if (topDown) 0 until height else (height - 1) to 0 by -1
    storageRows.foreach { y =>
      (0 until width).foreach { x =>
        val p = pixels(y * width + x)
        buf.put((p & 0xff).toByte) // B
          .put(((p >> 8) & 0xff).toByte) // G
          .put(((p >> 16) & 0xff).toByte) // R
      }
      (3 * width until rowSize).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  /** Result row; luminance is the exact integer 299·R + 587·G + 114·B
    * (the ITU-R BT.601 weights ×1000, undivided). `lum_moment` weights
    * each pixel's luminance by its LOGICAL top-left row-major index.
    */
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bpp", IntegerType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("b_sum", LongType, nullable = false),
    StructField("max_lum", LongType, nullable = false),
    StructField("lum_moment", LongType, nullable = false)))

  private def u16le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  /** Static decode entry point (also the codegen call target). */
  def decode(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 54) return null
    if (b(0) != 'B'.toByte || b(1) != 'M'.toByte) return null
    val pixelOff = i32le(b, 10)
    val dibSize = i32le(b, 14)
    if (dibSize < 40) return null // BITMAPCOREHEADER et al: not supported
    val width = i32le(b, 18)
    val rawHeight = i32le(b, 22)
    val topDown = rawHeight < 0
    // abs in Long: abs(Int.MinValue) stays negative in Int
    val heightL = math.abs(rawHeight.toLong)
    val planes = u16le(b, 26)
    val bpp = u16le(b, 28)
    val compression = i32le(b, 30)
    if (width <= 0 || heightL <= 0 || planes != 1 || bpp != 24 || compression != 0)
      return null
    // row size in LONG: 3*width overflows Int for hostile widths, and a
    // wrapped-negative row size would defeat the bounds check below.
    // Each factor must ALSO be individually bounded by the buffer
    // before multiplying — rowSizeL·heightL itself wraps Long for
    // width·height ≳ 3e18 (a crafted 60-byte header can claim that)
    val rowSizeL = (3L * width + 3L) & ~3L
    if (rowSizeL > b.length || heightL > b.length) return null
    if (pixelOff < 54 || pixelOff.toLong + rowSizeL * heightL > b.length)
      return null // lying offset/dims must not read OOB
    val rowSize = rowSizeL.toInt // fits: bounded by b.length above
    val height = heightL.toInt
    var rs = 0L; var gs = 0L; var bs = 0L; var maxLum = 0L; var moment = 0L
    var ly = 0
    while (ly < height) {
      // logical row ly lives at storage row ly (top-down) or
      // height-1-ly (bottom-up)
      val sy = if (topDown) ly else height - 1 - ly
      val rowOff = pixelOff + sy * rowSize
      var x = 0
      while (x < width) {
        val p = rowOff + 3 * x
        val bb = b(p) & 0xff
        val gg = b(p + 1) & 0xff
        val rr = b(p + 2) & 0xff
        rs += rr; gs += gg; bs += bb
        val lum = 299L * rr + 587L * gg + 114L * bb
        if (lum > maxLum) maxLum = lum
        moment += (ly.toLong * width + x) * lum
        x += 1
      }
      ly += 1
    }
    new GenericInternalRow(Array[Any](
      width, height, bpp, rs, gs, bs, maxLum, moment))
  }
}

/** `bmp_decode(binary)` — see [[BmpCodec]]. */
case class BmpDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bmp_decode requires binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = BmpCodec.schema
  override def nullable: Boolean = true // malformed bytes decode to null
  override def prettyName: String = "bmp_decode"

  override protected def nullSafeEval(input: Any): Any =
    BmpCodec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.functions.BmpCodec.decode($b);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpDecode =
    copy(child = newChild)
}
