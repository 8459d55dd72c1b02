package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** NumPy `.npy` (format v1.0) interchange for the float32 embedding
  * artifacts the reference pipeline caches (`indexer_input/{id}.npy`,
  * little-endian `<f4` — fixture
  * `tests/fixtures/pipeline_in/indexer_input/TESTCCLW.executive.1.1.npy`).
  *
  * Only the subset the pipeline produces is supported: C-order arrays of
  * `<f4` (1-D or 2-D). That keeps the parser dependency-free and the
  * writer byte-compatible with `numpy.save`.
  */
object Npy {

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  case class Header(shape: Seq[Int], fortranOrder: Boolean)

  /** Parse the v1.0 header; returns (header, data offset). */
  def readHeader(bytes: Array[Byte]): (Header, Int) = {
    require(bytes.length >= 10 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not an NPY file")
    val major = bytes(6)
    require(major == 1, s"unsupported NPY version $major")
    val headerLen =
      ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    val header = new String(bytes, 10, headerLen, StandardCharsets.ISO_8859_1)
    require(header.contains("'<f4'") || header.contains("\"<f4\""),
      s"unsupported dtype in header: $header")
    val fortran = header.contains("'fortran_order': True")
    val shapeStr = header.substring(header.indexOf("'shape':"))
    val inner = shapeStr.substring(shapeStr.indexOf('(') + 1,
      shapeStr.indexOf(')'))
    val shape = inner.split(',').map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    (Header(shape, fortran), 10 + headerLen)
  }

  /** Read a C-order `<f4` npy blob into a flat float array + its shape.
    * Fortran-order blobs are rejected (consumers slice rows out assuming
    * row-major layout; silently returning column-major data would
    * scramble embeddings).
    */
  def read(bytes: Array[Byte]): (Array[Float], Seq[Int]) = {
    val (h, off) = readHeader(bytes)
    require(!h.fortranOrder, "fortran-order npy arrays are not supported")
    val buf = ByteBuffer.wrap(bytes, off, bytes.length - off)
      .order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](if (h.shape.isEmpty) 1 else h.shape.product)
    var i = 0
    while (i < out.length) { out(i) = buf.getFloat(); i += 1 }
    (out, h.shape)
  }

  /** Write a float array as a v1.0 `<f4` C-order npy blob (numpy.save
    * compatible: header padded with spaces to 64-byte alignment, ends \n).
    */
  def write(data: Array[Float], shape: Seq[Int]): Array[Byte] = {
    require(shape.product == data.length, "shape/product mismatch")
    val shapeTxt = shape match {
      case Seq(n) => s"($n,)"
      case s => s.mkString("(", ", ", ")")
    }
    var header = s"{'descr': '<f4', 'fortran_order': False, 'shape': $shapeTxt, }"
    val unpadded = Magic.length + 4 + header.length + 1
    val pad = (64 - unpadded % 64) % 64
    header = header + (" " * pad) + "\n"
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.write(Magic)
    d.writeByte(1); d.writeByte(0)
    d.writeByte(header.length & 0xff)
    d.writeByte((header.length >> 8) & 0xff)
    d.write(header.getBytes(StandardCharsets.ISO_8859_1))
    val buf = ByteBuffer.allocate(data.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(buf.putFloat)
    d.write(buf.array())
    out.toByteArray
  }
}
