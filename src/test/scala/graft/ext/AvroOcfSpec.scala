package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.AvroOcf]] — the q228 from-scratch OCF reader. The
  * load-bearing pin is LIBRARY PARITY: every golden is written by the
  * real Avro library and read back by both the library's
  * DataFileReader and the from-scratch walk — field-for-field
  * equality, under both codecs and across forced block boundaries.
  * Profile violations fail closed; mutation/truncation fuzz never
  * throws.
  */
class AvroOcfSpec extends AnyFunSuite {

  private val schemaJson =
    """{"type":"record","name":"t","fields":[""" +
      """{"name":"id","type":"long"},""" +
      """{"name":"body","type":"string"},""" +
      """{"name":"flag","type":"boolean"},""" +
      """{"name":"score","type":"double"}]}"""

  private def write(deflate: Boolean, syncEvery: Int,
                    rows: Seq[(Long, String, Boolean, Double)])
      : Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val out = new java.io.ByteArrayOutputStream
    val fw = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    if (deflate)
      fw.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    fw.create(schema, out)
    rows.zipWithIndex.foreach { case ((id, body, flag, score), i) =>
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("id", id); r.put("body", body)
      r.put("flag", flag); r.put("score", score)
      fw.append(r)
      if (syncEvery > 0 && i % syncEvery == syncEvery - 1) fw.sync()
    }
    fw.close()
    out.toByteArray
  }

  private def libraryRead(b: Array[Byte])
      : Seq[(Long, String, Boolean, Double)] = {
    val rd = new org.apache.avro.file.DataFileReader(
      new org.apache.avro.file.SeekableByteArrayInput(b),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val out = Vector.newBuilder[(Long, String, Boolean, Double)]
    while (rd.hasNext) {
      val r = rd.next()
      out += ((r.get("id").asInstanceOf[Long],
        r.get("body").toString,
        r.get("flag").asInstanceOf[Boolean],
        r.get("score").asInstanceOf[Double]))
    }
    rd.close()
    out.result()
  }

  private val rows = (0 until 7).map(i =>
    (i * 1000L + 7, s"body-$i " + "z" * i, i % 2 == 0, i * 0.5 - 1.25))

  test("library parity, null codec: fields, records, and values agree " +
      "with DataFileReader bit-for-bit") {
    val b = write(deflate = false, syncEvery = 0, rows)
    val Some((fields, codec, nb, recs)) = AvroOcf.parse(b)
    assert(codec == "null" && nb == 1)
    assert(fields.map(_._1) == Seq("id", "body", "flag", "score"))
    val mine = recs.map(v => (v(0).asInstanceOf[Long],
      v(1).asInstanceOf[String], v(2).asInstanceOf[Boolean],
      v(3).asInstanceOf[Double]))
    assert(mine == libraryRead(b))
    assert(mine == rows)
  }

  test("library parity, deflate codec + forced block boundaries: " +
      "block count = ceil(n/2), records identical") {
    val b = write(deflate = true, syncEvery = 2, rows)
    val Some((_, codec, nb, recs)) = AvroOcf.parse(b)
    assert(codec == "deflate" && nb == 4) // 7 records, sync every 2
    val mine = recs.map(v => (v(0).asInstanceOf[Long],
      v(1).asInstanceOf[String], v(2).asInstanceOf[Boolean],
      v(3).asInstanceOf[Double]))
    assert(mine == libraryRead(b))
  }

  test("schema profile: unions, nesting, arrays, logical types all " +
      "rejected; flat primitives accepted") {
    assert(AvroOcf.parseSchema(schemaJson).exists(_.length == 4))
    // union field
    assert(AvroOcf.parseSchema(
      """{"type":"record","name":"t","fields":[""" +
        """{"name":"x","type":["null","string"]}]}""").isEmpty)
    // nested record
    assert(AvroOcf.parseSchema(
      """{"type":"record","name":"t","fields":[""" +
        """{"name":"x","type":{"type":"record","name":"u","fields":[]}}]}""")
      .isEmpty)
    // unsupported primitive
    assert(AvroOcf.parseSchema(
      """{"type":"record","name":"t","fields":[""" +
        """{"name":"x","type":"bytes"}]}""").isEmpty)
    // not a record / no fields
    assert(AvroOcf.parseSchema(""""string"""").isEmpty)
    assert(AvroOcf.parseSchema(
      """{"type":"record","name":"t","fields":[]}""").isEmpty)
  }

  test("structural defects fail closed: corrupt sync, trailing " +
      "garbage, truncation, wrong magic") {
    val b = write(deflate = false, syncEvery = 2, rows)
    // corrupt the FINAL sync marker (last 16 bytes)
    val badSync = b.clone()
    badSync(b.length - 3) = (badSync(b.length - 3) ^ 1).toByte
    assert(AvroOcf.parse(badSync).isEmpty)
    // trailing garbage after the last block
    assert(AvroOcf.parse(b ++ "junk".getBytes("UTF-8")).isEmpty)
    // wrong magic
    val badMagic = b.clone(); badMagic(0) = 'X'
    assert(AvroOcf.parse(badMagic).isEmpty)
    // empty / null
    assert(AvroOcf.parse(Array.emptyByteArray).isEmpty)
    assert(AvroOcf.parse(null).isEmpty)
  }

  test("fuzz: single-byte mutations and truncation at every byte " +
      "never throw") {
    val b = write(deflate = true, syncEvery = 2, rows.take(3))
    val rnd = new scala.util.Random(228)
    (0 until 300).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      AvroOcf.parse(m)
    }
    (0 until b.length).foreach { n =>
      AvroOcf.parse(java.util.Arrays.copyOf(b, n))
    }
  }
}
