package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Archive ingestion (round 13): tar / WebDataset / zip. Pins the
  * query fixtures' closed forms across an id sweep, gzip transparency,
  * the checksum + offset discipline, the WebDataset adjacency-grouping
  * contract, the zip reader against BOTH JDK sides (our reader over
  * ZipOutputStream archives; JDK ZipInputStream over the same bytes
  * agrees), and the corrupt-input prefix posture everywhere. */
class ArchiveSpec extends AnyFunSuite {

  // the q_tar_entries fixture, verbatim
  private def tarMembers(id: Long): Seq[(String, Char, Array[Byte])] = {
    val nF = (2 + id % 4).toInt
    val members = Seq.newBuilder[(String, Char, Array[Byte])]
    if (id % 3 == 0) members += ((s"d$id/", '5', Array.emptyByteArray))
    if (id % 5 == 0) members += (("pax", 'x',
      Array.tabulate[Byte]((17 + id % 9).toInt)(j => ('p' + j % 11).toByte)))
    (0 until nF).foreach { i =>
      val size = (20 + (id + 3 * i) % 40).toInt
      val prefix = s"c$id-$i-"
      members += ((s"d$id/f${id}_$i.txt", '0',
        (prefix + "a" * (size - prefix.length)).getBytes("UTF-8")))
    }
    members.result()
  }

  test("tar: fields, offsets, and checksum discipline across the id sweep; gzip invisible") {
    for (id <- 0L until 120L) {
      val plain = Archives.parseTar(Archives.syntheticTar(tarMembers(id), gzipped = false))
      val gz = Archives.parseTar(Archives.syntheticTar(tarMembers(id), gzipped = true))
      assert(plain == gz, s"gzip shard must parse identically at id=$id")
      val nF = (2 + id % 4).toInt
      val hasDir = id % 3 == 0
      val hasPax = id % 5 == 0
      assert(plain.length == nF + (if (hasDir) 1 else 0),
        s"pax members must not become rows at id=$id")
      if (hasDir) {
        val d = plain.head
        assert(d.entry_idx == 0 && d.name == s"d$id/" && d.type_flag == "5" &&
          d.size == 0 && d.data_offset == 512 && d.content == null, s"dir row at id=$id")
      }
      plain.filter(_.type_flag == "0").zipWithIndex.foreach { case (e, i) =>
        val size = (20 + (id + 3 * i) % 40).toInt
        val prefix = s"c$id-$i-"
        assert(e.entry_idx == i + (if (hasDir) 1 else 0), s"idx at id=$id i=$i")
        assert(e.name == s"d$id/f${id}_$i.txt" && e.size == size, s"name/size at id=$id i=$i")
        assert(e.data_offset == (if (hasDir) 512 else 0) + (if (hasPax) 1024 else 0) +
          i * 1024 + 512, s"offset accounting (pax header skipped BY SIZE) at id=$id i=$i")
        assert(e.content == prefix + "a" * (size - prefix.length), s"content at id=$id i=$i")
      }
    }
  }

  test("tar: corrupt checksums, truncation, and garbage follow the prefix rule") {
    val good = Archives.syntheticTar(tarMembers(7L), gzipped = false)
    assert(Archives.parseTar(null).isEmpty)
    assert(Archives.parseTar(new Array[Byte](600)).isEmpty, "zero block = empty archive")
    // flip a payload byte INSIDE the first file: its header checksum
    // does not cover data, so rows survive; flip a HEADER byte: the
    // checksum trips and the walk stops at that member
    val full = Archives.parseTar(good)
    val dataFlip = good.clone(); dataFlip(512 + 3) = 'Z'
    assert(Archives.parseTar(dataFlip).length == full.length, "data bytes are not checksummed")
    val hdrFlip = good.clone(); hdrFlip(3) = 'Z'
    assert(Archives.parseTar(hdrFlip).isEmpty, "first header checksum mismatch -> no rows")
    val laterFlip = good.clone(); laterFlip(1024 + 3) = 'Z' // second member's header
    val cutRows = Archives.parseTar(laterFlip)
    assert(cutRows.length == 1 && cutRows == full.take(1), "prefix survives a later bad header")
    for (c <- Seq(100, 511, 700, good.length - 50)) Archives.parseTar(good.take(c)) // no throw
  }

  // the q_webdataset_samples fixture, verbatim
  private def wdsMembers(id: Long): Seq[(String, Char, Array[Byte])] = {
    val nS = (2 + id % 3).toInt
    val members = Seq.newBuilder[(String, Char, Array[Byte])]
    if (id % 4 == 0) members += (("wds/", '5', Array.emptyByteArray))
    (0 until nS).foreach { k =>
      val key = s"s${id}_$k"
      members += ((s"$key.jpg", '0',
        Array.tabulate[Byte]((30 + (id + k) % 50).toInt)(j => ((j * 7 + k) % 256).toByte)))
      members += ((s"$key.txt", '0', s"cap $id $k".getBytes("UTF-8")))
      if ((id + k) % 2 == 0) members += ((s"$key.json", '0', "{}".getBytes("UTF-8")))
    }
    members.result()
  }

  test("webdataset: adjacency grouping, first-dot keys, multi-extension parts") {
    for (id <- 0L until 120L) {
      val samples = Archives.parseWds(
        Archives.syntheticTar(wdsMembers(id), gzipped = id % 3 == 1))
      val nS = (2 + id % 3).toInt
      assert(samples.length == nS, s"sample count at id=$id (dir entry must not group)")
      samples.zipWithIndex.foreach { case (s, k) =>
        assert(s.key == s"s${id}_$k", s"key at id=$id k=$k")
        assert(s.n_parts == (if ((id + k) % 2 == 0) 3 else 2), s"n_parts at id=$id k=$k")
        assert(new String(s.parts("txt"), "UTF-8") == s"cap $id $k", s"caption at id=$id k=$k")
        assert(s.parts("jpg").length == 30 + (id + k) % 50, s"jpg bytes at id=$id k=$k")
      }
    }
    // the first-dot rule: "a.seg.jpg" groups under "a" with part "seg.jpg"
    val multi = Archives.parseWds(Archives.syntheticTar(Seq(
      ("a.seg.jpg", '0', Array[Byte](1, 2)),
      ("a.txt", '0', "t".getBytes)), gzipped = false))
    assert(multi.length == 1 && multi.head.key == "a" &&
      multi.head.parts.keySet == Set("seg.jpg", "txt"), "first-dot key rule")
    // NON-adjacent same key = two samples (the format contract, not a bug)
    val split = Archives.parseWds(Archives.syntheticTar(Seq(
      ("x.txt", '0', "1".getBytes),
      ("y.txt", '0', "2".getBytes),
      ("x.jpg", '0', Array[Byte](3))), gzipped = false))
    assert(split.map(_.key) == Seq("x", "y", "x"), "adjacency is the grouping contract")
  }

  // the q_zip_entries fixture, verbatim
  private def zipEntriesFor(id: Long): Seq[(String, Array[Byte], Boolean)] =
    (0 until (2 + id % 3).toInt).map { i =>
      val size = (15 + (id + i) % 30).toInt
      val prefix = s"z$id-$i-"
      (s"e$id/$i.txt", (prefix + "b" * math.max(0, size - prefix.length)).getBytes("UTF-8"),
        (id + i) % 3 == 0)
    }

  test("zip: our central-directory reader agrees with the JDK writer AND reader") {
    for (id <- 0L until 120L) {
      val bytes = Archives.syntheticZip(zipEntriesFor(id))
      val got = Archives.parseZip(bytes)
      val exp = zipEntriesFor(id)
      assert(got.length == exp.length, s"entry count at id=$id")
      got.zip(exp).zipWithIndex.foreach { case ((g, (name, data, stored)), i) =>
        assert(g.entry_idx == i && g.name == name, s"name at id=$id i=$i")
        assert(g.method == (if (stored) 0 else 8), s"method at id=$id i=$i")
        assert(g.uncomp_len == data.length, s"uncomp_len at id=$id i=$i")
        assert(g.crc_ok, s"crc at id=$id i=$i")
        assert(g.content == new String(data, "UTF-8"), s"content at id=$id i=$i")
      }
      // the JDK's own reader over the same bytes sees the same members
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
      val jdk = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .map(_.getName).toList
      assert(jdk == got.map(_.name).toList, s"JDK reader agreement at id=$id")
    }
  }

  test("jsonl shards: all five codecs land on the plain walk") {
    val lines = (0 until 5).map(j => s"""{"id":$j,"t":"rec $j"}""")
    (0 to 4).foreach { c =>
      val b = Archives.syntheticJsonl(lines, c)
      val got = Archives.decompressAny(b).map(x =>
        new String(x, "UTF-8").split("\n", -1).filter(_.nonEmpty).toSeq)
      assert(got.contains(lines), s"codec $c")
    }
  }

  test("jsonl: multi-frame zstd, blank-line skip, CRLF, corrupt posture") {
    val lines = Seq("""{"a":1}""", "", """{"b":2}""")
    val zst = Archives.syntheticJsonl(lines, 2) // frame split at len/2 = 1
    val dec = new String(Archives.decompressAny(zst).get, "UTF-8")
    assert(dec == "{\"a\":1}\n\n{\"b\":2}\n")
    // CRLF lines strip their \r
    assert(Archives.decompressAny("{\"x\":1}\r\n{\"y\":2}\r\n".getBytes).isDefined)
    // truncations of every codec never throw; either None or a prefix
    (1 to 4).foreach { c =>
      val b = Archives.syntheticJsonl(lines, c)
      (1 until b.length by 3).foreach(k => Archives.decompressAny(b.take(k)))
    }
    // decompression bomb: a 100 MiB zero stream through gzip stops at the guard
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      val z = new Array[Byte](1 << 20)
      (0 until 100).foreach(_ => gz.write(z)); gz.close()
      bos.toByteArray
    }
    assert(Archives.decompressAny(bomb).isEmpty)
  }

  test("zip: corrupt directories and bodies degrade honestly") {
    val good = Archives.syntheticZip(zipEntriesFor(4L))
    assert(Archives.parseZip(null).isEmpty)
    assert(Archives.parseZip("PK no directory here".getBytes).isEmpty)
    for (c <- Seq(5, 21, good.length / 2, good.length - 3))
      Archives.parseZip(good.take(c)) // completing is the assertion
    // flip a byte inside the first DEFLATE body: that entry loses
    // content/crc, the directory walk still lists every member
    val full = Archives.parseZip(good)
    val victim = good.clone()
    // local header of entry 0 starts at 0; body of the first deflate
    // entry sits past its 30-byte header + name — flip mid-archive
    victim(40) = (victim(40) ^ 0x55).toByte
    val dam = Archives.parseZip(victim)
    assert(dam.length == full.length, "directory walk survives body damage")
    assert(dam.exists(e => !e.crc_ok || e.content == null) ||
      dam.map(_.content) != full.map(_.content), "damage is visible, never silent")
  }
}
