package graft.llm

import graft.SparkSpec

/** The distributed halves of the multistream slicing layer (round 14):
  * [[Wiki.indexSlices]] over index blobs and [[Wiki.slicePagesFs]]
  * doing REAL Hadoop ranged reads against an on-disk dump file — the
  * 100 TB ingest form, where one dump file becomes one task per slice
  * and never materializes whole. */
class WikiSliceSparkSpec extends SparkSpec {

  private val pages = (0 until 9).map(i =>
    (s"Pg $i", 0, 500L + i, "", s"text $i word"))

  test("indexSlices: slim slice rows with real offsets and index counts") {
    import spark.implicits._
    val (dumpB, indexB) = Wiki.syntheticMultistreamIndexed(pages, 4)
    val src = Seq(Wiki.WikiIndexSrc(1L, indexB, dumpB.length.toLong)).toDS()
    val slices = Wiki.indexSlices(src).collect().sortBy(_.slice_idx)
    assert(slices.length === 4)
    assert(slices.map(_.n_pages).sum === 9L)
    // page i → stream i*4/9: chunks 3,2,2,2; first ids 500,503,505,507
    assert(slices.map(_.n_pages).toSeq === Seq(3L, 2L, 2L, 2L))
    assert(slices.map(_.first_page_id).toSeq === Seq(500L, 503L, 505L, 507L))
    // ranges tile the page-stream region without overlap
    slices.sliding(2).foreach { case Array(a, b) =>
      assert(a.offset + a.length === b.offset)
    }
    assert(slices.last.offset + slices.last.length === dumpB.length.toLong)
  }

  test("slicePagesFs: ranged reads off a real file reassemble the dump") {
    import spark.implicits._
    val (dumpB, indexB) = Wiki.syntheticMultistreamIndexed(pages, 4)
    val f = java.io.File.createTempFile("graft-wiki-ms", ".xml.bz2")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, dumpB)
    val path = f.getAbsolutePath
    val src = Seq(Wiki.WikiIndexSrc(7L, indexB, dumpB.length.toLong)).toDS()
    val slices = Wiki.indexSlices(src).map(s => (s, path))
      .repartition(4) // one task per slice: the parallelism dial is real
    val got = Wiki.slicePagesFs(slices).collect().sortBy(_.page_id)
    assert(got.length === 9)
    assert(got.map(_.page_id).toSeq === (500L to 508L))
    assert(got.forall(_.doc_id === 7L))
    assert(got.map(_.title).toSeq === pages.map(_._1))
    assert(got.map(_.text).toSeq === pages.map(_._5))
    // a slice pointing at a missing file skips, never fails the task
    val bad = Wiki.indexSlices(src).map(s => (s, path + ".gone"))
    assert(Wiki.slicePagesFs(bad).count() === 0L)
    f.delete()
  }
}
