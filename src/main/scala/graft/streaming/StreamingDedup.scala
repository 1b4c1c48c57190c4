package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Streaming exact dedup for corpus ingestion: emit the FIRST occurrence of
  * each content hash, drop re-arrivals. The batch `Dedup.exact` resolves a
  * finished corpus; this is its ingestion-time form — a crawler feed dedups
  * as it lands, before anything downstream pays for the duplicate.
  *
  * Built on `dropDuplicatesWithinWatermark`: state is keyed by sha2(text)
  * and evicted once the event-time watermark passes a key's last-seen time,
  * so state size is bounded by the duplicate-arrival horizon (`delay`) —
  * not by corpus size, which is what makes it viable on an unbounded
  * 100 TB/day feed. The contract is correspondingly bounded: a duplicate
  * arriving AFTER the watermark has evicted its key is re-emitted (at that
  * point it's indistinguishable from new content); the batch pass is the
  * backstop, the stream pass is the cheap 99% filter.
  *
  * State is hash-partitioned by content hash across executors (RocksDB
  * state store in production); each micro-batch touches only the keys it
  * carries.
  */
object StreamingDedup {

  /** `df` must be a streaming DataFrame with an event-time column `tsCol`.
    * `delay` is the watermark expression, e.g. "10 seconds". */
  def firstSeen(df: DataFrame, textCol: String, tsCol: String, delay: String): DataFrame =
    df.withColumn("__content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")

  /** Streaming NEAR-dup suppression — the ingestion-time twin of the batch
    * `Dedup.minhashPairs`: a document is emitted only if NONE of its LSH
    * band buckets has been claimed within the watermark horizon. Shares the
    * batch signature kernel ([[graft.llm.Dedup.shinglesAndSignature]]) and
    * band hashing (xxhash64 over signature slices), so stream and batch
    * bucket identically.
    *
    * Shape: each doc fans out to `bands` slim band-key rows;
    * `dropDuplicatesWithinWatermark(band, bh)` keeps only FIRST-claimed
    * buckets (state keyed by band key, evicted at the horizon — bounded by
    * arrival rate × horizon, never corpus size); a windowed per-doc count
    * then re-admits exactly the docs that kept ALL their bands. Two
    * stateful operators chained in append mode — the window is the same
    * `delay` duration, so rows emit once the watermark passes their
    * window (bounded additional latency, the price of the cross-batch
    * claim check).
    *
    * Contract notes, all inherent to streaming LSH: (1) a suppressed
    * doc's NOVEL buckets stay claimed by it (partial registration — the
    * standard first-wins chaining behavior); (2) like `firstSeen`, a
    * near-dup arriving after eviction re-emits; the batch pass is the
    * backstop; (3) near-dups arriving in the SAME micro-batch are
    * arbitrated deterministically ([[batchLocalFirstClaim]]): the minimum
    * event-time doc wins every bucket it is first to and is emitted —
    * without the arbitration step the per-bucket winner is arbitrary and
    * two same-batch near-dups could split claims and BOTH vanish. */
  def nearDupFirstSeen(df: DataFrame, textCol: String, tsCol: String, delay: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rowsPerBand = numHashes / bands
    val tIdx = df.schema.fieldIndex(textCol)
    val sigSchema = df.schema.add("__sig", ArrayType(LongType), nullable = false)
    val withSig = df.mapPartitions { rows =>
      rows.map { row =>
        val (_, sig) = graft.llm.Dedup.shinglesAndSignature(
          row.getString(tIdx), k, numHashes)
        Row.fromSeq(row.toSeq :+ sig.toSeq)
      }
    }(Encoders.row(sigSchema))
    val banded = withSig
      .select(col("*"), explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> struct(b AS band, xxhash64(slice(__sig, b * $rowsPerBand + 1, $rowsPerBand)) AS bh))""".stripMargin))
        .as("__bk"))
      .select(df.columns.map(col) :+ col("__bk.band").as("band") :+ col("__bk.bh").as("bh"): _*)
    claimAllBands(banded, df.columns, tsCol, delay, bands)
  }

  /** SimHash variant of [[nearDupFirstSeen]]: band keys are the four
    * 16-bit slices of the 64-bit fingerprint (same kernel and banding as
    * the batch `Dedup.simhashPairs`, so the stream suppresses exactly the
    * docs the batch pass pairs at band granularity). The pigeonhole
    * guarantee carries over: a doc within Hamming ≤ 3 of an in-horizon
    * predecessor shares at least one band and is suppressed. 65k bucket
    * values per band — a real key space, unlike the 16-bit hyperplane
    * embedding signature, which is why THIS is the second streaming
    * variant. */
  def nearDupFirstSeenSimhash(df: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame = {
    val tIdx = df.schema.fieldIndex(textCol)
    val shSchema = df.schema.add("__simhash", LongType, nullable = false)
    val withSh = df.mapPartitions { rows =>
      rows.map(row => Row.fromSeq(row.toSeq :+ graft.llm.Dedup.simhashOf(row.getString(tIdx))))
    }(Encoders.row(shSchema))
    val banded = withSh
      .select(col("*"), explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, (shiftright(__simhash, b * 16) & 65535) AS bh))"))
        .as("__bk"))
      .select(df.columns.map(col) :+ col("__bk.band").as("band") :+ col("__bk.bh").as("bh"): _*)
    claimAllBands(banded, df.columns, tsCol, delay, bands = 4)
  }

  /** Streaming IMAGE near-dup first-seen — the ingestion-time twin of the
    * batch [[graft.llm.Multimodal.imageNearDupPairs]]: each record's
    * binary media decodes to the perceptual dHash (same pixel kernels —
    * 24-bpp BMP / binary PNM — and the same integer 9×8 box-average
    * fingerprint, so stream and batch hash identically) and claims the
    * four 16-bit bands of the hash; a record is emitted only if it keeps
    * ALL four. The pigeonhole contract matches the SimHash twin: an image
    * within Hamming ≤ 3 of an in-horizon predecessor shares a band and is
    * suppressed; band-granularity false suppression beyond 3 bits is the
    * documented LSH trade, with the exact batch operator as backstop.
    *
    * UNDECODABLE media (codec formats, corrupt scrapes) pass through
    * unsuppressed — mirroring the batch operator pairing them with
    * nothing; a shared "undecodable" bucket would suppress every corrupt
    * scrape after the first. State: 4 claimed band keys per admitted
    * image, evicted at the horizon. */
  def imageNearDupFirstSeen(df: DataFrame, mediaCol: String, tsCol: String,
      delay: String): DataFrame =
    bandedMediaFirstSeen(df, mediaCol, tsCol, delay)(graft.llm.Multimodal.imageHashOf)

  /** Streaming AUDIO near-dup first-seen — the ingestion-time twin of
    * [[graft.llm.Multimodal.audioNearDupPairs]], on the identical
    * contract as [[imageNearDupFirstSeen]]: the 16-bit-PCM envelope hash
    * (same shared kernel as the batch operator) claims its four 16-bit
    * bands; non-PCM or too-short audio passes through. */
  def audioNearDupFirstSeen(df: DataFrame, mediaCol: String, tsCol: String,
      delay: String): DataFrame =
    bandedMediaFirstSeen(df, mediaCol, tsCol, delay)(graft.llm.Multimodal.audioHashOf)

  /** Streaming VIDEO near-dup first-seen — the ingestion-time twin of
    * [[graft.llm.Multimodal.videoNearDupPairs]]: each record's sampled
    * frame hashes (same shared kernel, same evenly-spaced sampling)
    * claim within the horizon; a video is SUPPRESSED when `minShared` or
    * more of its frame hashes were already claimed — the batch
    * shared-frames threshold read as a streaming admission test. Keeps
    * the family contracts: undecodable media passes through, same-batch
    * arrivals arbitrate to the min event-time record, a re-arrival past
    * eviction re-emits. One conservative asymmetry, inherent to counting
    * SURVIVING claim rows: a short video (fewer sampled hashes than
    * `minShared`) whose EVERY hash is already claimed leaves no row to
    * count and is suppressed even though the batch join could never pair
    * it — the exact batch operator is the backstop, as everywhere in
    * this family. A second, related asymmetry: claims are counted
    * WITHOUT regard to WHICH predecessor holds them — a video sharing
    * e.g. 4 frames with each of two different earlier videos (8 claimed
    * total, `minShared` = 8) is suppressed although the batch pair join
    * would pair it with neither. That is deliberate: the admission test
    * asks "how much of this video's content has the horizon already
    * seen", which is the right ingestion-time question (a stitched-
    * from-known-clips compilation IS near-duplicate content); carrying
    * a claimant id per band to get per-predecessor counts would
    * multiply state for a semantics the batch backstop already
    * provides exactly. */
  def videoNearDupFirstSeen(df: DataFrame, mediaCol: String, tsCol: String,
      delay: String, sampleFrames: Int = 16, minShared: Int = 8): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    val mIdx = df.schema.fieldIndex(mediaCol)
    val vSchema = df.schema.add("__vh", ArrayType(LongType), nullable = false)
    val withV = df.mapPartitions { rows =>
      rows.map { row =>
        val m = row.get(mIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ graft.llm.Multimodal.videoHashesOf(m, sampleFrames))
      }
    }(Encoders.row(vSchema))
    val undecodable = withV.filter(size(col("__vh")) === 0).select(df.columns.map(col): _*)
    val claimed = withV.filter(size(col("__vh")) > 0)
      .select(col("*"), size(col("__vh")).as("__nv"))
      .select(df.columns.map(col) :+ col("__nv") :+ explode(col("__vh")).as("__v"): _*)
    claimAll(claimed, df.columns, tsCol, delay, col("__nv"),
        minKept = greatest(col("__nv") - (minShared - 1), lit(1)))
      .unionByName(undecodable)
  }

  /** Shared single-64-bit-fingerprint streaming twin: hash the binary
    * media column with `hashOf` (a shared batch/stream kernel from
    * [[graft.llm.Multimodal]]), claim the hash's four 16-bit bands, emit
    * only records keeping all four; unhashable media passes through
    * unsuppressed (a shared "undecodable" bucket would suppress every
    * corrupt scrape after the first). */
  private def bandedMediaFirstSeen(df: DataFrame, mediaCol: String, tsCol: String,
      delay: String)(hashOf: Array[Byte] => Option[Long]): DataFrame = {
    val mIdx = df.schema.fieldIndex(mediaCol)
    val hSchema = df.schema.add("__ih", LongType, nullable = true)
    val withH = df.mapPartitions { rows =>
      rows.map { row =>
        val m = row.get(mIdx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ hashOf(m).map(Long.box).orNull)
      }
    }(Encoders.row(hSchema))
    val undecodable = withH.filter(col("__ih").isNull).select(df.columns.map(col): _*)
    val banded = withH.filter(col("__ih").isNotNull)
      .select(col("*"), explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, (shiftright(__ih, b * 16) & 65535) AS bh))"))
        .as("__bk"))
      .select(df.columns.map(col) :+ col("__bk.band").as("band") :+ col("__bk.bh").as("bh"): _*)
    claimAllBands(banded, df.columns, tsCol, delay, bands = 4)
      .unionByName(undecodable)
  }

  /** Streaming fuzzy (edit-distance) first-seen dedup — the ingestion-time
    * twin of the batch [[graft.llm.Fuzzy.editDistanceJoinShort]]: a record
    * is emitted only if NONE of its deletion-neighborhood variant hashes
    * (the same [[graft.llm.Fuzzy.deletionVariants]] keys the batch path
    * joins on) has been claimed within the watermark horizon. The use is
    * the same as the batch op's — typo'd entity keys, near-identical
    * titles — arriving on an unbounded feed.
    *
    * Suppression contract (one-sided, like the LSH twins): any record
    * within edit distance ≤ maxDist of an in-horizon predecessor SHARES a
    * variant (the FastSS pigeonhole — completeness direction of the batch
    * proof) and is therefore suppressed — no false negatives inside the
    * horizon. The converse is approximate: sharing a variant only bounds
    * the distance by 2·maxDist, and the claim check has no string at hand
    * to levenshtein-verify against (state stores only the 64-bit key), so
    * records between d and 2d of a predecessor may also be suppressed —
    * the streaming pass is the cheap admission filter, the batch join is
    * the exact backstop, same division of labor as [[nearDupFirstSeen]].
    *
    * State: one key per claimed variant hash — ~(len+1) longs per admitted
    * record at d=1 — evicted at the horizon, bounded by arrival rate ×
    * horizon, never corpus size. Null strings generate no variants and
    * pass through unsuppressed (they cannot be near-anything under SQL
    * comparison semantics; silently dropping them would turn a schema
    * problem into missing data).
    *
    * Same-batch arrivals are arbitrated deterministically
    * ([[batchLocalFirstClaim]]): among near-duplicates landing in one
    * micro-batch, the minimum event-time record wins every variant it is
    * first to and IS emitted — the first arrival passes in event-time
    * order, batch boundaries notwithstanding. A suppressed record's
    * unshared variants remain claimed by it (partial registration), so
    * suppression can chain transitively past 2·maxDist across a dense
    * typo cluster — inherent to first-wins streaming; the exact batch
    * join is the backstop. */
  def fuzzyFirstSeen(df: DataFrame, strCol: String, tsCol: String,
      delay: String, maxDist: Int = 1): DataFrame = {
    val sIdx = df.schema.fieldIndex(strCol)
    val vSchema = df.schema.add("__vh", ArrayType(LongType), nullable = false)
    val withV = df.mapPartitions { rows =>
      rows.map { row =>
        val s = row.getString(sIdx)
        val vs: Seq[Long] =
          if (s == null) Seq.empty
          else scala.collection.immutable.ArraySeq.unsafeWrapArray(
            graft.llm.Fuzzy.deletionVariants(s, maxDist))
        Row.fromSeq(row.toSeq :+ vs)
      }
    }(Encoders.row(vSchema))
    val nulls = withV.filter(size(col("__vh")) === 0).select(df.columns.map(col): _*)
    val claimed = withV.filter(size(col("__vh")) > 0)
      .select(col("*"), size(col("__vh")).as("__nv"))
      .select(df.columns.map(col) :+ col("__nv") :+ explode(col("__vh")).as("__v"): _*)
    claimAll(claimed, df.columns, tsCol, delay, col("__nv"))
      .unionByName(nulls)
  }

  /** Stateless, batch-scoped claim arbitration — the same-batch
    * determinism fix (r9 advice): `dropDuplicatesWithinWatermark` picks an
    * ARBITRARY winner among rows of one micro-batch sharing a claim key,
    * so two near-duplicates arriving together could split their claims and
    * BOTH fail the keep-all re-admission — first-seen semantics emitting
    * zero rows. This pass co-locates each batch's claim-key rows
    * (repartition on the key) and keeps only the minimum-(event-time)
    * claimant per key, with a deterministic full-row tiebreak for equal
    * timestamps. Because the tiebreak compares the SAME non-key fields at
    * every key a record emits, one record wins consistently across all its
    * keys: the true (min event-time) first arrival keeps every claim it
    * is first to, and is emitted. Per-batch and stateless — memory is the
    * partition's slice of ONE micro-batch, never horizon-sized state. */
  private def batchLocalFirstClaim(exploded: DataFrame, tsCol: String,
      keyCols: Seq[String]): DataFrame = {
    val schema = exploded.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(tsCol)
    // any deterministic CONTENT-based total order works for the tie — the
    // point is only that the same record wins every one of its keys. Raw
    // binary fields must serialize by content: their default toString is
    // JVM object identity, which differs between the row INSTANCES the
    // same record's different key rows deserialize into — an
    // identity-based tiebreak could order A before B at one key and B
    // before A at another, resurrecting the claim split this pass exists
    // to prevent.
    def rowKey(r: Row): String = r.toSeq.map {
      case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
      case x => String.valueOf(x)
    }.mkString("\u0001")
    def lt(a: Row, b: Row): Boolean = {
      // event-time surfaces as java.sql.Timestamp (TIMESTAMP) or
      // java.time.LocalDateTime (TIMESTAMP_NTZ) — both Comparable, so
      // compare through the interface instead of assuming one class
      val c = a.get(tsIdx).asInstanceOf[Comparable[Any]].compareTo(b.get(tsIdx))
      if (c != 0) c < 0 else rowKey(a).compareTo(rowKey(b)) < 0
    }
    exploded.repartition(keyCols.map(col): _*).mapPartitions { rows =>
      val best = scala.collection.mutable.HashMap.empty[Seq[Any], Row]
      rows.foreach { r =>
        val k = keyIdx.map(r.get)
        val cur = best.get(k)
        if (cur.isEmpty || lt(r, cur.get)) best(k) = r
      }
      best.valuesIterator
    }(Encoders.row(schema))
  }

  /** Shared tail of the streaming near-dup variants: batch-locally
    * arbitrate claims ([[batchLocalFirstClaim]]), first-claim the
    * (band, bh) keys within the watermark horizon, then re-admit the docs
    * that kept ALL their bands. Grouping is on the window plus every
    * NON-event-time column: keeping tsCol itself as a key would leave two
    * event-time attributes downstream, which Spark rejects; all band rows
    * of a doc share one ts, so min() reconstructs it exactly. */
  private def claimAllBands(banded: DataFrame, carry: Seq[String], tsCol: String,
      delay: String, bands: Int): DataFrame = {
    val keys = carry.filterNot(_ == tsCol)
    batchLocalFirstClaim(banded, tsCol, Seq("band", "bh"))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("band", "bh")
      .groupBy(window(col(tsCol), delay) +: keys.map(col): _*)
      .agg(count(lit(1)).as("__kept"), min(col(tsCol)).as(tsCol))
      .filter(col("__kept") === bands)
      .select(carry.map(col): _*)
  }

  /** [[claimAllBands]] generalized to a per-record expected claim count
    * (variant sets vary in size with string length, unlike the fixed band
    * count): `expected` must be constant across a record's exploded rows
    * and is carried through the grouping as a key. */
  private def claimAll(exploded: DataFrame, carry: Seq[String], tsCol: String,
      delay: String, expected: org.apache.spark.sql.Column,
      minKept: org.apache.spark.sql.Column = null): DataFrame = {
    val keys = carry.filterNot(_ == tsCol)
    // default admission = keep ALL claims (first-seen); a caller-supplied
    // minKept turns it into a threshold test (the video twin's
    // fewer-than-minShared-lost rule). A record losing EVERY claim has no
    // surviving row to count and is suppressed under any threshold.
    val admit = Option(minKept).getOrElse(expected)
    batchLocalFirstClaim(exploded, tsCol, Seq("__v"))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__v")
      .groupBy(window(col(tsCol), delay) +: expected +: keys.map(col): _*)
      .agg(count(lit(1)).as("__kept"), min(col(tsCol)).as(tsCol))
      .filter(col("__kept") >= admit)
      .select(carry.map(col): _*)
  }
}
