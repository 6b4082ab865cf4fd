package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Skew, TextAnalysis, Vectors}

/** Semantic tests of the dedup / text / skew operators on planted
  * synthetic corpora (temp parquet in the harness `documents` schema),
  * where ground truth is known by construction.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny corpus: 0/1 exact dups (after normalization), 2/3 heavy
    * overlap (near-dup), 4..9 unrelated. */
  private lazy val corpusDir: String = {
    val dir = Files.createTempDirectory("graft_docs").toString
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base.toUpperCase + "!!", "en", "src0", base.length.toLong + 2), // exact dup after normalize
      (2L, base + " extra tail words here", "en", "src1", 80L),            // near dup of 0
      (3L, "the quick brown fox jumps over the lazy dog again and again yesterday", "en", "src1", 70L),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src2", 50L),
      (5L, "one two three four five six seven eight nine ten eleven", "en", "src2", 50L),
      (6L, "completely different content about spark query engines", "en", "src3", 50L),
      (7L, "der hund läuft schnell und der vogel singt laut heute", "de", "src3", 50L),
      (8L, "el gato come pescado y la casa es grande hoy", "es", "src4", 44L),
      (9L, "le chat mange du poisson et la maison est grande", "fr", "src4", 48L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup groups case/punct variants under one canonical id") {
    val out = Dedup.exact(spark, corpusDir).collect()
    val dupGroup = out.find(_.getAs[Long]("dup_count") > 1).get
    assert(dupGroup.getAs[Long]("canonical_id") === 0L)
    assert(dupGroup.getAs[Long]("dup_count") === 2L) // docs 0 and 1
    assert(out.length === 9) // 10 docs, one merged pair
  }

  test("minhash LSH finds planted near-dup pairs and only those") {
    val pairs = Dedup.minhashLsh(spark, corpusDir)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(pairs.contains((0L, 1L))) // identical shingle sets
    assert(pairs.contains((0L, 2L)) || pairs.contains((2L, 3L))) // heavy overlap cluster
    assert(pairs.forall { case (a, b) => a < b && a <= 3 && b <= 3 }) // no false positives outside cluster
  }

  test("ngram jaccard agrees with minhash-verified pairs on the planted cluster") {
    val jac = Dedup.ngramJaccard(spark, corpusDir)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    assert(jac.contains((0L, 1L)))
    assert(jac.forall { case (a, b) => a <= 3 && b <= 3 })
  }

  test("hot-shingle cap bounds inverted-index candidates under planted boilerplate") {
    val dir = Files.createTempDirectory("graft_boiler").toString
    val boiler = "subscribe to our newsletter today" // 5 words → 3 shared shingles
    val docs = (0L until 40L).map { i =>
      (i, s"$boiler unique${i} filler${i} content${i} words${i} body${i} tail${i}",
        "en", "src", 60L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sh = Dedup.cappedShingles(spark, dir, cap = 20)
    // the boilerplate shingles (df=40 > cap) are gone...
    assert(sh.filter(col("s") === "subscribe to our").count() === 0L)
    // ...so the self-join produces ZERO candidate pairs instead of
    // 40·39/2 · 3 rows from the hot keys alone
    val cands = sh.select(col("doc_id").as("da"), col("s"))
      .join(sh.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .filter(col("da") < col("db"))
    assert(cands.count() === 0L)
    // uncapped, the same join explodes quadratically
    val raw = Dedup.cappedShingles(spark, dir, cap = 1000)
    val rawCands = raw.select(col("doc_id").as("da"), col("s"))
      .join(raw.select(col("doc_id").as("db"), col("s")), Seq("s"))
      .filter(col("da") < col("db"))
    assert(rawCands.count() === 40L * 39 / 2 * 3)
    // and the gated q17 path runs the capped variant: planted boilerplate
    // alone yields no near-dup pairs
    assert(Dedup.ngramJaccard(spark, dir).count() === 0L)
  }

  test("band-bucket cap bounds LSH candidates under a planted 60-clone boilerplate cluster") {
    val boiler = "subscribe to our newsletter for daily updates and exclusive offers today"
    val real = "spark catalyst optimizer rewrites logical plans into efficient physical plans"
    val docs = (0L until 60L).map(i => (i, boiler, "en", "src", 70L)) ++ Seq(
      (200L, real, "en", "src", 70L), (201L, real, "en", "src", 70L),
      (300L, "a lone unrelated document mentioning parquet files and shuffle partitions",
        "en", "src", 70L))
    val sh = Dedup.shingleRowsOf(docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val sig = Dedup.minhashSignaturesFrom(sh).cache()
    // the 60 clones share every band signature → 4 buckets of 60 > cap
    // → anti-joined away; only the planted genuine pair remains
    assert(Dedup.cappedBandCandidates(sig, cap = 50).count() === 1L)
    // uncapped, the same corpus floods the band join with 60·59/2
    // clone pairs on ONE key — the skew this cap exists to bound
    assert(Dedup.cappedBandCandidates(sig, cap = 10000).count() === 60L * 59 / 2 + 1)
    // and cluster resolution over the capped gated path stays tiny:
    // one 2-doc component, nothing from the boilerplate cluster
    val pairs = Dedup.minhashLshCappedFrom(sh).select(col("da"), col("db"))
    val labels = operators.Components.minLabel(pairs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(labels === Map(200L -> 200L, 201L -> 200L))
    sig.unpersist()
  }

  test("simhash: identical normalized token sets get identical signatures") {
    val sigs = Dedup.simhashSignatures(spark, corpusDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    // doc 1 is doc 0 uppercased+punct — tokens differ (upper), so only
    // assert determinism: same input → same signature
    val again = Dedup.simhashSignatures(spark, corpusDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs === again)
    assert(sigs.values.toSet.size > 1) // not degenerate
  }

  test("language-ID picks stopword-bearing languages on real sentences") {
    val out = TextAnalysis.langId(spark, corpusDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("detected")) -> r.getAs[Long]("n")).toMap
    // English docs with 'the/and/over' detected en
    assert(out.keys.exists { case (l, d) => l == "en" && d == "en" })
    // German sentence carries 'der' + 'und' → de
    assert(out.contains(("de", "de")))
    // Spanish sentence carries 'el/la/y/es' → es
    assert(out.contains(("es", "es")))
  }

  test("salted aggregation equals plain aggregation (exactness under salting)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plain = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum(col("l_quantity")).as("value_sum"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(li, col("l_returnflag"), col("l_quantity"),
        col("l_orderkey"), buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n === plain(k)._2)
      assert(math.abs(s - plain(k)._1) < 1e-6)
    }
  }

  test("salted join equals plain join") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey"), col("l_quantity"))
    val dim = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = li.join(dim, Seq("l_partkey")).count()
    val salted = Skew.saltedJoin(li, dim, "l_partkey", col("l_quantity"), buckets = 4).count()
    assert(salted === plain)
  }

  test("trained IVF reaches recall@5 >= 0.8 on a planted clustered corpus") {
    val dir = Files.createTempDirectory("graft_ivf").toString
    // 4 tight clusters in dim 16; vec_id % 4 interleaves clusters so
    // the first-16 seeds span all of them
    val vecs = (0L until 480L).map { vid =>
      val c = (vid % 4).toInt
      val emb = Array.tabulate(16) { i =>
        val base = if (i / 4 == c) 1.0f else 0.0f
        val noise = (((vid * 2654435761L + i * 97L) % 1000L) - 500L) / 10000.0f
        base + noise
      }
      (vid, emb)
    }
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val bf = Vectors.annBruteForce(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val trained = Vectors.annIvfTrained(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (bf intersect trained).size.toDouble / bf.size
    assert(recall >= 0.8, s"trained IVF recall@5 $recall < 0.8")
  }

  test("PQ ANN: deterministic across runs; recall@5 >= 0.8 on a clustered corpus") {
    // bit-stability on the real (near-random) embeddings: integer
    // codebooks + the fixed scoring op tree → identical runs. Recall
    // on near-random vectors is inherently low for ANY product
    // quantizer (top-5 cosines sit within the quantization error), so
    // the recall bound is measured where there is structure to
    // preserve — the same planted clustered corpus as the IVF test.
    val sf = "/root/testdata/sf0.001"
    val pq1 = Vectors.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    val pq2 = Vectors.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(pq1.toSeq === pq2.toSeq)
    val dir = Files.createTempDirectory("graft_pq").toString
    val vecs = (0L until 480L).map { vid =>
      val c = (vid % 4).toInt
      val emb = Array.tabulate(16) { i =>
        val base = if (i / 4 == c) 1.0f else 0.0f
        val noise = (((vid * 2654435761L + i * 97L) % 1000L) - 500L) / 10000.0f
        base + noise
      }
      (vid, emb)
    }
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val bf = Vectors.annBruteForce(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val pq = Vectors.annPq(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (bf intersect pq).size.toDouble / bf.size
    assert(recall >= 0.8, s"PQ recall@5 $recall < 0.8")
  }

  test("IVF ANN recall vs brute force is high on real embeddings") {
    val sf = "/root/testdata/sf0.001"
    val bf = Vectors.annBruteForce(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Vectors.annIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF recall $recall too low") // 4/16 lists probed on unclustered data
  }

  test("signature Jaccard: identical docs estimate 1.0 exactly; estimates bounded; exact column matches minhashLsh contract") {
    val out = Dedup.signatureJaccard(spark, corpusDir).collect()
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getAs[Long]("n_equal"), r.getAs[Double]("est_sim"), r.getAs[Double]("jaccard"))).toMap
    // docs 0 and 1 normalize to the SAME text: every minhash component
    // equal, estimator exactly 1, exact Jaccard exactly 1
    assert(byPair((0L, 1L)) === ((12L, 1.0, 1.0)))
    out.foreach { r =>
      val n = r.getAs[Long]("n_equal")
      assert(n >= 0 && n <= 12)
      assert(r.getAs[Double]("est_sim") === n / 12.0)
    }
    // the exact column agrees with the verified-pairs operator on the
    // pairs both report (signatureJaccard additionally keeps sub-0.5
    // candidates; minhashLshCapped filters them)
    val verified = Dedup.minhashLshCapped(spark, corpusDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    verified.foreach { case (pair, j) =>
      assert(byPair.contains(pair) && byPair(pair)._3 === j, s"pair $pair")
    }
  }

  test("incremental LSH equals capped full recompute restricted to delta pairs") {
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
    // delta = docs {1, 3}; index = the rest (persisted signatures only)
    val delta = docs.filter(col("doc_id").isin(1L, 3L))
    val index = Dedup.minhashRawFrom(
      Dedup.shingleRowsOf(docs.filter(!col("doc_id").isin(1L, 3L))))
    val inc = Dedup.incrementalLshFrom(index, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("n_equal")).toMap
    // ground truth: capped candidates over the FULL corpus, agreement
    // >= 6, restricted to pairs touching the delta
    val sh = Dedup.shingleRowsOf(docs)
    val raw = Dedup.minhashRawFrom(sh)
    val cand = Dedup.cappedBandCandidates(Dedup.bandsOf(raw), Dedup.BandBucketCap)
    val eq = (0 until Dedup.NumHashes)
      .map(i => when(col(s"ha$i") === col(s"hb$i"), 1L).otherwise(0L)).reduce(_ + _)
    val aSide = raw.select(col("doc_id").as("da") +:
      (0 until Dedup.NumHashes).map(i => col(s"h$i").as(s"ha$i")): _*)
    val bSide = raw.select(col("doc_id").as("db") +:
      (0 until Dedup.NumHashes).map(i => col(s"h$i").as(s"hb$i")): _*)
    val full = cand.join(aSide, Seq("da")).join(bSide, Seq("db"))
      .select(col("da"), col("db"), eq.as("n_equal"))
      .filter(col("n_equal") >= Dedup.MinSigAgreement)
      .filter(col("da").isin(1L, 3L) || col("db").isin(1L, 3L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("n_equal")).toMap
    assert(inc === full)
    assert(inc.contains((0L, 1L)) && inc((0L, 1L)) === 12L) // exact dup lands in delta
  }

  test("incremental dedup pipeline: snapshot-persisted index survives two ingest batches") {
    import graft.sources.Snapshots
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
    val table = Files.createTempDirectory("graft_lshidx").toString + "/sig_index"
    // bootstrap: index the initial corpus (docs 4..9)
    val b0 = docs.filter(col("doc_id") >= 4L)
    Snapshots.commitOverwrite(spark, table,
      Dedup.minhashRawFrom(Dedup.shingleRowsOf(b0)))
    // ingest batch 1 (docs 2,3 — near-dups of each other): query the
    // PERSISTED index, then merge the new signatures in
    val d1 = docs.filter(col("doc_id").isin(2L, 3L))
    val p1 = Dedup.incrementalLshFrom(Snapshots.read(spark, table), d1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Snapshots.commitUpsert(spark, table,
      Dedup.minhashRawFrom(Dedup.shingleRowsOf(d1)), "doc_id")
    // ingest batch 2 (docs 0,1 — exact dups, near-dup cluster with 2,3)
    val d2 = docs.filter(col("doc_id") < 2L)
    val p2 = Dedup.incrementalLshFrom(Snapshots.read(spark, table), d2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Snapshots.commitUpsert(spark, table,
      Dedup.minhashRawFrom(Dedup.shingleRowsOf(d2)), "doc_id")
    // the maintained index equals the batch recompute over everything
    val idx = Snapshots.read(spark, table).collect()
      .map(r => r.getLong(0) -> (1 until 13).map(r.getString).toSeq).toMap
    val batch = Dedup.minhashRawFrom(Dedup.shingleRowsOf(docs)).collect()
      .map(r => r.getLong(0) -> (1 until 13).map(r.getString).toSeq).toMap
    assert(idx === batch)
    // each batch's pairs only involve that batch's docs on >= 1 side,
    // and the union catches the planted cluster when its members meet
    assert(p1.contains((2L, 3L)))
    assert(p2.contains((0L, 1L)) && (p2.contains((0L, 2L)) || p2.contains((1L, 2L)) ||
      p2.contains((0L, 3L)) || p2.contains((1L, 3L))))
    assert(p1.forall { case (a, b) => Set(a, b).exists(Set(2L, 3L)) } &&
      p2.forall { case (a, b) => Set(a, b).exists(Set(0L, 1L)) })
  }
}
