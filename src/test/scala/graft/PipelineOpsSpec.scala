package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{Pipeline, TransferMeta}
import graft.plans.Pipeline._
import graft.sources.Tables

/** Error policy, retry, persisted meta, scheduled transfers, and the
  * task registry — the serving/operability surface added in round 2. */
class PipelineOpsSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_spec_${name}_${System.nanoTime}"

  test("error budget: transfer FAILS when invalid rows exceed maxErrors") {
    val spec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      validExpr = Some("o_orderkey % 7 != 0"),
      policy = ErrorPolicy(maxErrors = 0))
    val e = intercept[ErrorBudgetExceeded] { Pipeline.run(spark, spec, tmp("budget")) }
    assert(e.nErrors > 0 && e.budget == 0)
  }

  test("error budget: within budget the transfer keeps good rows only") {
    val target = tmp("keepgood")
    val spec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      validExpr = Some("o_orderkey % 7 != 0"),
      policy = ErrorPolicy(maxErrors = Long.MaxValue))
    val (written, errs) = Pipeline.run(spark, spec, target)
    val all = Tables.orders(spark, sf).count()
    val bad = Tables.orders(spark, sf).filter(col("o_orderkey") % 7 === 0).count()
    assert(errs == bad && written == all - bad)
    assert(spark.read.parquet(target)
      .filter(col("o_orderkey") % 7 === 0).count() == 0)
  }

  test("quarantine routing lands exactly the invalid rows") {
    val target = tmp("route"); val q = tmp("quar")
    val spec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      validExpr = Some("o_orderkey % 7 != 0"),
      policy = ErrorPolicy(maxErrors = Long.MaxValue, onError = RouteQuarantine(q)))
    Pipeline.run(spark, spec, target)
    val quarantined = spark.read.parquet(q)
    assert(quarantined.filter(col("o_orderkey") % 7 =!= 0).count() == 0)
    assert(quarantined.count() ==
      Tables.orders(spark, sf).filter(col("o_orderkey") % 7 === 0).count())
  }

  test("quarantine routing scans the source ONCE (single-pass split write)") {
    // VERDICT r6 #3: the old shape ran filter(!valid) as a SECOND full
    // source pass. Now one partitioned staging write feeds both sinks
    // via FS renames. Proof: exactly one executed write command scans
    // the source.
    val target = tmp("onepass"); val q = tmp("onepass_q")
    val spec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      validExpr = Some("o_orderkey % 7 != 0"),
      policy = ErrorPolicy(maxErrors = Long.MaxValue, onError = RouteQuarantine(q)))
    // marker-windowed write-scan counter (SharedSpark helper): the old
    // raw listener raced the async execution-listener bus
    val ((written, errs), writeScans) =
      SharedSpark.countQueryExecutions(spark)(qe =>
        qe.executedPlan.toString.contains("orders.parquet") &&
          qe.logical.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command]) {
        Pipeline.run(spark, spec, target)
      }
    assert(writeScans == 1,
      s"quarantine routing must write from ONE source scan, saw $writeScans")
    // and the split is still exact
    val bad = Tables.orders(spark, sf).filter(col("o_orderkey") % 7 === 0).count()
    val all = Tables.orders(spark, sf).count()
    assert(errs == bad && written == all - bad)
    assert(spark.read.parquet(q).count() == bad)
    assert(spark.read.parquet(target).count() == all - bad)
  }

  test("filterGlob (Source.FilterRegExp analog) prunes objects at listing time") {
    import org.apache.hadoop.fs.Path
    val base = tmp("glob")
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$base/src"))
    // a mixed source directory: a matching data file and a decoy with
    // identical schema that must never be listed
    Seq("events_keep.parquet" -> 0, "snapshot_skip.bak" -> 1).foreach {
      case (name, i) =>
        Tables.events(spark, sf).filter(pmod(col("event_id"), lit(2)) === i)
          .filter(col("event_id") < 400).select("event_id", "user_id")
          .coalesce(1).write.mode("overwrite").parquet(s"$base/stage_$i")
        val part = fs.globStatus(new Path(s"$base/stage_$i/part-*"))(0).getPath
        fs.rename(part, new Path(s"$base/src/$name"))
    }
    val spec = TransferSpec(
      source = SourceSpec(s"$base/src", Parquet, filterGlob = Some("*.parquet")))
    val out = tmp("glob_out")
    val (written, _) = Pipeline.run(spark, spec, out)
    val expected = Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(2)) === 0 && col("event_id") < 400).count()
    assert(written == expected, "only glob-matching objects may transfer")
    // ConfigJson accepts the reference's key name
    import graft.plans.ConfigJson
    val Seq((gspec, _)) = ConfigJson.parseTransfers(
      s"""{"Transfers":[{"Source":{"Path":"/in","Format":"parquet",
         |"FilterRegExp":"*.parquet"},"Target":"/out"}]}""".stripMargin)
    assert(gspec.source.filterGlob.contains("*.parquet"))
  }

  test("FailRetry: retries the configured number of times, then rethrows") {
    val spec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      validExpr = Some("o_orderkey % 7 != 0"),
      policy = ErrorPolicy(maxErrors = 0, failRetries = 2))
    var attempts = 0
    intercept[ErrorBudgetExceeded] {
      Pipeline.runWithRetry(spark, spec, tmp("retry"), _ => attempts += 1)
    }
    assert(attempts == 3, s"expected 1 try + 2 retries, saw $attempts")
  }

  test("TimeOut: a slow transfer is cancelled at the deadline and reported as timeout") {
    // a per-row sleep makes the write job genuinely slow (~15k rows ×
    // 20ms across 32 threads ≈ 9s of task time); the 500ms deadline
    // must cancel the job group long before that and surface as
    // TransferTimeout + Failed(timeout) in the registry. UDF is
    // test-only scaffolding (production code stays UDF-free).
    spark.udf.register("graft_spec_slow", (x: Long) => { Thread.sleep(20); x })
    val target = tmp("timeout")
    val spec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      transforms = Seq("slow_k" -> "graft_spec_slow(o_orderkey)"),
      policy = ErrorPolicy(timeoutMs = Some(500)))
    val t0 = System.currentTimeMillis()
    val e = intercept[TransferTimeout] { Pipeline.runWithRetry(spark, spec, target) }
    val elapsed = System.currentTimeMillis() - t0
    assert(e.ms == 500 && e.target == target)
    assert(elapsed < 8000,
      s"deadline cancel must interrupt the job well before it finishes (took ${elapsed}ms)")
    Pipeline.BatchTasks.status(target) match {
      case Some(Pipeline.BatchTasks.Status(_, Pipeline.BatchTasks.Failed(msg, attempts), _, _)) =>
        assert(attempts == 1 && msg.contains("timeout"), s"got $msg")
      case other => fail(s"expected Failed(timeout) status, got $other")
    }
    // a timeout is retryable like any failure (FailRetry semantics)
    val target2 = tmp("timeout_retry")
    var attempts = 0
    intercept[TransferTimeout] {
      Pipeline.runWithRetry(spark, spec.copy(policy =
        ErrorPolicy(timeoutMs = Some(500), failRetries = 1)), target2, _ => attempts += 1)
    }
    assert(attempts == 2, s"expected 1 try + 1 retry under timeout, saw $attempts")
    // parity: a generous deadline leaves the non-timeout path untouched
    val okTarget = tmp("timeout_ok")
    val okSpec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      filterExpr = Some("o_orderkey <= 300"),
      policy = ErrorPolicy(timeoutMs = Some(120000)))
    val (written, errs) = Pipeline.runWithRetry(spark, okSpec, okTarget)
    assert(errs == 0 && written == Pipeline.plan(spark, okSpec).count())
  }

  test("MaxTransfers: a capped run processes exactly N files and the next run resumes") {
    val base = tmp("maxt")
    val o = Tables.orders(spark, sf)
    def band(i: Int) = o.filter(
      col("o_orderkey") > i * 400 && col("o_orderkey") <= (i + 1) * 400)
    (0 until 3).foreach { i =>
      band(i).repartition(1).write.mode("overwrite").parquet(s"$base/src/b$i")
    }
    val spec = TransferSpec(source = SourceSpec(s"$base/src/b*", Parquet))
    // pass 1 takes the first 2 files in listing order (b0, b1)
    val (f1, r1) = TransferMeta.runIncremental(spark, spec, s"$base/target",
      maxTransfers = 2)
    assert(f1 == 2 && r1 == band(0).count() + band(1).count())
    // pass 2 resumes at b2 via the persisted meta — no reprocessing
    val (f2, r2) = TransferMeta.runIncremental(spark, spec, s"$base/target",
      maxTransfers = 2)
    assert(f2 == 1 && r2 == band(2).count())
    // drained
    val (f3, r3) = TransferMeta.runIncremental(spark, spec, s"$base/target",
      maxTransfers = 2)
    assert(f3 == 0 && r3 == 0)
    // every row landed exactly once
    assert(spark.read.parquet(s"$base/target").count() == r1 + r2)
    assert(spark.read.parquet(s"$base/target")
      .groupBy(col("o_orderkey")).count().filter(col("count") > 1).count() == 0)
    // Repeat loop (runRepeated) drains the same shape in one call and
    // stops early on the empty pass: 2+1, then 0 stops a repeat=5 loop
    val base2 = tmp("maxt_rep")
    (0 until 3).foreach { i =>
      band(i).repartition(1).write.mode("overwrite").parquet(s"$base2/src/b$i")
    }
    val spec2 = TransferSpec(source = SourceSpec(s"$base2/src/b*", Parquet))
    val passes = Pipeline.runRepeated(spark, spec2, s"$base2/target",
      repeat = 5, maxTransfers = 2)
    assert(passes.map(_._1) == Seq(2, 1, 0),
      s"drain must stop at the first empty pass, got $passes")
    assert(passes.map(_._2).sum == r1 + r2)
  }

  test("PlanChecks lint: growing-broadcast hints and cartesians flagged, safe shapes clean") {
    import graft.plans.PlanChecks
    val bounded = Set("region.parquet", "nation.parquet")
    val li = Tables.lineitem(spark, sf)
    val na = spark.read.parquet(s"$sf/nation.parquet")
    // hint on a growing table → flagged
    val bad = li.join(broadcast(Tables.orders(spark, sf)),
      col("l_orderkey") === col("o_orderkey"))
    assert(PlanChecks.growingBroadcastHints(bad, bounded).nonEmpty)
    // hint on a bounded dim, a one-row global aggregate, and a local
    // relation → clean
    import spark.implicits._
    val okDim = li.join(broadcast(na), col("l_suppkey") % 25 === col("n_nationkey"))
    val okAgg = li.join(
      broadcast(Tables.orders(spark, sf).agg(max(col("o_orderkey")).as("mx"))),
      col("l_orderkey") <= col("mx"))
    val okLocal = li.join(broadcast(Seq((1L, "a")).toDF("k", "v")),
      col("l_orderkey") === col("k"))
    // a global limit caps the subtree no matter what grows beneath it
    val okLimit = li.join(broadcast(
      Tables.orders(spark, sf).orderBy(col("o_orderkey")).limit(3)),
      col("l_orderkey") === col("o_orderkey"))
    Seq(okDim, okAgg, okLocal, okLimit).foreach(df =>
      assert(PlanChecks.growingBroadcastHints(df, bounded).isEmpty))
    // but a hinted growing×one-row JOIN still grows → flagged
    val sneaky = li.join(broadcast(
      Tables.orders(spark, sf).crossJoin(
        Tables.customer(spark, sf).agg(count(lit(1)).as("c")))),
      col("l_orderkey") === col("o_orderkey"))
    assert(PlanChecks.growingBroadcastHints(sneaky, bounded).nonEmpty)
    // cartesian detection + the combined lint
    val cart = Tables.orders(spark, sf).limit(5)
      .crossJoin(Tables.customer(spark, sf).limit(5))
    assert(PlanChecks.cartesianProducts(cart).nonEmpty)
    assert(PlanChecks.cartesianProducts(okDim).isEmpty)
    assert(PlanChecks.lint(bad, bounded).nonEmpty && PlanChecks.lint(okDim, bounded).isEmpty)
    // skew measurement: a hot-key repartition shows ratio >> 1, and the
    // row accounting is exact
    val skewed = Tables.events(spark, sf)
      .withColumn("k", when(col("event_id") % 10 < 9, 0L).otherwise(col("event_id")))
      .repartition(8, col("k"))
    val r = PlanChecks.partitionSkew(skewed).collect()(0)
    assert(r.getAs[Double]("skew_ratio") > 2.0,
      s"planted 90% hot key must show up as skew, got $r")
    val balanced = Tables.events(spark, sf).repartition(8, col("event_id"))
    val rb = PlanChecks.partitionSkew(balanced).collect()(0)
    assert(rb.getAs[Double]("skew_ratio") < 1.5, s"uniform key should balance, got $rb")
  }

  test("JSON config: reference-shaped document parses into the full spec surface") {
    import graft.plans.ConfigJson
    val json = """{"Transfers": [{
      |  "Source": {"Path": "/in/##env.HOME##/src", "Format": "ndjson",
      |             "Schema": "a LONG, b STRING"},
      |  "Target": "/out/##env.HOME##/dst",
      |  "Filter": "a > 0",
      |  "Transforms": [{"Name": "b2", "Expr": "upper(b)"}],
      |  "Routes": [{"Type": "mod", "Name": "shard", "Src": "a", "N": 8},
      |             {"Type": "date", "Name": "dt", "Src": "ts", "Fmt": "yyyy-MM-dd"},
      |             {"Type": "runtime", "Name": "thread", "Value": "t7"}],
      |  "Select": ["a", "b2"],
      |  "Valid": "a % 7 != 0",
      |  "MaxErrorCounts": 5,
      |  "FailRetry": 2,
      |  "TimeOut": {"Duration": 3, "Unit": "sec"},
      |  "Quarantine": "/quar",
      |  "MaxParallelTransfers": 2,
      |  "ReferenceOnlyKeyIgnored": {"Duration": 1, "Unit": "sec"}
      |}]}""".stripMargin
    val Seq((spec, target)) = ConfigJson.parseTransfers(json)
    val home = sys.env("HOME")
    assert(target == s"/out/$home/dst" && spec.source.path == s"/in/$home/src")
    assert(spec.source.format == NdJson && spec.source.schemaDdl.contains("a LONG, b STRING"))
    assert(spec.filterExpr.contains("a > 0") && spec.transforms == Seq("b2" -> "upper(b)"))
    assert(spec.routes.map(_.name) == Seq("shard", "dt", "thread"))
    assert(spec.routes.head == ModKey("shard", "a", 8))
    // `file` route type (reference transfer_service.go:713 `<file>`)
    val Seq((fspec, _)) = ConfigJson.parseTransfers(
      """{"Transfers":[{"Source":{"Path":"/in","Format":"parquet"},
        |"Target":"/out","Routes":[{"Type":"file","Name":"src_file"}]}]}""".stripMargin)
    assert(fspec.routes == Seq(FileKey("src_file")))
    // DataTypeMatch rules (reference config.go:247): DataType carries
    // the branch schema DDL; empty DataType = exclusion
    val Seq((dspec, _)) = ConfigJson.parseTransfers(
      """{"Transfers":[{"Source":{"Path":"/in","Format":"ndjson",
        |"Schema":"a LONG",
        |"DataTypeMatch":[
        |  {"MatchingFragment":"\"doc_id\"","DataType":"doc_id LONG, t STRING"},
        |  {"MatchingFragment":"corrupt","DataType":""}]},
        |"Target":"/out"}]}""".stripMargin)
    assert(dspec.source.typeMatches == Seq(
      TypeMatch("\"doc_id\"", Some("doc_id LONG, t STRING")),
      TypeMatch("corrupt", None)))
    assert(spec.select == Seq("a", "b2") && spec.validExpr.contains("a % 7 != 0"))
    assert(spec.policy == ErrorPolicy(5L, RouteQuarantine("/quar"), 2, Some(3000L)))
    // loud failures: malformed JSON, bad enum, missing required key
    intercept[ConfigJson.JsonParseError] { ConfigJson.parse("""{"a": [1,""") }
    // a \u escape with non-hex digits must keep the loud-failure
    // contract (position-carrying JsonParseError, not a raw
    // NumberFormatException from parseInt)
    val badEsc = intercept[ConfigJson.JsonParseError] {
      ConfigJson.parse("{\"a\": \"\\uZZZZ\"}")
    }
    assert(badEsc.getMessage.contains("at offset"), s"got: ${badEsc.getMessage}")
    intercept[ConfigJson.ConfigError] {
      ConfigJson.parseTransfers(
        """{"Transfers":[{"Source":{"Path":"/x","Format":"avro"},"Target":"/y"}]}""")
    }
    intercept[ConfigJson.ConfigError] {
      ConfigJson.parseTransfers("""{"Transfers":[{"Target":"/y"}]}""")
    }
  }

  test("JSON config: running the document equals the hand-built spec run") {
    import graft.plans.ConfigJson
    val outJson = tmp("cfg_json"); val outHand = tmp("cfg_hand")
    val json = s"""{"Transfers": [{
      |  "Source": {"Path": "$sf/orders.parquet", "Format": "parquet"},
      |  "Target": "$outJson",
      |  "Filter": "o_orderkey <= 500",
      |  "Transforms": [{"Name": "pri", "Expr": "substr(o_orderpriority, 1, 1)"}],
      |  "Routes": [{"Type": "mod", "Name": "shard", "Src": "o_custkey", "N": 4}]
      |}]}""".stripMargin
    val Seq((written, errs)) = ConfigJson.run(spark, json)
    val hand = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      filterExpr = Some("o_orderkey <= 500"),
      transforms = Seq("pri" -> "substr(o_orderpriority, 1, 1)"),
      routes = Seq(ModKey("shard", "o_custkey", 4)))
    val (writtenHand, errsHand) = Pipeline.run(spark, hand, outHand)
    assert(errs == 0 && errsHand == 0 && written == writtenHand)
    val a = spark.read.parquet(outJson)
      .select("o_orderkey", "pri", "shard").orderBy("o_orderkey").collect()
    val b = spark.read.parquet(outHand)
      .select("o_orderkey", "pri", "shard").orderBy("o_orderkey").collect()
    assert(a.nonEmpty && a.sameElements(b),
      "config-driven transfer must land byte-identical rows to the coded spec")
  }

  test("JSON config: Schema as a resource file drives a transfer (reference config.go:96)") {
    import graft.plans.ConfigJson
    // the reference's Schema is a *Resource — the DDL lives in its own
    // file, referenced by URL, not inline in the config document
    val base = tmp("schema_res")
    new java.io.File(base).mkdirs()
    val ddlPath = s"$base/events.ddl"
    java.nio.file.Files.write(java.nio.file.Paths.get(ddlPath),
      "event_id LONG, user_id LONG, value DOUBLE\n".getBytes("UTF-8"))
    import spark.implicits._
    Seq("""{"event_id":1,"user_id":10,"value":1.5}""",
        """{"event_id":2,"user_id":20,"value":2.5}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(s"$base/src")
    val json = s"""{"Transfers": [{
      |  "Source": {"Path": "$base/src", "Format": "ndjson",
      |    "Schema": {"URL": "file://$ddlPath"}},
      |  "Target": "$base/out"
      |}]}""".stripMargin
    val Seq((written, errs)) = ConfigJson.run(spark, json)
    assert(errs == 0 && written == 2)
    val out = spark.read.parquet(s"$base/out")
    // the resource's DDL drove the read: typed columns, not raw text
    assert(out.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq ==
      Seq("event_id" -> "bigint", "user_id" -> "bigint", "value" -> "double"))
    assert(out.select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
      == Seq(1L, 2L))
    // loud-error contract: a moved/empty schema file must never let a
    // transfer run schemaless
    val missing = intercept[ConfigJson.ConfigError] {
      ConfigJson.parseTransfers(s"""{"Transfers":[{"Source":{"Path":"/in",
        |"Format":"ndjson","Schema":{"URL":"$base/gone.ddl"}},
        |"Target":"/out"}]}""".stripMargin)
    }
    assert(missing.getMessage.contains("not readable"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/empty.ddl"),
      "  \n".getBytes("UTF-8"))
    val empty = intercept[ConfigJson.ConfigError] {
      ConfigJson.parseTransfers(s"""{"Transfers":[{"Source":{"Path":"/in",
        |"Format":"ndjson","Schema":{"URL":"$base/empty.ddl"}},
        |"Target":"/out"}]}""".stripMargin)
    }
    assert(empty.getMessage.contains("empty"))
    val noUrl = intercept[ConfigJson.ConfigError] {
      ConfigJson.parseTransfers("""{"Transfers":[{"Source":{"Path":"/in",
        |"Format":"ndjson","Schema":{"Path":"/x.ddl"}},
        |"Target":"/out"}]}""".stripMargin)
    }
    assert(noUrl.getMessage.contains("missing URL"))
  }

  test("JSON config: Frequency runs the periodic path, mixed documents keep order") {
    import graft.plans.ConfigJson
    // mixed document: one batch transfer, one Frequency transfer —
    // results come back in document order with both legs populated
    val base = tmp("freq_cfg")
    import spark.implicits._
    Seq("""{"a":1,"b":"x"}""", """{"a":2,"b":"y"}""", """{"a":3,"b":"z"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(s"$base/src")
    val json = s"""{"Transfers": [
      | {"Source": {"Path": "$sf/orders.parquet", "Format": "parquet"},
      |  "Target": "$base/batch", "Filter": "o_orderkey <= 100"},
      | {"Source": {"Path": "$base/src", "Format": "ndjson",
      |    "Schema": "a LONG, b STRING"},
      |  "Target": "$base/sched", "Filter": "a > 1",
      |  "Frequency": {"Duration": 50, "Unit": "milli"}}
      |]}""".stripMargin
    val res = ConfigJson.run(spark, json)
    assert(res.size == 2)
    assert(res.head._1 ==
      Tables.orders(spark, sf).filter(col("o_orderkey") <= 100).count())
    assert(res(1)._1 == 2, s"scheduled leg wrote ${res(1)._1} rows, expected 2")
    assert(spark.read.parquet(s"$base/sched").count() == 2)
    // loud contracts: streaming needs a Schema; Valid refuses the path
    val noSchema = intercept[graft.plans.Pipeline.ConfigRequired] {
      ConfigJson.run(spark, s"""{"Transfers":[{
        |"Source":{"Path":"$base/src","Format":"ndjson"},
        |"Target":"$base/x1","Frequency":{"Duration":50,"Unit":"milli"}}]}""".stripMargin)
    }
    assert(noSchema.getMessage.contains("Schema"))
    val withValid = intercept[IllegalArgumentException] {
      ConfigJson.run(spark, s"""{"Transfers":[{
        |"Source":{"Path":"$base/src","Format":"ndjson","Schema":"a LONG, b STRING"},
        |"Target":"$base/x2","Valid":"a > 0",
        |"Frequency":{"Duration":50,"Unit":"milli"}}]}""".stripMargin)
    }
    assert(withValid.getMessage.contains("Valid"))
  }

  test("JSON config: DataTypeMatch transfer equals the hand-built dispatch run") {
    import graft.plans.ConfigJson
    import org.apache.hadoop.fs.Path
    // a mixed ndjson source: default-shaped records, doc-shaped records
    // (fragment-matched to their own schema), corrupt records (excluded)
    val base = tmp("dtm_cfg")
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(base))
    val lines = Seq(
      """{"a":1,"b":"x"}""", """{"a":2,"b":"y"}""",
      """{"doc_id":10,"t":"alpha"}""", """{"doc_id":11,"t":"beta"}""",
      """{"corrupt":true,"a":99}""")
    import spark.implicits._
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(s"$base/src")
    val json = s"""{"Transfers": [{
      |  "Source": {"Path": "$base/src", "Format": "ndjson",
      |    "Schema": "a LONG, b STRING",
      |    "DataTypeMatch": [
      |      {"MatchingFragment": "\\"doc_id\\"", "DataType": "doc_id LONG, t STRING"},
      |      {"MatchingFragment": "corrupt", "DataType": ""}]},
      |  "Target": "$base/out_json"
      |}]}""".stripMargin
    val Seq((written, errs)) = ConfigJson.run(spark, json)
    val hand = TransferSpec(source = SourceSpec(s"$base/src", NdJson,
      schemaDdl = Some("a LONG, b STRING"),
      typeMatches = Seq(
        TypeMatch("\"doc_id\"", Some("doc_id LONG, t STRING")),
        TypeMatch("corrupt", None))))
    val (writtenHand, errsHand) = Pipeline.run(spark, hand, s"$base/out_hand")
    assert(errs == 0 && errsHand == 0 && written == writtenHand && written == 4,
      s"corrupt record must be excluded, got written=$written")
    def rows(p: String) = spark.read.parquet(p)
      .select("doc_id", "t", "a", "b").orderBy("doc_id", "a").collect().toSeq
    val got = rows(s"$base/out_json")
    assert(got == rows(s"$base/out_hand"),
      "config-driven dispatch must land identical rows to the coded spec")
    // per-branch columns present, cross-branch columns null
    assert(got.count(r => !r.isNullAt(0)) == 2 && got.count(r => !r.isNullAt(2)) == 2)
    // the dispatch is a SINGLE scan of the mixed source (one text
    // FileScan in the plan), not one re-scan per branch
    val planStr = Pipeline.plan(spark, hand).queryExecution.executedPlan.toString
    val nScans = "FileScan text".r.findAllMatchIn(planStr).size
    assert(nScans == 1, s"dispatch must read the mixed source once, saw $nScans scans")
  }

  test("persisted meta: re-run processes zero new files and zero rows") {
    val base = tmp("meta")
    val spec = TransferSpec(source = SourceSpec(s"$base/src", Parquet))
    val o = Tables.orders(spark, sf)
    o.filter(col("o_orderkey") <= 500).repartition(2)
      .write.mode("append").parquet(s"$base/src")
    val (f1, r1) = TransferMeta.runIncremental(spark, spec, s"$base/target")
    assert(f1 == 2 && r1 == o.filter(col("o_orderkey") <= 500).count())
    val (f2, r2) = TransferMeta.runIncremental(spark, spec, s"$base/target")
    assert(f2 == 0 && r2 == 0, "second run must skip all processed files")
    // meta row counts sum to the processed total (ObjectMeta analog)
    val meta = TransferMeta.readMeta(spark, s"$base/target")
    assert(meta.map(_.rows).sum == r1)
    // new batch → only the delta processed, target holds each row once
    o.filter(col("o_orderkey") > 500 && col("o_orderkey") <= 800).repartition(2)
      .write.mode("append").parquet(s"$base/src")
    val (f3, r3) = TransferMeta.runIncremental(spark, spec, s"$base/target")
    assert(f3 == 2 && r3 == o.filter(col("o_orderkey") > 500 && col("o_orderkey") <= 800).count())
    assert(spark.read.parquet(s"$base/target").count() == r1 + r3)
    assert(spark.read.parquet(s"$base/target")
      .groupBy(col("o_orderkey")).count().filter(col("count") > 1).count() == 0)
  }

  test("meta compaction bounds the full-entry window; digests still skip processed files") {
    val base = tmp("compact")
    val spec = TransferSpec(source = SourceSpec(s"$base/src", Parquet))
    val o = Tables.orders(spark, sf)
    // 12 source files, window of 5 full entries
    o.filter(col("o_orderkey") <= 600).repartition(12)
      .write.mode("append").parquet(s"$base/src")
    val (f1, r1) = TransferMeta.runIncremental(spark, spec, s"$base/target",
      maxFullEntries = 5)
    assert(f1 == 12 && r1 == o.filter(col("o_orderkey") <= 600).count())
    // window respected: 5 full entries, the other 7 rolled into digests
    assert(TransferMeta.readMeta(spark, s"$base/target").size == 5)
    assert(TransferMeta.readMetaDigests(spark, s"$base/target").size == 7)
    // digest membership still skips every processed file
    val (f2, r2) = TransferMeta.runIncremental(spark, spec, s"$base/target",
      maxFullEntries = 5)
    assert(f2 == 0 && r2 == 0, "compacted meta must still skip all processed files")
    // a new batch is still picked up, and the window stays bounded
    o.filter(col("o_orderkey") > 600 && col("o_orderkey") <= 700).repartition(3)
      .write.mode("append").parquet(s"$base/src")
    val (f3, r3) = TransferMeta.runIncremental(spark, spec, s"$base/target",
      maxFullEntries = 5)
    assert(f3 == 3 && r3 == o.filter(col("o_orderkey") > 600 && col("o_orderkey") <= 700).count())
    val retained = TransferMeta.readMeta(spark, s"$base/target")
    assert(retained.size == 5)
    assert(TransferMeta.readMetaDigests(spark, s"$base/target").size == 10)
    // retention is RECENCY-ordered (ADVICE r3): the newest batch's 3
    // files must be the LAST retained entries with their row counts
    // intact — only the oldest window rolls up, regardless of how the
    // paths sort lexicographically
    assert(retained.takeRight(3).map(_.rows).sum == r3,
      "the newest batch's files must be the most recent retained entries")
    assert(spark.read.parquet(s"$base/target").count() == r1 + r3)
  }

  test("scheduled transfer registers in the task registry with batch + row counters") {
    val reg = new graft.streaming.TaskRegistry.Listener
    spark.streams.addListener(reg)
    try {
      val base = tmp("sched")
      val src = Tables.events(spark, sf).filter(col("event_id") < 500)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      src.write.json(s"$base/src")
      val name = s"spec_sched_${System.nanoTime}"
      graft.streaming.Streams.scheduledTransfer(spark, s"$base/src",
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE",
        s"$base/dst", s"$base/cp", name)
      // listener bus is async — wait for the terminal transition AND
      // for the trailing progress counters to drain. numInputRows is
      // measured AFTER pushed-down filters (the error-row filter
      // reaches the json scan), so "records processed" = non-error rows
      // — the same RecordProcessed semantics as the reference's meta.
      val expected = src.filter(col("event_type") =!= "error").count()
      val deadline = System.currentTimeMillis() + 30000
      var st = reg.status(name)
      while ((st.isEmpty || st.get.state == graft.streaming.TaskRegistry.Running
            || st.get.rowsProcessed < expected)
          && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); st = reg.status(name)
      }
      assert(st.nonEmpty, "scheduled transfer never registered")
      assert(st.get.state == graft.streaming.TaskRegistry.Finished)
      assert(st.get.batches >= 1)
      assert(st.get.rowsProcessed == expected)
      assert(reg.errors().isEmpty)
      assert(reg.tasksList().exists(_.name == name))
      // sink parity with the batch transform
      val sunk = spark.read.parquet(s"$base/dst").count()
      assert(sunk == src.filter(col("event_type") =!= "error").count())
    } finally spark.streams.removeListener(reg)
  }

  test("batch task registry records finished and failed transfers with attempts") {
    val okTarget = tmp("bt_ok")
    val okSpec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      filterExpr = Some("o_orderkey <= 200"))
    val (written, _) = Pipeline.runWithRetry(spark, okSpec, okTarget)
    Pipeline.BatchTasks.status(okTarget) match {
      case Some(Pipeline.BatchTasks.Status(_, Pipeline.BatchTasks.Finished(rows, errs, attempts), _, _)) =>
        assert(rows == written && errs == 0 && attempts == 1)
      case other => fail(s"expected Finished status, got $other")
    }
    val badTarget = tmp("bt_bad")
    val badSpec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      validExpr = Some("o_orderkey % 7 != 0"),
      policy = ErrorPolicy(maxErrors = 0, failRetries = 1))
    intercept[ErrorBudgetExceeded] { Pipeline.runWithRetry(spark, badSpec, badTarget) }
    Pipeline.BatchTasks.status(badTarget) match {
      case Some(Pipeline.BatchTasks.Status(_, Pipeline.BatchTasks.Failed(msg, attempts), _, _)) =>
        assert(attempts == 2 && msg.contains("error budget"))
      case other => fail(s"expected Failed status, got $other")
    }
    assert(Pipeline.BatchTasks.errors().exists(_._1 == badTarget))
    assert(Pipeline.BatchTasks.tasksList().map(_.target).contains(okTarget))
  }

  test("HTTP status endpoint answers tasklist/status/errors during transfers (server.go analog)") {
    def get(port: Int, path: String): (Int, String) = {
      val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("GET")
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = scala.io.Source.fromInputStream(is, "UTF-8").mkString
      conn.disconnect()
      (code, body)
    }
    val reg = new graft.streaming.TaskRegistry.Listener
    spark.streams.addListener(reg)
    val server = new graft.streaming.StatusServer(reg)
    val port = server.start()
    try {
      // 1) a scheduled streaming transfer registers and finishes
      val base = tmp("http")
      val src = Tables.events(spark, sf).filter(col("event_id") < 300)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      src.write.json(s"$base/src")
      val name = s"spec_http_${System.nanoTime}"
      graft.streaming.Streams.scheduledTransfer(spark, s"$base/src",
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE",
        s"$base/dst", s"$base/cp", name)
      val deadline = System.currentTimeMillis() + 30000
      while (!reg.status(name).exists(_.state == graft.streaming.TaskRegistry.Finished)
          && System.currentTimeMillis() < deadline) Thread.sleep(100)
      // 2) a failing batch transfer lands in the error feed
      val badTarget = tmp("http_bad")
      val badSpec = TransferSpec(
        source = SourceSpec(s"$sf/orders.parquet", Parquet),
        validExpr = Some("o_orderkey % 7 != 0"),
        policy = ErrorPolicy(maxErrors = 0))
      intercept[ErrorBudgetExceeded] { Pipeline.runWithRetry(spark, badSpec, badTarget) }
      // --- the reference's three queries ---
      val (lc, list) = get(port, "/graft/tasklist")
      assert(lc == 200 && list.contains(s""""name":"$name"""")
        && list.contains(""""state":"FINISHED"""") && list.contains(""""kind":"stream""""),
        s"tasklist missing the finished stream task: $list")
      assert(list.contains(""""kind":"batch""""), "tasklist must include batch tasks")
      val (sc, status) = get(port, "/graft/status")
      assert(sc == 200 && status.contains(""""status":"ERROR"""")
        && status.contains(""""errors":"""), s"status must roll up the failure: $status")
      val (ec, errs) = get(port, "/graft/errors")
      assert(ec == 200 && errs.contains(esc(badTarget).take(20))
        && errs.contains("error budget"), s"errors must carry the failed transfer: $errs")
      // ?status= filter (reference server.go:71 status parameter):
      // failed → contains the planted failure and ONLY failed rows;
      // finished → contains the stream task, excludes the failure;
      // case-insensitive; bogus value → empty list
      val (fc, failedList) = get(port, "/graft/tasklist?status=failed")
      assert(fc == 200 && failedList.contains(esc(badTarget).take(20)),
        s"status=failed must return the planted failure: $failedList")
      assert(!"\"state\":\"(RUNNING|FINISHED)\"".r.findFirstIn(failedList).isDefined,
        s"status=failed must return only FAILED tasks: $failedList")
      val (gc, finishedList) = get(port, "/graft/tasklist?status=FINISHED")
      assert(gc == 200 && finishedList.contains(s""""name":"$name"""")
        && !finishedList.contains(esc(badTarget).take(20)),
        s"status=FINISHED must keep the stream task, drop the failure: $finishedList")
      assert(get(port, "/graft/tasklist?status=nonsense")._2 == "[]")
      // single-task info + 404 contract + version
      val (ic, info) = get(port, s"/graft/info/$name")
      assert(ic == 200 && info.contains(""""rowsProcessed":"""), s"info: $info")
      assert(get(port, "/graft/info/no_such_task")._1 == 404)
      assert(get(port, "/graft/version")._1 == 200)
    } finally { server.stop(); spark.streams.removeListener(reg) }
  }
  private def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")

  test("HTTP transfer submission: transferOnce runs sync, transfer runs async, tasks/{ids} pages") {
    def http(port: Int, method: String, path: String, body: Option[String]): (Int, String) = {
      val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod(method)
      body.foreach { b =>
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        try os.write(b.getBytes("UTF-8")) finally os.close()
      }
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val out = scala.io.Source.fromInputStream(is, "UTF-8").mkString
      conn.disconnect()
      (code, out)
    }
    val reg = new graft.streaming.TaskRegistry.Listener
    val server = new graft.streaming.StatusServer(reg, transferSession = Some(spark))
    val port = server.start()
    try {
      val base = tmp("http_post")
      def cfg(out: String, cap: Int) = s"""{"Transfers": [{
        |  "Source": {"Path": "$sf/orders.parquet", "Format": "parquet"},
        |  "Target": "$out",
        |  "Filter": "o_orderkey <= $cap"
        |}]}""".stripMargin
      // --- transferOnce: synchronous, returns per-transfer results ---
      val expected = Tables.orders(spark, sf).filter(col("o_orderkey") <= 500).count()
      val (oc, once) = http(port, "POST", "/graft/transferOnce", Some(cfg(s"$base/once", 500)))
      assert(oc == 200 && once.contains(""""status":"ok"""")
        && once.contains(s""""rowsWritten":$expected"""), s"transferOnce: $once")
      assert(spark.read.parquet(s"$base/once").count() == expected)
      // --- transfer: async submit, completion observable via the registry ---
      val (ac, sub) = http(port, "POST", "/graft/transfer", Some(cfg(s"$base/async", 300)))
      assert(ac == 202 && sub.contains(""""status":"submitted"""")
        && sub.contains(esc(s"$base/async")), s"transfer submit: $sub")
      val deadline = System.currentTimeMillis() + 30000
      while (!Pipeline.BatchTasks.status(s"$base/async")
          .exists(_.state.isInstanceOf[Pipeline.BatchTasks.Finished])
          && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.read.parquet(s"$base/async").count() ==
        Tables.orders(spark, sf).filter(col("o_orderkey") <= 300).count())
      // --- tasks/{ids}: exact lookup, unknown ids skipped, paging ---
      val (tc, one) = http(port, "GET",
        s"/graft/tasks/${java.net.URLEncoder.encode(s"$base/once", "UTF-8")},no_such", None)
      assert(tc == 200 && one.contains(esc(s"$base/once"))
        && !one.contains("no_such"), s"tasks/{ids}: $one")
      assert(one.count(_ == '{') == 1, s"unknown ids must be skipped, got: $one")
      val (pc, page) = http(port, "GET", "/graft/tasks?limit=1", None)
      assert(pc == 200 && page.count(_ == '{') == 1, s"limit=1 must page: $page")
      // --- contracts: malformed body 400, GET on POST path 405, no session 503 ---
      assert(http(port, "POST", "/graft/transferOnce", Some("{nope"))._1 == 400)
      assert(http(port, "GET", "/graft/transfer", None)._1 == 405)
      val bare = new graft.streaming.StatusServer(reg)
      val barePort = bare.start()
      try assert(http(barePort, "POST", "/graft/transfer", Some(cfg(s"$base/x", 1)))._1 == 503)
      finally bare.stop()
    } finally server.stop()
  }

  test("env/runtime target variables expand into routing partitions and paths") {
    val target = tmp("envkey")
    // HOME is in any test environment; RuntimeKey carries $thread/$batchCount-style values
    val spec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      filterExpr = Some("o_orderkey <= 100"),
      routes = Seq(EnvKey("run_user", "USER", default = "unknown"),
        RuntimeKey("thread", "t7")))
    Pipeline.run(spark, spec, target)
    val back = spark.read.parquet(target)
    assert(back.select("thread").distinct().collect().map(_.getString(0)).toSeq == Seq("t7"))
    assert(back.select("run_user").distinct().count() == 1)
    assert(Pipeline.expandTarget("/data/##env.GRAFT_NOPE##/x") == "/data//x")
    assert(Pipeline.expandTarget("a ##env.HOME## b") ==
      s"a ${sys.env.getOrElse("HOME", "")} b")
    // <pwd> expands to the process working directory (reference
    // util.go:115 expandCurrentWorkingDirectory)
    assert(Pipeline.expandTarget("<pwd>/conf/transfers.json") ==
      s"${System.getProperty("user.dir")}/conf/transfers.json")
  }

  test("rowsWritten rides the write job — no post-write target re-read") {
    // VERDICT r5 #1: the old implementation re-read the target
    // (read.parquet(target).count()) for rowsWritten — an extra listing
    // + footer-scan job per transfer. Now the count is a second
    // observe() on the SAME write job, so a plain transfer runs exactly
    // ONE Spark job.
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.add(j.stageInfos.map(_.name).mkString("|"))
    }
    val spec = TransferSpec(
      source = SourceSpec(s"$sf/orders.parquet", Parquet),
      filterExpr = Some("o_orderkey <= 400"))
    val expected = Pipeline.plan(spark, spec).count()
    spark.sparkContext.addSparkListener(listener)
    val (written, errs) =
      try {
        val r = Pipeline.run(spark, spec, tmp("obs_rows"))
        // the listener bus is async — let the job-start event drain
        var waited = 0
        while (jobs.isEmpty && waited < 5000) { Thread.sleep(50); waited += 50 }
        Thread.sleep(300)
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(errs == 0 && written == expected,
      "observed row count must equal the planned row count")
    // two jobs are legitimate: the source read's schema-inference job
    // (read.parquet) and the write itself. The OLD code added a third +
    // fourth (target schema read + `count at Pipeline.scala`) — so the
    // proof of the fix is: no `count` job, nothing after the write.
    // Targeted assertions only (ADVICE r6): an absolute job-count bound
    // couples the test to Spark's internal job breakdown for a write
    // (schema-inference / committer / AQE jobs vary across versions).
    // The fix's signature is: no `count` job after the write, and no
    // second pass re-reading the target.
    val seen = jobs.toArray(Array.empty[String])
    assert(!seen.exists(_.contains("count at")),
      s"rowsWritten must not trigger a count job over the target, saw: ${seen.mkString(", ")}")
  }

  test("FAIR pools: per-class transfers land in their own scheduler pools (SURVEY §8)") {
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode") == "FAIR",
      "GraftSession must default to FAIR scheduling for multi-tenant transfers")
    val specs = Seq("'F'", "'O'").zipWithIndex.map { case (status, i) =>
      (TransferSpec(
        source = SourceSpec(s"$sf/orders.parquet", Parquet),
        filterExpr = Some(s"o_orderstatus = $status")),
        tmp(s"pool$i"))
    }
    val classes = Seq("scheduled", "backfill")
    val results = Pipeline.runAll(spark, specs, maxParallel = 2, poolFor = classes(_))
    // pools were created on demand and persist on the scheduler
    val root = spark.sparkContext.getAllPools.map(_.name)
    classes.foreach(c => assert(root.contains(c), s"pool $c missing from $root"))
    // and the results still equal the sequential plans
    specs.zip(results).foreach { case ((spec, _), (written, errs)) =>
      assert(errs == 0 && written == Pipeline.plan(spark, spec).count())
    }
  }

  test("MaxParallelTransfers: concurrent transfers equal their sequential runs") {
    val specs = Seq("'F'", "'O'", "'P'").zipWithIndex.map { case (status, i) =>
      (TransferSpec(
        source = SourceSpec(s"$sf/orders.parquet", Parquet),
        filterExpr = Some(s"o_orderstatus = $status"),
        transforms = Seq("price_band" -> "CAST(o_totalprice / 100000 AS INT)")),
        tmp(s"par$i"))
    }
    val results = Pipeline.runAll(spark, specs, maxParallel = 3)
    specs.zip(results).foreach { case ((spec, target), (written, errs)) =>
      assert(errs == 0)
      assert(written == Pipeline.plan(spark, spec).count(),
        s"parallel transfer to $target diverged from its sequential plan")
      assert(spark.read.parquet(target).count() == written)
    }
    assert(results.map(_._1).sum == Tables.orders(spark, sf).count())
  }

  test("jdbc load is idempotent and schema-mapped (Derby embedded)") {
    import graft.sources.Jdbc
    val dbDir = tmp("derby")
    val url = Jdbc.derbyUrl(dbDir)
    val src = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    Jdbc.load(src, url, "cust_spec", Some("c_mktsegment VARCHAR(16)"))
    Jdbc.load(src, url, "cust_spec", Some("c_mktsegment VARCHAR(16)"))
    val back = Jdbc.read(spark, url, "cust_spec")
    assert(back.count() == src.count(), "retried load must not duplicate rows")
    val a = back.agg(sum(col("c_acctbal").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    val b = src.agg(sum(col("c_acctbal").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    assert(a == b, "acctbal must survive the JDBC roundtrip exactly")
  }

  test("jdbc batch knobs: batchsize + connection-capped partitioned write (BatchSize analog)") {
    import graft.sources.Jdbc
    val url = Jdbc.derbyUrl(tmp("derby_batch"))
    val src = Tables.customer(spark, sf)
      .repartition(8) // many input partitions — the uncapped shape
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    // numPartitions=2 caps concurrent JDBC connections; batchsize=5000
    // sizes the executeBatch round trips (reference BatchSize /
    // MaxAllowedSize). Exactness must be unaffected.
    Jdbc.load(src, url, "cust_batch", Some("c_mktsegment VARCHAR(16)"),
      batchSize = Some(5000), numPartitions = Some(2))
    val back = Jdbc.read(spark, url, "cust_batch", fetchSize = Some(1000))
    assert(back.count() == src.count())
    val a = back.agg(sum(col("c_acctbal").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    val b = src.agg(sum(col("c_acctbal").cast("decimal(18,2)"))).collect()(0).getDecimal(0)
    assert(a == b, "batched load must stay exact")
  }

  test("SCD2 history: one current row per key, gap-free chained intervals, no no-op changes") {
    val hist = graft.operators.Etl.scd2History(spark, sf).collect()
      .groupBy(_.getAs[Long]("custkey"))
    val withOrders = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(hist.size == withOrders, "every customer with orders gets a history")
    // timestamps surface as java.time.LocalDateTime (TIMESTAMP_NTZ)
    def ts(r: org.apache.spark.sql.Row, c: String): java.time.LocalDateTime =
      r.getAs[java.time.LocalDateTime](c)
    hist.foreach { case (ck, rows) =>
      assert(rows.count(_.getAs[Boolean]("is_current")) == 1,
        s"customer $ck must have exactly one open row")
      def secs(t: java.time.LocalDateTime): Long =
        t.toEpochSecond(java.time.ZoneOffset.UTC)
      val ordered = rows.sortBy(r =>
        (secs(ts(r, "valid_from")),
          if (r.getAs[Boolean]("is_current")) Long.MaxValue
          else secs(ts(r, "valid_to"))))
      ordered.sliding(2).foreach {
        case Array(cur, nxt) =>
          // intervals chain without gaps and adjacent rows truly differ
          assert(ts(cur, "valid_to") == ts(nxt, "valid_from"),
            s"customer $ck: gap between ${cur} and ${nxt}")
          // same-date change bursts sort ambiguously among themselves;
          // across distinct dates adjacency == change order, where the
          // lag filter guarantees a real change
          if (ts(cur, "valid_from") != ts(nxt, "valid_from"))
            assert(cur.getAs[String]("priority") != nxt.getAs[String]("priority"),
              s"customer $ck: consecutive rows with identical priority")
        case _ => ()
      }
      assert(!ordered.last.getAs[Boolean]("is_current") ||
        ts(ordered.last, "valid_to").getYear == 9999)
    }
  }

  test("FileKey: decoded basenames survive a forced-shuffle enrich, never empty") {
    // The ADVICE r6 hazard: input_file_name() returns '' past any
    // exchange, so a FileKey routed AFTER a shuffle enrich would send
    // every row to one empty partition. applyStages now materializes
    // FileKey first; prove it under the worst case — broadcast joins
    // disabled so the enrich genuinely shuffles — with filenames that
    // also exercise the %-decode path (space) and the literal-plus
    // guard (url_decode alone would turn '+' into ' ').
    import org.apache.hadoop.fs.Path
    val base = tmp("filekey")
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$base/src"))
    val names = Seq("alpha one.parquet", "beta+2.parquet")
    names.zipWithIndex.foreach { case (n, i) =>
      Tables.events(spark, sf).filter(pmod(col("event_id"), lit(2)) === i)
        .filter(col("event_id") < 400)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .coalesce(1).write.mode("overwrite").parquet(s"$base/stage_$i")
      val part = fs.globStatus(new Path(s"$base/stage_$i/part-*"))(0).getPath
      fs.rename(part, new Path(s"$base/src/$n"))
    }
    val dim = Tables.events(spark, sf).select(col("user_id").as("dim_uid")).distinct()
      .withColumn("tier", (pmod(col("dim_uid"), lit(3))).cast("int"))
    val spec = TransferSpec(
      source = SourceSpec(s"$base/src", Parquet),
      enrich = Some(EnrichSpec(dim, ("user_id", "dim_uid"),
        Seq("tier" -> "user_tier"), broadcastDim = false)),
      routes = Seq(FileKey("src_file")))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val planned = Pipeline.plan(spark, spec)
      assert(planned.queryExecution.executedPlan.toString.contains("Exchange"),
        "test setup must force a shuffle enrich join")
      Pipeline.run(spark, spec, s"$base/out")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
    }
    val out = spark.read.parquet(s"$base/out")
    val keys = out.select("src_file").distinct().collect().map(_.getString(0)).sorted
    assert(keys.toSeq == names.sorted,
      s"expected decoded source basenames, got ${keys.toSeq}")
    assert(out.filter(col("src_file").isNull || col("src_file") === "").count() == 0)
    // per-file row counts survive the routed write exactly
    names.zipWithIndex.foreach { case (n, i) =>
      val expected = Tables.events(spark, sf)
        .filter(pmod(col("event_id"), lit(2)) === i && col("event_id") < 400).count()
      assert(out.filter(col("src_file") === n).count() == expected)
    }
  }

  test("task history is bounded at MaxHistory terminal entries; running tasks never evicted (task_registry.go:8)") {
    // batch registry: plant 30 finished + 2 running beyond whatever the
    // suite already recorded; newest terminals survive, running always do
    import Pipeline.BatchTasks
    (1 to 30).foreach { i =>
      BatchTasks.start(s"/hist/t$i")
      BatchTasks.finish(s"/hist/t$i", BatchTasks.Finished(i.toLong, 0L, 1))
    }
    BatchTasks.start("/hist/running1")
    BatchTasks.start("/hist/running2")
    val terminal = BatchTasks.tasksList().filter(_.state != BatchTasks.Running)
    assert(terminal.size <= BatchTasks.MaxHistory,
      s"terminal history ${terminal.size} exceeds cap ${BatchTasks.MaxHistory}")
    assert(BatchTasks.status("/hist/t30").isDefined, "newest terminal must survive")
    assert(BatchTasks.status("/hist/t1").isEmpty, "oldest terminal must roll off")
    assert(BatchTasks.status("/hist/running1").isDefined
      && BatchTasks.status("/hist/running2").isDefined,
      "running tasks are never evicted")
    BatchTasks.finish("/hist/running1", BatchTasks.Finished(0L, 0L, 1))
    BatchTasks.finish("/hist/running2", BatchTasks.Finished(0L, 0L, 1))

    // streaming registry: same policy through the listener's map
    import graft.streaming.TaskRegistry
    val reg = new TaskRegistry.Listener
    val runningId = java.util.UUID.randomUUID()
    reg.record(TaskRegistry.TaskStatus("live", runningId, TaskRegistry.Running, 1L, 10L, 0L))
    (1 to 30).foreach { i =>
      reg.record(TaskRegistry.TaskStatus(s"done$i", java.util.UUID.randomUUID(),
        TaskRegistry.Finished, 1L, 10L, i.toLong))
    }
    val streamTerminal = reg.tasksList().filter(_.state != TaskRegistry.Running)
    assert(streamTerminal.size == TaskRegistry.MaxHistory)
    assert(reg.status("done30").isDefined && reg.status("done1").isEmpty)
    assert(reg.status("live").isDefined, "running query survives any amount of history")
  }

  test("incremental agg: snapshot-plus-delta equals one-pass, delta scan is partition-pruned") {
    import graft.operators.Etl
    val got = Etl.incrementalAgg(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // one-pass recompute over the raw events — the merge-equals-recompute contract
    val full = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("tv"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == full, "incremental snapshot must equal the full recompute bit-for-bit")
    // pruning: the per-run delta reads ONLY its band's partitions — the dt
    // predicate must reach the file listing as a partition filter
    val staged = spark.read.parquet(
      s"${System.getProperty("java.io.tmpdir")}/graft_incagg_${ProcessHandle.current().pid()}/events")
    val days = staged.select(col("dt").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val delta = Etl.deltaScan(staged, days.take(days.length / 3))
    // sparkPlan, not executedPlan: AQE hides the scan inside
    // AdaptiveSparkPlanExec until execution
    val scan = delta.queryExecution.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "dt")),
      s"dt band must prune at listing, got filters: ${scan.partitionFilters}")
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.size).sum < staged.inputFiles.length,
      "pruned listing must read fewer files than the full table")
  }

  test("constraint suite: row-level rules share ONE aggregate job; counts exact") {
    import graft.plans.Constraints._
    val o = Tables.orders(spark, sf)
    // independent recompute of each count
    val expPrice = o.filter(!(col("o_totalprice") >= 0 && col("o_totalprice") <= 100000)).count()
    val expStatus = o.filter(!col("o_orderstatus").isin("O", "F")).count()
    val expDupCust = o.groupBy("o_custkey").count().filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L))).head().getLong(0)
    val got = graft.operators.Etl.qualityConstraints(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("price_cap") == expPrice && got("status_known") == expStatus)
    assert(got("one_order_per_customer") == expDupCust)
    assert(got("key_unique") == 0 && got("customer_fk") == 0 && got("key_not_null") == 0)
    // the one-pass claim: a row-level-only suite runs exactly ONE job
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.add(j.stageInfos.map(_.name).mkString("|"))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      check(o, Seq(
        NotNull("a", "o_orderkey"),
        InRange("b", "o_totalprice", 0, 100000),
        InSet("c", "o_orderstatus", Seq("O", "F")),
        Satisfies("d", "o_orderpriority LIKE '%-%'")))
      var waited = 0
      while (jobs.isEmpty && waited < 5000) { Thread.sleep(50); waited += 50 }
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    // AQE runs the single aggregate as (shuffle stage, result stage) —
    // up to 2 jobs. The property under test is that rules DON'T each
    // add their own scan: 4 rules must not mean 4+ jobs.
    assert(jobs.size <= 2,
      s"4 row-level rules must fold into one aggregate pass, saw ${jobs.size}: ${jobs}")
  }

  test("retention sweep drops exactly the expired partitions without scanning data") {
    import graft.operators.Etl
    val out = Etl.retentionSweep(spark, sf)
    val dts = out.collect().map(_.getString(0)).sorted
    assert(dts.nonEmpty && dts.forall(_ >= Etl.RetentionCutoff),
      s"expired partitions must be gone: ${dts.take(3)}")
    // the retained slice is complete: every source day >= cutoff survives
    val expect = Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("dt")).distinct()
      .collect().map(_.getString(0)).filter(_ >= Etl.RetentionCutoff).sorted
    assert(dts.toSeq == expect.toSeq, "retained partition set must equal the window")
    // and the physical layout agrees: only retained dt= dirs remain
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_retain_${ProcessHandle.current().pid()}"
    val dirs = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("dt=")).map(_.getName.stripPrefix("dt=")).sorted
    assert(dirs.toSeq == expect.toSeq, "sweep must unlink expired dirs on disk")
  }

  test("TimeWindow boundary lands at now − window for ANY session timezone (ADVICE r8 #1)") {
    val base = tmp("tzwin")
    Tables.orders(spark, sf).limit(10).select(col("o_orderkey"))
      .coalesce(1).write.parquet(s"$base/src")
    // plant a second batch whose mtime sits OUTSIDE the 1h window
    Tables.orders(spark, sf).limit(5).select(col("o_orderkey"))
      .coalesce(1).write.parquet(s"$base/old")
    val oldFile = new java.io.File(s"$base/old").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dest = new java.io.File(s"$base/src/old_batch.parquet")
    java.nio.file.Files.move(oldFile.toPath, dest.toPath)
    assert(dest.setLastModified(System.currentTimeMillis() - 2 * 3600L * 1000))
    val spec = SourceSpec(s"$base/src", Parquet,
      modifiedWithinMs = Some(3600L * 1000)) // 1h rolling window
    // sessions 12h behind and 14h ahead of the JVM zone (UTC in CI):
    // the unfixed JVM-wall-clock render silently reads ZERO files for
    // any session behind the JVM; the fix pins the effective boundary
    // at nowUTC − window under Spark's double-shifted filter compare
    for (tz <- Seq("UTC", "Etc/GMT+12", "Pacific/Kiritimati")) {
      val n = GraftSession.withSqlConfs(spark,
          "spark.sql.session.timeZone" -> tz) {
        Pipeline.read(spark, spec).count()
      }
      assert(n == 10, s"tz=$tz: fresh batch in, 2h-old batch out (got $n)")
    }
  }

  test("scheduled transfer refuses a declared TimeWindow loudly (ADVICE r8 #2)") {
    val spec = TransferSpec(source = SourceSpec(s"$sf/orders.parquet", Parquet,
      schemaDdl = Some("o_orderkey BIGINT"),
      modifiedWithinMs = Some(3600L * 1000)))
    val e = intercept[IllegalArgumentException] {
      Pipeline.runScheduled(spark, spec, tmp("schedwin"))
    }
    assert(e.getMessage.contains("TimeWindow"),
      s"refusal must name the ignored constraint: ${e.getMessage}")
  }

  test("Maintenance document parses to the hand-built planner doc, loud on unknowns (VERDICT r12 #7)") {
    import graft.operators.Similarity
    import graft.plans.ConfigJson
    // byte-parity of the PARSE: a hand-authored document (not the
    // serializer's output) must land on the default doc exactly
    val handJson = """{"Maintenance": {"Artifacts": [
      |{"Name": "bm25_main", "Family": "bm25", "Index": "incremental",
      | "Consults": ["df_staleness", "small_files"]},
      |{"Name": "ivf_compacted", "Family": "ivf", "Index": "compacted",
      | "Consults": ["coarse_drift", "list_imbalance", "small_files"]},
      |{"Name": "ivf_main", "Family": "ivf",
      | "Consults": ["coarse_drift", "list_imbalance", "small_files"]},
      |{"Name": "ivf_skewed", "Family": "ivf", "Index": "skewed",
      | "Consults": ["coarse_drift", "list_imbalance", "small_files"]},
      |{"Name": "ivfpq_main", "Family": "ivfpq",
      | "Consults": ["coarse_drift", "codebook_drift", "list_imbalance",
      |  "small_files"]}]}}""".stripMargin
    assert(ConfigJson.parseMaintenance(handJson) == Similarity.DefaultMaintDoc,
      "hand-authored document must parse to the default doc (Index " +
        "defaulting to incremental included)")
    // the serializer round-trips, including the Apply execution flag
    assert(ConfigJson.parseMaintenance(
      ConfigJson.maintenanceJson(Similarity.DefaultMaintDoc))
      == Similarity.DefaultMaintDoc)
    assert(ConfigJson.parseMaintenanceDoc(
      ConfigJson.maintenanceJson(Similarity.DefaultMaintDoc, apply = true))
      == ((Similarity.DefaultMaintDoc, true)))
    assert(!ConfigJson.parseMaintenanceDoc(handJson)._2,
      "Apply defaults to false — a document is a plan unless it says otherwise")
    val badApply = intercept[ConfigJson.ConfigError] {
      ConfigJson.parseMaintenanceDoc(
        """{"Maintenance":{"Apply":"yes","Artifacts":[{"Name":"a",
          |"Family":"ivf","Consults":["small_files"]}]}}""".stripMargin)
    }
    assert(badApply.getMessage.contains("Apply"), badApply.getMessage)
    // loud-error discipline: unknown KEYS name themselves
    val badTop = intercept[ConfigJson.ConfigError] {
      ConfigJson.parseMaintenance(
        """{"Maintenance":{"Artifacts":[{"Name":"a","Family":"ivf",
          |"Consults":["small_files"]}],"Schedule":"nightly"}}""".stripMargin)
    }
    assert(badTop.getMessage.contains("Schedule"), badTop.getMessage)
    val badArt = intercept[ConfigJson.ConfigError] {
      ConfigJson.parseMaintenance(
        """{"Maintenance":{"Artifacts":[{"Name":"a","Family":"ivf",
          |"Consults":["small_files"],"Bar":2}]}}""".stripMargin)
    }
    assert(badArt.getMessage.contains("Bar"), badArt.getMessage)
    intercept[ConfigJson.ConfigError] {
      ConfigJson.parseMaintenance("""{"Maintenance":{"Artifacts":[]}}""")
    }
    intercept[ConfigJson.ConfigError] {
      ConfigJson.parseMaintenance(
        """{"Maintenance":{"Artifacts":[{"Family":"ivf",
          |"Consults":["small_files"]}]}}""".stripMargin)
    }
    // unknown VALUES fail loudly in the registry (family/index/consult)
    val badKind = intercept[IllegalArgumentException] {
      Similarity.maintenancePlanFor(spark, sf, Seq(
        Similarity.MaintArtifact("x", "hnsw", "incremental",
          Seq("small_files"))))
    }
    assert(badKind.getMessage.contains("hnsw"), badKind.getMessage)
    val badConsult = intercept[IllegalArgumentException] {
      Similarity.maintenancePlanFor(spark, sf, Seq(
        Similarity.MaintArtifact("x", "ivf", "incremental",
          Seq("entropy_drift"))))
    }
    assert(badConsult.getMessage.contains("entropy_drift"),
      badConsult.getMessage)
  }

  test("declarative bars override consult thresholds, loud on unknown keys/values (VERDICT r13 #7)") {
    import graft.operators.Similarity
    import graft.plans.ConfigJson
    def planOf(json: String): Map[(String, String), Boolean] =
      ConfigJson.maintenancePlan(spark, sf, json).collect()
        .map(r => (r.getAs[String]("artifact"), r.getAs[String]("consult"))
          -> r.getAs[Boolean]("fired")).toMap
    // the balanced main does NOT fire under the registry default…
    val defJson = """{"Maintenance":{"Artifacts":[
      |{"Name":"ivf_main","Family":"ivf","Consults":["list_imbalance"]}]}}""".stripMargin
    assert(!planOf(defJson)(("ivf_main", "list_imbalance")),
      "registry default must not fire on the balanced main")
    // …but a declared 0.5× bar must (max·n_lists ≥ n_rows > 0.5·n_rows
    // on any non-degenerate layout)
    val fireJson = """{"Maintenance":{"Artifacts":[
      |{"Name":"ivf_main","Family":"ivf","Consults":["list_imbalance"],
      | "Bars":{"list_imbalance":0.5}}]}}""".stripMargin
    assert(planOf(fireJson)(("ivf_main", "list_imbalance")),
      "a 0.5x bar must fire on any layout")
    // the skewed artifact fires by default; a declared huge bar silences it
    val defSkew = """{"Maintenance":{"Artifacts":[
      |{"Name":"ivf_skewed","Family":"ivf","Index":"skewed",
      | "Consults":["list_imbalance"]}]}}""".stripMargin
    assert(planOf(defSkew)(("ivf_skewed", "list_imbalance")),
      "the skewed artifact must fire under the default 2x bar")
    val quietSkew = """{"Maintenance":{"Artifacts":[
      |{"Name":"ivf_skewed","Family":"ivf","Index":"skewed",
      | "Consults":["list_imbalance"],"Bars":{"list_imbalance":1000000}}]}}""".stripMargin
    assert(!planOf(quietSkew)(("ivf_skewed", "list_imbalance")),
      "a declared bar above the measured ratio must silence the consult")
    // round-trip with bars AND a hostile name (ADVICE r13 #3 escaping)
    val doc = Seq(Similarity.MaintArtifact("we\"ird\\name", "ivf",
      "incremental", Seq("small_files", "list_imbalance"),
      Map("small_files" -> 2.0, "list_imbalance" -> 2.5)))
    assert(ConfigJson.parseMaintenance(ConfigJson.maintenanceJson(doc)) == doc,
      "serialize → parse must round-trip bars and escaped names")
    // loud: a bar for a consult the artifact does not declare
    val badKey = intercept[ConfigJson.ConfigError] {
      ConfigJson.parseMaintenance("""{"Maintenance":{"Artifacts":[
        |{"Name":"a","Family":"ivf","Consults":["small_files"],
        | "Bars":{"coarse_drift":0.5}}]}}""".stripMargin)
    }
    assert(badKey.getMessage.contains("coarse_drift"), badKey.getMessage)
    // loud: a non-numeric bar
    val badVal = intercept[ConfigJson.ConfigError] {
      ConfigJson.parseMaintenance("""{"Maintenance":{"Artifacts":[
        |{"Name":"a","Family":"ivf","Consults":["small_files"],
        | "Bars":{"small_files":"two"}}]}}""".stripMargin)
    }
    assert(badVal.getMessage.contains("small_files"), badVal.getMessage)
    // loud: small_files bars must be whole file counts
    val badFrac = intercept[IllegalArgumentException] {
      Similarity.maintenancePlanFor(spark, sf, Seq(
        Similarity.MaintArtifact("a", "ivf", "incremental",
          Seq("small_files"), Map("small_files" -> 1.5))))
    }
    assert(badFrac.getMessage.contains("whole"), badFrac.getMessage)
  }
}
