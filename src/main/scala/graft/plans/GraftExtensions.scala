package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Engine extensions: registers graft's custom Catalyst expressions for
  * SQL use. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; for an existing
  * session call [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => GraftFunctions.mkShingles(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[AsciiTokens].getName, "graft_tokens"),
      (exprs: Seq[Expression]) => AsciiTokens(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_hex_window"),
      new ExpressionInfo(classOf[HexWindowLong].getName, "graft_hex_window"),
      (exprs: Seq[Expression]) => GraftFunctions.mkHexWindow(exprs)))
    e.injectFunction((
      FunctionIdentifier("token_window_hash"),
      new ExpressionInfo(classOf[TokenWindowHash].getName, "token_window_hash"),
      (exprs: Seq[Expression]) => GraftFunctions.mkTokenWindowHash(exprs)))
    e.injectFunction((
      FunctionIdentifier("morton_key"),
      new ExpressionInfo(classOf[MortonKey].getName, "morton_key"),
      (exprs: Seq[Expression]) => MortonKey(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_srp_sig"),
      new ExpressionInfo(classOf[SrpSignature].getName, "graft_srp_sig"),
      (exprs: Seq[Expression]) => GraftFunctions.mkSrpSig(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_placeholder_null"),
      new ExpressionInfo(classOf[PlaceholderNull].getName, "graft_placeholder_null"),
      (exprs: Seq[Expression]) => GraftFunctions.mkPlaceholderNull(exprs)))
    // Spark's own (non-public-registry) bloom expressions, surfaced
    // under graft names: the build side of a semi-join reduction as a
    // TypedImperativeAggregate, and the codegen'd membership probe.
    // Same machinery Spark's InjectRuntimeFilter plants — exposed here
    // so an operator can build the filter over an EXPLICIT key set.
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (exprs: Seq[Expression]) =>
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1))))
    // scale guardrail (inert until spark.graft.planGuard=warn|fail)
    e.injectOptimizerRule(session => PlanGuard(session))
  }
}

object GraftFunctions {
  private[plans] def mkSrpSig(exprs: Seq[Expression]): SrpSignature =
    SrpSignature(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].intValue(),
      exprs(3).eval().asInstanceOf[Number].intValue())
  private[plans] def mkShingles(exprs: Seq[Expression]): WordShingles =
    WordShingles(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue())

  private[plans] def mkTokenWindowHash(exprs: Seq[Expression]): TokenWindowHash =
    TokenWindowHash(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue())

  private[plans] def mkHexWindow(exprs: Seq[Expression]): HexWindowLong =
    HexWindowLong(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].intValue())

  private[plans] def mkPlaceholderNull(exprs: Seq[Expression]): PlaceholderNull =
    PlaceholderNull(exprs.head, exprs.tail.map { e =>
      require(e.foldable, s"graft_placeholder_null tokens must be literals: $e")
      String.valueOf(e.eval())
    })

  /** Sessions already registered, weakly held (a dropped session must
    * not leak through the guard set). Registration is idempotent —
    * every entry point re-registers the same builders — so the guard
    * exists purely to kill the per-call cost: before round 12,
    * [[ensureRegistered]] ran the full 10-function
    * `createOrReplaceTempFunction` pass on EVERY Column-helper call
    * (a q22 build touches hex_window 100+ times → ~1300 registry
    * writes and as many "function replaced" WARN log lines per query
    * build — the WARN spam in the round-11 bench tail), and the
    * driver-side churn grew with every operator added. */
  private val registeredSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Late registration on an already-built session (temp functions).
    * First call per session does the work; repeats are a set lookup.
    * The session enters the guard set only AFTER registration
    * completes: marking it first would let a concurrent thread (Verify
    * runs 311 queries on a shared-session pool) skip out of register()
    * while the winner is mid-way through the 10 functions and analyze
    * a plan against a still-empty registry (UNRESOLVED_ROUTINE). Two
    * threads racing here may both run forceRegister — idempotent by
    * construction, so correctness needs no lock.
    *
    * The guarded path verifies ONE sentinel function still resolves
    * (a registry lookup, no write): if something dropped the session's
    * temp functions after it entered the guard set, every Column
    * helper would otherwise fail with UNRESOLVED_ROUTINE forever —
    * the guard set has no way to observe the drop (round-12 advice).
    * A missing sentinel falls back to [[forceRegister]]. */
  def register(spark: SparkSession): Unit =
    if (!registeredSessions.contains(spark)) {
      forceRegister(spark)
      registeredSessions.add(spark)
    } else if (!spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("rolling_hash"))) {
      forceRegister(spark)
    }

  /** Unconditional registration (re-registers even on a session the
    * guard has seen — for the rare case of dropped temp functions). */
  def forceRegister(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", mkShingles, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokens", exprs => AsciiTokens(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hex_window", mkHexWindow, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_window_hash", mkTokenWindowHash, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "morton_key", exprs => MortonKey(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_srp_sig", mkSrpSig, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_placeholder_null", mkPlaceholderNull, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }

  /** Column-API handles. Each helper self-registers on the thread's
    * active session (idempotent map put) so a pure Column builder like
    * Text.tokens can't be used before registration; explicit
    * [[register]] / [[GraftExtensions]] remain for SQL-text use and
    * sessions built on other threads. */
  /** Probe hook: when true, every Column-helper call re-runs the FULL
    * registration pass — the pre-round-12 behavior — so RegProbe can
    * A/B the per-call churn against the guarded path in one JVM. */
  @volatile private[graft] var perCallRegistration = false

  private def ensureRegistered(): Unit =
    SparkSession.getActiveSession.foreach { s =>
      if (perCallRegistration) forceRegister(s) else register(s)
    }

  def rolling_hash(c: Column): Column = {
    ensureRegistered()
    call_function("rolling_hash", c)
  }

  def word_shingles(tokens: Column, n: Int): Column = {
    ensureRegistered()
    call_function("word_shingles", tokens, org.apache.spark.sql.functions.lit(n))
  }

  def graft_dot(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("graft_dot", a, b)
  }

  def graft_tokens(lowered: Column): Column = {
    ensureRegistered()
    call_function("graft_tokens", lowered)
  }

  def hex_window(hexStr: Column, start: Int, len: Int): Column = {
    import org.apache.spark.sql.functions.lit
    ensureRegistered()
    call_function("graft_hex_window", hexStr, lit(start), lit(len))
  }

  def token_window_hash(tokens: Column, w: Int): Column = {
    ensureRegistered()
    call_function("token_window_hash", tokens,
      org.apache.spark.sql.functions.lit(w))
  }

  def morton_key(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("morton_key", a, b)
  }

  def srp_sig(vec: Column, band: Int, bits: Int, dim: Int): Column = {
    import org.apache.spark.sql.functions.lit
    ensureRegistered()
    call_function("graft_srp_sig", vec, lit(band), lit(bits), lit(dim))
  }

  /** Null out placeholder tokens (trimmed, case-insensitive) — the
    * codegen'd form of the ingest path's per-column normalization; see
    * [[PlaceholderNull]] for the measured rationale. */
  def placeholder_null(c: Column, tokens: Seq[String]): Column = {
    import org.apache.spark.sql.functions.lit
    ensureRegistered()
    call_function("graft_placeholder_null", (c +: tokens.map(lit)): _*)
  }

  /** Bloom build aggregate over a LONG key column (use xxhash64 for
    * other types). Returns one BINARY cell. */
  def bloom_agg(key: Column, estimatedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.functions.lit
    ensureRegistered()
    call_function("graft_bloom_agg", key, lit(estimatedItems), lit(numBits))
  }

  /** Membership probe. `bloom` must be foldable (a `lit` of collected
    * bytes) or a scalar subquery — Catalyst enforces this. */
  def might_contain(bloom: Column, key: Column): Column = {
    ensureRegistered()
    call_function("graft_might_contain", bloom, key)
  }
}
