package graft

import graft.functions.{GraftFunctions, Surt, SurtAlg}
import org.apache.spark.sql.functions._

/** Native Catalyst expressions vs the composed-builtin forms, plus base32
  * golden vectors computed through an independent BigInteger encoder. */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("surt_key_native == composed-builtin surt on the cdx url corpus") {
    GraftFunctions.register(spark)
    val diff = Cdx.df(spark, sfDir)
      .select(
        col("url"),
        expr("surt_key_native(url)").as("native"),
        Surt.surtKey(col("url")).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .collect()
    assert(diff.isEmpty, diff.take(5).mkString("\n"))
  }

  test("surt_key_native edge cases (interpreted path)") {
    assert(SurtAlg.surtKey("http://www.Example.com/Path?b=2&a=1") == "com,example)/path?a=1&b=2")
    assert(SurtAlg.surtKey("https://example.com") == "com,example)/")
    assert(SurtAlg.surtKey("http://u:p@host.org:8080/a#frag") == "org,host:8080)/a")
    assert(SurtAlg.surtKey("http://host.org:80/a") == "org,host)/a")
    assert(SurtAlg.surtKey("https://host.org:443/a") == "org,host)/a")
    assert(SurtAlg.surtKey("https://host.org:80/a") == "org,host:80)/a")
    assert(SurtAlg.surtKey("http://h.io?a=1") == "io,h)/?a=1")
    assert(SurtAlg.surtKey("not a url") == null)
    assert(SurtAlg.surtKey(null) == null)
  }

  test("IPv6 literal hosts keep their colons (native vs composed parity)") {
    GraftFunctions.register(spark)
    val urls = Seq("http://[2001:db8::1]/x", "http://[2001:DB8::1]:8080/y?b=1&a=2").toDF("url")
    val rows = urls.select(
        expr("surt_key_native(url)").as("native"),
        Surt.surtKey(col("url")).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    assert(rows.head.getString(0) == "[2001:db8::1])/x")
  }

  test("codegen and interpreted eval agree (nulls in the column)") {
    GraftFunctions.register(spark)
    val urls = Seq(
      Some("http://a.b/x"), None, Some("nourl"), Some("HTTPS://UP.example.ORG/Q?z=1&y=2"))
      .toDF("url")
    val rows = urls.selectExpr("surt_key_native(url) AS k").as[Option[String]].collect()
    assert(rows.toSeq == Seq(Some("b,a)/x"), None, None, Some("org,example,up)/q?y=2&z=1")))
  }

  test("simhash64 kernel == composed explode+agg on the documents corpus") {
    val docs = Tables.t(spark, sfDir, "documents")
    val native = ops.Dedup.simhash64Native(docs, "doc_id", "text")
    val composed = ops.Dedup.simhash64(docs, "doc_id", "text")
    val diff = native.as("n")
      .join(composed.as("c"), col("n.doc_id") === col("c.doc_id"), "full")
      .filter(not(col("n.simhash") <=> col("c.simhash")))
      .collect()
    assert(diff.isEmpty, diff.take(5).mkString("\n"))
  }

  test("simhash64 golden semantics: single token == its xxhash64; ties pack 0") {
    GraftFunctions.register(spark)
    // one token: every bit count is ±1, so the sketch IS the token's hash
    val one = Seq("hello").toDF("t")
      .selectExpr("simhash64(array(t)) AS s", "xxhash64(t) AS h")
      .head()
    assert(one.getLong(0) == one.getLong(1))
    // empty array: all 64 counts tie at 0 -> packs 0L; null array -> null
    val edge = Seq(
      ("emptyarr", Some(Array.empty[String])),
      ("nullarr", None)).toDF("k", "w")
      .selectExpr("k", "simhash64(w) AS s")
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(edge("emptyarr").contains(0L))
    assert(edge("nullarr").isEmpty)
    // multibyte tokens hash their UTF-8 bytes: the kernel over an explicit
    // array (tokenizer-free) must equal the explode+agg form over it
    val arrDf = Seq(Array("héllo", "wörld", "héllo")).toDF("w")
    val kernel = arrDf.selectExpr("simhash64(w) AS s").head().getLong(0)
    val viaAgg = arrDf.select(explode(col("w")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .agg((0 until 64)
        .map(b => sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b")).head,
        (1 until 64)
          .map(b => sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b")): _*)
      .selectExpr((0 until 64)
        .map(b => s"IF(s$b > 0, shiftleft(CAST(1 AS BIGINT), $b), CAST(0 AS BIGINT))")
        .mkString(" + ") + " AS s")
      .head().getLong(0)
    assert(kernel == viaAgg)
  }

  test("minhash_sig kernel == composed explode+min-agg on the documents corpus") {
    GraftFunctions.register(spark)
    val docs = Tables.t(spark, sfDir, "documents")
    val native = docs
      .select(col("doc_id"), ops.Dedup.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .selectExpr("doc_id",
        "minhash_sig(transform(sequence(1, size(w) - 2), " +
          "i -> concat_ws(' ', w[i-1], w[i], w[i+1])), 16) AS sig")
    val composed = ops.Dedup.minhashSignaturesComposed(docs, "doc_id", "text")
    val diff = native.as("n")
      .join(composed.as("c"), col("n.doc_id") === col("c.doc_id"), "full")
      .filter(not(col("n.sig") <=> col("c.sig")))
      .collect()
    assert(diff.isEmpty, diff.take(3).mkString("\n"))
  }

  test("minhash_sig golden semantics: seed chain, empty -> null, monotone under union") {
    GraftFunctions.register(spark)
    // single shingle: sig[k] == xxhash64(s, k) exactly (min over one value)
    val row = Seq("alpha beta gamma").toDF("s")
      .selectExpr("minhash_sig(array(s), 4) AS sig",
        "array(xxhash64(s, 0), xxhash64(s, 1), xxhash64(s, 2), xxhash64(s, 3)) AS expect")
      .head()
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
    // empty and null arrays -> null signature
    val nulls = Seq((Some(Array.empty[String]), 1), (None, 2)).toDF("w", "k")
      .selectExpr("minhash_sig(w, 4) AS sig").collect()
    assert(nulls.forall(_.isNullAt(0)))
    // signature of A ∪ B is the element-wise min of the signatures — the
    // mergeability MinHash's unionability rests on
    val m = Seq(
      ("a", Array("x y z", "p q r")),
      ("b", Array("p q r", "j k l")),
      ("ab", Array("x y z", "p q r", "j k l"))).toDF("k", "w")
      .selectExpr("k", "minhash_sig(w, 8) AS sig")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("ab") == m("a").zip(m("b")).map { case (x, y) => math.min(x, y) })
  }

  test("fused kernels match the relational tokenizer on unicode edge cases") {
    GraftFunctions.register(spark)
    // U+212A KELVIN SIGN lowercases to ASCII k; İ expands; emoji and
    // multibyte runs are separators; ASCII digits survive
    val texts = Seq(
      "Hello, World! 123",
      "Kelvin scale 42",             // K + elvin -> 'kelvin'
      "İstanbul ve İzmir",                 // dotted capital I
      "emoji😀split2tokens",
      "ångström σίσυφος straße",
      "a b c d e f",                       // many 1-char tokens
      "   ",                               // no tokens at all
      "ONE-token")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    // simhash: fused text kernel == array kernel over the relational tokens
    val sim = texts.selectExpr("doc_id",
        "simhash64_text(text) AS fused",
        "simhash64(filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')) AS viaArray",
        "size(filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')) AS ntok")
      .collect()
    sim.foreach { r =>
      if (r.getInt(3) == 0) assert(r.isNullAt(1), s"token-less text must fuse to null: $r")
      else assert(r.getLong(1) == r.getLong(2), s"fused != array kernel: $r")
    }
    // minhash: fused == array kernel over relational 2-gram shingles
    val mh = texts.selectExpr("doc_id",
        "minhash_sig_text(text, 8, 2) AS fused",
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '') AS w")
      .selectExpr("doc_id", "fused",
        "CASE WHEN size(w) >= 2 THEN minhash_sig(transform(sequence(1, size(w) - 1), " +
          "i -> concat_ws(' ', w[i-1], w[i])), 8) END AS viaArray")
      .collect()
    mh.foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(1), s"short text must fuse to null: $r")
      else assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"fused != array kernel: $r")
    }
  }

  test("vector kernels == composed HOF forms on the embeddings corpus (bit parity)") {
    GraftFunctions.register(spark)
    // consecutive-pair cosine + l2 through BOTH paths; <=> catches any
    // accumulation-order or formula drift (the oracle contract is the
    // HOF values, so parity must be exact, not approximate)
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    val a = e.select(col("vec_id"), col("ed").as("ea"))
    val b = e.select((col("vec_id") - 1).as("vec_id"), col("ed").as("eb"))
    val pairs = a.join(b, "vec_id")
    val dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    def nrm(c: String) = s"sqrt(aggregate($c, 0D, (acc, v) -> acc + v * v))"
    val diff = pairs
      .withColumn("cos_hof", expr(s"$dot / (${nrm("ea")} * ${nrm("eb")})"))
      .withColumn("cos_native", call_udf("cosine_sim", col("ea"), col("eb")))
      .withColumn("l2_hof", expr(
        "sqrt(aggregate(zip_with(ea, eb, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v))"))
      .withColumn("l2_native", call_udf("l2_dist", col("ea"), col("eb")))
      .withColumn("dot_hof", expr(dot))
      .withColumn("dot_native", call_udf("vec_dot", col("ea"), col("eb")))
      .filter(not(col("cos_hof") <=> col("cos_native")) ||
        not(col("l2_hof") <=> col("l2_native")) ||
        not(col("dot_hof") <=> col("dot_native")))
      .collect()
    assert(diff.isEmpty, diff.take(3).mkString("\n"))
  }

  test("vector kernels on length-mismatched vectors: NULL/zero like the HOF forms") {
    GraftFunctions.register(spark)
    // zip_with pads the shorter side with nulls -> HOF cosine/l2 are NULL
    // for a truncated vector; the kernels must agree, never score a prefix
    val rows = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0)),      // mismatched
      (Array(1.0, 2.0), Array(3.0, 4.0)))           // matched control
      .toDF("a", "b")
      .selectExpr(
        "cosine_sim(a, b) AS cosk", "l2_dist(a, b) AS l2k",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) / " +
          "(sqrt(aggregate(a, 0D, (acc, v) -> acc + v * v)) * " +
          "sqrt(aggregate(b, 0D, (acc, v) -> acc + v * v))) AS cosh",
        "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)) AS l2h",
        "vec_dot(a, b) AS dotk",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS doth")
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(2) && r.isNullAt(1) == r.isNullAt(3), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(2) && r.getDouble(1) == r.getDouble(3))
      assert(r.isNullAt(4) == r.isNullAt(5), r.toString)
      if (!r.isNullAt(4)) assert(r.getDouble(4) == r.getDouble(5))
    }
    // pq_encode: a row that doesn't tile the codebook -> NULL codes
    // (book = 2 centroids of 1 subspace, so valid rows have length 2)
    val enc = Seq(Array(1.0, 2.0, 3.0)).toDF("v") // length 3 != m*subDim = 2
      .selectExpr("pq_encode(v, array(array(0D, 0D), array(9D, 9D)), 2, 2) AS codes")
      .head()
    assert(enc.isNullAt(0), "non-tiling vector must encode to NULL")
    // a WRONG EXACT MULTIPLE (2x the true dim) must NOT reinterpret the
    // codebook as more subspaces — nCent keeps the shape authoritative
    val dbl = Seq(Array(1.0, 2.0, 3.0, 4.0)).toDF("v") // 2x the m*subDim = 2
      .selectExpr("pq_encode(v, array(array(0D, 0D), array(9D, 9D)), 2, 2) AS codes")
      .head()
    assert(dbl.isNullAt(0), "double-length vector must encode to NULL, not re-tile")
    // a null SLOT is row damage too
    val ns = Seq(1).toDF("k")
      .selectExpr("pq_encode(array(1D, CAST(NULL AS DOUBLE)), array(array(0D, 0D)), 2, 1) AS codes")
      .head()
    assert(ns.isNullAt(0), "null slot must encode to NULL")
    // a corrupt FOLDABLE codebook (mixed centroid lengths) is a plan
    // error: fails analysis, not a silent all-NULL column
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Array(1.0, 2.0)).toDF("v")
        .selectExpr("pq_encode(v, array(array(0D, 0D), array(9D)), 2, 2) AS codes")
        .head()
    }
    assert(bad.getMessage.contains("codebook"), bad.getMessage)
    // null-slot cosine parity: kernel NULL == HOF NULL
    val nc = Seq(1).toDF("k")
      .selectExpr("cosine_sim(array(1D, CAST(NULL AS DOUBLE)), array(1D, 1D)) AS c")
      .head()
    assert(nc.isNullAt(0), "a null element must propagate to NULL like zip_with")
    // vec_sub == zip_with difference; NULL on mismatch
    val vs = Seq((Array(3.0, 5.0), Array(1.0, 2.0))).toDF("a", "b")
      .selectExpr("vec_sub(a, b) AS k", "zip_with(a, b, (x, y) -> x - y) AS h")
      .head()
    assert(vs.getSeq[Double](0) == vs.getSeq[Double](1))
    val vm = Seq((Array(3.0, 5.0), Array(1.0))).toDF("a", "b")
      .selectExpr("vec_sub(a, b) AS k").head()
    assert(vm.isNullAt(0), "mismatched vec_sub must be NULL")
    val vn = Seq(1).toDF("k")
      .selectExpr("vec_sub(array(1D, CAST(NULL AS DOUBLE)), array(1D, 1D)) AS s").head()
    assert(vn.isNullAt(0), "a null slot must NULL the whole vec_sub result")
    // lsh_bucket: mismatched vector leaves every bit unset (HOF IF-else 0)
    val b = Seq(Array(1.0, 1.0, 1.0)).toDF("v")
      .selectExpr("lsh_bucket(v, array(array(1D, 1D))) AS bucket").head()
    assert(b.getInt(0) == 0)
  }

  test("pq_encode == relational explode+join+argmin-window codes") {
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sfDir, "embeddings")
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("ed"))
    // relational reference: the round-3 pqTopK encode shape
    val sub = e
      .select(col("vec_id"), explode(expr("sequence(0, 3)")).as("j"), col("ed"))
      .withColumn("sub", expr("slice(ed, j * 16 + 1, 16)"))
      .select("vec_id", "j", "sub")
    val cent = sub.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("j").as("cj"), col("sub").as("csub"))
    val dist = sub.join(broadcast(cent), col("j") === col("cj"))
      .withColumn("dist", expr(
        "sqrt(aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v))"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "j").orderBy(col("dist").asc, col("cid").asc)
    val relational = dist.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("vec_id").agg(sort_array(collect_list(struct(col("j"), col("cid")))).as("jc"))
      .selectExpr("vec_id", "transform(jc, x -> CAST(x.cid AS INT)) AS codes")
    // kernel path with the SAME reserved-vector codebook
    val bookRows = e.filter(col("vec_id") < 16).orderBy("vec_id").collect()
    val book = (0 until 4).flatMap { j =>
      bookRows.map(_.getSeq[Double](1).toArray.slice(j * 16, (j + 1) * 16).toSeq)
    }
    val native = e.select(col("vec_id"),
      call_udf("pq_encode", col("ed"), typedLit(book), lit(16), lit(16)).as("codes"))
    val mism = native.as("n").join(relational.as("r"), Seq("vec_id"))
      .filter(not(col("n.codes") <=> col("r.codes"))).collect()
    assert(mism.isEmpty, mism.take(3).mkString("\n"))
  }

  test("base32 golden vectors (independent BigInteger encoder)") {
    // independent re-implementation for cross-checking
    def b32ref(bytes: Array[Byte]): String = {
      val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
      val bits = bytes.flatMap(b => (7 to 0 by -1).map(i => (b >> i) & 1))
      bits.grouped(5).map { g =>
        val padded = g.padTo(5, 0)
        alphabet(padded.foldLeft(0)((acc, b) => (acc << 1) | b))
      }.mkString
    }
    val rnd = new scala.util.Random(3)
    for (n <- Seq(0, 1, 2, 5, 19, 20, 64)) {
      val bytes = new Array[Byte](n); rnd.nextBytes(bytes)
      assert(SurtAlg.base32(bytes) == b32ref(bytes), s"length $n")
    }
    // RFC 4648 test vector (unpadded): "foobar" -> MZXW6YTBOI
    assert(SurtAlg.base32("foobar".getBytes("UTF-8")) == "MZXW6YTBOI")
    // sha1("abc") in the pywb digest dialect
    GraftFunctions.register(spark)
    val digest = Seq("abc").toDF("s")
      .selectExpr("base32(unhex(sha1(s))) AS d").as[String].head()
    assert(digest == b32ref(
      java.security.MessageDigest.getInstance("SHA-1").digest("abc".getBytes("UTF-8"))))
    assert(digest.length == 32) // 160 bits -> exactly 32 base32 chars
  }
  test("kernel guards on corrupt model artifacts: NULL/skip, never NPE") {
    GraftFunctions.register(spark)
    // a NON-FOLDABLE codebook column holding a NULL subvector: analysis-time
    // validation only covers foldable books, so the kernel itself must NULL
    // the row's codes instead of NPEing the executor task
    val nb = Seq((Array(1.0, 2.0), Array(Array(0.0, 0.0), null)))
      .toDF("v", "book")
      .selectExpr("pq_encode(v, book, 2, 2) AS codes")
      .head()
    assert(nb.isNullAt(0), "null codebook entry must NULL the codes, not NPE")
    // lsh_bucket: a NULL plane slot leaves THAT bit unset (its dot is NULL
    // in the composed IF form -> else branch -> 0); valid planes still set theirs
    val np = Seq(Array(1.0, 1.0)).toDF("v")
      .selectExpr("lsh_bucket(v, array(array(1D, 1D), CAST(NULL AS ARRAY<DOUBLE>))) AS bucket")
      .head()
    assert(np.getInt(0) == 1, s"valid plane sets bit 0, null plane skipped: got ${np.getInt(0)}")
    // a plane containing a null ELEMENT is likewise skipped, later planes unaffected
    val ne = Seq(Array(1.0, 1.0)).toDF("v")
      .selectExpr("lsh_bucket(v, array(array(1D, CAST(NULL AS DOUBLE)), array(1D, 1D))) AS bucket")
      .head()
    assert(ne.getInt(0) == 2, s"null-element plane skipped, valid plane sets bit 1: got ${ne.getInt(0)}")
    // the driver twin l2DistArr treats a dimension mismatch as a SHAPE BUG
    // (mis-built ADC table / codebook) -> fail loudly, never score a prefix
    intercept[IllegalArgumentException] {
      graft.functions.VecAlg.l2DistArr(Array(1.0, 2.0), Array(1.0))
    }
  }

  test("pq_adc == the driver-built ADC table path; row damage NULLs, never NPEs") {
    GraftFunctions.register(spark)
    // book: m=2 subspaces × nCent=2 centroids of subDim=2, flat j·nCent+c
    val book = Array(
      Array(0.0, 0.0), Array(1.0, 1.0), // subspace 0
      Array(2.0, 2.0), Array(3.0, 3.0)) // subspace 1
    val res = Array(0.5, 0.5, 2.5, 2.5)
    val codes = Array(1, 0)
    // driver reference: the exact table arithmetic ivfpqProbe runs —
    // per-subspace l2DistArr, summed left-to-right
    val expected =
      graft.functions.VecAlg.l2DistArr(Array(0.5, 0.5), book(1)) +
        graft.functions.VecAlg.l2DistArr(Array(2.5, 2.5), book(2))
    val bookLit = org.apache.spark.sql.functions.typedLit(book.map(_.toSeq).toSeq)
    val got = Seq((res, codes)).toDF("res", "codes")
      .select(org.apache.spark.sql.functions.call_udf("pq_adc",
        col("res"), col("codes"), bookLit, org.apache.spark.sql.functions.lit(2)).as("d"))
      .head()
    assert(!got.isNullAt(0) && got.getDouble(0) == expected,
      s"pq_adc must equal the ADC-table sum bit-for-bit: got $got, want $expected")
    // row damage -> NULL: wrong code count, out-of-range code, wrong
    // residual length, and (non-foldable book) a null codebook entry
    val damaged = Seq(
      (res, Array(1)), // m mismatch
      (res, Array(1, 5)), // code out of range
      (Array(0.5, 0.5), codes) // residual length != m·subDim
    ).toDF("res", "codes")
      .select(org.apache.spark.sql.functions.call_udf("pq_adc",
        col("res"), col("codes"), bookLit, org.apache.spark.sql.functions.lit(2)).as("d"))
      .collect()
    assert(damaged.forall(_.isNullAt(0)), s"damaged rows must NULL: ${damaged.mkString(",")}")
    // codes (1, 0) reference flat entries 1 and 2 — nulls at 0 and 3 are
    // unreferenced (and entry 0 being null also proves subDim derives
    // from the residual, not the first book entry)
    val nullEntry = Seq((res, codes, Array(null, Array(1.0, 1.0), Array(2.0, 2.0), null)))
      .toDF("res", "codes", "book")
      .selectExpr("pq_adc(res, codes, book, 2) AS d")
      .head()
    assert(!nullEntry.isNullAt(0),
      "an unreferenced null entry in a non-foldable book must not poison valid rows")
    val nullHit = Seq((res, Array(0, 0), Array(Array(0.0, 0.0), null, null, Array(3.0, 3.0))))
      .toDF("res", "codes", "book")
      .selectExpr("pq_adc(res, codes, book, 2) AS d")
      .head()
    assert(nullHit.isNullAt(0), "a REFERENCED null codebook entry must NULL the row, not NPE")
    // analysis-time: a foldable book with a wrong shape fails the PLAN
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((res, codes)).toDF("res", "codes")
        .selectExpr("pq_adc(res, codes, array(array(1D, 2D), array(3D)), 2)")
        .head()
    }
    assert(e.getMessage.contains("pq_adc"), s"unexpected analysis error: ${e.getMessage}")
  }

  test("winnow_fps_text kernel == composed HOF form on the documents corpus") {
    val docs = Tables.t(spark, sfDir, "documents")
    // both paths end in distinct (doc_id, fp) rows; bit parity = equal sets
    val native = ops.Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
    val composed = ops.Dedup.winnowFingerprintsComposed(docs, "doc_id", "text", k = 3, w = 4)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "kernel and composed winnow fingerprint sets differ")
  }

  test("CJK parity: fused kernels == composed sketchTokens forms on a mixed-script corpus") {
    GraftFunctions.register(spark)
    // the kernel's byte-level CJK arm and the relational sketchTokens
    // twin must agree bit-for-bit on every script mix — pure CJK, mixed
    // CJK+Latin, kana, Hangul, and plain Latin
    val docs = Seq(
      (1L, "機械学習のモデルを訓練するためのデータセット"),
      (2L, "mixed 漢字 and latin tokens 深層学習 2024"),
      (3L, "한국어 문서 중복 제거 테스트"),
      (4L, "plain latin text with no cjk at all"),
      (5L, "ひらがなとカタカナのテキスト")
    ).toDF("doc_id", "text")
    val mhNative = docs
      .select(col("doc_id"), ops.Dedup.sketchTokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .selectExpr("doc_id",
        "minhash_sig(transform(sequence(1, size(w) - 2), " +
          "i -> concat_ws(' ', w[i-1], w[i], w[i+1])), 16) AS sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val mhFused = docs.selectExpr("doc_id", "minhash_sig_text(text, 16, 3) AS sig")
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(mhFused == mhNative, s"minhash CJK divergence:\nfused $mhFused\narray $mhNative")
    val mhComposed = ops.Dedup.minhashSignaturesComposed(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(mhComposed == mhFused, s"composed/fused CJK divergence")
    val wnNative = ops.Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
    val wnComposed = ops.Dedup.winnowFingerprintsComposed(docs, "doc_id", "text", k = 3, w = 4)
    assert(wnNative.exceptAll(wnComposed).isEmpty && wnComposed.exceptAll(wnNative).isEmpty,
      "winnow CJK divergence between kernel and composed")
    val shNative = ops.Dedup.simhash64Native(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shComposed = ops.Dedup.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shNative == shComposed, s"simhash CJK divergence: $shNative vs $shComposed")
    // a pure-CJK doc must actually produce tokens (the Latin-only rule
    // reduced it to zero and skipped it)
    assert(mhFused.contains(1L) && mhFused.contains(3L) && mhFused.contains(5L))
  }

  test("winnow_fps_text edge semantics: short docs, truncated window, nulls") {
    GraftFunctions.register(spark)
    val rows = Seq(
      (1L, "alpha beta"),           // 2 tokens < k=3 -> null
      (2L, "alpha beta gamma"),     // 1 shingle < w -> its own hash, one fp
      (3L, "a b c d e"),            // 3 shingles < w=4 -> ONE truncated window
      (4L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .selectExpr("id", "winnow_fps_text(t, 3, 4) AS fps")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(rows(1L) == null && rows(4L) == null)
    assert(rows(2L).length == 1)
    val oneShingleHash = Seq("alpha beta gamma").toDF("t")
      .selectExpr("xxhash64(t) AS h").collect().head.getLong(0)
    assert(rows(2L).head == oneShingleHash, "single shingle winnows to its own xxhash64")
    // doc 3: hashes of 'a b c','b c d','c d e'; one truncated window -> global min
    val hs = Seq("a b c", "b c d", "c d e").toDF("t")
      .selectExpr("xxhash64(t) AS h").collect().map(_.getLong(0))
    assert(rows(3L) == Seq(hs.min))
  }

  test("char_entropy kernel equals the composed explode form on the documents corpus") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.t(spark, sfDir, "documents")
    val kernel = docs
      .select(col("doc_id"), org.apache.spark.sql.functions.call_udf("char_entropy", col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val chars = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
    val freq = chars.groupBy("doc_id", "ch").count()
    val tot = chars.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val composed = freq.join(tot, "doc_id")
      .withColumn("p", col("count") / col("n"))
      .groupBy("doc_id").agg((-sum(col("p") * log(col("p")))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kernel.keySet == composed.keySet)
    kernel.foreach { case (id, h) =>
      assert(math.abs(h - composed(id)) < 1e-9, s"doc $id: kernel $h vs composed ${composed(id)}")
    }
    // edge semantics: null in → null out; empty and single-char → 0
    val edge = Seq[(java.lang.Long, String)]((1L, ""), (2L, "aaaa"), (3L, null))
      .toDF("id", "t").selectExpr("char_entropy(t) AS h").collect()
    assert(edge(0).getDouble(0) == 0.0 && edge(1).getDouble(0) == 0.0 && edge(2).isNullAt(0))
  }

  test("bloom_might_contain kernel == BloomFilter.mightContainString on the documents corpus") {
    GraftFunctions.register(spark)
    val docs = Tables.t(spark, sfDir, "documents")
    // filter built over HALF the corpus so both arms (member and
    // non-member) are exercised, including the FPR side
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val bf = hist.stat.bloomFilter("text", math.max(hist.count(), 1L << 10), 0.03)
    val bfBytes = { val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray }
    val rows = docs
      .select(col("doc_id"), col("text"),
        call_udf("bloom_might_contain", col("text"), lit(bfBytes)).as("k"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = r.getString(1) != null && bf.mightContainString(r.getString(1))
      assert(r.getBoolean(2) == expected, s"doc ${r.getLong(0)} kernel vs driver probe mismatch")
    }
    // no false negatives by construction: every member probes true
    val members = hist.select(
      call_udf("bloom_might_contain", col("text"), lit(bfBytes)).as("k"))
      .filter(!col("k")).count()
    assert(members == 0L, "bloom must have no false negatives")
    // edge semantics: null text probes FALSE (prefilter contract), not NULL
    val edge = Seq[(java.lang.Long, String)]((1L, null))
      .toDF("id", "t")
      .select(call_udf("bloom_might_contain", col("t"), lit(bfBytes)).as("k"))
      .collect()
    assert(!edge(0).isNullAt(0) && !edge(0).getBoolean(0))
    // misuse fails at analysis, not inside a task: non-foldable filter
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(call_udf("bloom_might_contain", col("text"),
        col("text").cast("binary")).as("k")).collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("bpe_piece_count kernel == Bpe.applyMerges fold on the documents corpus") {
    GraftFunctions.register(spark)
    val docs = Tables.t(spark, sfDir, "documents")
    val merges = graft.ops.Bpe.train(
      graft.ops.Bpe.wordFreq(docs.limit(200), "text"), nMerges = 12)
      .map(m => (m.left, m.right))
    assert(merges.nonEmpty)
    val mergesLit = lit(graft.functions.BpeAlg.serialize(merges))
    val rows = docs.limit(200)
      .select(col("doc_id"),
        graft.ops.Dedup.tokens(col("text")).as("w"),
        call_udf("bpe_piece_count",
          graft.ops.Dedup.tokens(col("text")), mergesLit).as("k"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = r.getSeq[String](1)
        .map(w => graft.ops.Bpe.applyMerges(w, merges).size).sum
      assert(r.getInt(2) == expected, s"doc ${r.getLong(0)} kernel vs reference fold")
    }
    // overlap semantics ('aaaa' under (a,a) -> [aa, aa]) and the fused
    // cascade ((a,a) then (aa,aa) -> one piece) — the exact fold contract
    val tricky = Seq((1L, Seq("aaaa")), (2L, Seq("aaa")), (3L, Seq("ab", "ba")))
      .toDF("id", "w")
    val trickyMerges = Seq(("a", "a"), ("aa", "aa"))
    val tl = lit(graft.functions.BpeAlg.serialize(trickyMerges))
    val got = tricky.select(col("id"), call_udf("bpe_piece_count", col("w"), tl).as("k"))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    val want = Seq(Seq("aaaa"), Seq("aaa"), Seq("ab", "ba")).map(
      _.map(w => graft.ops.Bpe.applyMerges(w, trickyMerges).size).sum)
    assert(got == want, s"$got vs $want")
    assert(got(0) == 1, "aaaa -> [aa,aa] -> [aaaa]")
    // NULL array -> NULL (the UDF's null-in/null-out)
    val edge = Seq(Tuple1[Seq[String]](null)).toDF("w")
      .select(call_udf("bpe_piece_count", col("w"), tl).as("k")).collect()
    assert(edge(0).isNullAt(0))
    // misuse fails at analysis: non-foldable merge table
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      tricky.select(call_udf("bpe_piece_count", col("w"),
        col("id").cast("string").cast("binary")).as("k")).collect()
    }
    assert(e2.getMessage.contains("literal"), e2.getMessage)
  }

  test("multi_contains kernel == exists(contains) HOF at a realistic 400-term list") {
    GraftFunctions.register(spark)
    // terms like C4's badwords list in shape: mostly misses, some hits
    // sampled from the cdx url grammar, overlapping prefixes included
    val terms: Seq[String] =
      (0 until 380).map(i => s"zzz-blocked-$i") ++
        Seq("/order/13", "/order/134", "a=4", "b=2&a", "low.example",
          "order/7", ".example.org/ord", "http://www.med", "?b=", "9?b")
    val tl = typedLit(terms)
    val diff = Cdx.df(spark, sfDir)
      .select(col("url"),
        call_udf("multi_contains", lower(col("url")), tl).as("kernel"),
        exists(tl, t => contains(lower(col("url")), t)).as("hof"))
      .filter(not(col("kernel") <=> col("hof")))
      .collect()
    assert(diff.isEmpty, diff.take(5).mkString("\n"))
    // and the hit arm is genuinely exercised (a vacuous all-false parity
    // would pass while matching nothing)
    val hits = Cdx.df(spark, sfDir)
      .filter(call_udf("multi_contains", lower(col("url")), tl)).count()
    assert(hits > 0, "the term list must hit the corpus somewhere")

    // edge cases: term at start/end, overlap resolution, empty term
    def m(hay: String, ts: Seq[String]): Boolean =
      Seq(hay).toDF("h")
        .select(call_udf("multi_contains", col("h"), typedLit(ts)).as("m"))
        .head().getBoolean(0)
    assert(m("abcd", Seq("ab")) && m("abcd", Seq("cd")) && m("abcd", Seq("abcd")))
    assert(!m("abcd", Seq("abcde", "bce")))
    assert(m("xabcz", Seq("abcd", "abc")), "shorter overlapping term must still hit")
    assert(m("anything", Seq("zzz", "")), "empty term matches everything (contains convention)")
    assert(!m("anything", Seq.empty[String]), "empty LIST matches nothing")
    // null ELEMENTS skip (documented divergence from the HOF's
    // three-valued exists — Blocklist.gateWith sanitizes nulls out
    // before either arm, so the arms never see one)
    assert(!m("anything", Seq(null, "zzz")) && m("has-zzz-here", Seq(null, "zzz")))
    // unicode bytes match byte-level, the UTF8String.contains semantics
    assert(m("pre-café-post", Seq("café")) && !m("pre-cafe-post", Seq("café")))
    // NULL haystack -> NULL; misuse (non-foldable terms) fails at analysis
    val nullRow = Seq(Tuple1[String](null)).toDF("h")
      .select(call_udf("multi_contains", col("h"), typedLit(Seq("x"))).as("m")).head()
    assert(nullRow.isNullAt(0))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("a", Seq("a"))).toDF("h", "ts")
        .select(call_udf("multi_contains", col("h"), col("ts"))).collect()
    }
    assert(e3.getMessage.contains("literal"), e3.getMessage)
  }

  // ------------------------------------------------- heavy_hitters (MG)

  test("heavy_hitters: exact at ample capacity, equals GROUP BY under any partitioning") {
    GraftFunctions.register(spark)
    val rows = (0L until 20000L).map(i => i % 97) // 97 distinct, uniform-ish
    def run(parts: Int): Seq[(Long, Long)] =
      rows.toDF("k").repartition(parts)
        .agg(expr("heavy_hitters(k, 128)").as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.key"), col("e.cnt")).as[(Long, Long)].collect().toSeq
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val one = run(1)
    assert(one.toMap == exact, "capacity 128 > 97 distinct must be exact")
    assert(run(13) == one, "merge must be partitioning-independent on the exact path")
    // eval ordering: count desc, key asc
    assert(one == one.sortBy { case (k, c) => (-c, k) })
  }

  test("heavy_hitters: Misra-Gries bound at tight capacity — undercount ≤ n/(cap+1), hot keys retained") {
    GraftFunctions.register(spark)
    // skewed: keys 0..4 hot (2000 each), 500 singleton tail keys
    val rows = (0L until 5L).flatMap(k => Seq.fill(2000)(k)) ++ (100L until 600L)
    val n = rows.size
    val cap = 8
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1, 7).foreach { parts =>
      val got = rows.toDF("k").repartition(parts)
        .agg(expr(s"heavy_hitters(k, $cap)").as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.key"), col("e.cnt")).as[(Long, Long)].collect().toMap
      assert(got.size <= cap, s"state must stay capacity-bounded: ${got.size}")
      got.foreach { case (k, c) =>
        assert(c <= exact(k), s"parts=$parts: reported $c > true ${exact(k)} for $k")
        assert(exact(k) - c <= n / (cap + 1),
          s"parts=$parts: undercount ${exact(k) - c} breaks the n/(cap+1)=${n / (cap + 1)} bound")
      }
      (0L until 5L).foreach(k => assert(got.contains(k),
        s"parts=$parts: hot key $k (freq 2000 > ${n / (cap + 1)}) must be retained"))
    }
  }

  test("agg_heavy_hitters driver key matches the exact top-20 at sf0.001") {
    val got = SparkEntry.queries("agg_heavy_hitters")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    val want = Tables.events(spark, sfDir).groupBy("user_id").count()
      .as[(Long, Long)].collect().sortBy { case (k, c) => (-c, k) }.take(20).toSeq
    assert(got == want, s"got ${got.take(5)}... want ${want.take(5)}...")
  }

}
