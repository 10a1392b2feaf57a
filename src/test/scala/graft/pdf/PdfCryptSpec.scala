package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** Standard-security-handler evidence: cipher primitives are the
  * JDK's independent RC4/AES (a derivation bug cannot hide behind a
  * matching cipher bug); the from-spec key-derivation algorithms are
  * exercised by full-document round-trips through the real reader —
  * any single wrong byte in Algorithm 2/Algorithm 1 derails RC4/AES
  * output completely — plus U-entry verification and declared
  * failures for wrong passwords and unsupported schemes. */
class PdfCryptSpec extends AnyFunSuite {

  private def pageTexts(pdf: Array[Byte]): Vector[String] = {
    val doc = PdfDocument.load(pdf)
    doc.pages.map(p => ContentText.extractPageText(doc, p).trim)
  }

  test("RC4-128 (R3) encrypted document decrypts to the same page text as its plain twin") {
    val texts = Seq("rc4 secret alpha", "rc4 secret beta")
    val enc = PdfBuilder.withEncryption(aes = false, texts)
    assert(pageTexts(enc) == texts.toVector)
    // sanity: the encrypted bytes do NOT contain the plaintext
    val s = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!s.contains("rc4 secret"))
  }

  test("AES-128-CBC (R4 /AESV2) encrypted document decrypts to the same page text") {
    val texts = Seq("aes secret gamma", "aes secret delta")
    val enc = PdfBuilder.withEncryption(aes = true, texts)
    assert(pageTexts(enc) == texts.toVector)
    val s = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!s.contains("aes secret"))
  }

  test("per-object keys differ per object; ciphers round-trip through the JDK") {
    val key = (1 to 16).map(_.toByte).toArray
    val k5 = PdfCrypt.objectKey(key, 5, 0, aes = false)
    val k7 = PdfCrypt.objectKey(key, 7, 0, aes = false)
    assert(!k5.sameElements(k7), "object keys must differ by object number")
    assert(!PdfCrypt.objectKey(key, 5, 0, aes = true).sameElements(k5),
      "AES salt must change the key")
    val data = "the quick brown fox".getBytes("US-ASCII")
    assert(PdfCrypt.rc4(k5, PdfCrypt.rc4(k5, data)).toSeq == data.toSeq)
    assert(PdfCrypt.aesDecrypt(k5.take(16),
      PdfCrypt.aesEncrypt(k5.take(16), 5, 0, data)).toSeq == data.toSeq)
  }

  test("string objects round-trip per cipher family (rc4 / aes / aes256; /StrF honored)") {
    // handler-level round-trip: strMode drives string bytes
    val k16 = (1 to 16).map(_.toByte).toArray
    val k32 = (1 to 32).map(_.toByte).toArray
    val data = "string object payload é".getBytes("ISO-8859-1")
    for ((h, tag) <- Seq(
        new PdfCrypt.StdSecurityHandler(k16, PdfCrypt.Rc4Streams) -> "rc4",
        new PdfCrypt.StdSecurityHandler(k16, PdfCrypt.AesStreams) -> "aes",
        new PdfCrypt.StdSecurityHandler(k32, PdfCrypt.Aes256Streams) -> "aes256")) {
      val ct = h.encryptString(9, 0, data)
      assert(!ct.sameElements(data), s"$tag: must not be plaintext")
      assert(h.decryptString(9, 0, ct).toSeq == data.toSeq, tag)
    }
    // split-mode handler: /StmF Identity + /StrF RC4 (the fixture's
    // identityStreams shape) — streams pass through, strings decrypt
    val split = new PdfCrypt.StdSecurityHandler(k16,
      PdfCrypt.IdentityStreams, PdfCrypt.Rc4Streams)
    assert(split.decryptStream(3, 0, data).toSeq == data.toSeq)
    assert(split.decryptString(3, 0, split.encryptString(3, 0, data)).toSeq == data.toSeq)
    assert(!split.encryptString(3, 0, data).sameElements(data))
  }

  test("V4 /StmF Identity + /StrF V2: the file-key length comes from the STRING filter when streams are plaintext") {
    // no top-level /Length — the only length declaration is the crypt
    // filter's /Length 16 (bytes = 128 bits, the Acrobat convention);
    // deriving the key from the stream side's 40-bit default fails /U
    // verification and drops an openable document
    val id0 = (0 until 16).map(i => (i * 17 + 3).toByte).toArray
    val o = PdfCrypt.computeO(4, 128)
    val key = PdfCrypt.fileKey(o, -44, id0, 4, 128)
    val u = PdfCrypt.computeU(4, key, id0)
    val enc = PDict(Map(
      "Filter" -> PName("Standard"), "V" -> PInt(4), "R" -> PInt(4),
      "StmF" -> PName("Identity"), "StrF" -> PName("StdCF"),
      "CF" -> PDict(Map("StdCF" ->
        PDict(Map("CFM" -> PName("V2"), "Length" -> PInt(16))))),
      "P" -> PInt(-44), "O" -> PStr(o), "U" -> PStr(u)))
    val h = PdfCrypt.forDocument(enc, id0, identity)
    assert(h.mode == PdfCrypt.IdentityStreams && h.strMode == PdfCrypt.Rc4Streams)
    val data = "string under the 128-bit key".getBytes("US-ASCII")
    assert(h.decryptString(7, 0, h.encryptString(7, 0, data)).toSeq == data.toSeq)
    assert(h.decryptStream(7, 0, data).toSeq == data.toSeq, "streams stay plaintext")
  }

  test("/EncryptMetadata false changes the file key (Algorithm 2 step f) and still opens") {
    val texts = Seq("meta false page")
    val enc = PdfBuilder.withEncryption(aes = true, texts, encryptMetadata = false)
    assert(pageTexts(enc) == texts.toVector)
    // and the keys genuinely differ between the two metadata modes
    val id0 = (0 until 16).map(i => (i * 17 + 3).toByte).toArray
    val o = PdfCrypt.computeO(4, 128)
    val kTrue = PdfCrypt.fileKey(o, -44, id0, 4, 128, encryptMetadata = true)
    val kFalse = PdfCrypt.fileKey(o, -44, id0, 4, 128, encryptMetadata = false)
    assert(!kTrue.sameElements(kFalse))
  }

  test("V4 /StmF /Identity: streams are plaintext and extraction still works") {
    val texts = Seq("identity stream page")
    val enc = PdfBuilder.withEncryption(aes = false, texts, identityStreams = true)
    assert(pageTexts(enc) == texts.toVector)
    // the content IS in the clear in this variant (only strings would
    // be encrypted, and this fixture has none outside /Encrypt)
    val s = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.contains("identity stream page"))
  }

  test("AES-256 R6 (PDF 2.0 /AESV3): hardened-hash validation + file-key unwrap + decrypt") {
    val texts = Seq("aes256 secret one", "aes256 secret two")
    val enc = PdfBuilder.withEncryptionR6(texts)
    assert(pageTexts(enc) == texts.toVector)
    val s = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!s.contains("aes256 secret"))
    // the 2.B hardened hash is order-sensitive and salt-sensitive
    val a = PdfCrypt.hash2b("x".getBytes, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), Array.emptyByteArray)
    val b = PdfCrypt.hash2b("x".getBytes, Array[Byte](8, 7, 6, 5, 4, 3, 2, 1), Array.emptyByteArray)
    assert(a.length == 32 && !a.sameElements(b))
    // wrong /U hash (tampered validation) is the declared password error
    val fileKey = (0 until 32).map(i => (i * 7 + 11).toByte).toArray
    val (u, ue, _, _) = PdfCrypt.buildR6Entries(fileKey, seed = 5)
    assert(PdfCrypt.fileKeyR6(u, ue).toSeq == fileKey.toSeq,
      "unwrapped file key must round-trip through /UE")
    val badU = u.clone(); badU(0) = (badU(0) ^ 0x55).toByte
    val e = intercept[PdfCrypt.PdfCryptException] { PdfCrypt.fileKeyR6(badU, ue) }
    assert(e.getMessage.contains("password"))
  }

  test("V5 declared branches: R5 rejected, non-AESV3 CFM rejected, Identity streams honored") {
    val fileKey = (0 until 32).map(i => (i * 7 + 11).toByte).toArray
    val (u, ue, _, _) = PdfCrypt.buildR6Entries(fileKey, seed = 5)
    def encDict(r: Int, cfm: String, stmF: String) = PDict(Map(
      "Filter" -> PName("Standard"), "V" -> PInt(5), "R" -> PInt(r),
      "CF" -> PDict(Map("StdCF" -> PDict(Map("CFM" -> PName(cfm), "Length" -> PInt(32))))),
      "StmF" -> PName(stmF), "U" -> PStr(u), "UE" -> PStr(ue)))
    // R5 (the deprecated interim scheme) is a declared non-goal
    val e1 = intercept[PdfCrypt.PdfCryptException] {
      PdfCrypt.forDocument(encDict(5, "AESV3", "StdCF"), Array.emptyByteArray, identity)
    }
    assert(e1.getMessage.contains("V=5 R=5"))
    // a V5 filter that is not AESV3 must be rejected, not guessed at
    val e2 = intercept[PdfCrypt.PdfCryptException] {
      PdfCrypt.forDocument(encDict(6, "AESV2", "StdCF"), Array.emptyByteArray, identity)
    }
    assert(e2.getMessage.contains("CFM"))
    // /StmF /Identity under V5: key still validates, streams plaintext
    val h = PdfCrypt.forDocument(encDict(6, "AESV3", "Identity"), Array.emptyByteArray, identity)
    assert(h.mode == PdfCrypt.IdentityStreams && h.fileKey.toSeq == fileKey.toSeq)
    val data = "plain".getBytes
    assert(h.decryptStream(9, 0, data).toSeq == data.toSeq)
  }

  test("V4 /CF /Length 40 means BITS (spec-legal 40-bit RC4) and /Length 5 means bytes — both open") {
    // the old <=40 heuristic scaled 40 to 320 bits and rejected a
    // conformant document; 40 can only be bits (40 BYTES = 320 > the
    // 128-bit V4 max) while 5 can only be bytes
    val id0 = (0 until 16).map(i => (i * 17 + 3).toByte).toArray
    def handlerFor(cfLength: Int): PdfCrypt.StdSecurityHandler = {
      val o = PdfCrypt.computeO(4, 40)
      val key = PdfCrypt.fileKey(o, -44, id0, 4, 40, encryptMetadata = true)
      val u = PdfCrypt.computeU(4, key, id0)
      PdfCrypt.forDocument(PDict(Map(
        "Filter" -> PName("Standard"), "V" -> PInt(4), "R" -> PInt(4),
        "Length" -> PInt(40),
        "CF" -> PDict(Map("StdCF" -> PDict(Map(
          "CFM" -> PName("V2"), "Length" -> PInt(cfLength))))),
        "StmF" -> PName("StdCF"), "StrF" -> PName("StdCF"),
        "P" -> PInt(-44), "O" -> PStr(o), "U" -> PStr(u))), id0, identity)
    }
    val hBits = handlerFor(40)
    val hBytes = handlerFor(5)
    assert(hBits.mode == PdfCrypt.Rc4Streams)
    assert(hBits.fileKey.toSeq == hBytes.fileKey.toSeq,
      "40 (bits) and 5 (bytes) must derive the same 40-bit key")
  }

  private def openWith(pdf: Array[Byte], pw: String): Vector[String] = {
    val doc = PdfDocument.load(pdf, pw.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    doc.pages.map(p => ContentText.extractPageText(doc, p).trim)
  }

  test("non-empty USER password round-trips in rc4 / aes / aes256 modes; wrong pw is declared") {
    val texts = Seq("user pw page one", "user pw page two")
    val docs = Seq(
      PdfBuilder.withEncryption(aes = false, texts, userPw = "hunter2"),
      PdfBuilder.withEncryption(aes = true, texts, userPw = "hunter2"),
      PdfBuilder.withEncryptionR6(texts, userPw = "hunter2"))
    docs.foreach { pdf =>
      assert(openWith(pdf, "hunter2") == texts.toVector)
      val eMissing = intercept[PdfCrypt.PdfCryptException](openWith(pdf, ""))
      assert(eMissing.getMessage.contains("password"))
      val eWrong = intercept[PdfCrypt.PdfCryptException](openWith(pdf, "nope"))
      assert(eWrong.getMessage.contains("wrong password"))
    }
  }

  test("OWNER password opens the document: Algorithm 7 recovery (R3/R4), /O-hash path (R6)") {
    val texts = Seq("owner opened page")
    val docs = Seq(
      PdfBuilder.withEncryption(aes = false, texts, userPw = "usr", ownerPw = "admin"),
      PdfBuilder.withEncryption(aes = true, texts, userPw = "usr", ownerPw = "admin"),
      PdfBuilder.withEncryptionR6(texts, userPw = "usr", ownerPw = "admin"))
    docs.foreach { pdf =>
      assert(openWith(pdf, "admin") == texts.toVector, "owner password must open")
      assert(openWith(pdf, "usr") == texts.toVector, "user password must still open")
    }
    // classic recovery really is Algorithm 7: undoing /O yields the
    // padded user password byte-exactly
    val o = PdfCrypt.computeO(3, 128, "admin".getBytes, "usr".getBytes)
    val rec = PdfCrypt.recoverUserPw(o, "admin".getBytes, 3, 128)
    assert(rec.toSeq == ("usr".getBytes ++ PdfCrypt.Pad).take(32).toSeq)
  }

  test("non-empty password and unsupported schemes are DECLARED failures, fail-soft upstream") {
    // corrupt the /U entry: empty-password verification must fail with
    // the declared message, not mis-decrypt
    val enc = PdfBuilder.withEncryption(aes = false)
    val s = new String(enc, java.nio.charset.StandardCharsets.ISO_8859_1)
    val uAt = s.indexOf("/U <")
    val tampered = (s.substring(0, uAt + 4) + "00112233" + s.substring(uAt + 12))
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val e = intercept[PdfCrypt.PdfCryptException] { PdfDocument.load(tampered) }
    assert(e.getMessage.contains("password"))
    // the extractor face survives it as a failed doc, not an exception
    import graft.core.model._
    val res = graft.engine.Extractor.extractDoc(
      InterleavedDoc("enc", Seq(RawSpan("pdf_bytes",
        java.util.Base64.getEncoder.encodeToString(tampered), "", 0))),
      ExtractOptions())
    assert(res.doc.isEmpty, "tampered encrypted doc must fail soft")
  }

  test("file-key derivation is deterministic (regression pin) and R-sensitive") {
    val id0 = (0 until 16).map(i => (i * 17 + 3).toByte).toArray
    val o3 = PdfCrypt.computeO(3, 128)
    val k3 = PdfCrypt.fileKey(o3, -44, id0, r = 3, lengthBits = 128)
    val k3b = PdfCrypt.fileKey(o3, -44, id0, r = 3, lengthBits = 128)
    assert(k3.toSeq == k3b.toSeq && k3.length == 16)
    val k2 = PdfCrypt.fileKey(o3, -44, id0, r = 2, lengthBits = 40)
    assert(k2.length == 5 && !k3.take(5).sameElements(k2),
      "R2 skips the 50-fold MD5 and uses a 40-bit key")
    assert(PdfCrypt.verifyEmptyUser(3, k3, id0, PdfCrypt.computeU(3, k3, id0)))
    assert(!PdfCrypt.verifyEmptyUser(3, k2 ++ new Array[Byte](11), id0,
      PdfCrypt.computeU(3, k3, id0)))
  }
}
