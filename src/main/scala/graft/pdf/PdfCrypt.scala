package graft.pdf

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF STANDARD SECURITY HANDLER (ISO 32000-1 §7.6.2-7.6.3 and ISO
  * 32000-2 §7.6.4) for the empty-user-password class — the common
  * "encrypted but openable" web PDF. Revisions 2/3 (RC4-40..128),
  * 4 (/CF /StdCF with /CFM /V2 RC4 or /AESV2 AES-128-CBC) and 6
  * (PDF 2.0 /AESV3 AES-256 with the Algorithm-2.B hardened SHA-2
  * hash). The reference's lopdf path fails on encrypted documents,
  * so this is an EXTENSION in the CCITT/JBIG2 pattern.
  *
  * From-spec parts: the padding constant, Algorithm 2 file-key
  * derivation (MD5 chain, 50-fold for R≥3), Algorithm 7.2 per-object
  * key salting (obj/gen LE bytes + the AES "sAlT"), and the /O and /U
  * computation + verification (Algorithms 3/4/5). Cipher primitives
  * are the JDK's independent RC4/AES implementations — so a
  * derivation bug cannot be masked by a matching cipher bug, and the
  * fixture ENCRYPTION side shares only the published derivation
  * algorithms with decryption (round-trip + U-entry verification
  * evidence; no external encrypted corpus exists in the sandbox —
  * declared, like the other codec extensions).
  *
  * Scope: stream decryption (the whole extraction surface — content
  * streams, images, ToUnicode, ObjStm containers all flow through
  * streams) AND top-level string objects (Algorithm 1 with the same
  * per-object keys; V4 routes strings through the /StrF-named crypt
  * filter, R6 strings use the file key directly) — so [[PdfMeta]]'s
  * /Info, /URI, bookmark-title and form-value strings decode on the
  * encrypted class too. Unsupported schemes and wrong passwords are
  * a declared failure, never a wrong decode. */
object PdfCrypt {

  /** Subclasses [[PdfParseException]] so every load/extract fail-soft
    * path treats an undecryptable document like any unparseable one. */
  final class PdfCryptException(msg: String) extends PdfParseException(msg)

  /** The spec's 32-byte password padding constant (§7.6.3.3,
    * Algorithm 2 step a — published in ISO 32000-1 Table 21 context;
    * the same bytes appear in every PDF implementation). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def padded(pw: Array[Byte]): Array[Byte] =
    (pw.take(32) ++ Pad).take(32)

  private def leInt(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.isEmpty) return data // some producers emit /Length 0 streams
    val c = Cipher.getInstance("RC4")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "RC4")) // RC4 is symmetric
    c.doFinal(data)
  }

  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.isEmpty) return data // empty-in, empty-out (/Length 0 streams)
    if (data.length < 32 || data.length % 16 != 0)
      throw new PdfCryptException(s"AES payload length ${data.length} invalid")
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(data.take(16)))
    // corrupted ciphertext surfaces as the JDK's BadPaddingException /
    // IllegalBlockSizeException — re-class as the DECLARED parse-error
    // family so every fail-soft path treats a tampered encrypted
    // object like any other corrupt object, not a crash class
    try c.doFinal(data.drop(16))
    catch {
      case e: java.security.GeneralSecurityException =>
        throw new PdfCryptException(s"AES decrypt failed: ${e.getMessage}")
    }
  }

  /** Fixture-side AES-CBC encrypt with a DETERMINISTIC IV derived from
    * (num, gen) — fixtures must be byte-reproducible. */
  def aesEncrypt(key: Array[Byte], num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
    val iv = md5(leInt(num), leInt(gen), "graft-iv".getBytes("US-ASCII"))
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    iv ++ c.doFinal(data)
  }

  /** Algorithm 2: the file encryption key from the user password
    * (default empty). `lengthBits` = /Length (40 for V1). */
  def fileKey(oEntry: Array[Byte], p: Int, id0: Array[Byte], r: Int,
      lengthBits: Int, encryptMetadata: Boolean = true,
      userPw: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val n = lengthBits / 8
    // Algorithm 2 step f: R>=4 with /EncryptMetadata false appends
    // 0xFFFFFFFF to the digest input
    val metaTail =
      if (r >= 4 && !encryptMetadata) Array[Byte](-1, -1, -1, -1)
      else Array.emptyByteArray
    var key = md5(padded(userPw), oEntry.take(32), leInt(p), id0, metaTail)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key.take(n)); i += 1 }
    }
    key.take(n)
  }

  /** Algorithm 3 steps a-d: the RC4 key derived from the OWNER
    * password (falling back to the user password when empty, as the
    * spec directs). */
  private def ownerRc4Key(r: Int, lengthBits: Int, ownerPw: Array[Byte],
      userPw: Array[Byte]): Array[Byte] = {
    val n = if (r == 2) 5 else lengthBits / 8
    var ok = md5(padded(if (ownerPw.nonEmpty) ownerPw else userPw))
    if (r >= 3) { var i = 0; while (i < 50) { ok = md5(ok); i += 1 } }
    ok.take(n)
  }

  /** Algorithm 3: the /O entry (defaults = empty owner+user). */
  def computeO(r: Int, lengthBits: Int,
      ownerPw: Array[Byte] = Array.emptyByteArray,
      userPw: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val okey = ownerRc4Key(r, lengthBits, ownerPw, userPw)
    var o = rc4(okey, padded(userPw))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(okey.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Algorithm 7 (owner-password path), steps a-b: undo the /O entry's
    * RC4 chain with the owner-derived key, recovering the PADDED user
    * password — which then feeds Algorithm 2 as usual. RC4 is
    * symmetric, so "decrypt" is the i=19..0 chain in reverse. */
  def recoverUserPw(oEntry: Array[Byte], ownerPw: Array[Byte], r: Int,
      lengthBits: Int): Array[Byte] = {
    val okey = ownerRc4Key(r, lengthBits, ownerPw, ownerPw)
    var u = oEntry.take(32)
    if (r == 2) u = rc4(okey, u)
    else {
      var i = 19
      while (i >= 0) {
        u = rc4(okey.map(b => (b ^ i).toByte), u)
        i -= 1
      }
    }
    u
  }

  /** Algorithms 4 (R2) / 5 (R≥3): the /U entry from the file key. */
  def computeU(r: Int, key: Array[Byte], id0: Array[Byte]): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u ++ new Array[Byte](16) // arbitrary 16-byte tail (spec: "arbitrary padding")
    }

  /** Empty-user-password check (Algorithm 6): recompute U and compare
    * (first 16 bytes for R≥3). */
  def verifyEmptyUser(r: Int, key: Array[Byte], id0: Array[Byte],
      uEntry: Array[Byte]): Boolean = {
    val expect = computeU(r, key, id0)
    if (r == 2) java.util.Arrays.equals(expect, uEntry.take(32))
    else expect.take(16).sameElements(uEntry.take(16))
  }

  /** Algorithm 1 step b: per-object key = MD5(fileKey + num LE3 +
    * gen LE2 [+ sAlT for AES]), truncated to min(n+5, 16). */
  def objectKey(fileKey: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val salt =
      if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"
      else Array.emptyByteArray
    val ext = leInt(num).take(3) ++ leInt(gen).take(2)
    md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
  }

  /** Stream cipher mode: V4's /StmF may be /Identity, meaning streams
    * are NOT encrypted even in an encrypted document. */
  sealed trait StreamCipher
  case object IdentityStreams extends StreamCipher
  case object Rc4Streams extends StreamCipher
  case object AesStreams extends StreamCipher
  /** R6/AESV3: AES-256-CBC with the FILE key directly — R6 has no
    * per-object key derivation. */
  case object Aes256Streams extends StreamCipher

  /** The resolved handler: decrypts stream payloads per the stream
    * cipher mode and string objects per the (possibly distinct)
    * string cipher mode — V4's /StmF and /StrF name independent
    * crypt filters (§7.6.5); V1/V2 and R6 use one cipher for both. */
  final class StdSecurityHandler(val fileKey: Array[Byte], val mode: StreamCipher,
      val strMode: StreamCipher) {
    def this(fileKey: Array[Byte], mode: StreamCipher) = this(fileKey, mode, mode)
    private def applyCipher(m: StreamCipher, num: Int, gen: Int,
        data: Array[Byte], encrypt: Boolean): Array[Byte] =
      m match {
        case IdentityStreams => data
        case Aes256Streams =>
          if (encrypt) aesEncrypt(fileKey, num, gen, data)
          else aesDecrypt(fileKey, data)
        case _ =>
          val aes = m == AesStreams
          val k = objectKey(fileKey, num, gen, aes)
          if (!aes) rc4(k, data)
          else if (k.length != 16)
            // a pathological V4 dict can pair an AESV2 filter with a
            // short doc-level /Length: the truncated object key is not
            // a legal AES key — declared error, not a JDK crash class
            throw new PdfCryptException(
              s"AESV2 object key needs a 128-bit file key, got ${fileKey.length * 8} bits")
          else if (encrypt) aesEncrypt(k, num, gen, data)
          else aesDecrypt(k, data)
      }
    def decryptStream(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      applyCipher(mode, num, gen, data, encrypt = false)
    /** Fixture-side inverse. */
    def encryptStream(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      applyCipher(mode, num, gen, data, encrypt = true)
    /** Algorithm 1 over a STRING object's bytes (§7.6.2: strings use
      * the same per-object keys as streams, via the /StrF filter). */
    def decryptString(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      applyCipher(strMode, num, gen, data, encrypt = false)
    /** Fixture-side inverse for strings. */
    def encryptString(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      applyCipher(strMode, num, gen, data, encrypt = true)
  }

  // ---- R6 / AES-256 (ISO 32000-2 §7.6.4, the PDF 2.0 scheme) --------

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbcNoPad(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE,
      new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** The R6 "hardened" hash (Algorithm 2.B): SHA-256 start, then ≥64
    * rounds of AES-128-CBC over 64 repetitions of (pw ++ K [++ udata]),
    * hash choice per round driven by the ciphertext, until the last
    * byte of E ≤ round - 32. `udata` is the 48-byte /U entry when
    * hashing the OWNER password, empty otherwise. */
  def hash2b(pw0: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    val pw = pw0.take(127) // Algorithm 2.A step a: UTF-8 password truncated to 127 bytes
    var k = sha("SHA-256", pw, salt, udata)
    var e = Array.emptyByteArray
    var round = 0
    val c = Cipher.getInstance("AES/CBC/NoPadding") // hoisted: up to ~287 rounds
    while (round < 64 || (e.last & 0xff) > round - 32) {
      val block = pw ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1 }
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(k.take(16), "AES"),
        new IvParameterSpec(k.slice(16, 32)))
      e = c.doFinal(k1)
      val mod = (0 until 16).map(j => e(j) & 0xff).sum % 3
      k = sha(if (mod == 0) "SHA-256" else if (mod == 1) "SHA-384" else "SHA-512", e)
      round += 1
    }
    k.take(32)
  }

  /** R6 file key (Algorithm 2.A): try the supplied password as the
    * USER password against /U (48 bytes = hash(32) ++
    * validationSalt(8) ++ keySalt(8)) and decrypt /UE; else as the
    * OWNER password against /O (owner hashes also absorb the 48-byte
    * /U entry) and decrypt /OE. AES-256-CBC, zero IV, no padding. */
  def fileKeyR6(uEntry: Array[Byte], ueEntry: Array[Byte],
      oEntry: Option[Array[Byte]] = None, oeEntry: Option[Array[Byte]] = None,
      pw: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    if (uEntry.length < 48 || ueEntry.length < 32)
      throw new PdfCryptException("R6: /U or /UE entry too short")
    val vSalt = uEntry.slice(32, 40)
    val kSalt = uEntry.slice(40, 48)
    if (hash2b(pw, vSalt, Array.emptyByteArray).sameElements(uEntry.take(32))) {
      val ik = hash2b(pw, kSalt, Array.emptyByteArray)
      return aesCbcNoPad(encrypt = false, ik, new Array[Byte](16), ueEntry.take(32))
    }
    (oEntry, oeEntry) match {
      case (Some(o), Some(oe)) if o.length >= 48 && oe.length >= 32 =>
        val u48 = uEntry.take(48)
        if (hash2b(pw, o.slice(32, 40), u48).sameElements(o.take(32))) {
          val ik = hash2b(pw, o.slice(40, 48), u48)
          return aesCbcNoPad(encrypt = false, ik, new Array[Byte](16), oe.take(32))
        }
      case _ => ()
    }
    throw new PdfCryptException(
      if (pw.isEmpty)
        "document requires a non-empty user password (supply one via ExtractOptions.password)"
      else "wrong password (declared)")
  }

  /** Fixture-side R6 credential builder: deterministic salts, given
    * file key + passwords (default empty) → (U, UE, O, OE). The owner
    * hashes include the 48-byte U entry per spec. */
  def buildR6Entries(fileKey: Array[Byte], seed: Int,
      userPw: Array[Byte] = Array.emptyByteArray,
      ownerPw: Array[Byte] = Array.emptyByteArray): (Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    require(fileKey.length == 32, "R6 file key is 32 bytes")
    def salt(tag: Int) = (0 until 8).map(i => (i * 31 + tag + seed).toByte).toArray
    val (uv, uk, ov, ok) = (salt(1), salt(2), salt(3), salt(4))
    val uHash = hash2b(userPw, uv, Array.emptyByteArray)
    val u = uHash ++ uv ++ uk
    val ue = aesCbcNoPad(encrypt = true,
      hash2b(userPw, uk, Array.emptyByteArray), new Array[Byte](16), fileKey)
    val oHash = hash2b(ownerPw, ov, u)
    val o = oHash ++ ov ++ ok
    val oe = aesCbcNoPad(encrypt = true,
      hash2b(ownerPw, ok, u), new Array[Byte](16), fileKey)
    (u, ue, o, oe)
  }

  /** Resolve /CF → the /StmF-named crypt filter → its /CFM name and
    * optional /Length — the walk both V4 and V5 share. */
  private def cfmFor(enc: PDict, stmF: String,
      resolve: PdfObj => PdfObj): (String, Option[Long]) =
    resolve(enc.get("CF").getOrElse(PNull)) match {
      case d: PDict => resolve(d.get(stmF).getOrElse(PNull)) match {
        case f: PDict =>
          val m = resolve(f.get("CFM").getOrElse(PNull)) match {
            case PName(n) => n
            case other => throw new PdfCryptException(s"unsupported /CFM $other")
          }
          (m, resolve(f.get("Length").getOrElse(PNull)).asInt)
        case _ => throw new PdfCryptException(s"crypt filters without /CF /$stmF entry")
      }
      case _ => throw new PdfCryptException("crypt filters without /CF dict")
    }

  /** Build the handler from the trailer's /Encrypt dict + /ID, or
    * throw a DECLARED error for out-of-scope variants. `resolve`
    * dereferences indirect values inside the dict. `password` (UTF-8
    * bytes for R6 per Algorithm 2.A; Latin-1 bytes for R2-R4) is
    * tried as the USER password first, then as the OWNER password
    * (Algorithm 7 recovery for R2-R4, the /O-hash path for R6) —
    * the empty default preserves the no-password-openable class. */
  def forDocument(enc: PDict, id0: Array[Byte],
      resolve: PdfObj => PdfObj,
      password: Array[Byte] = Array.emptyByteArray): StdSecurityHandler = {
    def str(k: String): Array[Byte] = resolve(enc.get(k).getOrElse(PNull)) match {
      case PStr(b) => b
      case _ => throw new PdfCryptException(s"/Encrypt missing string /$k")
    }
    def int(k: String, dflt: Long): Long =
      resolve(enc.get(k).getOrElse(PNull)).asInt.getOrElse(dflt)
    resolve(enc.get("Filter").getOrElse(PNull)) match {
      case PName("Standard") => ()
      case other => throw new PdfCryptException(s"unsupported security filter $other")
    }
    val v = int("V", 0).toInt
    val r = int("R", 0).toInt
    if (v == 5) {
      // PDF 2.0 AES-256 (AESV3). R5 (the deprecated interim Adobe
      // scheme with an unhardened hash) is declared out of scope.
      if (r != 6) throw new PdfCryptException(s"unsupported encryption V=5 R=$r")
      def filterName5(k: String): String =
        resolve(enc.get(k).getOrElse(PNull)) match {
          case PName(n) => n; case _ => "Identity"
        }
      def strOpt(k: String): Option[Array[Byte]] =
        resolve(enc.get(k).getOrElse(PNull)) match {
          case PStr(b) => Some(b); case _ => None
        }
      def mode5(name: String): StreamCipher =
        if (name == "Identity") IdentityStreams
        else cfmFor(enc, name, resolve) match {
          case ("AESV3", _) => Aes256Streams
          case (other, _) => throw new PdfCryptException(s"unsupported V5 /CFM $other")
        }
      val (stm5, str5) = (mode5(filterName5("StmF")), mode5(filterName5("StrF")))
      val key5 = fileKeyR6(str("U"), str("UE"), strOpt("O"), strOpt("OE"), password)
      return new StdSecurityHandler(key5, stm5, str5)
    }
    if (!Set(1, 2, 4).contains(v) || !Set(2, 3, 4).contains(r))
      throw new PdfCryptException(s"unsupported encryption V=$v R=$r")
    // stream cipher mode + effective key length.
    //  - V1: fixed 40-bit RC4 (top-level /Length is V2/3-only).
    //  - V2: RC4, top-level /Length (default 40).
    //  - V4: per-crypt-filter. /StmF names the stream filter; the
    //    Identity name means streams are NOT encrypted and never
    //    appears inside /CF (§7.6.5). AESV2 is always 128-bit; a V2
    //    CFM takes its length from the filter's /Length — which many
    //    writers express in BYTES (16) rather than bits, so small
    //    values are scaled — falling back to the top-level /Length.
    val (mode: StreamCipher, strMode: StreamCipher, lengthBits: Int) = v match {
      case 1 => (Rc4Streams, Rc4Streams, 40)
      case 2 =>
        val lb = int("Length", 40).toInt
        if (lb < 40 || lb > 128 || lb % 8 != 0)
          throw new PdfCryptException(s"bad key length $lb")
        (Rc4Streams, Rc4Streams, lb)
      case _ => // v == 4: /StmF and /StrF name independent crypt filters
        def filterName(key: String): String =
          resolve(enc.get(key).getOrElse(PNull)) match {
            case PName(n) => n; case _ => "Identity"
          }
        def cfMode(name: String): (StreamCipher, Int) =
          if (name == "Identity")
            // that side plaintext (Identity never appears inside /CF,
            // §7.6.5); key length from the top-level /Length
            (IdentityStreams, math.max(40, int("Length", 40).toInt))
          else {
            val (cfmName, cfLenOpt) = cfmFor(enc, name, resolve)
            val cfLenRaw = cfLenOpt.getOrElse(int("Length", 128)).toInt
            // /CF /Length may be BYTES (Acrobat convention, e.g. 16) or
            // bits; values < 40 can only be bytes (5 = 40-bit), 40
            // itself can only be BITS (40 bytes = 320 > the 128-bit V4
            // max), so scale strictly-below-40 only
            val cfLen = if (cfLenRaw < 40) cfLenRaw * 8 else cfLenRaw
            cfmName match {
              case "AESV2" => (AesStreams, 128)
              case "V2" =>
                if (cfLen < 40 || cfLen > 128 || cfLen % 8 != 0)
                  throw new PdfCryptException(s"bad V4 key length $cfLen")
                (Rc4Streams, cfLen)
              case other => throw new PdfCryptException(s"unsupported /CFM $other")
            }
          }
        val (sm, sBits) = cfMode(filterName("StmF"))
        val (tm, tBits) = cfMode(filterName("StrF"))
        // the file key has ONE length; when streams are Identity the
        // STRING filter's /Length is the only real declaration (the
        // Acrobat bytes convention lives in the crypt filter, not the
        // top level) — falling back to the stream side's top-level
        // default would derive a wrong-length key and fail /U
        // verification on an openable document
        (sm, tm, if (sm != IdentityStreams) sBits else tBits)
    }
    val encryptMetadata = resolve(enc.get("EncryptMetadata").getOrElse(PNull)) match {
      case PBool(b) => b
      case _ => true
    }
    val (oE, uE, p) = (str("O"), str("U"), int("P", -1L).toInt)
    // the supplied password as USER password (Algorithm 2 + 6)
    val userKey = fileKey(oE, p, id0, r, lengthBits, encryptMetadata, password)
    if (verifyEmptyUser(r, userKey, id0, uE))
      return new StdSecurityHandler(userKey, mode, strMode)
    // else as OWNER password (Algorithm 7): undo /O to the padded user
    // password, re-derive, re-verify — also opens user-passworded docs
    // whose OWNER password is empty (the common web-PDF permissions
    // lock) with no password supplied at all
    val recovered = recoverUserPw(oE, password, r, lengthBits)
    val ownerKey = fileKey(oE, p, id0, r, lengthBits, encryptMetadata, recovered)
    if (verifyEmptyUser(r, ownerKey, id0, uE))
      return new StdSecurityHandler(ownerKey, mode, strMode)
    throw new PdfCryptException(
      if (password.isEmpty)
        "document requires a non-empty user password (supply one via ExtractOptions.password)"
      else "wrong password (declared)")
  }
}
