package graft.pdf

/** The four simple-font encodings of ISO 32000-1 Annex D (Latin
  * character set): StandardEncoding, MacRomanEncoding,
  * WinAnsiEncoding and PDFDocEncoding, complete — built from the
  * published Annex D.2 table (the same Adobe constants every PDF
  * implementation ships; the reference inherits them from lopdf's
  * `encodings` module). Each is a 256-entry byte → String table where
  * `""` marks a code the encoding leaves UNDEFINED — callers decide
  * whether undefined decodes as a replacement char, and
  * [[ContentText]] counts them as `unmapped_codes` (never a silent
  * drop).
  *
  * Notable spec behaviors preserved exactly:
  *  - StandardEncoding maps 0o47 → quoteright (’) and 0o140 →
  *    quoteleft (‘), NOT the ASCII apostrophe/grave — quotesingle
  *    lives at 0o251 and grave at 0o301;
  *  - WinAnsiEncoding: unused codes above 0o40 map to bullet
  *    (Annex D footnote 3) and 0o240/0o255 duplicate space/hyphen
  *    (footnotes 5-6);
  *  - MacRomanEncoding 0o312 duplicates space (footnote 4); the
  *    non-Latin Mac OS symbol slots (notequal, infinity, apple, …)
  *    are NOT in the Annex-D Latin set and stay undefined;
  *  - PDFDocEncoding (text strings, not fonts) packs the accents at
  *    0o30-0o37 and the publishing glyphs at 0o200-0o236.
  */
object Encodings {

  /** Glyph name → character for every name the Annex-D Latin set uses
    * (an Adobe Glyph List subset), plus the handful of extras the
    * /Differences path historically resolved. */
  val glyphChars: Map[String, Char] = {
    val m = scala.collection.mutable.HashMap.empty[String, Char]
    // ASCII block names
    val asciiNames = Vector(
      "space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
      "ampersand", "quotesingle", "parenleft", "parenright", "asterisk",
      "plus", "comma", "hyphen", "period", "slash", "zero", "one", "two",
      "three", "four", "five", "six", "seven", "eight", "nine", "colon",
      "semicolon", "less", "equal", "greater", "question", "at")
    asciiNames.zipWithIndex.foreach { case (n, i) => m(n) = (32 + i).toChar }
    ('A' to 'Z').foreach(c => m(c.toString) = c)
    m("bracketleft") = '['; m("backslash") = '\\'; m("bracketright") = ']'
    m("asciicircum") = '^'; m("underscore") = '_'; m("grave") = '`'
    ('a' to 'z').foreach(c => m(c.toString) = c)
    m("braceleft") = '{'; m("bar") = '|'; m("braceright") = '}'
    m("asciitilde") = '~'
    // Latin-1 letters
    m("Agrave") = 'À'; m("Aacute") = 'Á'; m("Acircumflex") = 'Â'; m("Atilde") = 'Ã'
    m("Adieresis") = 'Ä'; m("Aring") = 'Å'; m("AE") = 'Æ'; m("Ccedilla") = 'Ç'
    m("Egrave") = 'È'; m("Eacute") = 'É'; m("Ecircumflex") = 'Ê'; m("Edieresis") = 'Ë'
    m("Igrave") = 'Ì'; m("Iacute") = 'Í'; m("Icircumflex") = 'Î'; m("Idieresis") = 'Ï'
    m("Eth") = 'Ð'; m("Ntilde") = 'Ñ'
    m("Ograve") = 'Ò'; m("Oacute") = 'Ó'; m("Ocircumflex") = 'Ô'; m("Otilde") = 'Õ'
    m("Odieresis") = 'Ö'; m("Oslash") = 'Ø'
    m("Ugrave") = 'Ù'; m("Uacute") = 'Ú'; m("Ucircumflex") = 'Û'; m("Udieresis") = 'Ü'
    m("Yacute") = 'Ý'; m("Thorn") = 'Þ'; m("germandbls") = 'ß'
    m("agrave") = 'à'; m("aacute") = 'á'; m("acircumflex") = 'â'; m("atilde") = 'ã'
    m("adieresis") = 'ä'; m("aring") = 'å'; m("ae") = 'æ'; m("ccedilla") = 'ç'
    m("egrave") = 'è'; m("eacute") = 'é'; m("ecircumflex") = 'ê'; m("edieresis") = 'ë'
    m("igrave") = 'ì'; m("iacute") = 'í'; m("icircumflex") = 'î'; m("idieresis") = 'ï'
    m("eth") = 'ð'; m("ntilde") = 'ñ'
    m("ograve") = 'ò'; m("oacute") = 'ó'; m("ocircumflex") = 'ô'; m("otilde") = 'õ'
    m("odieresis") = 'ö'; m("oslash") = 'ø'
    m("ugrave") = 'ù'; m("uacute") = 'ú'; m("ucircumflex") = 'û'; m("udieresis") = 'ü'
    m("yacute") = 'ý'; m("thorn") = 'þ'; m("ydieresis") = 'ÿ'
    // Latin Extended + publishing set
    m("Lslash") = 'Ł'; m("lslash") = 'ł'; m("OE") = 'Œ'; m("oe") = 'œ'
    m("Scaron") = 'Š'; m("scaron") = 'š'; m("Zcaron") = 'Ž'; m("zcaron") = 'ž'
    m("Ydieresis") = 'Ÿ'; m("dotlessi") = 'ı'
    m("quoteleft") = '‘'; m("quoteright") = '’'
    m("quotedblleft") = '“'; m("quotedblright") = '”'
    m("quotesinglbase") = '‚'; m("quotedblbase") = '„'
    m("endash") = '–'; m("emdash") = '—'; m("bullet") = '•'
    m("dagger") = '†'; m("daggerdbl") = '‡'; m("ellipsis") = '…'
    m("perthousand") = '‰'; m("guilsinglleft") = '‹'; m("guilsinglright") = '›'
    m("guillemotleft") = '«'; m("guillemotright") = '»'
    m("fi") = 'ﬁ'; m("fl") = 'ﬂ'; m("fraction") = '⁄'; m("florin") = 'ƒ'
    m("trademark") = '™'; m("minus") = '−'; m("Euro") = '€'
    // Latin-1 punctuation / signs
    m("exclamdown") = '¡'; m("cent") = '¢'; m("sterling") = '£'; m("currency") = '¤'
    m("yen") = '¥'; m("brokenbar") = '¦'; m("section") = '§'; m("dieresis") = '¨'
    m("copyright") = '©'; m("ordfeminine") = 'ª'; m("logicalnot") = '¬'
    m("registered") = '®'; m("macron") = '¯'; m("degree") = '°'; m("plusminus") = '±'
    m("twosuperior") = '²'; m("threesuperior") = '³'; m("acute") = '´'; m("mu") = 'µ'
    m("paragraph") = '¶'; m("periodcentered") = '·'; m("cedilla") = '¸'
    m("onesuperior") = '¹'; m("ordmasculine") = 'º'; m("onequarter") = '¼'
    m("onehalf") = '½'; m("threequarters") = '¾'; m("questiondown") = '¿'
    m("multiply") = '×'; m("divide") = '÷'
    // spacing accents
    m("circumflex") = 'ˆ'; m("caron") = 'ˇ'; m("breve") = '˘'; m("dotaccent") = '˙'
    m("ring") = '˚'; m("ogonek") = '˛'; m("tilde") = '˜'; m("hungarumlaut") = '˝'
    m.toMap
  }

  /** Annex D.2, verbatim: "name std mac win pdf" with octal codes,
    * `-` = the encoding leaves the glyph out. ASCII rows whose code is
    * identical across all four encodings are generated below instead
    * of listed (Annex D prints them; the values are the ASCII ones) —
    * EXCEPT quoteright/quotesingle and quoteleft/grave, where
    * StandardEncoding differs, listed explicitly. */
  private val annexD = """
    AE 341 256 306 306
    Aacute - 347 301 301
    Acircumflex - 345 302 302
    Adieresis - 200 304 304
    Agrave - 313 300 300
    Aring - 201 305 305
    Atilde - 314 303 303
    Ccedilla - 202 307 307
    Eacute - 203 311 311
    Ecircumflex - 346 312 312
    Edieresis - 350 313 313
    Egrave - 351 310 310
    Eth - - 320 320
    Euro - - 200 240
    Iacute - 352 315 315
    Icircumflex - 353 316 316
    Idieresis - 354 317 317
    Igrave - 355 314 314
    Lslash 350 - - 225
    Ntilde - 204 321 321
    OE 352 316 214 226
    Oacute - 356 323 323
    Ocircumflex - 357 324 324
    Odieresis - 205 326 326
    Ograve - 361 322 322
    Oslash 351 257 330 330
    Otilde - 315 325 325
    Scaron - - 212 227
    Thorn - - 336 336
    Uacute - 362 332 332
    Ucircumflex - 363 333 333
    Udieresis - 206 334 334
    Ugrave - 364 331 331
    Yacute - - 335 335
    Ydieresis - 331 237 230
    Zcaron - - 216 231
    aacute - 207 341 341
    acircumflex - 211 342 342
    acute 302 253 264 264
    adieresis - 212 344 344
    ae 361 276 346 346
    agrave - 210 340 340
    aring - 214 345 345
    atilde - 213 343 343
    breve 306 371 - 030
    brokenbar - - 246 246
    bullet 267 245 225 200
    caron 317 377 - 031
    ccedilla - 215 347 347
    cedilla 313 374 270 270
    cent 242 242 242 242
    circumflex 303 366 210 032
    copyright - 251 251 251
    currency 250 333 244 244
    dagger 262 240 206 201
    daggerdbl 263 340 207 202
    degree - 241 260 260
    dieresis 310 254 250 250
    divide - 326 367 367
    dotaccent 307 372 - 033
    dotlessi 365 365 - 232
    eacute - 216 351 351
    ecircumflex - 220 352 352
    edieresis - 221 353 353
    egrave - 217 350 350
    ellipsis 274 311 205 203
    emdash 320 321 227 204
    endash 261 320 226 205
    eth - - 360 360
    exclamdown 241 301 241 241
    fi 256 336 - 223
    fl 257 337 - 224
    florin 246 304 203 206
    fraction 244 332 - 207
    germandbls 373 247 337 337
    grave 301 140 140 140
    guillemotleft 253 307 253 253
    guillemotright 273 310 273 273
    guilsinglleft 254 334 213 210
    guilsinglright 255 335 233 211
    hungarumlaut 315 375 - 034
    iacute - 222 355 355
    icircumflex - 224 356 356
    idieresis - 225 357 357
    igrave - 223 354 354
    logicalnot - 302 254 254
    lslash 370 - - 233
    macron 305 370 257 257
    minus - - - 212
    mu - 265 265 265
    multiply - - 327 327
    ntilde - 226 361 361
    oacute - 227 363 363
    ocircumflex - 231 364 364
    odieresis - 232 366 366
    oe 372 317 234 234
    ogonek 316 376 - 035
    ograve - 230 362 362
    onehalf - - 275 275
    onequarter - - 274 274
    onesuperior - - 271 271
    ordfeminine 343 273 252 252
    ordmasculine 353 274 272 272
    oslash 371 277 370 370
    otilde - 233 365 365
    paragraph 266 246 266 266
    periodcentered 264 341 267 267
    perthousand 275 344 211 213
    plusminus - 261 261 261
    questiondown 277 300 277 277
    quotedblbase 271 343 204 214
    quotedblleft 252 322 223 215
    quotedblright 272 323 224 216
    quoteleft 140 324 221 217
    quoteright 047 325 222 220
    quotesinglbase 270 342 202 221
    quotesingle 251 047 047 047
    registered - 250 256 256
    ring 312 373 - 036
    scaron - - 232 235
    section 247 244 247 247
    sterling 243 243 243 243
    thorn - - 376 376
    threequarters - - 276 276
    threesuperior - - 263 263
    tilde 304 367 230 037
    trademark - 252 231 222
    uacute - 234 372 372
    ucircumflex - 236 373 373
    udieresis - 237 374 374
    ugrave - 235 371 371
    yacute - - 375 375
    ydieresis - 330 377 377
    yen 245 264 245 245
    zcaron - - 236 236
  """

  private def build(): (Array[String], Array[String], Array[String], Array[String]) = {
    val std = Array.fill[String](256)("")
    val mac = Array.fill[String](256)("")
    val win = Array.fill[String](256)("")
    val pdf = Array.fill[String](256)("")
    // ASCII rows identical across the four encodings (Annex D prints
    // each; the deviating Standard rows are in the table above and
    // OVERWRITE these: 047 quoteright, 140 quoteleft)
    (0x20 to 0x7e).foreach { i =>
      val s = i.toChar.toString
      std(i) = s; mac(i) = s; win(i) = s; pdf(i) = s
    }
    annexD.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val Array(name, s, mc, w, p) = line.split("\\s+")
      val ch = glyphChars.getOrElse(name,
        throw new IllegalStateException(s"annex-D glyph $name missing from glyphChars"))
      def set(t: Array[String], oct: String): Unit =
        if (oct != "-") t(Integer.parseInt(oct, 8)) = ch.toString
      set(std, s); set(mac, mc); set(win, w); set(pdf, p)
    }
    // footnote duplicates: Mac 0o312 / Win 0o240 are space duplicates
    // (no-break space), Win 0o255 a hyphen duplicate (soft hyphen)
    mac(0xca) = " "; win(0xa0) = " "; win(0xad) = "-"
    // Win footnote 3: unused codes above 0o40 map to bullet
    (0x21 until 256).foreach(i => if (win(i).isEmpty) win(i) = "•")
    // PDFDoc: 0o40-0o176 ASCII (set above), 0o240+ the Latin-1-style
    // block is already covered by the table rows; 0o30-0o37 accents
    // and 0o200-0o236 publishing glyphs too. 0o255 is UNDEFINED in
    // PDFDocEncoding (unlike WinAnsi) — nothing to add.
    (std, mac, win, pdf)
  }

  /** 256-entry byte → String tables; "" = undefined in the encoding. */
  val (standard, macRoman, winAnsi, pdfDoc) = build()

  /** The table for a /BaseEncoding or /Encoding name; unknown names
    * fall back to StandardEncoding (the spec's implicit base). */
  def forName(name: String): Array[String] = name match {
    case "WinAnsiEncoding"  => winAnsi
    case "MacRomanEncoding" => macRoman
    case "PDFDocEncoding"   => pdfDoc
    case _                  => standard
  }
}
