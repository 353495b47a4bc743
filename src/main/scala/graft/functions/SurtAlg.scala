package graft.functions

import java.util.Arrays

import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM SURT + base32 kernels backing the native Catalyst expressions
  * ([[SurtKeyExpr]], [[Base32Expr]]). Static entry points so generated
  * code can call them directly.
  *
  * Semantics mirror graft.functions.Surt (the composed-builtin form) —
  * SurtSpec and CdxOps' oracle assert the two paths agree byte-for-byte.
  */
object SurtAlg {

  /** Full URL -> SURT key; null when the URL has no scheme://host part
    * (the composed [[Surt.surtKey]] nulls out identically). Non-default
    * ports survive in the key (`com,example:8080)`), scheme-default ports
    * (http 80 / https 443 / ftp 21) are dropped, and IDN hosts are
    * punycoded — all matching the public surt package. */
  def surtKey(url: String): String = {
    if (url == null) return null
    val noFrag = { val i = url.indexOf('#'); if (i >= 0) url.substring(0, i) else url }
    val schemeEnd = noFrag.indexOf("://")
    if (schemeEnd < 0) return null
    val scheme = noFrag.substring(0, schemeEnd).toLowerCase
    val rest = noFrag.substring(schemeEnd + 3)
    var pathStart = rest.length
    var i = 0
    while (i < rest.length && pathStart == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') pathStart = i
      i += 1
    }
    val authority = rest.substring(0, pathStart)
    val afterAuth = rest.substring(pathStart)
    if (authority.isEmpty) return null
    // strip userinfo; bracketed IPv6 literals keep their colons
    val at = authority.lastIndexOf('@')
    val hostPort = if (at >= 0) authority.substring(at + 1) else authority
    val (rawHost, port) = if (hostPort.startsWith("[")) {
      val close = hostPort.indexOf(']')
      if (close >= 0) {
        val tail = hostPort.substring(close + 1)
        (hostPort.substring(0, close + 1),
          if (tail.startsWith(":")) tail.substring(1) else "")
      } else (hostPort, "")
    } else {
      val ci = hostPort.indexOf(':')
      if (ci >= 0) (hostPort.substring(0, ci), hostPort.substring(ci + 1))
      else (hostPort, "")
    }
    var host = rawHost.toLowerCase
    // IDN hosts -> punycode (public surt canonicalizes to ASCII)
    if (host.exists(_ > 127))
      try host = java.net.IDN.toASCII(host).toLowerCase
      catch { case _: IllegalArgumentException => /* keep as-is */ }
    val defaultPort = scheme match {
      case "http" => "80"; case "https" => "443"; case "ftp" => "21"; case _ => ""
    }
    val portSuffix =
      if (port.nonEmpty && port.forall(_.isDigit) && port != defaultPort) ":" + port else ""
    val hostNoWww = host.replaceFirst("^www\\d*\\.", "")
    val reversed = hostNoWww.split("\\.").reverse.mkString(",") + portSuffix
    val qi = afterAuth.indexOf('?')
    val rawPath = if (qi >= 0) afterAuth.substring(0, qi) else afterAuth
    val rawQuery = if (qi >= 0) afterAuth.substring(qi + 1) else null
    val path = if (rawPath.isEmpty) "/" else rawPath.toLowerCase
    val sb = new java.lang.StringBuilder(reversed).append(')').append(path)
    if (rawQuery != null && rawQuery.nonEmpty) {
      val params = rawQuery.toLowerCase.split("&", -1)
      Arrays.sort(params.asInstanceOf[Array[Object]])
      sb.append('?').append(String.join("&", params: _*))
    }
    sb.toString
  }

  /** UTF8String adapter used by codegen + interpreted eval. */
  def surtKeyUTF8(url: UTF8String): UTF8String = {
    if (url == null) return null
    val s = surtKey(url.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567".toCharArray

  /** RFC 4648 base32, no padding — the WARC-Payload-Digest encoding
    * (`sha1:<base32>`) used by the reference's CDX lines. */
  def base32(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val out = new java.lang.StringBuilder((bytes.length * 8 + 4) / 5)
    var buffer = 0L
    var bitsLeft = 0
    var i = 0
    while (i < bytes.length) {
      buffer = (buffer << 8) | (bytes(i) & 0xff)
      bitsLeft += 8
      while (bitsLeft >= 5) {
        out.append(B32(((buffer >> (bitsLeft - 5)) & 0x1f).toInt))
        bitsLeft -= 5
      }
      i += 1
    }
    if (bitsLeft > 0) out.append(B32(((buffer << (5 - bitsLeft)) & 0x1f).toInt))
    out.toString
  }

  def base32UTF8(bytes: Array[Byte]): UTF8String = {
    if (bytes == null) null else UTF8String.fromString(base32(bytes))
  }
}
