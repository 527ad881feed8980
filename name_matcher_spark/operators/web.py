"""Web-crawl URL operators: canonicalization and canonical-URL dedup.

The first dedup pass over any crawl is by URL, and raw crawl URLs are
messy: case-varied schemes/hosts, default ports, trailing slashes,
tracking params, fragments. ``canonical_url`` folds all of that with
pure JVM built-ins (regexp + array functions — whole-stage codegen, no
UDF), so the canonicalize-then-group pass runs at scan speed and the
only shuffle is the final groupBy on the canonical key.

Canonicalization rules (documented contract, mirrored by the DuckDB
oracle in harness.wp_url_canon):
  * scheme and host lowercased; a leading ``www.`` dropped
  * default ports stripped (``:80`` for http, ``:443`` for https);
    non-default ports kept
  * percent-encoding normalized in path and query (RFC 3986 §6.2.2):
    ``%XX`` of an UNRESERVED character (ALPHA / DIGIT / ``-._~``)
    decodes to the character; every other ``%XX`` keeps its encoding
    with the hex uppercased (``%3f`` -> ``%3F``). Runs BEFORE the
    tracker filter, so ``%75tm_source`` is caught.
  * path kept case-sensitive; trailing ``/`` runs stripped; empty
    path -> ``/``
  * query split on ``&``; empty params, ``utm_*`` and the known
    click-tracker params (TRACKER_PARAM_RE: fbclid gclid gclsrc
    mc_cid mc_eid igshid msclkid) dropped; exact-duplicate ``k=v``
    pairs collapsed to one; remainder sorted lexicographically and
    rejoined (same-key-different-value params all survive, in sorted
    order — dropping data the crawl may rely on is not this
    operator's call)
  * fragment dropped
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Generic HTML -> text extraction
# ---------------------------------------------------------------------------
#
# The first operator a real Common-Crawl user needs before any dedup or
# linkage: strip markup down to visible text. The whole chain is JVM
# regexp + higher-order array functions — zero Python, whole-stage
# codegen, so it runs at scan speed over 100 TB of html. Rules
# (documented contract, replayed verbatim by the DuckDB oracle in
# harness.WP_TEXT_EXTRACT_SQL):
#
#   1. <script>...</script> and <style>...</style> blocks removed
#      WHOLE (their payload is code, not text); case-insensitive,
#      attributes allowed, '.' crosses newlines.
#   2. <!-- comments --> removed (before the generic tag pass, which
#      would otherwise chop "<!-- a > b -->" at the first '>').
#   3. All remaining tags <x ...>, </x>, <!doctype ...> replaced by a
#      space. A '>' inside a quoted attribute value ends the tag early
#      — the standard, documented trade-off of regexp extraction.
#   4. Character entities decoded in ONE pass (no re-scan of decoded
#      output, so "&amp;lt;" -> "&lt;" stays text, like html.unescape):
#      the common named set below, decimal "&#NNN;" and hex "&#xHH;"
#      for BMP code points (1..65535 excluding the surrogate range);
#      anything else — unknown names, out-of-range, astral — is
#      preserved literally. &nbsp;/&#160; decode to U+00A0, which step
#      5 then folds.
#   5. Whitespace (space, \t, \n, \r, \f, \x0B, U+00A0) folded to
#      single spaces; ends trimmed.
#
# Entity decode needs char-from-codepoint, which Spark lacks as a
# builtin: decode(unhex(lpad(hex(cp), 4, '0')), 'UTF-16BE') supplies it
# for the BMP (UTF-16BE of a BMP code point IS its 2-byte value).

_ENT_TOKEN_RE = "&[A-Za-z][A-Za-z0-9]*;|&#[0-9]{1,7};|&#[xX][0-9A-Fa-f]{1,6};"

# Named entities worth decoding without a full HTML5 table: the XML
# five, the typographic set crawl text actually contains, and nbsp.
NAMED_ENTITIES: dict[str, str] = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
    "ndash": "–",
    "mdash": "—",
    "lsquo": "‘",
    "rsquo": "’",
    "ldquo": "“",
    "rdquo": "”",
    "hellip": "…",
    "copy": "©",
    "reg": "®",
    "trade": "™",
}


def _decode_entity(e: Column) -> Column:
    """One matched entity token -> its decoded text (or the token
    verbatim when it isn't decodable)."""
    name = F.regexp_extract(e, "^&([A-Za-z][A-Za-z0-9]*);$", 1)
    dec = F.regexp_extract(e, "^&#([0-9]+);$", 1)
    hx = F.regexp_extract(e, "^&#[xX]([0-9A-Fa-f]+);$", 1)
    code = (
        F.when(dec != "", dec.try_cast("int"))
        .when(hx != "", F.conv(hx, 16, 10).try_cast("int"))
        .otherwise(F.lit(None).cast("int"))
    )
    bmp = (
        code.isNotNull()
        & (code >= 1)
        & (code <= 0xFFFF)
        & ~((code >= 0xD800) & (code <= 0xDFFF))
    )
    from_cp = F.decode(F.unhex(F.lpad(F.hex(code), 4, "0")), "UTF-16BE")
    out = F.when(bmp, from_cp)
    for nm, ch in NAMED_ENTITIES.items():
        out = out.when(name == nm, F.lit(ch))
    return out.otherwise(e)


def _interleave_decode(col: Column, token_re: str, decode_one) -> Column:
    """Single-pass token rewrite: split the text AT tokens, map each
    token through ``decode_one``, and re-interleave — all with array
    higher-order functions, so rewritten output is never re-scanned.
    The generic engine under both HTML-entity decoding and URL
    percent-encoding normalization."""
    parts = F.split(col, token_re, -1)  # n_tokens + 1 pieces
    toks = F.regexp_extract_all(col, F.lit(f"({token_re})"), 1)
    decoded = F.transform(toks, decode_one)
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    pieces = F.zip_with(decoded, tail, lambda d, p: F.concat(d, p))
    # array_join, NOT aggregate+concat: the fold copies the growing
    # accumulator once per token — O(n^2) bytes on entity-dense pages.
    return F.concat(F.element_at(parts, 1), F.array_join(pieces, ""))



def decode_html_entities(col: Column) -> Column:
    """Single-pass entity decode (``&amp;lt;`` yields the literal text
    ``&lt;``, like html.unescape). Gated on contains('&') so
    entity-free pages skip the 5-pass interleave machinery entirely
    (same fast path as normalize_percent_encoding's '%' gate)."""
    return F.when(
        col.contains("&"), _interleave_decode(col, _ENT_TOKEN_RE, _decode_entity)
    ).otherwise(col)


_WS_RE = "[ \\t\\n\\r\\f\\x0B\\x{00A0}]+"


def utf8_text(col: Column) -> Column:
    """Crawl-grade lenient binary -> UTF-8 string decode.

    ``decode(col, 'UTF-8')`` raises MALFORMED_CHARACTER_CODING on the
    first invalid byte sequence (Spark 4 ANSI), so ONE bad page —
    a certainty in any real crawl: mislabeled charsets, truncated
    fetches, binary served as text/html — fails the whole job.
    Instead: cast binary -> string (wraps the raw bytes, no
    validation) then ``make_valid_utf8`` (invalid sequences become
    U+FFFD). Byte-identical to strict decode on valid UTF-8 input
    (tested), pure JVM, NULL-propagating."""
    return F.make_valid_utf8(col.cast("string"))


def html_to_text(col: Column) -> Column:
    """Generic crawl-page text extraction per the 5 rules above.
    NULL html -> NULL text (regexp_replace null-propagates)."""
    x = F.regexp_replace(col, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    x = F.regexp_replace(x, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    x = F.regexp_replace(x, "(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, "(?is)</?[a-z!][^>]*>", " ")
    x = decode_html_entities(x)
    return F.trim(F.regexp_replace(x, _WS_RE, " "))


# Tracking params dropped by canonical_url: the utm_* family plus the
# common click-id / newsletter trackers. One regex, shared verbatim
# with the DuckDB oracle. Bare 'ref' is deliberately NOT in the set:
# unlike fbclid/gclid it is frequently functional (branch / referrer-
# content selectors), and collapsing distinct pages into one canonical
# key makes url_dedup_groups silently discard content. Callers with an
# aggressive policy pass their own tracker_re to canonical_url.
# (?s): a newline smuggled into a tracker VALUE (raw or via %0A
# percent-normalization) must not defeat the '=.*$' tail — the same
# hardening the fragment/path/query regexes carry.
TRACKER_PARAM_RE = (
    "(?s)^(utm_[^=]*|fbclid|gclid|gclsrc|mc_cid|mc_eid|igshid|msclkid)(=.*)?$"
)

_PCT_TOKEN_RE = "%[0-9A-Fa-f]{2}"


def _normalize_pct_token(e: Column) -> Column:
    code = F.conv(F.substring(e, 2, 2), 16, 10).cast("int")
    unreserved = (
        ((code >= 65) & (code <= 90))        # A-Z
        | ((code >= 97) & (code <= 122))     # a-z
        | ((code >= 48) & (code <= 57))      # 0-9
        | code.isin(45, 46, 95, 126)         # - . _ ~
    )
    ch = F.decode(F.unhex(F.substring(e, 2, 2)), "US-ASCII")
    return F.when(unreserved, ch).otherwise(F.upper(e))


def normalize_percent_encoding(col: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization: decode
    unreserved characters, uppercase the hex of everything else.
    Reserved octets (``%2F``, ``%26``...) stay encoded, so structural
    splits on ``/`` and ``&`` are unaffected by where this runs.

    Fast path: most crawl URLs contain no ``%`` at all, so the whole
    split/extract/zip interleave (5 regex passes) is gated behind one
    contains() — semantically a no-op, measured ~2x on the
    canonicalization bench row. NULL propagates through either
    branch."""
    return F.when(
        col.contains("%"), _interleave_decode(col, _PCT_TOKEN_RE, _normalize_pct_token)
    ).otherwise(col)


def _idna_fold_udf():
    """Arrow-vectorized IDN host fold (built lazily so importing this
    module never requires an active session). Unicode hosts encode to
    their punycode/ASCII form (IDNA 2003 via Python's ``idna`` codec:
    ``münchen.de`` -> ``xn--mnchen-3ya.de``); ASCII hosts pass through
    untouched on a fast path; hosts the codec rejects (empty labels,
    >63-char labels) pass through unchanged — an unfoldable host must
    not fail the crawl, it just keeps its own dedup key.

    The SCALAR eval type is conveyed through REAL annotation objects
    assigned post-hoc (not source hints): this module uses ``from
    __future__ import annotations``, which turns source hints into
    strings Spark cannot resolve without pandas in the module globals —
    and pandas must stay a lazy import here so the pure-JVM default
    path never needs it. (Replaces the deprecated ``PandasUDFType``
    ``functionType`` argument, r06.)"""
    import pandas as _pd
    from pyspark.sql.types import StringType

    def fold(hosts):
        def one(h):
            if h is None or h.isascii():
                return h
            try:
                return h.encode("idna").decode("ascii")
            except Exception:  # noqa: BLE001 - keep the raw host
                return h

        return hosts.map(one)

    fold.__annotations__ = {"hosts": _pd.Series, "return": _pd.Series}
    return F.pandas_udf(fold, StringType())


def canonical_url(
    col: Column, fold_idn: bool = False, tracker_re: str = TRACKER_PARAM_RE
) -> Column:
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"(?s)#.*$", "")  # drop fragment (DOTALL: a newline-mangled URL must not smuggle its fragment through)

    # Authority may carry userinfo ('user:pass@host'); strip it before
    # host/port parsing or the host comes out as 'user'. Userinfo is
    # identity, not location — two fetches of the same URL with
    # different credentials are the same page for dedup purposes.
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1)), r"^[^@]*@", ""
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":[0-9]+$", ""), r"^www\.", ""
    )
    if fold_idn:
        # Opt-in: internationalized hosts fold to punycode so
        # `münchen.de` and `xn--mnchen-3ya.de` share one canonical
        # key. A pandas UDF (the idna codec has no JVM-expression
        # equivalent), so the default stays pure JVM / oracle-exact.
        host = _idna_fold_udf()(host)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))

    # Normalize percent-encoding ONCE over path+query together, then
    # split: reserved octets (%3F, %2F, %26) stay encoded, so the
    # '?'/'&'/'/' structure is identical whether normalization runs
    # before or after the split — and one interleave pass costs half
    # of two (it dominated this expression's runtime).
    after_host = normalize_percent_encoding(
        F.regexp_extract(rest, r"^[^/?]+((?s:.*))$", 1)
    )
    raw_path = F.regexp_extract(after_host, r"^([^?]*)", 1)
    trimmed_path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed_path == "", F.lit("/")).otherwise(trimmed_path)

    query = F.regexp_extract(after_host, r"\?((?s:.*))$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(tracker_re),
    )
    q_sorted = F.array_join(F.sort_array(F.array_distinct(params)), "&")
    q_part = F.when(
        q_sorted != "", F.concat(F.lit("?"), q_sorted)
    ).otherwise(F.lit(""))

    # No scheme -> null, not a '://'-garbage key: otherwise every
    # unparseable URL would collide into one giant bogus dedup group.
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path, q_part))


def url_dedup_groups(
    pages: DataFrame,
    url_col: str = "url",
    min_group: int = 2,
    ts_col: str | None = None,
) -> DataFrame:
    """(canonical_url, n_urls, keep_url) for every canonical group with
    at least ``min_group`` raw URLs: the crawl's URL-level dedup pass.

    Survivor policy: lexicographic min raw member by default; with
    ``ts_col`` (e.g. ``warc_ts``) the LATEST crawl wins — the standard
    refresh-dedup across crawl snapshots — with ties broken by the max
    raw URL so the pick stays deterministic (a bare max_by would not
    be). One shuffle, on the canonical key; the argmax is a struct max,
    so it combines map-side like any other aggregate."""
    # NULL-canonical rows (no scheme, NULL url) are dropped via this
    # CHEAP equivalent predicate on the raw column, never by filtering
    # on `canonical` itself: canonical_url is a ~15-regex expression,
    # and any deterministic filter on it — before OR after the groupBy
    # (a group-key predicate pushes through the aggregate) — gets the
    # whole expression substituted into the pushed-down scan filter,
    # evaluating the chain twice per row (measured 2.5x+ on the
    # canonicalization bench row). canonical_url returns NULL exactly
    # when trim(url) has no scheme prefix, so the predicates are
    # equivalent, and this one costs one small anchored regex at the
    # scan.
    has_scheme = F.trim(F.col(url_col)).rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    cols = [
        F.col(url_col).alias("raw_url"),
        canonical_url(F.col(url_col)).alias("canonical"),
    ]
    if ts_col is not None:
        cols.append(F.col(ts_col).alias("_ts"))
    canon = pages.filter(has_scheme).select(*cols)
    if ts_col is None:
        keep = F.min("raw_url").alias("keep_url")
    else:
        keep = F.max(F.struct(F.col("_ts"), F.col("raw_url")))["raw_url"].alias(
            "keep_url"
        )
    return (
        canon.groupBy("canonical")
        .agg(F.count("*").alias("n_urls"), keep)
        .filter(F.col("n_urls") >= min_group)
    )


# C4-style URL prefilter: extensions that mark non-text assets a crawl
# text pipeline drops before fetching/parsing (stylesheets, scripts,
# images, fonts, media, archives, binaries). Module-level so the
# DuckDB oracle interpolates the same set.
def _authority_host(u: Column, strip_www: bool = False) -> Column:
    """Lowercased host from an absolute URL's authority section:
    userinfo ('user:pass@') stripped before the host — '://([^/?#:]+)'
    alone mis-parses 'http://u:p@host/x' as host='u' — then the port,
    and optionally a leading 'www.'. Single source for url_filter and
    domain_stats (canonical_url parses its own fragment-stripped
    `rest`, a different pipeline stage); the DuckDB twins mirror the
    same three-step strip."""
    authority = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.regexp_replace(
        F.regexp_replace(authority, r"^[^@]*@", ""), r":[0-9]+$", ""
    )
    return F.regexp_replace(host, r"^www\.", "") if strip_www else host


BLOCKED_URL_EXTENSIONS: tuple[str, ...] = (
    "css", "js", "json", "png", "jpg", "jpeg", "gif", "svg", "ico",
    "webp", "woff", "woff2", "ttf", "eot", "mp3", "mp4", "avi", "mov",
    "webm", "zip", "gz", "tar", "rar", "7z", "exe", "dmg", "iso",
)


def url_filter(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL keep/drop verdicts for the crawl frontier — the filter
    that runs BEFORE any fetch or parse (the C4/CCNet URL prefilter):

    * ``pass_scheme`` — scheme is http/https (case-insensitive);
      ftp/mailto/javascript/data URLs are never page text.
    * ``pass_host``  — host looks like a registered name (has a dot +
      alphabetic TLD); bare hosts (localhost, intranet names) and
      raw garbage are dropped.
    * ``pass_ext``   — the path's final extension (if any) is not a
      known non-text asset type (BLOCKED_URL_EXTENSIONS); extension-
      less and .html/.htm/.php/... paths pass.

    Returns (url, scheme, host, ext, pass_scheme, pass_host, pass_ext,
    keep). NULL urls fail the scheme and host gates, so keep is a real
    False, never NULL (a NULL keep would silently elide the row from a
    frontier filter); pass_ext stays True for them — it means "no
    BLOCKED extension", and a NULL url has no extension at all. Pure
    JVM regexp projection — zero shuffle, WSCG end-to-end, trivially
    100 TB-safe.
    """
    u = F.coalesce(F.col(url_col), F.lit(""))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = _authority_host(u)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,5})$", 1))
    pass_scheme = scheme.isin("http", "https")
    pass_host = host.rlike(r"^[a-z0-9.-]+\.[a-z]{2,}$")
    pass_ext = ~ext.isin(*BLOCKED_URL_EXTENSIONS)
    return df.select(
        F.col(url_col).alias("url"),
        scheme.alias("scheme"),
        host.alias("host"),
        ext.alias("ext"),
        pass_scheme.alias("pass_scheme"),
        pass_host.alias("pass_host"),
        pass_ext.alias("pass_ext"),
        (pass_scheme & pass_host & pass_ext).alias("keep"),
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", ts_col: str | None = None
) -> DataFrame:
    """Per-host corpus statistics — the table a domain-mixing /
    domain-capping policy reads (how many fetches and distinct pages
    each site contributes, and with ``ts_col`` the crawl-freshness
    window): (host, n_fetches, n_urls[, first_ts, last_ts]).

    Host = lowercased authority of the raw URL with a leading ``www.``
    fold (the coarse grouping policies use; full canonicalization is
    `canonical_url`'s job). Rows whose URL has no parseable authority
    are dropped — they cannot be attributed to a site. One shuffle on
    the host key with map-side partial aggregation; at crawl scale a
    host hot enough to skew this shuffle is exactly the host the
    policy wants to see, and AQE splits it.
    """
    u = F.coalesce(F.col(url_col), F.lit(""))
    host = _authority_host(u, strip_www=True)
    base = df.select(
        host.alias("host"), F.col(url_col).alias("_u"),
        *([F.col(ts_col).alias("_ts")] if ts_col else []),
    ).where(F.col("host") != "")
    aggs = [
        F.count("*").alias("n_fetches"),
        F.countDistinct("_u").alias("n_urls"),
    ]
    if ts_col:
        aggs += [F.min("_ts").alias("first_ts"), F.max("_ts").alias("last_ts")]
    return base.groupBy("host").agg(*aggs)
