"""URL canonicalization — the CDC key-normalization function.

A web-scale CDC pipeline keyed on url MUST normalize before hashing:
`HTTP://Example.com:80/a` and `http://example.com/a#x` are the same
page, and without canonicalization they become two LWW keys (split
history) and two dedup identities. The reference templates URLs ad hoc
(apps/etl/etl_tasks/gdacs.py:33-35); this is the engine's principled
form.

Policy (pinned; RFC 3986 §6 normalizations that never change the
resource):
  1. scheme and host lowercased;
  2. fragment stripped (never sent to the server);
  3. default ports stripped (:80 for http, :443 for https);
  4. empty path becomes "/" — including before a query string, so
     `http://example.com?q=1` and `http://example.com/?q=1` collapse
     to one LWW key.

Pure built-in regexp expressions (simple RE2-compatible patterns, no
lookaround) so the SAME patterns run under Java regex in Spark and RE2
in an external SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# simple, lookaround-free patterns shared verbatim with the SQL oracle
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def normalize_url(col) -> F.Column:
    """Canonical form of an absolute http(s) URL (see module policy).
    Input without a scheme is returned unchanged (not a URL we key)."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(c, HOSTPORT_RE, 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    rest = F.regexp_extract(c, REST_RE, 1)  # path?query, fragment gone
    path = F.when(rest == "", F.lit("/")).when(
        rest.startswith("?"), F.concat(F.lit("/"), rest)  # empty path + query
    ).otherwise(rest)
    return F.when(
        scheme == "", c  # not an absolute URL: pass through
    ).otherwise(F.concat(scheme, F.lit("://"), host, path))


def surt(col) -> F.Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the form
    Common Crawl's URL index sorts by (public cdx/surt convention):
    normalize (port/fragment/path rules above), then drop the scheme,
    strip a leading ``www.``, reverse the host labels comma-joined,
    and append ``)`` + the lowercased path?query:

      ``HTTPS://WWW.Example.COM:443/A/B?Q=1`` → ``com,example)/a/b?q=1``

    Host reversal makes one domain's pages (and its subdomains)
    CONTIGUOUS under a plain string sort — the property that lets a
    sorted index range-scan a domain, and exactly what a Z-order/range
    read wants as its clustering key. Lowercasing the query is part of
    the standard SURT canonicalization (aggressive, documented).
    Non-absolute input → NULL (not a keyable URL). A non-default port
    stays on the key after the reversed labels
    (``com,example:8080)/...``), matching the cdx convention. Pure
    column program: regexes + a split-reverse-join — scan-local."""
    c = F.col(col) if isinstance(col, str) else col
    norm = normalize_url(c)
    host = F.regexp_extract(norm, r"^https?://([^/]*)", 1)
    rest = F.lower(F.regexp_extract(norm, r"^https?://[^/]*(.*)$", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(host, r":(\d+)$", 1)
    hostname = F.regexp_replace(host, r":\d+$", "")
    rev = F.array_join(F.reverse(F.split(hostname, r"\.")), ",")
    key = F.concat(
        rev,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"),
                                                         port)),
        F.lit(")"), rest)
    return F.when(hostname == "", F.lit(None).cast("string")).otherwise(key)
