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
