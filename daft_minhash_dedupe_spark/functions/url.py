"""URL canonicalization — the identity-key stage of web dedup.

The pipeline keys documents by url (the reference keys WARC records the same
way); crawls see the same page under trivially-different urls. Canonical
form: lowercase scheme://host, strip fragment, drop default ports (:80/:443),
drop common tracking query params (utm_*, fbclid, gclid, ...), drop an empty
query, drop a trailing path slash. Pure Catalyst — zero Python, safe on
10^12 urls.

Every regex here is RE2-compatible (no lookaheads/backrefs) so a DuckDB
oracle can run the very same patterns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCHEME_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
# Scheme-matched default-port rules: :80 is only default for http, :443 only
# for https — stripping cross-scheme would conflate genuinely distinct
# endpoints (http://h:443 is not http://h).
HTTP_PORT_RE = r"^(http://[^/?#:]+):80([/?#].*)?$"
HTTPS_PORT_RE = r"^(https://[^/?#:]+):443([/?#].*)?$"
# Tracking-param name anchored to a separator so longer param names that
# merely end in a tracking name (foo_gclid, my_utm_source) are untouched.
# Each match is replaced by its captured separator; the runs of ?&/&& that
# leaves are normalized by the follow-up rules below.
TRACKING_RE = r"([?&])(?:utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid)=[^&#]*"
TRAILING_SLASH_RE = r"^([^?#]*[^/?#])/(\?.*)?$"


def canonical_url(col: Column) -> Column:
    u = F.trim(col)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    # lowercase the scheme://host prefix, keep path/query byte-identical
    prefix = F.regexp_extract(u, SCHEME_HOST_RE, 1)
    u = F.concat(F.lower(prefix), F.substring(u, F.length(prefix) + 1, F.lit(2**30)))
    u = F.regexp_replace(u, HTTP_PORT_RE, r"$1$2")  # default port http
    u = F.regexp_replace(u, HTTPS_PORT_RE, r"$1$2")  # default port https
    u = F.regexp_replace(u, TRACKING_RE, r"$1")  # tracking params
    u = F.regexp_replace(u, r"&&+", "&")  # && runs left by removed params
    u = F.regexp_replace(u, r"\?&", "?")  # ?& left by a removed first param
    u = F.regexp_replace(u, r"&$", "")  # trailing & left by a removed last param
    u = F.regexp_replace(u, r"\?$", "")  # empty query
    u = F.regexp_replace(u, TRAILING_SLASH_RE, r"$1$2")  # trailing path slash
    return u
