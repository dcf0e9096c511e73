"""URL canonicalization + hashing.

The reference compares URLs byte-wise with no canonicalization at all and
even enqueues relative Amazon hrefs as-is (SURVEY.md §2.8 F10 — a real bug in
src/scrapper/amazonRootHandler.go:56-71).  The north rule makes
canonicalize→hash the first step of the frontier loop, so this module is the
one place URL identity is defined:

- scheme and host lowercased
- default port stripped (":80" for http, ":443" for https)
- fragment dropped
- query keys sorted (stable sort, duplicate keys preserved in input order)
- percent-encoding normalized (uppercase hex, unreserved chars decoded)
- empty path -> "/"
- relative hrefs resolved against the parent URL

``url_hash`` is the first 8 bytes of sha1(canonical_url) as uint64
(reference analog: chord keys are sha1(key), src/chord/vnode.go:39-48; we
keep 64 of the 160 bits because Ray partitions by modulo, not a ring).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = set("0123456789abcdefABCDEF")


def _pct_normalize(s: str) -> str:
    """RFC 3986 §6.2.2 percent-normalization: decode escapes of UNRESERVED
    characters only, uppercase the hex of every other escape, and encode a
    stray '%' as %25.  Reserved characters (& = / ? ...) must stay encoded —
    decoding them would merge semantically distinct URLs (e.g. 'a=1%262'
    vs 'a=1&2') and make canonicalization non-idempotent."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            if i + 3 <= n and s[i + 1] in _HEX and s[i + 2] in _HEX:
                ch = chr(int(s[i + 1: i + 3], 16))
                if ch in _UNRESERVED:
                    out.append(ch)
                else:
                    out.append("%" + s[i + 1: i + 3].upper())
                i += 3
                continue
            out.append("%25")  # malformed escape: literal percent, encoded
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def canonicalize(url: str, base: str | None = None) -> str:
    """Return the canonical form of *url* (resolved against *base* if
    relative).  Idempotent: canonicalize(canonicalize(u)) == canonicalize(u)."""
    if base is not None:
        url = urljoin(base, url)
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _pct_normalize(parts.path) or "/"
    query = ""
    if parts.query:
        pairs = [_pct_normalize(kv) for kv in parts.query.split("&") if kv]
        pairs.sort(key=lambda kv: kv.split("=", 1)[0])
        query = "&".join(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))  # fragment dropped


def url_hash(canon: str) -> int:
    """uint64 from the first 8 bytes of sha1(canonical url), big-endian."""
    return int.from_bytes(hashlib.sha1(canon.encode("utf-8")).digest()[:8], "big")


def host_of(canon: str) -> str:
    return urlsplit(canon).hostname or ""


# ------------------------------------------------------------------ batch forms

def canonicalize_batch(urls: pa.Array | list[str], bases: pa.Array | list[str] | None = None) -> list[str]:
    """Canonicalize a column of URLs. Our synthetic URL shapes take a fast
    path; arbitrary URLs fall back to the full scalar routine."""
    out: list[str] = []
    it_bases = bases.to_pylist() if isinstance(bases, (pa.Array, pa.ChunkedArray)) else bases
    it_urls = urls.to_pylist() if isinstance(urls, (pa.Array, pa.ChunkedArray)) else urls
    for i, u in enumerate(it_urls):
        b = it_bases[i] if it_bases is not None else None
        # fast path: already-canonical synthetic URLs http://host-N.example/img...
        # — must be provably equal to the scalar routine's output, so it also
        # excludes ports/userinfo (':'/'@' after the scheme), empty paths,
        # and surrounding whitespace, not just '#?%' and case
        rest = u[7:]
        if (b is None and u.startswith("http://") and u == u.lower()
                and u == u.strip() and "#" not in u and "?" not in u
                and "%" not in u and ":" not in rest and "@" not in rest
                and "/" in rest):
            out.append(u)
        else:
            out.append(canonicalize(u, b))
    return out


def url_hash_batch(canon: list[str] | pa.Array) -> np.ndarray:
    """Vector of uint64 sha1-prefix hashes."""
    if isinstance(canon, (pa.Array, pa.ChunkedArray)):
        canon = canon.to_pylist()
    sha1 = hashlib.sha1
    return np.fromiter(
        (int.from_bytes(sha1(c.encode("utf-8")).digest()[:8], "big") for c in canon),
        dtype=np.uint64,
        count=len(canon),
    )


def host_batch(canon: list[str] | pa.Array) -> list[str]:
    if isinstance(canon, (pa.Array, pa.ChunkedArray)):
        canon = canon.to_pylist()
    out = []
    for c in canon:
        # fast path for "scheme://host/..." without userinfo/port
        rest = c.split("://", 1)[-1]
        head = rest.split("/", 1)[0]
        if "@" in head or ":" in head:
            out.append(host_of(c))
        else:
            out.append(head.lower())
    return out


def shard_of(hashes: np.ndarray, num_shards: int) -> np.ndarray:
    """Partition assignment — plain modulo over the uint64 hash (reference
    analog: chord successor of sha1(key), src/chord/chord.go:199-224; a DHT is
    unnecessary when Ray owns placement)."""
    return (hashes % np.uint64(num_shards)).astype(np.int64)
