"""Canonicalization unit/property tests (SURVEY.md §5: idempotence +
equivalence classes + the reference's relative-href bug class F10)."""

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from weaver_ray.functions.canonicalize import (
    canonicalize,
    canonicalize_batch,
    host_batch,
    shard_of,
    url_hash,
    url_hash_batch,
)


def test_equivalence_classes():
    variants = [
        "http://Host-3.EXAMPLE/img00000001",
        "http://host-3.example:80/img00000001",
        "http://host-3.example/img00000001#section",
        "http://host-3.example/img%30%30%30img00000001"[:0] or "http://host-3.example/img00000001",
    ]
    canon = {canonicalize(u) for u in variants}
    assert canon == {"http://host-3.example/img00000001"}


def test_query_sort_and_fragment():
    assert (
        canonicalize("https://h.example:443/p?b=2&a=1#x")
        == "https://h.example/p?a=1&b=2"
    )


def test_relative_href_resolution():
    # the reference enqueued relative hrefs as-is (amazonRootHandler.go:56-71)
    assert (
        canonicalize("../img00000002", base="http://host-1.example/a/b")
        == "http://host-1.example/img00000002"
    )
    assert (
        canonicalize("/img9", base="http://host-1.example/a/b")
        == "http://host-1.example/img9"
    )


def test_empty_path_and_percent_normalization():
    assert canonicalize("http://h.example") == "http://h.example/"
    assert canonicalize("http://h.example/%61bc") == "http://h.example/abc"


def test_reserved_escapes_stay_encoded():
    """RFC 3986: decoding reserved chars would merge distinct URLs.
    'a=1%262' (value contains '&') must NOT equal 'a=1&2' (two params)."""
    a = canonicalize("http://h.example/p?a=1%262")
    b = canonicalize("http://h.example/p?a=1&2")
    assert a != b
    assert "%26" in a
    # %2F in a path segment is not a path separator
    c = canonicalize("http://h.example/x%2Fy")
    assert c == "http://h.example/x%2Fy"
    # hex case normalizes up; unreserved still decodes; stray % is encoded
    assert canonicalize("http://h.example/%2f%41") == "http://h.example/%2FA"
    u = canonicalize("http://h.example/50%off")
    assert canonicalize(u) == u  # idempotent even on malformed escapes


@given(st.text(alphabet="abcdef0189%&=/-._~", min_size=1, max_size=24))
def test_idempotent_with_escapes(path):
    once = canonicalize("http://h.example/" + path)
    assert canonicalize(once) == once


def test_batch_fast_path_equals_scalar():
    """The batch fast path must be indistinguishable from the scalar
    routine — including the port/empty-path/userinfo cases that only the
    slow path normalizes."""
    urls = [
        "http://host-1.example/img00000001",        # fast path
        "http://host-1.example:80/img00000001",     # port must strip
        "http://host-1.example",                    # empty path -> /
        "http://user@host-1.example/x",             # userinfo -> slow path
        "HTTP://HOST-2.EXAMPLE/ImG",                # case
        " http://host-3.example/a ",                # whitespace
        "http://h.example/p?b=2&a=1",               # query sort
    ]
    assert canonicalize_batch(urls) == [canonicalize(u) for u in urls]


@given(st.text(alphabet="abcdefghij0189/-._~", min_size=1, max_size=30))
def test_idempotent(path):
    u = "http://h.example/" + path
    once = canonicalize(u)
    assert canonicalize(once) == once


def test_hash_stability_and_batch_agreement():
    urls = [f"http://host-{i % 7}.example/img{i:08d}" for i in range(100)]
    canon = canonicalize_batch(urls)
    hv = url_hash_batch(canon)
    assert hv.dtype == np.uint64
    for i in (0, 17, 99):
        assert int(hv[i]) == url_hash(canon[i])
    assert host_batch(canon)[:2] == ["host-0.example", "host-1.example"]


def test_url_of_batch_bit_identical_to_scalar():
    """Host assignment must be bit-identical between the scalar path
    (seeds) and the batch path (extracted children): a drift would
    mis-host URLs — wrong politeness shard, wrong partition, wrong
    fixture delays.  Sweep real corpus ids, dead-link ids, and many
    host counts (the Zipf cum-table boundary is the risk point)."""
    from weaver_ray.sources.corpus import url_of, url_of_batch

    ids = ([f"img{i:08d}" for i in range(0, 3000, 7)]
           + [f"imgdead{i:06d}" for i in range(0, 50)])
    for n_hosts in (1, 2, 4, 23, 64, 256):
        assert url_of_batch(ids, n_hosts) == \
            [url_of(s, n_hosts) for s in ids], f"n_hosts={n_hosts}"
    assert url_of_batch([], 64) == []


def test_shard_convergence():
    # analog of the reference's two-rings-identical-lookup test
    # (src/chord/chord_test.go:233-275): same key -> same shard, any caller
    h = url_hash_batch([f"http://h.example/{i}" for i in range(1000)])
    s1 = shard_of(h, 16)
    s2 = shard_of(h.copy(), 16)
    assert (s1 == s2).all()
    assert s1.min() >= 0 and s1.max() < 16
    # balance: no shard holds more than 3x the mean
    counts = np.bincount(s1, minlength=16)
    assert counts.max() < 3 * counts.mean()
