"""URL canonicalizer unit tests (F4/F5; reference: colly's AbsoluteURL
colly.go:86 + url.Parse validity colly.go:164-171)."""

import pytest

from goprowl_spark.functions.urlnorm import canonicalize, host_of

BASE = "https://h3.test/p/42"


@pytest.mark.parametrize(
    "href,expected",
    [
        ("https://h1.test/p/7", "https://h1.test/p/7"),
        ("/p/7", "https://h3.test/p/7"),               # root-relative
        ("x/y", "https://h3.test/p/x/y"),              # relative
        ("https://h1.test/p/7#frag", "https://h1.test/p/7"),   # fragment
        ("https://h1.test:443/p/7", "https://h1.test/p/7"),    # default port
        ("http://h1.test:80/p/7", "http://h1.test/p/7"),
        ("http://h1.test:8080/p/7", "http://h1.test:8080/p/7"),  # kept
        ("HTTPS://H1.TEST/p/7", "https://h1.test/p/7"),  # case
        ("https://h1.test", "https://h1.test/"),        # empty path
        ("https://h1.test/a//b/./c/../d", "https://h1.test/a/b/d"),
        ("https://h1.test/p?q=1#f", "https://h1.test/p?q=1"),
        ("mailto:x@y.z", None),                          # non-http scheme
        ("ftp://h1.test/f", None),
        ("", None),
        (None, None),
    ],
)
def test_canonicalize(href, expected):
    assert canonicalize(href, BASE) == expected


def test_canonicalize_no_host_without_base():
    assert canonicalize("https://", None) is None
    assert canonicalize("/p/1", None) is None


def test_host_of():
    assert host_of("https://H1.Test:8080/p/1") == "h1.test"
    assert host_of("not a url") is None
    assert host_of(None) is None
