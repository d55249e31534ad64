import hashlib

import pyarrow as pa

from ontoea_ray.functions import text as T


def test_html_roundtrip_bytes():
    texts = ["plain words", "with <tags> & ampersands", "", "unicode éü中文", "a&amp;b already-escaped"]
    arr = pa.array(texts)
    back = T.extract_text(T.wrap_html(arr))
    assert back.to_pylist() == texts
    # byte-identical, not just equal strings
    for orig, got in zip(texts, back.to_pylist()):
        assert orig.encode("utf-8") == got.encode("utf-8")


def test_token_and_stopword_counts():
    arr = pa.array(["the cat and the dog", "x", ""])
    assert T.token_count(arr).to_pylist() == [5, 1, 1]
    assert T.stopword_count(arr).to_pylist() == [3, 0, 0]


def test_predict_lang():
    arr = pa.array(["the cat is on the mat", "der hund und die katze ist", "zzz qqq"])
    assert T.predict_lang(arr).to_pylist() == ["en", "de", "und"]


def test_fingerprint_matches_md5():
    arr = pa.array(["Hello World"])
    assert T.fingerprint_md5(arr).to_pylist() == [hashlib.md5(b"hello world").hexdigest()]


def test_quality_stats():
    arr = pa.array(["the aa bbb"])
    q = T.quality_stats(arr)
    assert q["n_chars"].to_pylist() == [10]
    assert q["n_tokens"].to_pylist() == [3]
    assert q["n_stopwords"].to_pylist() == [1]
    assert abs(q["stopword_ratio"][0].as_py() - 1 / 3) < 1e-12


def test_bigram_counts_respects_doc_boundaries():
    # "a b" x2 inside docs; the cross-boundary pair ("b", "a") must NOT count
    arr = pa.array(["a b", "a b c", "x"])
    t = T.bigram_counts(arr)
    got = dict(zip(t["bigram"].to_pylist(), t["freq"].to_pylist()))
    assert got == {"a b": 2, "b c": 1}
    # single-token batch -> empty, typed
    empty = T.bigram_counts(pa.array(["solo"]))
    assert empty.num_rows == 0 and empty.schema.field("freq").type == pa.int64()


def test_doc_term_frequencies_block_local():
    import numpy as np

    arr = pa.array(["a a b", "b"])
    t = T.doc_term_frequencies(arr, np.array([7, 9], np.int64))
    rows = {(r["doc_id"], r["token"]): r["tf"] for r in t.to_pylist()}
    assert rows == {(7, "a"): 2, (7, "b"): 1, (9, "b"): 1}


def test_pii_scrub_rules_and_order():
    arr = pa.array(
        [
            "write bob.smith+x@sub.example.co.uk now",
            "host 192.168.0.1 and 10.0.0.255 up",
            "call +1-555-0100-99 today",
            "none here",
        ]
    )
    out = T.pii_scrub(arr).to_pylist()
    assert out == [
        "write <EMAIL> now",
        "host <IP> and <IP> up",
        "call <PHONE> today",
        "none here",
    ]


def test_normalize_urls_spec():
    import pyarrow as pa

    from ontoea_ray.functions.url import normalize_urls

    cases = {
        "HTTP://Example.COM:80/A/B/": "http://example.com/A/B",
        "https://a.com/?utm_source=x&ref=1": "https://a.com/?ref=1",
        "https://a.com/?ref=1&utm_campaign=y#frag": "https://a.com/?ref=1",
        "https://a.com:443": "https://a.com",
        "https://a.com/Path?utm_a=1": "https://a.com/Path",
        "ftp://HOST/file": "ftp://host/file",
        "https://a.com:8443/x": "https://a.com:8443/x",  # non-default port kept
    }
    got = normalize_urls(pa.array(list(cases), pa.string())).to_pylist()
    assert got == list(cases.values())


def test_nav_links_block_deterministic():
    arr = pa.array(["alpha beta gamma delta", "x", ""])
    nav = T.nav_links_block(arr).to_pylist()
    assert nav[0] == (
        '<nav><a href="https://alpha.example.org/t/alpha">alpha</a>'
        '<a href="https://beta.example.org/t/beta">beta</a>'
        '<a href="https://gamma.example.org/t/gamma">gamma</a></nav>'
    )
    assert nav[1] == '<nav><a href="https://x.example.org/t/x">x</a></nav>'
    # empty text still yields exactly one (empty-token) anchor — split(' ') of
    # "" is [""], matching the tokenize() convention everywhere else
    assert nav[2].count("<a ") == 1


def test_outlink_lists_generic_html():
    # arbitrary html, not wrap_html output: multiple hrefs, rows with none
    html = pa.array(
        [
            b'<p><a href="https://a.com/x">x</a> text <a href="http://b.org/">b</a></p>',
            b"<p>no links here</p>",
            b'<link href="https://c.net/style.css"/>',
        ],
        pa.binary(),
    )
    got = T.outlink_lists(html).to_pylist()
    assert got == [["https://a.com/x", "http://b.org/"], [], ["https://c.net/style.css"]]


def test_anchor_lists_generic_html():
    # generic html: extra attributes after href, unterminated anchor,
    # rows with no anchors, non-<a> href tags ignored
    html = pa.array(
        [
            b'<p><a href="https://a.com/x" class="b">Click me</a> and '
            b'<a href="http://b.org/">B Site</a></p>',
            b"<p>no links</p>",
            b'<link href="https://c.net/s.css"/><a href="https://d.io">unterminated',
        ],
        pa.binary(),
    )
    hrefs, texts = T.anchor_lists(html)
    assert hrefs.to_pylist() == [
        ["https://a.com/x", "http://b.org/"],
        [],
        ["https://d.io"],
    ]
    assert texts.to_pylist() == [["Click me", "B Site"], [], [""]]


def test_anchor_lists_invert_nav_generation():
    texts = ["alpha beta gamma delta", "solo"]
    hrefs, anchors = T.anchor_lists(T.wrap_html(pa.array(texts)))
    assert anchors.to_pylist() == [["alpha", "beta", "gamma"], ["solo"]]
    assert hrefs.to_pylist()[1] == ["https://solo.example.org/t/solo"]


def test_outlinks_invert_wrap_html():
    texts = ["alpha beta gamma delta", "solo"]
    links = T.outlink_lists(T.wrap_html(pa.array(texts))).to_pylist()
    assert links[0] == [
        "https://alpha.example.org/t/alpha",
        "https://beta.example.org/t/beta",
        "https://gamma.example.org/t/gamma",
    ]
    assert links[1] == ["https://solo.example.org/t/solo"]


def test_url_domain():
    arr = pa.array(
        ["https://a.example.org/doc/1", "http://b.com", "no-scheme/path", "https://c.io/"]
    )
    assert T.url_domain(arr).to_pylist() == ["a.example.org", "b.com", "no-scheme", "c.io"]
