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
