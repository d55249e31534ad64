"""WARC-lite record-format source/sink tests."""

import pyarrow as pa
import pytest
import ray.data


def _pages(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


def test_warclite_roundtrip_exact(ray_session, tmp_path):
    """write -> read recovers every record byte-for-byte, including bodies
    that contain blank lines and header-looking strings."""
    from ontoea_ray.sources.warclite import read_warclite, write_warclite

    rows = [
        ("https://a.example.org/1", 1_000_000, "en", "plain body"),
        ("https://a.example.org/2", 2_000_000, "de", "body with\n\nblank line"),
        ("https://a.example.org/3", 3_000_000, "fr", "url: fake header\nts: 9"),
        ("https://a.example.org/4", 4_000_000, "es", ""),
    ]
    n = write_warclite(_pages(rows), str(tmp_path / "w"))
    assert n == 4
    got = sorted(
        (r["url"], int(r["warc_ts"].timestamp() * 1_000_000), r["lang"], r["text"])
        for r in read_warclite(str(tmp_path / "w")).take_all()
    )
    assert got == sorted(rows)


def test_warclite_writer_refuses_unframeable_bodies(ray_session, tmp_path):
    from ontoea_ray.sources.warclite import _MAGIC, write_warclite

    with pytest.raises(Exception, match="magic"):
        write_warclite(
            _pages([("u", 1, "en", f"x {_MAGIC} y")]), str(tmp_path / "m")
        )
    with pytest.raises(Exception, match="newline"):
        write_warclite(_pages([("u", 1, "en", "ends in\n")]), str(tmp_path / "n"))


def test_warclite_corrupt_shard_fails_loudly(ray_session, tmp_path):
    """A truncated body fails the per-record length check instead of
    silently misparsing."""
    from ontoea_ray.sources.warclite import read_warclite, write_warclite

    d = tmp_path / "c"
    write_warclite(_pages([("u1", 1, "en", "twelve bytes")]), str(d))
    shard = next(d.glob("*.warc"))
    data = shard.read_bytes()
    shard.write_bytes(data.replace(b"twelve bytes", b"ten bytes!"))
    with pytest.raises(Exception, match="length mismatch"):
        read_warclite(str(d)).take_all()


def test_disallowed_mask_prefix_semantics(ray_session):
    """Robots prefix rule: blocks own-domain urls under the prefix only —
    never another domain, never a non-prefix path."""
    import pyarrow as pa

    from ontoea_ray.functions.url import disallowed_mask

    urls = pa.array(
        [
            "https://a.org/doc/10",   # blocked: prefix /doc/1
            "https://a.org/doc/20",   # kept: /doc/2 not a rule for a.org
            "https://b.org/doc/10",   # kept: rule is a.org-scoped
            "https://a.org/img/1",    # kept: path prefix differs
        ]
    )
    m = disallowed_mask(urls, [("a.org", "/doc/1")]).to_pylist()
    assert m == [True, False, False, False]
    assert disallowed_mask(urls, []).to_pylist() == [False] * 4
