"""URL canonicalization — the crawl-side dedup key.

Normalization spec (the common subset of public crawl dedup conventions):

1. drop the ``#fragment``;
2. lowercase the ``scheme://host[:port]`` head (path/query case is
   significant and kept);
3. strip explicit default ports ``:80`` / ``:443``;
4. remove ``utm_*`` tracking query params (other params keep their order);
5. strip a trailing ``/``.

Every rule is a RE2 regex / string op that DuckDB replays verbatim
(``regexp_replace`` — DuckDB is RE2 too), so canonical-URL dedup carries an
exact value oracle: :func:`normalize_url_ctes` emits the IDENTICAL step
sequence as SQL.  All kernels are Arrow-vectorized (``pyarrow.compute``
string ops; no Python rows).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_HEAD = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)"


def normalize_urls(urls) -> pa.Array:
    """Vectorized canonicalization per the module spec; returns a string
    Array aligned with the input."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    u = pc.replace_substring_regex(urls, pattern=r"#.*$", replacement="")
    head = pc.replace_substring_regex(u, pattern=_HEAD + r"[\s\S]*$", replacement=r"\1")
    rest = pc.replace_substring_regex(u, pattern=_HEAD, replacement="")
    head = pc.utf8_lower(head)
    head = pc.replace_substring_regex(head, pattern=r":(80|443)$", replacement="")
    u = pc.binary_join_element_wise(head, rest, "")
    u = pc.replace_substring_regex(u, pattern=r"\?utm_[^&#]*&", replacement="?")
    u = pc.replace_substring_regex(u, pattern=r"&utm_[^&#]*", replacement="")
    u = pc.replace_substring_regex(u, pattern=r"\?utm_[^&#]*$", replacement="")
    u = pc.replace_substring_regex(u, pattern=r"/$", replacement="")
    return u


def normalize_url_ctes(source: str, col: str = "url", out: str = "canon_url") -> str:
    """CTE chain ``u1..u6`` replaying :func:`normalize_urls` step-for-step
    in DuckDB; the final CTE ``u6`` carries every ``source`` column plus
    ``out``.  Same RE2 patterns, same order."""
    head = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)"
    return f"""
  u1 AS (SELECT *, regexp_replace({col}, '#.*$', '') AS _nu FROM {source}),
  u2 AS (SELECT *, lower(regexp_extract(_nu, '{head}', 1)) AS _head,
                regexp_replace(_nu, '{head}', '') AS _rest FROM u1),
  u3 AS (SELECT *, regexp_replace(_head, ':(80|443)$', '') || _rest AS _nu3 FROM u2),
  u4 AS (SELECT *, regexp_replace(_nu3, '\\?utm_[^&#]*&', '?') AS _nu4 FROM u3),
  u5 AS (SELECT *, regexp_replace(regexp_replace(_nu4, '&utm_[^&#]*', ''),
                                  '\\?utm_[^&#]*$', '') AS _nu5 FROM u4),
  u6 AS (SELECT *, regexp_replace(_nu5, '/$', '') AS {out} FROM u5)
"""


def disallowed_mask(urls, rules: list[tuple[str, str]]) -> pa.Array:
    """Boolean mask: url blocked by a robots-style disallow rule list.

    ``rules`` is a small list of ``(domain, path_prefix)`` — the parsed
    form of per-host ``robots.txt`` ``Disallow:`` lines.  A url is blocked
    when it starts with ``https://{domain}{path_prefix}`` for any rule
    (prefix semantics, exactly the original robots exclusion rule).

    Vectorized as one ``starts_with`` pass per rule — right for the small
    per-pipeline rule sets a crawler actually honors; a registry-scale rule
    table (millions of hosts) should instead hash-join urls to rules on the
    domain key and prefix-test inside the co-located group."""
    u = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    blocked = None
    for domain, prefix in rules:
        m = pc.starts_with(u, pattern=f"https://{domain}{prefix}")
        blocked = m if blocked is None else pc.or_(blocked, m)
    if blocked is None:
        return pa.array([False] * len(u), pa.bool_())
    return blocked
