"""Stdlib HTTP(S) fetcher for ``log:content`` / ``log:semantics``.

The reference dereferences web IRIs through ``RDF::Util::File``
(``algebra/log/content.rb:20-33``, ``log/semantics.rb:21-40``).  This
module restores that capability with ONLY the standard library —
``urllib.request`` — as a ready-made value for the engine's
``EvalContext.fetcher`` seam (``algebra/builtins.py`` EvalContext):

    from rdf_n3_ray.sources.webfetch import urllib_fetcher
    ctx = EvalContext(fetcher=urllib_fetcher())

Design points:
- Scheme allowlist (http/https by default): any other scheme returns
  None so the engine's file:// path still applies (the seam contract
  in ``engine._fetch_text`` treats None as "fall through").
- Size cap: a rule dereferencing a multi-GB URL must not OOM the
  worker evaluating it; over-cap responses raise (treated as a failed
  fetch, the builtin simply does not bind).
- Timeout: reasoning fixpoints must not hang on a dead host.
- No redirect surprises: urllib follows redirects; the FINAL url is
  not substituted for the base IRI (the reference keeps the requested
  IRI as base too).

This sandbox has no network, so the unit test drives the fetcher
against a loopback ``http.server`` — the real protocol, no mocks.
"""
from __future__ import annotations

from collections.abc import Callable

DEFAULT_MAX_BYTES = 32 * 1024 * 1024  # a rule input, not a dataset
DEFAULT_TIMEOUT_S = 10.0
_ACCEPT = ("text/n3, text/turtle;q=0.9, application/n-triples;q=0.8, "
           "text/plain;q=0.5, */*;q=0.1")


def urllib_fetcher(allowed_schemes: tuple[str, ...] = ("http", "https"),
                   timeout_s: float = DEFAULT_TIMEOUT_S,
                   max_bytes: int = DEFAULT_MAX_BYTES,
                   ) -> Callable[[str], str | None]:
    """Build a fetcher(iri) -> str | None for EvalContext.fetcher."""
    import urllib.request
    from urllib.parse import urlsplit

    class _SchemeCheckedRedirect(urllib.request.HTTPRedirectHandler):
        # Validate the redirect TARGET before urllib follows it:
        # CPython's handler happily chases http/https/ftp Location
        # headers, so a post-hoc check on resp.url would only fire
        # AFTER the request to the off-allowlist (or https->http
        # downgraded) target had already been sent.
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            # Close the 3xx response FIRST, on every path: CPython's
            # http_error_302 runs an UNBOUNDED fp.read() after this
            # returns (and only then closes), so a multi-GB redirect
            # body would be buffered whole — the exact OOM class
            # max_bytes exists to prevent.  After close(), that
            # read() safely returns b''; urllib does no connection
            # pooling, so dropping the socket costs nothing.
            try:
                fp.close()
            except Exception:
                pass
            scheme = urlsplit(newurl).scheme.lower()
            if scheme not in allowed_schemes:
                raise ValueError(
                    f"urllib_fetcher: redirect to a {scheme}:// URL "
                    f"({newurl!r}), outside allowed_schemes "
                    f"{allowed_schemes}")
            return super().redirect_request(
                req, fp, code, msg, headers, newurl)

    opener = urllib.request.build_opener(_SchemeCheckedRedirect)

    def fetch(iri: str) -> str | None:
        if urlsplit(iri).scheme.lower() not in allowed_schemes:
            return None  # fall through to the engine's file:// path
        req = urllib.request.Request(iri, headers={"Accept": _ACCEPT})
        with opener.open(req, timeout=timeout_s) as resp:
            data = resp.read(max_bytes + 1)
            if len(data) > max_bytes:
                raise ValueError(
                    f"urllib_fetcher: {iri} exceeds the {max_bytes}-byte "
                    "cap (a log:content subject is a rule input, not a "
                    "bulk dataset)")
            charset = resp.headers.get_content_charset() or "utf-8"
            return data.decode(charset, errors="replace")

    return fetch
