"""Format registry + detection — mirrors RDF::N3::Format
(/root/reference/lib/rdf/n3/format.rb:19-99).

Maps content types / file extensions to reader configurations and
provides the content-sniffing `detect` heuristic (format_spec.rb:9-39
behaviors): N3-specific tokens (`@prefix`, `{}` formulae, `=>`, paths)
vs plain N-Triples lines.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Format:
    name: str
    content_types: tuple[str, ...]
    extensions: tuple[str, ...]
    reader_options: dict = field(default_factory=dict)


REGISTRY: dict[str, Format] = {}


def register(fmt: Format) -> None:
    REGISTRY[fmt.name] = fmt


register(Format("n3", ("text/n3", "text/rdf+n3", "application/rdf+n3"), (".n3",)))
register(Format("turtle", ("text/turtle", "application/x-turtle"), (".ttl",)))
register(
    Format("ntriples", ("application/n-triples", "text/plain"), (".nt",))
)


def for_content_type(ct: str) -> Format | None:
    ct = ct.split(";")[0].strip().lower()
    for fmt in REGISTRY.values():
        if ct in fmt.content_types:
            return fmt
    return None


def for_extension(path: str) -> Format | None:
    low = path.lower()
    for fmt in REGISTRY.values():
        if any(low.endswith(e) for e in fmt.extensions):
            return fmt
    return None


_N3_HINTS = re.compile(
    # N3-only constructs: rules, formulae, quickvars, paths, is/of sugar
    r"(?:@(?:base|prefix|forAll|forSome)\b)|=>|<=(?:\s)|\{|\?[A-Za-z]"
    r"|(?:\^|!)(?=\S)|\bis\b.+\bof\b",
)
_DIRECTIVE = re.compile(r"(?:@|PREFIX|BASE)", re.IGNORECASE)
_NT_LINE = re.compile(
    r'^\s*(?:<[^>]*>|_:\w+)\s+<[^>]*>\s+(?:<[^>]*>|_:\w+|"[^"]*"[^\s]*)\s*\.\s*$'
)


def detect(sample: str) -> str:
    """Best-effort format name from content (format.rb detection)."""
    lines = [ln for ln in sample.splitlines() if ln.strip() and not ln.strip().startswith("#")]
    if lines and all(_NT_LINE.match(ln) for ln in lines[:20]):
        return "ntriples"
    if _N3_HINTS.search(sample):
        return "n3"
    if _DIRECTIVE.search(sample):
        return "turtle"
    return "n3"


def read_files(paths, base_uri: str | None = None, **reader_opts):
    """`ray.data.read_text`-style file source -> parsed triple Dataset.

    Local-file variant of the reference's RDF::Reader.open fetch path
    (one document per file).  All registered formats (N-Triples and
    Turtle are syntactic subsets of N3) parse through the same reader,
    so no per-file dispatch is needed; `detect`/`for_extension` serve
    the registry API surface (format.rb:19-32)."""
    import pyarrow as pa
    import ray.data as rd

    from ..parser.n3_parser import parse_n3

    files = rd.read_binary_files(paths, include_paths=True)

    def parse_file(batch: pa.Table) -> pa.Table:
        out = {"path": [], "subj": [], "pred": [], "obj": [], "graph": []}
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            text = data.decode("utf-8", "replace")
            result = parse_n3(text, base_uri=base_uri or f"file://{path}", **reader_opts)
            for s, p, o, g in result.quads:
                out["path"].append(path)
                out["subj"].append(s)
                out["pred"].append(p)
                out["obj"].append(o)
                out["graph"].append(g)
        return pa.table(
            {k: pa.array(v, pa.string()) for k, v in out.items()}
        )

    return files.map_batches(parse_file, batch_format="pyarrow")
