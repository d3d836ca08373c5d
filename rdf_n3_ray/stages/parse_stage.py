"""ParseN3Turns — the core actor-pool stage: transcript text -> triples.

Maps the reference Reader (/root/reference/lib/rdf/n3/reader.rb:24-987)
onto Ray Data: a callable class passed to
``ds.map_batches(ParseN3Turns, batch_format="pyarrow", concurrency=N)``.
Compiled terminal regexes and the preseeded prefix table are built once
per worker (module import / __init__), mirroring the per-Reader setup at
reader.rb:105-121 (SURVEY.md §2.4).

Output row count != input row count (one turn -> many triples);
map_batches permits that.  Each output row carries (conv_id, turn_idx)
lineage so every downstream stage — skolemization, dedup, ordering —
remains a pure function of the input row, and retries are idempotent.
"""
from __future__ import annotations

import pyarrow as pa

from ..parser.n3_parser import parse_n3
from ..terms import kind_of

TRIPLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("graph", pa.string()),
        ("subj_kind", pa.int8()),
        ("obj_kind", pa.int8()),
    ]
)


class ParseN3Turns:
    """Stateful parse stage.

    Options mirror the reference Reader options surface
    (reader.rb:50-60): ``base_uri``, ``prefixes``, ``list_terms``,
    ``validate``.  Recovery mode (validate=False) skips malformed
    content instead of failing the task (reader.rb:848-900); per-file
    error counts are surfaced by sources/n3_files.py.
    """

    def __init__(
        self,
        base_uri: str | None = None,
        prefixes: dict | None = None,
        list_terms: bool = False,
        validate: bool = False,
    ):
        self.base_uri = base_uri
        self.prefixes = prefixes
        self.list_terms = list_terms
        self.validate = validate
        # distinct-text parse cache (see stages/extract.py): identical
        # texts parse identically — labels are document-scoped
        from .lru import LruDict

        self._cache = LruDict(65536)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()

        out_conv, out_turn = [], []
        out_s, out_p, out_o, out_g = [], [], [], []
        for conv, turn, text in zip(conv_ids, turn_idxs, texts):
            if not text:
                continue
            quads = self._cache.get(text)
            if quads is None:
                quads = parse_n3(
                    text,
                    base_uri=self.base_uri,
                    prefixes=self.prefixes,
                    list_terms=self.list_terms,
                    validate=self.validate,
                ).quads
                self._cache.put(text, quads)  # LRU half-eviction
            for s, p, o, g in quads:
                out_conv.append(conv)
                out_turn.append(turn)
                out_s.append(s)
                out_p.append(p)
                out_o.append(o)
                out_g.append(g)
        return pa.table(
            {
                "conv_id": pa.array(out_conv, pa.string()),
                "turn_idx": pa.array(out_turn, pa.int32()),
                "subj": pa.array(out_s, pa.string()),
                "pred": pa.array(out_p, pa.string()),
                "obj": pa.array(out_o, pa.string()),
                "graph": pa.array(out_g, pa.string()),
                "subj_kind": pa.array([kind_of(s) for s in out_s], pa.int8()),
                "obj_kind": pa.array([kind_of(o) for o in out_o], pa.int8()),
            }
        )


def parse_transcripts(
    ds,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    **parser_opts,
):
    """Attach the parse stage to a transcript Dataset.

    concurrency=None -> stateless tasks (fine: parser state is
    module-level compiled regexes, shared per worker process anyway);
    an int/tuple -> explicit actor pool, used when the stage should be
    capacity-capped against other stages.
    """
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        return ds.map_batches(ParseN3Turns, fn_constructor_kwargs=parser_opts, **kwargs)
    return ds.map_batches(ParseN3Turns(**parser_opts), **kwargs)
