"""Fused per-turn KG extraction: parse + mention-link in ONE map stage.

At scale the flagship pipeline should read each transcript row exactly
once.  Running the parser and the linker as separate Dataset branches
means a second full pass over the input (and a union barrier); fusing
them into one map_batches keeps the pipeline single-pass:

    read -> ExtractTurnKG (triples + link triples per batch) -> skolemize
         -> dedup shuffle -> sort

The stage is a callable class (actor-poolable); with ``concurrency=None``
it runs as stateless tasks that scale elastically to the cluster — the
right default since the parser's compiled-regex state is module-level
and the entity index is a small dict pickled with the stage.
"""
from __future__ import annotations

import pyarrow as pa

from ..parser.n3_parser import parse_n3
from ..terms import kind_of

_KIND_IRI = kind_of("<urn:x>")
from .linker import MENTIONS_PRED, _MENTION_RE


class ExtractTurnKG:
    def __init__(
        self,
        entity_index: dict[str, tuple[str, float]] | None = None,
        base_uri: str | None = None,
        prefixes: dict | None = None,
        list_terms: bool = False,
    ):
        self.index = entity_index or {}
        self.base_uri = base_uri
        self.prefixes = prefixes
        self.list_terms = list_terms
        # per-worker LRU over distinct texts: exact-duplicate turns are
        # ubiquitous at transcript scale (~70% dup ratio on the bench
        # corpus) and parse output for identical text is identical —
        # bnode labels are document-scoped and only get (conv, turn)
        # salt later, in skolemize.  Cache value: (quads, mention_iris,
        # subj_kinds, obj_kinds).
        from .lru import LruDict

        self._cache = LruDict(65536)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        oc, ot, os_, op, oo, og, oe = [], [], [], [], [], [], []
        osk, ook = [], []
        for conv, turn, text in zip(conv_ids, turn_idxs, texts):
            if not text:
                continue
            cached = self._cache.get(text)
            if cached is None:
                result = parse_n3(
                    text,
                    base_uri=self.base_uri,
                    prefixes=self.prefixes,
                    list_terms=self.list_terms,
                )
                mention_iris = []
                if self.index:
                    seen = set()
                    for m in _MENTION_RE.findall(text):
                        norm = m.lower().strip()
                        if norm in seen:
                            continue
                        seen.add(norm)
                        hit = self.index.get(norm)
                        if hit is not None:
                            mention_iris.append(f"<{hit[0]}>")
                # cache COLUMNS, not quads: replay below is C-level
                # list.extend per turn instead of a Python loop per
                # quad (the ~70%-dup corpora replay far more than
                # they parse)
                quads = result.quads
                cached = (
                    [q[0] for q in quads],
                    [q[1] for q in quads],
                    [q[2] for q in quads],
                    [q[3] for q in quads],
                    [kind_of(q[0]) for q in quads],
                    [kind_of(q[2]) for q in quads],
                    list(range(len(quads))),
                    mention_iris,
                )
                self._cache.put(text, cached)  # LRU half-eviction
            (c_s, c_p, c_o, c_g, c_sk, c_ok, c_emit,
             mention_iris) = cached
            # deterministic emission position within the turn gives
            # every output row a globally unique identity (conv_id,
            # turn_idx, emit_idx) regardless of how Ray later splits
            # blocks — required by the narrow dedup shuffle
            n = len(c_s)
            oc.extend([conv] * n)
            ot.extend([turn] * n)
            os_.extend(c_s)
            op.extend(c_p)
            oo.extend(c_o)
            og.extend(c_g)
            oe.extend(c_emit)
            osk.extend(c_sk)
            ook.extend(c_ok)
            emit = n
            for iri in mention_iris:
                oc.append(conv)
                ot.append(turn)
                os_.append(f"<urn:turn:{conv}:{turn}>")
                op.append(MENTIONS_PRED)
                oo.append(iri)
                og.append(None)
                oe.append(emit)
                osk.append(_KIND_IRI)
                ook.append(_KIND_IRI)
                emit += 1
        return pa.table(
            {
                "conv_id": pa.array(oc, pa.string()),
                "turn_idx": pa.array(ot, pa.int32()),
                "subj": pa.array(os_, pa.string()),
                "pred": pa.array(op, pa.string()),
                "obj": pa.array(oo, pa.string()),
                "graph": pa.array(og, pa.string()),
                "subj_kind": pa.array(osk, pa.int8()),
                "obj_kind": pa.array(ook, pa.int8()),
                "emit_idx": pa.array(oe, pa.int32()),
            }
        )


def entity_index_from_table(entities: pa.Table) -> dict[str, tuple[str, float]]:
    return {
        r["mention_norm"]: (r["canonical_iri"], r["score"])
        for r in entities.to_pylist()
    }


def extract_turn_kg(ds, entities: pa.Table | None = None, concurrency=None, **opts):
    index = entity_index_from_table(entities) if entities is not None else None
    kwargs = dict(batch_format="pyarrow")
    if concurrency is not None:
        return ds.map_batches(
            ExtractTurnKG,
            fn_constructor_kwargs={"entity_index": index, **opts},
            concurrency=concurrency,
            **kwargs,
        )
    return ds.map_batches(ExtractTurnKG(entity_index=index, **opts), **kwargs)
