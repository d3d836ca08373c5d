"""Relational operator pipelines over the test tables — the
oracle-checkable demonstrations of the engine's generic operators
(filters/projections §2.3, aggregations §2.6, sorts/limits §2.7,
set ops/dedup §2.8, joins/lookups §2.5).

Patterns (ray_guide):
- prune columns at the read (`columns=[...]`)
- vectorized pyarrow/pandas kernels inside map_batches
- partial (map-side) aggregation before the groupby shuffle
- broadcast small dimension tables via ray.put, no shuffle join
- column names match the oracle SQL aliases exactly (driver contract)
"""
from __future__ import annotations

import itertools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.rounding import round_half_away


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


def _user_bucket(user_id: "pd.Series", num_buckets: int) -> "pd.Series":
    """Shared co-location bucket for user-keyed shuffles (sessionize,
    as-of join, COUNT DISTINCT): one definition so co-grouped operators
    can never disagree on bucket assignment."""
    return (user_id % num_buckets).astype("int32")


def _semi_probe(keys_sorted: np.ndarray,
                values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(hit_mask, positions) of `values` against a SORTED int64 key
    array (searchsorted + equality probe).  One shared definition so
    every broadcast-lookup call site gets the empty-keys guard
    (clip(0, -1) on an empty array would index out of bounds)."""
    if len(keys_sorted) == 0:
        z = np.zeros(len(values), dtype=np.int64)
        return np.zeros(len(values), dtype=bool), z
    pos = np.searchsorted(keys_sorted, values).clip(0, len(keys_sorted) - 1)
    return keys_sorted[pos] == values, pos


def _semi_mask(keys_sorted: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Membership mask for a broadcast semi-join (see _semi_probe)."""
    return _semi_probe(keys_sorted, values)[0]


# DuckDB's RE2 '\s' is ASCII-only AND excludes \v ([ \t\n\f\r], the
# classic Perl set — verified against DuckDB); Python str.split()
# splits on ALL Unicode whitespace (\v, \x85, NBSP, \x1c...), a silent
# oracle-parity divergence on exotic texts (same bug class 94bdf1e
# fixed for the PII scrub).  Every tokenizing operator whose oracle
# splits on '\s+' must use this instead of .str.split().
_ASCII_WS = r"[ \t\n\f\r]+"


def _n_words(text: "pd.Series") -> "pd.Series":
    """Word count as the number of maximal non-ASCII-WS runs — exact
    parity with the `_N_WORDS_SQL` fragment on every input, including
    leading/trailing newlines (space-only trim() would leave an empty
    split segment) and \\v (ordinary char in RE2 '\\s' AND here).
    Python str.split() would diverge on both (see _ASCII_WS)."""
    return text.fillna("").str.count(r"[^ \t\n\f\r]+").astype("int64")


# SQL twin of _n_words: split on RE2 '\s+' and count non-empty segments
_N_WORDS_SQL = ("length(list_filter(regexp_split_to_array("
                "coalesce(text, ''), '\\s+'), x -> x <> ''))")


def _ws_tokens(text: "pd.Series") -> "pd.Series":
    """lower + split exactly like the oracle's
    regexp_split_to_array(lower(...), '\\s+') + drop-empty filter;
    returns an exploded Series of non-empty tokens."""
    ex = (text.fillna("").str.lower()
          .str.split(_ASCII_WS, regex=True).explode().dropna())
    return ex[ex != ""]


def _strip_meta(ds):
    """Drop parquet's b'pandas' schema metadata (it makes pa.Schema
    unhashable — "Failed to hash the schemas" — and defeats Ray's
    schema-dedup fast path).  Applied ONLY in front of batch_size-
    slicing stages (ANN / embedding paths) where the dedup matters:
    as a blanket _read stage it cost ~0.8s per two-table query
    (measured A/B on asof_join) for no benefit elsewhere."""
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow")


def _fold_pd(ds, empty: "pd.DataFrame") -> "pd.DataFrame":
    """Collect a small partials Dataset for the driver-side fold.
    A Ray Dataset whose every block is empty can DROP the schema in
    to_pandas() (zero columns — the nation_trade_volume failure mode),
    so a column-less result falls back to the caller's typed empty
    frame instead of KeyError-ing in the fold."""
    df = ds.to_pandas()
    if len(df.columns) == 0:
        return empty.copy()
    return df


# ---------------------------------------------------------------------------
# Q1-style aggregate: partial agg inside map_batches, then small groupby
# ---------------------------------------------------------------------------

def lineitem_agg(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pd.Timestamp("1998-09-02")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["l_shipdate"] <= cutoff]
        if batch.empty:
            # explicit dtypes: a dtype-less empty frame materializes as
            # a null-typed Arrow block that conflicts with the int64
            # schema of non-empty partials
            return pd.DataFrame({
                "l_returnflag": pd.Series(dtype="object"),
                "l_linestatus": pd.Series(dtype="object"),
                "sum_qty": pd.Series(dtype="int64"),
                "sum_base_price": pd.Series(dtype="int64"),
                "sum_disc_price": pd.Series(dtype="int64"),
                "count_order": pd.Series(dtype="int64"),
            })
        # exact integer-cents arithmetic: floor(x*100+0.5) is the same
        # IEEE op sequence in pandas and DuckDB, and int64 sums are
        # order-independent — no float summation drift vs the oracle
        batch = batch.assign(
            qty_c=np.floor(batch["l_quantity"] * 100.0 + 0.5).astype("int64"),
            base_c=np.floor(batch["l_extendedprice"] * 100.0 + 0.5).astype("int64"),
            disc_c=np.floor(
                batch["l_extendedprice"] * (1 - batch["l_discount"]) * 100.0 + 0.5
            ).astype("int64"),
        )
        g = batch.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty_c", "sum"),
            sum_base_price=("base_c", "sum"),
            sum_disc_price=("disc_c", "sum"),
            count_order=("qty_c", "size"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    from ray.data.aggregate import Count, Sum

    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            batch[c] = batch[c].astype("int64") / 100.0
        batch["count_order"] = batch["count_order"].astype("int64")
        return batch

    return out.map_batches(finish, batch_format="pandas").sort(
        ["l_returnflag", "l_linestatus"]
    )


LINEITEM_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
       SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Big-big bucket join: orders x customer (both fact-scaled) with the
# nation DIMENSION broadcast -> per-nation order stats
# ---------------------------------------------------------------------------

def orders_by_nation(sf_dir: str, num_partitions: int = 64):
    """orders ⋈ customer ⋈ nation.  customer scales with the fact table
    (TPC-H: 150k x SF rows), so it is NOT broadcast: both fact sides are
    shuffled once on the shared custkey bucket and merged per group
    (the revenue_by_priority pattern); only the 25-row nation dimension
    travels by ray.put.  Orders pre-aggregate per custkey map-side, so
    the shuffle ships one partial row per (batch, custkey), not every
    order."""
    import ray

    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    nation_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    # both union sides carry IDENTICAL columns (repo idiom): mismatched
    # schemas make Ray's shuffle warn per block and pandas-coerce the
    # int64 partials to float64 when frames merge
    _cols = ["ckey", "order_count", "total_price", "n_name", "jb", "side"]

    def pre_orders(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(price_c=np.floor(
            b["o_totalprice"] * 100.0 + 0.5).astype("int64"))
        g = (b.groupby("o_custkey", as_index=False)
             .agg(order_count=("price_c", "size"),
                  total_price=("price_c", "sum")))
        g = g.rename(columns={"o_custkey": "ckey"})
        g["order_count"] = g["order_count"].astype("int64")
        g["n_name"] = ""
        g["jb"] = (g["ckey"] % num_partitions).astype("int32")
        g["side"] = np.int8(0)
        return g[_cols]

    left = orders.map_batches(pre_orders, batch_format="pandas",
                              batch_size=65536)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(nation_ref)
        n = len(b)
        return pd.DataFrame({
            "ckey": b["c_custkey"].to_numpy().astype("int64"),
            "order_count": np.zeros(n, dtype="int64"),
            "total_price": np.zeros(n, dtype="int64"),
            "n_name": b["c_nationkey"].map(m),
            "jb": (b["c_custkey"].to_numpy() % num_partitions)
                  .astype("int32"),
            "side": np.full(n, 1, dtype="int8")})[_cols]

    both = left.union(cust.map_batches(tag_cust, batch_format="pandas"))

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == 0]
        r = group[group["side"] == 1][["ckey", "n_name"]]
        if l.empty or r.empty:
            return pd.DataFrame({
                "n_name": pd.Series(dtype="object"),
                "order_count": pd.Series(dtype="int64"),
                "total_price": pd.Series(dtype="int64")})
        per_cust = (l.groupby("ckey", as_index=False)
                    .agg(order_count=("order_count", "sum"),
                         total_price=("total_price", "sum")))
        m = per_cust.merge(r, on="ckey")
        return (m.groupby("n_name", as_index=False)
                .agg(order_count=("order_count", "sum"),
                     total_price=("total_price", "sum")))

    partials = both.groupby("jb").map_groups(join_bucket,
                                             batch_format="pandas")
    # per-bucket output is pre-aggregated to <= |nation| rows, so the
    # final fold is bounded by num_partitions x 25 rows — driver-side
    # merge, no second shuffle
    out = (partials.to_pandas()
           .groupby("n_name", as_index=False)
           .agg(order_count=("order_count", "sum"),
                total_price=("total_price", "sum")))
    out["order_count"] = out["order_count"].astype("int64")
    out["total_price"] = out["total_price"].astype("int64") / 100.0
    return out.sort_values("n_name").reset_index(drop=True)


ORDERS_BY_NATION_SQL = """
SELECT n.n_name AS n_name,
       COUNT(*) AS order_count,
       SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) / 100.0 AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


# ---------------------------------------------------------------------------
# Sort / limit: top events by value
# ---------------------------------------------------------------------------

def top_events(sf_dir: str, k: int = 100):
    """Top-k by (value DESC, event_id ASC) WITHOUT a global sort: each
    batch keeps its own top-k (vectorized sort_values.head), a second
    combine level bounds the driver merge at ~blocks*k rows even with
    millions of input blocks — only ever k rows per block move."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["value", "event_id"],
                                 ascending=[False, True]).head(k)

    partials = ds.map_batches(partial, batch_format="pandas")
    combined = partials.repartition(8).map_batches(partial,
                                                   batch_format="pandas")
    top = combined.to_pandas()  # <= 8*k rows
    top = (top.sort_values(["value", "event_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    top["value"] = round_half_away(top["value"], 6)
    return top


TOP_EVENTS_SQL = """
SELECT event_id, user_id, event_type, ROUND(value, 6) AS value
FROM events
ORDER BY value DESC, event_id
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Windowed aggregate over the event stream: per (user, hour) tumbling
# ---------------------------------------------------------------------------

def events_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            hour=batch["ts"].dt.floor("h"),
            value_u=np.floor(batch["value"] * 1e6 + 0.5).astype("int64"),
        )
        return batch.groupby(["user_id", "hour"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value_u", "sum")
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    # high-cardinality grouping: Ray's groupby().aggregate() pays
    # per-group overhead (here ~#users x #hours groups) — shuffle on a
    # coarse hash bucket and run the vectorized pandas groupby inside
    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(gb=(batch["user_id"] % 64).astype("int32"))

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby(["user_id", "hour"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].astype("int64") / 1e6
        return out

    out = (
        partials.map_batches(bucket, batch_format="pandas")
        .groupby("gb")
        .map_groups(combine, batch_format="pandas")  # combine's groupby drops gb
    )
    return out.sort(["user_id", "hour"])


EVENTS_HOURLY_SQL = """
SELECT user_id, date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events,
       SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_value
FROM events
GROUP BY user_id, date_trunc('hour', ts)
ORDER BY user_id, hour
"""


# ---------------------------------------------------------------------------
# Filter + distinct (set op)
# ---------------------------------------------------------------------------

def event_types(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type"])
    vals = ds.unique("event_type")  # distinct (shuffle) -> small list
    return pd.DataFrame({"event_type": sorted(vals)})


EVENT_TYPES_SQL = "SELECT DISTINCT event_type FROM events"


# ---------------------------------------------------------------------------
# Text stats with exact-arithmetic features (oracle-matchable)
# ---------------------------------------------------------------------------

def doc_token_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": text.str.len().astype("int64"),
                "n_words": _n_words(text),
                "n_digits": text.str.count(r"[0-9]").astype("int64"),
            }
        )

    return ds.map_batches(stats, batch_format="pandas", batch_size=8192).sort("doc_id")


DOC_TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       length(text) AS n_chars,
       {_N_WORDS_SQL} AS n_words,
       length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits
FROM documents
ORDER BY doc_id
"""


def source_report(sf_dir: str):
    """Per-source corpus report card: how much text each ingestion
    source contributed and its aggregate shape — the first table a
    curation run prints.  All-integer (counts + sums; means are
    downstream division) so the oracle comparison is float-free.

    Scale shape: per-batch partial sums per (source, lang) — at most
    |sources|x|langs| rows leave each batch — then one tiny groupby;
    the corpus never shuffles."""
    ds = _read(sf_dir, "documents", columns=["text", "lang", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("")
        g = pd.DataFrame({
            "source": b["source"].fillna(""),
            "n_docs": np.ones(len(b), dtype=np.int64),
            "n_langs_rows": b["lang"].fillna(""),
            "sum_chars": text.str.len().astype("int64"),
            "sum_words": _n_words(text),
            "sum_digits": text.str.count(r"[0-9]").astype("int64"),
        })
        m = g.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"),
            sum_words=("sum_words", "sum"),
            sum_digits=("sum_digits", "sum"),
            n_langs=("n_langs_rows", "nunique"))
        # nunique is NOT sum-mergeable: ship the distinct (source, lang)
        # pairs instead and count them exactly in the final fold
        langs = (g[["source", "n_langs_rows"]].drop_duplicates()
                 .rename(columns={"n_langs_rows": "lang"}))
        m = m.drop(columns=["n_langs"])
        m["lang"] = ""          # identical-columns union idiom
        langs = langs.assign(n_docs=np.int64(0), sum_chars=np.int64(0),
                             sum_words=np.int64(0), sum_digits=np.int64(0))
        cols = ["source", "lang", "n_docs", "sum_chars", "sum_words",
                "sum_digits"]
        return pd.concat([m[cols], langs[cols]], ignore_index=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        sums = (df[df["lang"] == ""].groupby("source", as_index=False)
                [["n_docs", "sum_chars", "sum_words", "sum_digits"]].sum())
        nl = (df[df["lang"] != ""][["source", "lang"]].drop_duplicates()
              .groupby("source").size().rename("n_langs").reset_index())
        out = sums.merge(nl, on="source", how="left")
        out["n_langs"] = out["n_langs"].fillna(0).astype("int64")
        for c in ("n_docs", "sum_chars", "sum_words", "sum_digits"):
            out[c] = out[c].astype("int64")
        return out.sort_values("source").reset_index(drop=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    return fold(_fold_pd(partials, pd.DataFrame({
        "source": pd.Series(dtype="object"),
        "lang": pd.Series(dtype="object"),
        "n_docs": pd.Series(dtype="int64"),
        "sum_chars": pd.Series(dtype="int64"),
        "sum_words": pd.Series(dtype="int64"),
        "sum_digits": pd.Series(dtype="int64")})))


SOURCE_REPORT_SQL = rf"""
SELECT coalesce(source, '') AS source,
       count(*)::BIGINT AS n_docs,
       SUM(length(coalesce(text, '')))::BIGINT AS sum_chars,
       SUM({_N_WORDS_SQL})::BIGINT AS sum_words,
       SUM(length(coalesce(text, '')) - length(
           regexp_replace(coalesce(text, ''), '[0-9]', '', 'g')))::BIGINT
           AS sum_digits,
       COUNT(DISTINCT coalesce(lang, ''))::BIGINT AS n_langs
FROM documents GROUP BY 1 ORDER BY source
"""


def domain_resample(sf_dir: str, alpha: float = 0.5):
    """Temperature-based domain rebalancing: downsample each source so
    its kept share follows n_s^alpha (the multinomial temperature mix
    of GPT-3 / The Pile / CC-mix recipes, alpha in (0, 1] flattens the
    source distribution; alpha=1 keeps everything).  Keep probability
    q_s = (min_n / n_s)^(1-alpha), so the SMALLEST source keeps 100%
    and larger sources shrink toward the flattened mix.  Selection is
    a deterministic per-doc hash gate — h(doc_id) mod 2^32 <
    floor(2^32 * q_s) — so the sample is reproducible, resumable, and
    engine-independent: sqrt and float division are IEEE
    correctly-rounded in both numpy and DuckDB, and the hash is exact
    integer arithmetic (Knuth multiplicative mod 2^32), so the oracle
    reproduces the EXACT row set, not a statistical twin.

    Scale shape: per-batch partial counts per source (at most
    |sources| rows leave each batch) -> tiny driver fold -> thresholds
    broadcast in the closure -> one filter map.  NO shuffle; the
    corpus streams through exactly twice (count pass + filter pass)."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source"]).materialize()

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"source": b["source"].fillna("")})
             .groupby("source", as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return g

    empty_c = pd.DataFrame({"source": pd.Series(dtype="object"),
                            "n": pd.Series(dtype="int64")})
    cnt = _fold_pd(ds.map_batches(counts, batch_format="pandas"), empty_c)
    cnt = cnt.groupby("source", as_index=False)["n"].sum()
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "source": pd.Series(dtype="object")})
    if cnt.empty:
        return empty
    mn = int(cnt["n"].min())
    # float64 ops in the same order as the SQL: divide, sqrt, multiply,
    # floor — each IEEE correctly-rounded, so thresholds match
    # bit-exactly.  At the default alpha=0.5 the exponent is sqrt
    # (correctly rounded by spec in BOTH engines); generic pow lacks
    # that guarantee, so only the sqrt path claims oracle bit-parity.
    r = float(mn) / cnt["n"].to_numpy(np.float64)
    q = np.sqrt(r) if alpha == 0.5 else r ** (1.0 - alpha)
    thresh = np.floor(4294967296.0 * q).astype(np.int64)
    th = dict(zip(cnt["source"], thresh))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(4294967296)
        t = b["source"].fillna("").map(th).to_numpy(np.int64)
        m = h.astype(np.int64) < t
        return pd.DataFrame({"doc_id": ids[m].astype("int64"),
                             "source": b["source"].fillna("").to_numpy()[m]})

    out = ds.map_batches(keep, batch_format="pandas").to_pandas()
    if out.empty:
        return empty
    return out.sort_values("doc_id").reset_index(drop=True)


def pack_sequences(sf_dir: str, budget: int = 256):
    """Greedy sequence packing: lay documents into fixed token-budget
    bins (the universal LLM-preprocessing step that turns ragged docs
    into dense training sequences).  Within each source, docs are
    packed in doc_id order: a doc opens a new bin iff it would overflow
    the current one; an oversize doc (t > budget) gets a bin to itself
    (truncation is the downstream tokenizer's call, not the packer's).
    Emits (doc_id, source, n_tokens, bin_id, off) — bin_id counts per
    source, off is the doc's token offset inside its bin — so the
    layout is a pure deterministic function of the corpus.

    Scale shape: token counts are a pure map; packing shuffles ONCE by
    source and runs per-group.  The greedy scan is sequential by
    definition, but the per-group kernel loops over BINS, not docs
    (each bin boundary is one searchsorted over the prefix-sum array),
    then assigns ids/offsets vectorized.  At 100 TB you pack per
    (source, shard-of-fixed-row-ranges) independently and offset the
    bin ids per shard — same kernel, one more partition key; packing
    quality loses at most one partial bin per shard boundary."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "source": b["source"].fillna(""),
            "n_tokens": _n_words(b["text"]),
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        return _pack_group(g, budget)

    return (ds.map_batches(toks, batch_format="pandas")
            .groupby("source").map_groups(pack, batch_format="pandas")
            .sort(["source", "doc_id"]))


def _pack_group(g: "pd.DataFrame", budget: int) -> "pd.DataFrame":
    """The per-source greedy packing kernel (module-level so property
    tests can drive it against the SQL recurrence without Ray): loops
    over BIN boundaries via searchsorted on the token prefix sums, then
    assigns bin ids and in-bin offsets vectorized."""
    g = g.sort_values("doc_id", kind="stable").reset_index(drop=True)
    t = g["n_tokens"].to_numpy(np.int64)
    cum = np.concatenate([[0], np.cumsum(t)])
    starts = []  # first doc index of each bin
    i, n = 0, len(t)
    while i < n:
        starts.append(i)
        j = int(np.searchsorted(cum, cum[i] + budget, side="right")) - 1
        i = max(j, i + 1)  # oversize doc: bin of its own
    starts = np.asarray(starts, dtype=np.int64)
    bin_of = np.zeros(n, dtype=np.int64)
    bin_of[starts[1:]] = 1
    bin_of = np.cumsum(bin_of)
    off = cum[:-1] - cum[starts[bin_of]]
    g["bin_id"] = bin_of
    g["off"] = off.astype("int64")
    return g


# the bin transition fires whenever the doc would overflow — with NO
# "running > 0" escape, so an oversize doc opens its own bin even when
# the current bin holds only zero-token docs (matching the kernel's
# prefix-sum walk exactly; verified on adversarial zero-token/oversize
# interleavings)
PACK_SEQUENCES_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id::BIGINT AS doc_id, coalesce(source, '') AS source,
         {_N_WORDS_SQL}::BIGINT AS n_tokens,
         row_number() OVER (PARTITION BY coalesce(source, '')
                            ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT source, rn, doc_id, n_tokens,
         0::BIGINT AS bin_id, 0::BIGINT AS off,
         n_tokens AS running
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT w.source, x.rn, x.doc_id, x.n_tokens,
         CASE WHEN w.running + x.n_tokens > 256
              THEN w.bin_id + 1 ELSE w.bin_id END,
         CASE WHEN w.running + x.n_tokens > 256
              THEN 0 ELSE w.running END,
         CASE WHEN w.running + x.n_tokens > 256
              THEN x.n_tokens ELSE w.running + x.n_tokens END
  FROM walk w JOIN toks x ON x.source = w.source AND x.rn = w.rn + 1
)
SELECT doc_id, source, n_tokens, bin_id, off
FROM walk ORDER BY source, doc_id
"""


# (doc_id * 2654435761) stays under 2^95 << HUGEINT range, and
# x mod 2^32 is invariant under the numpy side's mod-2^64 wraparound
DOMAIN_RESAMPLE_SQL = """
WITH counts AS (
  SELECT coalesce(source, '') AS source, count(*)::BIGINT AS n
  FROM documents GROUP BY 1
), mn AS (SELECT min(n) AS mn FROM counts),
th AS (
  SELECT source,
         CAST(floor(4294967296.0 * sqrt(mn * 1.0 / n)) AS BIGINT) AS t
  FROM counts, mn
)
SELECT d.doc_id::BIGINT AS doc_id, coalesce(d.source, '') AS source
FROM documents d
JOIN th ON th.source = coalesce(d.source, '')
WHERE (d.doc_id::HUGEINT * 2654435761) % 4294967296 < t
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Exact dedup (documents): min doc_id per identical text
# ---------------------------------------------------------------------------

def dedup_exact_docs(sf_dir: str):
    from ..stages.neardup import exact_dedup_docs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup_docs(ds, key_cols=("text",))
    return out.select_columns(["doc_id"]).sort("doc_id")


DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Language prediction distribution (heuristic; oracle checks row shape)
# ---------------------------------------------------------------------------

def lang_distribution(sf_dir: str):
    from ..stages.text_stats import LangId

    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # elastic actor pool up to the cluster's CPU count — a fixed cap
    # would starve the only expensive stage of this pipeline at scale
    pool_max = max(2, int(ray.cluster_resources().get("CPU", 8)))
    scored = ds.map_batches(LangId, batch_format="pandas", batch_size=4096,
                            concurrency=(1, pool_max))
    from ray.data.aggregate import Count

    out = scored.groupby("lang_pred").aggregate(Count(alias_name="n_docs"))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["n_docs"] = b["n_docs"].astype("int64")
        return b

    return out.map_batches(finish, batch_format="pandas").sort("lang_pred")


def top_tokens(sf_dir: str, k: int = 50, num_buckets: int = 32):
    """Corpus-wide token frequency top-k: map-side partial counts per
    batch (vectorized explode+value_counts), token-hash bucket groupby
    merges partials (each bucket sums its own tokens — a token never
    spans buckets), per-bucket partial top-k, tiny driver merge.  The
    full vocabulary never assembles in one place."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        counts = _ws_tokens(b["text"]).value_counts()
        out = counts.rename_axis("token").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        out["tb"] = (pd.util.hash_pandas_object(out["token"], index=False)
                     % num_buckets).astype("int32")
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("token", as_index=False)["n"].sum()
        m["n"] = m["n"].astype("int64")
        # per-bucket partial top-k (count DESC, token ASC)
        return m.sort_values(["n", "token"],
                             ascending=[False, True]).head(k)

    partials = (ds.map_batches(partial, batch_format="pandas")
                .groupby("tb").map_groups(merge_bucket,
                                          batch_format="pandas"))
    top = partials.to_pandas()  # <= num_buckets * k rows
    return (top.sort_values(["n", "token"], ascending=[False, True])
            .head(k).reset_index(drop=True)[["token", "n"]])


TOP_TOKENS_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
           x -> x <> '')) AS token
  FROM documents
)
SELECT token, count(*)::BIGINT AS n
FROM toks GROUP BY token
ORDER BY n DESC, token LIMIT 50
"""


def event_histogram(sf_dir: str, bin_width: float = 50.0, n_bins: int = 10):
    """Fixed-bin histogram of events.value: per-batch numpy bincount
    partials, single tiny groupby to sum — the classic map-side-combine
    aggregate; only n_bins rows ever shuffle per block."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bins = np.clip((b["value"].to_numpy() // bin_width).astype(np.int64),
                       0, n_bins - 1)
        counts = np.bincount(bins, minlength=n_bins)
        return pd.DataFrame({"bin": np.arange(n_bins, dtype=np.int64),
                             "n": counts.astype(np.int64)})

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("bin").aggregate(Sum("n", alias_name="n")))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["n"] = b["n"].astype("int64")
        return b

    return out.map_batches(finish, batch_format="pandas").sort("bin")


EVENT_HISTOGRAM_SQL = r"""
WITH binned AS (
  SELECT LEAST(GREATEST(CAST(FLOOR(value / 50.0) AS BIGINT), 0), 9) AS bin
  FROM events
)
SELECT b.bin, COALESCE(c.n, 0)::BIGINT AS n
FROM (SELECT unnest(generate_series(0, 9)) AS bin) b
LEFT JOIN (SELECT bin, count(*) AS n FROM binned GROUP BY bin) c
  USING (bin)
ORDER BY b.bin
"""


def distinct_users_by_type(sf_dir: str, num_buckets: int = 64):
    """Exact COUNT(DISTINCT user_id) per event_type: map-side pair dedup
    (only unique (type, user) pairs per batch enter the shuffle), a
    user-hash bucket dedup shuffle, then map-side counts + tiny Sum
    groupby.  Never shuffles raw events; never builds a global set."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates()
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    uniq = (ds.map_batches(partial, batch_format="pandas")
            .groupby("ub")
            .map_groups(lambda g: g.drop_duplicates(
                subset=["event_type", "user_id"]),
                batch_format="pandas"))

    def cnt(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size"))
        out["n_users"] = out["n_users"].astype("int64")
        return out

    from ray.data.aggregate import Sum

    out = (uniq.map_batches(cnt, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n_users", alias_name="n_users")))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["n_users"] = b["n_users"].astype("int64")
        return b

    return out.map_batches(finish, batch_format="pandas").sort("event_type")


DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def _bitlen64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (0 for 0) — no
    float round-trip: float64 rounds integers just below a power of two
    UP across the boundary, giving off-by-one leading-zero counts."""
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = (x >> np.uint64(shift)) != 0
        n[m] += shift
        x[m] >>= np.uint64(shift)
    n[x != 0] += 1
    return n


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def hll_distinct(ds, col: str, p: int = 12) -> int:
    """HyperLogLog distinct estimate over a Dataset column: each batch
    computes its own 2^p register array (vectorized numpy
    max-of-leading-zero-ranks) and emits it as ONE row; registers merge
    by elementwise max on the driver (blocks x 2^p bytes — tiny,
    mergeable, the classic sketch shape for 100 TB streams).
    Deterministic hash (splitmix64); exact integer rank kernel."""
    m = 1 << p

    def registers(b: pd.DataFrame) -> pd.DataFrame:
        h = _splitmix64(b[col].to_numpy(dtype=np.uint64))
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        # rank = leading zeros of the remaining 64-p bits, + 1
        rank = np.minimum(64 - _bitlen64(rest), 64 - p) + 1
        regs = np.zeros(m, dtype=np.int8)
        np.maximum.at(regs, idx, rank.astype(np.int8))
        return pd.DataFrame({"regs": [regs.tobytes()]})

    merged = np.zeros(m, dtype=np.int8)
    for b in (ds.map_batches(registers, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        for raw in b["regs"]:
            merged = np.maximum(merged, np.frombuffer(raw, dtype=np.int8))
    # standard HLL estimate with small-range correction
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -merged.astype(np.float64))
    zeros = int((merged == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def approx_distinct_users(sf_dir: str, p: int = 12):
    import ray.data as rd

    ds = _read(sf_dir, "events", columns=["user_id"])
    est = hll_distinct(ds, "user_id", p=p)
    # Dataset return keeps the queries() contract shape uniform
    return rd.from_pandas(pd.DataFrame({"n_users_approx": [est]}))


def event_percentiles(sf_dir: str, qs=(0.25, 0.5, 0.9, 0.99),
                      coarse_bins: int = 4096, collect_limit: int = 100_000):
    """EXACT distributed percentiles (order statistics) of events.value
    by iterative histogram descent — no global sort:

    1. one Min/Max/Count aggregate pass fixes the domain,
    2. per quantile, repeated passes histogram the candidate range
       [lo, hi) into `coarse_bins` (vectorized np bincount per batch)
       and descend into the bin containing the target rank,
    3. once the candidate bin holds <= collect_limit values, only THOSE
       values are pulled to the driver and the exact rank is read off.

    Each descent level divides the candidate population by ~coarse_bins,
    so a 10^12-row column needs ~3 levels before the collect; the
    driver never sees more than collect_limit values.  Rank rule
    matches DuckDB's quantile_disc: 1-based rank = max(1, ceil(q*n))."""
    ds = _read(sf_dir, "events", columns=["value"]).materialize()
    return exact_percentiles(ds, "value", qs=qs, coarse_bins=coarse_bins,
                             collect_limit=collect_limit)


def exact_percentiles(ds, col: str, qs=(0.25, 0.5, 0.9, 0.99),
                      coarse_bins: int = 4096, collect_limit: int = 100_000):
    """Core of event_percentiles over any (materialized) Dataset; see
    that docstring for the algorithm.  NULL/NaN values are ignored
    (DuckDB quantile_disc semantics); an all-null column returns one
    NaN row per quantile (quantile_disc over all-NULL is NULL) and a
    zero-row input returns an empty frame."""
    out = grouped_exact_percentiles(ds, col, qs=qs, group_col=None,
                                    coarse_bins=coarse_bins,
                                    collect_limit=collect_limit)
    return out[["q", "value"]].sort_values("q").reset_index(drop=True)


def event_mad(sf_dir: str, k: int = 3):
    """Robust outlier summary of events.value via the exact Median
    Absolute Deviation: median (exact discrete order statistic), MAD
    (exact median of |v - median|), and the count of values beyond
    k*MAD.  The robust-statistics complement of `event_zscore` (whose
    mean/std an outlier itself can drag).

    Scale shape: two histogram-descent selections (the machinery of
    `event_percentiles` — no global sort, driver sees <= collect_limit
    values per descent) plus one integer count pass.  All comparisons
    are deterministic IEEE float64 ops, identical in both engines; the
    median/MAD are exact data values, so the oracle matches bit-for-bit."""
    ds = _read(sf_dir, "events", columns=["value"]).materialize()
    med_df = exact_percentiles(ds, "value", qs=(0.5,))
    if med_df.empty or pd.isna(med_df["value"].iloc[0]):
        return pd.DataFrame({"median": pd.Series(dtype="float64"),
                             "mad": pd.Series(dtype="float64"),
                             "n_outliers": pd.Series(dtype="int64")})
    med = float(med_df["value"].iloc[0])

    def dev(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(np.float64)
        return pd.DataFrame({"dev": np.abs(v - med)})

    devs = ds.map_batches(dev, batch_format="pandas").materialize()
    mad = float(exact_percentiles(devs, "dev", qs=(0.5,))
                ["value"].iloc[0])
    thresh = k * mad

    def count_out(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n": [int((b["dev"].to_numpy(np.float64) > thresh).sum())]})

    parts = _fold_pd(devs.map_batches(count_out, batch_format="pandas"),
                     pd.DataFrame({"n": pd.Series(dtype="int64")}))
    n_out = int(parts["n"].sum()) if len(parts) else 0
    return pd.DataFrame({"median": pd.Series([med], dtype="float64"),
                         "mad": pd.Series([mad], dtype="float64"),
                         "n_outliers": pd.Series([n_out], dtype="int64")})


EVENT_MAD_SQL = """
WITH m AS (
  SELECT quantile_disc(value, 0.5) AS med FROM events
  WHERE value IS NOT NULL
), d AS (
  SELECT abs(value - m.med) AS dev FROM events, m
  WHERE value IS NOT NULL
), md AS (SELECT quantile_disc(dev, 0.5) AS mad FROM d)
SELECT m.med AS median, md.mad AS mad,
       (SELECT count(*) FROM d, md WHERE d.dev > 3 * md.mad)::BIGINT
         AS n_outliers
FROM m, md
"""


def percentiles_by_type(sf_dir: str, qs=(0.5, 0.9)):
    """Exact per-group order statistics over events: ONE shared
    histogram-descent keyed (group, bin) — every group (and every
    quantile) advances through the same full-data passes, so the pass
    count is O(descent depth), not O(groups x depth).  Per-group rank
    bookkeeping is a small driver-side dict."""
    ds = _read(sf_dir, "events",
               columns=["event_type", "value"]).materialize()
    out = grouped_exact_percentiles(ds, "value", qs=qs,
                                    group_col="event_type")
    out = out.rename(columns={"group": "event_type"})
    return (out[["event_type", "q", "value"]]
            .sort_values(["event_type", "q"]).reset_index(drop=True))


def grouped_exact_percentiles(ds, col: str, qs=(0.5, 0.9),
                              group_col: str | None = None,
                              coarse_bins: int = 4096,
                              collect_limit: int = 100_000):
    """EXACT distributed order statistics, optionally per group, by a
    SHARED iterative histogram descent — no global sort, no per-group
    dataset scan:

    1. one map-side pass computes per-group (min, max, non-null count);
       the driver merges the tiny partials,
    2. per level, ONE full-data pass histograms every still-active
       (group, candidate-range) pair into `coarse_bins` (vectorized
       np.searchsorted/bincount per batch, ranges deduped so quantiles
       sharing a descent prefix share the work); the driver holds only
       per-(group, quantile) rank state and descends each into the bin
       containing its target rank,
    3. once a (group, quantile)'s candidate bin holds <= collect_limit
       values, its final range joins ONE shared distinct-value collect
       pass ((range_id, value, count) pairs, merged map-side — bounded
       by the range's DISTINCT value count, so duplicate-dominated
       ranges that descent cannot subdivide still fit on the driver).

    Every level divides each candidate population by ~coarse_bins, so a
    10^12-row group needs ~3 levels; with G groups the total pass count
    is unchanged — each pass just carries G range specs (broadcast via
    ray.put, read once per batch).  NULL/NaN values are ignored and n
    counts non-null rows (DuckDB quantile_disc parity); groups with no
    non-null values yield NaN.  Rank rule: 1-based rank =
    max(1, ceil(q*n)).  Returns columns (group, q, value)."""
    import math

    import ray

    def stats_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "g": b[group_col].to_numpy() if group_col else 0,
            "v": b[col].to_numpy(),
        })
        # group BEFORE null filtering: min/max/count all skip NaN, so a
        # group whose values are all NULL still surfaces (n=0) and ends
        # up a NaN output row — quantile_disc GROUP BY parity.  Passing
        # the (possibly empty) groupby result through also keeps the
        # group-key dtype stable across blocks (no hand-built empty
        # frame with object columns).
        return (d.groupby("g")["v"].agg(mn="min", mx="max", n="count")
                .reset_index())

    stats = ds.map_batches(stats_partial, batch_format="pandas").to_pandas()
    if stats.empty:
        return pd.DataFrame({"group": [], "q": [], "value": []})
    stats = stats.groupby("g").agg(
        mn=("mn", "min"), mx=("mx", "max"), n=("n", "sum"))

    # per-(group, quantile) descent state; `finite` gates subdivision
    # (inf-valued domains produce NaN edges -> straight to collect)
    tasks = []
    for g, row in stats.iterrows():
        lo0 = float(row["mn"])
        hi0 = float(np.nextafter(row["mx"], np.inf))  # half-open
        n = int(row["n"])
        finite = bool(np.isfinite(lo0) and np.isfinite(hi0))
        for q in qs:
            tasks.append({
                "group": g, "q": float(q), "n": n,
                "r": max(1, math.ceil(q * n)),
                "lo": lo0 if finite else -np.inf,
                "hi": hi0 if finite else np.inf,
                "rank_below": 0, "in_range": n,
                "finite": finite, "subdividable": finite,
            })

    def make_edges(lo: float, hi: float) -> np.ndarray:
        # the SAME edge doubles drive binning, the next level's bounds
        # and the final collect, so float truncation can never put a
        # value outside the interval its bin bookkeeping claims
        e = lo + (hi - lo) * np.arange(coarse_bins + 1) / coarse_bins
        e[0], e[-1] = lo, hi
        return e

    def group_values(b: pd.DataFrame) -> dict:
        """batch -> {group: np.ndarray of that group's values} (one
        factorize per batch instead of one boolean scan per range)"""
        v = b[col].to_numpy()
        if group_col is None:
            return {0: v}
        codes, uniques = pd.factorize(b[group_col].to_numpy())
        order = np.argsort(codes, kind="stable")
        order = order[codes[order] >= 0]  # drop NULL-group rows (code -1)
        sc, sv = codes[order], v[order]
        bounds = np.searchsorted(sc, np.arange(len(uniques)))
        return {uniques[i]: sv[bounds[i]:(bounds[i + 1] if i + 1 < len(uniques) else len(sv))]
                for i in range(len(uniques))}

    # 48 levels: each multiplies resolution by `coarse_bins`, so 48
    # levels of 4096 exceed the 2^64 distinct doubles of ANY interval —
    # every task always ends with a small population or a <=1-ulp
    # interval (whose distinct-value collect is tiny by construction).
    for _level in range(48):
        pending = [t for t in tasks
                   if t["subdividable"] and t["in_range"] > collect_limit]
        if not pending:
            break
        # dedup (group, lo, hi) so quantiles sharing a prefix share work
        ranges: dict[tuple, int] = {}
        spec = []
        for t in pending:
            key = (t["group"], t["lo"], t["hi"])
            if key not in ranges:
                edges = make_edges(t["lo"], t["hi"])
                if edges[1] <= edges[0]:  # <=1-ulp: cannot subdivide
                    ranges[key] = -1
                else:
                    ranges[key] = len(spec)
                    spec.append((t["group"], t["lo"], t["hi"], edges))
        for t in pending:
            if ranges[(t["group"], t["lo"], t["hi"])] < 0:
                t["subdividable"] = False
        if not spec:
            continue
        spec_ref = ray.put(spec)

        def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
            sp = ray.get(spec_ref)
            by_g = group_values(b)
            rids, bins, ns = [], [], []
            for rid, (g, lo, hi, edges) in enumerate(sp):
                v = by_g.get(g)
                if v is None:
                    continue
                v = v[(v >= lo) & (v < hi)]  # NaN compares False: dropped
                if not len(v):
                    continue
                c = np.bincount(
                    np.clip(np.searchsorted(edges, v, side="right") - 1,
                            0, coarse_bins - 1),
                    minlength=coarse_bins)
                nz = np.nonzero(c)[0]
                rids.append(np.full(len(nz), rid, dtype=np.int64))
                bins.append(nz.astype(np.int64))
                ns.append(c[nz].astype(np.int64))
            if not rids:
                return pd.DataFrame({"rid": pd.Series(dtype=np.int64),
                                     "bin": pd.Series(dtype=np.int64),
                                     "n": pd.Series(dtype=np.int64)})
            return pd.DataFrame({"rid": np.concatenate(rids),
                                 "bin": np.concatenate(bins),
                                 "n": np.concatenate(ns)})

        parts = ds.map_batches(hist_partial,
                               batch_format="pandas").to_pandas()
        hists = np.zeros((len(spec), coarse_bins), dtype=np.int64)
        if len(parts):
            agg = parts.groupby(["rid", "bin"])["n"].sum().reset_index()
            hists[agg["rid"].to_numpy(), agg["bin"].to_numpy()] = \
                agg["n"].to_numpy()
        for t in pending:
            rid = ranges[(t["group"], t["lo"], t["hi"])]
            if rid < 0:
                continue
            edges = spec[rid][3]
            cum = np.cumsum(hists[rid])
            j = int(np.searchsorted(cum, t["r"] - t["rank_below"]))
            j = min(j, coarse_bins - 1)
            t["rank_below"] += int(cum[j - 1]) if j else 0
            t["lo"], t["hi"] = float(edges[j]), float(edges[j + 1])
            t["in_range"] = int(hists[rid][j])

    # ONE shared distinct-value collect over every task's final range
    live = [t for t in tasks if t["n"] > 0]
    cranges: dict[tuple, int] = {}
    cspec = []
    for t in live:
        key = (t["group"], t["lo"], t["hi"], t["finite"])
        if key not in cranges:
            cranges[key] = len(cspec)
            cspec.append(key)
    out_rows = [{"group": t["group"], "q": t["q"], "value": np.nan}
                for t in tasks if t["n"] == 0]
    if cspec:
        cspec_ref = ray.put(cspec)

        def collect_partial(b: pd.DataFrame) -> pd.DataFrame:
            sp = ray.get(cspec_ref)
            by_g = group_values(b)
            rids, vals, ns = [], [], []
            for rid, (g, lo, hi, finite) in enumerate(sp):
                v = by_g.get(g)
                if v is None:
                    continue
                if finite:
                    v = v[(v >= lo) & (v < hi)]
                else:
                    v = v[~pd.isna(v)]
                if not len(v):
                    continue
                u, c = np.unique(v, return_counts=True)
                rids.append(np.full(len(u), rid, dtype=np.int64))
                vals.append(u)
                ns.append(c.astype(np.int64))
            if not rids:
                return pd.DataFrame({"rid": pd.Series(dtype=np.int64),
                                     "value": pd.Series(dtype=np.float64),
                                     "n": pd.Series(dtype=np.int64)})
            return pd.DataFrame({"rid": np.concatenate(rids),
                                 "value": np.concatenate(vals),
                                 "n": np.concatenate(ns)})

        parts = ds.map_batches(collect_partial,
                               batch_format="pandas").to_pandas()
        merged = (parts.groupby(["rid", "value"], as_index=False)["n"]
                  .sum().sort_values(["rid", "value"]))
        by_rid = {rid: sub.reset_index(drop=True)
                  for rid, sub in merged.groupby("rid")}
        for t in live:
            rid = cranges[(t["group"], t["lo"], t["hi"], t["finite"])]
            pairs = by_rid[rid]
            cum = pairs["n"].cumsum().to_numpy()
            i = int(np.searchsorted(cum, t["r"] - t["rank_below"]))
            out_rows.append({"group": t["group"], "q": t["q"],
                             "value": float(pairs["value"].iloc[i])})
    return (pd.DataFrame(out_rows, columns=["group", "q", "value"])
            .sort_values(["group", "q"]).reset_index(drop=True))


PERCENTILES_BY_TYPE_SQL = r"""
WITH agg AS (
  SELECT event_type, quantile_disc(value, [0.5, 0.9]) AS vs
  FROM events GROUP BY event_type
)
SELECT event_type, [0.5, 0.9][i] AS q, vs[i] AS value
FROM agg, (SELECT unnest(generate_series(1, 2)) AS i) t
ORDER BY event_type, q
"""


EVENT_PERCENTILES_SQL = r"""
WITH agg AS (
  SELECT quantile_disc(value, [0.25, 0.5, 0.9, 0.99]) AS vs FROM events
)
SELECT [0.25, 0.5, 0.9, 0.99][i] AS q, vs[i] AS value
FROM agg, (SELECT unnest(generate_series(1, 4)) AS i) t
ORDER BY q
"""


_SLIDE_US = 900 * 1_000_000        # 15-minute slide
_WINDOWS_PER_EVENT = 4             # 1-hour window / 15-minute slide


def events_sliding(sf_dir: str, num_buckets: int = 32):
    """Sliding-window aggregate over the event stream: 1-hour windows
    sliding every 15 minutes.  Every event belongs to exactly 4 windows
    (window k covers [k*15min, k*15min + 1h)); the map side explodes
    each batch into per-window PARTIAL (count, cent-sum) rows — so only
    #windows-per-batch rows shuffle, not 4x the events — and a coarse
    window-hash groupby folds partials.  Sums use integer cents
    (floor(v*100+0.5)) so the DuckDB oracle is bit-exact."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = ((b["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
              ).to_numpy(dtype=np.int64)
        cents = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        k0 = us // _SLIDE_US
        ks = np.concatenate([k0 - o for o in range(_WINDOWS_PER_EVENT)])
        cs = np.tile(cents, _WINDOWS_PER_EVENT)
        g = (pd.DataFrame({"k": ks, "cents": cs})
             .groupby("k", as_index=False)
             .agg(n_events=("cents", "size"), sum_cents=("cents", "sum")))
        g["wb"] = (g["k"] % num_buckets).astype("int32")
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("k", as_index=False)
               .agg(n_events=("n_events", "sum"),
                    sum_cents=("sum_cents", "sum")))
        out["window_start_s"] = (out["k"] * 900).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_cents"] = out["sum_cents"].astype("int64")
        return out[["window_start_s", "n_events", "sum_cents"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("wb").map_groups(fold, batch_format="pandas")
            .sort("window_start_s"))


EVENTS_SLIDING_SQL = r"""
WITH e AS (
  SELECT epoch_us(ts) // 900000000 AS k0,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), x AS (
  SELECT (k0 - o.o) AS k, cents
  FROM e, (SELECT unnest([0, 1, 2, 3]) AS o) o
)
SELECT (k * 900)::BIGINT AS window_start_s,
       count(*)::BIGINT AS n_events,
       sum(cents)::BIGINT AS sum_cents
FROM x GROUP BY k ORDER BY window_start_s
"""


def decontaminate(sf_dir: str, bench_mod: int = 37, n: int = 13):
    """Benchmark decontamination: per-document count of distinct
    13-word-grams shared with a benchmark set (the standard n-gram-
    overlap hygiene check for training corpora).  The benchmark is
    derived deterministically from the corpus itself (the first 13-gram
    of every doc_id % 37 == 0 document) so the DuckDB oracle can
    recompute it exactly.

    Scale shape: the benchmark side is tiny and broadcast ONCE via
    ray.put (at 100 TB you broadcast 8-byte gram hashes instead of the
    strings); the corpus side is a single map pass — per batch, each
    doc's distinct grams are intersected with the broadcast set.  No
    shuffle except the final doc_id sort."""
    import ray

    # materialize: both the benchmark pass and the scoring pass scan the
    # table; without it each pass re-reads and re-decodes the text column
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()

    def bench_grams(b: pd.DataFrame) -> pa.Table:
        # emit ONLY the gram per qualifying doc — never ship full texts
        # to the driver (at 100 TB that is 1/bench_mod of the corpus).
        # Typed Arrow output: all-empty pandas blocks would lose the
        # schema and make the driver's ["gram"] access KeyError.
        sel = b[b["doc_id"] % bench_mod == 0]
        flat, lens = _flat_tokens(sel["text"])
        off = np.zeros(len(lens), dtype=np.int64)
        if len(lens) > 1:
            np.cumsum(lens[:-1], out=off[1:])
        grams = [" ".join(flat[o:o + n])
                 for o, ln in zip(off, lens) if ln >= n]
        return pa.table({"gram": pa.array(grams, pa.string())})

    bench = set(ds.map_batches(bench_grams,
                               batch_format="pandas").to_pandas()["gram"])
    # Broadcast 8-byte rolling gram hashes (sorted, for np.isin) plus
    # the exact gram strings — the corpus side never builds per-row
    # Python gram sets; it rolls uint64 token hashes over the batch's
    # flattened token stream in a handful of vectorized passes, and
    # only np.isin candidates are ever stringified.  EXACT: every
    # candidate is string-verified against the benchmark set and
    # deduped per (doc, gram string), so hash collisions cannot change
    # a count in either direction.
    bench_h = _gram_hash_index(bench, n)
    bench_ref = ray.put((bench_h, frozenset(bench)))

    def hits(b: pd.DataFrame) -> pd.DataFrame:
        eh, bset = ray.get(bench_ref)
        flat, lens = _flat_tokens(b["text"])
        counts = np.zeros(len(b), dtype=np.int64)
        if len(flat) >= n:
            gh = _rolling_gram_hashes(flat, n)
            # candidate gram start positions (sorted-probe against the
            # broadcast benchmark hashes); only candidates are ever
            # stringified, verified, and deduped — exactly; grams never
            # span documents (_gram_positions valid mask)
            doc_of, valid = _gram_positions(lens, n)
            idx = np.nonzero(valid & _semi_mask(eh, gh))[0]
            seen: set = set()
            for dd, s in zip(doc_of[idx], idx):
                g = " ".join(flat[s:s + n])
                if g in bset and (dd, g) not in seen:
                    seen.add((dd, g))
                    counts[dd] += 1
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "n_hits": counts})

    return ds.map_batches(hits, batch_format="pandas").sort("doc_id")


_GRAM_P = np.uint64(1099511628211)  # FNV-1a prime; 64-bit wraparound


def _pair_bucket(a: np.ndarray, b: np.ndarray,
                 num_buckets: int) -> np.ndarray:
    """THE (a, b) pair-hash bucket: (a * _GRAM_P + b) mod num_buckets
    over u64 wraparound.  One definition shared by the pair kernel,
    trade_pagerank's edge dedup, and triangle_count's closure —
    bucket-local joins between their outputs are only correct while
    every site hashes identically."""
    with np.errstate(over="ignore"):  # u64 wraparound hash is the point
        return ((a.astype(np.uint64) * _GRAM_P + b.astype(np.uint64))
                % num_buckets).astype("int32")


def _gram_pows(n: int) -> np.ndarray:
    pows = np.ones(n, dtype=np.uint64)
    with np.errstate(over="ignore"):  # wraparound mod 2^64 is the point
        for i in range(1, n):
            pows[i] = pows[i - 1] * _GRAM_P
    return pows


def _token_hashes(tokens) -> np.ndarray:
    return pd.util.hash_pandas_object(
        pd.Series(tokens, dtype=object), index=False).to_numpy(np.uint64)


def _flat_tokens(text: "pd.Series") -> tuple[list, np.ndarray]:
    """Oracle-parity tokenization (_ws_tokens: ASCII '\\s+', drop
    empties) of a batch's text column, returned as the flattened token
    stream plus per-row token counts — the shape the rolling-gram
    kernels consume."""
    ex = _ws_tokens(text.reset_index(drop=True))
    lens = np.bincount(ex.index.to_numpy(np.int64),
                       minlength=len(text)).astype(np.int64)
    return ex.tolist(), lens


def _gram_positions(lens: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_of, valid) for every rolling n-gram start position over the
    flattened token stream: doc_of maps position -> source row, valid
    masks windows that stay inside ONE document.  Single copy of the
    offset arithmetic shared by decontaminate / dup_gram_pairs."""
    off = np.zeros(len(lens), dtype=np.int64)
    if len(lens) > 1:
        np.cumsum(lens[:-1], out=off[1:])
    m = max(int(lens.sum()) - n + 1, 0)
    pos = np.arange(m)
    doc_of = np.searchsorted(off, pos, side="right") - 1
    valid = pos <= (off[doc_of] + lens[doc_of] - n)
    return doc_of, valid


def _shared_hash_candidates(ds, n: int, num_buckets: int):
    """Hashes of n-grams that occur in >= 2 DISTINCT documents (a
    collision-superset of the truly shared grams; callers verify with
    exact strings).  Narrow shuffle: per-doc distinct u64 gram hashes
    travel as int64 bit-reinterprets (Ray's native groupby aggregation
    widens uint64 past 2^63 to float64 and silently loses low bits —
    and costs ~8 s in fixed 200-partition shuffle overhead at ANY
    scale, so this uses the repo's bucket-column map_groups idiom
    instead), bucketed by h % num_buckets so each bucket owns its
    hashes completely."""

    def gram_hashes(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _flat_tokens(b["text"])
        if len(flat) < n:
            return pd.DataFrame({"h": pd.Series(dtype="int64"),
                                 "hb": pd.Series(dtype="int32")})
        gh = _rolling_gram_hashes(flat, n).view(np.int64)
        doc_of, valid = _gram_positions(lens, n)  # no cross-doc grams
        df = (pd.DataFrame({"d": doc_of[valid], "h": gh[valid]})
              .drop_duplicates()[["h"]])
        # numpy mod keeps the divisor's sign: non-negative buckets
        df["hb"] = (df["h"].to_numpy() % num_buckets).astype("int32")
        return df

    def bucket_cands(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["h"].value_counts()  # rows are (doc, h)-distinct
        return pd.DataFrame(
            {"h": vc.index[vc.to_numpy() >= 2].to_numpy(np.int64)})

    return (ds.map_batches(gram_hashes, batch_format="pandas")
            .groupby("hb").map_groups(bucket_cands, batch_format="pandas"))


def _rolling_gram_hashes(flat_tokens: list, n: int) -> np.ndarray:
    """Polynomial combine of n consecutive token hashes -> one uint64
    per gram start position.  Tokens are Arrow-dictionary-encoded so
    the per-string siphash runs once per DISTINCT token; the window
    combine is n shifted vectorized multiply-adds over contiguous
    uint64 (a strided sliding_window_view reduction measured 100x
    slower).  Positions whose window spans a document boundary are
    garbage the caller masks via per-doc valid-start indexing."""
    if len(flat_tokens) < n:
        return np.zeros(0, dtype=np.uint64)
    enc = pc.dictionary_encode(pa.array(flat_tokens, pa.string()))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    th = _token_hashes(enc.dictionary.to_pandas())[codes]
    pows = _gram_pows(n)
    m = len(th) - n + 1
    gh = np.zeros(m, dtype=np.uint64)
    for i in range(n):
        gh += th[i:i + m] * pows[i]
    return gh


def _gram_hash_index(grams: set, n: int) -> np.ndarray:
    """Sorted unique uint64 hashes of a benchmark gram set, using the
    same rolling token-hash scheme as the corpus side."""
    hs = np.zeros(len(grams), dtype=np.uint64)
    pows = _gram_pows(n)
    for i, gm in enumerate(sorted(grams)):
        th = _token_hashes(gm.split())[:n]
        hs[i] = (th * pows[:len(th)]).sum(dtype=np.uint64)
    return np.unique(hs)


DECONTAMINATE_SQL = r"""
WITH wf AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS w
  FROM documents
), bench AS (
  SELECT DISTINCT array_to_string(list_slice(w, 1, 13), ' ') AS gram
  FROM wf WHERE doc_id % 37 = 0 AND length(w) >= 13
), grams AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 12), ' ') AS gram
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(length(w) - 12, 0))) AS i
        FROM wf)
), hits AS (
  SELECT DISTINCT g.doc_id, g.gram FROM grams g JOIN bench b USING (gram)
)
SELECT d.doc_id, COALESCE(cnt.n, 0)::BIGINT AS n_hits
FROM documents d
LEFT JOIN (SELECT doc_id, count(*) AS n FROM hits GROUP BY doc_id) cnt
  USING (doc_id)
ORDER BY d.doc_id
"""


_EMPTY_PAIR_PARTIAL = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                    "doc_b": pd.Series(dtype="int64"),
                                    "m": pd.Series(dtype="int64"),
                                    "pb": pd.Series(dtype="int32")})


def _key_group_pair_partials(g: "pd.DataFrame", key_col: str,
                             max_per_key: int,
                             num_buckets: int) -> "pd.DataFrame":
    """All-pairs emission within each `key_col` group of a bucket-owned
    (key, doc_id) frame — the shared kernel of `dup_gram_pairs` and
    `winnow_dup_pairs`.  Exact string grouping within the owning bucket
    (each key is wholly owned, so the [2, max_per_key] size gate is the
    GLOBAL doc count); doc_id-sorted groups make the vectorized pair
    arithmetic emit doc_a < doc_b directly; output rows are per-pair
    within-bucket counts (m) keyed by the pair-hash bucket (pb)."""
    g = g.sort_values([key_col, "doc_id"], kind="stable")
    gr = g[key_col].to_numpy()
    new_grp = np.ones(len(g), dtype=bool)
    new_grp[1:] = gr[1:] != gr[:-1]
    grp_id = np.cumsum(new_grp) - 1
    sizes = np.bincount(grp_id) if len(g) else np.empty(0, np.int64)
    keep = ((sizes >= 2) & (sizes <= max_per_key))[grp_id] \
        if len(g) else np.zeros(0, dtype=bool)
    if not keep.any():
        return _EMPTY_PAIR_PARTIAL.copy()
    g = g[keep]
    gr = g[key_col].to_numpy()
    ids = g["doc_id"].to_numpy(np.int64)
    new_grp = np.ones(len(g), dtype=bool)
    new_grp[1:] = gr[1:] != gr[:-1]
    grp_id = np.cumsum(new_grp) - 1
    rank = np.arange(len(g)) - np.nonzero(new_grp)[0][grp_id]
    sizes = np.bincount(grp_id)
    a_counts = sizes[grp_id] - 1 - rank
    total = int(a_counts.sum())
    a_pos = np.repeat(np.arange(len(ids)), a_counts)
    k = (np.arange(total, dtype=np.int64)
         - np.repeat(np.cumsum(a_counts) - a_counts, a_counts))
    pairs = pd.DataFrame({"doc_a": ids[a_pos],
                          "doc_b": ids[a_pos + 1 + k]})
    m = (pairs.groupby(["doc_a", "doc_b"], as_index=False).size()
         .rename(columns={"size": "m"}))
    m["m"] = m["m"].astype("int64")
    m["pb"] = _pair_bucket(m["doc_a"].to_numpy(np.int64),
                           m["doc_b"].to_numpy(np.int64), num_buckets)
    return m


def dup_gram_pairs(sf_dir: str, n: int = 5, max_docs_per_gram: int = 64,
                   num_buckets: int = 32,
                   candidate_broadcast_limit: int = 5_000_000):
    """Cross-document exact duplicate n-gram pairs: every unordered doc
    pair sharing >= 1 identical n-word-gram, with the count of distinct
    shared grams — substring-level dedup, the doc-vs-doc counterpart of
    `decontaminate` (doc-vs-benchmark) and the exact complement of the
    probabilistic MinHash path (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better": exact-substring dup mass).
    Grams in more than `max_docs_per_gram` docs are stop-grams
    (boilerplate) and excluded on BOTH engines — standard hygiene, and
    it bounds the quadratic pair blow-up of a hot phrase.

    Scale shape — two corpus scans, one narrow shuffle, then shuffles
    over dup mass only:
      1. scan A rolls u64 gram hashes (`_rolling_gram_hashes`, siphash
         once per distinct token) and emits per-doc distinct hashes —
         8 bytes/row; groupby(h) keeps hashes seen in >= 2 docs.  That
         candidate set (a collision-superset of the truly shared grams;
         strings verify later) is dup-mass-sized and broadcast once via
         ray.put; past `candidate_broadcast_limit` the filter is
         skipped and every gram flows to the exact string grouping
         instead (fully distributed, more shuffle — the honest
         fallback, same answer).
      2. scan B re-rolls the hashes, np.isin against the broadcast set,
         stringifies ONLY candidate positions (the decontaminate
         idiom), emits per-doc distinct (gram, doc_id).
      3. gram-hash-bucket groupby: each bucket owns its grams
         completely, so exact string grouping (hash collisions split),
         the stop-gram filter, and all-pairs emission happen locally;
         pair emission is the candidate_pairs array arithmetic
         (neardup.py) — no Python loop over groups or pairs.
      4. pair-hash-bucket groupby sums per-bucket partials into the
         final (doc_a, doc_b, shared_grams); global sort for stable
         output.
    """
    import ray

    # materialize: both the candidate pass and the stringify pass scan
    # the table; without it each pass re-reads and re-decodes the text
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()

    cand_ds = _shared_hash_candidates(ds, n, num_buckets).materialize()
    n_cand = cand_ds.count()
    empty_pairs = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                "doc_b": pd.Series(dtype="int64"),
                                "shared_grams": pd.Series(dtype="int64")})
    if n_cand == 0:
        return empty_pairs  # no gram is in 2 docs: provably zero pairs
    if n_cand <= candidate_broadcast_limit:
        cand = np.sort(_fold_pd(cand_ds, pd.DataFrame(
            {"h": pd.Series(dtype="int64")}))["h"].to_numpy(np.int64))
        cand_ref = ray.put(cand)
    else:  # dup mass too big to broadcast: exact path without the filter
        cand_ref = None

    empty_g = pd.DataFrame({"gram": pd.Series(dtype="object"),
                            "doc_id": pd.Series(dtype="int64"),
                            "gb": pd.Series(dtype="int32")})

    def cand_grams(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _flat_tokens(b["text"])
        if len(flat) < n:
            return empty_g.copy()
        gh = _rolling_gram_hashes(flat, n).view(np.int64)
        doc_of, valid = _gram_positions(lens, n)
        if cand_ref is not None:
            valid &= _semi_mask(ray.get(cand_ref), gh)
        idx = np.nonzero(valid)[0]
        if not len(idx):
            return empty_g.copy()
        docs = b["doc_id"].to_numpy(np.int64)
        # only candidate positions are stringified; dedup per (doc,
        # exact gram STRING) so u64 collisions cannot drop a gram
        seen: set = set()
        out_d, out_g = [], []
        for dd, s in zip(doc_of[idx], idx):
            g = " ".join(flat[s:s + n])
            if (dd, g) not in seen:
                seen.add((dd, g))
                out_d.append(docs[dd])
                out_g.append(g)
        df = pd.DataFrame({"gram": pd.Series(out_g, dtype="object"),
                           "doc_id": pd.Series(out_d, dtype="int64")})
        df["gb"] = (pd.util.hash_pandas_object(df["gram"], index=False)
                    % num_buckets).astype("int32")
        return df

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _key_group_pair_partials(g, "gram", max_docs_per_gram,
                                        num_buckets)

    def merge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["doc_a", "doc_b"], as_index=False)["m"].sum()
        return pd.DataFrame({"doc_a": m["doc_a"].astype("int64"),
                             "doc_b": m["doc_b"].astype("int64"),
                             "shared_grams": m["m"].astype("int64")})

    return (ds.map_batches(cand_grams, batch_format="pandas")
            .groupby("gb").map_groups(bucket_pairs, batch_format="pandas")
            .groupby("pb").map_groups(merge_pairs, batch_format="pandas")
            .sort(["doc_a", "doc_b"]))


def _doc_dup_partials(ds, n: int, max_docs_per_gram: int,
                      num_buckets: int, candidate_broadcast_limit: int):
    """Per-doc dup-mass partial rows (doc_id, n_grams, dup_grams, pb):
    the identical-columns union of the per-doc gram totals with the
    per-gram-bucket dup-position sums, BEFORE the doc-bucket merge —
    so callers (doc_dup_rate, curation_verdict) can fold extra partial
    sources into the same single pb shuffle."""
    import ray

    cand_ds = _shared_hash_candidates(ds, n, num_buckets).materialize()
    n_cand = cand_ds.count()
    if n_cand <= candidate_broadcast_limit:
        cand = np.sort(_fold_pd(cand_ds, pd.DataFrame(
            {"h": pd.Series(dtype="int64")}))["h"].to_numpy(np.int64))
        cand_ref = ray.put(cand)
    else:  # dup mass too big to broadcast: exact path without the filter
        cand_ref = None

    def totals(b: pd.DataFrame) -> pd.DataFrame:
        _, lens = _flat_tokens(b["text"])
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "n_grams": np.maximum(lens - n + 1, 0).astype("int64"),
            "dup_grams": np.zeros(len(b), dtype=np.int64),
            "pb": (b["doc_id"].astype("int64") % num_buckets)
                  .astype("int32").to_numpy()})

    empty_g = pd.DataFrame({"gram": pd.Series(dtype="object"),
                            "doc_id": pd.Series(dtype="int64"),
                            "k": pd.Series(dtype="int64"),
                            "gb": pd.Series(dtype="int32")})

    def cand_grams(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _flat_tokens(b["text"])
        if len(flat) < n:
            return empty_g.copy()
        gh = _rolling_gram_hashes(flat, n).view(np.int64)
        doc_of, valid = _gram_positions(lens, n)
        if cand_ref is not None:
            valid &= _semi_mask(ray.get(cand_ref), gh)
        idx = np.nonzero(valid)[0]
        if not len(idx):
            return empty_g.copy()
        docs = b["doc_id"].to_numpy(np.int64)
        # per (doc, exact gram STRING): the count of POSITIONS k —
        # stringified only for candidates, u64 collisions cannot leak
        counts: dict = {}
        for dd, s in zip(doc_of[idx], idx):
            key = (docs[dd], " ".join(flat[s:s + n]))
            counts[key] = counts.get(key, 0) + 1
        df = pd.DataFrame({"gram": [g for _, g in counts],
                           "doc_id": np.fromiter(
                               (d for d, _ in counts), np.int64,
                               len(counts)),
                           "k": np.fromiter(counts.values(), np.int64,
                                            len(counts))})
        df["gb"] = (pd.util.hash_pandas_object(df["gram"], index=False)
                    % num_buckets).astype("int32")
        return df

    empty_partial = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                  "n_grams": pd.Series(dtype="int64"),
                                  "dup_grams": pd.Series(dtype="int64"),
                                  "pb": pd.Series(dtype="int32")})

    def bucket_dup(g: pd.DataFrame) -> pd.DataFrame:
        # exact string grouping; rows unique per (gram, doc): the
        # group's row count IS its distinct-doc count
        sizes = g.groupby("gram")["doc_id"].transform("size")
        g = g[(sizes >= 2) & (sizes <= max_docs_per_gram)]
        if not len(g):
            return empty_partial.copy()
        m = g.groupby("doc_id", as_index=False)["k"].sum()
        return pd.DataFrame({
            "doc_id": m["doc_id"].astype("int64"),
            "n_grams": np.zeros(len(m), dtype=np.int64),
            "dup_grams": m["k"].astype("int64"),
            "pb": (m["doc_id"].astype("int64") % num_buckets)
                  .astype("int32")})

    tot = ds.map_batches(totals, batch_format="pandas")
    dup = (ds.map_batches(cand_grams, batch_format="pandas")
           .groupby("gb").map_groups(bucket_dup, batch_format="pandas")
           .map_batches(lambda b: b[["doc_id", "n_grams", "dup_grams",
                                     "pb"]], batch_format="pandas"))
    # identical-columns union (repo idiom), co-located by doc-bucket
    return tot.union(dup)


def doc_dup_rate(sf_dir: str, n: int = 5, max_docs_per_gram: int = 64,
                 num_buckets: int = 32,
                 candidate_broadcast_limit: int = 5_000_000):
    """Per-document duplicate-gram mass: of a doc's n-word-gram
    POSITIONS, how many hold a gram (string-exact) that also appears
    in at least one OTHER document — the per-doc metric that drives
    drop-or-rewrite dedup policy (Lee et al. 2022: fraction of a doc
    that is duplicated elsewhere).  Returned as exact integers
    (n_grams, dup_grams) so the oracle comparison is float-free; the
    rate is dup_grams/n_grams downstream.  Grams in more than
    `max_docs_per_gram` docs are stop-grams, excluded on both engines
    (same hygiene + blow-up bound as `dup_gram_pairs`).

    Scale shape mirrors dup_gram_pairs (narrow u64-hash candidate
    shuffle, size-gated broadcast with exact no-filter fallback,
    stringify-candidates-only) with two twists: per-(doc, gram) the
    POSITION count k travels with the candidate row, and the final
    per-doc merge is an identical-columns union of the tiny
    (doc, n_grams) totals with the (doc, dup-partial) sums, co-located
    by doc-bucket — one narrow shuffle, no join."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    parts = _doc_dup_partials(ds, n, max_docs_per_gram, num_buckets,
                              candidate_broadcast_limit)

    def merge_doc(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("doc_id", as_index=False)[["n_grams",
                                                 "dup_grams"]].sum()
        return pd.DataFrame({"doc_id": m["doc_id"].astype("int64"),
                             "n_grams": m["n_grams"].astype("int64"),
                             "dup_grams": m["dup_grams"].astype("int64")})

    return (parts.groupby("pb").map_groups(merge_doc,
                                           batch_format="pandas")
            .sort("doc_id"))


# Shared dup-mass CTE block (wf/pos/dg/keep_g/hits) — ONE definition
# feeds DOC_DUP_RATE_SQL, DUP_GRAM_PAIRS_SQL and CURATION_VERDICT_SQL
# so the tokenization, gram window (n=5) and stop-gram band (2..64)
# can never desynchronize across oracles.  Unreferenced CTEs cost
# nothing (DuckDB only evaluates the ones a query reaches).
_DUP_MASS_CTES = r"""wf AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS w
  FROM documents
), pos AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS gram
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(length(w) - 4, 0))) AS i
        FROM wf)
), dg AS (
  SELECT DISTINCT doc_id, gram FROM pos
), keep_g AS (
  SELECT gram FROM dg GROUP BY gram HAVING count(*) BETWEEN 2 AND 64
), hits AS (
  SELECT p.doc_id, count(*) AS n
  FROM pos p JOIN keep_g k ON p.gram = k.gram
  GROUP BY p.doc_id
)"""


DOC_DUP_RATE_SQL = f"""
WITH {_DUP_MASS_CTES}
SELECT w0.doc_id, w0.n_grams, COALESCE(h.n, 0)::BIGINT AS dup_grams
FROM (SELECT doc_id, greatest(length(w) - 4, 0)::BIGINT AS n_grams
      FROM wf) w0
LEFT JOIN hits h USING (doc_id)
ORDER BY w0.doc_id
"""


def winnow_fingerprints(sf_dir: str, n: int = 4, w: int = 8):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003): slide a window of `w` consecutive word n-grams over
    each document and keep each window's minimum gram.  Guarantees a
    shared fingerprint for any verbatim match of >= w + n - 1 tokens
    at expected density 2/(w+1) regardless of document length — the
    LOCAL-fingerprint counterpart of the global MinHash sketch
    (winnowing detects shared substrings, MinHash whole-doc
    similarity).  The selection key here is the lexicographic gram
    (binary collation — the corpus is ASCII) so the DuckDB oracle
    reproduces the pick exactly; at 100 TB the same code winnows the
    u64 rolling hashes from `_rolling_gram_hashes` instead (swap the
    rank array, skip the stringify).

    Scale shape: a pure map, NO shuffle at any scale — tokenize,
    n-gram, rank the batch's grams (np.unique codes are
    order-isomorphic to the strings), one vectorized sliding-window
    min over int32 codes.  Each document lives in one input row, so
    per-batch (doc, fingerprint) dedup is already global.  Documents
    with 1 <= g < w grams contribute the min over all their grams
    (the i=1 truncated window), so every document with >= n tokens
    yields >= 1 fingerprint."""
    out = _winnow_fp_ds(sf_dir, n, w).to_pandas()
    if out.empty:  # all-empty blocks lose the schema in to_pandas()
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "fp": pd.Series(dtype="object")})
    return out.sort_values(["doc_id", "fp"]).reset_index(drop=True)


def _winnow_fp_ds(sf_dir: str, n: int, w: int):
    """Distributed (doc_id, fp) winnowing fingerprints as a Dataset —
    the shared core of `winnow_fingerprints` (driver projection) and
    `winnow_dup_pairs` (pair mining; fps never land on the driver)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "fp": pd.Series(dtype="object")})

    def fps(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _flat_tokens(b["text"])
        if len(flat) < n:
            return empty.copy()
        # gram strings for every flat position: n shifted zero-copy
        # slices of ONE arrow array, joined by a vectorized kernel
        fa = pa.array(flat, pa.string())
        m = len(flat) - n + 1
        gs = pc.binary_join_element_wise(
            *[fa.slice(i, m) for i in range(n)], " ")
        doc_of, valid = _gram_positions(lens, n)
        vg = gs.to_numpy(zero_copy_only=False)[valid]
        if not len(vg):
            return empty.copy()
        dv = doc_of[valid]  # per-doc gram runs are contiguous
        uniq, codes = np.unique(vg, return_inverse=True)
        gcnt = np.bincount(dv, minlength=len(b))
        sel_d: list = []
        sel_c: list = []
        if len(codes) >= w:
            sw = np.lib.stride_tricks.sliding_window_view(codes, w)
            mins = sw.min(axis=1)
            ok = dv[:len(mins)] == dv[w - 1:]  # window inside one doc
            sel_d.append(dv[:len(mins)][ok])
            sel_c.append(mins[ok])
        short = np.nonzero((gcnt > 0) & (gcnt < w))[0]
        if len(short):
            per_doc_min = pd.Series(codes).groupby(dv).min()
            sel_d.append(short)
            sel_c.append(per_doc_min.reindex(short).to_numpy(np.int64))
        if not sel_d:
            return empty.copy()
        d = np.concatenate(sel_d).astype(np.int64)
        c = np.concatenate(sel_c).astype(np.int64)
        key = np.unique(d * len(uniq) + c)  # (doc, fp) dedup
        docs = b["doc_id"].to_numpy(np.int64)[key // len(uniq)]
        return pd.DataFrame({"doc_id": docs,
                             "fp": pd.Series(uniq[key % len(uniq)],
                                             dtype="object")})

    return ds.map_batches(fps, batch_format="pandas")


# window min over VARCHAR is binary-collation lexicographic — equal to
# numpy object-string comparison on this ASCII corpus; the truncated
# ROWS frame at partition end reproduces the short-document (g < w)
# single-window rule, selected by i <= greatest(g - w + 1, 1)
_WINNOW_CTE = f"""
WITH wf AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT doc_id, i,
         array_to_string(list_slice(w, i, i + {4 - 1}), ' ') AS gram,
         greatest(length(w) - {4 - 1}, 0) AS g
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(length(w) - {4 - 1}, 0))) AS i
        FROM wf)
), wins AS (
  SELECT doc_id, i, g,
         min(gram) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN CURRENT ROW AND {8 - 1} FOLLOWING) AS fp
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wins WHERE i <= greatest(g - {8 - 1}, 1)
)
"""

WINNOW_FP_SQL = _WINNOW_CTE + """
SELECT doc_id::BIGINT AS doc_id, fp FROM fps ORDER BY doc_id, fp
"""


def winnow_dup_pairs(sf_dir: str, n: int = 4, w: int = 8,
                     min_shared: int = 2, max_docs_per_fp: int = 64,
                     num_buckets: int = 32):
    """Cross-document LOCAL near-dup pairs: every unordered doc pair
    sharing >= `min_shared` winnowing fingerprints, with the count of
    distinct shared fingerprints.  Winnowing's guarantee makes this
    the cheap substring-overlap detector: any verbatim shared passage
    of >= w + n - 1 tokens is caught by at least one shared
    fingerprint, at ~2/(w+1) the cost of the exact all-grams path
    (`dup_gram_pairs` mines every shared gram; this mines the winnowed
    sample — Lee et al. 2022 exact-substring dup mass vs the SIGMOD'03
    sketch of it).  Fingerprints in more than `max_docs_per_fp` docs
    are stop-fingerprints (boilerplate) excluded on BOTH engines —
    hygiene, and it bounds the quadratic pair blow-up of a hot phrase.

    Scale shape: the winnowed (doc, fp) rows — already a ~2/(w+1)
    sample of the gram stream, produced with NO shuffle — shuffle ONCE
    by fp-hash bucket; each bucket owns its fingerprints completely,
    so the stop-fp cap and all-pairs emission are bucket-local (the
    `dup_gram_pairs` array-arithmetic pair emission — no Python loop
    over groups or pairs); per-bucket pair partials shuffle by
    pair-hash bucket for the shared-count sum; only pairs at or above
    `min_shared` survive.  Nothing corpus-sized reaches the driver."""
    fp_ds = _winnow_fp_ds(sf_dir, n, w)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["gb"] = (pd.util.hash_pandas_object(b["fp"], index=False)
                   % num_buckets).astype("int32")
        return b

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # (doc, fp) rows are already distinct, so per-fp pair emission
        # never double-counts (shared kernel: _key_group_pair_partials)
        return _key_group_pair_partials(g, "fp", max_docs_per_fp,
                                        num_buckets)

    def merge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["doc_a", "doc_b"], as_index=False)["m"].sum()
        m = m[m["m"] >= min_shared]
        return pd.DataFrame({"doc_a": m["doc_a"].astype("int64"),
                             "doc_b": m["doc_b"].astype("int64"),
                             "shared_fps": m["m"].astype("int64")})

    return (fp_ds.map_batches(assign, batch_format="pandas")
            .groupby("gb").map_groups(bucket_pairs, batch_format="pandas")
            .groupby("pb").map_groups(merge_pairs, batch_format="pandas")
            .sort(["doc_a", "doc_b"]))


WINNOW_DUP_PAIRS_SQL = _WINNOW_CTE + f"""
, ok AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 64
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  JOIN ok ON ok.fp = a.fp
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
       shared_fps::BIGINT AS shared_fps
FROM pairs WHERE shared_fps >= 2
ORDER BY doc_a, doc_b
"""


def curation_verdict(sf_dir: str, n: int = 5, min_words: int = 5,
                     max_punct_e4: int = 2000, max_docs_per_gram: int = 64,
                     num_buckets: int = 32,
                     candidate_broadcast_limit: int = 5_000_000):
    """End-to-end training-data curation decision, one call: per doc
    the four standard gate flags and the composed keep verdict —
      lang_match   stopword-argmax language ID == the doc's declared lang
      quality_ok   n_words >= min_words AND punct_ratio_e4 <= max_punct_e4
      exact_dup    doc is NOT the min-doc_id holder of its exact text
      dup_heavy    > 25% of its n-gram positions duplicated elsewhere
                   (4*dup_grams > n_grams, integer-exact)
      keep         lang_match AND quality_ok AND NOT exact_dup AND NOT dup_heavy
    This is the composition a real corpus-curation pipeline runs
    (CCNet/Gopher-style gating), built from the repo's proven pieces.

    Scale shape: THREE partial sources fold into ONE doc-bucket
    shuffle via the identical-columns union idiom —
      A. LangId actor pool (stateful stage) + vectorized quality flags,
         one row per doc;
      B. exact-dup flags: text-hash coarse buckets, in-bucket exact
         min-doc_id per full text (64-bit collisions cannot merge
         distinct docs: grouping is by the string);
      C. `_doc_dup_partials` (the dup-mass machinery shared with
         doc_dup_rate).
    Nothing wider than (doc_id, 6 int columns) crosses the final
    shuffle; texts only travel inside the exact-dup bucket exchange,
    exactly as `dedup_exact_docs` already does.

    Each of the three branches gets its OWN lazy column-pruned scan
    (A reads doc_id/text/lang; B and C read doc_id/text): a shared
    `materialize()` would pin the whole corpus in the object store
    for the pipeline's lifetime — at 100 TB that forces spill, while
    three pruned parquet scans stream with backpressure and cost only
    re-decoding row groups (the cheap part; the dup-mass machinery
    dominates).  VERDICT r4 watch item #1."""
    from ..stages.text_stats import LangId

    import ray

    docs_al = _read(sf_dir, "documents",
                    columns=["doc_id", "text", "lang"])
    docs_b = _read(sf_dir, "documents", columns=["doc_id", "text"])
    docs_c = _read(sf_dir, "documents", columns=["doc_id", "text"])
    WIDE = ["doc_id", "lang_match", "quality_ok", "exact_dup",
            "n_grams", "dup_grams", "pb"]

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        for c in WIDE:
            if c not in df.columns:
                df[c] = np.zeros(len(df), dtype=np.int64)
        df["doc_id"] = df["doc_id"].astype("int64")
        df["pb"] = (df["doc_id"] % num_buckets).astype("int32")
        return df[WIDE]

    def lang_quality(b: pd.DataFrame) -> pd.DataFrame:
        # b arrives from the LangId actor stage with lang_pred attached
        text = b["text"].fillna("")
        n_chars = text.str.len().astype("int64")
        n_words = _n_words(text)
        n_punct = text.str.count(r"[^\w\s]").astype("int64")
        punct_e4 = np.floor(
            (n_punct / n_chars.replace(0, 1).astype("float64")) * 10000
        ).astype("int64")
        return widen(pd.DataFrame({
            "doc_id": b["doc_id"],
            "lang_match": (b["lang_pred"] == b["lang"]).astype("int64"),
            "quality_ok": ((n_words >= min_words)
                           & (punct_e4 <= max_punct_e4)).astype("int64"),
        }))

    pool_max = max(2, int(ray.cluster_resources().get("CPU", 8)))
    flags_a = (docs_al.map_batches(LangId, batch_format="pandas",
                              batch_size=4096, concurrency=(1, pool_max))
               .map_batches(lang_quality, batch_format="pandas"))

    def text_key(b: pd.DataFrame) -> pd.DataFrame:
        from ..stages.keys import hash64

        dk = hash64(b["text"].fillna(""))
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "text": b["text"].fillna(""),
                             "dkb": (dk % 64).astype("int32")})

    def dup_flags(g: pd.DataFrame) -> pd.DataFrame:
        mn = g.groupby("text")["doc_id"].transform("min")
        return widen(pd.DataFrame({
            "doc_id": g["doc_id"],
            "exact_dup": (g["doc_id"] != mn).astype("int64")}))

    flags_b = (docs_b.map_batches(text_key, batch_format="pandas")
               .groupby("dkb").map_groups(dup_flags, batch_format="pandas"))

    parts_c = (_doc_dup_partials(
        docs_c, n, max_docs_per_gram,
        num_buckets, candidate_broadcast_limit)
        .map_batches(widen, batch_format="pandas"))

    def verdict(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("doc_id", as_index=False)[
            ["lang_match", "quality_ok", "exact_dup",
             "n_grams", "dup_grams"]].sum()
        dup_heavy = (4 * m["dup_grams"] > m["n_grams"]).astype("int64")
        keep = ((m["lang_match"] == 1) & (m["quality_ok"] == 1)
                & (m["exact_dup"] == 0) & (dup_heavy == 0)).astype("int64")
        return pd.DataFrame({
            "doc_id": m["doc_id"].astype("int64"),
            "lang_match": m["lang_match"].astype("int64"),
            "quality_ok": m["quality_ok"].astype("int64"),
            "exact_dup": m["exact_dup"].astype("int64"),
            "dup_heavy": dup_heavy, "keep": keep})

    return (flags_a.union(flags_b).union(parts_c)
            .groupby("pb").map_groups(verdict, batch_format="pandas")
            .sort("doc_id"))


def _curation_verdict_sql() -> str:
    """Oracle: the four gates recomputed in SQL from the SAME builders
    the individual oracles use — `_lang_pred_ctes()` (LANG_ID_SQL),
    DOC_QUALITY_SQL's integer forms, DEDUP_EXACT_SQL's min-per-text,
    and `_DUP_MASS_CTES` (DOC_DUP_RATE_SQL / DUP_GRAM_PAIRS_SQL) —
    so an edit to any shared piece reaches every oracle at once."""
    return rf"""
WITH {_lang_pred_ctes()}, q AS (
  SELECT doc_id,
    {_N_WORDS_SQL} AS n_words,
    FLOOR((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE
          / GREATEST(length(text), 1) * 10000)::BIGINT AS punct_e4
  FROM documents
), firsts AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
), {_DUP_MASS_CTES}, gates AS (
  SELECT d.doc_id,
    CASE WHEN pred.lang_pred = d.lang THEN 1 ELSE 0 END AS lang_match,
    CASE WHEN q.n_words >= 5 AND q.punct_e4 <= 2000 THEN 1 ELSE 0
         END AS quality_ok,
    CASE WHEN f.doc_id IS NULL THEN 1 ELSE 0 END AS exact_dup,
    CASE WHEN 4 * COALESCE(h.n, 0) >
              greatest(length(wf.w) - 4, 0) THEN 1 ELSE 0 END AS dup_heavy
  FROM documents d
  JOIN pred USING (doc_id)
  JOIN q USING (doc_id)
  JOIN wf USING (doc_id)
  LEFT JOIN firsts f USING (doc_id)
  LEFT JOIN hits h USING (doc_id)
)
SELECT doc_id,
       lang_match::BIGINT AS lang_match,
       quality_ok::BIGINT AS quality_ok,
       exact_dup::BIGINT AS exact_dup,
       dup_heavy::BIGINT AS dup_heavy,
       (CASE WHEN lang_match = 1 AND quality_ok = 1 AND exact_dup = 0
             AND dup_heavy = 0 THEN 1 ELSE 0 END)::BIGINT AS keep
FROM gates ORDER BY doc_id
"""


# CURATION_VERDICT_SQL is assigned after LANG_ID_SQL below —
# _curation_verdict_sql() composes _lang_pred_ctes(), defined there.


DUP_GRAM_PAIRS_SQL = f"""
WITH {_DUP_MASS_CTES}, p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM dg a
  JOIN keep_g k ON a.gram = k.gram
  JOIN dg b ON b.gram = a.gram AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, count(*)::BIGINT AS shared_grams
FROM p GROUP BY doc_a, doc_b
ORDER BY doc_a, doc_b
"""


def _lang_pred_ctes() -> str:
    """Shared CTE block (words/scored/pred): the stopword-argmax
    classifier recomputed in SQL.  Generated from text_stats._STOPWORDS
    so the profiles cannot drift; ties resolve to the FIRST language
    reaching the max (profile insertion order en/de/fr/es — Python
    updates best only on strictly-greater score), zero hits -> 'und'.
    ONE builder feeds both LANG_ID_SQL and CURATION_VERDICT_SQL so the
    two oracles can never desynchronize."""
    from ..stages.text_stats import _STOPWORDS

    def inlist(lang):
        return "[" + ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang])) + "]"

    counts = ",\n    ".join(
        f"length(list_filter(ws, x -> list_contains({inlist(l)}, x))) AS c_{l}"
        for l in ("en", "de", "fr", "es"))
    return f"""words AS (
  SELECT doc_id,
    list_transform(list_slice(regexp_extract_all(coalesce(text, ''),
      '[a-zA-Zäöüßéèêàçñ]+'), 1, 200), w -> lower(w)) AS ws
  FROM documents
), scored AS (
  SELECT doc_id, {counts} FROM words
), pred AS (
  SELECT doc_id,
    CASE WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'und'
         WHEN c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
         WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
         WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
         ELSE 'es' END AS lang_pred
  FROM scored)"""


LANG_ID_SQL = f"""
WITH {_lang_pred_ctes()}
SELECT lang_pred, count(*)::BIGINT AS n_docs FROM pred
GROUP BY lang_pred ORDER BY lang_pred
"""

CURATION_VERDICT_SQL = _curation_verdict_sql()


def _query_matrix(ds, n_queries: int) -> np.ndarray:
    """(n_queries, D) query matrix = the embeddings with vec_id <
    n_queries, ascending — the ANN oracles' selection contract
    (`WHERE vec_id < n`).  NOT ds.take(n): under Ray's default
    preserve_order=False streaming execution, take() returns whichever
    block arrives first, so under load it can hand back rows from the
    middle of the table (observed: rows 126-129 at sf0.001) and every
    downstream sim would silently diverge from the oracle."""
    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("vec_id"),
                                pa.scalar(n_queries, pa.int64())))

    rows = ds.map_batches(keep, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


# ---------------------------------------------------------------------------
# ANN brute-force cosine top-k (vs duckdb list_cosine_similarity oracle)
# ---------------------------------------------------------------------------

def ann_topk(sf_dir: str, k: int = 5, n_queries: int = 4):
    from ..stages.ann import brute_force_topk

    ds = _strip_meta(_read(sf_dir, "embeddings",
                           columns=["vec_id", "embedding"]))
    queries = _query_matrix(ds, n_queries)
    df = brute_force_topk(ds, queries, k=k, dtype=np.float64)
    df["query_idx"] = df["query_idx"].astype("int64")
    df["sim"] = round_half_away(df["sim"], 4)
    return df.sort_values(["query_idx", "sim", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)


ANN_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_idx, embedding AS qe FROM embeddings WHERE vec_id < 4
), sims AS (
  SELECT q.query_idx, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS sim
  FROM embeddings e CROSS JOIN q
), ranked AS (
  SELECT query_idx, vec_id, sim,
         row_number() OVER (PARTITION BY query_idx ORDER BY sim DESC, vec_id) AS rn
  FROM sims
)
SELECT query_idx, vec_id, ROUND(sim, 4) AS sim
FROM ranked WHERE rn <= 5
ORDER BY query_idx, sim DESC, vec_id
"""


# ---------------------------------------------------------------------------
# Document quality scoring (length/punct/stopword-style features; exact
# integer counts + float64 ratios rounded to 4 so the DuckDB oracle hashes
# identically — both sides do the same float64 division then ROUND)
# ---------------------------------------------------------------------------

def doc_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def quality(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_chars = text.str.len().astype("int64")
        n_words = _n_words(text)
        n_punct = text.str.count(r"[^\w\s]").astype("int64")
        n_upper = text.str.count(r"[A-Z]").astype("int64")
        denom = n_chars.replace(0, 1).astype("float64")
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "n_punct": n_punct,
            "n_upper": n_upper,
            # floor(x*1e4) as int: identical on numpy and DuckDB (pandas
            # .round is half-to-even, DuckDB ROUND is half-away — they
            # disagree on exact halves like 4.90625)
            "mean_word_len_e4": np.floor(
                (n_chars / n_words.replace(0, 1).astype("float64")) * 10000
            ).astype("int64"),
            "punct_ratio_e4": np.floor((n_punct / denom) * 10000)
            .astype("int64"),
        })

    return ds.map_batches(quality, batch_format="pandas",
                          batch_size=8192).sort("doc_id")


DOC_QUALITY_SQL = rf"""
SELECT doc_id,
       {_N_WORDS_SQL} AS n_words,
       length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
       length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
       FLOOR(length(text)::DOUBLE / GREATEST({_N_WORDS_SQL}, 1)
            * 10000)::BIGINT AS mean_word_len_e4,
       FLOOR((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE
             / GREATEST(length(text), 1) * 10000)::BIGINT AS punct_ratio_e4
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (exact; DuckDB self-join oracle)
# ---------------------------------------------------------------------------

def embed_cosine_dups(sf_dir: str, threshold: float = 0.35):
    from ..stages.embed_dedup import cosine_dup_pairs

    ds = _strip_meta(_read(sf_dir, "embeddings",
                           columns=["vec_id", "embedding"]))
    pairs = cosine_dup_pairs(ds, threshold=threshold)
    df = pairs.to_pandas()
    if df.empty:  # all-empty blocks lose the schema in to_pandas()
        df = pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64"),
                           "sim": pd.Series(dtype="float64")})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


EMBED_COSINE_DUPS_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 4) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= 0.35
ORDER BY a, b
"""


def semdedup(sf_dir: str, tau: float = 0.35, n_clusters: int = 8,
             iters: int = 4):
    """SemDeDup keep-list over the embeddings table (rows-only: the
    k-means fit is iterative/float-fold-order-dependent, so no SQL
    oracle — the stage's invariants are pytest-pinned instead; see
    stages/embed_dedup.semdedup for the scale shape)."""
    from ..stages.embed_dedup import semdedup as _semdedup

    ds = _strip_meta(_read(sf_dir, "embeddings",
                           columns=["vec_id", "embedding"]))
    out = _semdedup(ds, tau=tau, n_clusters=n_clusters, iters=iters)
    return out.sort("vec_id")


# ---------------------------------------------------------------------------
# IVF ANN (approximate; rows-only check + recall-vs-brute-force unit test)
# ---------------------------------------------------------------------------

def ann_ivf(sf_dir: str, k: int = 5, n_queries: int = 4,
            n_clusters: int = 16, nprobe: int = 6):
    from ..stages.ann import ivf_topk

    ds = _strip_meta(_read(sf_dir, "embeddings",
                           columns=["vec_id", "embedding"]))
    queries = _query_matrix(ds, n_queries)
    df = ivf_topk(ds, queries, k=k, n_clusters=n_clusters, nprobe=nprobe)
    df["query_idx"] = df["query_idx"].astype("int64")
    df["sim"] = round_half_away(df["sim"], 4)
    return df.reset_index(drop=True)


def ann_pq(sf_dir: str, k: int = 5, n_queries: int = 4, m: int = 8,
           ks: int = 16):
    """Product-quantization ANN (`stages/ann.py pq_*`): the memory
    scale path — vectors become m uint8 codes, queries score via ADC
    table lookups.  Approximate by construction, so rows-only in the
    driver gate; recall vs brute force is pinned in pytest."""
    from ..stages.ann import pq_topk

    ds = _strip_meta(_read(sf_dir, "embeddings",
                           columns=["vec_id", "embedding"]))
    queries = _query_matrix(ds, n_queries)
    df = pq_topk(ds, queries, k=k, m=m, ks=ks)
    df["query_idx"] = df["query_idx"].astype("int64")
    df["sim"] = round_half_away(df["sim"], 4)
    return df.sort_values(["query_idx", "sim", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)


def ann_ivfpq(sf_dir: str, k: int = 5, n_queries: int = 4,
              n_clusters: int = 16, m: int = 8, ks: int = 16):
    """IVF + PQ composed ANN (`stages/ann.ivfpq_topk`): coarse IVF
    partition pruning over PQ-coded rows scored by ADC lookups — the
    full 100 TB ANN recipe as one contract entry.  Run at
    nprobe == n_clusters so every partition is probed: the result then
    equals `ann_pq`'s ADC ranking routed through the IVF
    partition/probe machinery (the equality is pytest-pinned), i.e.
    the composition itself is what this entry witnesses.  Rows-only in
    the driver gate for the same reason as `ann_pq`: the PQ codebooks
    come from an iterative k-means fit with no SQL twin (DuckDB cannot
    recompute the codebook), unlike `ann_ivf_exact` whose IVF-only
    exact configuration has a brute-force window-rank oracle."""
    from ..stages.ann import ivfpq_topk

    ds = _strip_meta(_read(sf_dir, "embeddings",
                           columns=["vec_id", "embedding"]))
    queries = _query_matrix(ds, n_queries)
    df = ivfpq_topk(ds, queries, k=k, n_clusters=n_clusters,
                    nprobe=n_clusters, m=m, ks=ks)
    df["query_idx"] = df["query_idx"].astype("int64")
    df["sim"] = round_half_away(df["sim"], 4)
    return df.sort_values(["query_idx", "sim", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)


def ann_ivf_exact(sf_dir: str, k: int = 5, n_queries: int = 4):
    """IVF probe machinery at nprobe == n_clusters: every partition is
    probed, so the result is EXACT top-k and the brute-force window-rank
    SQL oracle applies — a hash-checked witness that the IVF
    partition/probe/mask path itself (cluster assignment, pc.is_in
    filter, per-query np.isin mask, partial top-k, driver merge) loses
    nothing; the approximate-probe entry `ann_ivf` stays for recall.
    Delegates to ann_ivf so query selection / sim rounding (the parts
    the oracle hash depends on) live in exactly one place."""
    df = ann_ivf(sf_dir, k=k, n_queries=n_queries, n_clusters=16, nprobe=16)
    return df.sort_values(["query_idx", "sim", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# N-gram Jaccard dedup groups: LSH candidates -> exact shingle Jaccard
# verify -> union-find components (driver-side; pair list is tiny)
# ---------------------------------------------------------------------------

def jaccard_dup_groups(sf_dir: str, threshold: float = 0.5):
    from ..stages.embed_dedup import dup_groups_from_pairs
    from ..stages.neardup import minhash_lsh_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # prefilter off: the oracle is EXACT shingle Jaccard, so every LSH
    # candidate must be verified exactly (see minhash_lsh_dedup contract)
    pairs = minhash_lsh_dedup(docs, threshold=threshold,
                              prefilter_sigma=None).to_pandas()
    groups = dup_groups_from_pairs(pairs)
    groups = groups.rename(columns={"id": "doc_id", "group": "dup_group"})
    groups["doc_id"] = groups["doc_id"].astype("int64")
    groups["dup_group"] = groups["dup_group"].astype("int64")
    return groups.sort_values("doc_id").reset_index(drop=True)


def dup_groups_cc(sf_dir: str, threshold: float = 0.5):
    """Same result as `jaccard_dup_groups`, computed by the distributed
    hash-to-min connected-components stage (`stages/components.py`)
    instead of the driver union-find — the 100 TB path: the verified
    pair Dataset never lands on the driver; labels converge in
    O(log n) bucket-parallel rounds and only one int per bucket per
    round reaches the driver.  Both implementations emit
    min(component member id) as the group, so they are byte-equal and
    share the `JACCARD_GROUPS_SQL` oracle."""
    from ..stages.components import connected_components
    from ..stages.neardup import minhash_lsh_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_dedup(docs, threshold=threshold,
                              prefilter_sigma=None)
    out = connected_components(pairs, num_buckets=8).to_pandas()
    if out.empty:  # all-empty blocks lose the schema in to_pandas()
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "dup_group": pd.Series(dtype="int64")})
    out = out.rename(columns={"node": "doc_id", "label": "dup_group"})
    out["doc_id"] = out["doc_id"].astype("int64")
    out["dup_group"] = out["dup_group"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def near_dedup_keep(sf_dir: str, threshold: float = 0.5):
    """End-to-end near-dedup verdict: per document, keep it iff it is
    NOT in any near-dup cluster or it is the cluster's canonical
    representative (min doc_id) — the keep-list a curation run feeds
    downstream.  Composes the distributed pipeline end to end:
    MinHash+LSH verified pairs -> hash-to-min connected components
    (`stages/components.py`) -> broadcast of the (dup-mass-sized)
    label map -> one verdict map over the corpus.  The corpus itself
    never shuffles; only near-dup members (label != self) ride the
    broadcast."""
    import ray

    from ..stages.components import connected_components
    from ..stages.neardup import minhash_lsh_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_dedup(docs, threshold=threshold,
                              prefilter_sigma=None)
    cc = connected_components(pairs, num_buckets=8).to_pandas()
    if cc.empty:
        drop = np.empty(0, np.int64)
    else:
        # only non-canonical members need to travel: keep is the default
        drop = np.sort(cc.loc[cc["node"] != cc["label"], "node"]
                       .to_numpy(np.int64))
    drop_ref = ray.put(drop)

    def verdict(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        hit = _semi_mask(ray.get(drop_ref), ids)
        return pd.DataFrame({"doc_id": ids, "keep": ~hit})

    return (docs.select_columns(["doc_id"])
            .map_batches(verdict, batch_format="pandas").sort("doc_id"))


def minhash_pairs(sf_dir: str, threshold: float = 0.5):
    """Verified near-dup pairs, deterministically ordered.  The DuckDB
    oracle recomputes EXACT k-shingle Jaccard over all pairs; equality
    additionally witnesses the LSH candidate recall on this corpus
    (near-dups here sit far above the banding miss region)."""
    from ..stages.neardup import minhash_lsh_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_dedup(docs, threshold=threshold,
                              prefilter_sigma=None).to_pandas()
    if pairs.empty:
        pairs = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64")})
    pairs["a"] = pairs["a"].astype("int64")
    pairs["b"] = pairs["b"].astype("int64")
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


def simhash_docs(sf_dir: str):
    from ..stages.neardup import simhash_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(simhash_batch, batch_format="pandas").sort("doc_id")


# Exact k-shingle (k=5, lowercased) Jaccard over all pairs: the ground
# truth the minhash+LSH pipeline approximates.  Shingling here is
# character-based; the corpus is ASCII so it equals the pipeline's
# byte-based shingles (64-bit hashing makes collisions negligible).
_SHINGLE_PAIRS_CTE = """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, substring(lower(text), i, 5) AS s FROM (
    SELECT doc_id, coalesce(text, '') AS text,
           unnest(generate_series(1,
               greatest(length(coalesce(text, '')) - 4, 1))) AS i
    FROM documents)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
), pairs AS (
  SELECT a, b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS sim
  FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
)
"""

MINHASH_PAIRS_SQL = _SHINGLE_PAIRS_CTE + """
SELECT a::BIGINT AS a, b::BIGINT AS b, sim FROM pairs ORDER BY a, b
"""

# min-label connected components over the verified pairs (recursive
# transitive closure; mirrors stages/embed_dedup.dup_groups_from_pairs)
JACCARD_GROUPS_SQL = _SHINGLE_PAIRS_CTE + """
, edges AS (
  SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
), reach AS (
  SELECT x, y FROM edges
  UNION
  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
)
SELECT x::BIGINT AS doc_id, LEAST(x, MIN(y))::BIGINT AS dup_group
FROM reach GROUP BY x ORDER BY doc_id
"""

def trade_pagerank(sf_dir: str, iters: int = 5, num_partitions: int = 64,
                   num_buckets: int = 8):
    """Entity importance over the customer<->supplier trade graph:
    integer-arithmetic PageRank (`stages/pagerank.py`) on the
    symmetrized bipartite graph whose edges are the DISTINCT
    (customer, supplier) pairs connected by an order line.  Node ids
    disambiguate the two key spaces (customer k -> 2k, supplier
    k -> 2k+1).  Exact int64 floor arithmetic makes the result a pure
    function of the edge set, so the unrolled-iteration SQL oracle
    matches bit-for-bit.

    Scale shape: the lineitem->orders pairing is the repo's
    bucket-paired big-big join (orderkey buckets, identical-columns
    union, per-batch distinct first); pair dedup owns each (src, dst)
    in one pair-hash bucket; the PageRank rounds themselves move only
    (dst, contribution) int64 shards between stable src-hash buckets
    (see stages/pagerank.py for the raw-task rationale)."""
    from ..stages.pagerank import pagerank

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def li_side(b: pd.DataFrame) -> pd.DataFrame:
        g = b.drop_duplicates()
        ok = g["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": ok, "v": g["l_suppkey"].to_numpy(np.int64),
            "jb": (ok % num_partitions).astype("int32"),
            "side": np.zeros(len(g), dtype=np.int8)})

    def ord_side(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": ok, "v": b["o_custkey"].to_numpy(np.int64),
            "jb": (ok % num_partitions).astype("int32"),
            "side": np.ones(len(b), dtype=np.int8)})

    empty_e = pd.DataFrame({"src": pd.Series(dtype="int64"),
                            "dst": pd.Series(dtype="int64"),
                            "pb": pd.Series(dtype="int32")})

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["k", "v"]]
        r = g[g["side"] == 1][["k", "v"]]
        if l.empty or r.empty:
            return empty_e.copy()
        m = l.merge(r, on="k")  # v_x = suppkey, v_y = custkey
        df = pd.DataFrame({
            "src": m["v_y"].to_numpy(np.int64) * 2,
            "dst": m["v_x"].to_numpy(np.int64) * 2 + 1,
        }).drop_duplicates()
        df["pb"] = _pair_bucket(df["src"].to_numpy(np.int64),
                                df["dst"].to_numpy(np.int64),
                                num_partitions)
        return df

    def dedup_and_symmetrize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["src", "dst"])
        s = g["src"].to_numpy(np.int64)
        d = g["dst"].to_numpy(np.int64)
        return pd.DataFrame({"src": np.concatenate([s, d]),
                             "dst": np.concatenate([d, s])})

    pairs = (li.map_batches(li_side, batch_format="pandas",
                            batch_size=65536)
             .union(orders.map_batches(ord_side, batch_format="pandas"))
             .groupby("jb").map_groups(join_bucket, batch_format="pandas")
             .groupby("pb").map_groups(dedup_and_symmetrize,
                                       batch_format="pandas"))

    pr = pagerank(pairs, iters=iters, num_buckets=num_buckets)

    def label(b: pd.DataFrame) -> pd.DataFrame:
        node = b["node"].to_numpy(np.int64)
        return pd.DataFrame({
            "kind": np.where(node % 2 == 0, "customer", "supplier"),
            "key": node // 2,
            "pr": b["pr"].astype("int64")})

    return pr.map_batches(label, batch_format="pandas").sort(["kind", "key"])


def _pagerank_sql(iters: int = 5) -> str:
    """Unrolled-iteration twin of stages/pagerank.py's integer
    recurrence (DuckDB disallows aggregates in a recursive CTE term,
    so the fixed iteration count is unrolled as chained CTEs)."""
    sql = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
e0 AS (
  SELECT DISTINCT (o.o_custkey * 2)::BIGINT AS src,
                  (li.l_suppkey * 2 + 1)::BIGINT AS dst
  FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
), edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT src AS node, 1000000000::BIGINT AS r FROM deg)"""
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""",
r{i} AS (
  SELECT e.dst AS node,
         (150000000 + SUM((p.r * 85) // (100 * d.outdeg)))::BIGINT AS r
  FROM edges e JOIN {prev} p ON p.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst)"""
        prev = f"r{i}"
    return sql + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       (node // 2)::BIGINT AS key, r AS pr
FROM {prev} ORDER BY kind, key
"""


TRADE_PAGERANK_SQL = _pagerank_sql(5)


def triangle_count(sf_dir: str, num_buckets: int = 32,
                   degree_broadcast_limit: int = 5_000_000):
    """Triangle census of the part co-purchase graph: nodes are parts,
    an edge joins two parts that appear in the same order, and the
    output is one exact-integer row — distinct edges, wedges (paths of
    length 2, sum over nodes of C(deg, 2)), triangles, and the global
    clustering coefficient 3*tri/wedges in ppm (floor of the exact
    rational, so both engines agree bit-for-bit).

    The classic distributed triangle algorithm (degree orientation +
    wedge closure; Suri & Vassilvitskii WWW'11 / Cohen's MapReduce
    formulation):
      1. distinct (order, part) map-side, order-hash bucket shuffle;
         each bucket owns its orders, so per-order part pairs come from
         the shared `_key_group_pair_partials` kernel (array
         arithmetic, no Python pair loop).  Per-order part counts are
         bounded (an order has a handful of lines), so the C(L, 2)
         emission cannot blow up.
      2. pair-hash buckets dedup pairs into the distinct edge set E —
         each edge wholly owned by one bucket (materialized: consumed
         by degrees, orientation, and the closure probe).
      3. degrees from per-block np.unique partials + node-bucket fold.
      4. orient each edge low->high by (degree, id); out-degrees are
         then O(sqrt(|E|))-bounded, which bounds wedge emission.
         Degrees broadcast once via ray.put when the node count is
         under `degree_broadcast_limit`; past it, the same orientation
         runs fully distributed as two node-bucket join rounds
         (identical-columns kind-tagged unions) — same answer, tested
         equal by forcing the limit to 0.
      5. per-source wedges via the SAME pair kernel keyed by the SAME
         pair-hash, so wedge (v, w) lands in the bucket that owns edge
         (v, w): closure is a bucket-local merge; only per-bucket
         count rows reach the driver."""
    import ray

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    no_cap = np.iinfo(np.int64).max

    def op_dedup(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates()
        o = b["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({"key": o,
                             "doc_id": b["l_partkey"].to_numpy(np.int64),
                             "ob": (o % num_buckets).astype(np.int32)})

    def order_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["key", "doc_id"])
        return _key_group_pair_partials(g, "key", no_cap, num_buckets)

    edges = (li.map_batches(op_dedup, batch_format="pandas",
                            batch_size=131072)
             .groupby("ob").map_groups(order_pairs, batch_format="pandas")
             .groupby("pb").map_groups(
                 lambda g: g.drop_duplicates(subset=["doc_a", "doc_b"])
                 [["doc_a", "doc_b"]],
                 batch_format="pandas"))
    # consumed three times (degrees, orientation, closure probe)
    edges = edges.materialize()

    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([b["doc_a"].to_numpy(np.int64),
                                b["doc_b"].to_numpy(np.int64)])
        u, c = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": u, "deg": c.astype(np.int64),
                             "nb": (u % num_buckets).astype(np.int32)})

    def deg_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    degrees = (edges.map_batches(deg_partial, batch_format="pandas")
               .groupby("nb").map_groups(deg_fold, batch_format="pandas")
               .materialize())  # reused: wedge total + orientation

    # total wedges = sum over nodes of C(deg, 2) — full degrees, NOT
    # the oriented out-degrees (those undercount by construction)
    def wedge_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["deg"].to_numpy(np.int64)
        return pd.DataFrame({"w": [int((d * (d - 1) // 2).sum())]})

    wedge_rows = _fold_pd(degrees.map_batches(wedge_partial,
                                              batch_format="pandas"),
                          pd.DataFrame({"w": pd.Series(dtype="int64")}))
    n_wedges = int(wedge_rows["w"].sum()) if len(wedge_rows) else 0

    n_nodes = degrees.count()
    if n_nodes <= degree_broadcast_limit:
        deg_df = degrees.to_pandas()
        nodes_s = deg_df["node"].to_numpy(np.int64)
        order = np.argsort(nodes_s)
        deg_ref = ray.put((nodes_s[order],
                           deg_df["deg"].to_numpy(np.int64)[order]))

        def orient(b: pd.DataFrame) -> pd.DataFrame:
            nodes_sorted, degs = ray.get(deg_ref)
            u = b["doc_a"].to_numpy(np.int64)
            v = b["doc_b"].to_numpy(np.int64)
            # every endpoint has a degree row by construction
            du = degs[np.searchsorted(nodes_sorted, u)]
            dv = degs[np.searchsorted(nodes_sorted, v)]
            swap = (dv < du) | ((dv == du) & (v < u))
            s = np.where(swap, v, u)
            return pd.DataFrame({"s": s, "t": np.where(swap, u, v),
                                 "sb": (s % num_buckets).astype(np.int32)})

        oriented = edges.map_batches(orient, batch_format="pandas")
    else:
        oriented = _orient_by_degree_distributed(edges, degrees,
                                                 num_buckets)

    def src_wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"key": g["s"], "doc_id": g["t"]})
        out = _key_group_pair_partials(g, "key", no_cap, num_buckets)
        out["kind"] = np.full(len(out), 1, np.int8)
        return out

    wedges = (oriented.groupby("sb")
              .map_groups(src_wedges, batch_format="pandas"))

    def edge_tag(b: pd.DataFrame) -> pd.DataFrame:
        # MUST match the kernel's bucket (closure is bucket-local)
        pb = _pair_bucket(b["doc_a"].to_numpy(np.int64),
                          b["doc_b"].to_numpy(np.int64), num_buckets)
        return pd.DataFrame({"doc_a": b["doc_a"].to_numpy(np.int64),
                             "doc_b": b["doc_b"].to_numpy(np.int64),
                             "m": np.zeros(len(b), np.int64),
                             "pb": pb,
                             "kind": np.zeros(len(b), np.int8)})

    def close_bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0][["doc_a", "doc_b"]]
        w = g[g["kind"] == 1]
        hit = w.merge(e, on=["doc_a", "doc_b"])
        return pd.DataFrame({"n_tri": [int(hit["m"].sum())],
                             "n_edges": [len(e)]})

    counts = (edges.map_batches(edge_tag, batch_format="pandas")
              .union(wedges)
              .groupby("pb").map_groups(close_bucket,
                                        batch_format="pandas"))
    fold = _fold_pd(counts, pd.DataFrame({
        "n_tri": pd.Series(dtype="int64"),
        "n_edges": pd.Series(dtype="int64")}))
    n_tri = int(fold["n_tri"].sum()) if len(fold) else 0
    n_edges = int(fold["n_edges"].sum()) if len(fold) else 0
    gcc_ppm = (3_000_000 * n_tri) // n_wedges if n_wedges else 0
    return pd.DataFrame({"n_edges": pd.Series([n_edges], dtype="int64"),
                         "n_wedges": pd.Series([n_wedges], dtype="int64"),
                         "n_triangles": pd.Series([n_tri], dtype="int64"),
                         "gcc_ppm": pd.Series([gcc_ppm], dtype="int64")})


def _orient_by_degree_distributed(edges, degrees, num_buckets: int):
    """Degree orientation without the broadcast: two node-bucket join
    rounds attach deg(doc_a) then deg(doc_b) via the repo's
    identical-columns kind-tagged union idiom, then orient.  Same
    (degree, id) comparison as the broadcast path — tested bit-equal
    by forcing `degree_broadcast_limit=0`."""
    _e2 = pd.DataFrame({"k": pd.Series(dtype="int64"),
                        "other": pd.Series(dtype="int64"),
                        "d": pd.Series(dtype="int64"),
                        "kind": pd.Series(dtype="int8"),
                        "kb": pd.Series(dtype="int32")})

    def deg_rows(b: pd.DataFrame) -> pd.DataFrame:
        k = b["node"].to_numpy(np.int64)
        return pd.DataFrame({"k": k,
                             "other": np.zeros(len(b), np.int64),
                             "d": b["deg"].to_numpy(np.int64),
                             "kind": np.ones(len(b), np.int8),
                             "kb": (k % num_buckets).astype(np.int32)})

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        k = b["doc_a"].to_numpy(np.int64)
        return pd.DataFrame({"k": k,
                             "other": b["doc_b"].to_numpy(np.int64),
                             "d": np.zeros(len(b), np.int64),
                             "kind": np.zeros(len(b), np.int8),
                             "kb": (k % num_buckets).astype(np.int32)})

    def _deg_lookup(g: pd.DataFrame, probe: np.ndarray) -> np.ndarray:
        d = g[g["kind"] == 1]
        ks = d["k"].to_numpy(np.int64)
        order = np.argsort(ks)
        return d["d"].to_numpy(np.int64)[order][
            np.searchsorted(ks[order], probe)]

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0]
        if e.empty:
            return _e2.copy()
        da = _deg_lookup(g, e["k"].to_numpy(np.int64))
        k2 = e["other"].to_numpy(np.int64)  # re-key by doc_b
        return pd.DataFrame({"k": k2,
                             "other": e["k"].to_numpy(np.int64),
                             "d": da,
                             "kind": np.zeros(len(e), np.int8),
                             "kb": (k2 % num_buckets).astype(np.int32)})

    def attach_b_orient(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0]
        if e.empty:
            return pd.DataFrame({"s": pd.Series(dtype="int64"),
                                 "t": pd.Series(dtype="int64"),
                                 "sb": pd.Series(dtype="int32")})
        dv = _deg_lookup(g, e["k"].to_numpy(np.int64))
        u = e["other"].to_numpy(np.int64)   # original doc_a
        v = e["k"].to_numpy(np.int64)       # original doc_b
        du = e["d"].to_numpy(np.int64)
        swap = (dv < du) | ((dv == du) & (v < u))
        s = np.where(swap, v, u)
        return pd.DataFrame({"s": s, "t": np.where(swap, u, v),
                             "sb": (s % num_buckets).astype(np.int32)})

    deg_tagged = degrees.map_batches(deg_rows, batch_format="pandas")
    phase1 = (edges.map_batches(edge_rows, batch_format="pandas")
              .union(deg_tagged)
              .groupby("kb").map_groups(attach_a, batch_format="pandas"))
    return (phase1.union(deg_tagged)
            .groupby("kb").map_groups(attach_b_orient,
                                      batch_format="pandas"))


TRIANGLE_COUNT_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
),
deg AS (
  SELECT x, count(*)::BIGINT AS d
  FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x
),
tri AS (
  SELECT count(*)::BIGINT AS t
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
wed AS (SELECT COALESCE(sum((d * (d - 1)) // 2), 0)::BIGINT AS w FROM deg)
SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
       wed.w AS n_wedges,
       tri.t AS n_triangles,
       CASE WHEN wed.w = 0 THEN 0
            ELSE ((3000000::HUGEINT * tri.t) // wed.w)::BIGINT
       END AS gcc_ppm
FROM tri, wed
"""


def dup_rate_by_source(sf_dir: str, threshold: float = 0.5):
    """Per-source near-duplication report: how many of each ingestion
    source's documents are non-canonical near-dup cluster members (the
    docs `near_dedup_keep` would drop) — the table that tells a
    curation run WHICH crawl is contaminating the corpus.  All-integer
    (n_docs, n_dropped; rates are downstream division).

    Scale shape: the drop-set from the connected-components pass is
    dup-mass-sized and broadcasts once; the corpus streams through a
    single count map emitting at most |sources| rows per batch, then
    one tiny fold.  No corpus shuffle."""
    import ray

    from ..stages.components import connected_components
    from ..stages.neardup import minhash_lsh_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_dedup(docs, threshold=threshold,
                              prefilter_sigma=None)
    cc = connected_components(pairs, num_buckets=8).to_pandas()
    if cc.empty:
        drop = np.empty(0, np.int64)
    else:
        drop = np.sort(cc.loc[cc["node"] != cc["label"], "node"]
                       .to_numpy(np.int64))
    drop_ref = ray.put(drop)

    src_ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        hit = _semi_mask(ray.get(drop_ref), ids)
        g = pd.DataFrame({"source": b["source"].fillna(""),
                          "n_docs": np.ones(len(b), dtype=np.int64),
                          "n_dropped": hit.astype(np.int64)})
        return g.groupby("source", as_index=False).sum()

    empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                          "n_docs": pd.Series(dtype="int64"),
                          "n_dropped": pd.Series(dtype="int64")})
    out = _fold_pd(src_ds.map_batches(partial, batch_format="pandas"),
                   empty)
    out = out.groupby("source", as_index=False)[["n_docs", "n_dropped"]].sum()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_dropped"] = out["n_dropped"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


NEAR_DEDUP_KEEP_SQL = _SHINGLE_PAIRS_CTE + """
, edges AS (
  SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
), reach AS (
  SELECT x, y FROM edges
  UNION
  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
), grp AS (
  SELECT x AS doc_id, LEAST(x, MIN(y)) AS g FROM reach GROUP BY x
)
SELECT d.doc_id::BIGINT AS doc_id,
       (g.g IS NULL OR g.g = d.doc_id) AS keep
FROM documents d LEFT JOIN grp g ON g.doc_id = d.doc_id
ORDER BY d.doc_id
"""

DUP_RATE_BY_SOURCE_SQL = _SHINGLE_PAIRS_CTE + """
, edges AS (
  SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
), reach AS (
  SELECT x, y FROM edges
  UNION
  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
), grp AS (
  SELECT x AS doc_id, LEAST(x, MIN(y)) AS g FROM reach GROUP BY x
)
SELECT coalesce(d.source, '') AS source,
       count(*)::BIGINT AS n_docs,
       SUM(CASE WHEN grp.g IS NOT NULL AND grp.g <> d.doc_id
                THEN 1 ELSE 0 END)::BIGINT AS n_dropped
FROM documents d LEFT JOIN grp ON grp.doc_id = d.doc_id
GROUP BY 1 ORDER BY source
"""


def _simhash_sql() -> str:
    """SimHash oracle: per-word base-257 code-point polynomial + double
    Knuth mix mod 2^64 in HUGEINT arithmetic (bit-identical to
    stages/neardup._word_hash64), then the per-bit majority vote with
    output bits 1..63 (matching simhash_batch's >> 1)."""
    terms = "\n     + ".join(
        f"CASE WHEN 2*SUM(((h // {1 << (j + 1)}) % 2)) > COUNT(*)"
        f" THEN {1 << j} ELSE 0 END"
        for j in range(63))
    return f"""
WITH words AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
    FROM documents) WHERE w <> ''
), whash AS (
  SELECT doc_id,
    ((list_reduce(
        list_prepend(0::HUGEINT,
          list_transform(range(1, length(w) + 1),
                         i -> unicode(substring(w, i, 1))::HUGEINT)),
        (acc, x) -> (acc * 257 + x) % 18446744073709551616::HUGEINT)
      * 2654435769) % 18446744073709551616::HUGEINT
      * 3266489917) % 18446744073709551616::HUGEINT AS h
  FROM words
), per_doc AS (
  SELECT doc_id, ({terms})::BIGINT AS simhash
  FROM whash GROUP BY doc_id)
SELECT d.doc_id, COALESCE(p.simhash, 0)::BIGINT AS simhash
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


SIMHASH_SQL = _simhash_sql()


# ---------------------------------------------------------------------------
# Gap-based sessionization (windowed streaming aggregate; ray_guide
# sessionization pattern: coarse user buckets -> vectorized in-group
# window).  New session when the gap to the previous event of the same
# user exceeds 30 minutes.
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000


def user_event_seq(sf_dir: str, num_buckets: int = 32,
                   max_len: int = 50):
    """Per-user ordered event-type sequence — the sequence-mining /
    behavioral-clone primitive (ordered string_agg): events sorted by
    (ts, event_id) per user, types joined by '>', truncated to the
    first `max_len` events on BOTH engines.

    Scale shape: one user-hash bucket shuffle of (user, ts, event_id,
    type); each bucket owns its users completely, so the ordered
    concat is a bucket-local vectorized groupby-agg; output is one
    bounded-length row per user."""
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    def seqs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"],
                              kind="stable")
        g = g.assign(rank=g.groupby("user_id").cumcount())
        out = (g[g["rank"] < max_len]
               .groupby("user_id", as_index=False)
               .agg(seq=("event_type", ">".join),
                    n_events=("event_type", "size")))
        out["n_events"] = out["n_events"].astype("int64")
        return out

    out = (ev.map_batches(bucketed, batch_format="pandas")
           .groupby("ub").map_groups(seqs, batch_format="pandas"))
    return out.sort("user_id")


USER_EVENT_SEQ_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rk
  FROM events
)
SELECT user_id,
       string_agg(event_type, '>' ORDER BY rk) AS seq,
       count(*)::BIGINT AS n_events
FROM r WHERE rk <= 50
GROUP BY user_id ORDER BY user_id
"""


def sessionize(sf_dir: str, num_buckets: int = 32):
    """Contract-facing entry: sessionize_core + the presentation sort."""
    return sessionize_core(sf_dir, num_buckets).sort(
        ["user_id", "session_id"])


def sessionize_core(sf_dir: str, num_buckets: int = 32):
    """Unsorted session table (user-bucket shuffle only) — for
    order-insensitive consumers (session_duration_percentiles) that
    should not pay the final global sort-shuffle."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        # Timedelta compare is timestamp-unit-independent (us vs ns)
        gap_exceeded = g["ts"].diff() > pd.Timedelta(microseconds=SESSION_GAP_US)
        new_sess = (new_user | gap_exceeded).astype("int64")
        sess_seq = new_sess.cumsum()
        # per-user 0-based session id
        first_seq = sess_seq.where(new_user).ffill()
        g = g.assign(session_id=(sess_seq - first_seq).astype("int64"))
        out = (g.groupby(["user_id", "session_id"], as_index=False)
               .agg(n_events=("event_id", "size"),
                    session_start=("ts", "min"),
                    session_end=("ts", "max")))
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (ev.map_batches(bucketed, batch_format="pandas")
            .groupby("ub").map_groups(sessions, batch_format="pandas"))


SESSIONIZE_SQL = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         (SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_id
  FROM d
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# As-of join: each event matched to the user's latest order at or before
# the event time.  Ray Data has no asof join; this is the guide's
# bucket-paired pattern: hash both sides on the key into the same
# buckets, pd.merge_asof inside each bucket group.  Partitioning
# assumption: one key's rows (both sides) fit in a worker.
# ---------------------------------------------------------------------------

def asof_join_orders(sf_dir: str, num_buckets: int = 32):
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])

    # identical-columns union (repo idiom — differing schemas can
    # KeyError in the group fn when a sort-shuffle block saw one side)
    def tag_ev(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(jb=_user_bucket(b["user_id"], num_buckets))
        b["side"] = 0
        b["o_orderkey"] = np.int64(-1)
        b["o_totalprice"] = 0.0
        return b[["jb", "side", "event_id", "ts", "user_id",
                  "o_orderkey", "o_totalprice"]]

    def tag_ord(b: pd.DataFrame) -> pd.DataFrame:
        b = b.rename(columns={"o_custkey": "user_id", "o_orderdate": "ts"})
        b = b.assign(jb=_user_bucket(b["user_id"], num_buckets))
        b["side"] = 1
        b["event_id"] = -1
        return b[["jb", "side", "event_id", "ts", "user_id",
                  "o_orderkey", "o_totalprice"]]

    both = ev.map_batches(tag_ev, batch_format="pandas").union(
        orders.map_batches(tag_ord, batch_format="pandas"))

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["side"] == 0][["event_id", "ts", "user_id"]]
        right = group[group["side"] == 1][
            ["ts", "user_id", "o_orderkey", "o_totalprice"]]
        if left.empty or right.empty:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "ts": pd.Series(dtype="datetime64[us]"),
                "o_orderkey": pd.Series(dtype="int64"),
                "o_totalprice": pd.Series(dtype="float64")})
        # sorted by (ts, o_orderkey): merge_asof takes the LAST row with
        # ts <= event ts, i.e. latest order date, max orderkey on ties —
        # same tiebreak as the oracle's ORDER BY date DESC, key DESC
        left = left.sort_values("ts", kind="stable")
        right = right.sort_values(["ts", "o_orderkey"], kind="stable")
        m = pd.merge_asof(left, right, on="ts", by="user_id",
                          direction="backward")
        m = m.dropna(subset=["o_orderkey"])
        m["o_orderkey"] = m["o_orderkey"].astype("int64")
        return m[["event_id", "user_id", "ts", "o_orderkey", "o_totalprice"]]

    out = both.groupby("jb").map_groups(join_bucket, batch_format="pandas")
    return out.sort("event_id")


ASOF_JOIN_SQL = """
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
FROM events e JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
) o ON TRUE
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# Banded range join (attribution window): for every purchase event,
# count the same user's click events in the preceding 30 minutes
# (click.ts in (purchase.ts - 30min, purchase.ts]).  Ray Data has no
# range join; this is the bucket-paired pattern: hash BOTH roles of the
# self-join on user into the same buckets, then inside each bucket the
# band predicate reduces to prefix-count arithmetic over two
# pd.merge_asof probes — count_le(t) - count_le(t - W) against a
# per-user cumulative click counter.  No per-row loop, no all-pairs
# blowup.  Partitioning assumption (same as asof_join_orders): one
# user-bucket's events fit in a worker.
# ---------------------------------------------------------------------------

RANGE_JOIN_WINDOW_US = 30 * 60 * 1_000_000  # 30 minutes


def range_join_attrib(sf_dir: str, num_buckets: int = 32):
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("purchase", "click"))]
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    win = pd.Timedelta(microseconds=RANGE_JOIN_WINDOW_US)

    def attrib(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_id": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "clicks_30m": pd.Series(dtype="int64")})
        # one ts unit for both merge_asof probes (parquet us vs the
        # Timedelta arithmetic's ns would MergeError)
        group = group.assign(ts=group["ts"].astype("datetime64[ns]"))
        p = group.loc[group["event_type"] == "purchase",
                      ["event_id", "user_id", "ts"]]
        if p.empty:
            return empty
        c = group.loc[group["event_type"] == "click", ["user_id", "ts"]]
        if c.empty:
            return p.assign(clicks_30m=np.int64(0))[
                ["event_id", "user_id", "clicks_30m"]]
        # per-user cumulative click count; for equal (user, ts) the
        # counter ascends, and merge_asof backward takes the LAST row
        # with ts <= t — i.e. the full count_le(t), ties included
        c = c.sort_values(["user_id", "ts"], kind="stable")
        c = c.assign(cnt=(c.groupby("user_id").cumcount() + 1).astype("int64"))
        c = c.sort_values("ts", kind="stable")
        p = p.sort_values("ts", kind="stable")
        hi = pd.merge_asof(p, c, on="ts", by="user_id",
                           direction="backward", allow_exact_matches=True)
        lo_probe = p.assign(ts=p["ts"] - win).sort_values("ts", kind="stable")
        lo = pd.merge_asof(lo_probe, c, on="ts", by="user_id",
                           direction="backward", allow_exact_matches=True)
        # merge_asof preserves left order; lo was re-sorted by the
        # shifted ts, so align the two probes on event_id
        n = (hi.set_index("event_id")["cnt"].fillna(0)
             - lo.set_index("event_id")["cnt"].fillna(0))
        out = hi[["event_id", "user_id"]].copy()
        out["clicks_30m"] = n.loc[out["event_id"]].astype("int64").to_numpy()
        return out

    out = (ev.map_batches(bucketed, batch_format="pandas")
           .groupby("ub").map_groups(attrib, batch_format="pandas"))
    return out.sort("event_id")


RANGE_JOIN_ATTRIB_SQL = """
SELECT p.event_id, p.user_id, COUNT(c.event_id) AS clicks_30m
FROM events p LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# Big-big hash join: lineitem x orders (both fact-sized — broadcast is
# wrong here; Ray's native hash-partitioned join shuffles both sides on
# the key).  Revenue by order priority.
# ---------------------------------------------------------------------------

def revenue_by_priority(sf_dir: str, num_partitions: int = 64):
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        # map-side partial per orderkey, tagged with the join bucket.
        # The per-order FINAL aggregation happens inside the join bucket
        # group — a fine-key groupby(l_orderkey).aggregate() would pay
        # Ray per-group overhead on every distinct order (measured 40s
        # at sf0.01); one coarse bucket shuffle does agg + join in ~2s.
        b = b.assign(rev_c=np.floor(
            b["l_extendedprice"] * (1 - b["l_discount"]) * 100.0 + 0.5
        ).astype("int64"))
        g = (b.groupby("l_orderkey", as_index=False)
             .agg(rev_c=("rev_c", "sum"), n_items=("rev_c", "size")))
        g["n_items"] = g["n_items"].astype("int64")
        # identical-columns union (repo idiom): priority slot empty here
        g["o_orderpriority"] = ""
        g["jb"] = (g["l_orderkey"] % num_partitions).astype("int32")
        g["side"] = 0
        return g[["l_orderkey", "rev_c", "n_items", "o_orderpriority",
                  "jb", "side"]]

    left = li.map_batches(pre, batch_format="pandas", batch_size=65536)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["o_orderkey"].to_numpy().astype("int64")
        n = len(b)
        return pd.DataFrame({
            "l_orderkey": ok,
            "rev_c": np.zeros(n, dtype="int64"),
            "n_items": np.zeros(n, dtype="int64"),
            "o_orderpriority": b["o_orderpriority"].to_numpy(),
            "jb": (ok % num_partitions).astype("int32"),
            "side": np.full(n, 1, dtype="int64")})

    both = left.union(orders.map_batches(tag_right, batch_format="pandas"))

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == 0]
        r = (group[group["side"] == 1]
             [["l_orderkey", "o_orderpriority"]]
             .rename(columns={"l_orderkey": "o_orderkey"}))
        if l.empty or r.empty:
            return pd.DataFrame({
                "o_orderpriority": pd.Series(dtype="object"),
                "revenue_c": pd.Series(dtype="int64"),
                "n_orders": pd.Series(dtype="int64"),
                "n_items": pd.Series(dtype="int64")})
        per_order = (l.groupby("l_orderkey", as_index=False)
                     .agg(rev_c=("rev_c", "sum"), n_items=("n_items", "sum")))
        m = per_order.merge(r, left_on="l_orderkey", right_on="o_orderkey")
        return (m.groupby("o_orderpriority", as_index=False)
                .agg(revenue_c=("rev_c", "sum"),
                     n_orders=("rev_c", "size"),
                     n_items=("n_items", "sum")))

    joined = both.groupby("jb").map_groups(join_bucket, batch_format="pandas")
    from ray.data.aggregate import Sum

    out = joined.groupby("o_orderpriority").aggregate(
        Sum("revenue_c", alias_name="revenue_c"),
        Sum("n_orders", alias_name="n_orders"),
        Sum("n_items", alias_name="n_items"))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue"] = b["revenue_c"].astype("int64") / 100.0
        b["n_orders"] = b["n_orders"].astype("int64")
        b["n_items"] = b["n_items"].astype("int64")
        return b[["o_orderpriority", "revenue", "n_orders", "n_items"]]

    return out.map_batches(finish, batch_format="pandas").sort("o_orderpriority")


REVENUE_BY_PRIORITY_SQL = """
SELECT o.o_orderpriority,
       SUM(li.rev_c)::BIGINT / 100.0 AS revenue,
       COUNT(*) AS n_orders,
       SUM(li.n_items)::BIGINT AS n_items
FROM (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT)) AS rev_c,
         COUNT(*) AS n_items
  FROM lineitem GROUP BY l_orderkey
) li JOIN orders o ON li.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


# ---------------------------------------------------------------------------
# Set-op / anti-join + multi-dimension broadcast: customers per nation
# that have NO supplier presence (EXCEPT semantics), with region name.
# nation/supplier/region are dimension-sized: broadcast, no shuffle.
# ---------------------------------------------------------------------------

def nations_without_suppliers(sf_dir: str, min_acctbal: float = 5000.0):
    """Customers in nations with NO high-balance supplier (anti-join /
    EXCEPT semantics on the dimension side, broadcast to the fact)."""
    import ray

    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    supplier = _read(sf_dir, "supplier",
                     columns=["s_nationkey", "s_acctbal"]).to_pandas()
    supplier = supplier[supplier["s_acctbal"] > min_acctbal]
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")
    supplier_nations = set(supplier["s_nationkey"])
    # anti-join on the dimension side (EXCEPT): nations not in suppliers
    dim = dim[~dim["n_nationkey"].isin(supplier_nations)]
    lookup = ray.put(dim[["n_nationkey", "n_name", "r_name"]]
                     .reset_index(drop=True))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized broadcast join (inner merge doubles as the
        # semi-join filter) — no per-row Python lambda
        m = ray.get(lookup)
        out = b.merge(m, left_on="c_nationkey", right_on="n_nationkey")
        if out.empty:
            return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                                 "r_name": pd.Series(dtype="object"),
                                 "n_customers": pd.Series(dtype="int64")})
        return (out.groupby(["n_name", "r_name"], as_index=False)
                .agg(n_customers=("n_name", "size")))

    partials = cust.map_batches(attach, batch_format="pandas",
                                batch_size=65536)
    from ray.data.aggregate import Sum

    out = partials.groupby(["n_name", "r_name"]).aggregate(
        Sum("n_customers", alias_name="n_customers"))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["n_customers"] = b["n_customers"].astype("int64")
        return b

    df = out.map_batches(finish, batch_format="pandas").sort("n_name").to_pandas()
    if df.empty:  # schema guard: empty Ray results drop their columns
        df = pd.DataFrame({"n_name": pd.Series(dtype="object"),
                           "r_name": pd.Series(dtype="object"),
                           "n_customers": pd.Series(dtype="int64")})
    return df


NATIONS_WITHOUT_SUPPLIERS_SQL = """
SELECT n.n_name, r.r_name, COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE n.n_nationkey NOT IN
      (SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000.0)
GROUP BY n.n_name, r.r_name
ORDER BY n.n_name
"""


# ---------------------------------------------------------------------------
# Filtered aggregate over part: brand stats with price floor-cents
# ---------------------------------------------------------------------------

def part_brand_stats(sf_dir: str):
    ds = _read(sf_dir, "part",
               columns=["p_brand", "p_size", "p_retailprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["p_size"] >= 10]
        if b.empty:
            return pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                                 "n_parts": pd.Series(dtype="int64"),
                                 "price_c": pd.Series(dtype="int64")})
        b = b.assign(price_c=np.floor(
            b["p_retailprice"] * 100.0 + 0.5).astype("int64"))
        return (b.groupby("p_brand", as_index=False)
                .agg(n_parts=("p_brand", "size"), price_c=("price_c", "sum")))

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pandas", batch_size=65536)
           .groupby("p_brand").aggregate(
               Sum("n_parts", alias_name="n_parts"),
               Sum("price_c", alias_name="price_c")))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["n_parts"] = b["n_parts"].astype("int64")
        b["total_price"] = b["price_c"].astype("int64") / 100.0
        return b[["p_brand", "n_parts", "total_price"]]

    return out.map_batches(finish, batch_format="pandas").sort("p_brand")


PART_BRAND_STATS_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       SUM(CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT)) / 100.0
         AS total_price
FROM part WHERE p_size >= 10
GROUP BY p_brand ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Q3-style shipping priority: two chained big-big bucket joins
# (orders semi-join customer-segment on custkey, then lineitem partials
# join the surviving orders on orderkey), per-order revenue, global
# top-k by revenue.  Customer and orders both scale with the fact table,
# so NEITHER side is broadcast — each join is the bucket-paired union +
# map_groups pattern; only the final k rows reach the driver.
# ---------------------------------------------------------------------------

def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-01-01", k: int = 10,
                      num_partitions: int = 64):
    """TPC-H Q3 shape: top-k unshipped orders by revenue for one market
    segment.  Revenue uses the repo-wide integer-cents convention so the
    Ray result hashes identically to the DuckDB oracle."""
    cut = pd.Timestamp(cutoff)

    # --- join 1: orders (o_orderdate < cutoff) semi-join customers in
    # the segment, bucketed on custkey.  Both sides are fact-scale.
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["c_mktsegment"] == segment]
        key = b["c_custkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key,
            "o_orderkey": np.zeros(len(b), dtype="int64"),
            "o_date_ns": np.zeros(len(b), dtype="int64"),
            "jb": (key % num_partitions).astype("int32"),
            "side": np.zeros(len(b), dtype="int8")})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderdate"] < cut]
        return pd.DataFrame({
            "key": b["o_custkey"].astype("int64"),
            "o_orderkey": b["o_orderkey"].astype("int64"),
            # pin to ns before the int cast: pandas 2 preserves the
            # parquet us unit, and a unit-ambiguous int64 round-trips
            # to the wrong date
            "o_date_ns": b["o_orderdate"].astype("datetime64[ns]")
                          .astype("int64"),
            "jb": (b["o_custkey"] % num_partitions).astype("int32"),
            "side": np.ones(len(b), dtype="int8")})

    both1 = (cust.map_batches(cust_side, batch_format="pandas")
             .union(orders.map_batches(order_side, batch_format="pandas")))

    def semi(group: pd.DataFrame) -> pd.DataFrame:
        keep = group.loc[group["side"] == 0, "key"].to_numpy()
        o = group[group["side"] == 1]
        o = o[o["key"].isin(keep)]
        # re-bucket the surviving orders on orderkey for join 2
        return pd.DataFrame({
            "o_orderkey": o["o_orderkey"].to_numpy(),
            "o_date_ns": o["o_date_ns"].to_numpy(),
            "rev_c": np.zeros(len(o), dtype="int64"),
            "jb": (o["o_orderkey"] % num_partitions).astype("int32"),
            "side": np.ones(len(o), dtype="int8")})

    orders_kept = both1.groupby("jb").map_groups(semi, batch_format="pandas")

    # --- join 2: lineitem (l_shipdate > cutoff) per-order revenue
    # partials, bucketed on orderkey, joined to the surviving orders.
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] > cut]
        rev = np.floor(b["l_extendedprice"].to_numpy()
                       * (1.0 - b["l_discount"].to_numpy()) * 100.0
                       + 0.5).astype("int64")
        g = (pd.DataFrame({"o_orderkey": b["l_orderkey"].to_numpy(),
                           "rev_c": rev})
             .groupby("o_orderkey", as_index=False).agg(rev_c=("rev_c", "sum")))
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].astype("int64"),
            "o_date_ns": np.zeros(len(g), dtype="int64"),
            "rev_c": g["rev_c"].astype("int64"),
            "jb": (g["o_orderkey"] % num_partitions).astype("int32"),
            "side": np.zeros(len(g), dtype="int8")})

    both2 = orders_kept.union(
        li.map_batches(li_partial, batch_format="pandas", batch_size=65536))

    def join2(group: pd.DataFrame) -> pd.DataFrame:
        o = group[group["side"] == 1][["o_orderkey", "o_date_ns"]]
        l = group[group["side"] == 0]
        if o.empty or l.empty:
            return pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                 "o_date_ns": pd.Series(dtype="int64"),
                                 "revenue_c": pd.Series(dtype="int64")})
        per = (l.groupby("o_orderkey", as_index=False)
               .agg(revenue_c=("rev_c", "sum")))
        m = per.merge(o, on="o_orderkey")
        # per-bucket partial top-k: only k rows per bucket leave the node
        return (m.sort_values(["revenue_c", "o_orderkey"],
                              ascending=[False, True], kind="stable")
                .head(k)[["o_orderkey", "o_date_ns", "revenue_c"]])

    partials = both2.groupby("jb").map_groups(join2, batch_format="pandas")
    top = partials.to_pandas()  # ≤ num_partitions × k rows
    top = (top.sort_values(["revenue_c", "o_orderkey"],
                           ascending=[False, True], kind="stable").head(k))
    return pd.DataFrame({
        "o_orderkey": top["o_orderkey"].astype("int64").to_numpy(),
        "o_orderdate": pd.to_datetime(top["o_date_ns"].to_numpy()),
        "revenue": top["revenue_c"].astype("int64").to_numpy() / 100.0,
    }).reset_index(drop=True)


SHIPPING_PRIORITY_SQL = """
SELECT li.o_orderkey, o.o_orderdate, li.rev_c / 100.0 AS revenue
FROM (
  SELECT l_orderkey AS o_orderkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT)) AS rev_c
  FROM lineitem WHERE l_shipdate > DATE '1998-01-01'
  GROUP BY l_orderkey
) li
JOIN orders o ON li.o_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-01-01'
ORDER BY revenue DESC, li.o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Per-user argmax (top event per user): map-side partial argmax inside
# each batch, then one user-bucket shuffle and a final in-group argmax.
# Raw events never shuffle — at most one row per (batch, user) does.
# ---------------------------------------------------------------------------

def top_event_per_user(sf_dir: str, num_buckets: int = 64):
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.sort_values(["value", "event_id"],
                           ascending=[False, True], kind="stable")
             .groupby("user_id", as_index=False).head(1))
        return g.assign(ub=_user_bucket(g["user_id"], num_buckets))

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.sort_values(["value", "event_id"],
                               ascending=[False, True], kind="stable")
             .groupby("user_id", as_index=False).head(1))
        return g[["user_id", "event_id", "event_type", "value", "ts"]]

    out = (ev.map_batches(partial, batch_format="pandas", batch_size=65536)
           .groupby("ub").map_groups(final, batch_format="pandas"))
    return out.sort("user_id")


TOP_EVENT_PER_USER_SQL = """
SELECT user_id, event_id, event_type, value, ts
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Per-user running total (cumulative window): user-bucket shuffle, then a
# vectorized in-group cumsum over integer cents.  The window never needs
# global state — each user's history lives in exactly one bucket.
# ---------------------------------------------------------------------------

def user_running_total(sf_dir: str, num_buckets: int = 32):
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    def running(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cents = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        run = pd.Series(cents).groupby(g["user_id"].to_numpy()).cumsum()
        g = g.assign(running_total=run.to_numpy() / 100.0)
        return g[["event_id", "user_id", "ts", "value", "running_total"]]

    out = (ev.map_batches(bucketed, batch_format="pandas")
           .groupby("ub").map_groups(running, batch_format="pandas"))
    return out.sort(["user_id", "ts", "event_id"])


USER_RUNNING_TOTAL_SQL = """
SELECT event_id, user_id, ts, value,
       SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) / 100.0 AS running_total
FROM events
ORDER BY user_id, ts, event_id
"""

# ---------------------------------------------------------------------------
# TPC-H Q5 shape: fact-fact bucket joins (lineitem ⋈ supplier on
# suppkey, orders ⋈ customer on custkey, then the two halves ⋈ on
# orderkey with the c_nationkey = s_nationkey "local supplier"
# condition).  nation ⋈ region is the only unconditional broadcast — a
# true dimension.  supplier is fact-scaled but ~100× smaller than
# lineitem, so a size-gated semi-join reduction applies: when the
# region-filtered supplier set fits `supp_broadcast_limit`, it is
# broadcast once and the suppkey shuffle disappears (lineitem is also
# pre-filtered ~|nations in region|/|nations| before its shuffle);
# past the gate the fully distributed suppkey bucket join runs.  The
# supplier and customer joins are INDEPENDENT subtrees, so their
# shuffles overlap in the streaming executor; only the final orderkey
# bucket join waits on both.  Nothing fact-sized lands on the driver;
# lineitem pre-aggregates per (suppkey, orderkey) map-side so shuffles
# ship partials, not rows.
# ---------------------------------------------------------------------------

def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_from: str = "1996-01-01",
                          date_to: str = "1997-01-01",
                          num_partitions: int = 64,
                          supp_broadcast_limit: int = 2_000_000):
    import ray

    # dimension broadcast: nationkey -> name, restricted to the region
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    rk = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nation = nation[nation["n_regionkey"].isin(rk)]
    names = dict(zip(nation["n_nationkey"].astype("int64"),
                     nation["n_name"]))
    nat_ref = ray.put(names)
    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)

    # --- branch A: lineitem partials ⋈ supplier, bucketed on suppkey --
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = np.floor(b["l_extendedprice"].to_numpy()
                       * (1.0 - b["l_discount"].to_numpy()) * 100.0
                       + 0.5).astype("int64")
        g = (pd.DataFrame({"key": b["l_suppkey"].astype("int64"),
                           "o_orderkey": b["l_orderkey"].astype("int64"),
                           "rev_c": rev})
             .groupby(["key", "o_orderkey"], as_index=False)
             .agg(rev_c=("rev_c", "sum")))
        g["nk"] = np.int64(0)
        g["jb"] = (g["key"] % num_partitions).astype("int32")
        g["side"] = np.int8(0)
        return g[["key", "o_orderkey", "rev_c", "nk", "jb", "side"]]

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def supp_filter(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(nat_ref)
        b = b[b["s_nationkey"].isin(m)]
        return pd.DataFrame({
            "s_suppkey": b["s_suppkey"].to_numpy().astype("int64"),
            "s_nationkey": b["s_nationkey"].to_numpy().astype("int64")})

    # materialize: supplier is ~100× smaller than lineitem, and the gate
    # decision needs its count before the lineitem scan plan is built
    supp_f = supp.map_batches(supp_filter,
                              batch_format="pandas").materialize()

    def _empty():
        return pd.DataFrame({"key": pd.Series(dtype="int64"),
                             "nk": pd.Series(dtype="int64"),
                             "rev_c": pd.Series(dtype="int64"),
                             "jb": pd.Series(dtype="int32"),
                             "side": pd.Series(dtype="int8")})

    if supp_f.count() <= supp_broadcast_limit:
        # semi-join reduction: broadcast the sorted (suppkey -> nation)
        # arrays once; lineitem is filtered AND nation-tagged map-side,
        # so the suppkey shuffle disappears entirely
        sdf = supp_f.to_pandas().sort_values("s_suppkey")
        sup_ref = ray.put((sdf["s_suppkey"].to_numpy(),
                           sdf["s_nationkey"].to_numpy()))

        def li_semi(b: pd.DataFrame) -> pd.DataFrame:
            keys, nks = ray.get(sup_ref)
            if len(keys) == 0:
                return _empty()
            sk = b["l_suppkey"].to_numpy().astype("int64")
            hit, pos = _semi_probe(keys, sk)
            b = b[hit]
            rev = np.floor(b["l_extendedprice"].to_numpy()
                           * (1.0 - b["l_discount"].to_numpy()) * 100.0
                           + 0.5).astype("int64")
            g = (pd.DataFrame({"key": b["l_orderkey"].to_numpy()
                               .astype("int64"),
                               "nk": nks[pos[hit]],
                               "rev_c": rev})
                 .groupby(["key", "nk"], as_index=False)
                 .agg(rev_c=("rev_c", "sum")))
            g["jb"] = (g["key"] % num_partitions).astype("int32")
            g["side"] = np.int8(0)
            return g[["key", "nk", "rev_c", "jb", "side"]]

        li_supp = li.map_batches(li_semi, batch_format="pandas",
                                 batch_size=65536)
    else:
        # distributed path: suppkey bucket join, nothing broadcast
        def supp_side(b: pd.DataFrame) -> pd.DataFrame:
            key = b["s_suppkey"].to_numpy()
            return pd.DataFrame({
                "key": key,
                "o_orderkey": np.zeros(len(b), dtype="int64"),
                "rev_c": np.zeros(len(b), dtype="int64"),
                "nk": b["s_nationkey"].to_numpy(),
                "jb": (key % num_partitions).astype("int32"),
                "side": np.full(len(b), 1, dtype="int8")})

        both_a = (li.map_batches(li_partial, batch_format="pandas",
                                 batch_size=65536)
                  .union(supp_f.map_batches(supp_side,
                                            batch_format="pandas")))

        def join_a(group: pd.DataFrame) -> pd.DataFrame:
            s = group[group["side"] == 1][["key", "nk"]]
            l = group[group["side"] == 0]
            if s.empty or l.empty:
                return _empty()
            m = l[["key", "o_orderkey", "rev_c"]].merge(s, on="key")
            # re-key on orderkey for the final join; pre-group per
            # (order, supplier-nation)
            g = (m.groupby(["o_orderkey", "nk"], as_index=False)
                 .agg(rev_c=("rev_c", "sum"))
                 .rename(columns={"o_orderkey": "key"}))
            g["jb"] = (g["key"] % num_partitions).astype("int32")
            g["side"] = np.int8(0)
            return g[["key", "nk", "rev_c", "jb", "side"]]

        li_supp = both_a.groupby("jb").map_groups(join_a,
                                                  batch_format="pandas")

    # --- branch B: orders (date window) ⋈ customer, bucketed on
    # custkey — independent of branch A, shuffles concurrently --------
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        key = b["o_custkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key,
            "o_orderkey": b["o_orderkey"].to_numpy().astype("int64"),
            "rev_c": np.zeros(len(b), dtype="int64"),
            "nk": np.zeros(len(b), dtype="int64"),
            "jb": (key % num_partitions).astype("int32"),
            "side": np.full(len(b), 0, dtype="int8")})

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(nat_ref)
        b = b[b["c_nationkey"].isin(m)]
        key = b["c_custkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key,
            "o_orderkey": np.zeros(len(b), dtype="int64"),
            "rev_c": np.zeros(len(b), dtype="int64"),
            "nk": b["c_nationkey"].to_numpy().astype("int64"),
            "jb": (key % num_partitions).astype("int32"),
            "side": np.full(len(b), 1, dtype="int8")})

    both_b = (orders.map_batches(order_side, batch_format="pandas")
              .union(cust.map_batches(cust_side, batch_format="pandas")))

    def join_b(group: pd.DataFrame) -> pd.DataFrame:
        c = group[group["side"] == 1][["key", "nk"]]
        o = group[group["side"] == 0][["key", "o_orderkey"]]
        if c.empty or o.empty:
            return _empty()
        m = o.merge(c, on="key")
        # re-key on orderkey; carry the customer nation for the final
        # local-supplier equality
        g = pd.DataFrame({"key": m["o_orderkey"].to_numpy(),
                          "nk": m["nk"].to_numpy(),
                          "rev_c": np.zeros(len(m), dtype="int64")})
        g["jb"] = (g["key"] % num_partitions).astype("int32")
        g["side"] = np.int8(1)
        return g[["key", "nk", "rev_c", "jb", "side"]]

    ord_cust = both_b.groupby("jb").map_groups(join_b, batch_format="pandas")

    # --- final: ⋈ on orderkey with nk equality (local supplier) ------
    def join_final(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == 0][["key", "nk", "rev_c"]]
        r = group[group["side"] == 1][["key", "nk"]]
        if l.empty or r.empty:
            return pd.DataFrame({"nk": pd.Series(dtype="int64"),
                                 "rev_c": pd.Series(dtype="int64")})
        m = l.merge(r, on=["key", "nk"])
        return m.groupby("nk", as_index=False).agg(rev_c=("rev_c", "sum"))

    partials = (li_supp.union(ord_cust)
                .groupby("jb").map_groups(join_final, batch_format="pandas"))
    out = partials.to_pandas()  # ≤ num_partitions × |region nations| rows
    if out.empty:
        return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                             "revenue": pd.Series(dtype="float64")})
    g = out.groupby("nk", as_index=False).agg(rev_c=("rev_c", "sum"))
    g["n_name"] = g["nk"].map(names)
    g["revenue"] = g["rev_c"].astype("int64") / 100.0
    return (g.sort_values(["revenue", "n_name"],
                          ascending=[False, True], kind="stable")
            [["n_name", "revenue"]].reset_index(drop=True))


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n.n_name,
       SUM(x.rev_c)::BIGINT / 100.0 AS revenue
FROM (
  SELECT c.c_nationkey AS nk,
         CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
              AS BIGINT) AS rev_c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
                 AND s.s_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= DATE '1996-01-01'
    AND o.o_orderdate <  DATE '1997-01-01'
) x
JOIN nation n ON x.nk = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
"""

# ---------------------------------------------------------------------------
# TPC-H Q17 shape: per-part average threshold + join back, in ONE
# shuffle.  The trick: l_quantity is low-cardinality (integers 1..50),
# so the map side ships (partkey, quantity) -> (count, price_cents)
# partials — ≤50 rows per part per batch, never raw lineitem.  Inside
# the partkey bucket both the per-part average AND the qty < 0.2*avg
# row filter are computed from those partials, so there is no second
# pass over the fact table and no threshold broadcast.
# ---------------------------------------------------------------------------

def small_qty_revenue(sf_dir: str, brand: str = "Brand#23",
                      max_size: int = 15, factor: float = 0.2,
                      num_partitions: int = 64):
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        price_c = np.floor(b["l_extendedprice"].to_numpy() * 100.0
                           + 0.5).astype("int64")
        g = (pd.DataFrame({"key": b["l_partkey"].astype("int64"),
                           "qty": b["l_quantity"].to_numpy(),
                           "price_c": price_c})
             .groupby(["key", "qty"], as_index=False)
             .agg(cnt=("price_c", "size"), price_c=("price_c", "sum")))
        g["jb"] = (g["key"] % num_partitions).astype("int32")
        g["side"] = np.int8(0)
        return g[["key", "qty", "cnt", "price_c", "jb", "side"]]

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])

    def part_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["p_brand"] == brand) & (b["p_size"] <= max_size)]
        key = b["p_partkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key,
            "qty": np.zeros(len(b), dtype="float64"),
            "cnt": np.zeros(len(b), dtype="int64"),
            "price_c": np.zeros(len(b), dtype="int64"),
            "jb": (key % num_partitions).astype("int32"),
            "side": np.full(len(b), 1, dtype="int8")})

    both = (li.map_batches(li_partial, batch_format="pandas",
                           batch_size=65536)
            .union(part.map_batches(part_side, batch_format="pandas")))

    def bucket(group: pd.DataFrame) -> pd.DataFrame:
        keep = group.loc[group["side"] == 1, "key"].unique()
        l = group[group["side"] == 0]
        l = l[l["key"].isin(keep)]
        if l.empty:
            return pd.DataFrame({"price_c": pd.Series(dtype="int64")})
        # fold multi-batch partials per (part, qty), then per-part avg
        g = (l.groupby(["key", "qty"], as_index=False)
             .agg(cnt=("cnt", "sum"), price_c=("price_c", "sum")))
        per = g.assign(qty_sum=g["qty"] * g["cnt"]).groupby("key").agg(
            qty_sum=("qty_sum", "sum"), n=("cnt", "sum"))
        thresh = factor * (per["qty_sum"] / per["n"])  # float64, = SQL AVG
        small = g[g["qty"] < g["key"].map(thresh).to_numpy()]
        return pd.DataFrame({"price_c": [small["price_c"].sum()]},
                            dtype="int64")

    partials = both.groupby("jb").map_groups(bucket, batch_format="pandas")
    pdf = partials.to_pandas()  # ≤ P rows
    # empty Ray datasets lose their schema in to_pandas (zero columns)
    total_c = int(pdf["price_c"].sum()) if "price_c" in pdf.columns else 0
    return pd.DataFrame({"avg_yearly": [total_c / 100.0 / 7.0]})


SMALL_QTY_REVENUE_SQL = """
SELECT SUM(t.price_c)::BIGINT / 100.0 / 7.0 AS avg_yearly
FROM (
  SELECT l.l_partkey, l.l_quantity,
         CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_c
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#23' AND p.p_size <= 15
) t
WHERE t.l_quantity < (
  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = t.l_partkey
)
"""


# ---------------------------------------------------------------------------
# ROLLUP / grouping-sets aggregate: the finest grain (event_type, day)
# is aggregated distributed (map-side partials + one small groupby);
# the super-aggregate levels are re-aggregations of that small grain,
# so they cost nothing extra — the classic way to run GROUPING SETS
# without scanning the fact table once per level.  NULL group keys are
# encoded as sentinels ('ALL' / epoch) on BOTH sides so the driver's
# string-hash compare never sees engine-specific null spellings.
# ---------------------------------------------------------------------------

def events_rollup(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        val_c = np.floor(b["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        return (pd.DataFrame({"event_type": b["event_type"],
                              "day": b["ts"].dt.floor("D"),
                              "n": np.ones(len(b), dtype="int64"),
                              "val_c": val_c})
                .groupby(["event_type", "day"], as_index=False)
                .agg(n=("n", "sum"), val_c=("val_c", "sum")))

    from ray.data.aggregate import Sum

    fine = (ev.map_batches(partial, batch_format="pandas", batch_size=65536)
            .groupby(["event_type", "day"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("val_c", alias_name="val_c"))
            .to_pandas())  # |types| × |days| rows — dimension-sized
    epoch = pd.Timestamp("1970-01-01")
    if fine.empty or "n" not in fine.columns:
        # empty Ray datasets lose their schema in to_pandas; DuckDB's
        # ROLLUP over an empty table still emits the grand-total row
        # (COUNT 0, SUM NULL) — match it exactly
        return pd.DataFrame({"lvl": pd.Series([3], dtype="int64"),
                             "event_type": ["ALL"],
                             "day": pd.Series([epoch],
                                              dtype="datetime64[us]"),
                             "n": pd.Series([0], dtype="int64"),
                             "total": [float("nan")]})
    fine["n"] = fine["n"].astype("int64")
    fine["val_c"] = fine["val_c"].astype("int64")

    lvl0 = fine.assign(lvl=np.int64(0))
    lvl1 = (fine.groupby("event_type", as_index=False)
            .agg(n=("n", "sum"), val_c=("val_c", "sum"))
            .assign(day=epoch, lvl=np.int64(1)))
    lvl2 = pd.DataFrame({"event_type": ["ALL"], "day": [epoch],
                         "n": [fine["n"].sum()],
                         "val_c": [fine["val_c"].sum()], "lvl": [np.int64(3)]})
    out = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
    # concat of parquet-us and Timestamp-ns days upcasts to object;
    # pin the unit so str-rendering matches DuckDB's fetchdf (us)
    out["day"] = pd.to_datetime(out["day"]).astype("datetime64[us]")
    out["total"] = out["val_c"].astype("int64") / 100.0
    out = (out.sort_values(["lvl", "event_type", "day"], kind="stable")
           [["lvl", "event_type", "day", "n", "total"]]
           .reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out


EVENTS_ROLLUP_SQL = """
SELECT GROUPING(event_type, day) AS lvl,
       COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, TIMESTAMP '1970-01-01') AS day,
       COUNT(*) AS n,
       SUM(val_c)::BIGINT / 100.0 AS total
FROM (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS val_c
  FROM events
) GROUP BY ROLLUP(event_type, day)
ORDER BY lvl, event_type, day
"""


# ---------------------------------------------------------------------------
# PII / sensitive-term redaction: the curation scrub every training-data
# pipeline runs before tokenization.  Pure map — no shuffle, streams at
# any scale.  The pattern set is configuration: the defaults bundle the
# classic email/phone shapes plus a caller-supplied term list (the
# synthetic corpus contains no real PII, so the term entries are what
# exercise the path end-to-end).  Patterns are compiled ONCE at plan
# time and captured by the batch fn (fns are pickled per task, not per
# batch); replacement + counting are pandas vectorized str kernels.
# Pattern syntax is kept in the RE2-compatible subset (no backrefs, no
# lookaround) so the DuckDB oracle runs the IDENTICAL pattern — and the
# Python side compiles with re.ASCII because RE2's \w/\d/\b are
# ASCII-only (Python's default is Unicode: on 'tëst@ex.com' the two
# engines would otherwise split the match differently and ship PII
# half-redacted).
# ---------------------------------------------------------------------------

_PII_PATTERNS = (
    r"[\w.+-]+@[\w-]+\.[\w.-]+",        # email
    r"\+?\d{3}[- ]\d{3}[- ]\d{4}",      # phone (NNN-NNN-NNNN)
    r"\b(?:spark|customer)\b",           # term list (stand-in secrets)
)
_PII_COMBINED = "|".join(f"(?:{p})" for p in _PII_PATTERNS)


def pii_scrub(sf_dir: str, pattern: str = _PII_COMBINED,
              repl: str = "[PII]"):
    import re

    rx = re.compile(pattern, re.ASCII)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(b: pd.DataFrame) -> pd.DataFrame:
        txt = b["text"].fillna("")
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "redacted": txt.str.replace(rx, repl, regex=True),
            "n_redactions": txt.str.count(rx).astype("int64"),
        })

    return ds.map_batches(scrub, batch_format="pandas",
                          batch_size=8192).sort("doc_id")


PII_SCRUB_SQL = f"""
SELECT doc_id,
       regexp_replace(COALESCE(text, ''), '{_PII_COMBINED}', '[PII]', 'g')
           AS redacted,
       len(regexp_extract_all(COALESCE(text, ''), '{_PII_COMBINED}'))
           AS n_redactions
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join, fully distributed.  The lineitem
# side ships one row per distinct qualifying orderkey per batch (map-
# side dedup), the orders side ships (orderkey, priority) for the date
# window; both land on the shared orderkey bucket and the exists-check
# is a vectorized isin inside the group.  Per-bucket output is already
# aggregated to <= |priorities| rows, so the driver fold is bounded by
# num_partitions x 5.
# ---------------------------------------------------------------------------

def order_priority_exists(sf_dir: str, date_from: str = "1996-01-01",
                          date_to: str = "1997-01-01",
                          num_partitions: int = 64):
    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def li_keys(b: pd.DataFrame) -> pd.DataFrame:
        k = (b.loc[b["l_returnflag"] == "R", "l_orderkey"]
             .drop_duplicates().to_numpy().astype("int64"))
        return pd.DataFrame({
            "key": k,
            "prio": np.full(len(k), "", dtype=object),
            "jb": (k % num_partitions).astype("int32"),
            "side": np.full(len(k), 0, dtype="int8")})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def ord_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        k = b["o_orderkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": k,
            "prio": b["o_orderpriority"].to_numpy(),
            "jb": (k % num_partitions).astype("int32"),
            "side": np.full(len(k), 1, dtype="int8")})

    both = (li.map_batches(li_keys, batch_format="pandas",
                           batch_size=65536)
            .union(orders.map_batches(ord_side, batch_format="pandas")))

    def semi(group: pd.DataFrame) -> pd.DataFrame:
        keys = group.loc[group["side"] == 0, "key"]
        o = group[group["side"] == 1]
        o = o[o["key"].isin(keys)]
        if o.empty:
            return pd.DataFrame({
                "o_orderpriority": pd.Series(dtype="object"),
                "order_count": pd.Series(dtype="int64")})
        g = (o.groupby("prio", as_index=False)
             .agg(order_count=("key", "size"))
             .rename(columns={"prio": "o_orderpriority"}))
        g["order_count"] = g["order_count"].astype("int64")
        return g

    partials = both.groupby("jb").map_groups(semi, batch_format="pandas")
    out = partials.to_pandas()  # <= num_partitions x |priorities| rows
    if out.empty or "order_count" not in out.columns:
        return pd.DataFrame({"o_orderpriority": pd.Series(dtype="object"),
                             "order_count": pd.Series(dtype="int64")})
    g = (out.groupby("o_orderpriority", as_index=False)
         .agg(order_count=("order_count", "sum")))
    g["order_count"] = g["order_count"].astype("int64")
    return g.sort_values("o_orderpriority").reset_index(drop=True)


ORDER_PRIORITY_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate <  DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: LEFT OUTER join + count distribution.  Orders pre-
# aggregate per custkey map-side; the customer side ships bare keys.
# Inside the shared custkey bucket the left-join semantics (customers
# with zero orders) come from a vectorized map+fillna(0); each bucket
# emits its own (c_count -> custdist) histogram, so the final fold is
# tiny (order counts are small integers).
# ---------------------------------------------------------------------------

def customer_order_distribution(sf_dir: str, num_partitions: int = 64):
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def ord_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby("o_custkey", as_index=False)
             .agg(n=("o_custkey", "size")))
        k = g["o_custkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": k,
            "n": g["n"].to_numpy().astype("int64"),
            "jb": (k % num_partitions).astype("int32"),
            "side": np.full(len(k), 0, dtype="int8")})

    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        k = b["c_custkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": k,
            "n": np.zeros(len(k), dtype="int64"),
            "jb": (k % num_partitions).astype("int32"),
            "side": np.full(len(k), 1, dtype="int8")})

    both = (orders.map_batches(ord_partial, batch_format="pandas",
                               batch_size=65536)
            .union(cust.map_batches(cust_side, batch_format="pandas")))

    def dist(group: pd.DataFrame) -> pd.DataFrame:
        c = group.loc[group["side"] == 1, "key"]
        if c.empty:
            return pd.DataFrame({"c_count": pd.Series(dtype="int64"),
                                 "custdist": pd.Series(dtype="int64")})
        per = group[group["side"] == 0].groupby("key")["n"].sum()
        counts = c.map(per).fillna(0).astype("int64")
        vc = counts.value_counts()
        return pd.DataFrame({
            "c_count": vc.index.to_numpy().astype("int64"),
            "custdist": vc.to_numpy().astype("int64")})

    partials = both.groupby("jb").map_groups(dist, batch_format="pandas")
    out = partials.to_pandas()  # <= num_partitions x |distinct counts|
    if out.empty or "custdist" not in out.columns:
        return pd.DataFrame({"c_count": pd.Series(dtype="int64"),
                             "custdist": pd.Series(dtype="int64")})
    g = (out.groupby("c_count", as_index=False)
         .agg(custdist=("custdist", "sum")))
    g["c_count"] = g["c_count"].astype("int64")
    g["custdist"] = g["custdist"].astype("int64")
    return (g.sort_values(["custdist", "c_count"],
                          ascending=[False, False], kind="stable")
            .reset_index(drop=True))


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Semi-structured extraction: pull a typed field out of a JSON string
# column and aggregate it — the props/metadata-column pattern.  The
# extraction is ONE vectorized regex pass (pandas str.extract with a
# pre-compiled pattern); partials combine map-side so the groupby
# shuffle ships |types| rows per batch.  The oracle runs the identical
# RE2-compatible pattern through DuckDB's regexp_extract.
# ---------------------------------------------------------------------------

def events_profile(sf_dir: str, num_buckets: int = 64):
    """Column-level table profile of `events`: per column the row
    count, null count, and EXACT distinct count — the data-engine
    utility every ingestion run wants before curation decisions.

    One read pass; each batch emits kind-tagged partials in ONE frame:
    a tiny per-column (n_rows, n_nulls) count row, plus per-batch
    distinct (column, key) pairs whose key is an INJECTIVE string
    encoding (ints/timestamps verbatim, doubles as raw IEEE bits in
    hex with -0.0 normalized to 0.0 so SQL's 0.0 = -0.0 equality is
    mirrored, strings as themselves) — never a lossy hash, so bucket
    dedup is exact.  (column, key) pairs are wholly owned by their
    hash bucket; each bucket emits one partial distinct count per
    column and the driver folds <= num_buckets x n_cols integers.
    NULLs are excluded from distinct counts but NaN is a VALUE (SQL
    COUNT / COUNT(DISTINCT) semantics — hence Arrow batches below:
    pandas cannot tell a float NULL from NaN, and int64-with-NULL
    columns would coerce through float64 and collapse ids > 2^53)."""
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ds = _read(sf_dir, "events", columns=cols)

    # Arrow batches, deliberately: pandas float columns CANNOT tell a
    # SQL NULL from a NaN VALUE (both arrive as NaN — DuckDB counts
    # NaN in count()/count(DISTINCT)), and an int64 column holding
    # NULLs coerces to float64, collapsing values above 2^53.  Arrow
    # keeps validity bitmaps and exact int64 through drop_null.
    def partial(t) -> pd.DataFrame:
        import pyarrow.compute as pc

        out_col, out_key, out_rows, out_nulls, out_kind = [], [], [], [], []
        for c in cols:
            col = t.column(c)
            out_col.append(c)
            out_key.append("")
            out_rows.append(len(col))
            out_nulls.append(col.null_count)
            out_kind.append(1)
            v = col.drop_null().combine_chunks()
            if c == "value":
                a = v.to_numpy(zero_copy_only=False) + 0.0  # -0.0 -> 0.0
                keys = np.unique(a.view(np.uint64))  # NaN = one bit pattern
                ks = [format(x, "016x") for x in keys]
            elif c == "ts":
                ks = np.unique(v.to_numpy(zero_copy_only=False)
                               .view(np.int64)).astype(str)
            elif c in ("event_type", "props"):
                ks = pc.unique(v).to_pylist()
            else:
                ks = np.unique(v.to_numpy(zero_copy_only=False)
                               .astype(np.int64)).astype(str)
            out_col.extend([c] * len(ks))
            out_key.extend(ks)
            out_rows.extend([0] * len(ks))
            out_nulls.extend([0] * len(ks))
            out_kind.extend([0] * len(ks))
        out = pd.DataFrame({"col": out_col, "key": out_key,
                            "n_rows": np.asarray(out_rows, np.int64),
                            "n_nulls": np.asarray(out_nulls, np.int64),
                            "kind": np.asarray(out_kind, np.int8)})
        from ..stages.keys import hash64, nul_join

        hb = hash64(nul_join(out["col"], out["key"]))
        out["vb"] = np.where(out["kind"] == 1, -1,
                             (hb % num_buckets).astype(np.int64)
                             ).astype("int32")
        return out

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        if int(g["vb"].iloc[0]) == -1:  # the count rows ride bucket -1
            m = g.groupby("col", as_index=False)[["n_rows", "n_nulls"]].sum()
            m["n_distinct"] = np.int64(0)
            m["kind"] = np.int8(1)
            return m[["col", "n_rows", "n_nulls", "n_distinct", "kind"]]
        d = g.drop_duplicates(subset=["col", "key"])
        m = d.groupby("col", as_index=False).agg(
            n_distinct=("key", "size"))
        m["n_rows"] = np.int64(0)
        m["n_nulls"] = np.int64(0)
        m["n_distinct"] = m["n_distinct"].astype("int64")
        m["kind"] = np.int8(0)
        return m[["col", "n_rows", "n_nulls", "n_distinct", "kind"]]

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=131072)
             .groupby("vb").map_groups(bucket_fold, batch_format="pandas"))
    df = _fold_pd(parts, pd.DataFrame({
        "col": pd.Series(dtype="object"),
        "n_rows": pd.Series(dtype="int64"),
        "n_nulls": pd.Series(dtype="int64"),
        "n_distinct": pd.Series(dtype="int64"),
        "kind": pd.Series(dtype="int8")}))
    if df.empty:
        return pd.DataFrame({"column": pd.Series(dtype="object"),
                             "n_rows": pd.Series(dtype="int64"),
                             "n_nulls": pd.Series(dtype="int64"),
                             "n_distinct": pd.Series(dtype="int64")})
    out = df.groupby("col", as_index=False)[
        ["n_rows", "n_nulls", "n_distinct"]].sum()
    out = out.rename(columns={"col": "column"})
    for c in ("n_rows", "n_nulls", "n_distinct"):
        out[c] = out[c].astype("int64")
    return out.sort_values("column").reset_index(drop=True)


EVENTS_PROFILE_SQL = """
SELECT * FROM (
  SELECT 'event_id' AS "column", count(*)::BIGINT AS n_rows,
         (count(*) - count(event_id))::BIGINT AS n_nulls,
         count(DISTINCT event_id)::BIGINT AS n_distinct FROM events
  UNION ALL
  SELECT 'ts', count(*)::BIGINT, (count(*) - count(ts))::BIGINT,
         count(DISTINCT ts)::BIGINT FROM events
  UNION ALL
  SELECT 'user_id', count(*)::BIGINT, (count(*) - count(user_id))::BIGINT,
         count(DISTINCT user_id)::BIGINT FROM events
  UNION ALL
  SELECT 'event_type', count(*)::BIGINT,
         (count(*) - count(event_type))::BIGINT,
         count(DISTINCT event_type)::BIGINT FROM events
  UNION ALL
  SELECT 'value', count(*)::BIGINT, (count(*) - count(value))::BIGINT,
         count(DISTINCT value)::BIGINT FROM events
  UNION ALL
  SELECT 'props', count(*)::BIGINT, (count(*) - count(props))::BIGINT,
         count(DISTINCT props)::BIGINT FROM events
) ORDER BY "column"
"""


def event_props_agg(sf_dir: str):
    import re

    rx = re.compile(r'"k":\s*(-?\d+)')
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(b["props"].str.extract(rx, expand=False),
                          errors="coerce")
        t = pd.DataFrame({"event_type": b["event_type"],
                          "k": k.fillna(0).astype("int64")})
        g = (t.groupby("event_type", as_index=False)
             .agg(n_events=("k", "size"), sum_k=("k", "sum")))
        g["n_events"] = g["n_events"].astype("int64")
        return g

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pandas",
                          batch_size=65536)
           .groupby("event_type")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("sum_k", alias_name="sum_k")))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["n_events"] = b["n_events"].astype("int64")
        b["sum_k"] = b["sum_k"].astype("int64")
        return b

    return out.map_batches(finish,
                           batch_format="pandas").sort("event_type")


EVENT_PROPS_AGG_SQL = r"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(COALESCE(NULLIF(regexp_extract(props,
                '"k":\s*(-?\d+)', 1), ''), '0') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Deterministic dataset splitting — the train/val assignment every
# training pipeline needs to be REPRODUCIBLE and RESUMABLE: membership
# is a pure function of the key (Knuth multiplicative hash), so any
# re-run, any partition order, any cluster size yields the identical
# split, and a new shard of data can be assigned without touching old
# shards.  The hash is kept in the int64-safe range in BOTH engines:
# (doc_id % 2^31) * 2654435761 < 2^63, so numpy int64 and DuckDB
# BIGINT compute the identical value for every possible doc_id.
# Negative doc_ids: numpy's % is floored (always non-negative) while
# DuckDB's is truncated (sign of the dividend), so both engines run
# the sign-normalizing ((x % m) + m) % m form — identical results on
# the full int64 domain, a no-op on non-negative ids.
# ---------------------------------------------------------------------------

_SPLIT_HASH_SQL = ("((((doc_id % 2147483648) + 2147483648) % 2147483648)"
                   " * 2654435761) % 4294967296")


def _split_hash(doc_id: np.ndarray) -> np.ndarray:
    m = 2147483648
    return ((((doc_id.astype("int64") % m) + m) % m)
            * 2654435761) % 4294967296


def train_val_split(sf_dir: str, val_mod: int = 10):
    """Pure map — streams at any scale, no shuffle (the sort is the
    driver-contract presentation order only)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        h = _split_hash(b["doc_id"].to_numpy())
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "lang": b["lang"],
            "split": np.where(h % val_mod == 0, "val", "train")})

    return ds.map_batches(assign, batch_format="pandas").sort("doc_id")


TRAIN_VAL_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN {_SPLIT_HASH_SQL} % 10 = 0 THEN 'val' ELSE 'train' END
           AS split
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Stratified EXACT-quota sampling: ceil(rate * |stratum|) rows per
# stratum, deterministically — the n smallest key-hashes of each
# stratum.  Selecting "the n smallest of 10^12 hashes" without a
# global sort is an order-statistic problem, so this reuses the shared
# keyed histogram descent (grouped_exact_percentiles): the per-stratum
# quota rank IS the rate-quantile rank (max(1, ceil(rate*n))), the
# descent finds each stratum's threshold hash in O(log) full-data
# passes, and ONE final vectorized filter pass emits the sample.
# Hash ties at the threshold (possible at billions of rows under a
# 32-bit hash) are broken by smallest doc_id; the tie set is collected
# explicitly and is at most |strata| hash-collision groups.
# ---------------------------------------------------------------------------

_NULL_STRATUM = "\x00<null>"  # \x00 cannot occur in a real lang code


def stratified_sample(sf_dir: str, rate: float = 0.2,
                      group_col: str = "lang"):
    import ray
    import ray.data as rd

    ds = _read(sf_dir, "documents", columns=["doc_id", group_col])

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            # NULL strata sample like any other partition (DuckDB's
            # PARTITION BY puts NULLs in their own window); the
            # sentinel survives the descent's factorize (which drops
            # NaN groups) and is mapped back to NULL on output
            "g": b[group_col].fillna(_NULL_STRATUM),
            # float64 holds 2^32 exactly; the descent runs on floats
            "h": _split_hash(b["doc_id"].to_numpy()).astype("float64")})

    # materialized: the descent + the tie pass + the final filter all
    # re-read this projection (3 narrow columns, not the text)
    hds = ds.map_batches(add_hash, batch_format="pandas").materialize()

    thr = grouped_exact_percentiles(hds, "h", qs=(rate,), group_col="g")
    if thr.empty:
        # same Dataset contract shape as the non-empty path; typed
        # arrow arrays so the schema survives the empty conversion
        import pyarrow as pa
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            group_col: pa.array([], pa.string())}))
    # threshold hash per stratum (value at the quota rank)
    hstar = {r["group"]: r["value"] for _, r in thr.iterrows()}
    hstar_ref = ray.put(hstar)

    # one pass: per stratum, count rows (n), count h < h* (strict
    # keeps) and collect the doc_ids AT the threshold (tie candidates
    # — tiny: only hash collisions at one specific value can exceed
    # one row).  n rides along so no separate counting pass is needed.
    def tie_partial(b: pd.DataFrame) -> pd.DataFrame:
        hs = ray.get(hstar_ref)
        if len(b) == 0:
            return pd.DataFrame({"g": pd.Series(dtype="object"),
                                 "strict": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "tie_doc": pd.Series(dtype="int64")})
        t = b["g"].map(hs).to_numpy(dtype="float64", na_value=np.nan)
        h = b["h"].to_numpy()
        agg = (pd.DataFrame({"g": b["g"], "lt": (h < t).astype("int64")})
               .groupby("g")["lt"].agg(strict="sum", n="size")
               .reset_index())
        agg["tie_doc"] = np.int64(-1)
        ties = b.loc[h == t, ["g", "doc_id"]].rename(
            columns={"doc_id": "tie_doc"})
        ties["strict"] = np.int64(0)
        ties["n"] = np.int64(0)
        return pd.concat([agg, ties[["g", "strict", "n", "tie_doc"]]],
                         ignore_index=True)

    tp = hds.map_batches(tie_partial, batch_format="pandas").to_pandas()
    n_by_g = tp.groupby("g")["n"].sum()

    import math
    keep_ties: set[int] = set()
    for g, hv in hstar.items():
        quota = max(1, math.ceil(rate * int(n_by_g.get(g, 0))))
        sub = tp[tp["g"] == g]
        strict = int(sub["strict"].sum())
        ties = sorted(sub.loc[sub["tie_doc"] >= 0, "tie_doc"])
        keep_ties.update(ties[:max(0, quota - strict)])
    ties_ref = ray.put(keep_ties)

    def final_filter(b: pd.DataFrame) -> pd.DataFrame:
        hs = ray.get(hstar_ref)
        tk = ray.get(ties_ref)
        t = b["g"].map(hs).to_numpy(dtype="float64", na_value=np.nan)
        h = b["h"].to_numpy()
        keep = (h < t) | b["doc_id"].isin(tk).to_numpy()
        out = b.loc[keep, ["doc_id", "g"]].rename(columns={"g": group_col})
        out["doc_id"] = out["doc_id"].astype("int64")
        out[group_col] = out[group_col].replace(_NULL_STRATUM, None)
        return out

    return (hds.map_batches(final_filter, batch_format="pandas")
            .sort("doc_id"))


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {_SPLIT_HASH_SQL}, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
WHERE rn <= CEIL(0.2 * n)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue share over a big-big partkey join.
# Both sides are fact-scaled (part is 200k x SF), so neither is
# broadcast: lineitem pre-aggregates revenue per partkey map-side
# (one partial row per (batch, partkey)), part ships (partkey,
# is_promo), both land on the shared partkey bucket, and each bucket
# emits exactly one (promo_c, total_c) pair — the driver folds
# num_partitions rows into two int64 cents sums.  The percentage is
# ONE float division at the very end, identical in numpy and DuckDB.
# ---------------------------------------------------------------------------

def promo_revenue(sf_dir: str, date_from: str = "1996-01-01",
                  date_to: str = "1996-02-01",
                  num_partitions: int = 64):
    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        rev = np.floor(b["l_extendedprice"].to_numpy()
                       * (1.0 - b["l_discount"].to_numpy()) * 100.0
                       + 0.5).astype("int64")
        g = (pd.DataFrame({"key": b["l_partkey"].to_numpy()
                           .astype("int64"), "rev_c": rev})
             .groupby("key", as_index=False).agg(rev_c=("rev_c", "sum")))
        g["promo"] = np.int8(-1)  # lineitem marker
        g["jb"] = (g["key"] % num_partitions).astype("int32")
        return g[["key", "rev_c", "promo", "jb"]]

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def part_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["p_partkey"].to_numpy().astype("int64"),
            "rev_c": np.zeros(len(b), dtype="int64"),
            "promo": b["p_type"].str.startswith("PROMO")
                       .to_numpy().astype("int8"),
            "jb": (b["p_partkey"].to_numpy().astype("int64")
                   % num_partitions).astype("int32")})

    both = (li.map_batches(li_partial, batch_format="pandas",
                           batch_size=65536)
            .union(part.map_batches(part_side, batch_format="pandas")))

    def bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["promo"] < 0]
        r = group[group["promo"] >= 0][["key", "promo"]]
        if l.empty or r.empty:
            return pd.DataFrame({"promo_c": pd.Series(dtype="int64"),
                                 "total_c": pd.Series(dtype="int64")})
        m = (l.groupby("key", as_index=False).agg(rev_c=("rev_c", "sum"))
             .merge(r, on="key"))
        return pd.DataFrame({
            "promo_c": [int(m.loc[m["promo"] == 1, "rev_c"].sum())],
            "total_c": [int(m["rev_c"].sum())]})

    parts = (both.groupby("jb").map_groups(bucket, batch_format="pandas")
             .to_pandas())
    # all-empty bucket output loses its columns in to_pandas (Ray quirk)
    promo_c = int(parts["promo_c"].sum()) if "promo_c" in parts else 0
    total_c = int(parts["total_c"].sum()) if "total_c" in parts else 0
    pct = (100.0 * promo_c / total_c) if total_c else float("nan")
    return pd.DataFrame({"promo_revenue_pct": [pct]})


PROMO_REVENUE_SQL = """
SELECT 100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN rev_c ELSE 0 END)
           / SUM(rev_c) AS promo_revenue_pct
FROM (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
             AS BIGINT)) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-02-01'
  GROUP BY l_partkey
) JOIN part ON l_partkey = p_partkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: global-scalar subquery + bucketed count-join.  The
# average balance is a two-int64 partial fold (sum_c, n) — no data
# movement; the candidate filter is applied map-side against the
# broadcast scalar; order counts arrive as per-batch custkey partials
# on the shared custkey bucket (never raw orders rows).  "Inactive" is
# <= max_orders rather than zero so the synthetic corpus (every
# customer has orders) still exercises the join arm.
# ---------------------------------------------------------------------------

def above_avg_low_activity(sf_dir: str, max_orders: int = 2,
                           num_partitions: int = 64):
    import ray

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_acctbal", "c_mktsegment"])

    # pass 1: global average of positive balances (cents-exact partials)
    def bal_partial(b: pd.DataFrame) -> pd.DataFrame:
        pos = b.loc[b["c_acctbal"] > 0.0, "c_acctbal"].to_numpy()
        c = np.floor(pos * 100.0 + 0.5).astype("int64")
        return pd.DataFrame({"s": [int(c.sum())], "n": [len(c)]})

    bp = cust.map_batches(bal_partial, batch_format="pandas").to_pandas()
    n_pos = int(bp["n"].sum())
    if n_pos == 0:
        return pd.DataFrame({"c_mktsegment": pd.Series(dtype="object"),
                             "n_customers": pd.Series(dtype="int64"),
                             "total_acctbal": pd.Series(dtype="float64")})
    # "above average" is an exact RATIONAL comparison in integer
    # cents on both engines: bal_c * n > sum_c (int64; cents ~1e6 x
    # corpus-scale n ~1e9 stays < 2^63) — a float AVG() boundary can
    # flip in the last ulp between engines on adversarial balances
    sum_c = int(bp["s"].sum())

    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        bal_c = np.floor(b["c_acctbal"].to_numpy() * 100.0 + 0.5) \
            .astype("int64")
        keep = bal_c * n_pos > sum_c
        b, bal_c = b[keep], bal_c[keep]
        return pd.DataFrame({
            "key": b["c_custkey"].to_numpy().astype("int64"),
            "seg": b["c_mktsegment"],
            "bal_c": bal_c,
            "cnt": np.zeros(len(b), dtype="int64"),
            "side": np.full(len(b), 1, dtype="int8"),
            "jb": (b["c_custkey"].to_numpy().astype("int64")
                   % num_partitions).astype("int32")})

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def ord_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"key": b["o_custkey"].to_numpy()
                           .astype("int64")})
             .groupby("key", as_index=False).size()
             .rename(columns={"size": "cnt"}))
        g["seg"] = ""
        g["bal_c"] = np.int64(0)
        g["side"] = np.int8(0)
        g["jb"] = (g["key"] % num_partitions).astype("int32")
        return g[["key", "seg", "bal_c", "cnt", "side", "jb"]]

    both = (cust.map_batches(cust_side, batch_format="pandas")
            .union(orders.map_batches(ord_partial, batch_format="pandas",
                                      batch_size=65536)))

    def bucket(group: pd.DataFrame) -> pd.DataFrame:
        c = group[group["side"] == 1]
        if c.empty:
            return pd.DataFrame({"c_mktsegment": pd.Series(dtype="object"),
                                 "n_customers": pd.Series(dtype="int64"),
                                 "bal_c": pd.Series(dtype="int64")})
        o = (group[group["side"] == 0].groupby("key")["cnt"].sum())
        n_ord = c["key"].map(o).fillna(0).astype("int64")
        keep = c[n_ord.to_numpy() <= max_orders]
        return (keep.groupby("seg", as_index=False)
                .agg(n_customers=("key", "size"), bal_c=("bal_c", "sum"))
                .rename(columns={"seg": "c_mktsegment"}))

    parts = (both.groupby("jb").map_groups(bucket, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby("c_mktsegment", as_index=False)
           .agg(n_customers=("n_customers", "sum"), bal_c=("bal_c", "sum")))
    out["n_customers"] = out["n_customers"].astype("int64")
    out["total_acctbal"] = out["bal_c"].astype("int64") / 100.0
    return (out[["c_mktsegment", "n_customers", "total_acctbal"]]
            .sort_values("c_mktsegment").reset_index(drop=True))


ABOVE_AVG_LOW_ACTIVITY_SQL = """
WITH stats AS (
  SELECT SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) / 100.0
           AS total_acctbal
FROM customer c, stats
WHERE CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) * stats.n > stats.s
  AND (SELECT COUNT(*) FROM orders o
       WHERE o.o_custkey = c.c_custkey) <= 2
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Token-repetition quality score (type-token ratio): the classic
# Gopher-style repetitiousness signal for corpus filtering.  Pure map —
# tokens explode inside the batch (docs never span blocks), distinct
# counting is a vectorized groupby-nunique, nothing shuffles.  Token
# semantics are pinned to DuckDB's string_split(text, ' ') exactly
# (single-space split; '' yields [''], so an empty doc has 1 token,
# 1 distinct, repetition 0.0).
# ---------------------------------------------------------------------------

def doc_repetition(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def rep(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split(" ")
        ex = (pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                            "tok": toks}).explode("tok"))
        g = ex.groupby("doc_id")["tok"].agg(n_tokens="size",
                                            n_distinct="nunique")
        g = g.reset_index()
        g["n_tokens"] = g["n_tokens"].astype("int64")
        g["n_distinct"] = g["n_distinct"].astype("int64")
        g["repetition"] = 1.0 - g["n_distinct"] / g["n_tokens"]
        return g

    return ds.map_batches(rep, batch_format="pandas").sort("doc_id")


DOC_REPETITION_SQL = """
SELECT doc_id,
       len(string_split(COALESCE(text, ''), ' ')) AS n_tokens,
       len(list_distinct(string_split(COALESCE(text, ''), ' ')))
           AS n_distinct,
       1.0 - len(list_distinct(string_split(COALESCE(text, ''), ' ')))
           / len(string_split(COALESCE(text, ''), ' ')) AS repetition
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Keyword search: top-k docs by how many distinct query terms they
# contain (token membership, not substring).  Distributed shape: one
# map pass — explode tokens inside the batch, isin against the tiny
# query set, per-batch partial top-k under the total order
# (score DESC, doc_id ASC) — then the driver merges <= blocks x k
# rows.  The corpus never shuffles; the query set ships in the task
# closure.
# ---------------------------------------------------------------------------

_SEARCH_TERMS = ("spark", "merge", "window")


def keyword_search(sf_dir: str, terms: tuple = _SEARCH_TERMS,
                   k: int = 15):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tset = list(terms)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split(" ")
        ex = (pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                            "tok": toks}).explode("tok"))
        ex = ex[ex["tok"].isin(tset)].drop_duplicates()
        g = (ex.groupby("doc_id").size().rename("score").reset_index())
        g["score"] = g["score"].astype("int64")
        return (g.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(k))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (parts.sort_values(["score", "doc_id"],
                              ascending=[False, True])
            .head(k).reset_index(drop=True))


def phrase_search(sf_dir: str, phrase: tuple = ("part", "filter")):
    """Exact-phrase (adjacent-token) search: docs containing the query
    tokens at consecutive positions, with occurrence counts — the
    positional complement of `keyword_search` (bag-of-words) and
    `search_index` (docs-level postings).

    Scale shape: adjacency is a PER-DOCUMENT property, so the whole
    operator is one map pass — explode tokens with per-doc positions,
    match each query token, join pos == pos+1 within the batch, emit
    at most |hits| rows; NO shuffle, no index, nothing corpus-sized
    anywhere.  All-integer output."""
    a, b = phrase
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "n_occ": pd.Series(dtype="int64")})

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split(" ")
        ex = pd.DataFrame({"doc_id": batch["doc_id"].astype("int64").values,
                           "tok": toks.values},
                          index=batch.index).explode("tok")
        ex["pos"] = ex.groupby(level=0).cumcount()
        m1 = ex.loc[ex["tok"] == a, ["doc_id", "pos"]]
        m2 = ex.loc[ex["tok"] == b, ["doc_id", "pos"]]
        if m1.empty or m2.empty:
            return empty.copy()
        m2 = m2.assign(pos=m2["pos"] - 1)
        hit = m1.merge(m2, on=["doc_id", "pos"])
        if hit.empty:
            return empty.copy()
        g = hit.groupby("doc_id", as_index=False).size().rename(
            columns={"size": "n_occ"})
        g["n_occ"] = g["n_occ"].astype("int64")
        return g

    out = _fold_pd(ds.map_batches(partial, batch_format="pandas"), empty)
    if out.empty:
        return empty
    # doc_ids are globally unique, so per-batch counts ARE final counts
    return out.sort_values("doc_id").reset_index(drop=True)


PHRASE_SEARCH_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(coalesce(text, ''), ' ')) AS tok,
         generate_subscripts(string_split(coalesce(text, ''), ' '), 1)
           AS pos
  FROM documents
)
SELECT a.doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_occ
FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
WHERE a.tok = 'part' AND b.tok = 'filter'
GROUP BY 1 ORDER BY doc_id
"""


KEYWORD_SEARCH_SQL = f"""
SELECT doc_id, score FROM (
  SELECT doc_id,
         (CASE WHEN list_contains(string_split(COALESCE(text,''), ' '),
                                  '{_SEARCH_TERMS[0]}')
               THEN 1 ELSE 0 END
        + CASE WHEN list_contains(string_split(COALESCE(text,''), ' '),
                                  '{_SEARCH_TERMS[1]}')
               THEN 1 ELSE 0 END
        + CASE WHEN list_contains(string_split(COALESCE(text,''), ' '),
                                  '{_SEARCH_TERMS[2]}')
               THEN 1 ELSE 0 END)::BIGINT AS score
  FROM documents
) WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT 15
"""


# ---------------------------------------------------------------------------
# TF-IDF retrieval over the corpus, two passes:
#   pass 1 (corpus stats): per-batch partials for N (doc count) and
#     df_t (docs containing each query term) — doc_ids are globally
#     unique, so per-batch membership counts sum exactly; the driver
#     folds |terms|+1 integers.
#   pass 2 (score + top-k): tf_t per doc via one explode/groupby,
#     score = sum_t tf_t * (N / df_t) folded in FIXED term order so the
#     float result is bit-identical to the SQL expression (IEEE ops in
#     a fixed order); per-batch partial top-k, driver merges.
# The linear idf (N/df, no log) keeps the oracle transcendental-free —
# libm log() is not guaranteed bit-identical across engines.
# ---------------------------------------------------------------------------

def tfidf_search(sf_dir: str, terms: tuple = _SEARCH_TERMS, k: int = 15):
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text"]).materialize()
    tset = list(terms)

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split(" ")
        ex = (pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                            "tok": toks}).explode("tok"))
        ex = ex[ex["tok"].isin(tset)].drop_duplicates()
        cnt = ex.groupby("tok").size()
        return pd.DataFrame({
            "n": [len(b)],
            **{f"df{i}": [int(cnt.get(t, 0))]
               for i, t in enumerate(tset)}})

    stats = (ds.map_batches(df_partial, batch_format="pandas")
             .to_pandas().sum())
    n_docs = int(stats["n"])
    dfs = [int(stats[f"df{i}"]) for i in range(len(tset))]

    def score_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split(" ")
        ex = (pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                            "tok": toks}).explode("tok"))
        ex = ex[ex["tok"].isin(tset)]
        tf = (ex.groupby(["doc_id", "tok"]).size().unstack(fill_value=0)
              .reindex(columns=tset, fill_value=0))
        score = np.zeros(len(tf), dtype="float64")
        for i, t in enumerate(tset):  # fixed fold order == SQL order
            if dfs[i] > 0:
                score = score + tf[t].to_numpy() * (n_docs / dfs[i])
        out = pd.DataFrame({"doc_id": tf.index.to_numpy(),
                            "score": score})
        out = out[out["score"] > 0.0]
        return (out.sort_values(["score", "doc_id"],
                                ascending=[False, True]).head(k))

    parts = ds.map_batches(score_partial,
                           batch_format="pandas").to_pandas()
    return (parts.sort_values(["score", "doc_id"],
                              ascending=[False, True])
            .head(k).reset_index(drop=True))


_TFIDF_TF = ("len(list_filter(string_split(COALESCE(text,''), ' '), "
             "x -> x = '{t}'))")
_TFIDF_DF = ("(SELECT COUNT(*) FROM documents WHERE "
             "list_contains(string_split(COALESCE(text,''), ' '), '{t}'))")

TFIDF_SEARCH_SQL = f"""
SELECT doc_id, score FROM (
  SELECT doc_id,
         (CASE WHEN {_TFIDF_DF.format(t=_SEARCH_TERMS[0])} = 0 THEN 0.0
               ELSE {_TFIDF_TF.format(t=_SEARCH_TERMS[0])}
                    * ((SELECT COUNT(*) FROM documents)
                       / {_TFIDF_DF.format(t=_SEARCH_TERMS[0])}) END
        + CASE WHEN {_TFIDF_DF.format(t=_SEARCH_TERMS[1])} = 0 THEN 0.0
               ELSE {_TFIDF_TF.format(t=_SEARCH_TERMS[1])}
                    * ((SELECT COUNT(*) FROM documents)
                       / {_TFIDF_DF.format(t=_SEARCH_TERMS[1])}) END
        + CASE WHEN {_TFIDF_DF.format(t=_SEARCH_TERMS[2])} = 0 THEN 0.0
               ELSE {_TFIDF_TF.format(t=_SEARCH_TERMS[2])}
                    * ((SELECT COUNT(*) FROM documents)
                       / {_TFIDF_DF.format(t=_SEARCH_TERMS[2])}) END)
           AS score
  FROM documents
) WHERE score > 0.0
ORDER BY score DESC, doc_id
LIMIT 15
"""


# ---------------------------------------------------------------------------
# Q6-style forecast revenue: pure filter + global sum.  The cheapest
# possible distributed shape — predicate pushed into the batch kernel,
# one partial row per batch crosses to the driver (no shuffle at all).
# ---------------------------------------------------------------------------

def revenue_forecast(sf_dir: str, date_from: str = "1996-01-01",
                     date_to: str = "1997-01-01",
                     disc_lo: float = 0.05, disc_hi: float = 0.07,
                     qty_max: float = 24.0):
    """TPC-H Q6 shape: SUM(extendedprice * discount) under a
    conjunctive filter.  Exact-cent arithmetic (floor(x*100+0.5)) so
    the float sum is order-independent and hash-stable vs the oracle."""
    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    li = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = ((b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
             & (b["l_discount"] >= disc_lo) & (b["l_discount"] <= disc_hi)
             & (b["l_quantity"] < qty_max))
        sel = b[m]
        rev_c = np.floor(
            sel["l_extendedprice"] * sel["l_discount"] * 100.0 + 0.5
        ).astype("int64")
        return pd.DataFrame({"rev_c": [int(rev_c.sum())],
                             "n_items": [int(m.sum())]})

    parts = li.map_batches(partial, batch_format="pandas",
                           batch_size=131072).to_pandas()  # 1 row/batch
    return pd.DataFrame({
        "revenue": [parts["rev_c"].sum() / 100.0],
        "n_items": [int(parts["n_items"].sum())]})


REVENUE_FORECAST_SQL = """
SELECT SUM(CAST(FLOOR(l_extendedprice * l_discount * 100.0 + 0.5)
                AS BIGINT))::BIGINT / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q10-style returned-item report: two chained big-big bucket joins
# (lineitem⋈orders on orderkey, then ⋈customer on custkey), nation
# broadcast, per-bucket partial top-k — no fact-sized broadcast and
# the driver only ever sees <= num_partitions * k candidate rows.
# ---------------------------------------------------------------------------

def returned_top_customers(sf_dir: str, date_from: str = "1996-10-01",
                           date_to: str = "1997-01-01", k: int = 20,
                           num_partitions: int = 64):
    import ray

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)

    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    nation_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    # -- join 1: returned lineitems ⋈ date-filtered orders, on orderkey
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"])

    def li_pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_returnflag"] == "R"]
        b = b.assign(rev_c=np.floor(
            b["l_extendedprice"] * (1 - b["l_discount"]) * 100.0 + 0.5
        ).astype("int64"))
        g = b.groupby("l_orderkey", as_index=False).agg(rev_c=("rev_c", "sum"))
        # identical-columns union (repo idiom): custkey slot empty here
        g["o_custkey"] = np.int64(-1)
        g["jb"] = (g["l_orderkey"] % num_partitions).astype("int32")
        g["side"] = 0
        return g[["l_orderkey", "rev_c", "o_custkey", "jb", "side"]]

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        ok = b["o_orderkey"].to_numpy().astype("int64")
        n = len(b)
        return pd.DataFrame({
            "l_orderkey": ok,
            "rev_c": np.zeros(n, dtype="int64"),
            "o_custkey": b["o_custkey"].to_numpy().astype("int64"),
            "jb": (ok % num_partitions).astype("int32"),
            "side": np.full(n, 1, dtype="int64")})

    both = (li.map_batches(li_pre, batch_format="pandas", batch_size=65536)
            .union(orders.map_batches(ord_pre, batch_format="pandas",
                                      batch_size=65536)))

    def join1(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == 0]
        r = (group[group["side"] == 1][["l_orderkey", "o_custkey"]]
             .rename(columns={"l_orderkey": "o_orderkey"}))
        empty = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                              "rev_c": pd.Series(dtype="int64")})
        if l.empty or r.empty:
            return empty
        per_order = (l.groupby("l_orderkey", as_index=False)
                     .agg(rev_c=("rev_c", "sum")))
        m = per_order.merge(r, left_on="l_orderkey", right_on="o_orderkey")
        if m.empty:
            return empty
        # partial per custkey: one row per (orderkey-bucket, custkey).
        # Explicit int64 casts: the union pads the absent side's columns
        # with NaN, silently floating the dtypes per group, and Ray would
        # then see conflicting block schemas across buckets.
        g = (m.groupby("o_custkey", as_index=False)
             .agg(rev_c=("rev_c", "sum")))
        return g.astype({"o_custkey": "int64", "rev_c": "int64"})

    partials = both.groupby("jb").map_groups(join1, batch_format="pandas")

    # -- join 2: custkey partials ⋈ customer, on custkey; top-k/bucket
    _j2cols = ["o_custkey", "rev_c", "c_name", "c_acctbal", "n_name",
               "cb", "side"]

    def part_tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # identical-columns union: customer payload slots empty here
        b["c_name"] = ""
        b["c_acctbal"] = 0.0
        b["n_name"] = ""
        b["cb"] = (b["o_custkey"] % num_partitions).astype("int32")
        b["side"] = 0
        return b[_j2cols]

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"])

    def cust_tag(b: pd.DataFrame) -> pd.DataFrame:
        # plain task (not an actor pool): the broadcast nation map is
        # dimension-sized, so per-task ray.get is cheap and we skip the
        # ~1s actor-pool startup a trivial-state stage doesn't earn
        b = b.assign(n_name=b["c_nationkey"].map(ray.get(nation_ref)),
                     cb=(b["c_custkey"] % num_partitions).astype("int32"),
                     side=1)
        out = b.rename(columns={"c_custkey": "o_custkey"})
        out["rev_c"] = np.int64(0)
        return out[_j2cols]

    both2 = (partials.map_batches(part_tag, batch_format="pandas")
             .union(cust.map_batches(cust_tag, batch_format="pandas")))

    def join2(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == 0]
        r = group[group["side"] == 1]
        empty = pd.DataFrame({
            "c_custkey": pd.Series(dtype="int64"),
            "c_name": pd.Series(dtype="object"),
            "revenue": pd.Series(dtype="float64"),
            "c_acctbal": pd.Series(dtype="float64"),
            "n_name": pd.Series(dtype="object")})
        if l.empty or r.empty:
            return empty
        per_cust = (l.groupby("o_custkey", as_index=False)
                    .agg(rev_c=("rev_c", "sum")))  # custkey co-located: final
        r = (r[["o_custkey", "c_name", "c_acctbal", "n_name"]]
             .rename(columns={"o_custkey": "c_custkey"}))
        m = per_cust.merge(r, left_on="o_custkey", right_on="c_custkey")
        if m.empty:
            return empty
        m["revenue"] = m["rev_c"] / 100.0
        m = m.sort_values(["revenue", "c_custkey"], ascending=[False, True])
        return m.head(k)[["c_custkey", "c_name", "revenue", "c_acctbal",
                          "n_name"]]

    cand = (both2.groupby("cb").map_groups(join2, batch_format="pandas")
            .to_pandas())  # <= num_partitions * k rows
    return (cand.sort_values(["revenue", "c_custkey"],
                             ascending=[False, True])
            .head(k).reset_index(drop=True))


RETURNED_TOP_CUSTOMERS_SQL = """
SELECT c.c_custkey, c.c_name,
       SUM(li.rev_c)::BIGINT / 100.0 AS revenue,
       c.c_acctbal, n.n_name
FROM (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                  AS BIGINT)) AS rev_c
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
) li
JOIN orders o ON li.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1996-10-01'
  AND o.o_orderdate < DATE '1997-01-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q18-style large orders: HAVING-filtered per-order aggregate, then the
# tiny winner set drives broadcast semi-joins against orders/customer.
# The winner set is small BY CONSTRUCTION (the HAVING threshold), so
# the driver-side merge is bounded regardless of input scale.
# ---------------------------------------------------------------------------

def large_orders(sf_dir: str, min_qty: float = 300.0,
                 num_partitions: int = 64):
    import ray

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby("l_orderkey", as_index=False)
             .agg(qty=("l_quantity", "sum")))
        g["jb"] = (g["l_orderkey"] % num_partitions).astype("int32")
        return g

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("l_orderkey", as_index=False)
             .agg(total_qty=("qty", "sum")))
        return g[g["total_qty"] > min_qty]

    winners = (li.map_batches(pre, batch_format="pandas", batch_size=131072)
               .groupby("jb").map_groups(per_bucket, batch_format="pandas")
               .to_pandas())  # small: HAVING-filtered
    if winners.empty:
        return pd.DataFrame({
            "c_custkey": pd.Series(dtype="int64"),
            "c_name": pd.Series(dtype="object"),
            "o_orderkey": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="datetime64[us]"),
            "o_totalprice": pd.Series(dtype="float64"),
            "total_qty": pd.Series(dtype="float64")})

    def _semi_filter(keys: np.ndarray, col: str):
        """Broadcast semi-join via _semi_mask (zero-copy numpy through
        the object store; plain tasks — trivial state doesn't earn an
        actor pool's startup cost)."""
        keys_ref = ray.put(np.sort(keys.astype("int64")))

        def fn(b: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(keys_ref)
            return b[_semi_mask(ks, b[col].to_numpy().astype("int64"))]

        return fn

    orders = (_read(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_orderdate",
                             "o_totalprice"])
              .map_batches(_semi_filter(winners["l_orderkey"].to_numpy(),
                                        "o_orderkey"),
                           batch_format="pandas")
              .to_pandas())  # |winners| rows

    cust = (_read(sf_dir, "customer", columns=["c_custkey", "c_name"])
            .map_batches(_semi_filter(orders["o_custkey"].to_numpy(),
                                      "c_custkey"),
                         batch_format="pandas")
            .to_pandas())  # <= |winners| rows

    m = (winners.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust, left_on="o_custkey", right_on="c_custkey"))
    m = m.sort_values(["o_totalprice", "o_orderkey"],
                      ascending=[False, True])
    return m[["c_custkey", "c_name", "o_orderkey", "o_orderdate",
              "o_totalprice", "total_qty"]].reset_index(drop=True)


LARGE_ORDERS_SQL = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, li.total_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300.0
) li
JOIN orders o ON li.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
"""


# ---------------------------------------------------------------------------
# Q7-style nation trade volume: revenue shipped between two nations per
# year.  Supplier side is nation-filtered and size-gated (broadcast
# sorted arrays when small, suppkey bucket join otherwise); then the
# same orderkey -> custkey bucket-join chain as returned_top_customers.
# ---------------------------------------------------------------------------

def nation_trade_volume(sf_dir: str, nation_a: str = "NATION_1",
                        nation_b: str = "NATION_2",
                        date_from: str = "1996-01-01",
                        date_to: str = "1998-01-01",
                        num_partitions: int = 64,
                        supp_broadcast_limit: int = 2_000_000):
    import ray

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    pair = nation[nation["n_name"].isin([nation_a, nation_b])]
    names = dict(zip(pair["n_nationkey"].astype("int64"), pair["n_name"]))
    nat_ref = ray.put(names)

    def _empty():
        return pd.DataFrame({"key": pd.Series(dtype="int64"),
                             "supp_nk": pd.Series(dtype="int64"),
                             "year": pd.Series(dtype="int32"),
                             "rev_c": pd.Series(dtype="int64"),
                             "jb": pd.Series(dtype="int32"),
                             "side": pd.Series(dtype="int8")})

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def supp_filter(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["s_nationkey"].isin(ray.get(nat_ref))]
        return pd.DataFrame({
            "s_suppkey": b["s_suppkey"].to_numpy().astype("int64"),
            "s_nationkey": b["s_nationkey"].to_numpy().astype("int64")})

    # materialize: 2/25-nation slice of a table ~100x smaller than the
    # fact; the gate needs its count before the lineitem plan is built
    supp_f = supp.map_batches(supp_filter,
                              batch_format="pandas").materialize()

    _empty_out = pd.DataFrame({"supp_nation": pd.Series(dtype="object"),
                               "cust_nation": pd.Series(dtype="object"),
                               "l_year": pd.Series(dtype="int32"),
                               "revenue": pd.Series(dtype="float64")})
    if supp_f.count() == 0:
        # no suppliers in either nation — and an all-empty to_pandas()
        # would drop the schema, so exit before building the plan
        return _empty_out

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate",
                        "l_extendedprice", "l_discount"])

    def _li_rev(b: pd.DataFrame):
        m = (b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
        b = b[m]
        rev = np.floor(b["l_extendedprice"].to_numpy()
                       * (1.0 - b["l_discount"].to_numpy()) * 100.0
                       + 0.5).astype("int64")
        return b, rev

    if supp_f.count() <= supp_broadcast_limit:
        sdf = supp_f.to_pandas().sort_values("s_suppkey")
        sup_ref = ray.put((sdf["s_suppkey"].to_numpy(),
                           sdf["s_nationkey"].to_numpy()))

        def li_pre(b: pd.DataFrame) -> pd.DataFrame:
            keys, nks = ray.get(sup_ref)
            if len(keys) == 0:
                return _empty()
            b, rev = _li_rev(b)
            sk = b["l_suppkey"].to_numpy().astype("int64")
            hit, pos = _semi_probe(keys, sk)
            g = (pd.DataFrame({
                    "key": b["l_orderkey"].to_numpy()[hit].astype("int64"),
                    "supp_nk": nks[pos[hit]],
                    "year": b["l_shipdate"].dt.year.to_numpy()[hit]
                            .astype("int32"),
                    "rev_c": rev[hit]})
                 .groupby(["key", "supp_nk", "year"], as_index=False)
                 .agg(rev_c=("rev_c", "sum")))
            g["jb"] = (g["key"] % num_partitions).astype("int32")
            g["side"] = np.int8(0)
            return g

        li_supp = li.map_batches(li_pre, batch_format="pandas",
                                 batch_size=65536)
    else:
        # distributed fallback: suppkey bucket join, nothing broadcast.
        # Both union sides carry IDENTICAL columns (repo idiom — Ray's
        # sort shuffle may hand map_groups a block that saw only one
        # side, so differing schemas can KeyError in the group fn):
        # (sk, key, year, rev_c, nk, jb, side)
        def li_partial(b: pd.DataFrame) -> pd.DataFrame:
            b, rev = _li_rev(b)
            g = (pd.DataFrame({
                    "sk": b["l_suppkey"].to_numpy().astype("int64"),
                    "key": b["l_orderkey"].to_numpy().astype("int64"),
                    "year": b["l_shipdate"].dt.year.to_numpy()
                            .astype("int32"),
                    "rev_c": rev})
                 .groupby(["sk", "key", "year"], as_index=False)
                 .agg(rev_c=("rev_c", "sum")))
            g["nk"] = np.int64(0)
            g["jb"] = (g["sk"] % num_partitions).astype("int32")
            g["side"] = np.int8(0)
            return g[["sk", "key", "year", "rev_c", "nk", "jb", "side"]]

        def supp_side(b: pd.DataFrame) -> pd.DataFrame:
            sk = b["s_suppkey"].to_numpy().astype("int64")
            n = len(b)
            return pd.DataFrame({
                "sk": sk,
                "key": np.zeros(n, dtype="int64"),
                "year": np.zeros(n, dtype="int32"),
                "rev_c": np.zeros(n, dtype="int64"),
                "nk": b["s_nationkey"].to_numpy().astype("int64"),
                "jb": (sk % num_partitions).astype("int32"),
                "side": np.full(n, 1, dtype="int8")})

        def join_supp(group: pd.DataFrame) -> pd.DataFrame:
            s = group[group["side"] == 1][["sk", "nk"]]
            l = group[group["side"] == 0][["sk", "key", "year", "rev_c"]]
            if s.empty or l.empty:
                return _empty()
            m = l.merge(s, on="sk")
            g = (m.rename(columns={"nk": "supp_nk"})
                 .groupby(["key", "supp_nk", "year"], as_index=False)
                 .agg(rev_c=("rev_c", "sum")))
            g = g.astype({"key": "int64", "supp_nk": "int64",
                          "year": "int32", "rev_c": "int64"})
            g["jb"] = (g["key"] % num_partitions).astype("int32")
            g["side"] = np.int8(0)
            return g

        li_supp = (li.map_batches(li_partial, batch_format="pandas",
                                  batch_size=65536)
                   .union(supp_f.map_batches(supp_side,
                                             batch_format="pandas"))
                   .groupby("jb").map_groups(join_supp,
                                             batch_format="pandas"))

    # join 1: orderkey — attach o_custkey, re-key partials on custkey
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    # identical-columns union (repo idiom — Ray's sort shuffle can hand
    # map_groups a block that saw only one side, so differing schemas
    # KeyError intermittently): the orders side rides o_custkey in the
    # shared `supp_nk` slot
    def ord_side(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["o_orderkey"].to_numpy().astype("int64")
        n = len(b)
        return pd.DataFrame({
            "key": ok,
            "supp_nk": b["o_custkey"].to_numpy().astype("int64"),
            "year": np.zeros(n, dtype="int32"),
            "rev_c": np.zeros(n, dtype="int64"),
            "jb": (ok % num_partitions).astype("int32"),
            "side": np.full(n, 1, dtype="int8")})

    def join_ord(group: pd.DataFrame) -> pd.DataFrame:
        o = (group[group["side"] == 1][["key", "supp_nk"]]
             .rename(columns={"key": "o_orderkey",
                              "supp_nk": "o_custkey"}))
        l = group[group["side"] == 0][["key", "supp_nk", "year", "rev_c"]]
        if o.empty or l.empty:
            return _empty()
        m = l.merge(o, left_on="key", right_on="o_orderkey")
        g = (m.groupby(["o_custkey", "supp_nk", "year"], as_index=False)
             .agg(rev_c=("rev_c", "sum"))
             .rename(columns={"o_custkey": "key"}))
        g = g.astype({"key": "int64", "supp_nk": "int64",
                      "year": "int32", "rev_c": "int64"})
        g["jb"] = (g["key"] % num_partitions).astype("int32")
        g["side"] = np.int8(0)
        return g

    by_cust = (li_supp.union(orders.map_batches(ord_side,
                                                batch_format="pandas"))
               .groupby("jb").map_groups(join_ord, batch_format="pandas"))

    # join 2: custkey — customer nation, cross-nation filter, final agg
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    # identical-columns union again: the customer side rides its
    # nationkey in the shared `supp_nk` slot
    def cust_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["c_nationkey"].isin(ray.get(nat_ref))]
        ck = b["c_custkey"].to_numpy().astype("int64")
        n = len(b)
        return pd.DataFrame({
            "key": ck,
            "supp_nk": b["c_nationkey"].to_numpy().astype("int64"),
            "year": np.zeros(n, dtype="int32"),
            "rev_c": np.zeros(n, dtype="int64"),
            "jb": (ck % num_partitions).astype("int32"),
            "side": np.full(n, 1, dtype="int8")})

    def join_cust(group: pd.DataFrame) -> pd.DataFrame:
        c = (group[group["side"] == 1][["key", "supp_nk"]]
             .rename(columns={"key": "c_custkey",
                              "supp_nk": "cust_nk"}))
        l = group[group["side"] == 0][["key", "supp_nk", "year", "rev_c"]]
        empty = pd.DataFrame({"supp_nk": pd.Series(dtype="int64"),
                              "cust_nk": pd.Series(dtype="int64"),
                              "year": pd.Series(dtype="int32"),
                              "rev_c": pd.Series(dtype="int64")})
        if c.empty or l.empty:
            return empty
        m = l.merge(c.astype({"c_custkey": "int64", "cust_nk": "int64"}),
                    left_on="key", right_on="c_custkey")
        m = m[m["supp_nk"] != m["cust_nk"]]
        if m.empty:
            return empty
        g = (m.groupby(["supp_nk", "cust_nk", "year"], as_index=False)
             .agg(rev_c=("rev_c", "sum")))
        return g.astype({"supp_nk": "int64", "cust_nk": "int64",
                         "year": "int32", "rev_c": "int64"})

    out = (by_cust.union(cust.map_batches(cust_side, batch_format="pandas"))
           .groupby("jb").map_groups(join_cust, batch_format="pandas")
           .to_pandas())  # ≤ num_partitions × 2 nations × years rows
    if out.empty:
        return _empty_out
    g = (out.groupby(["supp_nk", "cust_nk", "year"], as_index=False)
         .agg(rev_c=("rev_c", "sum")))
    g["supp_nation"] = g["supp_nk"].map(names)
    g["cust_nation"] = g["cust_nk"].map(names)
    g["l_year"] = g["year"].astype("int32")
    g["revenue"] = g["rev_c"].astype("int64") / 100.0
    return (g.sort_values(["supp_nation", "cust_nation", "l_year"])
            [["supp_nation", "cust_nation", "l_year", "revenue"]]
            .reset_index(drop=True))


NATION_TRADE_VOLUME_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS INTEGER) AS l_year,
       SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                AS BIGINT))::BIGINT / 100.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE ns.n_name IN ('NATION_1', 'NATION_2')
  AND nc.n_name IN ('NATION_1', 'NATION_2')
  AND ns.n_name <> nc.n_name
  AND l.l_shipdate >= DATE '1996-01-01'
  AND l.l_shipdate <  DATE '1998-01-01'
GROUP BY ns.n_name, nc.n_name, YEAR(l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q19-style disjunctive brand/size/quantity revenue: the filtered part
# slice is size-gated (broadcast sorted arrays when small); the
# fallback ships (partkey, quantity) -> (count, price_c) partials into
# a partkey bucket join — l_quantity is low-cardinality (1..50), so
# the shuffle is bounded by 50 rows per part per batch, never raw rows.
# ---------------------------------------------------------------------------

_Q19_CLAUSES = (
    # (brand, size_max, qty_lo, qty_hi)
    ("Brand#12", 5, 1.0, 11.0),
    ("Brand#23", 10, 10.0, 20.0),
    ("Brand#34", 15, 20.0, 30.0),
)


def brand_disjunct_revenue(sf_dir: str, clauses=_Q19_CLAUSES,
                           num_partitions: int = 64,
                           part_broadcast_limit: int = 2_000_000):
    import ray

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    brands = {b: i for i, (b, _, _, _) in enumerate(clauses)}

    def part_filter(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(clause=b["p_brand"].map(brands))
        b = b[b["clause"].notna()]
        sz_max = np.array([c[1] for c in clauses])[
            b["clause"].astype("int64")]
        b = b[(b["p_size"] >= 1) & (b["p_size"].to_numpy() <= sz_max)]
        return pd.DataFrame({
            "p_partkey": b["p_partkey"].to_numpy().astype("int64"),
            "clause": b["clause"].to_numpy().astype("int64")})

    part_f = part.map_batches(part_filter,
                              batch_format="pandas").materialize()

    if part_f.count() == 0:
        # no part matches any clause; SQL SUM over zero rows is NULL
        return pd.DataFrame({"revenue": [np.nan], "n_items": [0]})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])
    qty_lo = np.array([c[2] for c in clauses])
    qty_hi = np.array([c[3] for c in clauses])

    if part_f.count() <= part_broadcast_limit:
        pdf = part_f.to_pandas().sort_values("p_partkey")
        part_ref = ray.put((pdf["p_partkey"].to_numpy(),
                            pdf["clause"].to_numpy()))

        def li_sum(b: pd.DataFrame) -> pd.DataFrame:
            keys, cls = ray.get(part_ref)
            empty = pd.DataFrame({"rev_c": [np.int64(0)],
                                  "n_items": [np.int64(0)]})
            if len(keys) == 0:
                return empty
            pk = b["l_partkey"].to_numpy().astype("int64")
            hit, pos = _semi_probe(keys, pk)
            qty = b["l_quantity"].to_numpy()[hit]
            cl = cls[pos[hit]]
            ok = (qty >= qty_lo[cl]) & (qty <= qty_hi[cl])
            sel = b[hit][ok]
            rev = np.floor(sel["l_extendedprice"].to_numpy()
                           * (1.0 - sel["l_discount"].to_numpy()) * 100.0
                           + 0.5).astype("int64")
            return pd.DataFrame({"rev_c": [np.int64(rev.sum())],
                                 "n_items": [np.int64(len(sel))]})

        parts_out = li.map_batches(li_sum, batch_format="pandas",
                                   batch_size=131072).to_pandas()
    else:
        # distributed fallback: (partkey, quantity) partials, bucketed
        def li_partial(b: pd.DataFrame) -> pd.DataFrame:
            rev = np.floor(b["l_extendedprice"].to_numpy()
                           * (1.0 - b["l_discount"].to_numpy()) * 100.0
                           + 0.5).astype("int64")
            g = (pd.DataFrame({"p_partkey": b["l_partkey"].to_numpy()
                               .astype("int64"),
                               "qty": b["l_quantity"].to_numpy(),
                               "rev_c": rev})
                 .groupby(["p_partkey", "qty"], as_index=False)
                 .agg(rev_c=("rev_c", "sum"), n=("rev_c", "size")))
            g["clause"] = np.int64(-1)
            g["jb"] = (g["p_partkey"] % num_partitions).astype("int32")
            return g

        def part_side(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["qty"] = np.float64(0)
            b["rev_c"] = np.int64(0)
            b["n"] = np.int64(0)
            b["jb"] = (b["p_partkey"] % num_partitions).astype("int32")
            return b[["p_partkey", "qty", "rev_c", "n", "clause", "jb"]]

        def join_part(group: pd.DataFrame) -> pd.DataFrame:
            p = group[group["clause"] >= 0][["p_partkey", "clause"]]
            l = group[group["clause"] < 0]
            empty = pd.DataFrame({"rev_c": [np.int64(0)],
                                  "n_items": [np.int64(0)]})
            if p.empty or l.empty:
                return empty
            m = l.merge(p.astype({"p_partkey": "int64"}), on="p_partkey")
            cl = m["clause_y"].to_numpy().astype("int64")
            qty = m["qty"].to_numpy()
            ok = (qty >= qty_lo[cl]) & (qty <= qty_hi[cl])
            return pd.DataFrame({
                "rev_c": [np.int64(m["rev_c"].to_numpy()[ok].sum())],
                "n_items": [np.int64(m["n"].to_numpy()[ok].sum())]})

        parts_out = (li.map_batches(li_partial, batch_format="pandas",
                                    batch_size=131072)
                     .union(part_f.map_batches(part_side,
                                               batch_format="pandas"))
                     .groupby("jb").map_groups(join_part,
                                               batch_format="pandas")
                     .to_pandas())

    n_items = int(parts_out["n_items"].sum())
    return pd.DataFrame({
        "revenue": [parts_out["rev_c"].sum() / 100.0 if n_items else np.nan],
        "n_items": [n_items]})


BRAND_DISJUNCT_REVENUE_SQL = """
SELECT SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                AS BIGINT))::BIGINT / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Corpus-rarity document score: mean global token probability per doc.
# Two passes: (1) global token frequencies via the top_tokens partial-
# count + token-hash-bucket pattern (full vocab this time, no top-k);
# (2) per-doc scoring.  The vocab is size-gated — broadcast sorted
# arrays when small, token-hash bucket join + doc regroup otherwise.
# All per-token probabilities are quantized to integer ppb
# (floor(c/T*1e9)) so sums are order-independent and hash-stable; the
# only float ops (divide, multiply, floor) are IEEE exactly-rounded and
# mirror the oracle SQL op-for-op.
# ---------------------------------------------------------------------------

def doc_rarity(sf_dir: str, num_buckets: int = 32,
               vocab_broadcast_limit: int = 4_000_000):
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def vocab_partial(b: pd.DataFrame) -> pd.DataFrame:
        counts = _ws_tokens(b["text"]).value_counts()
        out = counts.rename_axis("token").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        out["tb"] = (pd.util.hash_pandas_object(out["token"], index=False)
                     % num_buckets).astype("int32")
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("token", as_index=False)["n"].sum()
        m["n"] = m["n"].astype("int64")
        return m

    vocab = (ds.map_batches(vocab_partial, batch_format="pandas")
             .groupby("tb").map_groups(merge_bucket, batch_format="pandas")
             .materialize())  # consumed twice: gate count + join side
    from ray.data.aggregate import Sum

    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "sum_ppb": pd.Series(dtype="int64"),
                          "n_tokens": pd.Series(dtype="int64"),
                          "mean_prob_ppb": pd.Series(dtype="float64")})
    vocab_n = vocab.count()  # metadata read on a materialized dataset
    if vocab_n == 0:
        return empty

    if vocab_n <= vocab_broadcast_limit:
        vdf = vocab.to_pandas().sort_values("token")
        t_d = float(int(vdf["n"].sum()))  # total from the collected vocab
        ppb = np.floor(vdf["n"].to_numpy().astype("float64") / t_d
                       * 1000000000.0).astype("int64")
        vref = ray.put((vdf["token"].to_numpy(), ppb))

        def score(b: pd.DataFrame) -> pd.DataFrame:
            toks, ppbs = ray.get(vref)
            toks_s = _ws_tokens(b["text"])
            ex = pd.DataFrame({"doc_id": b["doc_id"].reindex(toks_s.index),
                               "tok": toks_s})
            if ex.empty:
                return empty[["doc_id", "sum_ppb", "n_tokens",
                              "mean_prob_ppb"]]
            pos = np.searchsorted(toks, ex["tok"].to_numpy())
            # every doc token IS in the corpus vocab by construction
            g = (pd.DataFrame({"doc_id": ex["doc_id"].to_numpy(),
                               "ppb": ppbs[pos]})
                 .groupby("doc_id", as_index=False)
                 .agg(sum_ppb=("ppb", "sum"), n_tokens=("ppb", "size")))
            g["sum_ppb"] = g["sum_ppb"].astype("int64")
            g["n_tokens"] = g["n_tokens"].astype("int64")
            g["mean_prob_ppb"] = (g["sum_ppb"].astype("float64")
                                  / g["n_tokens"].astype("float64"))
            return g

        # doc_id never spans batches (documents is one row per doc), so
        # per-batch grouping is final — no shuffle at all on this path
        return ds.map_batches(score, batch_format="pandas")

    # distributed path: explode (doc_id, token), token-hash bucket join
    # against the vocab, then a doc_id groupby folds bucket partials.
    total = vocab.aggregate(Sum("n", alias_name="t"))["t"]
    t_d = float(int(total))

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks_s = _ws_tokens(b["text"])
        ex = pd.DataFrame({"doc_id": b["doc_id"].reindex(toks_s.index),
                           "tok": toks_s})
        g = (ex.groupby(["doc_id", "tok"], as_index=False).size()
             .rename(columns={"tok": "token", "size": "n"}))
        g["n"] = g["n"].astype("int64")
        g["doc_id"] = g["doc_id"].astype("int64")
        g["tb"] = (pd.util.hash_pandas_object(g["token"], index=False)
                   % num_buckets).astype("int32")
        return g[["doc_id", "token", "n", "tb"]]

    def vocab_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["doc_id"] = np.int64(-1)  # marks the vocab side
        b["tb"] = (pd.util.hash_pandas_object(b["token"], index=False)
                   % num_buckets).astype("int32")
        return b[["doc_id", "token", "n", "tb"]]

    def join_tokens(group: pd.DataFrame) -> pd.DataFrame:
        v = group[group["doc_id"] < 0][["token", "n"]]
        d = group[group["doc_id"] >= 0]
        out_empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                  "sum_ppb": pd.Series(dtype="int64"),
                                  "n_tokens": pd.Series(dtype="int64")})
        if v.empty or d.empty:
            return out_empty
        ppb = np.floor(v["n"].to_numpy().astype("float64") / t_d
                       * 1000000000.0).astype("int64")
        v = pd.DataFrame({"token": v["token"].to_numpy(), "ppb": ppb})
        m = d.merge(v, on="token")
        m["sum_ppb"] = m["ppb"] * m["n"]
        g = (m.groupby("doc_id", as_index=False)
             .agg(sum_ppb=("sum_ppb", "sum"), n_tokens=("n", "sum")))
        return g.astype({"doc_id": "int64", "sum_ppb": "int64",
                         "n_tokens": "int64"})

    partials = (ds.map_batches(explode, batch_format="pandas")
                .union(vocab.map_batches(vocab_side, batch_format="pandas"))
                .groupby("tb").map_groups(join_tokens,
                                          batch_format="pandas"))
    per_doc = partials.groupby("doc_id").aggregate(
        Sum("sum_ppb", alias_name="sum_ppb"),
        Sum("n_tokens", alias_name="n_tokens"))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.astype({"sum_ppb": "int64", "n_tokens": "int64"})
        b["mean_prob_ppb"] = (b["sum_ppb"].astype("float64")
                              / b["n_tokens"].astype("float64"))
        return b[["doc_id", "sum_ppb", "n_tokens", "mean_prob_ppb"]]

    return per_doc.map_batches(finish, batch_format="pandas")


DOC_RARITY_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
           regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
           x -> x <> '')) AS token
  FROM documents
),
freq AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
tot AS (SELECT COUNT(*) AS t FROM tok)
SELECT tok.doc_id,
       SUM(CAST(FLOOR(CAST(freq.c AS DOUBLE) / CAST(tot.t AS DOUBLE)
                      * 1000000000.0) AS BIGINT))::BIGINT AS sum_ppb,
       COUNT(*) AS n_tokens,
       CAST(SUM(CAST(FLOOR(CAST(freq.c AS DOUBLE) / CAST(tot.t AS DOUBLE)
                           * 1000000000.0) AS BIGINT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS mean_prob_ppb
FROM tok JOIN freq USING (token) CROSS JOIN tot
GROUP BY tok.doc_id
"""


# ---------------------------------------------------------------------------
# Per-type z-score outlier detection: two passes.  Pass 1 ships exact
# integer-cent moment partials (n, Σx, Σx²) per (batch, type) — a few
# rows per batch — folded into arbitrary-precision Python ints on the
# driver (int64 would overflow Σx² at 10^12 rows).  Pass 2 broadcasts
# the tiny per-type (mean, std) and flags |z| > 3 map-side.  Every
# float op mirrors the oracle SQL op-for-op (IEEE exactly-rounded
# divide/multiply/sqrt), so the boundary comparison is bit-identical.
# ---------------------------------------------------------------------------

def event_zscore(sf_dir: str, z_threshold: float = 3.0):
    import ray

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"].notna()]
        xc = np.floor(b["value"].to_numpy() * 100.0 + 0.5)
        df = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                           "xc": xc})
        # sc/ssq travel as decimal STRINGS: the exact path's big ints
        # exceed Arrow int64, and mixed block dtypes would conflict —
        # the driver folds with int(v), which accepts both.
        if len(xc) == 0 or np.abs(xc).max() <= float(1 << 22):
            # fast path: |xc| <= 2^22 keeps xc^2 <= 2^44, so a 131072-row
            # batch's int64 ssq sum stays < 2^61 — exact, vectorized
            xi = xc.astype("int64")
            df["xc"], df["x2"] = xi, xi * xi
            out = (df.groupby("event_type", as_index=False)
                   .agg(n=("xc", "size"), sc=("xc", "sum"),
                        ssq=("x2", "sum")))
        else:
            # exact path mirroring the oracle's HUGEINT squares: Python
            # big ints (xc is float64 on BOTH sides — DuckDB's FLOOR is
            # a double too — so int(v) equals CAST(xc AS HUGEINT))
            out = (df.groupby("event_type")["xc"]
                   .apply(lambda s: pd.Series({
                       "n": len(s),
                       "sc": sum(int(v) for v in s),
                       "ssq": sum(int(v) * int(v) for v in s)}))
                   .unstack().reset_index())
            out["n"] = out["n"].astype("int64")
        out["sc"] = out["sc"].map(lambda v: str(int(v)))
        out["ssq"] = out["ssq"].map(lambda v: str(int(v)))
        return out[["event_type", "n", "sc", "ssq"]]

    parts = ds.map_batches(moments, batch_format="pandas",
                           batch_size=131072).to_pandas()
    stats = {}
    for et, grp in parts.groupby("event_type"):
        n = int(grp["n"].sum())
        sc = sum(int(v) for v in grp["sc"])    # exact big-int fold
        ssq = sum(int(v) for v in grp["ssq"])
        mean_c = float(sc) / float(n)
        var_c = float(n * ssq - sc * sc) / (float(n) * float(n))
        stats[et] = (mean_c, float(np.sqrt(var_c)))
    stats_ref = ray.put(stats)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(stats_ref)
        b = b[b["value"].notna()]
        xc = np.floor(b["value"].to_numpy() * 100.0 + 0.5)
        mean = b["event_type"].map({k: v[0] for k, v in st.items()})
        std = b["event_type"].map({k: v[1] for k, v in st.items()})
        z = (xc - mean.to_numpy()) / std.to_numpy()
        keep = np.abs(z) > z_threshold
        out = b[keep][["event_id", "event_type", "value"]].copy()
        out["z_milli"] = np.floor(z[keep] * 1000.0 + 0.5).astype("int64")
        return out

    return ds.map_batches(flag, batch_format="pandas", batch_size=131072)


EVENT_ZSCORE_SQL = """
WITH x AS (
  SELECT event_id, event_type, value,
         FLOOR(value * 100.0 + 0.5) AS xc
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(xc AS HUGEINT)) AS sc,
         SUM(CAST(xc AS HUGEINT) * CAST(xc AS HUGEINT)) AS ssq
  FROM x GROUP BY event_type
),
st AS (
  SELECT event_type,
         CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
         SQRT(CAST(n * ssq - sc * sc AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS std_c
  FROM s
)
SELECT x.event_id, x.event_type, x.value,
       CAST(FLOOR((x.xc - st.mean_c) / st.std_c * 1000.0 + 0.5)
            AS BIGINT) AS z_milli
FROM x JOIN st USING (event_type)
WHERE ABS((x.xc - st.mean_c) / st.std_c) > 3.0
"""


# ---------------------------------------------------------------------------
# Corpus bigram statistics (training-data n-gram analysis)
# ---------------------------------------------------------------------------
def _bigram_partials(b: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """Per-batch partial bigram counts over whitespace tokens, keyed by
    hash(first_token) % num_buckets.  Adjacent-pair formation is pure
    numpy over the exploded token stream: a shifted compare keeps only
    pairs whose two tokens came from the SAME document (doc boundaries
    never produce a cross-doc bigram)."""
    toks = _ws_tokens(b["text"])
    if len(toks) < 2:
        return pd.DataFrame({"first": pd.Series(dtype="object"),
                             "second": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64"),
                             "fb": pd.Series(dtype="int32")})
    doc = toks.index.to_numpy()          # explode keeps the source row id
    w = toks.to_numpy()
    same = doc[:-1] == doc[1:]
    g = (pd.DataFrame({"first": w[:-1][same], "second": w[1:][same]})
         .groupby(["first", "second"], as_index=False).size()
         .rename(columns={"size": "n"}))
    g["n"] = g["n"].astype("int64")
    g["fb"] = (pd.util.hash_pandas_object(g["first"], index=False)
               % num_buckets).astype("int32")
    return g


def top_bigrams(sf_dir: str, k: int = 50, num_buckets: int = 32):
    """Corpus-wide adjacent-bigram frequency top-k.  Same scale shape
    as top_tokens: map-side partial counts, first-token-hash bucket
    merge (a bigram's bucket is a function of its first token, so each
    bucket owns its bigrams completely), per-bucket partial top-k,
    tiny driver merge — the bigram vocabulary never assembles in one
    place."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby(["first", "second"], as_index=False)["n"].sum())
        m["n"] = m["n"].astype("int64")
        m["bigram"] = m["first"] + " " + m["second"]
        return (m.sort_values(["n", "bigram"], ascending=[False, True])
                .head(k)[["bigram", "n"]])

    partials = (ds.map_batches(lambda b: _bigram_partials(b, num_buckets),
                               batch_format="pandas")
                .groupby("fb").map_groups(merge_bucket,
                                          batch_format="pandas"))
    top = _fold_pd(partials, pd.DataFrame({  # <= num_buckets * k rows
        "bigram": pd.Series(dtype="object"),
        "n": pd.Series(dtype="int64")}))
    return (top.sort_values(["n", "bigram"], ascending=[False, True])
            .head(k).reset_index(drop=True))


TOP_BIGRAMS_SQL = r"""
WITH t AS (
  SELECT list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                                           '[ \t\n\f\r]+'),
                     x -> x <> '') AS toks
  FROM documents
), pairs AS (
  SELECT unnest(list_zip(toks[:-2], toks[2:])) AS p
  FROM t WHERE len(toks) >= 2
)
SELECT p[1] || ' ' || p[2] AS bigram, count(*)::BIGINT AS n
FROM pairs GROUP BY 1
ORDER BY n DESC, bigram LIMIT 50
"""


def bigram_pmi(sf_dir: str, min_count: int = 5, k: int = 50,
               num_buckets: int = 32):
    """PMI-ranked collocation mining of adjacent token pairs.  Margins
    are taken over bigram positions: n_x = sum of counts of bigrams
    starting with x, n_y = sum ending with y, N = total bigrams.  The
    reported score is exact integer milli-LIFT, floor(1000*n*N/
    (n_x*n_y)) — ln(lift) is PMI and ln is monotone, so the ranking is
    PMI's, while the value stays transcendental-free (libm ln at an
    integer-floor boundary is not bit-identical across engines).

    Distributed as two bucket shuffles over the BIGRAM-COUNT table
    (vocab-squared bounded — far smaller than the corpus):
      1. partials bucket on hash(first): per-bucket exact bigram
         counts AND the complete first-margin n_x (every bigram with
         first=x lands in x's bucket);
      2. re-key on hash(second): per-bucket complete second-margin
         n_y, PMI, min-count filter, partial top-k.
    The grand total N folds from per-bucket sums (<= num_buckets rows
    on the driver).  Nothing corpus-sized or vocab-sized ever
    assembles on the driver."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def merge_first(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["first", "second"], as_index=False)["n"].sum()
        m["n"] = m["n"].astype("int64")
        mx = m.groupby("first")["n"].sum().rename("n_x")
        m = m.join(mx, on="first")
        m["n_x"] = m["n_x"].astype("int64")
        m["sb"] = (pd.util.hash_pandas_object(m["second"], index=False)
                   % num_buckets).astype("int32")
        return m

    by_first = (ds.map_batches(lambda b: _bigram_partials(b, num_buckets),
                               batch_format="pandas")
                .groupby("fb").map_groups(merge_first,
                                          batch_format="pandas")
                .materialize())  # consumed twice: total N + second pass
    empty_out = pd.DataFrame({"bigram": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64"),
                              "lift_milli": pd.Series(dtype="int64")})
    total = by_first.sum("n")
    if total is None:  # Ray sum() over an all-empty dataset
        return empty_out  # bigram-free corpus: oracle returns 0 rows
    n_total = float(int(total if not isinstance(total, dict)
                        else total["sum(n)"]))

    def attach_second(g: pd.DataFrame) -> pd.DataFrame:
        my = g.groupby("second")["n"].sum().rename("n_y")
        g = g.join(my, on="second")
        g = g[g["n"] >= min_count]
        if g.empty:
            return pd.DataFrame({"bigram": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64"),
                                 "lift_milli": pd.Series(dtype="int64")})
        # EXACT integer milli-lift: floor(1000 * n * N / (n_x * n_y)).
        # lift = P(xy)/(P(x)P(y)) is PMI's argument; ln is monotone, so
        # the collocation RANKING is identical, and the reported value
        # is transcendental-free — a floor(1000*ln(x)) boundary can
        # flip between numpy's and DuckDB's libm (repo policy, see
        # tfidf_search).  int64 guard: fall back to exact Python ints
        # if 1000*n*N could overflow (corpus-scale N).
        n_arr = g["n"].to_numpy()
        nx, ny = g["n_x"].to_numpy(), g["n_y"].to_numpy()
        n_tot = int(n_total)
        safe = (int(nx.max()) < 2**31 and int(ny.max()) < 2**31
                and 1000 * int(n_arr.max()) * n_tot < 2**63)
        if safe:
            lift = (1000 * n_arr * n_tot) // (nx * ny)
        else:
            lift = np.array(
                [(1000 * int(a) * n_tot) // (int(x) * int(y))
                 for a, x, y in zip(n_arr, nx, ny)], dtype="int64")
        g = g.assign(lift_milli=lift.astype("int64"))
        g["bigram"] = g["first"] + " " + g["second"]
        return (g.sort_values(["lift_milli", "bigram"],
                              ascending=[False, True])
                .head(k)[["bigram", "n", "lift_milli"]])

    partials = by_first.groupby("sb").map_groups(attach_second,
                                                 batch_format="pandas")
    top = _fold_pd(partials, empty_out)  # <= num_buckets * k rows
    return (top.sort_values(["lift_milli", "bigram"],
                            ascending=[False, True])
            .head(k).reset_index(drop=True))


BIGRAM_PMI_SQL = r"""
WITH t AS (
  SELECT list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                                           '[ \t\n\f\r]+'),
                     x -> x <> '') AS toks
  FROM documents
), pairs AS (
  SELECT unnest(list_zip(toks[:-2], toks[2:])) AS p
  FROM t WHERE len(toks) >= 2
), bg AS (
  SELECT p[1] AS f, p[2] AS s, count(*)::BIGINT AS n
  FROM pairs GROUP BY 1, 2
), tot AS (SELECT sum(n)::BIGINT AS total FROM bg),
mx AS (SELECT f, sum(n)::BIGINT AS n_x FROM bg GROUP BY 1),
my AS (SELECT s, sum(n)::BIGINT AS n_y FROM bg GROUP BY 1)
SELECT bg.f || ' ' || bg.s AS bigram, bg.n AS n,
       CAST((1000::HUGEINT * bg.n * tot.total)
            // (mx.n_x::HUGEINT * my.n_y) AS BIGINT) AS lift_milli
FROM bg CROSS JOIN tot
JOIN mx ON bg.f = mx.f
JOIN my ON bg.s = my.s
WHERE bg.n >= 5
ORDER BY lift_milli DESC, bigram LIMIT 50
"""


# ---------------------------------------------------------------------------
# Product-analytics shapes: day-over-day retention, ordered funnel
# ---------------------------------------------------------------------------
def user_retention(sf_dir: str, num_buckets: int = 64):
    """Day-over-day user retention: for each day, how many users were
    active, and how many of those were also active the NEXT day.

    Map-side (user, day) pair dedup -> user-hash bucket shuffle (each
    user's full day set lands in one bucket) -> in-bucket vectorized
    next-day probe (sort by user+day, shifted compare) -> per-bucket
    per-day partials -> tiny driver fold.  Raw events never shuffle;
    the driver sees <= num_buckets x n_days rows (days are bounded by
    the time range, not the data size)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame({"user_id": b["user_id"],
                          "day": b["ts"].dt.floor("D")}).drop_duplicates()
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    def bucket_retention(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(subset=["user_id", "day"])
             .sort_values(["user_id", "day"]))
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        nxt = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            nxt[:-1] = (u[:-1] == u[1:]) & (
                (d[1:] - d[:-1]) == np.timedelta64(1, "D"))
        out = (pd.DataFrame({"day": g["day"].to_numpy(),
                             "retained": nxt.astype("int64")})
               .groupby("day", as_index=False)
               .agg(active=("retained", "size"),
                    retained=("retained", "sum")))
        out["active"] = out["active"].astype("int64")
        out["retained"] = out["retained"].astype("int64")
        return out

    parts = (ds.map_batches(pairs, batch_format="pandas",
                            batch_size=131072)
             .groupby("ub").map_groups(bucket_retention,
                                       batch_format="pandas"))
    out = (_fold_pd(parts, pd.DataFrame({
               "day": pd.Series(dtype="datetime64[us]"),
               "active": pd.Series(dtype="int64"),
               "retained": pd.Series(dtype="int64")}))
           .groupby("day", as_index=False)
           .agg(active=("active", "sum"), retained=("retained", "sum")))
    out["active"] = out["active"].astype("int64")
    out["retained"] = out["retained"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


USER_RETENTION_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
)
SELECT a.day AS day, count(*)::BIGINT AS active,
       count(b.user_id)::BIGINT AS retained
FROM ud a LEFT JOIN ud b
  ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
GROUP BY a.day
ORDER BY a.day
"""


def event_funnel(sf_dir: str,
                 steps: tuple = ("view", "click", "purchase"),
                 num_buckets: int = 64):
    """Ordered conversion funnel: users whose first `steps[0]` is
    followed (strictly later) by a `steps[1]`, then a `steps[2]`, ...

    One user-hash bucket shuffle of the step-filtered events (each
    user's history lands whole in one bucket), then a vectorized
    in-bucket chase: t_i = per-user min ts of step i events occurring
    AFTER t_{i-1} (merge + mask + groupby-min — no per-user Python
    loop).  Each bucket emits one partial row of per-stage user
    counts; the driver folds <= num_buckets rows."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    step_list = list(steps)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(step_list)]
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    def bucket_funnel(g: pd.DataFrame) -> pd.DataFrame:
        cur = (g[g["event_type"] == step_list[0]]
               .groupby("user_id")["ts"].min().rename("t_prev")
               .reset_index())
        counts = [len(cur)]
        for step in step_list[1:]:
            nxt = g[g["event_type"] == step][["user_id", "ts"]].merge(
                cur, on="user_id")
            nxt = nxt[nxt["ts"] > nxt["t_prev"]]
            cur = (nxt.groupby("user_id")["ts"].min().rename("t_prev")
                   .reset_index())
            counts.append(len(cur))
        return pd.DataFrame({
            "stage_idx": np.arange(1, len(step_list) + 1, dtype=np.int64),
            "stage": step_list,
            "users": np.asarray(counts, dtype=np.int64)})

    parts = (ds.map_batches(keep, batch_format="pandas",
                            batch_size=131072)
             .groupby("ub").map_groups(bucket_funnel,
                                       batch_format="pandas"))
    # a step-event-free table produces NO groups at all; the oracle
    # still returns one zero row per stage
    zero = pd.DataFrame({
        "stage_idx": np.arange(1, len(step_list) + 1, dtype=np.int64),
        "stage": step_list,
        "users": np.zeros(len(step_list), dtype=np.int64)})
    out = (pd.concat([_fold_pd(parts, zero), zero])
           .groupby(["stage_idx", "stage"], as_index=False)["users"].sum())
    out["users"] = out["users"].astype("int64")
    return out.sort_values("stage_idx").reset_index(drop=True)


EVENT_FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS ts1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS ts2 FROM events e
  JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS ts3 FROM events e
  JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1::BIGINT AS stage_idx, 'view' AS stage,
         (SELECT count(*) FROM t1)::BIGINT AS users
  UNION ALL
  SELECT 2, 'click', (SELECT count(*) FROM t2)::BIGINT
  UNION ALL
  SELECT 3, 'purchase', (SELECT count(*) FROM t3)::BIGINT
)
ORDER BY stage_idx
"""


def sole_late_supplier(sf_dir: str, late_days: int = 60, k: int = 20,
                       num_partitions: int = 64):
    """Q21-shape per-order multi-supplier analysis (adapted to this
    schema's columns: late := supplier's last line shipped more than
    `late_days` after the order date): among multi-supplier orders
    where EXACTLY ONE supplier was late, count blame per supplier.

    lineitem and orders are both fact-sized, so the join is a
    bucket-paired orderkey shuffle (no broadcast): lineitem
    pre-aggregates map-side to one (order, supplier, max_ship) row per
    batch, both sides union with identical columns, and each bucket
    group resolves its own orders completely (an order's every line
    lands in its bucket).  Buckets emit per-supplier partial counts;
    the driver folds <= num_partitions x |suppliers-seen| rows and
    fetches the final k names with a broadcast semi-join read."""
    import ray

    cols = ["key", "skey", "d", "jb", "side"]

    def li_pre(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
                "key": b["l_orderkey"].to_numpy().astype("int64"),
                "skey": b["l_suppkey"].to_numpy().astype("int64"),
                "d": b["l_shipdate"]})
             .groupby(["key", "skey"], as_index=False)["d"].max())
        g["jb"] = (g["key"] % num_partitions).astype("int32")
        g["side"] = np.int8(0)
        return g[cols]

    def ord_pre(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["o_orderkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": ok,
            "skey": np.zeros(len(b), dtype="int64"),
            "d": b["o_orderdate"],
            "jb": (ok % num_partitions).astype("int32"),
            "side": np.full(len(b), 1, dtype="int8")})[cols]

    li = (_read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_suppkey", "l_shipdate"])
          .map_batches(li_pre, batch_format="pandas", batch_size=131072))
    orders = (_read(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderdate"])
              .map_batches(ord_pre, batch_format="pandas",
                           batch_size=131072))

    both = li.union(orders)

    late_off = pd.Timedelta(days=late_days)

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"skey": pd.Series(dtype="int64"),
                              "numwait": pd.Series(dtype="int64")})
        l = group[group["side"] == 0]
        o = group[group["side"] == 1][["key", "d"]].rename(
            columns={"d": "odate"})
        if l.empty or o.empty:
            return empty
        # re-fold cross-batch partials to one max_ship per (order, supp)
        ls = (l.groupby(["key", "skey"], as_index=False)["d"].max()
              .merge(o, on="key"))
        ls["late"] = ls["d"] > (ls["odate"] + late_off)
        per_order = (ls.assign(
            late_skey=np.where(ls["late"], ls["skey"], np.int64(-1)))
            .groupby("key", as_index=False)
            .agg(n_supp=("skey", "size"), n_late=("late", "sum"),
                 late_skey=("late_skey", "max")))
        hit = per_order[(per_order["n_supp"] >= 2)
                        & (per_order["n_late"] == 1)]
        if hit.empty:
            return empty
        out = (hit.groupby("late_skey", as_index=False).size()
               .rename(columns={"late_skey": "skey", "size": "numwait"}))
        out["numwait"] = out["numwait"].astype("int64")
        return out

    parts = both.groupby("jb").map_groups(join_bucket,
                                          batch_format="pandas")
    agg = (_fold_pd(parts, pd.DataFrame({
               "skey": pd.Series(dtype="int64"),
               "numwait": pd.Series(dtype="int64")}))
           .groupby("skey", as_index=False)["numwait"].sum())
    agg["numwait"] = agg["numwait"].astype("int64")
    top = (agg.sort_values(["numwait", "skey"], ascending=[False, True])
           .head(k))
    if top.empty:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                             "s_name": pd.Series(dtype="object"),
                             "numwait": pd.Series(dtype="int64")})

    keys_ref = ray.put(np.sort(top["skey"].to_numpy().astype("int64")))

    def name_filter(b: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        m = _semi_mask(ks, b["s_suppkey"].to_numpy().astype("int64"))
        return b[m][["s_suppkey", "s_name"]]

    names = _fold_pd(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        .map_batches(name_filter, batch_format="pandas"),
        pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                      "s_name": pd.Series(dtype="object")}))  # <= k rows
    # LEFT merge: limit-before-join on both sides, so a blamed suppkey
    # missing from supplier keeps its row (NULL name) like the oracle
    out = top.merge(names, left_on="skey", right_on="s_suppkey",
                    how="left")
    out["s_suppkey"] = out["skey"]
    return (out.sort_values(["numwait", "skey"],
                            ascending=[False, True])
            [["s_suppkey", "s_name", "numwait"]].reset_index(drop=True))


SOLE_LATE_SUPPLIER_SQL = """
WITH os AS (
  SELECT l.l_orderkey AS okey, l.l_suppkey AS skey,
         max(l.l_shipdate) AS max_ship, any_value(o.o_orderdate) AS odate
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), per_order AS (
  SELECT okey, count(*) AS n_supp,
         sum(CASE WHEN max_ship > odate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS n_late,
         max(CASE WHEN max_ship > odate + INTERVAL 60 DAY
                  THEN skey END) AS late_skey
  FROM os GROUP BY okey
), blame AS (
  SELECT late_skey AS s_suppkey, count(*)::BIGINT AS numwait
  FROM per_order WHERE n_supp >= 2 AND n_late = 1
  GROUP BY late_skey
  ORDER BY numwait DESC, late_skey LIMIT 20
)
SELECT b.s_suppkey, s.s_name, b.numwait
FROM blame b LEFT JOIN supplier s ON s.s_suppkey = b.s_suppkey
ORDER BY b.numwait DESC, b.s_suppkey
"""


def market_share(sf_dir: str, nation: str = "NATION_2",
                 region: str = "ASIA", num_partitions: int = 64,
                 broadcast_limit: int = 2_000_000):
    """Q8-shape national market share: among orders placed by customers
    in `region`, the yearly fraction of lineitem revenue supplied by
    `nation`.

    Three-stage distributed plan, one partitioning key per stage:
      1. orders |X| customer on custkey — both fact-sized, so a
         bucket-paired custkey shuffle (customer pre-filtered to the
         region's nationkeys via the broadcast 25-row nation dim);
         emits qualifying (orderkey, year).
      2. lineitem tags each line is-target-nation via a size-gated
         broadcast of (suppkey -> nationkey) with a suppkey bucket-join
         fallback past `broadcast_limit` (supplier scales with the
         fact table), then pre-aggregates map-side to one
         (orderkey, rev, target_rev) partial per batch.
      3. stage-1 and stage-2 outputs bucket-pair on orderkey; buckets
         emit per-year partials; the driver folds <= buckets x years
         rows.  Revenue travels as int64 cents throughout."""
    import ray

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]
                ).to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    rk = reg.loc[reg["r_name"] == region, "r_regionkey"]
    region_nks = set(nat.loc[nat["n_regionkey"].isin(rk),
                             "n_nationkey"].astype("int64"))
    target_nks = set(nat.loc[nat["n_name"] == nation,
                             "n_nationkey"].astype("int64"))
    region_ref = ray.put(region_nks)

    empty_out = pd.DataFrame({"o_year": pd.Series(dtype="int32"),
                              "target_rev": pd.Series(dtype="float64"),
                              "total_rev": pd.Series(dtype="float64"),
                              "share_ppm": pd.Series(dtype="int64")})
    if not region_nks:
        # no such region -> no qualifying orders -> oracle returns 0
        # rows (inner join on qual); an absent NATION name, by
        # contrast, must still yield per-year rows with zero share
        return empty_out
    tks = np.sort(np.fromiter(target_nks, dtype="int64",
                              count=len(target_nks)))

    # ---- stage 1: qualifying orders (custkey semi-join) ----
    def cust_filter(b: pd.DataFrame) -> pd.DataFrame:
        nks = ray.get(region_ref)
        b = b[b["c_nationkey"].astype("int64").isin(nks)]
        return pd.DataFrame(
            {"key": b["c_custkey"].to_numpy().astype("int64")})

    # materialize: the region slice is 1/|regions| of a table ~10x
    # smaller than orders, and the broadcast-vs-bucket gate needs its
    # count before the orders plan builds
    cust_f = (_read(sf_dir, "customer",
                    columns=["c_custkey", "c_nationkey"])
              .map_batches(cust_filter, batch_format="pandas",
                           batch_size=131072).materialize())

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    if cust_f.count() <= broadcast_limit:
        ck_ref = ray.put(np.sort(
            cust_f.to_pandas()["key"].to_numpy().astype("int64")))

        def ord_semi(b: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(ck_ref)
            m = _semi_mask(ks, b["o_custkey"].to_numpy().astype("int64"))
            b = b[m]
            return pd.DataFrame({
                "okey": b["o_orderkey"].to_numpy().astype("int64"),
                "year": b["o_orderdate"].dt.year.to_numpy()
                        .astype("int32")})

        qual = orders.map_batches(ord_semi, batch_format="pandas",
                                  batch_size=131072)
    else:
        # distributed fallback: custkey bucket-paired join,
        # identical-columns union idiom
        cols1 = ["key", "year", "okey", "jb", "side"]

        def cust_side(b: pd.DataFrame) -> pd.DataFrame:
            ck = b["key"].to_numpy().astype("int64")
            n = len(b)
            return pd.DataFrame({
                "key": ck, "year": np.zeros(n, dtype="int32"),
                "okey": np.zeros(n, dtype="int64"),
                "jb": (ck % num_partitions).astype("int32"),
                "side": np.full(n, 1, dtype="int8")})[cols1]

        def ord_side(b: pd.DataFrame) -> pd.DataFrame:
            ck = b["o_custkey"].to_numpy().astype("int64")
            return pd.DataFrame({
                "key": ck,
                "year": b["o_orderdate"].dt.year.to_numpy()
                        .astype("int32"),
                "okey": b["o_orderkey"].to_numpy().astype("int64"),
                "jb": (ck % num_partitions).astype("int32"),
                "side": np.zeros(len(b), dtype="int8")})[cols1]

        def join_cust(group: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"okey": pd.Series(dtype="int64"),
                                  "year": pd.Series(dtype="int32")})
            o = group[group["side"] == 0]
            c = group[group["side"] == 1][["key"]].drop_duplicates()
            if o.empty or c.empty:
                return empty
            m = o.merge(c, on="key")
            return pd.DataFrame({"okey": m["okey"].to_numpy(),
                                 "year": m["year"].to_numpy()})

        qual = (orders.map_batches(ord_side, batch_format="pandas",
                                   batch_size=131072)
                .union(cust_f.map_batches(cust_side,
                                          batch_format="pandas"))
                .groupby("jb").map_groups(join_cust,
                                          batch_format="pandas"))

    # ---- stage 2: lineitem revenue tagged by supplier nation ----
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    # materialize: supplier is ~100x smaller than lineitem and the
    # broadcast-vs-bucket gate needs its count before the plan builds
    supp_m = supp.materialize()
    n_supp = supp_m.count()

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def _rev_c(b: pd.DataFrame) -> np.ndarray:
        return np.floor(b["l_extendedprice"].to_numpy()
                        * (1.0 - b["l_discount"].to_numpy()) * 100.0
                        + 0.5).astype("int64")

    li_cols = ["okey", "rev_c", "target_c"]

    if n_supp <= broadcast_limit:
        sdf = supp_m.to_pandas().sort_values("s_suppkey")
        sup_ref = ray.put((sdf["s_suppkey"].to_numpy().astype("int64"),
                           sdf["s_nationkey"].to_numpy().astype("int64")))
        def li_tag(b: pd.DataFrame) -> pd.DataFrame:
            keys, nks = ray.get(sup_ref)
            sk = b["l_suppkey"].to_numpy().astype("int64")
            hit, pos = _semi_probe(keys, sk)
            b, rev = b[hit], _rev_c(b)[hit]
            tgt = np.where(np.isin(nks[pos[hit]], tks),
                           rev, np.int64(0))
            g = (pd.DataFrame({
                    "okey": b["l_orderkey"].to_numpy().astype("int64"),
                    "rev_c": rev, "target_c": tgt})
                 .groupby("okey", as_index=False).sum())
            return g[li_cols]

        li_rev = li.map_batches(li_tag, batch_format="pandas",
                                batch_size=131072)
    else:
        # distributed fallback: suppkey bucket join, identical-columns
        # union idiom (see nation_trade_volume)
        fcols = ["sk", "okey", "rev_c", "nk", "jb", "side"]

        def li_part(b: pd.DataFrame) -> pd.DataFrame:
            sk = b["l_suppkey"].to_numpy().astype("int64")
            g = (pd.DataFrame({
                    "sk": sk,
                    "okey": b["l_orderkey"].to_numpy().astype("int64"),
                    "rev_c": _rev_c(b)})
                 .groupby(["sk", "okey"], as_index=False).sum())
            g["nk"] = np.int64(-1)
            g["jb"] = (g["sk"] % num_partitions).astype("int32")
            g["side"] = np.int8(0)
            return g[fcols]

        def supp_side(b: pd.DataFrame) -> pd.DataFrame:
            sk = b["s_suppkey"].to_numpy().astype("int64")
            n = len(b)
            return pd.DataFrame({
                "sk": sk, "okey": np.zeros(n, dtype="int64"),
                "rev_c": np.zeros(n, dtype="int64"),
                "nk": b["s_nationkey"].to_numpy().astype("int64"),
                "jb": (sk % num_partitions).astype("int32"),
                "side": np.full(n, 1, dtype="int8")})[fcols]

        def join_supp(group: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in li_cols})
            l = group[group["side"] == 0][["sk", "okey", "rev_c"]]
            s = group[group["side"] == 1][["sk", "nk"]]
            if l.empty or s.empty:
                return empty
            m = l.merge(s, on="sk")
            m["target_c"] = np.where(m["nk"].isin(tks),
                                     m["rev_c"], np.int64(0))
            return (m.groupby("okey", as_index=False)
                    [["rev_c", "target_c"]].sum())[li_cols]

        li_rev = (li.map_batches(li_part, batch_format="pandas",
                                 batch_size=131072)
                  .union(supp_m.map_batches(supp_side,
                                            batch_format="pandas"))
                  .groupby("jb").map_groups(join_supp,
                                            batch_format="pandas"))

    # ---- stage 3: orderkey bucket-paired join, per-year partials ----
    cols3 = ["okey", "year", "rev_c", "target_c", "jb", "side"]

    def qual_tag(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({
            "okey": b["okey"].to_numpy(), "year": b["year"].to_numpy(),
            "rev_c": np.zeros(n, dtype="int64"),
            "target_c": np.zeros(n, dtype="int64"),
            "jb": (b["okey"].to_numpy() % num_partitions).astype("int32"),
            "side": np.full(n, 1, dtype="int8")})[cols3]

    def li_tag3(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        return pd.DataFrame({
            "okey": b["okey"].to_numpy(),
            "year": np.zeros(n, dtype="int32"),
            "rev_c": b["rev_c"].to_numpy(),
            "target_c": b["target_c"].to_numpy(),
            "jb": (b["okey"].to_numpy() % num_partitions).astype("int32"),
            "side": np.zeros(n, dtype="int8")})[cols3]

    def join_year(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"year": pd.Series(dtype="int32"),
                              "rev_c": pd.Series(dtype="int64"),
                              "target_c": pd.Series(dtype="int64")})
        l = group[group["side"] == 0]
        q = group[group["side"] == 1][["okey", "year"]]
        if l.empty or q.empty:
            return empty
        per_okey = (l.groupby("okey", as_index=False)
                    [["rev_c", "target_c"]].sum())
        m = per_okey.merge(q, on="okey")
        return (m.groupby("year", as_index=False)
                [["rev_c", "target_c"]].sum())

    parts = (li_rev.map_batches(li_tag3, batch_format="pandas")
             .union(qual.map_batches(qual_tag, batch_format="pandas"))
             .groupby("jb").map_groups(join_year, batch_format="pandas"))
    agg = (_fold_pd(parts, pd.DataFrame({
               "year": pd.Series(dtype="int32"),
               "rev_c": pd.Series(dtype="int64"),
               "target_c": pd.Series(dtype="int64")}))
           .groupby("year", as_index=False)[["rev_c", "target_c"]].sum())
    if agg.empty:
        return empty_out
    out = pd.DataFrame({
        "o_year": agg["year"].astype("int32"),
        "target_rev": agg["target_c"].astype("int64") / 100.0,
        "total_rev": agg["rev_c"].astype("int64") / 100.0,
        "share_ppm": np.floor(
            1e6 * agg["target_c"].to_numpy().astype("float64")
            / agg["rev_c"].to_numpy().astype("float64")).astype("int64")})
    return out.sort_values("o_year").reset_index(drop=True)


MARKET_SHARE_SQL = """
WITH region_cust AS (
  SELECT c.c_custkey FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
), qual AS (
  SELECT o.o_orderkey, EXTRACT(year FROM o.o_orderdate)::INT AS o_year
  FROM orders o JOIN region_cust rc ON rc.c_custkey = o.o_custkey
), li AS (
  SELECT l.l_orderkey,
         CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100.0
                    + 0.5) AS BIGINT) AS rev_c,
         CASE WHEN n.n_name = 'NATION_2' THEN 1 ELSE 0 END AS is_target
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
)
SELECT q.o_year,
       SUM(li.rev_c * li.is_target) / 100.0 AS target_rev,
       SUM(li.rev_c) / 100.0 AS total_rev,
       CAST(FLOOR(1e6 * SUM(li.rev_c * li.is_target)::DOUBLE
                  / SUM(li.rev_c)) AS BIGINT) AS share_ppm
FROM qual q JOIN li ON li.l_orderkey = q.o_orderkey
GROUP BY q.o_year
ORDER BY q.o_year
"""


def type_cooccurrence(sf_dir: str, num_buckets: int = 64):
    """Market-basket pair affinity over event types: for each unordered
    type pair, how many users did both, plus the lift
    P(ab) / (P(a) P(b)) in ppm.

    One user-hash bucket shuffle of map-side-deduped (user, type)
    pairs; each bucket owns its users completely, so it emits exact
    per-pair counts, per-type user counts, and its distinct-user count
    (pair vocabulary is |types|^2 — tiny next to the events it
    summarizes).  Partial kinds ride one frame tagged by `kind`
    (0 = pair, 1 = single type, 2 = user-count sentinel); buckets
    partition users, so the driver folds by summing <= num_buckets x
    (|types|^2 + |types| + 1) rows and computes lift from integers."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def dedup(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates()
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["user_id", "event_type"])
        m = g.merge(g, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        pairs = (m.groupby(["event_type_x", "event_type_y"],
                           as_index=False).size()
                 .rename(columns={"event_type_x": "type_a",
                                  "event_type_y": "type_b",
                                  "size": "n"}))
        pairs["kind"] = np.int8(0)
        singles = (g.groupby("event_type", as_index=False)
                   .agg(n=("user_id", "size"))
                   .rename(columns={"event_type": "type_a"}))
        singles["type_b"] = ""
        singles["kind"] = np.int8(1)
        sentinel = pd.DataFrame({
            "type_a": [""], "type_b": [""],
            "n": [np.int64(g["user_id"].nunique())],
            "kind": [np.int8(2)]})
        out = pd.concat([pairs, singles, sentinel], ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out[["type_a", "type_b", "n", "kind"]]

    parts = (ds.map_batches(dedup, batch_format="pandas",
                            batch_size=131072)
             .groupby("ub").map_groups(bucket_pairs,
                                       batch_format="pandas"))
    empty = pd.DataFrame({"type_a": pd.Series(dtype="object"),
                          "type_b": pd.Series(dtype="object"),
                          "n_both": pd.Series(dtype="int64"),
                          "lift_ppm": pd.Series(dtype="int64")})
    df = _fold_pd(parts, pd.DataFrame({
        "type_a": pd.Series(dtype="object"),
        "type_b": pd.Series(dtype="object"),
        "n": pd.Series(dtype="int64"),
        "kind": pd.Series(dtype="int8")}))
    if df.empty:
        return empty
    fold = df.groupby(["kind", "type_a", "type_b"],
                      as_index=False)["n"].sum()
    total = int(fold.loc[fold["kind"] == 2, "n"].sum())
    n_t = dict(zip(fold.loc[fold["kind"] == 1, "type_a"],
                   fold.loc[fold["kind"] == 1, "n"]))
    pairs = fold[fold["kind"] == 0].copy()
    if pairs.empty or total == 0:
        return empty
    na = pairs["type_a"].map(n_t).to_numpy().astype("int64")
    nb = pairs["type_b"].map(n_t).to_numpy().astype("int64")
    nb_both = pairs["n"].to_numpy().astype("int64")
    out = pd.DataFrame({
        "type_a": pairs["type_a"].to_numpy(),
        "type_b": pairs["type_b"].to_numpy(),
        "n_both": nb_both,
        "lift_ppm": np.floor(
            1e6 * (nb_both * total).astype("float64")
            / (na * nb)).astype("int64")})
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True))


TYPE_COOCCURRENCE_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT count(DISTINCT user_id) AS n FROM events),
tc AS (SELECT event_type, count(*)::BIGINT AS n_t FROM ut GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both,
       CAST(FLOOR(1e6 * (p.n_both * tot.n)::DOUBLE
                  / (ta.n_t * tb.n_t)) AS BIGINT) AS lift_ppm
FROM pairs p CROSS JOIN tot
JOIN tc ta ON ta.event_type = p.type_a
JOIN tc tb ON tb.event_type = p.type_b
ORDER BY p.type_a, p.type_b
"""


def _token_doc_pairs(b: "pd.DataFrame", num_buckets: int) -> "pd.DataFrame":
    """Distinct (token, doc_id) pairs of a batch, keyed by the index's
    token-hash bucket — the ONE definition shared by search_index,
    search_index_write and token_bucket (their hashing must agree or
    query-time partition pruning misses postings)."""
    toks = _ws_tokens(b["text"])
    if toks.empty:
        return pd.DataFrame({"token": pd.Series(dtype="object"),
                             "doc_id": pd.Series(dtype="int64"),
                             "tb": pd.Series(dtype="int32")})
    ex = pd.DataFrame({
        "token": toks.to_numpy(),
        "doc_id": b["doc_id"].reindex(toks.index).to_numpy()
                  .astype("int64")}).drop_duplicates()
    ex["tb"] = (pd.util.hash_pandas_object(ex["token"], index=False)
                % num_buckets).astype("int32")
    return ex


def search_index(sf_dir: str, max_postings: int = 20,
                 num_buckets: int = 32):
    """Inverted-index construction: token -> document frequency +
    the first `max_postings` doc ids (sorted).  The postings CAP is
    part of the contract (a web-scale index materializes per-token
    posting FILES, not unbounded rows) — df still counts every doc.

    Map-side (doc, token) dedup, token-hash bucket shuffle (each
    bucket owns its tokens completely), per-bucket exact df + sorted
    capped postings; the vocabulary never assembles on one node —
    the driver only concatenates per-bucket results for the return."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bucket_index(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["token", "doc_id"])
        g = g.sort_values(["token", "doc_id"])
        agg = g.groupby("token", as_index=False).agg(
            df=("doc_id", "size"),
            postings=("doc_id", lambda s: ",".join(
                map(str, s.iloc[:max_postings]))))
        agg["df"] = agg["df"].astype("int64")
        return agg

    parts = (ds.map_batches(
                 lambda b: _token_doc_pairs(b, num_buckets),
                 batch_format="pandas")
             .groupby("tb").map_groups(bucket_index,
                                       batch_format="pandas"))
    out = _fold_pd(parts, pd.DataFrame({
        "token": pd.Series(dtype="object"),
        "df": pd.Series(dtype="int64"),
        "postings": pd.Series(dtype="object")}))
    return out.sort_values("token").reset_index(drop=True)


SEARCH_INDEX_SQL = r"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(list_filter(
    regexp_split_to_array(lower(coalesce(text, '')), '[ \t\n\f\r]+'),
    x -> x <> '')) AS token
  FROM documents
)
SELECT token, count(*)::BIGINT AS df,
       array_to_string(list_slice(list_sort(list(doc_id)), 1, 20),
                       ',') AS postings
FROM toks GROUP BY token
ORDER BY token
"""


def search_index_write(sf_dir: str, out_dir: str, num_buckets: int = 32):
    """Persist the inverted index as token-bucket-partitioned Parquet:
    `out_dir/tb=K/*.parquet`, one row per token with its full sorted
    posting list (`list<int64>`).  This is the 100 TB layout — a query
    reads ONLY its terms' bucket partitions from storage (partition
    pruning at the read, no vocabulary scan).  At web scale a hot
    token's postings would additionally chunk into fixed-size segments
    per row; df counts every doc either way."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bucket_rows(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(subset=["token", "doc_id"])
             .sort_values(["token", "doc_id"]))
        agg = g.groupby("token", as_index=False).agg(
            df=("doc_id", "size"), postings=("doc_id", list))
        agg["df"] = agg["df"].astype("int64")
        agg["tb"] = np.int64(g["tb"].iloc[0])
        return agg

    (ds.map_batches(lambda b: _token_doc_pairs(b, num_buckets),
                    batch_format="pandas")
        .groupby("tb").map_groups(bucket_rows, batch_format="pandas")
        .write_parquet(out_dir, partition_cols=["tb"]))
    return out_dir


def token_bucket(tokens, num_buckets: int = 32) -> list[int]:
    """The index's token -> partition map (must match
    search_index_write's hashing)."""
    return (pd.util.hash_pandas_object(
        pd.Series(list(tokens)), index=False) % num_buckets).astype(
        "int64").tolist()


def keyword_query(index_dir: str, terms: list[str], k: int = 10,
                  num_buckets: int = 32) -> pd.DataFrame:
    """Query the persisted inverted index: read ONLY the partitions of
    the query terms' buckets, union the terms' posting lists, rank
    docs by matched-term count (ties: doc_id).  Returns (doc_id,
    n_matched) top-k."""
    import glob as _glob

    import ray.data as rd

    terms = [t.lower() for t in terms]
    want = sorted(set(token_bucket(terms, num_buckets)))
    paths = [p for b in want
             for p in sorted(_glob.glob(
                 os.path.join(index_dir, f"tb={b}", "*.parquet")))]
    if not paths:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_matched": pd.Series(dtype="int64")})
    term_set = set(terms)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        hit = b[b["token"].isin(term_set)]
        if hit.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_matched": pd.Series(dtype="int64")})
        ex = hit[["token", "postings"]].explode("postings")
        out = (ex.groupby("postings", as_index=False)
               .agg(n_matched=("token", "nunique"))
               .rename(columns={"postings": "doc_id"}))
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_matched"] = out["n_matched"].astype("int64")
        return out

    parts = (rd.read_parquet(paths)
             .map_batches(score, batch_format="pandas").to_pandas())
    if parts.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_matched": pd.Series(dtype="int64")})
    # per-bucket partials: a doc can match terms from several buckets
    out = parts.groupby("doc_id", as_index=False)["n_matched"].sum()
    out["n_matched"] = out["n_matched"].astype("int64")
    return (out.sort_values(["n_matched", "doc_id"],
                            ascending=[False, True])
            .head(k).reset_index(drop=True))


def top_supplier_revenue(sf_dir: str, date_from: str = "1996-01-01",
                         date_to: str = "1996-04-01",
                         num_buckets: int = 64):
    """Q15-shape maximum aggregate with ties kept: the supplier(s)
    whose quarterly lineitem revenue equals the global maximum.

    Map-side per-supplier partial sums, suppkey-hash bucket merge
    (each bucket owns its suppliers completely), per-bucket max
    candidate(s) only to the driver (<= a few rows per bucket — the
    supplier revenue table itself, which scales with the fact table,
    never leaves the cluster), global max + tie filter on the driver,
    names via a broadcast semi-join read.  Revenue in int64 cents."""
    import ray

    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_shipdate",
                        "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        rev = np.floor(b["l_extendedprice"].to_numpy()
                       * (1.0 - b["l_discount"].to_numpy()) * 100.0
                       + 0.5).astype("int64")
        g = (pd.DataFrame({"skey": b["l_suppkey"].to_numpy()
                           .astype("int64"), "total_c": rev})
             .groupby("skey", as_index=False)["total_c"].sum())
        g["sb"] = (g["skey"] % num_buckets).astype("int32")
        return g

    def bucket_max(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("skey", as_index=False)["total_c"].sum()
        m["total_c"] = m["total_c"].astype("int64")
        # only this bucket's max (with ties) can be the global max
        return m[m["total_c"] == m["total_c"].max()]

    cand = _fold_pd(
        (li.map_batches(partial, batch_format="pandas",
                        batch_size=131072)
         .groupby("sb").map_groups(bucket_max, batch_format="pandas")),
        pd.DataFrame({"skey": pd.Series(dtype="int64"),
                      "total_c": pd.Series(dtype="int64")}))
    empty = pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                          "s_name": pd.Series(dtype="object"),
                          "total_revenue": pd.Series(dtype="float64")})
    if cand.empty:
        return empty
    best = int(cand["total_c"].max())
    top = cand[cand["total_c"] == best]

    keys_ref = ray.put(np.sort(top["skey"].to_numpy().astype("int64")))

    def name_filter(b: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        m = _semi_mask(ks, b["s_suppkey"].to_numpy().astype("int64"))
        return b[m][["s_suppkey", "s_name"]]

    names = _fold_pd(
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        .map_batches(name_filter, batch_format="pandas"),
        pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                      "s_name": pd.Series(dtype="object")}))
    out = top.merge(names, left_on="skey", right_on="s_suppkey")
    out["total_revenue"] = out["total_c"].astype("int64") / 100.0
    return (out.sort_values("s_suppkey")
            [["s_suppkey", "s_name", "total_revenue"]]
            .reset_index(drop=True))


TOP_SUPPLIER_REVENUE_SQL = """
WITH rev AS (
  SELECT l_suppkey AS skey,
         SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0
                        + 0.5) AS BIGINT)) AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.total_c / 100.0 AS total_revenue
FROM rev JOIN supplier s ON s.s_suppkey = rev.skey
WHERE rev.total_c = (SELECT max(total_c) FROM rev)
ORDER BY s.s_suppkey
"""


def late_shipment_priority(sf_dir: str, late_days: int = 60,
                           num_partitions: int = 64):
    """Q12-shape conditional aggregation over a big-big join: count
    high- vs low-priority lines by late/on-time ship status (late :=
    shipped more than `late_days` after the order date — this schema
    has no commit/receipt dates).

    lineitem pre-aggregates map-side to per-(order, shipdate-late-side)
    counts?  No — lateness needs o_orderdate, so lineitem ships one
    (orderkey, shipdate) row per LINE into the orderkey bucket join
    (identical-columns union); each bucket classifies its own lines and
    emits a 2x2 partial, so the driver folds <= num_partitions x 2
    rows.  One shuffle total."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"])
    # the lineitem (dominant) side must not ship a per-line Python
    # object column just to satisfy the identical-columns union: the
    # priority-class test collapses to an int8 computed on the (much
    # smaller) orders side
    cols = ["key", "d", "is_high", "jb", "side"]
    high = ("1-URGENT", "2-HIGH")

    def li_side(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["l_orderkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": ok, "d": b["l_shipdate"],
            "is_high": np.zeros(len(b), dtype="int8"),
            "jb": (ok % num_partitions).astype("int32"),
            "side": np.zeros(len(b), dtype="int8")})[cols]

    def ord_side(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["o_orderkey"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": ok, "d": b["o_orderdate"],
            "is_high": b["o_orderpriority"].isin(high).to_numpy()
                       .astype("int8"),
            "jb": (ok % num_partitions).astype("int32"),
            "side": np.ones(len(b), dtype="int8")})[cols]

    off = pd.Timedelta(days=late_days)

    def bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["side"] == 0][["key", "d"]]
        o = (group[group["side"] == 1][["key", "d", "is_high"]]
             .rename(columns={"d": "odate"}))
        empty = pd.DataFrame({
            "ship_status": pd.Series(dtype="object"),
            "high_line_count": pd.Series(dtype="int64"),
            "low_line_count": pd.Series(dtype="int64")})
        if l.empty or o.empty:
            return empty
        m = l.merge(o, on="key")
        if m.empty:
            return empty
        late = m["d"] > (m["odate"] + off)
        is_high = m["is_high"].to_numpy().astype(bool)
        g = pd.DataFrame({
            "ship_status": np.where(late, "late", "ontime"),
            "high_line_count": is_high.astype("int64"),
            "low_line_count": (~is_high).astype("int64")})
        return (g.groupby("ship_status", as_index=False)
                [["high_line_count", "low_line_count"]].sum())

    parts = (li.map_batches(li_side, batch_format="pandas",
                            batch_size=131072)
             .union(orders.map_batches(ord_side, batch_format="pandas",
                                       batch_size=131072))
             .groupby("jb").map_groups(bucket, batch_format="pandas"))
    out = (_fold_pd(parts, pd.DataFrame({
               "ship_status": pd.Series(dtype="object"),
               "high_line_count": pd.Series(dtype="int64"),
               "low_line_count": pd.Series(dtype="int64")}))
           .groupby("ship_status", as_index=False)
           [["high_line_count", "low_line_count"]].sum())
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out.sort_values("ship_status").reset_index(drop=True)


LATE_SHIPMENT_PRIORITY_SQL = """
SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
            THEN 'late' ELSE 'ontime' END AS ship_status,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: per-part minimum-cost supplier within a region.
# The testdata has no partsupp table, so lineitem's distinct
# (partkey, suppkey) pairs ARE the part<->supplier relation (same join
# topology, same per-group argmin + deterministic tie-break).  Two
# bucket joins, nothing fact-sized broadcast: pairs dedup map-side,
# join supplier attrs on a suppkey bucket, re-key to a partkey bucket
# for the filtered-part inner join + per-part argmin; only the result
# (<= |filtered parts| rows, then LIMIT k) reaches the driver.
# ---------------------------------------------------------------------------

def min_cost_supplier(sf_dir: str, region: str = "EUROPE",
                      p_type: str = "STANDARD", k: int = 100,
                      num_partitions: int = 64):
    import ray

    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    rk = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nation = nation[nation["n_regionkey"].isin(rk)]
    nat_names = dict(zip(nation["n_nationkey"].astype("int64"),
                         nation["n_name"]))
    nat_ref = ray.put(set(nat_names))

    cols = ["pk", "sk", "bal_c", "nk", "s_name", "jb", "side"]

    def _empty():
        return pd.DataFrame({
            "pk": pd.Series(dtype="int64"),
            "sk": pd.Series(dtype="int64"),
            "bal_c": pd.Series(dtype="int64"),
            "nk": pd.Series(dtype="int64"),
            "s_name": pd.Series(dtype="object"),
            "jb": pd.Series(dtype="int32"),
            "side": pd.Series(dtype="int8")})

    # side 0: per-batch distinct (partkey, suppkey), bucketed on suppkey
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def li_pairs(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"pk": b["l_partkey"].astype("int64"),
                           "sk": b["l_suppkey"].astype("int64")})
             .drop_duplicates())
        g["bal_c"] = np.int64(0)
        g["nk"] = np.int64(0)
        g["s_name"] = ""
        g["jb"] = (g["sk"] % num_partitions).astype("int32")
        g["side"] = np.int8(0)
        return g[cols]

    # side 1: region-filtered supplier attrs (acctbal in exact cents)
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name", "s_nationkey",
                          "s_acctbal"])

    def supp_side(b: pd.DataFrame) -> pd.DataFrame:
        keep = ray.get(nat_ref)
        b = b[b["s_nationkey"].isin(keep)]
        sk = b["s_suppkey"].to_numpy().astype("int64")
        g = pd.DataFrame({
            "pk": np.zeros(len(b), dtype="int64"),
            "sk": sk,
            "bal_c": np.floor(b["s_acctbal"].to_numpy() * 100.0
                              + 0.5).astype("int64"),
            "nk": b["s_nationkey"].to_numpy().astype("int64"),
            "s_name": b["s_name"].to_numpy(),
            "jb": (sk % num_partitions).astype("int32"),
            "side": np.full(len(b), 1, dtype="int8")})
        return g[cols]

    def join_supp(group: pd.DataFrame) -> pd.DataFrame:
        s = group[group["side"] == 1][["sk", "bal_c", "nk", "s_name"]]
        l = group[group["side"] == 0][["pk", "sk"]].drop_duplicates()
        if s.empty or l.empty:
            return _empty()
        m = l.merge(s, on="sk")
        m["jb"] = (m["pk"] % num_partitions).astype("int32")
        m["side"] = np.int8(0)
        return m[cols]

    pairs = (li.map_batches(li_pairs, batch_format="pandas",
                            batch_size=131072)
             .union(supp.map_batches(supp_side, batch_format="pandas"))
             .groupby("jb").map_groups(join_supp, batch_format="pandas"))

    # side 1 (second join): type-filtered parts, bucketed on partkey
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def part_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["p_type"] == p_type]
        pk = b["p_partkey"].to_numpy().astype("int64")
        g = pd.DataFrame({
            "pk": pk,
            "sk": np.zeros(len(b), dtype="int64"),
            "bal_c": np.zeros(len(b), dtype="int64"),
            "nk": np.zeros(len(b), dtype="int64"),
            "s_name": np.full(len(b), "", dtype=object),
            "jb": (pk % num_partitions).astype("int32"),
            "side": np.full(len(b), 1, dtype="int8")})
        return g[cols]

    def argmin_per_part(group: pd.DataFrame) -> pd.DataFrame:
        p = group[group["side"] == 1][["pk"]].drop_duplicates()
        l = group[group["side"] == 0]
        if p.empty or l.empty:
            return _empty().drop(columns=["jb", "side"])
        m = l.merge(p, on="pk").drop_duplicates(["pk", "sk"])
        # argmin acctbal per part; ties broken by suppkey asc (the
        # oracle's ROW_NUMBER ORDER BY s_acctbal, s_suppkey)
        m = m.sort_values(["pk", "bal_c", "sk"], kind="stable")
        return (m.groupby("pk", as_index=False).head(1)
                [["pk", "sk", "bal_c", "nk", "s_name"]])

    winners = (pairs.union(part.map_batches(part_side,
                                            batch_format="pandas"))
               .groupby("jb").map_groups(argmin_per_part,
                                         batch_format="pandas"))
    out = _fold_pd(winners, pd.DataFrame({
        "pk": pd.Series(dtype="int64"), "sk": pd.Series(dtype="int64"),
        "bal_c": pd.Series(dtype="int64"), "nk": pd.Series(dtype="int64"),
        "s_name": pd.Series(dtype="object")}))
    if out.empty:
        return pd.DataFrame({
            "s_acctbal": pd.Series(dtype="float64"),
            "s_name": pd.Series(dtype="object"),
            "n_name": pd.Series(dtype="object"),
            "p_partkey": pd.Series(dtype="int64")})
    out["s_acctbal"] = out["bal_c"].astype("int64") / 100.0
    out["n_name"] = out["nk"].map(nat_names)
    out = out.rename(columns={"pk": "p_partkey"})
    out = out.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                          ascending=[False, True, True, True],
                          kind="stable").head(k)
    return (out[["s_acctbal", "s_name", "n_name", "p_partkey"]]
            .reset_index(drop=True))


MIN_COST_SUPPLIER_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
), ranked AS (
  SELECT p.p_partkey, s.s_name, s.s_nationkey,
         CAST(FLOOR(s.s_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_c,
         ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                            ORDER BY FLOOR(s.s_acctbal * 100.0 + 0.5),
                                     s.s_suppkey) AS rn
  FROM pairs
  JOIN part p ON p.p_partkey = pairs.pk
  JOIN supplier s ON s.s_suppkey = pairs.sk
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
)
SELECT ranked.bal_c / 100.0 AS s_acctbal, ranked.s_name, n.n_name,
       ranked.p_partkey
FROM ranked JOIN nation n ON n.n_nationkey = ranked.s_nationkey
WHERE rn = 1
ORDER BY s_acctbal DESC, n.n_name, ranked.s_name, ranked.p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: profit by (supplier nation, order year) for parts
# whose name matches a prefix.  No partsupp table in the testdata, so
# profit = sum(extendedprice * (1 - discount)) in exact cents (the
# supplycost term has no source column; the join topology —
# lineitem |X| part |X| supplier |X| orders |X| nation — is intact).
# Dimension sides: the name-filtered partkey set and the
# suppkey->nationkey map are broadcast once via ray.put when under
# `dim_broadcast_limit` rows (the part filter is selective; supplier is
# ~1/60000 of lineitem) — past the gate each falls back to a bucket
# join on its own key.  orders is fact-sized and always joins on an
# orderkey bucket; only (nation, year) partials reach the driver.
# ---------------------------------------------------------------------------

def product_type_profit(sf_dir: str, name_prefix: str = "red",
                        num_partitions: int = 64,
                        dim_broadcast_limit: int = 2_000_000):
    import ray

    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    nat_names = dict(zip(nation["n_nationkey"].astype("int64"),
                         nation["n_name"]))

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def part_filter(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["p_name"].str.startswith(name_prefix)]
        return pd.DataFrame(
            {"p_partkey": b["p_partkey"].to_numpy().astype("int64")})

    # materialize: the gate decision needs the count, and both are tiny
    # relative to the fact scan (filtered keys / one int per supplier)
    part_f = part.map_batches(part_filter,
                              batch_format="pandas").materialize()
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).materialize()

    cols = ["key", "nk", "year", "rev_c", "jb", "side"]

    def _empty():
        return pd.DataFrame({
            "key": pd.Series(dtype="int64"),
            "nk": pd.Series(dtype="int64"),
            "year": pd.Series(dtype="int64"),
            "rev_c": pd.Series(dtype="int64"),
            "jb": pd.Series(dtype="int32"),
            "side": pd.Series(dtype="int8")})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def li_rev(b: pd.DataFrame) -> tuple:
        rev = np.floor(b["l_extendedprice"].to_numpy()
                       * (1.0 - b["l_discount"].to_numpy()) * 100.0
                       + 0.5).astype("int64")
        return (b["l_orderkey"].to_numpy().astype("int64"),
                b["l_partkey"].to_numpy().astype("int64"),
                b["l_suppkey"].to_numpy().astype("int64"), rev)

    if (part_f.count() <= dim_broadcast_limit
            and supp.count() <= dim_broadcast_limit):
        pk_ref = ray.put(np.sort(_fold_pd(
            part_f, pd.DataFrame({"p_partkey": pd.Series(
                dtype="int64")}))["p_partkey"].to_numpy()))
        sdf = supp.to_pandas().sort_values("s_suppkey")
        sup_ref = ray.put((sdf["s_suppkey"].to_numpy().astype("int64"),
                           sdf["s_nationkey"].to_numpy().astype("int64")))

        def li_semi(b: pd.DataFrame) -> pd.DataFrame:
            ok, pk, sk, rev = li_rev(b)
            keep = _semi_mask(ray.get(pk_ref), pk)
            skeys, snk = ray.get(sup_ref)
            hit, pos = _semi_probe(skeys, sk)
            keep &= hit
            g = (pd.DataFrame({"key": ok[keep], "nk": snk[pos[keep]],
                               "rev_c": rev[keep]})
                 .groupby(["key", "nk"], as_index=False)
                 .agg(rev_c=("rev_c", "sum")))
            g["year"] = np.int64(0)
            g["jb"] = (g["key"] % num_partitions).astype("int32")
            g["side"] = np.int8(0)
            return g[cols]

        li_tagged = li.map_batches(li_semi, batch_format="pandas",
                                   batch_size=131072)
    else:
        # distributed fallback: partkey bucket semi-join, then suppkey
        # bucket join to attach the nation — nothing broadcast
        def li_side(b: pd.DataFrame) -> pd.DataFrame:
            ok, pk, sk, rev = li_rev(b)
            g = pd.DataFrame({"key": pk, "nk": sk, "year": ok,
                              "rev_c": rev})
            g["jb"] = (g["key"] % num_partitions).astype("int32")
            g["side"] = np.int8(0)
            return g[cols]

        def pk_side(b: pd.DataFrame) -> pd.DataFrame:
            pk = b["p_partkey"].to_numpy().astype("int64")
            g = pd.DataFrame({"key": pk})
            g["nk"] = np.int64(0)
            g["year"] = np.int64(0)
            g["rev_c"] = np.int64(0)
            g["jb"] = (pk % num_partitions).astype("int32")
            g["side"] = np.int8(1)
            return g[cols]

        def semi_part(group: pd.DataFrame) -> pd.DataFrame:
            keys = group.loc[group["side"] == 1, "key"].to_numpy()
            l = group[group["side"] == 0]
            if len(keys) == 0 or l.empty:
                return _empty()
            l = l[_semi_mask(np.sort(keys), l["key"].to_numpy())]
            # re-key on suppkey (carried in nk) for the nation join
            g = l.copy()
            g["key"] = g["nk"].to_numpy()
            g["jb"] = (g["key"] % num_partitions).astype("int32")
            return g[cols]

        def sk_side(b: pd.DataFrame) -> pd.DataFrame:
            sk = b["s_suppkey"].to_numpy().astype("int64")
            g = pd.DataFrame({"key": sk,
                              "nk": b["s_nationkey"].to_numpy()
                              .astype("int64")})
            g["year"] = np.int64(0)
            g["rev_c"] = np.int64(0)
            g["jb"] = (sk % num_partitions).astype("int32")
            g["side"] = np.int8(1)
            return g[cols]

        def join_supp(group: pd.DataFrame) -> pd.DataFrame:
            s = group[group["side"] == 1][["key", "nk"]]
            l = group[group["side"] == 0][["key", "year", "rev_c"]]
            if s.empty or l.empty:
                return _empty()
            m = l.merge(s, on="key")
            g = (pd.DataFrame({"key": m["year"].to_numpy(),  # orderkey
                               "nk": m["nk"].to_numpy(),
                               "rev_c": m["rev_c"].to_numpy()})
                 .groupby(["key", "nk"], as_index=False)
                 .agg(rev_c=("rev_c", "sum")))
            g["year"] = np.int64(0)
            g["jb"] = (g["key"] % num_partitions).astype("int32")
            g["side"] = np.int8(0)
            return g[cols]

        li_tagged = (li.map_batches(li_side, batch_format="pandas",
                                    batch_size=131072)
                     .union(part_f.map_batches(pk_side,
                                               batch_format="pandas"))
                     .groupby("jb").map_groups(semi_part,
                                               batch_format="pandas")
                     .union(supp.map_batches(sk_side,
                                             batch_format="pandas"))
                     .groupby("jb").map_groups(join_supp,
                                               batch_format="pandas"))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def ord_side(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["o_orderkey"].to_numpy().astype("int64")
        g = pd.DataFrame({
            "key": ok,
            "nk": np.zeros(len(b), dtype="int64"),
            "year": pd.DatetimeIndex(b["o_orderdate"]).year
            .to_numpy().astype("int64"),
            "rev_c": np.zeros(len(b), dtype="int64"),
            "jb": (ok % num_partitions).astype("int32"),
            "side": np.full(len(b), 1, dtype="int8")})
        return g[cols]

    def join_orders(group: pd.DataFrame) -> pd.DataFrame:
        o = group[group["side"] == 1][["key", "year"]]
        l = group[group["side"] == 0][["key", "nk", "rev_c"]]
        if o.empty or l.empty:
            return pd.DataFrame({"nk": pd.Series(dtype="int64"),
                                 "year": pd.Series(dtype="int64"),
                                 "rev_c": pd.Series(dtype="int64")})
        m = l.merge(o, on="key")
        return (m.groupby(["nk", "year"], as_index=False)
                .agg(rev_c=("rev_c", "sum")))

    parts = (li_tagged
             .union(orders.map_batches(ord_side, batch_format="pandas",
                                       batch_size=131072))
             .groupby("jb").map_groups(join_orders,
                                       batch_format="pandas"))
    out = _fold_pd(parts, pd.DataFrame({
        "nk": pd.Series(dtype="int64"),
        "year": pd.Series(dtype="int64"),
        "rev_c": pd.Series(dtype="int64")}))
    if out.empty:
        return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                             "o_year": pd.Series(dtype="int64"),
                             "profit": pd.Series(dtype="float64")})
    g = (out.groupby(["nk", "year"], as_index=False)
         .agg(rev_c=("rev_c", "sum")))
    g["n_name"] = g["nk"].map(nat_names)
    g["o_year"] = g["year"].astype("int64")
    g["profit"] = g["rev_c"].astype("int64") / 100.0
    return (g.sort_values(["n_name", "o_year"], ascending=[True, False],
                          kind="stable")
            [["n_name", "o_year", "profit"]].reset_index(drop=True))


PRODUCT_TYPE_PROFIT_SQL = """
SELECT n.n_name, CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
       SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100.0
                      + 0.5) AS BIGINT))::BIGINT / 100.0 AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE 'red%'
GROUP BY n.n_name, YEAR(o.o_orderdate)
ORDER BY n.n_name, o_year DESC
"""


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: parts whose total line value exceeds a global
# scalar threshold.  No partsupp table, so "value" is
# sum(extendedprice * (1 - discount)) per partkey over lineitem (same
# global-scalar-subquery shape: a grouped sum filtered against an
# aggregate of the ungrouped corpus).  Q11's literal fraction is
# defined to scale with SF (TPC-H spec: 0.0001/SF), so a fixed
# fraction degenerates to zero rows as the corpus grows; the
# scale-free equivalent is "value above num/den x the MEAN part
# value".  One shuffle: map-side per-part cent partials -> partkey
# bucket merge; the threshold (total_c * num) // (n_parts * den) is
# computed in Python bigint on the driver and the strict > against it
# is EXACTLY equivalent to value_c * n_parts * den > total_c * num
# (a*b > c  <=>  a > c//b for positive ints), so no float boundary or
# int64 overflow can disagree with the oracle.
# ---------------------------------------------------------------------------

def important_part_value(sf_dir: str, factor_num: int = 5,
                         factor_den: int = 4, num_buckets: int = 64):
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = np.floor(b["l_extendedprice"].to_numpy()
                       * (1.0 - b["l_discount"].to_numpy()) * 100.0
                       + 0.5).astype("int64")
        g = (pd.DataFrame({"p_partkey": b["l_partkey"].astype("int64"),
                           "value_c": rev})
             .groupby("p_partkey", as_index=False)
             .agg(value_c=("value_c", "sum")))
        g["jb"] = (g["p_partkey"] % num_buckets).astype("int32")
        return g

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("p_partkey", as_index=False)
             .agg(value_c=("value_c", "sum")))
        g["value_c"] = g["value_c"].astype("int64")
        return g

    # consumed three times (count, total, filter) — one small pass each
    per_part = (li.map_batches(partial, batch_format="pandas",
                               batch_size=131072)
                .groupby("jb").map_groups(merge, batch_format="pandas")
                .materialize())
    n_parts = per_part.count()
    if n_parts == 0:
        return pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                             "value": pd.Series(dtype="float64")})
    total_c = int(per_part.sum("value_c") or 0)
    # exact integer threshold: v > (total*num) // (n*den)  <=>
    # v * n * den > total * num for positive ints
    thresh = (total_c * factor_num) // (n_parts * factor_den)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value_c"].astype("int64") > thresh]
        return pd.DataFrame({
            "p_partkey": b["p_partkey"].astype("int64"),
            "value": b["value_c"].astype("int64") / 100.0})

    out = _fold_pd(per_part.map_batches(keep, batch_format="pandas"),
                   pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                                 "value": pd.Series(dtype="float64")}))
    if out.empty:
        return pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                             "value": pd.Series(dtype="float64")})
    return (out.sort_values(["value", "p_partkey"],
                            ascending=[False, True], kind="stable")
            .reset_index(drop=True))


IMPORTANT_PART_VALUE_SQL = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0
                        + 0.5) AS BIGINT))::BIGINT AS value_c
  FROM lineitem GROUP BY l_partkey
)
SELECT p_partkey, value_c / 100.0 AS value
FROM per_part
WHERE value_c::HUGEINT * (SELECT COUNT(*) FROM per_part) * 4
      > (SELECT SUM(value_c)::HUGEINT FROM per_part) * 5
ORDER BY value DESC, p_partkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: distinct-supplier count per (brand, type, size)
# with a brand/size predicate and an excluded-supplier anti-join.
# lineitem's distinct (partkey, suppkey) pairs stand in for partsupp;
# suppliers with a negative account balance stand in for the
# "complaints" exclusion (same anti-join shape — the exclusion set is
# tiny and broadcast once).  Two shuffles: pairs dedup + part-attr
# attach on a partkey bucket, then a (brand,type,size) hash bucket
# where the per-group distinct-supplier count is exact (pairs arrive
# already deduped, every (group, suppkey) lands in one bucket).
# ---------------------------------------------------------------------------

_Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def supplier_part_counts(sf_dir: str, excl_brand: str = "Brand#5",
                         sizes: tuple = _Q16_SIZES,
                         num_partitions: int = 64):
    import ray

    # exclusion set: tiny by construction (complaint suppliers)
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    def bad_supp(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["s_acctbal"] < 0.0]
        return pd.DataFrame(
            {"sk": b["s_suppkey"].to_numpy().astype("int64")})

    bad = np.sort(_fold_pd(
        supp.map_batches(bad_supp, batch_format="pandas"),
        pd.DataFrame({"sk": pd.Series(dtype="int64")}))["sk"].to_numpy())
    bad_ref = ray.put(bad)

    cols = ["pk", "sk", "p_brand", "p_type", "p_size", "jb", "side"]

    def _empty():
        return pd.DataFrame({
            "pk": pd.Series(dtype="int64"),
            "sk": pd.Series(dtype="int64"),
            "p_brand": pd.Series(dtype="object"),
            "p_type": pd.Series(dtype="object"),
            "p_size": pd.Series(dtype="int64"),
            "jb": pd.Series(dtype="int32"),
            "side": pd.Series(dtype="int8")})

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def li_pairs(b: pd.DataFrame) -> pd.DataFrame:
        sk = b["l_suppkey"].to_numpy().astype("int64")
        keep = ~_semi_mask(ray.get(bad_ref), sk)
        g = (pd.DataFrame({"pk": b["l_partkey"].to_numpy()
                           .astype("int64")[keep], "sk": sk[keep]})
             .drop_duplicates())
        g["p_brand"] = ""
        g["p_type"] = ""
        g["p_size"] = np.int64(0)
        g["jb"] = (g["pk"] % num_partitions).astype("int32")
        g["side"] = np.int8(0)
        return g[cols]

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_type", "p_size"])
    size_set = set(int(s) for s in sizes)

    def part_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["p_brand"] != excl_brand)
              & b["p_size"].isin(size_set)]
        pk = b["p_partkey"].to_numpy().astype("int64")
        g = pd.DataFrame({
            "pk": pk,
            "sk": np.zeros(len(b), dtype="int64"),
            "p_brand": b["p_brand"].to_numpy(),
            "p_type": b["p_type"].to_numpy(),
            "p_size": b["p_size"].to_numpy().astype("int64"),
            "jb": (pk % num_partitions).astype("int32"),
            "side": np.full(len(b), 1, dtype="int8")})
        return g[cols]

    def attach_part(group: pd.DataFrame) -> pd.DataFrame:
        p = group[group["side"] == 1][["pk", "p_brand", "p_type",
                                       "p_size"]]
        l = group[group["side"] == 0][["pk", "sk"]].drop_duplicates()
        if p.empty or l.empty:
            return _empty()
        # distinct (group, suppkey) contributions; re-bucket on the
        # output group key so the distinct count is bucket-local-exact
        m = (l.merge(p, on="pk")
             [["p_brand", "p_type", "p_size", "sk"]].drop_duplicates())
        m = m.rename(columns={"sk": "sk"})
        m["pk"] = np.int64(0)
        m["jb"] = (pd.util.hash_pandas_object(
            m["p_brand"].astype(str) + "|" + m["p_type"].astype(str)
            + "|" + m["p_size"].astype(str), index=False)
            % num_partitions).astype("int32")
        m["side"] = np.int8(0)
        return m[cols]

    def count_group(group: pd.DataFrame) -> pd.DataFrame:
        g = (group[["p_brand", "p_type", "p_size", "sk"]]
             .drop_duplicates()
             .groupby(["p_brand", "p_type", "p_size"], as_index=False)
             .agg(supplier_cnt=("sk", "size")))
        g["supplier_cnt"] = g["supplier_cnt"].astype("int64")
        return g

    parts = (li.map_batches(li_pairs, batch_format="pandas",
                            batch_size=131072)
             .union(part.map_batches(part_side, batch_format="pandas"))
             .groupby("jb").map_groups(attach_part,
                                       batch_format="pandas")
             .groupby("jb").map_groups(count_group,
                                       batch_format="pandas"))
    out = _fold_pd(parts, pd.DataFrame({
        "p_brand": pd.Series(dtype="object"),
        "p_type": pd.Series(dtype="object"),
        "p_size": pd.Series(dtype="int64"),
        "supplier_cnt": pd.Series(dtype="int64")}))
    if out.empty:
        return out
    return (out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], kind="stable")
        .reset_index(drop=True))


SUPPLIER_PART_COUNTS_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers who shipped more than a quantity
# threshold of name-filtered parts inside a date window.  partsupp's
# availqty has no source column, so the Q20 comparison "availqty >
# 0.5 * shipped qty" becomes "shipped qty > threshold" over the same
# semi-join chain (part-name filter -> lineitem window scan -> per-
# supplier sum -> supplier/nation attach).  The filtered partkey set
# is broadcast once (name-prefix selective); the per-supplier sum is
# map-side partials + one small suppkey groupby; the final name
# attach re-scans supplier with the QUALIFIED suppkeys broadcast —
# the result set, not the supplier table, is what moves.
# ---------------------------------------------------------------------------

def top_part_shippers(sf_dir: str, name_prefix: str = "red",
                      date_from: str = "1996-01-01",
                      date_to: str = "1997-01-01",
                      min_qty: float = 200.0):
    import ray
    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def part_filter(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["p_name"].str.startswith(name_prefix)]
        return pd.DataFrame(
            {"p_partkey": b["p_partkey"].to_numpy().astype("int64")})

    pk_ref = ray.put(np.sort(_fold_pd(
        part.map_batches(part_filter, batch_format="pandas"),
        pd.DataFrame({"p_partkey": pd.Series(dtype="int64")}))
        ["p_partkey"].to_numpy()))
    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)
    qty_c_min = int(np.floor(min_qty * 100.0 + 0.5))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"])

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        keep = _semi_mask(ray.get(pk_ref),
                          b["l_partkey"].to_numpy().astype("int64"))
        b = b[keep]
        qty_c = np.floor(b["l_quantity"].to_numpy() * 100.0
                         + 0.5).astype("int64")
        return (pd.DataFrame({"s_suppkey": b["l_suppkey"]
                              .astype("int64"), "qty_c": qty_c})
                .groupby("s_suppkey", as_index=False)
                .agg(qty_c=("qty_c", "sum")))

    per_supp = (li.map_batches(li_partial, batch_format="pandas",
                               batch_size=131072)
                .groupby("s_suppkey")
                .aggregate(Sum("qty_c", alias_name="qty_c"))
                .to_pandas())  # <= |suppliers| tiny rows
    if per_supp.empty:
        return pd.DataFrame({"s_name": pd.Series(dtype="object"),
                             "n_name": pd.Series(dtype="object"),
                             "total_qty": pd.Series(dtype="float64")})
    per_supp["qty_c"] = per_supp["qty_c"].astype("int64")
    per_supp = per_supp[per_supp["qty_c"] > qty_c_min]

    # attach names: broadcast the QUALIFIED keys, re-scan supplier
    ok_ref = ray.put(np.sort(
        per_supp["s_suppkey"].to_numpy().astype("int64")))
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name", "s_nationkey"])

    def supp_pick(b: pd.DataFrame) -> pd.DataFrame:
        keep = _semi_mask(ray.get(ok_ref),
                          b["s_suppkey"].to_numpy().astype("int64"))
        b = b[keep]
        return pd.DataFrame({
            "s_suppkey": b["s_suppkey"].to_numpy().astype("int64"),
            "s_name": b["s_name"].to_numpy(),
            "s_nationkey": b["s_nationkey"].to_numpy().astype("int64")})

    names = _fold_pd(
        supp.map_batches(supp_pick, batch_format="pandas"),
        pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                      "s_name": pd.Series(dtype="object"),
                      "s_nationkey": pd.Series(dtype="int64")}))
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name"]).to_pandas()
    nat_names = dict(zip(nation["n_nationkey"].astype("int64"),
                         nation["n_name"]))
    m = per_supp.merge(names, on="s_suppkey")
    if m.empty:
        return pd.DataFrame({"s_name": pd.Series(dtype="object"),
                             "n_name": pd.Series(dtype="object"),
                             "total_qty": pd.Series(dtype="float64")})
    m["n_name"] = m["s_nationkey"].map(nat_names)
    m["total_qty"] = m["qty_c"].astype("int64") / 100.0
    return (m.sort_values("s_name", kind="stable")
            [["s_name", "n_name", "total_qty"]].reset_index(drop=True))


TOP_PART_SHIPPERS_SQL = """
SELECT s.s_name, n.n_name, x.qty_c / 100.0 AS total_qty
FROM (
  SELECT l_suppkey,
         SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT))::BIGINT
           AS qty_c
  FROM lineitem
  JOIN part p ON p.p_partkey = l_partkey
  WHERE p.p_name LIKE 'red%'
    AND l_shipdate >= DATE '1996-01-01'
    AND l_shipdate <  DATE '1997-01-01'
  GROUP BY l_suppkey
) x
JOIN supplier s ON s.s_suppkey = x.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE x.qty_c > 20000
ORDER BY s.s_name
"""


# ---------------------------------------------------------------------------
# SimHash near-dup pairs (Hamming-ball over the 63-bit fingerprint via
# 4-band pigeonhole buckets — stages/neardup.simhash_pairs_dataset).
# The oracle brute-forces the identical pair set: the bit-identical
# HUGEINT simhash recompute joined on bit_count(xor) <= d.
# ---------------------------------------------------------------------------

def simhash_pairs(sf_dir: str, max_ham: int = 1):
    from ..stages.neardup import simhash_pairs_dataset

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_pairs_dataset(docs, max_ham=max_ham)


SIMHASH_PAIRS_SQL = f"""
WITH sh AS ({SIMHASH_SQL})
SELECT a.doc_id::BIGINT AS a, b.doc_id::BIGINT AS b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Exact kNN graph over the embeddings table (stages/ann.KnnGraph).
# The oracle self-joins on DOUBLE-cast lists: DuckDB's
# list_cosine_similarity over FLOAT lists computes in float32, whose
# ROUND(.,4) can land one ulp across a rounding edge from the numpy
# float64 kernel (observed at sf0.01: 0.3257 vs 0.3258) — the ::DOUBLE[]
# casts make both sides the same float64 arithmetic.
# ---------------------------------------------------------------------------

def knn_graph(sf_dir: str, k: int = 3):
    from ..stages.ann import knn_graph as _knn

    ds = _strip_meta(_read(sf_dir, "embeddings",
                           columns=["vec_id", "embedding"]))
    df = _knn(ds, k=k).to_pandas()
    if df.empty:
        return pd.DataFrame({"src": pd.Series(dtype="int64"),
                             "dst": pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    df["sim"] = round_half_away(df["sim"], 4)
    return (df.sort_values(["src", "sim", "dst"],
                           ascending=[True, False, True])
            .reset_index(drop=True))


KNN_GRAPH_SQL = """
WITH sims AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_cosine_similarity(a.embedding::DOUBLE[],
                                b.embedding::DOUBLE[]) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT src, dst, ROUND(sim, 4) AS sim,
         row_number() OVER (PARTITION BY src
                            ORDER BY ROUND(sim, 4) DESC, dst) AS rn
  FROM sims
)
SELECT src, dst, sim
FROM ranked WHERE rn <= 3
ORDER BY src, sim DESC, dst
"""


# ---------------------------------------------------------------------------
# Rolling 7-day active users: for each event day, how many distinct
# users had at least one event in the trailing 7-day window (day-6 ..
# day).  The sliding-DISTINCT shape no plain window partial can fold.
# ---------------------------------------------------------------------------

def rolling_active_users(sf_dir: str, window_days: int = 7,
                         num_buckets: int = 64):
    """Map-side (user, day) pair dedup -> user-hash bucket shuffle (a
    user's full day set lands in ONE bucket, so per-bucket distinct
    counts sum exactly across buckets) -> in-bucket vectorized coverage
    expansion: each active day covers windows ending on day..day+6, so
    expand each deduped pair to its 7 covered days, dedup (user,
    covered_day) inside the bucket, and emit per-day partial counts.
    The driver folds <= num_buckets x n_days rows and intersects with
    the (tiny, separately folded) real event-day set — covered days
    that never occur in the data are window ends nobody asks for.

    Raw events never shuffle; the expansion is 7x on DEDUPED pairs
    (bounded by users x active-days, far below event count); days are
    bounded by the time range, not the data size."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame({"user_id": b["user_id"],
                          "day": b["ts"].dt.floor("D")}).drop_duplicates()
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["user_id", "day"])
        u = np.tile(g["user_id"].to_numpy(), window_days)
        d = np.concatenate([g["day"].to_numpy() + np.timedelta64(o, "D")
                            for o in range(window_days)])
        cov = (pd.DataFrame({"user_id": u, "day": d})
               .drop_duplicates()
               .groupby("day", as_index=False)
               .agg(n=("user_id", "size")))
        cov["n"] = cov["n"].astype("int64")
        # the bucket's REAL active days ride the same frame as n=-1
        # sentinel rows, so the events table is scanned exactly once
        real = pd.DataFrame({"day": g["day"].unique()})
        real["n"] = np.int64(-1)
        return pd.concat([cov, real], ignore_index=True)

    deduped = (ds.map_batches(pairs, batch_format="pandas",
                              batch_size=131072)
               .groupby("ub"))
    parts = _fold_pd(deduped.map_groups(bucket_counts,
                                        batch_format="pandas"),
                     pd.DataFrame({
                         "day": pd.Series(dtype="datetime64[us]"),
                         "n": pd.Series(dtype="int64")}))
    days = parts.loc[parts["n"] < 0, ["day"]].drop_duplicates()
    counts = (parts[parts["n"] >= 0]
              .groupby("day", as_index=False).agg(n=("n", "sum")))
    out = counts.merge(days, on="day")
    out = out.rename(columns={"n": "active_users"})
    out["active_users"] = out["active_users"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


ROLLING_ACTIVE_USERS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), days AS (SELECT DISTINCT day FROM ud)
SELECT d.day AS day, count(DISTINCT u.user_id)::BIGINT AS active_users
FROM days d JOIN ud u
  ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
ORDER BY d.day
"""


# ---------------------------------------------------------------------------
# Global exact-quantile bucketing (NTILE without the tie lottery):
# bucket boundaries are exact order statistics (quantile_disc parity via
# the shared histogram descent), each event is assigned 1 + (# of
# boundaries strictly below it) — a deterministic, rank-free rule both
# engines evaluate identically, unlike SQL NTILE whose equal-count tiles
# split ties by physical row order.
# ---------------------------------------------------------------------------

def event_quantile_buckets(sf_dir: str):
    """Per (event_type, global value-quartile) counts and cent-exact
    sums.  One histogram-descent pass fixes the three boundaries
    (driver sees <= collect_limit values, see event_percentiles), then
    one map pass emits per-batch partial groupbys and a tiny groupby
    folds them.  NULL values are excluded on both sides (quantile_disc
    ignores them; the WHERE clause drops them from the bucketing)."""
    ds = _read(sf_dir, "events",
               columns=["event_type", "value"]).materialize()
    bounds = exact_percentiles(ds, "value", qs=(0.25, 0.5, 0.75))
    if bounds.empty or bounds["value"].isna().any():
        return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                             "bucket": pd.Series(dtype="int32"),
                             "n": pd.Series(dtype="int64"),
                             "sum_cents": pd.Series(dtype="int64")})
    q1, q2, q3 = (float(v) for v in bounds.sort_values("q")["value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"].notna()]
        v = b["value"].to_numpy(np.float64)
        bucket = (1 + (v > q1).astype(np.int32) + (v > q2) + (v > q3))
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        g = (pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                           "bucket": bucket.astype(np.int32),
                           "cents": cents})
             .groupby(["event_type", "bucket"], as_index=False)
             .agg(n=("cents", "size"), sum_cents=("cents", "sum")))
        return g

    parts = _fold_pd(ds.map_batches(partial, batch_format="pandas"),
                     pd.DataFrame({"event_type": pd.Series(dtype="object"),
                                   "bucket": pd.Series(dtype="int32"),
                                   "n": pd.Series(dtype="int64"),
                                   "sum_cents": pd.Series(dtype="int64")}))
    out = (parts.groupby(["event_type", "bucket"], as_index=False)
           .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum")))
    out["bucket"] = out["bucket"].astype("int32")
    out["n"] = out["n"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return (out.sort_values(["event_type", "bucket"])
            .reset_index(drop=True))


EVENT_QUANTILE_BUCKETS_SQL = """
WITH b AS (
  SELECT quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.5)  AS q2,
         quantile_disc(value, 0.75) AS q3
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       (1 + CAST(value > b.q1 AS INT) + CAST(value > b.q2 AS INT)
          + CAST(value > b.q3 AS INT))::INT AS bucket,
       count(*)::BIGINT AS n,
       SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))::BIGINT AS sum_cents
FROM events, b
WHERE value IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Corpus-balance Gini: how unequally tokens are distributed across the
# documents of each source (the standard imbalance diagnostic before
# domain reweighting).  Exact integer arithmetic end-to-end: with docs
# sorted ascending by token count, G = (2*S1 - (n+1)*S0) / (n*S0) where
# S0 = sum(x), S1 = sum(rank*x) — reported as floor(1000*G) so no
# float division touches the hash.  Tie order cannot change S1 (ranks
# within a tie block permute over EQUAL x), so both engines agree.
# ---------------------------------------------------------------------------

def source_token_gini(sf_dir: str):
    """Map-side partial (source, n_tokens) frequency table -> small
    groupby fold -> driver computes exact Gini per source from the
    histogram with arbitrary-precision ints.  The shuffled table is
    bounded by sources x distinct token counts (thousands), never by
    corpus size; the rank-sum S1 folds from the sorted histogram as
    sum over values of x * (count-run rank total) without expanding
    back to per-doc rows."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"source": b["source"].to_numpy(),
                           "n_tokens": _n_words(b["text"]).to_numpy()})
             .groupby(["source", "n_tokens"], as_index=False)
             .agg(n_docs=("n_tokens", "size")))
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    hist = (_fold_pd(ds.map_batches(partial, batch_format="pandas"),
                     pd.DataFrame({"source": pd.Series(dtype="object"),
                                   "n_tokens": pd.Series(dtype="int64"),
                                   "n_docs": pd.Series(dtype="int64")}))
            .groupby(["source", "n_tokens"], as_index=False)
            .agg(n_docs=("n_docs", "sum")))
    rows = []
    for src, g in hist.groupby("source"):
        g = g.sort_values("n_tokens")
        xs = [int(v) for v in g["n_tokens"]]
        cs = [int(c) for c in g["n_docs"]]
        n = sum(cs)
        s0 = sum(x * c for x, c in zip(xs, cs))
        # rank total of a run of c equal values starting after `seen`
        # docs: sum(seen+1 .. seen+c) = c*seen + c*(c+1)/2
        s1, seen = 0, 0
        for x, c in zip(xs, cs):
            s1 += x * (c * seen + c * (c + 1) // 2)
            seen += c
        gini_milli = (1000 * (2 * s1 - (n + 1) * s0)) // (n * s0) \
            if n and s0 else 0
        rows.append({"source": src, "n_docs": n, "sum_tokens": s0,
                     "gini_milli": gini_milli})
    out = pd.DataFrame(rows, columns=["source", "n_docs", "sum_tokens",
                                      "gini_milli"])
    for c in ("n_docs", "sum_tokens", "gini_milli"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SOURCE_TOKEN_GINI_SQL = f"""
WITH t AS (
  SELECT source, {_N_WORDS_SQL}::HUGEINT AS x
  FROM documents
), r AS (
  SELECT source, x,
         row_number() OVER (PARTITION BY source ORDER BY x) AS rn
  FROM t
), s AS (
  SELECT source, count(*)::HUGEINT AS n, sum(x) AS s0,
         sum(rn * x) AS s1
  FROM r GROUP BY source
)
SELECT source, n::BIGINT AS n_docs, s0::BIGINT AS sum_tokens,
       CASE WHEN n > 0 AND s0 > 0
            THEN ((1000 * (2 * s1 - (n + 1) * s0)) // (n * s0))::BIGINT
            ELSE 0 END AS gini_milli
FROM s
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Per-label embedding centroids (class prototypes): exploded to one
# (label, dim, value) row per dimension so the hash compare never
# stringifies a list column.  float64 partial sums fold per (label,
# dim); ROUND(.,4) absorbs the last-ulp fold-order difference vs the
# oracle's sequential sum (values are O(1), edges ~1e-12 away).
# ---------------------------------------------------------------------------

def label_centroids(sf_dir: str):
    """One map pass emits per-batch partial (label, sum-vector, count);
    a small driver fold divides.  The shuffled/folded state is labels x
    (dims + 1) floats — independent of corpus size."""
    from ..stages.ann import _matrix

    ds = _strip_meta(_read(sf_dir, "embeddings",
                           columns=["label", "embedding"]))

    def partial(t: "pa.Table") -> pd.DataFrame:
        labels = t.column("label").to_numpy()
        m = _matrix(t.column("embedding"), np.float64)
        if len(labels) == 0:
            return pd.DataFrame({"label": pd.Series(dtype="int32"),
                                 "n": pd.Series(dtype="int64"),
                                 "sums": pd.Series(dtype="object")})
        order = np.argsort(labels, kind="stable")
        sl, sm = labels[order], m[order]
        uniq, starts = np.unique(sl, return_index=True)
        sums = np.add.reduceat(sm, starts, axis=0)
        counts = np.diff(np.append(starts, len(sl)))
        return pd.DataFrame({"label": uniq.astype("int32"),
                             "n": counts.astype("int64"),
                             "sums": [row.tobytes() for row in sums]})

    parts = _fold_pd(
        ds.map_batches(partial, batch_format="pyarrow"),
        pd.DataFrame({"label": pd.Series(dtype="int32"),
                      "n": pd.Series(dtype="int64"),
                      "sums": pd.Series(dtype="object")}))
    rows = []
    for lab, g in parts.groupby("label"):
        total = np.sum([np.frombuffer(b, dtype=np.float64)
                        for b in g["sums"]], axis=0)
        n = int(g["n"].sum())
        cent = round_half_away(total / n, 4)
        for d, v in enumerate(cent):
            rows.append({"label": int(lab), "dim": d + 1,
                         "centroid": float(v)})
    out = pd.DataFrame(rows, columns=["label", "dim", "centroid"])
    out["label"] = out["label"].astype("int32")
    out["dim"] = out["dim"].astype("int64")
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


LABEL_CENTROIDS_SQL = """
WITH dims AS (
  SELECT unnest(generate_series(
    1, (SELECT max(len(embedding)) FROM embeddings))) AS i
)
SELECT e.label, dims.i AS dim,
       ROUND(AVG((e.embedding::DOUBLE[])[dims.i]), 4) AS centroid
FROM embeddings e JOIN dims ON dims.i <= len(e.embedding)
GROUP BY e.label, dims.i
ORDER BY e.label, dims.i
"""


# ---------------------------------------------------------------------------
# Session-duration distribution: sessionize (the repo's 30-min-gap
# windows) composed with the exact-percentile descent — the classic
# "how long do sessions run" report, exact at any scale.  Durations are
# integer microseconds (timestamp subtraction is exact), so the
# quantile_disc oracle hashes bit-for-bit.
# ---------------------------------------------------------------------------

def session_duration_percentiles(sf_dir: str, qs=(0.5, 0.9, 0.99)):
    """sessionize -> one map pass projecting integer duration_us ->
    histogram-descent order statistics (driver sees <= collect_limit
    values; see event_percentiles).  No new shuffle beyond the
    user-bucket one sessionize already does."""
    sess = sessionize_core(sf_dir)

    def dur(b: pd.DataFrame) -> pd.DataFrame:
        us = ((b["session_end"] - b["session_start"])
              // pd.Timedelta(microseconds=1)).astype("int64")
        return pd.DataFrame({"duration_us": us})

    ds = sess.map_batches(dur, batch_format="pandas").materialize()
    out = exact_percentiles(ds, "duration_us", qs=qs)
    out["duration_us"] = out["value"].astype("int64")
    return out[["q", "duration_us"]].reset_index(drop=True)


SESSION_DURATION_PERCENTILES_SQL = f"""
WITH sess AS ({SESSIONIZE_SQL.replace('ORDER BY user_id, session_id', '')}),
d AS (
  SELECT epoch_us(session_end) - epoch_us(session_start) AS duration_us
  FROM sess
)
, agg AS (
  SELECT quantile_disc(duration_us, [0.5, 0.9, 0.99]) AS vs FROM d
)
SELECT [0.5, 0.9, 0.99][i] AS q, vs[i]::BIGINT AS duration_us
FROM agg, (SELECT unnest(generate_series(1, 3)) AS i) t
ORDER BY q
"""


# ---------------------------------------------------------------------------
# Type-token ratio per document (lexical-diversity quality feature):
# distinct lowered whitespace tokens / total tokens, reported as exact
# integer milli (1000*distinct // total) so no float touches the hash.
# ---------------------------------------------------------------------------

def doc_ttr(sf_dir: str):
    """Pure map pass (no shuffle): per-row token explode happens inside
    the batch, counts are ints.  Empty docs report 0/0/0."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ttr(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = _ws_tokens(b["text"])  # shared oracle-parity tokenizer
        per = ex.groupby(level=0).agg(["size", "nunique"]) \
            if len(ex) else pd.DataFrame(columns=["size", "nunique"])
        n_tok = np.zeros(len(b), dtype=np.int64)
        n_distinct = np.zeros(len(b), dtype=np.int64)
        if len(per):
            idx = per.index.to_numpy()
            n_tok[idx] = per["size"].to_numpy()
            n_distinct[idx] = per["nunique"].to_numpy()
        out = pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "n_tokens": n_tok,
            "n_distinct": n_distinct})
        out["ttr_milli"] = np.where(
            n_tok > 0, 1000 * n_distinct // np.maximum(n_tok, 1),
            0).astype("int64")
        return out

    return ds.map_batches(ttr, batch_format="pandas").sort("doc_id")


DOC_TTR_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                                           '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       len(list_distinct(toks))::BIGINT AS n_distinct,
       (CASE WHEN len(toks) > 0
             THEN (1000 * len(list_distinct(toks))) // len(toks)
             ELSE 0 END)::BIGINT AS ttr_milli
FROM t
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Heavy-hitter tokens via a Misra-Gries sketch + exact recount — the
# mergeable-summaries two-pass pattern (Agarwal/Cormode et al. 2012):
# pass 1 builds capacity-k MG summaries per batch (vectorized
# value_counts, subtract the (k+1)-th largest, keep positive) and
# merges them per token-hash bucket the same way, so every token with
# true frequency > N/(k+1) PROVABLY survives as a candidate while no
# stage ever holds more than k rows per unit; pass 2 exactly recounts
# the <= num_buckets*k candidates in one broadcast map and filters by
# the integer threshold n*(k+1) > N.  Output is exact (recounted), so
# the SQL HAVING oracle hashes bit-for-bit — a sketch whose answer is
# still exact.
# ---------------------------------------------------------------------------

def heavy_hitter_tokens(sf_dir: str, k: int = 199, num_buckets: int = 32):
    ds = _read(sf_dir, "documents", columns=["text"]).materialize()

    def _compress(counts: pd.Series, cap: int) -> pd.Series:
        """MG compress: keep <= cap entries by subtracting the
        (cap+1)-th largest count from all and dropping <= 0."""
        if len(counts) <= cap:
            return counts
        dec = counts.nlargest(cap + 1).iloc[-1]
        out = counts - dec
        return out[out > 0]

    def summary(b: pd.DataFrame) -> pd.DataFrame:
        toks = _ws_tokens(b["text"])
        counts = _compress(toks.value_counts(), k)
        out = counts.rename_axis("token").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        out["tb"] = (pd.util.hash_pandas_object(out["token"], index=False)
                     % num_buckets).astype("int32")
        # sentinel row: this batch's TOTAL token mass (for the driver's
        # exact N) rides the same frame, tb = -1
        tot = pd.DataFrame({"token": [""], "n": [np.int64(len(toks))],
                            "tb": [np.int32(-1)]})
        return pd.concat([out, tot], ignore_index=True)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if (g["tb"] < 0).any():      # total-mass sentinels: sum, pass on
            return pd.DataFrame({
                "token": [""],
                "n": [np.int64(g.loc[g["tb"] < 0, "n"].sum())],
                "tb": [np.int32(-1)]})
        m = g.groupby("token")["n"].sum()
        m = _compress(m, k)
        out = m.rename_axis("token").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        out["tb"] = g["tb"].iloc[0]
        return out

    parts = _fold_pd(
        ds.map_batches(summary, batch_format="pandas")
        .groupby("tb").map_groups(merge_bucket, batch_format="pandas"),
        pd.DataFrame({"token": pd.Series(dtype="object"),
                      "n": pd.Series(dtype="int64"),
                      "tb": pd.Series(dtype="int32")}))
    total = int(parts.loc[parts["tb"] < 0, "n"].sum())
    cand = parts.loc[parts["tb"] >= 0, "token"].unique()
    if total == 0 or len(cand) == 0:
        return pd.DataFrame({"token": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    cand_set = set(cand)  # <= num_buckets * k entries, broadcast

    def recount(b: pd.DataFrame) -> pd.DataFrame:
        toks = _ws_tokens(b["text"])
        hits = toks[toks.isin(cand_set)]
        out = hits.value_counts().rename_axis("token") \
            .reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    exact = (_fold_pd(ds.map_batches(recount, batch_format="pandas"),
                      pd.DataFrame({"token": pd.Series(dtype="object"),
                                    "n": pd.Series(dtype="int64")}))
             .groupby("token", as_index=False).agg(n=("n", "sum")))
    exact = exact[exact["n"] * (k + 1) > total]
    exact["n"] = exact["n"].astype("int64")
    return (exact.sort_values(["n", "token"], ascending=[False, True])
            .reset_index(drop=True))


HEAVY_HITTER_TOKENS_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
           x -> x <> '')) AS token
  FROM documents
), tot AS (SELECT count(*)::HUGEINT AS total FROM toks)
SELECT token, count(*)::BIGINT AS n
FROM toks, tot GROUP BY token, tot.total
HAVING count(*) * 200 > tot.total
ORDER BY n DESC, token
"""


# ---------------------------------------------------------------------------
# Grouped robust outlier stats: per-event-type median + MAD via TWO
# shared keyed histogram descents (all groups advance through the same
# full-data passes — the machinery of percentiles_by_type), plus one
# integer outlier-count pass.  event_mad's grouped sibling.
# ---------------------------------------------------------------------------

def event_mad_by_type(sf_dir: str, k: int = 3):
    ds = _read(sf_dir, "events",
               columns=["event_type", "value"]).materialize()
    med = grouped_exact_percentiles(ds, "value", qs=(0.5,),
                                    group_col="event_type")
    med = med.rename(columns={"group": "event_type",
                              "value": "median"})[["event_type",
                                                   "median"]]
    med = med[med["median"].notna()]
    med_map = dict(zip(med["event_type"], med["median"]))

    def dev(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"].notna() & b["event_type"].isin(med_map)]
        m = b["event_type"].map(med_map).to_numpy(np.float64)
        return pd.DataFrame({
            "event_type": b["event_type"].to_numpy(),
            "dev": np.abs(b["value"].to_numpy(np.float64) - m)})

    devs = ds.map_batches(dev, batch_format="pandas").materialize()
    mad = grouped_exact_percentiles(devs, "dev", qs=(0.5,),
                                    group_col="event_type")
    mad = mad.rename(columns={"group": "event_type", "value": "mad"})
    mad_map = dict(zip(mad["event_type"], mad["mad"]))

    def count_out(b: pd.DataFrame) -> pd.DataFrame:
        t = b["event_type"].map(mad_map).to_numpy(np.float64)
        out = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                            "n": (b["dev"].to_numpy(np.float64)
                                  > k * t).astype(np.int64)})
        g = out.groupby("event_type", as_index=False).agg(n=("n", "sum"))
        g["n"] = g["n"].astype("int64")
        return g

    parts = _fold_pd(devs.map_batches(count_out, batch_format="pandas"),
                     pd.DataFrame({"event_type": pd.Series(dtype="object"),
                                   "n": pd.Series(dtype="int64")}))
    counts = (parts.groupby("event_type", as_index=False)
              .agg(n=("n", "sum")) if len(parts) else
              pd.DataFrame({"event_type": pd.Series(dtype="object"),
                            "n": pd.Series(dtype="int64")}))
    out = med.merge(mad[["event_type", "mad"]], on="event_type")
    out = out.merge(counts, on="event_type", how="left")
    out["n_outliers"] = out["n"].fillna(0).astype("int64")
    return (out[["event_type", "median", "mad", "n_outliers"]]
            .sort_values("event_type").reset_index(drop=True))


EVENT_MAD_BY_TYPE_SQL = """
WITH m AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), d AS (
  SELECT e.event_type, abs(e.value - m.med) AS dev
  FROM events e JOIN m ON m.event_type = e.event_type
  WHERE e.value IS NOT NULL
), md AS (
  SELECT event_type, quantile_disc(dev, 0.5) AS mad
  FROM d GROUP BY event_type
)
SELECT m.event_type, m.med AS median, md.mad AS mad,
       (SELECT count(*) FROM d
        WHERE d.event_type = m.event_type
          AND d.dev > 3 * md.mad)::BIGINT AS n_outliers
FROM m JOIN md ON md.event_type = m.event_type
ORDER BY m.event_type
"""


# ---------------------------------------------------------------------------
# Inter-event gap distribution: exact percentiles of the per-user
# time gaps between consecutive events — the engagement-cadence twin
# of session_duration_percentiles.  Gaps are exact integer
# microseconds computed inside user buckets (shifted diff after the
# same (user, ts, event_id) ordering the sessionizer uses).
# ---------------------------------------------------------------------------

def user_gap_percentiles(sf_dir: str, qs=(0.5, 0.9, 0.99),
                         num_buckets: int = 32):
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(ub=_user_bucket(b["user_id"], num_buckets))

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        same = g["user_id"].eq(g["user_id"].shift())
        d = (g["ts"].diff() // pd.Timedelta(microseconds=1))
        out = pd.DataFrame({"gap_us": d[same].astype("int64")})
        return out

    ds = (ev.map_batches(bucketed, batch_format="pandas")
          .groupby("ub").map_groups(gaps, batch_format="pandas")
          ).materialize()
    out = exact_percentiles(ds, "gap_us", qs=qs)
    if out.empty:
        # no user has 2+ events: quantile_disc over zero rows is NULL,
        # which the oracle expands to one (q, NULL) row per quantile —
        # nullable Int64 NA, not float NaN, so the schema/hash matches
        # the oracle's BIGINT NULL on this edge dataset
        return pd.DataFrame({"q": list(qs),
                             "gap_us": pd.array([pd.NA] * len(qs),
                                                dtype="Int64")})
    out["gap_us"] = out["value"].astype("int64")
    return out[["q", "gap_us"]].reset_index(drop=True)


USER_GAP_PERCENTILES_SQL = """
WITH d AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), g AS (SELECT gap_us FROM d WHERE gap_us IS NOT NULL),
agg AS (
  SELECT quantile_disc(gap_us, [0.5, 0.9, 0.99]) AS vs FROM g
)
SELECT [0.5, 0.9, 0.99][i] AS q, vs[i]::BIGINT AS gap_us
FROM agg, (SELECT unnest(generate_series(1, 3)) AS i) t
ORDER BY q
"""


# ---------------------------------------------------------------------------
# kNN label-vote evaluation: leave-one-out classification accuracy of
# the embeddings' labels under the exact kNN graph — the standard
# embedding-quality probe.  Majority vote over the k=3 neighbors'
# labels, ties broken by SMALLEST label (deterministic, rank-free).
# Counts are exact integers.
# ---------------------------------------------------------------------------

def knn_label_accuracy(sf_dir: str, k: int = 3):
    """Composition: stages/ann.knn_graph edges -> broadcast (vec_id ->
    label) lookup -> per-batch vote partials -> one tiny fold.  The
    label map is labels-only (8 B/row class column, bounded broadcast
    like the knn matrix itself; the IVF/LSH path replaces both at
    beyond-broadcast scale)."""
    from ..stages.ann import knn_graph as _knn

    ds = _strip_meta(_read(sf_dir, "embeddings",
                           columns=["vec_id", "embedding", "label"]))
    # Arrow-native projections: a pandas round-trip would re-encode the
    # list<float> column as Ray's tensor extension, which _matrix
    # rejects
    lab = _fold_pd(
        ds.select_columns(["vec_id", "label"]),
        pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                      "label": pd.Series(dtype="int32")}))
    lab_sorted = lab.sort_values("vec_id")
    keys = lab_sorted["vec_id"].to_numpy(np.int64)
    vals = lab_sorted["label"].to_numpy(np.int64)
    edges = _knn(ds.select_columns(["vec_id", "embedding"]),
                 k=k).to_pandas()
    if edges.empty:
        return pd.DataFrame({"label": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "n_correct": pd.Series(dtype="int64")})
    hit, pos = _semi_probe(keys, edges["src"].to_numpy(np.int64))
    edges["src_label"] = vals[pos]
    hit, pos = _semi_probe(keys, edges["dst"].to_numpy(np.int64))
    edges["dst_label"] = vals[pos]
    votes = (edges.groupby(["src", "src_label", "dst_label"])
             .size().rename("c").reset_index())
    # majority with smallest-label tie-break: sort by (count DESC,
    # label ASC), take first per src
    votes = votes.sort_values(["src", "c", "dst_label"],
                              ascending=[True, False, True])
    win = votes.drop_duplicates(subset=["src"], keep="first")
    per = pd.DataFrame({
        "label": win["src_label"].astype("int64"),
        "correct": (win["src_label"] == win["dst_label"])
        .astype("int64")})
    out = per.groupby("label", as_index=False).agg(
        n=("correct", "size"), n_correct=("correct", "sum"))
    out["n"] = out["n"].astype("int64")
    out["n_correct"] = out["n_correct"].astype("int64")
    return out.sort_values("label").reset_index(drop=True)


KNN_LABEL_ACCURACY_SQL = """
WITH sims AS (
  SELECT a.vec_id AS src, a.label AS src_label,
         b.vec_id AS dst, b.label AS dst_label,
         ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 4) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT src, src_label, dst_label,
         row_number() OVER (PARTITION BY src
                            ORDER BY sim DESC, dst) AS rn
  FROM sims
), votes AS (
  SELECT src, src_label, dst_label, count(*) AS c
  FROM ranked WHERE rn <= 3
  GROUP BY src, src_label, dst_label
), win AS (
  SELECT src, src_label, dst_label,
         row_number() OVER (PARTITION BY src
                            ORDER BY c DESC, dst_label) AS wr
  FROM votes
)
SELECT src_label::BIGINT AS label, count(*)::BIGINT AS n,
       sum(CASE WHEN dst_label = src_label THEN 1 ELSE 0 END)::BIGINT
         AS n_correct
FROM win WHERE wr = 1
GROUP BY src_label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# Watermark / late-data audit — the streaming-ingestion concern over a
# static table: process events in arrival order (event_id), carry a
# high-water mark (max event-time seen so far), and flag any event
# whose timestamp lags the watermark by more than `lateness`.  Reports
# per tumbling hour-window how much data a streaming job with that
# allowed-lateness would have dropped.
#
# Scale shape is the classic TWO-PASS DISTRIBUTED SCAN: the running
# max over a global order decomposes into (1) per-range partials
# (range = event_id block, one map pass emits each range's max ts),
# (2) a driver-side prefix max over the tiny range table, (3) one more
# map pass where each range, seeded with the watermark entering it,
# resolves its events' late flags locally (vectorized cummax).  Raw
# events shuffle once (range co-location); driver state is O(ranges).
# ---------------------------------------------------------------------------

def late_event_audit(sf_dir: str, lateness_s: int = 3600,
                     num_ranges: int = 64):
    ds = _read(sf_dir, "events", columns=["event_id", "ts"]).materialize()
    from ray.data.aggregate import Max, Min

    empty = pd.DataFrame({"window_start_s": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "n_late": pd.Series(dtype="int64")})
    mm = ds.aggregate(Min("event_id"), Max("event_id"))
    if mm is None or mm.get("min(event_id)") is None:
        return empty  # zero-row input: the oracle returns 0 rows too
    lo, hi = int(mm["min(event_id)"]), int(mm["max(event_id)"])
    span = max(1, hi - lo + 1)
    width = -(-span // num_ranges)  # ceil
    late_us = int(lateness_s) * 1_000_000

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        us = ((b["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
              ).to_numpy(np.int64)
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(np.int64),
            "us": us,
            "rg": ((b["event_id"].to_numpy(np.int64) - lo) // width)
            .astype(np.int32)})

    tagged = ds.map_batches(tag, batch_format="pandas")

    # pass 1: per-range max event-time (tiny partials; a range's rows
    # may span blocks, so fold per-block partials by range)
    def range_max(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("rg", as_index=False).agg(mx=("us", "max"))
        g["mx"] = g["mx"].astype("int64")
        return g

    rmax = (_fold_pd(tagged.map_batches(range_max, batch_format="pandas"),
                     pd.DataFrame({"rg": pd.Series(dtype="int32"),
                                   "mx": pd.Series(dtype="int64")}))
            .groupby("rg", as_index=False).agg(mx=("mx", "max"))
            .sort_values("rg"))
    # watermark ENTERING each range = prefix max of earlier ranges
    enter = dict(zip(rmax["rg"],
                     rmax["mx"].cummax().shift(1).fillna(-(1 << 62))
                     .astype("int64")))

    # pass 2: per-range local scan (sort by event_id, cummax seeded
    # with the entering watermark), then per-window partial counts
    def audit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="stable")
        us = g["us"].to_numpy(np.int64)
        seed = int(enter.get(int(g["rg"].iloc[0]), -(1 << 62)))
        # high-water BEFORE each event: shifted cummax with seed
        prior = np.empty(len(g), dtype=np.int64)
        prior[0] = seed
        if len(g) > 1:
            np.maximum.accumulate(us[:-1], out=prior[1:])
            np.maximum(prior[1:], seed, out=prior[1:])
        late = us + late_us < prior
        # DuckDB's // TRUNCATES toward zero (SELECT -7 // 2 = -3);
        # numpy's floors.  Truncating division keeps pre-epoch
        # timestamps in the same window on both engines.
        win = us // 3_600_000_000
        win[(us < 0) & (us % 3_600_000_000 != 0)] += 1
        out = (pd.DataFrame({"window_start_s": win * 3600,
                             "n": np.int64(1),
                             "n_late": late.astype(np.int64)})
               .groupby("window_start_s", as_index=False)
               .agg(n=("n", "sum"), n_late=("n_late", "sum")))
        for c in ("window_start_s", "n", "n_late"):
            out[c] = out[c].astype("int64")
        return out

    parts = _fold_pd(
        tagged.groupby("rg").map_groups(audit, batch_format="pandas"),
        pd.DataFrame({"window_start_s": pd.Series(dtype="int64"),
                      "n": pd.Series(dtype="int64"),
                      "n_late": pd.Series(dtype="int64")}))
    out = (parts.groupby("window_start_s", as_index=False)
           .agg(n=("n", "sum"), n_late=("n_late", "sum")))
    for c in ("n", "n_late"):
        out[c] = out[c].astype("int64")
    return out.sort_values("window_start_s").reset_index(drop=True)


LATE_EVENT_AUDIT_SQL = """
WITH w AS (
  SELECT epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS highwater
  FROM events
)
SELECT (us // 3600000000 * 3600)::BIGINT AS window_start_s,
       count(*)::BIGINT AS n,
       sum(CASE WHEN highwater IS NOT NULL
                 AND us + 3600000000 < highwater
                THEN 1 ELSE 0 END)::BIGINT AS n_late
FROM w
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Normalization-aware exact dedup: the real-world staple that exact
# byte dedup misses — casefold and collapse ASCII whitespace runs
# before keying, keep the smallest doc_id per normalized text.  The
# normalization is RE2-parity (same _ASCII_WS class every tokenizing
# oracle uses), so DuckDB reproduces the key byte-for-byte.
# ---------------------------------------------------------------------------

def dedup_normalized_docs(sf_dir: str):
    """One map pass mints the normalized key, then the existing exact-
    dedup machinery (key-hash groupby, min doc_id) — same shuffle
    shape as dedup_exact_docs."""
    from ..stages.neardup import exact_dedup_docs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        t = (b["text"].fillna("").str.lower()
             .str.replace(_ASCII_WS, " ", regex=True)
             .str.strip(" "))  # space-only: Python str.strip() would
        # also eat \x0b/NBSP that the oracle's trim(..., ' ') keeps
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "text": t})

    out = exact_dedup_docs(ds.map_batches(norm, batch_format="pandas"),
                           key_cols=("text",))
    return out.select_columns(["doc_id"]).sort("doc_id")


DEDUP_NORMALIZED_SQL = r"""
SELECT MIN(doc_id) AS doc_id FROM documents
GROUP BY trim(regexp_replace(lower(coalesce(text, '')),
                             '[ \t\n\f\r]+', ' ', 'g'), ' ')
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Activity heatmap: (day-of-week, hour-of-day) event profile — the
# seasonality report every event pipeline ships.  Pure map-side
# integer partials; the folded state is 7x24 rows.
# ---------------------------------------------------------------------------

def events_heatmap(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"].notna()]  # oracle filters NULL values too:
        # floor(NaN).astype(int64) would sum INT64_MIN garbage
        dow = b["ts"].dt.dayofweek.to_numpy(np.int64)  # Mon=0
        hour = b["ts"].dt.hour.to_numpy(np.int64)
        cents = np.floor(b["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = (pd.DataFrame({"dow": dow, "hour": hour, "cents": cents})
             .groupby(["dow", "hour"], as_index=False)
             .agg(n=("cents", "size"), sum_cents=("cents", "sum")))
        for c in ("dow", "hour", "n", "sum_cents"):
            g[c] = g[c].astype("int64")
        return g

    parts = _fold_pd(ds.map_batches(partial, batch_format="pandas"),
                     pd.DataFrame({"dow": pd.Series(dtype="int64"),
                                   "hour": pd.Series(dtype="int64"),
                                   "n": pd.Series(dtype="int64"),
                                   "sum_cents": pd.Series(dtype="int64")}))
    out = (parts.groupby(["dow", "hour"], as_index=False)
           .agg(n=("n", "sum"), sum_cents=("sum_cents", "sum")))
    for c in ("dow", "hour", "n", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["dow", "hour"]).reset_index(drop=True)


EVENTS_HEATMAP_SQL = """
SELECT (dayofweek(ts) + 6) % 7 AS dow,   -- DuckDB Sun=0 -> Mon=0
       hour(ts)::BIGINT AS hour,
       count(*)::BIGINT AS n,
       SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))::BIGINT AS sum_cents
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""
